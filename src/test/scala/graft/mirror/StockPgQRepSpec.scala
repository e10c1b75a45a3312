package graft.mirror

import graft.SparkSpec
import graft.cdc.StockPostgres

/** LIVE QRep against stock PostgreSQL 15: the watermark-range query
  * template executes ON the real server, partition-parallel, through
  * [[graft.qrep.LivePgPull]] — the reference's Query Replication mode
  * (flow/connectors/postgres/qrep_source.go) with nothing stubbed on
  * the source side. Pins both template dialects (integer and
  * timestamp watermarks at microsecond exactness), the incremental
  * watermark advance, and value fidelity through the OID-driven
  * decode. */
class StockPgQRepSpec extends SparkSpec {

  private var server: Option[StockPostgres.Server] = None
  override def beforeAll(): Unit = {
    super.beforeAll()
    server = StockPostgres.start()
  }
  override def afterAll(): Unit = {
    server.foreach(_.stop())
    super.afterAll()
  }
  private def srv: StockPostgres.Server = {
    assume(server.isDefined, "stock postgres unavailable in this env")
    server.get
  }

  private def run(sql: String) = GraftSql.execute(spark,
    GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))

  test("live QRep, integer watermark: full round + idle round + " +
    "incremental round, each bound query running on the server; " +
    "destination checksum equals the source") {
    val s = srv
    s.psql("""CREATE TABLE public.qr1 (
      id bigint PRIMARY KEY, wm bigint, payload text)""")
    s.psql("""INSERT INTO public.qr1
      SELECT g, g, 'p-' || g FROM generate_series(1, 10000) g""")

    val base = tmpDir("liveqrep")
    run(s"CREATE PEER lqsrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER lqdst TYPE parquet OPTIONS (dir '$base/dst')")
    run("CREATE MIRROR lq1 FROM lqsrc TO lqdst FOR " +
      "$$ SELECT id, wm, payload FROM public.qr1 " +
      "WHERE wm BETWEEN {{.start}} AND {{.end}} $$ " +
      "WITH (watermark_column 'wm', source_table 'public.qr1', " +
      s"dest_dir '$base/dest', num_partitions '4')")

    assert(run("EXECUTE MIRROR lq1").head.getLong(0) == 10000L)
    assert(run("EXECUTE MIRROR lq1").head.getLong(0) == 0L) // idle

    s.psql("""INSERT INTO public.qr1
      SELECT g, g, 'p-' || g FROM generate_series(10001, 10500) g""")
    assert(run("EXECUTE MIRROR lq1").head.getLong(0) == 500L)

    val truth = s.psql("SELECT count(*) || ':' || md5(string_agg(" +
      "id || '|' || wm || '|' || payload, E'\\n' ORDER BY id)) " +
      "FROM public.qr1").trim
    val rows = spark.read.parquet(s"$base/dest")
      .orderBy("id").collect()
    val body = rows.map(r =>
      s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}")
      .mkString("\n")
    val got = s"${rows.length}:" + java.security.MessageDigest
      .getInstance("MD5").digest(body.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == truth, "live QRep destination != source")

    run("DROP MIRROR lq1"); run("DROP PEER lqsrc"); run("DROP PEER lqdst")
  }

  test("live QRep, timestamp watermark: to_timestamp(µs) binding is " +
    "exact at sub-second spacing — no re-pull, no miss") {
    val s = srv
    s.psql("""CREATE TABLE public.qr2 (
      k bigint PRIMARY KEY, updated_at timestamptz)""")
    // 100 rows at 250 ms spacing: seconds-truncated binding would
    // either re-pull the shared second or miss rows inside it
    s.psql("""INSERT INTO public.qr2
      SELECT g, to_timestamp(1700000000 + g * 0.25)
      FROM generate_series(0, 99) g""")

    val base = tmpDir("liveqrepts")
    run(s"CREATE PEER ltsrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER ltdst TYPE parquet OPTIONS (dir '$base/dst')")
    run("CREATE MIRROR lq2 FROM ltsrc TO ltdst FOR " +
      "$$ SELECT k, updated_at FROM public.qr2 " +
      "WHERE updated_at BETWEEN {{.start_ts}} AND {{.end_ts}} $$ " +
      "WITH (watermark_column 'updated_at', source_table 'public.qr2', " +
      s"dest_dir '$base/dest', num_partitions '3')")

    assert(run("EXECUTE MIRROR lq2").head.getLong(0) == 100L)
    assert(run("EXECUTE MIRROR lq2").head.getLong(0) == 0L)

    // 40 more rows continuing INSIDE the last pulled second
    s.psql("""INSERT INTO public.qr2
      SELECT g, to_timestamp(1700000000 + g * 0.25)
      FROM generate_series(100, 139) g""")
    assert(run("EXECUTE MIRROR lq2").head.getLong(0) == 40L)
    assert(spark.read.parquet(s"$base/dest").count() == 140)
    // exact micros fidelity through the wire + JSON decode
    val micros = spark.read.parquet(s"$base/dest")
      .selectExpr("k", "unix_micros(updated_at) AS us")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(micros.forall { case (k, us) =>
      us == 1700000000000000L + k * 250000L })

    run("DROP MIRROR lq2"); run("DROP PEER ltsrc"); run("DROP PEER ltdst")
  }
}
