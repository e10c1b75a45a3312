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

  test("timestamp watermark on a NON-UTC server: the session is " +
    "pinned to TimeZone=UTC, so extract(epoch) over a `timestamp " +
    "without time zone` and the to_timestamp(µs) bounds agree — no " +
    "miss, no re-pull (on a tz-shifted session the window moves by " +
    "the offset and rows are skipped forever)") {
    // a dedicated server whose cluster default is 9h AHEAD of UTC —
    // without the session pin, round 1's sub-range bounds shift +9h
    // past every row and the pull silently drops nearly all of them
    val tzServer = StockPostgres.start(
      extraConf = Seq("timezone='Asia/Tokyo'"))
    assume(tzServer.isDefined, "stock postgres unavailable in this env")
    val s = tzServer.get
    try {
      assert(s.psql("SHOW timezone").trim == "Asia/Tokyo")
      s.psql("""CREATE TABLE public.qtz (
        k bigint PRIMARY KEY, updated_at timestamp)""")
      // `timestamp` (NO time zone): the dangerous type — epoch
      // extraction reads it as UTC, bound rendering reads the session
      s.psql("""INSERT INTO public.qtz
        SELECT g, timestamp '2024-03-01 00:00:00'
                 + g * interval '250 milliseconds'
        FROM generate_series(0, 99) g""")

      val base = tmpDir("liveqreptz")
      run(s"CREATE PEER tzsrc TYPE postgres OPTIONS (" +
        s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
      run(s"CREATE PEER tzdst TYPE parquet OPTIONS (dir '$base/dst')")
      run("CREATE MIRROR lqtz FROM tzsrc TO tzdst FOR " +
        "$$ SELECT k, updated_at FROM public.qtz " +
        "WHERE updated_at BETWEEN {{.start_ts}} AND {{.end_ts}} $$ " +
        "WITH (watermark_column 'updated_at', " +
        "source_table 'public.qtz', " +
        s"dest_dir '$base/dest', num_partitions '3')")

      assert(run("EXECUTE MIRROR lqtz").head.getLong(0) == 100L,
        "full round dropped rows — session tz leaked into the window")
      assert(run("EXECUTE MIRROR lqtz").head.getLong(0) == 0L,
        "idle round re-pulled — bounds shifted backwards")

      // rows landing just past the stored watermark: the exact window
      // a tz-shifted lower bound (+9h) would skip permanently
      s.psql("""INSERT INTO public.qtz
        SELECT g, timestamp '2024-03-01 00:00:00'
                 + g * interval '250 milliseconds'
        FROM generate_series(100, 139) g""")
      assert(run("EXECUTE MIRROR lqtz").head.getLong(0) == 40L,
        "incremental rows missed — watermark advanced past them")
      // `timestamp` (no tz) decodes as TIMESTAMP_NTZ; the session is
      // UTC so the cast is identity on the wall clock
      val got = spark.read.parquet(s"$base/dest")
        .selectExpr("k",
          "unix_micros(cast(updated_at AS timestamp)) AS us")
        .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == 140)
      // micros-exact: stored wall-clock == decoded UTC instant
      assert(got.forall { case (k, us) =>
        us == 1709251200000000L + k * 250000L })

      run("DROP MIRROR lqtz"); run("DROP PEER tzsrc")
      run("DROP PEER tzdst")
    } finally s.stop()
  }

  test("snapshot-consistent round: a write committed MID-ROUND (after " +
    "the probes, before the partition reads) is invisible to every " +
    "partition and arrives complete in the NEXT round — no torn read, " +
    "no permanently-skipped row") {
    val s = srv
    s.psql("CREATE TABLE public.qr3 (id bigint PRIMARY KEY, wm bigint)")
    s.psql("""INSERT INTO public.qr3
      SELECT g, g FROM generate_series(1, 1000) g""")

    val base = tmpDir("liveqrepsnap")
    run(s"CREATE PEER scsrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER scdst TYPE parquet OPTIONS (dir '$base/dst')")
    run("CREATE MIRROR lq3 FROM scsrc TO scdst FOR " +
      "$$ SELECT id, wm FROM public.qr3 " +
      "WHERE wm BETWEEN {{.start}} AND {{.end}} $$ " +
      "WITH (watermark_column 'wm', source_table 'public.qr3', " +
      s"dest_dir '$base/dest', num_partitions '4')")

    // mid-round write: wm values INSIDE already-probed ranges (5 rows
    // at wm 1..5 with fresh ids) plus beyond-max rows. Without the
    // shared snapshot, which partitions see them is a timing accident;
    // with it, NONE do — and the beyond-max rows arrive next round.
    graft.qrep.LivePgPull.afterExportHook = () => {
      s.psql("""INSERT INTO public.qr3 VALUES
        (2001, 1), (2002, 2), (2003, 3), (2004, 4), (2005, 5),
        (2006, 1001), (2007, 1002)""")
    }
    try {
      assert(run("EXECUTE MIRROR lq3").head.getLong(0) == 1000L,
        "mid-round writes leaked into the snapshot round")
    } finally {
      graft.qrep.LivePgPull.afterExportHook = () => ()
    }
    // next round: the beyond-max rows stream in; the low-wm rows are
    // out of the watermark contract (wm must be monotone) and stay
    // excluded — deterministically, not by race
    assert(run("EXECUTE MIRROR lq3").head.getLong(0) == 2L)
    val ids = spark.read.parquet(s"$base/dest")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(2006L) && ids.contains(2007L))
    assert(!ids.contains(2001L))

    run("DROP MIRROR lq3"); run("DROP PEER scsrc"); run("DROP PEER scdst")
  }

  test("live QRep through an SSH tunnel: the peer URL's ssh= param " +
    "routes every round connection (holder + partition pulls) through " +
    "the bastion — PgClients transport parity with the capture pump") {
    val s = srv
    val bastion = graft.cdc.SshTestServer.start(
      graft.cdc.SshTestServer.Auth("hop", Some("hoppw"), None))
    try {
      s.psql("CREATE TABLE public.qr4 (id bigint PRIMARY KEY, wm bigint)")
      s.psql("""INSERT INTO public.qr4
        SELECT g, g FROM generate_series(1, 800) g""")
      val base = tmpDir("liveqrepssh")
      run(s"CREATE PEER tunsrc TYPE postgres OPTIONS (" +
        s"url 'pg://postgres@127.0.0.1:${s.port}/postgres" +
        s"?ssh=hop:hoppw@127.0.0.1:${bastion.port}')")
      run(s"CREATE PEER tundst TYPE parquet OPTIONS (dir '$base/dst')")
      run("CREATE MIRROR lq4 FROM tunsrc TO tundst FOR " +
        "$$ SELECT id, wm FROM public.qr4 " +
        "WHERE wm BETWEEN {{.start}} AND {{.end}} $$ " +
        "WITH (watermark_column 'wm', source_table 'public.qr4', " +
        s"dest_dir '$base/dest', num_partitions '3')")
      assert(run("EXECUTE MIRROR lq4").head.getLong(0) == 800L)
      s.psql("INSERT INTO public.qr4 VALUES (900, 900)")
      assert(run("EXECUTE MIRROR lq4").head.getLong(0) == 1L)
      assert(spark.read.parquet(s"$base/dest").count() == 801)
      run("DROP MIRROR lq4"); run("DROP PEER tunsrc")
      run("DROP PEER tundst")
    } finally bastion.stop()
  }

  test("fully-live PG→PG QRep, upsert mode: live source pull + live " +
    "destination MERGE; watermark-advancing updates land by key, " +
    "replayed rounds are no-ops") {
    val s = srv
    s.psql("CREATE DATABASE qrepdest")
    s.psql("CREATE TABLE public.qu1 (id bigint PRIMARY KEY, " +
      "wm bigint, v text)")
    s.psql("""INSERT INTO public.qu1
      SELECT g, g, 'v' || g FROM generate_series(1, 2000) g""")

    val base = tmpDir("liveq2q")
    run(s"CREATE PEER upsrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER updst TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/qrepdest')")
    run("CREATE MIRROR lq5 FROM upsrc TO updst FOR " +
      "$$ SELECT id, wm, v FROM public.qu1 " +
      "WHERE wm BETWEEN {{.start}} AND {{.end}} $$ " +
      "WITH (watermark_column 'wm', source_table 'public.qu1', " +
      s"dest_dir '$base/dest', num_partitions '4', mode 'upsert', " +
      "unique_key 'id', " +
      s"dest_url 'pg://postgres@127.0.0.1:${s.port}/qrepdest', " +
      "dest_table 'public.qu1_mirror')")

    def truth(): String = s.psql("SELECT count(*) || ':' || " +
      "md5(string_agg(id || '|' || wm || '|' || v, E'\\n' " +
      "ORDER BY id)) FROM public.qu1")
    def dest(): String = s.psql("SELECT count(*) || ':' || " +
      "md5(string_agg(id || '|' || wm || '|' || v, E'\\n' " +
      "ORDER BY id)) FROM public.qu1_mirror", db = "qrepdest")

    assert(run("EXECUTE MIRROR lq5").head.getLong(0) == 2000L)
    assert(dest() == truth(), "live upsert round diverged")

    // watermark-advancing UPDATE (the QRep update contract) + inserts
    s.psql("UPDATE public.qu1 SET wm = 3001, v = 'updated' WHERE id = 5")
    s.psql("INSERT INTO public.qu1 VALUES (3000, 3000, 'fresh')")
    assert(run("EXECUTE MIRROR lq5").head.getLong(0) == 2L)
    assert(dest() == truth(), "incremental upsert diverged")
    assert(s.psql("SELECT v FROM public.qu1_mirror WHERE id = 5",
      db = "qrepdest").trim == "updated")

    // idle replay: no-op
    assert(run("EXECUTE MIRROR lq5").head.getLong(0) == 0L)
    assert(dest() == truth())

    run("DROP MIRROR lq5"); run("DROP PEER upsrc"); run("DROP PEER updst")
  }

  test("live XMIN flavor: watermark_column 'xmin' scans by the " +
    "system column — full round, idle no-op, then exactly the " +
    "updated+inserted rows (wraparound-safe age() filter); offset " +
    "advances to the round's snapshot xmin") {
    val s = srv
    s.psql("CREATE TABLE public.xm1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("""INSERT INTO public.xm1
      SELECT g, g FROM generate_series(1, 1000) g""")

    val base = tmpDir("livexmin")
    run(s"CREATE PEER xmsrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER xmdst TYPE parquet OPTIONS (dir '$base/dst')")
    run("CREATE MIRROR lqx FROM xmsrc TO xmdst FOR " +
      "$$ SELECT id, v, xmin FROM public.xm1 $$ " +
      "WITH (watermark_column 'xmin', source_table 'public.xm1', " +
      s"dest_dir '$base/dest')")

    assert(run("EXECUTE MIRROR lqx").head.getLong(0) == 1000L)
    assert(run("EXECUTE MIRROR lqx").head.getLong(0) == 0L) // idle

    // churn: 5 updates + 2 inserts — exactly those xmins are newer
    s.psql("UPDATE public.xm1 SET v = -v WHERE id <= 5")
    s.psql("INSERT INTO public.xm1 VALUES (2001, 1), (2002, 2)")
    assert(run("EXECUTE MIRROR lqx").head.getLong(0) == 7L)
    assert(run("EXECUTE MIRROR lqx").head.getLong(0) == 0L)

    // xmin never reaches the destination; updated images landed
    val dest = spark.read.parquet(s"$base/dest")
    assert(dest.columns.toSeq.sorted == Seq("id", "v"))
    assert(dest.count() == 1007) // append disposition: 1000 + 7
    assert(dest.filter(org.apache.spark.sql.functions.col("id") === 1L)
      .select("v").collect().map(_.getLong(0)).toSet == Set(1L, -1L))

    run("DROP MIRROR lqx"); run("DROP PEER xmsrc"); run("DROP PEER xmdst")
    s.psql("DROP TABLE public.xm1")
  }

  test("live XMIN flavor, upsert mode: at-least-once redelivery " +
    "CONVERGES by key (version = the row's creating xmin) instead of " +
    "accumulating duplicates; the destination tracks updates in place") {
    val s = srv
    s.psql("CREATE TABLE public.xm2 (id bigint PRIMARY KEY, v bigint)")
    s.psql("""INSERT INTO public.xm2
      SELECT g, g FROM generate_series(1, 500) g""")

    val base = tmpDir("livexminup")
    run(s"CREATE PEER xusrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER xudst TYPE parquet OPTIONS (dir '$base/dst')")
    run("CREATE MIRROR lqxu FROM xusrc TO xudst FOR " +
      "$$ SELECT id, v, xmin FROM public.xm2 $$ " +
      "WITH (watermark_column 'xmin', source_table 'public.xm2', " +
      s"dest_dir '$base/dest', mode 'upsert', unique_key 'id')")

    assert(run("EXECUTE MIRROR lqxu").head.getLong(0) == 500L)
    assert(run("EXECUTE MIRROR lqxu").head.getLong(0) == 0L) // idle

    // churn: every re-pulled UPDATE must land by key, not append —
    // this was the silent append-degradation before the mode wired
    s.psql("UPDATE public.xm2 SET v = -v WHERE id <= 5")
    s.psql("INSERT INTO public.xm2 VALUES (9001, 1)")
    assert(run("EXECUTE MIRROR lqxu").head.getLong(0) == 6L)

    val dest = spark.read.parquet(s"$base/dest")
    assert(dest.count() == 501, "upsert mode must converge, not append")
    assert(dest.select("id").distinct().count() == 501)
    val vOf = dest.select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(i => vOf(i) == -i), "updates did not win")
    assert(vOf(9001L) == 1L)
    // xmin is the VERSION, never a payload column
    assert(!dest.columns.contains("xmin"))

    run("DROP MIRROR lqxu"); run("DROP PEER xusrc"); run("DROP PEER xudst")
    s.psql("DROP TABLE public.xm2")
  }

  test("NTILE partition strategy balances a SKEWED watermark: " +
    "per-partition row counts within 2x (uniform split would put " +
    "~everything on one connection), boundary ties pull exactly once") {
    val s = srv
    s.psql("CREATE TABLE public.qsk (id bigint PRIMARY KEY, wm bigint)")
    // 900 rows crammed into wm [77,900] plus 100 rows out at [10M..]:
    // a uniform 4-way split of the value span puts 900+0+0+100 on
    // the connections; NTILE targets 250 rows each. 300 rows TIE on
    // wm=77, so the first bucket boundary (row 250) lands INSIDE the
    // tie run — the chained ranges must still pull each row once.
    s.psql("""INSERT INTO public.qsk
      SELECT g, CASE WHEN g <= 300 THEN 77 WHEN g <= 900 THEN g
                     ELSE 10000000 + g END
      FROM generate_series(1, 1000) g""")

    val url = s"pg://postgres@127.0.0.1:${s.port}/postgres"
    val df = graft.qrep.LivePgPull.pull(spark, url,
      "SELECT id, wm FROM public.qsk " +
        "WHERE wm BETWEEN {{.start}} AND {{.end}}",
      "wm", last = None, numPartitions = 4, strategy = "ntile")
    // exactly once, ties included
    assert(df.count() == 1000)
    assert(df.select("id").distinct().count() == 1000)
    val sizes = df.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().map(_._2).filter(_ > 0)
    assert(sizes.sum == 1000)
    assert(sizes.max <= 2 * sizes.min,
      s"ntile partitions unbalanced: ${sizes.mkString(",")}")

    // uniform on the same data concentrates the round (the contrast
    // that motivates the strategy)
    val uni = graft.qrep.LivePgPull.pull(spark, url,
      "SELECT id, wm FROM public.qsk " +
        "WHERE wm BETWEEN {{.start}} AND {{.end}}",
      "wm", last = None, numPartitions = 4, strategy = "uniform")
    val uniSizes = uni.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().map(_._2)
    assert(uniSizes.sum == 1000)
    assert(uniSizes.max == 900, s"expected the dense block on one " +
      s"uniform partition, got ${uniSizes.mkString(",")}")

    s.psql("DROP TABLE public.qsk")
  }

  test("overwrite is ATOMIC on a live destination: a round that dies " +
    "mid-COPY rolls back and leaves the PREVIOUS snapshot intact " +
    "(truncate+copy commit together)") {
    val s = srv
    s.psql("CREATE DATABASE qrepatomic")
    // the destination table pre-exists with a CHECK the second round
    // will violate mid-COPY — the injected "crash"
    s.psql("CREATE TABLE public.qo_dest (id bigint, wm bigint " +
      "CHECK (wm < 100000))", db = "qrepatomic")

    val spark0 = spark
    import spark0.implicits._
    val base = tmpDir("liveqatomic")
    val cfg = graft.qrep.QRepConfig(
      wmarkColumn = "wm", destDir = s"$base/dest",
      wmarkStorePath = s"$base/wm", mode = graft.qrep.WriteMode.Overwrite,
      numPartitions = 2,
      destUrl = Some(s"pg://postgres@127.0.0.1:${s.port}/qrepatomic"),
      destTable = "public.qo_dest")
    val runner = new graft.qrep.QRepRunner(spark, cfg)

    val round1 = (1L to 500L).map(i => (i, i)).toDF("id", "wm")
    assert(runner.runOnce(round1) == 500L)
    assert(s.psql("SELECT count(*) FROM public.qo_dest",
      db = "qrepatomic").trim == "500")

    // round 2 carries a row the CHECK rejects: COPY fails after the
    // TRUNCATE already ran — atomicity means the 500 rows survive
    val round2 = ((1L to 300L) :+ 999999L).map(i => (i, i))
      .toDF("id", "wm")
    intercept[Exception] { runner.runOnce(round2) }
    assert(s.psql("SELECT count(*) FROM public.qo_dest",
      db = "qrepatomic").trim == "500",
      "failed overwrite must leave the previous snapshot intact")

    // the session/runner recovers: a clean retry round still lands
    val round3 = (1L to 200L).map(i => (i, i)).toDF("id", "wm")
    assert(runner.runOnce(round3) == 200L)
    assert(s.psql("SELECT count(*) FROM public.qo_dest",
      db = "qrepatomic").trim == "200")
  }

  test("fully-live PG→PG QRep, append and overwrite dispositions: " +
    "plain query columns COPY'd into the live destination; overwrite " +
    "truncates first (full refresh)") {
    val s = srv
    s.psql("CREATE DATABASE qrepdest2")
    s.psql("CREATE TABLE public.qa1 (id bigint PRIMARY KEY, wm bigint)")
    s.psql("""INSERT INTO public.qa1
      SELECT g, g FROM generate_series(1, 1500) g""")

    val base = tmpDir("liveq2qa")
    run(s"CREATE PEER apsrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER apdst TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/qrepdest2')")
    run("CREATE MIRROR lq6 FROM apsrc TO apdst FOR " +
      "$$ SELECT id, wm FROM public.qa1 " +
      "WHERE wm BETWEEN {{.start}} AND {{.end}} $$ " +
      "WITH (watermark_column 'wm', source_table 'public.qa1', " +
      s"dest_dir '$base/dest', num_partitions '3', " +
      s"dest_url 'pg://postgres@127.0.0.1:${s.port}/qrepdest2', " +
      "dest_table 'public.qa1_app')")
    assert(run("EXECUTE MIRROR lq6").head.getLong(0) == 1500L)
    s.psql("INSERT INTO public.qa1 VALUES (2000, 2000)")
    assert(run("EXECUTE MIRROR lq6").head.getLong(0) == 1L)
    assert(s.psql("SELECT count(*) FROM public.qa1_app",
      db = "qrepdest2").trim == "1501")

    run("CREATE MIRROR lq7 FROM apsrc TO apdst FOR " +
      "$$ SELECT id, wm FROM public.qa1 " +
      "WHERE wm BETWEEN {{.start}} AND {{.end}} $$ " +
      "WITH (watermark_column 'wm', source_table 'public.qa1', " +
      s"dest_dir '$base/dest2', num_partitions '3', mode 'overwrite', " +
      s"dest_url 'pg://postgres@127.0.0.1:${s.port}/qrepdest2', " +
      "dest_table 'public.qa1_ovr')")
    assert(run("EXECUTE MIRROR lq7").head.getLong(0) == 1501L)
    s.psql("DELETE FROM public.qa1 WHERE id > 1400")
    // full refresh: the overwrite round reflects deletes too
    assert(run("EXECUTE MIRROR lq7").head.getLong(0) == 1400L)
    assert(s.psql("SELECT count(*) FROM public.qa1_ovr",
      db = "qrepdest2").trim == "1400")

    run("DROP MIRROR lq6"); run("DROP MIRROR lq7")
    run("DROP PEER apsrc"); run("DROP PEER apdst")
  }

  test("dst_table_full_resync: the overwrite refresh builds " +
    "<dest>_peerdb_resync ASIDE and swaps in one transaction " +
    "(qrep_flow.go:365-400) — repeated rounds converge, the aside " +
    "table never lingers, and the DDL rejects the option off the " +
    "overwrite+dest_url shape") {
    val s = srv
    s.psql("CREATE DATABASE qrepdest3")
    s.psql("CREATE TABLE public.fr1 (id bigint PRIMARY KEY, wm bigint)")
    s.psql("""INSERT INTO public.fr1
      SELECT g, g FROM generate_series(1, 800) g""")

    val base = tmpDir("liveqfr")
    run(s"CREATE PEER frsrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER frdst TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/qrepdest3')")
    run("CREATE MIRROR lqfr FROM frsrc TO frdst FOR " +
      "$$ SELECT id, wm FROM public.fr1 " +
      "WHERE wm BETWEEN {{.start}} AND {{.end}} $$ " +
      "WITH (watermark_column 'wm', source_table 'public.fr1', " +
      s"dest_dir '$base/dest', num_partitions '3', mode 'overwrite', " +
      "dst_table_full_resync 'true', " +
      s"dest_url 'pg://postgres@127.0.0.1:${s.port}/qrepdest3', " +
      "dest_table 'public.fr1_ovr')")
    assert(run("EXECUTE MIRROR lqfr").head.getLong(0) == 800L)
    assert(s.psql("SELECT count(*) FROM public.fr1_ovr",
      db = "qrepdest3").trim == "800")
    // the aside table swapped away — it must not linger
    assert(s.psql("SELECT count(*) FROM pg_class WHERE relname = " +
      "'fr1_ovr_peerdb_resync'", db = "qrepdest3").trim == "0")
    // refresh reflects deletes and repeats cleanly
    s.psql("DELETE FROM public.fr1 WHERE id > 500")
    assert(run("EXECUTE MIRROR lqfr").head.getLong(0) == 500L)
    assert(s.psql("SELECT count(*) FROM public.fr1_ovr",
      db = "qrepdest3").trim == "500")
    assert(run("EXECUTE MIRROR lqfr").head.getLong(0) == 500L)
    run("DROP MIRROR lqfr")

    // DDL validation: the option needs overwrite + dest_url
    val e = intercept[IllegalArgumentException] {
      run("CREATE MIRROR lqfrbad FROM frsrc TO frdst FOR " +
        "$$ SELECT id, wm FROM public.fr1 " +
        "WHERE wm BETWEEN {{.start}} AND {{.end}} $$ " +
        "WITH (watermark_column 'wm', source_table 'public.fr1', " +
        s"dest_dir '$base/destb', dst_table_full_resync 'true')")
    }
    assert(e.getMessage.contains("dst_table_full_resync"))
    run("DROP PEER frsrc"); run("DROP PEER frdst")
  }

  test("ctid watermark: block-partitioned full pull (the reference's " +
    "initial-load flavor, CTIDBlockPartitioningFunc) — every round a " +
    "full refresh; non-overwrite modes and non-pg sources rejected " +
    "at DDL; mirror.ctid_partitioning 'false' still pulls (one scan)") {
    val s = srv
    s.psql("""CREATE TABLE public.qrc (
      id bigint PRIMARY KEY, v bigint, t text)""")
    s.psql("""INSERT INTO public.qrc
      SELECT g, g * 3, 'c-' || g FROM generate_series(1, 8000) g""")
    val base = tmpDir("ctidqrep")
    run(s"CREATE PEER qcsrc TYPE postgres OPTIONS (" +
      s"url 'pg://postgres@127.0.0.1:${s.port}/postgres')")
    run(s"CREATE PEER qcdst TYPE parquet OPTIONS (dir '$base/dst')")
    run("CREATE MIRROR qc1 FROM qcsrc TO qcdst FOR " +
      "$$ SELECT id, v, t FROM public.qrc " +
      "WHERE ctid BETWEEN {{.start}} AND {{.end}} $$ " +
      "WITH (watermark_column 'ctid', source_table 'public.qrc', " +
      s"dest_dir '$base/dest', num_partitions '4')")
    assert(run("EXECUTE MIRROR qc1").head.getLong(0) == 8000L)
    // a second round is a FULL refresh (ctid never resumes) — and a
    // source update must land (overwrite semantics)
    s.psql("UPDATE public.qrc SET v = -5 WHERE id = 77")
    s.psql("DELETE FROM public.qrc WHERE id > 7990")
    assert(run("EXECUTE MIRROR qc1").head.getLong(0) == 7990L)
    val dest = spark.read.parquet(s"$base/dest")
    assert(dest.count() == 7990L)
    assert(dest.filter(org.apache.spark.sql.functions.col("id") === 77)
      .head().getAs[Long]("v") == -5L)

    // gate off + no num_partitions → single-scan fallback, same rows
    run("CREATE MIRROR qc2 FROM qcsrc TO qcdst FOR " +
      "$$ SELECT id, v, t FROM public.qrc " +
      "WHERE ctid BETWEEN {{.start}} AND {{.end}} $$ " +
      "WITH (watermark_column 'ctid', source_table 'public.qrc', " +
      s"dest_dir '$base/dest2', env 'mirror.ctid_partitioning=false')")
    assert(run("EXECUTE MIRROR qc2").head.getLong(0) == 7990L)

    // DDL gates: mode append; a parquet source peer
    val e1 = intercept[IllegalArgumentException] {
      run("CREATE MIRROR qcbad FROM qcsrc TO qcdst FOR " +
        "$$ SELECT id FROM public.qrc " +
        "WHERE ctid BETWEEN {{.start}} AND {{.end}} $$ " +
        "WITH (watermark_column 'ctid', source_table 'public.qrc', " +
        s"dest_dir '$base/destx', mode 'append')")
    }
    assert(e1.getMessage.contains("full-load"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      run("CREATE MIRROR qcbad2 FROM qcdst TO qcdst FOR " +
        "$$ SELECT id FROM t WHERE ctid BETWEEN {{.start}} AND " +
        "{{.end}} $$ WITH (watermark_column 'ctid', " +
        s"source_table 't', dest_dir '$base/desty')")
    }
    assert(e2.getMessage.contains("live pg://"), e2.getMessage)

    run("DROP MIRROR qc1"); run("DROP MIRROR qc2")
    run("DROP PEER qcsrc"); run("DROP PEER qcdst")
    s.psql("DROP TABLE public.qrc")
  }
}
