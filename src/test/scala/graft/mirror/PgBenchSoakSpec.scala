package graft.mirror

import scala.sys.process._

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.StockPostgres

/** pgbench churn soak through the FULLY live mirror: stock PostgreSQL
  * on both ends, stock pgbench generating the workload. The publication
  * (FOR ALL TABLES) and slot are created BEFORE `pgbench -i`, so the
  * initial 100k-row account COPY arrives through the replication
  * stream as one large catch-up transaction — the reference's headline
  * "initial load then keep up with OLTP churn" shape
  * (flow/connectors/postgres/cdc.go) — followed by TPC-B transaction
  * churn (3 UPDATEs + 1 INSERT per tx). Along the way the REAL server
  * emits everything a production source does that fixtures tend to
  * omit: Truncate messages from pgbench's init (decoded and dropped,
  * the reference's warn path), Relation re-announcements, inserts
  * before the PK index exists, and multi-statement transactions cut
  * atomically.
  *
  * Oracle: per-table md5 checksum of every row, identical SQL on the
  * live source and the live pg:// destination.
  */
class PgBenchSoakSpec extends SparkSpec {

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
    assume(new java.io.File("/usr/bin/pgbench").exists(),
      "pgbench unavailable")
    server.get
  }

  private def pgbench(s: StockPostgres.Server, args: String*): Unit = {
    val err = new StringBuilder
    val code = Process(Seq("/usr/bin/pgbench", "-h", "127.0.0.1",
      "-p", s.port.toString, "-U", "postgres") ++ args ++ Seq("postgres"))
      .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
    require(code == 0, s"pgbench failed ($code): $err")
  }

  /** Whole-table checksum; identical SQL both sides (the destination
    * adds the soft-delete predicate). rtrim applies PG's own char(n)
    * equality semantic: the source's bpchar::text cast strips the
    * blank padding while the replicated wire value (the bpchar output
    * function) keeps it — trailing blanks are insignificant in
    * char(n) comparisons, so both sides normalize the same way. */
  private def checksum(s: StockPostgres.Server, db: String,
      table: String, cols: Seq[String], pk: String,
      softDeleteFilter: Boolean): String = {
    val row = cols.map(c => s"coalesce(rtrim($c::text),'')")
      .mkString(" || '|' || ")
    val where = if (softDeleteFilter) "WHERE NOT _peerdb_is_deleted" else ""
    s.psql(s"SELECT count(*) || ':' || " +
      s"coalesce(md5(string_agg($row, E'\\n' ORDER BY $pk)), '-') " +
      s"FROM public.$table $where", db = db)
  }

  test("pgbench soak: 100k-account catch-up COPY plus TPC-B churn " +
    "through pgwire:// source and pg:// destination — all three keyed " +
    "tables checksum-equal to the live source") {
    val s = srv
    // publication+slot FIRST: pgbench -i's truncates, table drops, and
    // the full initial data load all flow through the slot
    s.psql("CREATE PUBLICATION bench_pub FOR ALL TABLES")
    s.psql("SELECT pg_create_logical_replication_slot(" +
      "'bench_slot', 'pgoutput')")
    s.psql("CREATE DATABASE benchdest")

    pgbench(s, "-i", "-s", "1", "--no-vacuum")

    def tc(cols: (String, DataType)*) = TableConfig(
      Seq(cols.head._1),
      StructType(cols.map { case (n, t) => StructField(n, t) }))
    val base = tmpDir("pgbenchsoak")
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("aid"),
      payloadSchema = StructType(Seq(
        StructField("aid", IntegerType), StructField("bid", IntegerType),
        StructField("abalance", IntegerType),
        StructField("filler", StringType))),
      destinationTable = "public.pgbench_accounts",
      captureDir = Some(s"pgwire://postgres@127.0.0.1:${s.port}" +
        "/postgres?slot=bench_slot&publication=bench_pub"),
      warehouseUrl = Some(s"pg://postgres@127.0.0.1:${s.port}/benchdest"),
      // pgbench_history is unrouted on purpose: no PK, insert-only —
      // exclusion by omission, the reference's table-mapping behavior
      extraTables = Map(
        "public.pgbench_branches" -> tc("bid" -> IntegerType,
          "bbalance" -> IntegerType, "filler" -> StringType),
        "public.pgbench_tellers" -> tc("tid" -> IntegerType,
          "bid" -> IntegerType, "tbalance" -> IntegerType,
          "filler" -> StringType)))
    val runner = new MirrorRunner(spark, cfg)

    val tables = Seq(
      ("pgbench_accounts", Seq("aid", "bid", "abalance", "filler"), "aid"),
      ("pgbench_branches", Seq("bid", "bbalance", "filler"), "bid"),
      ("pgbench_tellers", Seq("tid", "bid", "tbalance", "filler"), "tid"))
    def assertEqual(stage: String): Unit = tables.foreach {
      case (t, cols, pk) =>
        val src = checksum(s, "postgres", t, cols, pk,
          softDeleteFilter = false)
        val dst = checksum(s, "benchdest", t, cols, pk,
          softDeleteFilter = true)
        assert(dst == src, s"$stage: $t destination != source")
    }

    // catch-up drain: ~100k COPY'd inserts in one transaction plus the
    // small branch/teller seeds, through decode → raw → normalize →
    // COPY-stage → MERGE into the live destination
    val t0 = System.nanoTime()
    runner.runAvailableNow()
    val catchupSec = (System.nanoTime() - t0) / 1e9
    assertEqual("after catch-up")
    val accounts = s.psql(
      "SELECT count(*) FROM public.pgbench_accounts",
      db = "benchdest").trim
    assert(accounts == "100000")
    info(f"catch-up: 100k-account COPY backlog drained in " +
      f"$catchupSec%.1f s (${100000 / catchupSec}%.0f rec/s proper)")

    // steady churn: 1000 TPC-B transactions = 3000 UPDATEs across the
    // three keyed tables + 1000 unrouted history INSERTs
    pgbench(s, "-c", "4", "-t", "250", "-n")
    val t1 = System.nanoTime()
    runner.runAvailableNow()
    val churnSec = (System.nanoTime() - t1) / 1e9
    assertEqual("after churn")
    info(f"churn: 1000 tx (4000 records) drained in $churnSec%.1f s")

    // a second churn round on the same runner (steady state, not
    // first-batch effects), then an idle drain that must change nothing
    pgbench(s, "-c", "4", "-t", "250", "-n")
    runner.runAvailableNow()
    assertEqual("after churn round 2")
    runner.runAvailableNow()
    assertEqual("after idle drain")

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='bench_slot'")
  }

  test("snapshot handoff UNDER LIVE FIRE: initialLoad runs while " +
    "pgbench churn is actively committing — slot creation reaches " +
    "consistency mid-traffic, the snapshot reads race thousands of " +
    "updates, and the drain converges to the exact source state") {
    val s = srv
    // fresh pgbench corpus on its own database to isolate from the
    // first test's tables
    s.psql("CREATE DATABASE fire")
    s.psql("CREATE DATABASE firedest")
    val err = new StringBuilder
    val init = Process(Seq("/usr/bin/pgbench", "-h", "127.0.0.1",
      "-p", s.port.toString, "-U", "postgres", "-i", "-s", "1",
      "--no-vacuum", "fire"))
      .!(ProcessLogger(_ => (), l => err.append(l).append('\n')))
    require(init == 0, s"pgbench -i failed: $err")
    s.psql("CREATE PUBLICATION fire_pub FOR TABLE " +
      "public.pgbench_accounts, public.pgbench_branches, " +
      "public.pgbench_tellers", db = "fire")

    def tc(cols: (String, DataType)*) = TableConfig(
      Seq(cols.head._1),
      StructType(cols.map { case (n, t) => StructField(n, t) }))
    val base = tmpDir("firesoak")
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("aid"),
      payloadSchema = StructType(Seq(
        StructField("aid", IntegerType), StructField("bid", IntegerType),
        StructField("abalance", IntegerType),
        StructField("filler", StringType))),
      destinationTable = "public.pgbench_accounts",
      captureDir = Some(s"pgwire://postgres@127.0.0.1:${s.port}" +
        "/fire?slot=fire_slot&publication=fire_pub"),
      warehouseUrl = Some(s"pg://postgres@127.0.0.1:${s.port}/firedest"),
      extraTables = Map(
        "public.pgbench_branches" -> tc("bid" -> IntegerType,
          "bbalance" -> IntegerType, "filler" -> StringType),
        "public.pgbench_tellers" -> tc("tid" -> IntegerType,
          "bid" -> IntegerType, "tbalance" -> IntegerType,
          "filler" -> StringType)))

    // churn in the background for the whole snapshot phase: 4 clients
    // for a fixed 30 s window, which outlasts slot creation + the
    // CTID reads + the bootstrap MERGE (the info line below records
    // that the overlap really happened)
    val churn = Process(Seq("/usr/bin/pgbench", "-h", "127.0.0.1",
      "-p", s.port.toString, "-U", "postgres", "-c", "4", "-T", "30",
      "-n", "fire")).run(ProcessLogger(_ => (), _ => ()))
    val runner = try {
      Thread.sleep(500) // let the churn establish before the slot
      val r = SnapshotFlow.initialLoad(spark, cfg, numPartitions = 4)
      info(s"churn still live when snapshot phase finished: " +
        s"${churn.isAlive()}")
      r
    } finally {
      require(churn.exitValue() == 0, "pgbench churn failed")
    }

    runner.runAvailableNow()
    // one extra drain in case the last commits landed after the
    // previous pull's keepalive cut
    runner.runAvailableNow()

    val tables = Seq(
      ("pgbench_accounts", Seq("aid", "bid", "abalance", "filler"), "aid"),
      ("pgbench_branches", Seq("bid", "bbalance", "filler"), "bid"),
      ("pgbench_tellers", Seq("tid", "bid", "tbalance", "filler"), "tid"))
    tables.foreach { case (t, cols, pk) =>
      val row = cols.map(c => s"coalesce(rtrim($c::text),'')")
        .mkString(" || '|' || ")
      val q = s"SELECT count(*) || ':' || coalesce(md5(string_agg(" +
        s"$row, E'\\n' ORDER BY $pk)), '-') FROM public.$t"
      val src = s.psql(q, db = "fire")
      val dst = s.psql(q.replace(s"FROM public.$t",
        s"FROM public.$t WHERE NOT _peerdb_is_deleted"), db = "firedest")
      assert(dst == src, s"under-fire handoff diverged on $t")
    }
    s.psql("SELECT pg_drop_replication_slot('fire_slot')", db = "fire")
  }
}
