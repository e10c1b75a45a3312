package graft.mirror

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.StockPostgres

/** The consistent snapshot→CDC handoff pinned against a REAL stock
  * PostgreSQL 15 server — the reference's initial-load correctness
  * story (snapshot_flow.go) executed live: CREATE_REPLICATION_SLOT on
  * a replication connection exports a snapshot; parallel partitions
  * read the tables AT it (CTID slices, SET TRANSACTION SNAPSHOT); the
  * CDC stream then resumes from the slot's consistent point. The
  * critical case is a write RACING the snapshot: committed after slot
  * creation, it must be invisible to the snapshot read and arrive
  * exactly once through the stream.
  */
class StockPgSnapshotSpec extends SparkSpec {

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

  test("parseLsn round-trips the wire text form") {
    assert(SnapshotFlow.parseLsn("0/16B3748") == 0x16B3748L)
    assert(SnapshotFlow.parseLsn("A/0") == (0xAL << 32))
    assert(SnapshotFlow.parseLsn("FFFFFFFF/FFFFFFFF") == -1L)
  }

  test("sliceCount policy: explicit count wins; rows knob over " +
    "reltuples; size-based default; clamps to blocks and 4096") {
    import SnapshotFlow.sliceCount
    val gib = 1L << 30
    // explicit partition count wins over everything
    assert(sliceCount(100000, 10 * gib, 1000000, 7, Some(1000)) == 7)
    // rows knob: ceil(estRows / rpp)
    assert(sliceCount(100000, 10 * gib, 1000000, 0, Some(250000)) == 4)
    assert(sliceCount(100000, 10 * gib, 1000001, 0, Some(250000)) == 5)
    // never-ANALYZEd table (estRows 0) falls back to the byte policy
    assert(sliceCount(100000, 10 * gib, 0, 0, Some(250000)) == 40)
    // byte policy: ceil(bytes / 256 MiB) — a 500 GB table gets 2000
    // slices, not 4
    assert(sliceCount(64000000, 500 * gib, 0, 0, None) == 2000)
    // tiny table: one slice, never zero
    assert(sliceCount(3, 24576, 100, 0, None) == 1)
    assert(sliceCount(0, 0, 0, 0, None) == 1)
    // a slice spans at least one physical block
    assert(sliceCount(5, 10 * gib, 1000000, 0, Some(1000)) == 5)
    // runaway protection
    assert(sliceCount(100000000, 800000 * gib, 0, 0, None) == 4096)
  }

  test("snapshot_num_rows_per_partition drives live slice count " +
    "through the server's reltuples estimate") {
    val s = srv
    s.psql("CREATE TABLE public.sz1 (id bigint PRIMARY KEY, t text)")
    s.psql("""INSERT INTO public.sz1
      SELECT g, 'v' || g FROM generate_series(1, 5000) g""")
    s.psql("ANALYZE public.sz1") // reltuples becomes exact
    s.psql("CREATE PUBLICATION sz_pub FOR TABLE public.sz1")
    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=sz_slot&publication=sz_pub"
    val session = SnapshotFlow.createExportedSlot(url)
    try {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("t", StringType)))
      val df = SnapshotFlow.readTable(spark, url,
        session.exported.snapshotName, "public.sz1", schema,
        numPartitions = 0, rowsPerPartition = Some(1000L))
      // ceil(5000 / 1000) = 5 CTID slices (table spans ≥ 5 blocks)
      assert(df.rdd.getNumPartitions == 5)
      assert(df.count() == 5000)
      assert(df.agg(sum(col("id"))).head.getLong(0) ==
        5000L * 5001 / 2)
      // auto (no knobs): a tiny table collapses to one slice — and a
      // big one would scale by bytes, not a fixed 4 (sliceCount test)
      val auto = SnapshotFlow.readTable(spark, url,
        session.exported.snapshotName, "public.sz1", schema)
      assert(auto.rdd.getNumPartitions == 1)
      assert(auto.count() == 5000)
    } finally session.close()
    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='sz_slot'")
    s.psql("DROP PUBLICATION sz_pub")
    s.psql("DROP TABLE public.sz1")
  }

  test("crash auto-recovery: a leftover INACTIVE slot is reclaimed " +
    "only when THIS mirror's durable intent marker proves a prior " +
    "attempt created it; a foreign inactive slot still refuses (42710)") {
    val s = srv
    s.psql("CREATE TABLE public.cr1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("""INSERT INTO public.cr1
      SELECT g, g FROM generate_series(1, 800) g""")
    s.psql("CREATE PUBLICATION cr_pub FOR TABLE public.cr1")
    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=cr_slot&publication=cr_pub"

    val base = tmpDir("snapcrash")
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      destinationTable = "public.cr1",
      captureDir = Some(url))

    // the "crash": a prior attempt of THIS mirror wrote its intent
    // marker, created the slot, then died before any snapshot marker
    // — exactly initialLoad's sequence up to the failure point
    graft.util.FsText.write(s"${cfg.walDir}/_graft_slot_intent",
      "cr_slot", spark.sparkContext.hadoopConfiguration)
    SnapshotFlow.createExportedSlot(url).close()
    assert(s.psql("SELECT count(*) FROM pg_replication_slots " +
      "WHERE slot_name = 'cr_slot'").trim == "1")

    // a plain retry (no recovery) still refuses — 42710 surfaces
    val e = intercept[graft.server.PgClient.PgServerError] {
      SnapshotFlow.createExportedSlot(url)
    }
    assert(e.sqlState == "42710")

    // a DIFFERENT fresh mirror pointed at the same (existing,
    // inactive, foreign-to-it) slot must NOT reclaim it: no intent
    // marker of its own → the 42710 surfaces and the slot survives
    val other = cfg.copy(walDir = s"$base/wal_other",
      rawDir = s"$base/raw_other", destDir = s"$base/dest_other",
      checkpointDir = s"$base/ckpt_other")
    val fe = intercept[graft.server.PgClient.PgServerError] {
      SnapshotFlow.initialLoad(spark, other)
    }
    assert(fe.sqlState == "42710")
    assert(s.psql("SELECT count(*) FROM pg_replication_slots " +
      "WHERE slot_name = 'cr_slot'").trim == "1",
      "a foreign mirror dropped someone else's slot")
    // a PLAIN RETRY of the foreign mirror must refuse too: its failed
    // attempt's intent marker was rolled back, so the retry cannot
    // read it as "my crashed attempt created this slot" and reclaim
    val fe2 = intercept[graft.server.PgClient.PgServerError] {
      SnapshotFlow.initialLoad(spark, other)
    }
    assert(fe2.sqlState == "42710",
      "the retry reclaimed a foreign slot via its own failed intent")
    assert(s.psql("SELECT count(*) FROM pg_replication_slots " +
      "WHERE slot_name = 'cr_slot'").trim == "1")

    // initialLoad on the ORIGINAL mirror (fresh + prior intent) drops
    // the stale slot, re-creates it at a FRESH consistent point, and
    // bootstraps — then the stream delivers post-snapshot churn
    val runner = SnapshotFlow.initialLoad(spark, cfg)
    assert(runner.destination("public.cr1").count() == 800)
    s.psql("INSERT INTO public.cr1 VALUES (901, -1)")
    runner.runAvailableNow()
    assert(runner.destination("public.cr1").count() == 801)

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='cr_slot'")
    s.psql("DROP PUBLICATION cr_pub")
    s.psql("DROP TABLE public.cr1")
  }

  test("initialLoad snapshots the SOURCE side of a renaming " +
    "table_map route and rejects fan-in") {
    val s = srv
    s.psql("CREATE TABLE public.srcr (id bigint PRIMARY KEY, v bigint)")
    s.psql("""INSERT INTO public.srcr
      SELECT g, g * 3 FROM generate_series(1, 600) g""")
    s.psql("CREATE PUBLICATION rt_pub FOR TABLE public.srcr")
    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=rt_slot&publication=rt_pub"
    val base = tmpDir("snaproute")
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      // destination name 'public.dstr' does NOT exist on the source:
      // a by-destination read would fail (or hit a wrong same-named
      // relation); the route must resolve back to public.srcr
      destinationTable = "public.dstr",
      captureDir = Some(url),
      tableRoutes = Map("public.srcr" -> "public.dstr"))
    val runner = SnapshotFlow.initialLoad(spark, cfg)
    assert(runner.destination("public.dstr").count() == 600)
    // CDC continues through the same route
    s.psql("UPDATE public.srcr SET v = 0 WHERE id <= 10")
    runner.runAvailableNow()
    assert(runner.destination("public.dstr")
      .filter(col("v") === 0).count() == 10)
    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='rt_slot'")

    // fan-in: two sources routed into one destination is rejected
    val cfg2 = cfg.copy(
      walDir = s"$base/wal2", rawDir = s"$base/raw2",
      destDir = s"$base/dest2", checkpointDir = s"$base/ckpt2",
      tableRoutes = Map("public.srcr" -> "public.dstr",
        "public.other" -> "public.dstr"))
    val fe = intercept[IllegalArgumentException] {
      SnapshotFlow.initialLoad(spark, cfg2)
    }
    assert(fe.getMessage.contains("fan"))
    s.psql("DROP PUBLICATION rt_pub")
    s.psql("DROP TABLE public.srcr")
  }

  test("packSlices: greedy block packing spans and splits relations " +
    "(the reference's ChildTableRanges example)") {
    // [T1:30, T2:20, T3:10] at 25 blocks/slice →
    // [T1:0-25) | T1:25-end + T2:0-end | T3:0-end
    val got = SnapshotFlow.packSlices(
      Seq(("t1", 30L), ("t2", 20L), ("t3", 10L)), 25L)
    assert(got == Seq(
      Seq(("t1", 0L, Some(25L))),
      Seq(("t1", 25L, None), ("t2", 0L, None)),
      Seq(("t3", 0L, None))))
    // empty relations contribute nothing; all-empty packs to nothing
    assert(SnapshotFlow.packSlices(Seq(("e", 0L)), 10L).isEmpty)
    // single relation: same slicing as the old single-table path,
    // with the final range open-ended
    assert(SnapshotFlow.packSlices(Seq(("t", 10L)), 4L) == Seq(
      Seq(("t", 0L, Some(4L))), Seq(("t", 4L, Some(8L))),
      Seq(("t", 8L, None))))
  }

  test("DECLARATIVELY PARTITIONED table: the snapshot read enumerates " +
    "leaf partitions (multi-level) and packs their blocks — parallel " +
    "slices where the parent's zero physical size used to force one " +
    "full-scan connection; every row exactly once") {
    val s = srv
    s.psql("""CREATE TABLE public.pt (id bigint NOT NULL, v bigint)
      PARTITION BY RANGE (id)""")
    s.psql("""CREATE TABLE public.pt_a PARTITION OF public.pt
      FOR VALUES FROM (1) TO (3000)""")
    // second-level partitioning: the enumeration must recurse
    s.psql("""CREATE TABLE public.pt_b PARTITION OF public.pt
      FOR VALUES FROM (3000) TO (10000) PARTITION BY RANGE (id)""")
    s.psql("""CREATE TABLE public.pt_b1 PARTITION OF public.pt_b
      FOR VALUES FROM (3000) TO (5000)""")
    s.psql("""CREATE TABLE public.pt_b2 PARTITION OF public.pt_b
      FOR VALUES FROM (5000) TO (10000)""")
    s.psql("""INSERT INTO public.pt
      SELECT g, g * 2 FROM generate_series(1, 8000) g""")
    // leaf reltuples must be fresh (the slice policy sums them);
    // analyze the leaves explicitly — manual ANALYZE recursion into
    // partitions varies by version
    s.psql("ANALYZE public.pt_a; ANALYZE public.pt_b1; " +
      "ANALYZE public.pt_b2")

    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=pt_slot"
    val session = SnapshotFlow.createExportedSlot(url)
    try {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType)))
      val df = SnapshotFlow.readTable(spark, url,
        session.exported.snapshotName, "public.pt", schema,
        rowsPerPartition = Some(2000L))
      // sliceCount(ceil(8000/2000) = 4) over the SUMMED leaf stats —
      // not 1 (the parent alone has zero blocks/reltuples)
      assert(df.rdd.getNumPartitions == 4,
        s"expected 4 slices, got ${df.rdd.getNumPartitions}")
      assert(df.count() == 8000)
      assert(df.select("id").distinct().count() == 8000)
      assert(df.agg(sum(col("v"))).head.getLong(0) ==
        2L * 8000L * 8001L / 2)
    } finally session.close()
    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='pt_slot'")
    s.psql("DROP TABLE public.pt")
  }

  test("INHERITANCE tree: the parent's own rows read via ONLY (no " +
    "double-count of children), children enumerate as leaves") {
    val s = srv
    s.psql("CREATE TABLE public.inh (id bigint, v bigint)")
    s.psql("CREATE TABLE public.inh_c1 () INHERITS (public.inh)")
    s.psql("CREATE TABLE public.inh_c2 () INHERITS (public.inh)")
    s.psql("""INSERT INTO public.inh
      SELECT g, 1 FROM generate_series(1, 500) g""")
    s.psql("""INSERT INTO public.inh_c1
      SELECT g, 2 FROM generate_series(501, 900) g""")
    s.psql("""INSERT INTO public.inh_c2
      SELECT g, 3 FROM generate_series(901, 1000) g""")

    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=inh_slot"
    val session = SnapshotFlow.createExportedSlot(url)
    try {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType)))
      val df = SnapshotFlow.readTable(spark, url,
        session.exported.snapshotName, "public.inh", schema,
        numPartitions = 2)
      assert(df.count() == 1000, "double-read or missing leaf")
      assert(df.select("id").distinct().count() == 1000)
      // rows from all three relations arrived
      assert(df.select("v").distinct().count() == 3)
    } finally session.close()
    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='inh_slot'")
    s.psql("DROP TABLE public.inh CASCADE")
  }

  test("exported-snapshot read: CTID-partitioned parallel scan sees " +
    "exactly the slot-creation state — concurrent writes invisible") {
    val s = srv
    s.psql("""CREATE TABLE public.snap1 (
      id bigint PRIMARY KEY, v bigint, t text, big text)""")
    // enough rows to span several 8 KiB blocks so the CTID slices are
    // genuinely non-trivial; one TOAST row
    s.psql("""INSERT INTO public.snap1
      SELECT g, g * 10, 'row-' || g,
             CASE WHEN g = 1 THEN (SELECT string_agg(md5(x::text), '')
                                     FROM generate_series(1, 4000) x)
                  WHEN g % 7 = 0 THEN repeat('pad', 40) END
      FROM generate_series(1, 5000) g""")
    s.psql("CREATE PUBLICATION snap_pub FOR TABLE public.snap1")

    val truth0 = s.psql("SELECT count(*) || ':' || sum(v) || ':' || " +
      "md5(string_agg(id || '|' || v || '|' || t || '|' || " +
      "coalesce(md5(big), ''), E'\\n' ORDER BY id)) FROM public.snap1")

    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=snap_slot&publication=snap_pub"
    val session = SnapshotFlow.createExportedSlot(url)
    try {
      assert(session.exported.slot == "snap_slot")
      assert(session.exported.consistentPoint > 0)
      assert(session.exported.snapshotName.nonEmpty)

      // writes racing the snapshot: committed AFTER the slot reached
      // consistency, so they must NOT appear in the snapshot read
      s.psql("UPDATE public.snap1 SET v = -1 WHERE id <= 100")
      s.psql("DELETE FROM public.snap1 WHERE id > 4900")
      s.psql("INSERT INTO public.snap1 VALUES (9001, 1, 'racer', NULL)")

      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType),
        StructField("t", StringType), StructField("big", StringType)))
      val df = SnapshotFlow.readTable(spark, url,
        session.exported.snapshotName, "public.snap1", schema,
        numPartitions = 4)
      def md5hex(x: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val rows = df.orderBy("id").collect()
      assert(rows.length == 5000, "snapshot must see pre-race rows only")
      val rendered = rows.map { r =>
        val big = Option(r.getString(3)).map(md5hex).getOrElse("")
        s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}|$big"
      }.mkString("\n")
      val gotSum =
        s"${rows.length}:${rows.map(_.getLong(1)).sum}:${md5hex(rendered)}"
      assert(gotSum == truth0.trim,
        "snapshot read != slot-creation state")
    } finally session.close()
    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='snap_slot'")
    s.psql("DROP PUBLICATION snap_pub")
    s.psql("DROP TABLE public.snap1")
  }

  test("mirror.skip_snapshot_export: the slot stands but the " +
    "snapshot session closes and slices read CURRENT data (no SET " +
    "TRANSACTION SNAPSHOT) — post-slot writes ARE visible, the " +
    "documented consistency trade (PEERDB_SKIP_SNAPSHOT_EXPORT, " +
    "postgres_source.go:651-658)") {
    val s = srv
    s.psql("""CREATE TABLE public.skipsnap (
      id bigint PRIMARY KEY, v bigint)""")
    s.psql("""INSERT INTO public.skipsnap
      SELECT g, g FROM generate_series(1, 500) g""")
    s.psql("CREATE PUBLICATION skipsnap_pub FOR TABLE public.skipsnap")
    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=skipsnap_slot&publication=skipsnap_pub"
    val session = SnapshotFlow.createExportedSlot(url)
    try {
      // the skip posture: the holder closes, reads go snapshot-less
      session.close()
      s.psql("INSERT INTO public.skipsnap VALUES (9001, 1)")
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType)))
      val df = SnapshotFlow.readTable(spark, url, snapshotName = "",
        "public.skipsnap", schema, numPartitions = 2)
      val ids = df.select("id").collect().map(_.getLong(0)).toSet
      assert(ids.size == 501 && ids.contains(9001L),
        "snapshot-less read must see the post-slot row")
    } finally {
      s.psql("SELECT pg_drop_replication_slot(slot_name) " +
        "FROM pg_replication_slots WHERE slot_name='skipsnap_slot'")
      s.psql("DROP PUBLICATION skipsnap_pub")
      s.psql("DROP TABLE public.skipsnap")
    }
  }

  test("full handoff: initialLoad bootstraps at the consistent point " +
    "and the CDC stream delivers racing writes exactly once") {
    val s = srv
    s.psql("""CREATE TABLE public.ho1 (
      id bigint PRIMARY KEY, v bigint, t text)""")
    s.psql("CREATE TABLE public.ho2 (k bigint PRIMARY KEY, s text)")
    s.psql("""INSERT INTO public.ho1
      SELECT g, g, 'r' || g FROM generate_series(1, 2000) g""")
    s.psql("INSERT INTO public.ho2 VALUES (1, 'a'), (2, 'b')")
    s.psql("CREATE PUBLICATION ho_pub FOR TABLE public.ho1, public.ho2")

    val base = tmpDir("snaphandoff")
    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=ho_slot&publication=ho_pub"
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType),
        StructField("t", StringType))),
      destinationTable = "public.ho1",
      captureDir = Some(url),
      extraTables = Map("public.ho2" -> TableConfig(Seq("k"),
        StructType(Seq(StructField("k", LongType),
          StructField("s", StringType))))))

    // SnapshotFlow.initialLoad creates the slot itself; between slot
    // creation and the snapshot reads there is no hook to inject
    // racing writes, so race the OTHER direction here: writes landing
    // while the snapshot phase's merges run, delivered by the first
    // stream pull. (The snapshot-isolation direction is pinned by the
    // previous test.)
    val runner = SnapshotFlow.initialLoad(spark, cfg, numPartitions = 4)

    def truth(table: String, cols: String, pk: String): String =
      s.psql(s"SELECT count(*) || ':' || md5(string_agg($cols, E'\\n' " +
        s"ORDER BY $pk)) FROM public.$table")
    def dest(table: String, exprs: Seq[org.apache.spark.sql.Column],
        pk: String): String = {
      val rows = runner.destination(s"public.$table")
        .orderBy(pk).select(exprs: _*).collect()
      val body = rows.map(_.getString(0)).mkString("\n")
      s"${rows.length}:" + java.security.MessageDigest
        .getInstance("MD5").digest(body.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString + "\n"
    }
    def ho1Dest(): String = dest("ho1", Seq(concat_ws("|",
      col("id"), col("v"), col("t")).as("l")), "id")
    def ho1Truth(): String = truth("ho1", "id || '|' || v || '|' || t", "id")

    // snapshot state replicated
    assert(ho1Dest() == ho1Truth())
    assert(runner.destination("public.ho2").count() == 2)

    // racing writes: a mix of updates to snapshot rows, deletes,
    // inserts — they arrived AFTER the consistent point, so the pull
    // must deliver each exactly once on top of the snapshot
    s.psql("UPDATE public.ho1 SET v = v + 1000000 WHERE id <= 50")
    s.psql("DELETE FROM public.ho1 WHERE id BETWEEN 1990 AND 2000")
    s.psql("INSERT INTO public.ho1 VALUES (5001, 1, 'post-snap')")
    s.psql("UPDATE public.ho2 SET s = 'z' WHERE k = 2")
    runner.runAvailableNow()
    assert(ho1Dest() == ho1Truth(), "post-handoff drain diverged")
    assert(runner.destination("public.ho2").filter(col("s") === "z")
      .count() == 1)

    // no duplicate pks anywhere (the exactly-once core claim)
    val dups = runner.destination("public.ho1")
      .groupBy("id").count().filter(col("count") > 1).count()
    assert(dups == 0)

    // steady churn keeps converging
    s.psql("UPDATE public.ho1 SET t = 'again' WHERE id % 97 = 0")
    runner.runAvailableNow()
    assert(ho1Dest() == ho1Truth())

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='ho_slot'")
  }

  test("snapshot into a LIVE pg:// destination: the bootstrap rides " +
    "the same staging→COPY→MERGE loop as CDC batches, then the stream " +
    "keeps the live destination converged") {
    val s = srv
    s.psql("CREATE DATABASE snapdest")
    s.psql("CREATE TABLE public.wh1 (id bigint PRIMARY KEY, v bigint, " +
      "t text)")
    s.psql("""INSERT INTO public.wh1
      SELECT g, g * 2, 'w' || g FROM generate_series(1, 3000) g""")
    s.psql("CREATE PUBLICATION wh_pub FOR TABLE public.wh1")

    val base = tmpDir("snapwh")
    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=wh_slot&publication=wh_pub"
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType),
        StructField("t", StringType))),
      destinationTable = "public.wh1",
      captureDir = Some(url),
      warehouseUrl = Some(s"pg://postgres@127.0.0.1:${s.port}/snapdest"))

    val runner = SnapshotFlow.initialLoad(spark, cfg, numPartitions = 3)
    def truth(): String = s.psql(
      "SELECT count(*) || ':' || md5(string_agg(id || '|' || v || '|' " +
        "|| t, E'\\n' ORDER BY id)) FROM public.wh1")
    def dest(): String = s.psql(
      "SELECT count(*) || ':' || md5(string_agg(id || '|' || v || '|' " +
        "|| t, E'\\n' ORDER BY id)) FROM public.wh1 " +
        "WHERE NOT _peerdb_is_deleted", db = "snapdest")
    assert(dest() == truth(), "live-destination snapshot diverged")

    s.psql("UPDATE public.wh1 SET v = 0 WHERE id % 11 = 0")
    s.psql("DELETE FROM public.wh1 WHERE id > 2990")
    runner.runAvailableNow()
    assert(dest() == truth(), "post-snapshot drain diverged")

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='wh_slot'")
  }

  test("DDL surface: CREATE MIRROR with pgwire capture and " +
    "do_initial_snapshot (no snapshot_source) takes the LIVE " +
    "exported-snapshot path; EXECUTE snapshots then drains CDC; " +
    "re-EXECUTE reuses the durable snapshot marker") {
    val s = srv
    s.psql("CREATE TABLE public.ddl1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("""INSERT INTO public.ddl1
      SELECT g, g FROM generate_series(1, 500) g""")
    s.psql("CREATE PUBLICATION ddl_pub FOR TABLE public.ddl1")

    val base = tmpDir("snapddl")
    def run(sql: String) = GraftSql.execute(spark,
      GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
    run(s"""CREATE MIRROR snapddl WITH (
       |  wal_dir '$base/wal', dest_dir '$base/dest',
       |  checkpoint_dir '$base/ckpt', pk 'id', table 'public.ddl1',
       |  schema 'id BIGINT, v BIGINT',
       |  capture_dir 'pgwire://postgres@127.0.0.1:${s.port}/postgres?slot=ddl_slot&publication=ddl_pub',
       |  do_initial_snapshot 'true')""".stripMargin)

    // validation names the live path instead of demanding a source dir
    val v = run("VALIDATE MIRROR snapddl")
    val snapCheck = v.find(_.getString(0) == "snapshot_source").get
    assert(snapCheck.getString(1) == "valid", v.mkString(";"))
    assert(snapCheck.getString(2).contains("live exported-snapshot"))

    run("EXECUTE MIRROR snapddl")
    val dest = s"$base/dest"
    def destDf() = spark.read.parquet(dest)
      .filter(!org.apache.spark.sql.functions.col("_peerdb_is_deleted"))
    assert(destDf().count() == 500)

    // churn after the snapshot: the stream (slot created by the
    // snapshot phase at its consistent point) must deliver it
    s.psql("UPDATE public.ddl1 SET v = -9 WHERE id <= 7")
    s.psql("INSERT INTO public.ddl1 VALUES (901, 901)")
    run("EXECUTE MIRROR snapddl")
    assert(destDf().count() == 501)
    assert(destDf().filter(
      org.apache.spark.sql.functions.col("v") === -9).count() == 7)

    // the marker prevents a re-snapshot (initialLoad would throw on
    // the existing slot otherwise) and the stream stays converged
    run("EXECUTE MIRROR snapddl")
    assert(destDf().count() == 501)

    run("DROP MIRROR snapddl")
    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='ddl_slot'")
  }
}
