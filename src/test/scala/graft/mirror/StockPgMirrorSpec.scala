package graft.mirror

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.StockPostgres

/** The full CDC mirror loop against a REAL stock PostgreSQL 15 source:
  * `capture_dir = pgwire://…` makes [[graft.cdc.PgReplicationSource]]
  * the upstream of the unchanged decode → WAL → raw → normalize →
  * merge path, and every run here exercises the true server-side slot
  * semantics (confirmed_flush resume, default replica identity,
  * out-of-line TOAST) rather than the in-process fixture's replay.
  * This is the reference's flagship PG-source mirror
  * (flow/connectors/postgres/cdc.go) executed end to end with nothing
  * stubbed on the source side.
  */
class StockPgMirrorSpec extends SparkSpec {

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

  /** Source-of-truth rows from the live server, ordered by pk: the
    * reference's own oracle shape (EnvWaitForEqualTablesWithNames). */
  private def truthT1(): Seq[(Long, Option[Long], Option[String],
      Option[String])] =
    srv.psql("SELECT id, v, t, md5(big) FROM public.t1 ORDER BY id")
      .split("\n").filter(_.nonEmpty).toSeq.map { l =>
        val f = l.split("\\|", -1)
        (f(0).toLong,
          if (f(1).isEmpty) None else Some(f(1).toLong),
          if (f(2).isEmpty) None else Some(f(2)),
          if (f(3).isEmpty) None else Some(f(3)))
      }

  test("stock PG mirror: two-table pgwire:// capture across multiple " +
    "runs — inserts, TOAST backfill through MERGE, update, delete — " +
    "destination equals the live source table") {
    val s = srv
    s.psql("""CREATE TABLE public.t1 (
      id bigint PRIMARY KEY, v bigint, t text, big text)""")
    s.psql("CREATE TABLE public.t2 (k bigint PRIMARY KEY, s text)")
    s.psql("CREATE PUBLICATION mir_pub FOR TABLE public.t1, public.t2")
    s.psql("SELECT pg_create_logical_replication_slot(" +
      "'mir_slot', 'pgoutput')")

    s.psql("""INSERT INTO public.t1 VALUES
      (1, 10, 'one', (SELECT string_agg(md5(g::text), '')
                        FROM generate_series(1, 4000) g)),
      (2, 20, 'two', NULL),
      (3, 30, 'three', 'small')""")
    s.psql("INSERT INTO public.t2 VALUES (7, 'seven'), (8, 'eight')")

    val base = tmpDir("stockmir")
    val url = s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
      "?slot=mir_slot&publication=mir_pub"
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType),
        StructField("t", StringType), StructField("big", StringType))),
      destinationTable = "public.t1",
      captureDir = Some(url),
      extraTables = Map("public.t2" -> TableConfig(Seq("k"),
        StructType(Seq(StructField("k", LongType),
          StructField("s", StringType))))))
    val runner = new MirrorRunner(spark, cfg)

    runner.runAvailableNow()
    def destT1(): Seq[(Long, Option[Long], Option[String],
        Option[String])] =
      runner.destination().select(col("id"), col("v"), col("t"),
        md5(col("big")).as("m"))
        .orderBy("id").collect().toSeq.map(r =>
          (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            Option(r.getString(2)), Option(r.getString(3))))
    assert(destT1() == truthT1())
    assert(runner.destination("public.t2").count() == 2)

    // second wave: an update NOT touching the TOAST column (its md5
    // must survive the MERGE — unchanged-toast backfill against the
    // REAL server's 'u' columns), a delete, a fresh insert, and a
    // cross-table update
    s.psql("UPDATE public.t1 SET v = 11, t = 'one-b' WHERE id = 1")
    s.psql("DELETE FROM public.t1 WHERE id = 2")
    s.psql("INSERT INTO public.t1 VALUES (4, 40, 'four', NULL)")
    s.psql("UPDATE public.t2 SET s = 'acht' WHERE k = 8")

    runner.runAvailableNow()
    val truth = truthT1()
    assert(truth.map(_._1) == Seq(1L, 3L, 4L)) // sanity on the oracle
    assert(destT1() == truth)
    val t1row1 = truth.find(_._1 == 1L).get
    assert(t1row1._4.nonEmpty, "TOAST md5 must still be present")
    val t2 = runner.destination("public.t2")
      .select("k", "s").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(t2 == Seq((7L, "seven"), (8L, "acht")))

    // a third, idle run appends nothing and changes nothing
    runner.runAvailableNow()
    assert(destT1() == truth)

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='mir_slot'")
  }

  test("stock PG→PG: FULLY live mirror — pgwire:// replication source " +
    "and pg:// warehouse destination on one pipeline; TOAST backfill " +
    "through the real MERGE and a soft delete visible as a tombstone") {
    val s = srv
    s.psql("CREATE DATABASE destdb")
    s.psql("""CREATE TABLE public.s1 (
      id bigint PRIMARY KEY, v bigint, t text, big text)""")
    s.psql("CREATE PUBLICATION p2p_pub FOR TABLE public.s1")
    s.psql("SELECT pg_create_logical_replication_slot(" +
      "'p2p_slot', 'pgoutput')")
    s.psql("""INSERT INTO public.s1 VALUES
      (1, 10, 'one', (SELECT string_agg(md5(g::text), '')
                        FROM generate_series(1, 4000) g)),
      (2, 20, 'two', NULL)""")

    def truth(): String = s.psql(
      "SELECT id, v, t, md5(big) FROM public.s1 ORDER BY id")
    def dest(): String = s.psql(
      "SELECT id, v, t, md5(big) FROM public.s1 " +
        "WHERE NOT _peerdb_is_deleted ORDER BY id", db = "destdb")

    val base = tmpDir("p2pmir")
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType),
        StructField("t", StringType), StructField("big", StringType))),
      destinationTable = "public.s1",
      captureDir = Some(s"pgwire://postgres@127.0.0.1:${s.port}" +
        "/postgres?slot=p2p_slot&publication=p2p_pub"),
      warehouseUrl = Some(
        s"pg://postgres@127.0.0.1:${s.port}/destdb"))
    val runner = new MirrorRunner(spark, cfg)

    runner.runAvailableNow()
    assert(dest() == truth(), s"after wave 1:\n${dest()}\nvs\n${truth()}")

    // wave 2: the TOAST column stays untouched by the update and must
    // survive the REAL destination-side MERGE's absent-column branch;
    // the delete lands as a soft-delete tombstone
    s.psql("UPDATE public.s1 SET v = 11, t = 'one-b' WHERE id = 1")
    s.psql("DELETE FROM public.s1 WHERE id = 2")
    s.psql("INSERT INTO public.s1 VALUES (3, 30, 'three', 'small')")
    runner.runAvailableNow()
    assert(dest() == truth(), s"after wave 2:\n${dest()}\nvs\n${truth()}")
    assert(truth().linesIterator.size == 2)
    assert(s.psql("SELECT id FROM public.s1 " +
      "WHERE _peerdb_is_deleted", db = "destdb").trim == "2")

    // replayed run: MERGE version guards make it a no-op
    runner.runAvailableNow()
    assert(dest() == truth())

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='p2p_slot'")
  }

  test("table addition to a live mirror VERIFIES the publication: a " +
    "source relation absent from it fails loudly (the stream would " +
    "silently never carry its changes); after ALTER PUBLICATION ADD " +
    "TABLE the addition proceeds and churn arrives") {
    val s = srv
    s.psql("CREATE TABLE public.pa1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("CREATE TABLE public.pa2 (id bigint PRIMARY KEY, v bigint)")
    // the publication exposes ONLY pa1
    s.psql("CREATE PUBLICATION pa_pub FOR TABLE public.pa1")
    s.psql("SELECT pg_create_logical_replication_slot(" +
      "'pa_slot', 'pgoutput')")
    s.psql("INSERT INTO public.pa1 VALUES (1, 10)")
    s.psql("INSERT INTO public.pa2 VALUES (5, 50)")

    val base = tmpDir("pubadd")
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      destinationTable = "public.pa1",
      captureDir = Some(s"pgwire://postgres@127.0.0.1:${s.port}" +
        "/postgres?slot=pa_slot&publication=pa_pub"))
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()
    assert(runner.destination("public.pa1").count() == 1)

    // adding pa2 while the publication lacks it: loud refusal, not a
    // table that bootstraps once and then never updates
    val tc = TableConfig(Seq("id"), cfg.payloadSchema)
    val e = intercept[IllegalArgumentException] {
      runner.catchUpTable("public.pa2", tc)
    }
    assert(e.getMessage.contains("publication"), e.getMessage)

    // fix the publication; the addition now proceeds and the RESTARTED
    // mirror (extraTables) delivers pa2's post-addition churn through
    // the stream (rows committed BEFORE the ALTER were filtered by the
    // historic catalog and need a snapshot bootstrap, not a catch-up —
    // the gate exists precisely so this distinction is explicit)
    s.psql("ALTER PUBLICATION pa_pub ADD TABLE public.pa2")
    runner.catchUpTable("public.pa2", tc)
    s.psql("INSERT INTO public.pa2 VALUES (6, 60)")
    val runner2 = new MirrorRunner(spark,
      cfg.copy(extraTables = Map("public.pa2" -> tc)))
    runner2.runAvailableNow()
    assert(runner2.destination("public.pa2")
      .select("id").collect().map(_.getLong(0)).toSet == Set(6L))

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='pa_slot'")
    s.psql("DROP PUBLICATION pa_pub")
    s.psql("DROP TABLE public.pa1"); s.psql("DROP TABLE public.pa2")
  }

  test("WAL heartbeat (opt-in): the logical message advances the " +
    "source WAL so an idle slot can ack forward, travels the stream " +
    "as a pgoutput 'M' record, and decodes as a no-op — convergence " +
    "unaffected; disabled by default") {
    val s = srv
    s.psql("CREATE TABLE public.hb1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("CREATE PUBLICATION hb_pub FOR TABLE public.hb1")
    s.psql("SELECT pg_create_logical_replication_slot(" +
      "'hb_slot', 'pgoutput')")
    s.psql("INSERT INTO public.hb1 VALUES (1, 10)")

    val base = tmpDir("walhb")
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      destinationTable = "public.hb1",
      captureDir = Some(s"pgwire://postgres@127.0.0.1:${s.port}" +
        "/postgres?slot=hb_slot&publication=hb_pub"),
      env = Map("mirror.enable_wal_heartbeat" -> "true",
        "mirror.wal_heartbeat_interval_ms" -> "0"))
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()
    assert(runner.destination("public.hb1").count() == 1)

    // enabled: the tick emits and the source WAL advances
    val lsn0 = s.psql("SELECT pg_current_wal_lsn()").trim
    assert(runner.walHeartbeatTick())
    assert(runner.walHeartbeatTick()) // interval 0: every tick emits
    val lsn1 = s.psql("SELECT pg_current_wal_lsn()").trim
    assert(lsn1 != lsn0, "heartbeat did not generate WAL")

    // the heartbeat messages sit in the slot ahead of real churn: the
    // next pull must decode them as no-ops and stay converged
    s.psql("UPDATE public.hb1 SET v = 11 WHERE id = 1")
    s.psql("INSERT INTO public.hb1 VALUES (2, 20)")
    runner.runAvailableNow()
    val got = runner.destination("public.hb1")
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 11L, 2L -> 20L))

    // default posture: disabled — no emission
    val quiet = new MirrorRunner(spark, cfg.copy(env = Map.empty))
    assert(!quiet.walHeartbeatTick())

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='hb_slot'")
    s.psql("DROP PUBLICATION hb_pub")
    s.psql("DROP TABLE public.hb1")
  }

  test("RESYNC of a live-destination mirror: rebuild lands in " +
    "_peerdb_resync while the original serves, then swaps atomically " +
    "— destination drift corrects, source-deleted rows tombstone " +
    "instead of surviving, and the stream keeps converging after") {
    val s = srv
    s.psql("CREATE DATABASE rsdst")
    s.psql("CREATE TABLE public.rs1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("CREATE PUBLICATION rs_pub FOR TABLE public.rs1")
    s.psql("""INSERT INTO public.rs1
      SELECT g, g FROM generate_series(1, 200) g""")

    val base = tmpDir("liveresync")
    def run(sql: String) = GraftSql.execute(spark,
      GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
    run(s"""CREATE MIRROR rsmir WITH (
       |  wal_dir '$base/wal', dest_dir '$base/dest',
       |  checkpoint_dir '$base/ckpt', pk 'id', table 'public.rs1',
       |  schema 'id BIGINT, v BIGINT',
       |  capture_dir 'pgwire://postgres@127.0.0.1:${s.port}/postgres?slot=rs_slot&publication=rs_pub',
       |  warehouse_url 'pg://postgres@127.0.0.1:${s.port}/rsdst',
       |  do_initial_snapshot 'true')""".stripMargin)
    run("EXECUTE MIRROR rsmir")
    assert(s.psql("SELECT count(*) FROM public.rs1 " +
      "WHERE NOT _peerdb_is_deleted", db = "rsdst").trim == "200")

    // destination DRIFT (the situation resync exists for): a phantom
    // row and a corrupted value land directly on the destination
    s.psql("INSERT INTO public.rs1 (id, v, _peerdb_version) " +
      "VALUES (999, 9, 0)", db = "rsdst")
    s.psql("UPDATE public.rs1 SET v = -5 WHERE id = 7", db = "rsdst")
    // plus a genuine source-side delete the stream has not seen yet
    s.psql("DELETE FROM public.rs1 WHERE id = 200")

    run("RESYNC MIRROR rsmir")

    def truth(): String = s.psql("SELECT count(*) || ':' || " +
      "md5(string_agg(id || '|' || v, E'\\n' ORDER BY id)) " +
      "FROM public.rs1")
    def dest(): String = s.psql("SELECT count(*) || ':' || " +
      "md5(string_agg(id || '|' || v, E'\\n' ORDER BY id)) " +
      "FROM public.rs1 WHERE NOT _peerdb_is_deleted", db = "rsdst")
    assert(dest() == truth(),
      "post-resync live destination != source")
    // the phantom row carried over TOMBSTONED (soft-delete transfer),
    // not silently vanished and not alive
    assert(s.psql("SELECT _peerdb_is_deleted FROM public.rs1 " +
      "WHERE id = 999", db = "rsdst").trim == "t")
    // the corrupted value was replaced by the rebuild
    assert(s.psql("SELECT v FROM public.rs1 WHERE id = 7",
      db = "rsdst").trim == "7")
    // no _peerdb_resync leftovers
    assert(s.psql("SELECT count(*) FROM pg_tables WHERE tablename " +
      "LIKE '%peerdb_resync%'", db = "rsdst").trim == "0")

    // the stream keeps converging on the swapped table
    s.psql("INSERT INTO public.rs1 VALUES (300, 300)")
    s.psql("UPDATE public.rs1 SET v = 0 WHERE id = 3")
    run("EXECUTE MIRROR rsmir")
    assert(dest() == truth(), "post-resync stream diverged")

    run("DROP MIRROR rsmir")
    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='rs_slot'")
    s.psql("DROP PUBLICATION rs_pub")
    s.psql("DROP TABLE public.rs1")
  }

  test("live mirror into a \"MixedCase\".\"Dest Table\" destination: " +
    "identifier quoting holds through snapshot, CDC MERGE and the " +
    "RESYNC prepare/swap DDL (reserved-word/mixed-case names must " +
    "not break mid-transaction)") {
    val s = srv
    s.psql("CREATE DATABASE mcdst")
    s.psql("CREATE SCHEMA \"MixedCase\"", db = "mcdst")
    s.psql("CREATE TABLE public.mc1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("CREATE PUBLICATION mc_pub FOR TABLE public.mc1")
    s.psql("INSERT INTO public.mc1 " +
      "SELECT g, g FROM generate_series(1, 50) g")

    val base = tmpDir("mixedcase")
    def run(sql: String) = GraftSql.execute(spark,
      GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
    run(s"""CREATE MIRROR mcmir WITH (
       |  wal_dir '$base/wal', dest_dir '$base/dest',
       |  checkpoint_dir '$base/ckpt', pk 'id',
       |  table 'MixedCase.Dest Table',
       |  table_map 'public.mc1:MixedCase.Dest Table',
       |  schema 'id BIGINT, v BIGINT',
       |  capture_dir 'pgwire://postgres@127.0.0.1:${s.port}/postgres?slot=mc_slot&publication=mc_pub',
       |  warehouse_url 'pg://postgres@127.0.0.1:${s.port}/mcdst',
       |  do_initial_snapshot 'true')""".stripMargin)
    run("EXECUTE MIRROR mcmir")

    def truth(): String = s.psql("SELECT count(*) || ':' || " +
      "md5(string_agg(id || '|' || v, E'\\n' ORDER BY id)) " +
      "FROM public.mc1")
    def dest(): String = s.psql("SELECT count(*) || ':' || " +
      "md5(string_agg(id || '|' || v, E'\\n' ORDER BY id)) " +
      "FROM \"MixedCase\".\"Dest Table\" " +
      "WHERE NOT _peerdb_is_deleted", db = "mcdst")
    assert(dest() == truth(), "snapshot into quoted destination")

    // CDC wave through the live MERGE (update / delete / insert)
    s.psql("UPDATE public.mc1 SET v = -1 WHERE id = 5")
    s.psql("DELETE FROM public.mc1 WHERE id = 50")
    s.psql("INSERT INTO public.mc1 VALUES (60, 60)")
    run("EXECUTE MIRROR mcmir")
    assert(dest() == truth(), "CDC MERGE into quoted destination")

    // RESYNC: prepare (DROP/CREATE LIKE), rebuild, swap (carryover
    // INSERT, DROP, RENAME) — every statement carries the quoted name
    s.psql("UPDATE \"MixedCase\".\"Dest Table\" SET v = -9 " +
      "WHERE id = 7", db = "mcdst") // destination drift
    s.psql("DELETE FROM public.mc1 WHERE id = 1")
    run("RESYNC MIRROR mcmir")
    assert(dest() == truth(), "post-resync quoted destination")
    assert(s.psql("SELECT v FROM \"MixedCase\".\"Dest Table\" " +
      "WHERE id = 7", db = "mcdst").trim == "7",
      "drifted value must be rebuilt")
    assert(s.psql("SELECT count(*) FROM pg_tables WHERE tablename " +
      "LIKE '%peerdb_resync%'", db = "mcdst").trim == "0")

    run("DROP MIRROR mcmir")
    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='mc_slot'")
    s.psql("DROP PUBLICATION mc_pub")
    s.psql("DROP TABLE public.mc1")
  }

  test("VALIDATE MIRROR checks publication coverage on a live pgwire " +
    "capture: a table outside the publication and a missing " +
    "publication report invalid; membership and FOR ALL TABLES pass") {
    val s = srv
    s.psql("CREATE TABLE public.pv1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("CREATE TABLE public.pv2 (id bigint PRIMARY KEY, v bigint)")
    s.psql("CREATE PUBLICATION pv_pub FOR TABLE public.pv1")
    s.psql("CREATE PUBLICATION pv_all FOR ALL TABLES")

    val base = tmpDir("pubval")
    def run(sql: String) = GraftSql.execute(spark,
      GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
    def mirror(name: String, table: String, pub: String): Unit =
      run(s"""CREATE MIRROR $name WITH (
         |  wal_dir '$base/$name/wal', dest_dir '$base/$name/dest',
         |  checkpoint_dir '$base/$name/ckpt', pk 'id', table '$table',
         |  schema 'id BIGINT, v BIGINT',
         |  capture_dir 'pgwire://postgres@127.0.0.1:${s.port}/postgres?slot=pv_slot&publication=$pub')"""
        .stripMargin)
    def checkRow(name: String): (String, String) = {
      val v = run(s"VALIDATE MIRROR $name")
      val r = v.find(_.getString(0) == "publication_tables").get
      (r.getString(1), r.getString(2))
    }

    mirror("pvok", "public.pv1", "pv_pub")
    assert(checkRow("pvok") ==
      ("valid", "publication 'pv_pub' covers all 1 table(s)"))

    mirror("pvbad", "public.pv2", "pv_pub")
    val (st, msg) = checkRow("pvbad")
    assert(st == "invalid" && msg.contains("public.pv2"), msg)

    mirror("pvmiss", "public.pv1", "no_such_pub")
    val (st2, msg2) = checkRow("pvmiss")
    assert(st2 == "invalid" && msg2.contains("does not exist"), msg2)

    mirror("pvall", "public.pv2", "pv_all")
    assert(checkRow("pvall")._1 == "valid")
    assert(checkRow("pvall")._2.contains("FOR ALL TABLES"))

    // a URL with NO publication param still streams via the DEFAULT
    // publication — validation must check it, not silently skip
    run(s"""CREATE MIRROR pvdflt WITH (
       |  wal_dir '$base/pvdflt/wal', dest_dir '$base/pvdflt/dest',
       |  checkpoint_dir '$base/pvdflt/ckpt', pk 'id',
       |  table 'public.pv1', schema 'id BIGINT, v BIGINT',
       |  capture_dir 'pgwire://postgres@127.0.0.1:${s.port}/postgres?slot=pv_slot')"""
      .stripMargin)
    val (st3, msg3) = checkRow("pvdflt")
    assert(st3 == "invalid" && msg3.contains("graft_pub"), msg3)

    // FAN-IN routing (leaf partitions → one destination) checks EVERY
    // leaf instead of rejecting the map as un-snapshot-able
    run(s"""CREATE MIRROR pvfan WITH (
       |  wal_dir '$base/pvfan/wal', dest_dir '$base/pvfan/dest',
       |  checkpoint_dir '$base/pvfan/ckpt', pk 'id',
       |  table 'public.pvroot', schema 'id BIGINT, v BIGINT',
       |  table_map 'public.pv1:public.pvroot,public.pv2:public.pvroot',
       |  capture_dir 'pgwire://postgres@127.0.0.1:${s.port}/postgres?slot=pv_slot&publication=pv_pub')"""
      .stripMargin)
    val (st4, msg4) = checkRow("pvfan")
    // pv1 is published, pv2 is not: the missing LEAF is named (no
    // fan-in rejection, no one-leaf-only check)
    assert(st4 == "invalid" && msg4.contains("public.pv2") &&
      !msg4.contains("fan"), msg4)

    Seq("pvok", "pvbad", "pvmiss", "pvall", "pvdflt", "pvfan")
      .foreach(n => run(s"DROP MIRROR $n"))
    s.psql("DROP PUBLICATION pv_pub"); s.psql("DROP PUBLICATION pv_all")
    s.psql("DROP TABLE public.pv1"); s.psql("DROP TABLE public.pv2")
  }

  test("VALIDATE MIRROR checks replica identity (EnsurePullability): " +
    "a no-PK source table is pullable only under REPLICA IDENTITY " +
    "FULL; a PK'd table passes as-is") {
    val s = srv
    s.psql("CREATE TABLE public.ri1 (id bigint PRIMARY KEY, v bigint)")
    s.psql("CREATE TABLE public.ri2 (id bigint, v bigint)") // no PK
    s.psql("CREATE PUBLICATION ri_pub FOR TABLE public.ri1, public.ri2")

    val base = tmpDir("replident")
    def run(sql: String) = GraftSql.execute(spark,
      GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
    def mirror(name: String, table: String): Unit =
      run(s"""CREATE MIRROR $name WITH (
         |  wal_dir '$base/$name/wal', dest_dir '$base/$name/dest',
         |  checkpoint_dir '$base/$name/ckpt', pk 'id', table '$table',
         |  schema 'id BIGINT, v BIGINT',
         |  capture_dir 'pgwire://postgres@127.0.0.1:${s.port}/postgres?slot=ri_slot&publication=ri_pub')"""
        .stripMargin)
    def checkRow(name: String): (String, String) = {
      val v = run(s"VALIDATE MIRROR $name")
      val r = v.find(_.getString(0) == "replica_identity").get
      (r.getString(1), r.getString(2))
    }

    mirror("riok", "public.ri1")
    assert(checkRow("riok")._1 == "valid")

    mirror("ribad", "public.ri2")
    val (st, msg) = checkRow("ribad")
    assert(st == "invalid" && msg.contains("public.ri2"), msg)

    // REPLICA IDENTITY FULL makes the no-PK table pullable
    s.psql("ALTER TABLE public.ri2 REPLICA IDENTITY FULL")
    assert(checkRow("ribad")._1 == "valid")

    Seq("riok", "ribad").foreach(n => run(s"DROP MIRROR $n"))
    s.psql("DROP PUBLICATION ri_pub")
    s.psql("DROP TABLE public.ri1"); s.psql("DROP TABLE public.ri2")
  }
}
