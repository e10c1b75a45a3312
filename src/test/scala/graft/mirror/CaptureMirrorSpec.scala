package graft.mirror

import java.nio.file.Paths

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.MysqlBinlog._
import graft.cdc.{MysqlBinlogFiles, PgOutput, PgOutputFrames}

/** Capture-directory-driven mirrors: the raw wire files ARE the source.
  * Each run drains newly committed transactions through the matching
  * binary decoder into the WAL (resume offset durable under the
  * checkpoint dir), then the normal stream applies them — covering both
  * capture formats and the incremental/no-duplicate contract. */
class CaptureMirrorSpec extends SparkSpec {

  private val tm = TableMap(21L, "app", "t",
    Array(ColType.LongLong, ColType.Varchar),
    Array(0, 255), Array(false, true),
    Seq("id", "name"), Seq(true, true))

  private def binlogTx(tsec: Long, basePos: Long, id: Long,
      name: String): Seq[Array[Byte]] = Seq(
    encodeQuery(tsec, basePos, "app", "BEGIN"),
    encodeRows(tsec, basePos + 1, Ev.WriteRowsV2, tm, Seq(
      Seq(Some(Some(fLong(id))), Some(Some(fVarchar(name, 255)))))),
    encodeXid(tsec, basePos + 2, id))

  private def config(base: String, capture: String,
      format: String): MirrorConfig = MirrorConfig(
    walDir = s"$base/wal", rawDir = s"$base/raw",
    destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
    pkColumns = Seq("id"),
    payloadSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType))),
    destinationTable = "app.t",
    captureDir = Some(capture), captureFormat = format)

  test("binlog capture drives the mirror; resume appends only new txs") {
    val capture = tmpDir("capmir_bl")
    val base = tmpDir("capmir_bl_m")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++
        binlogTx(1L, 20L, 1L, "a") ++ binlogTx(2L, 30L, 2L, "b"))

    val runner = new MirrorRunner(spark, config(base, capture, "binlog"))
    runner.runAvailableNow()
    assert(runner.destination().count() == 2)

    // more captured transactions arrive; a second run picks up ONLY them
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      binlogTx(3L, 40L, 3L, "c"))
    runner.runAvailableNow()
    val dest = runner.destination()
    assert(dest.count() == 3)
    assert(dest.filter(col("id") === 3L).count() == 1)

    // steady state: nothing new, nothing duplicated
    runner.runAvailableNow()
    assert(runner.destination().count() == 3)
  }

  test("capture_dir DDL option wires the capture through CREATE/EXECUTE") {
    val capture = tmpDir("capmir_ddl")
    val base = tmpDir("capmir_ddl_m")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ binlogTx(1L, 20L, 7L, "x"))
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      s.sql(s"""CREATE MIRROR m_cap WITH (
               |  wal_dir '$base/wal', dest_dir '$base/dest',
               |  checkpoint_dir '$base/ckpt', pk 'id', table 'app.t',
               |  schema 'id BIGINT, name STRING',
               |  capture_dir '$capture', capture_format 'binlog')"""
        .stripMargin)
      s.sql("EXECUTE MIRROR m_cap")
      val dest = s.read.parquet(s"$base/dest")
        .filter("NOT _peerdb_is_deleted")
      assert(dest.count() == 1)
      assert(dest.select("name").head().getString(0) == "x")
      s.sql("DROP MIRROR m_cap")
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("continuous mirror: the capture pump drains NEW files while " +
      "the stream runs") {
    val capture = tmpDir("capmir_pump")
    val base = tmpDir("capmir_pump_m")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ binlogTx(1L, 20L, 1L, "a"))
    val runner = new MirrorRunner(spark, config(base, capture, "binlog"))
    val h = runner.handle(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L),
      capturePumpIntervalMs = 200L)
    h.resume()
    try {
      // a transaction captured AFTER the stream started must flow
      // through without any manual EXECUTE
      MysqlBinlogFiles.writeFile(
        Paths.get(capture, "binlog.000001.binlog"),
        binlogTx(2L, 30L, 2L, "b"))
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        n = try runner.destination().count() catch { case _: Exception => 0L }
      }
      assert(n == 2, s"pump never delivered the late transaction (n=$n)")
    } finally h.pause()
    // paused: the pump is joined; a late capture stays un-ingested
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      binlogTx(3L, 40L, 3L, "c"))
    Thread.sleep(500)
    assert(runner.destination().count() == 2)
  }

  test("pgoutput capture format drives the same path") {
    import PgOutput._
    val capture = tmpDir("capmir_pg")
    val base = tmpDir("capmir_pg_m")
    val relId = 31
    val rel = Relation(relId, "app", "t", 'd'.toInt, Seq(
      RelationColumn(1, "id", Oid.Int8, -1),
      RelationColumn(0, "name", Oid.Text, -1)))
    PgOutputFrames.appendFrames(Paths.get(capture, "000001.pgout"), Seq(
      1L -> encode(rel),
      2L -> encode(Begin(9L, PgEpochMicros + 1, 1)),
      3L -> encode(Insert(relId, TupleData(Seq(text("1"), text("a"))))),
      9L -> encode(Commit(0, 9L, 10L, PgEpochMicros + 1))))

    val runner = new MirrorRunner(spark,
      config(base, capture, "pgoutput"))
    runner.runAvailableNow()
    assert(runner.destination().count() == 1)
    runner.runAvailableNow() // no new commits: no duplicates
    assert(runner.destination().count() == 1)
  }

  test("capture lag gauge: byte-exact for file:pos, None for GTID") {
    val capture = tmpDir("capmir_lag")
    val base = tmpDir("capmir_lag_m")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ binlogTx(1L, 20L, 1L, "a"))
    val cfg = config(base, capture, "binlog")
    val runner = new MirrorRunner(spark, cfg)
    val conf = spark.sparkContext.hadoopConfiguration
    // before any run: no offset -> None
    assert(CaptureLag.bytes(capture, cfg.checkpointDir, conf).isEmpty)
    runner.runAvailableNow()
    // fully acked: the acked pos is the last XID logPos; events after
    // it in the file (none) -> remaining bytes of the file past the
    // acked offset
    val lag0 = CaptureLag.bytes(capture, cfg.checkpointDir, conf)
    assert(lag0.isDefined)
    val fileSize = java.nio.file.Files.size(
      Paths.get(capture, "binlog.000001.binlog"))
    // acked pos 22 is a LOG position, not a byte offset of this capture
    // file; the gauge measures bytes past it — nonzero here, bounded by
    // the file size, and it SHRINKS to reflect catch-up after new data
    assert(lag0.get <= fileSize)
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000002.binlog"),
      Seq(encodeFormatDescription(2L, 4L),
        encodeRotate(2L, 10L, 4L, "binlog.000002"),
        encodeTableMap(2L, 15L, tm)) ++ binlogTx(2L, 20L, 2L, "b"))
    val lagBehind = CaptureLag.bytes(capture, cfg.checkpointDir, conf).get
    assert(lagBehind > lag0.get) // a new un-acked file adds lag
    runner.runAvailableNow()
    val lagAfter = CaptureLag.bytes(capture, cfg.checkpointDir, conf).get
    assert(lagAfter < lagBehind)
  }

  test("a corrupt capture file lands durable flow_errors rows while " +
      "the pump retries (sustained corruption eventually stops it; " +
      "never a silent death)") {
    val capture = tmpDir("capmir_err")
    val base = tmpDir("capmir_err_m")
    MysqlBinlogFiles.writeFile(
      Paths.get(capture, "binlog.000001.binlog"),
      Seq(encodeFormatDescription(1L, 4L),
        encodeTableMap(1L, 10L, tm)) ++ binlogTx(1L, 20L, 1L, "a"))
    val cfg = config(base, capture, "binlog")
      .copy(statsDir = Some(s"$base/stats"), flowName = "capflow")
    val runner = new MirrorRunner(spark, cfg)
    val h = runner.handle(
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L),
      capturePumpIntervalMs = 100L)
    h.resume()
    try {
      // corrupt garbage appended as a new capture file
      java.nio.file.Files.write(
        Paths.get(capture, "binlog.000002.binlog"),
        Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
      val stats = new StatsCatalog(s"$base/stats",
        spark.sparkContext.hadoopConfiguration)
      val deadline = System.currentTimeMillis() + 20000
      var errs = Array.empty[String]
      while (errs.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        errs = stats.table(spark, "flow_errors")
          .filter(col("flow_name") === "capflow")
          .select("error_message").collect().map(_.getString(0))
          .filter(e => e.contains("capture pull failed") ||
            e.contains("capture pump stopped"))
      }
      assert(errs.nonEmpty, "pump failure left no flow_errors row")
    } finally h.pause()
  }

  test("mongo capture drives the mirror; token resume appends only " +
    "new change events") {
    import graft.cdc.Bson._
    import graft.cdc.MongoChangeFiles
    def tok(secs: Long, ord: Long): String = f"82$secs%08x$ord%08x"
    def ev(op: String, id: Long, name: String, ct: Long): Array[Byte] =
      graft.cdc.Bson.encode(Seq(
        "operationType" -> BString(op),
        "clusterTime" -> BTimestamp(ct, 1L),
        "ns" -> BDoc(Seq("db" -> BString("app"), "coll" -> BString("t"))),
        "documentKey" -> BDoc(Seq("_id" -> BInt64(id)))) ++
        (if (op == "delete") Nil
         else Seq("fullDocument" -> BDoc(Seq(
           "_id" -> BInt64(id), "name" -> BString(name))))): _*)

    val capture = tmpDir("capmir_mg")
    val base = tmpDir("capmir_mg_m")
    MongoChangeFiles.appendEvents(Paths.get(capture, "000001.mongo"), Seq(
      tok(100, 1) -> ev("insert", 1L, "a", 100L),
      tok(100, 2) -> ev("insert", 2L, "b", 100L)))
    val cfg = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("_id"),
      payloadSchema = StructType(Seq(
        StructField("_id", LongType), StructField("name", StringType))),
      destinationTable = "app.t",
      captureDir = Some(capture), captureFormat = "mongo")
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()
    assert(runner.destination().count() == 2)

    // a new capture file: an update, a delete — only these apply
    MongoChangeFiles.appendEvents(Paths.get(capture, "000002.mongo"), Seq(
      tok(101, 1) -> ev("update", 1L, "a2", 101L),
      tok(101, 2) -> ev("delete", 2L, "", 101L)))
    runner.runAvailableNow()
    // destination() filters tombstones: only the updated _id 1 is live
    val dest = runner.destination()
    assert(dest.count() == 1)
    assert(dest.filter(col("_id") === 1L)
      .select("name").head().getString(0) == "a2")
    // the tombstone persists physically (soft delete)
    assert(spark.read.parquet(s"$base/dest")
      .filter(col("_id") === 2L)
      .select(graft.model.RawTable.IsDeleted).head().getBoolean(0))

    // steady state: full capture replay, token skip — no duplicates
    runner.runAvailableNow()
    assert(runner.destination().count() == 1)
  }
}
