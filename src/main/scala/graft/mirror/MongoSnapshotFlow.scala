package graft.mirror

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, from_json}

import graft.cdc.{Bson, CaptureEndpoint, MongoSession, MongoWire}
import graft.qrep.LiveMongoPull

/** Snapshot→CDC handoff against a LIVE MongoDB source — the
  * reference's Mongo initial-load posture: capture the cluster's
  * `operationTime` FIRST, read every routed collection, then open the
  * change stream `startAtOperationTime` at the captured time
  * (mongo/cdc.go's StartAtOperationTime fallback is the same
  * mechanism; the initial load rides the QRep partition reads,
  * mongo/qrep.go).
  *
  * Exactness is ORDER + IDEMPOTENCE, like the MySQL handoff: every
  * commit after the captured time REPLAYS through the stream; a
  * commit landing between the capture and a partition's read appears
  * in both the snapshot and the stream and the version-idempotent
  * merge absorbs it (snapshot at version 0, stream ≥ 1); a delete in
  * that window is absent from the snapshot and its replay is a no-op.
  *
  * The captured time persists as the `optime:<secs>:<inc>` sentinel
  * in the capture offset — [[MirrorRunner]]'s Mongo ingest seeds
  * `$changeStream.startAtOperationTime` from it until the first real
  * resume token takes over. Requires a replica set (change streams
  * and `operationTime` don't exist on standalone mongod).
  *
  * Collections read through [[LiveMongoPull]] (`_id`-range
  * partitioned find), then shape declaratively: `_full_document`
  * JSON → `from_json` with the table's payload schema — the SAME
  * decode path CDC change events take, so snapshot and stream cannot
  * diverge on value rendering.
  */
object MongoSnapshotFlow {

  import Bson._

  /** Cluster `operationTime` (seconds, increment) from a ping on
    * `db`. Absent on standalone servers — the handoff refuses rather
    * than silently streaming from "now" (which would lose the
    * overlap window). */
  def operationTime(sess: MongoSession, db: String): (Long, Long) = {
    val r = sess.call(Bson.encode(
      "ping" -> BInt32(1), "$db" -> BString(db)))
    MongoWire.field(r, "operationTime") match {
      case Some((0x11, v)) => // BSON timestamp: i64 LE, secs high
        val raw = MongoWire.int64Of(v)
        (raw >>> 32, raw & 0xFFFFFFFFL)
      case _ => throw new IllegalStateException(
        "mongo: no operationTime in command reply — the snapshot " +
          "handoff needs a replica set (change streams require one)")
    }
  }

  /** The whole initial-load phase: capture + persist the cluster
    * time, snapshot every routed collection, return the runner
    * bootstrapped at version 0 — `runAvailableNow()` continues
    * seamlessly into change-stream CDC from the captured time. */
  def initialLoad(spark: SparkSession, cfg: MirrorConfig,
      numPartitions: Int = 0, rowsPerPartition: Option[Long] = None)
      : MirrorRunner = {
    val url = cfg.captureDir.getOrElse(throw new IllegalArgumentException(
      "initialLoad needs captureDir = mongo://…"))
    require(graft.cdc.ChangeLogWal.headCp(cfg.walDir) < 0,
      "initialLoad needs a fresh mirror: local WAL already has records")
    val sourceFor = SnapshotFlow.invertRoutes(cfg)
    val ep = CaptureEndpoint.parse(url)
    require(ep.database.nonEmpty,
      "mongo:// capture endpoint requires a database path " +
        "(mongo://host:port/dbname)")
    val opTime = {
      val sess = LiveMongoPull.sessionFor(ep)
      try operationTime(sess, ep.database) finally sess.close()
    }
    // DURABLE before any read: the stream must start at-or-before
    // every commit the snapshot can possibly miss
    graft.util.FsText.write(s"${cfg.checkpointDir}/_capture_offset",
      s"optime:${opTime._1}:${opTime._2}",
      spark.sparkContext.hadoopConfiguration)
    val cfg2 = cfg.copy(snapshotCheckpoint = 0L)
    val runner = new MirrorRunner(spark, cfg2)
    val tables = (cfg.destinationTable ->
      TableConfig(cfg.pkColumns, cfg.payloadSchema)) +:
      cfg.extraTables.toSeq
    tables.foreach { case (table, tc) =>
      val sourceRel = sourceFor.getOrElse(table, table)
      val raw = LiveMongoPull.pull(spark, url, sourceRel,
        numPartitions = if (numPartitions > 0) numPartitions else 4,
        rowsPerPartition = rowsPerPartition)
      val schema = tc.effectiveSchema
      val typed = raw
        .select(from_json(col("_full_document"), schema).as("r"))
        .select(schema.fieldNames.map(n => col(s"r.$n")).toSeq: _*)
      runner.bootstrapSnapshot(table, typed, sourceTable = sourceRel)
    }
    runner
  }
}
