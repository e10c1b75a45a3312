package graft.mirror

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.model.ChangeRecord

class MaintenanceSpec extends SparkSpec {

  private val payloadSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  test("resync rebuilds and atomically swaps; old table parked") {
    import spark.implicits._
    val base = tmpDir("resync")
    val dest = s"$base/dest"
    // existing (stale) destination
    Seq((1L, 1L)).toDF("id", "v").write.parquet(dest)

    Maintenance.resync(spark, dest) { freshPath =>
      Seq((1L, 10L), (2L, 20L)).toDF("id", "v").write.parquet(freshPath)
    }
    val now = spark.read.parquet(dest).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(now == Seq((1L, 10L), (2L, 20L)))
    // rollback copy parked
    assert(spark.read.parquet(s"${dest}_pre_resync").count() == 1)
  }

  test("resync with full mirror rebuild (snapshot + drain)") {
    import spark.implicits._
    val wal = tmpDir("rswal")
    val base = tmpDir("rsmir")
    ChangeLogWal.append(wal, Seq(
      ChangeRecord(0, 60, "60", 60000, 1, "t", "d",
        """{"id":9,"v":9}""", null, Nil)))
    val dest = s"$base/dest"
    Seq((1L, 111L)).toDF("id", "v").write.parquet(dest) // stale

    Maintenance.resync(spark, dest) { fresh =>
      val cfg = MirrorConfig(wal, s"$base/raw", fresh,
        s"$base/ckpt_resync", Seq("id"), payloadSchema,
        destinationTable = "d", snapshotCheckpoint = 50L)
      val r = new MirrorRunner(spark, cfg)
      r.bootstrapSnapshot(Seq((1L, 100L)).toDF("id", "v"))
      r.runAvailableNow()
    }
    val st = spark.read.parquet(dest).filter(!col("_peerdb_is_deleted"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
    assert(st == Map(1L -> 100L, 9L -> 9L))
  }

  test("raw compaction rewrites crowded batch partitions only") {
    import spark.implicits._
    val raw = tmpDir("compact") + "/raw"
    // batch 0: 6 small files; batch 1: 1 file
    (1 to 6).foreach { i =>
      Seq((s"u$i", i.toLong, "d", s"""{"id":$i}""", 0, null: String, 0L, ""))
        .toDF("_peerdb_uid", "_peerdb_timestamp",
          "_peerdb_destination_table_name", "_peerdb_data",
          "_peerdb_record_type", "_peerdb_match_data", "_peerdb_batch_id",
          "_peerdb_unchanged_toast_columns")
        .write.mode("append").partitionBy("_peerdb_batch_id").parquet(raw)
    }
    Seq(("u9", 9L, "d", """{"id":9}""", 0, null: String, 1L, ""))
      .toDF("_peerdb_uid", "_peerdb_timestamp",
        "_peerdb_destination_table_name", "_peerdb_data",
        "_peerdb_record_type", "_peerdb_match_data", "_peerdb_batch_id",
        "_peerdb_unchanged_toast_columns")
      .write.mode("append").partitionBy("_peerdb_batch_id").parquet(raw)

    val before = spark.read.parquet(raw).count()
    val rewritten = Maintenance.compactRaw(spark, raw,
      maxFilesPerPartition = 4)
    assert(rewritten == Seq(0L))
    assert(spark.read.parquet(raw).count() == before) // no data loss
    val files = new java.io.File(s"$raw/_peerdb_batch_id=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 compacted file, got $files")
  }

  test("raw retention: batches past the cleanup threshold are dropped " +
    "after normalize, destination unaffected") {
    val wal = tmpDir("retwal")
    val base = tmpDir("retmir")
    // 12 single-record transactions at maxBatchSize 3 → 4 micro-batches
    // (ids 0..3).
    ChangeLogWal.append(wal, (1L to 12L).map(i =>
      ChangeRecord(0, i, i.toString, i * 1000, i, "t", "d",
        s"""{"id":$i,"v":${i * 10}}""", null, Nil)))
    val cfg = MirrorConfig(wal, s"$base/raw", s"$base/dest",
      s"$base/ckpt", Seq("id"), payloadSchema,
      destinationTable = "d", maxBatchSize = 3)
    spark.conf.set("spark.graft.mirror.raw_batch_cleanup_threshold", "2")
    try new MirrorRunner(spark, cfg).runAvailableNow()
    finally spark.conf
      .unset("spark.graft.mirror.raw_batch_cleanup_threshold")
    // Last normalized batch id = 3, threshold 2 → ids < 1 deleted.
    val kept = new java.io.File(s"$base/raw").listFiles()
      .filter(_.getName.startsWith("_peerdb_batch_id=")).map(_.getName)
      .sorted.toSeq
    assert(kept == Seq("_peerdb_batch_id=1", "_peerdb_batch_id=2",
      "_peerdb_batch_id=3"), kept.toString)
    // Destination still holds every record.
    assert(spark.read.parquet(s"$base/dest")
      .filter(!col("_peerdb_is_deleted")).count() == 12)
    // Threshold 0 (the default) keeps everything: explicit call no-ops.
    assert(Maintenance.cleanupRaw(spark, s"$base/raw", 3, 0).isEmpty)
  }
}
