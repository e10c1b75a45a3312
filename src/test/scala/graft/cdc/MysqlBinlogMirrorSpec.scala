package graft.cdc

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.MysqlBinlog._
import graft.mirror.{MirrorConfig, MirrorRunner}

/** End-to-end: a binary MySQL binlog stream decodes into ChangeRecords,
  * lands in the WAL, and replays through the FULL mirror pipeline
  * (stream source → raw sync → normalize → merge) — the decoded wire
  * protocol driving the same path the reference drives from a live
  * binlog syncer, including the MINIMAL-row-image unchanged column
  * surviving normalize (the TOAST-equivalent branch). */
class MysqlBinlogMirrorSpec extends SparkSpec {

  test("binlog stream → decoder → WAL → mirror destination") {
    val tm = TableMap(11L, "app", "t",
      Array(ColType.LongLong, ColType.Varchar, ColType.LongLong),
      Array(0, 255, 0),
      Array(false, true, true),
      Seq("id", "name", "v"),
      Seq(true, true, true))

    def full(id: Long, name: String, v: Long) =
      Seq(Some(Some(fLong(id))), Some(Some(fVarchar(name, 255))),
        Some(Some(fLong(v))))
    def key(id: Long) = Seq(Some(Some(fLong(id))), None, None)

    // Three transactions: bulk insert; MINIMAL-image update (name
    // unchanged/absent) + full update; delete + reinsert.
    val events: Seq[Array[Byte]] = Seq(
      encodeFormatDescription(100L, 4L),
      encodeTableMap(100L, 10L, tm),
      encodeQuery(100L, 20L, "app", "BEGIN"),
      encodeRows(100L, 30L, Ev.WriteRowsV2, tm, Seq(
        full(1, "a", 10), full(2, "b", 20), full(3, "c", 30))),
      encodeXid(100L, 40L, 1L),
      encodeQuery(200L, 50L, "app", "BEGIN"),
      encodeRows(200L, 60L, Ev.UpdateRowsV2, tm, Seq(
        key(1), Seq(Some(Some(fLong(1L))), None, Some(Some(fLong(111L)))))),
      encodeRows(200L, 70L, Ev.UpdateRowsV2, tm, Seq(
        full(2, "b", 20), full(2, "b2", 222))),
      encodeXid(200L, 80L, 2L),
      encodeQuery(300L, 90L, "app", "BEGIN"),
      encodeRows(300L, 100L, Ev.DeleteRowsV2, tm, Seq(key(3))),
      encodeRows(300L, 110L, Ev.WriteRowsV2, tm, Seq(full(4, "d", 40))),
      encodeXid(300L, 120L, 3L))

    val dec = new MysqlBinlogDecoder(_ => true, _ => "dest.t")
    val records = events.flatMap(dec.feed)
    assert(records.size == 7)
    assert(dec.latestCheckpoint == 120L)
    assert(dec.latestCheckpointText == "binlog.000001:120")
    // the MINIMAL-image update carries 'name' as unchanged, not null
    assert(records.find(r =>
      r.recordType == graft.model.ChangeRecord.TypeUpdate &&
        r.data.contains("111")).get.unchangedToastColumns == Seq("name"))

    val wal = tmpDir("mybl_wal")
    val base = tmpDir("mybl_mirror")
    ChangeLogWal.append(wal, records)
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("v", LongType))),
      destinationTable = "dest.t")
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()

    val dest = runner.destination()
    assert(dest.count() == 3) // 1, 2 updated; 3 deleted; 4 inserted
    val byId = dest.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("name") == "a") // MINIMAL: preserved
    assert(byId(1L).getAs[Long]("v") == 111L)
    assert(byId(2L).getAs[String]("name") == "b2")
    assert(byId(2L).getAs[Long]("v") == 222L)
    assert(byId(4L).getAs[String]("name") == "d")
    assert(dest.filter(col("id") === 3L).isEmpty)
  }
}
