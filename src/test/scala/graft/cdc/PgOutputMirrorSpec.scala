package graft.cdc

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.PgOutput._
import graft.mirror.{MirrorConfig, MirrorRunner}

/** End-to-end: a binary pgoutput stream decodes into ChangeRecords, lands
  * in the WAL, and replays through the FULL mirror pipeline (stream source
  * → raw sync → normalize → merge) — the decoded wire protocol driving the
  * same path the reference drives from a live replication slot. */
class PgOutputMirrorSpec extends SparkSpec {

  test("pgoutput stream → decoder → WAL → mirror destination") {
    val relId = 77
    val rel = Relation(relId, "public", "t", 'd'.toInt, Seq(
      RelationColumn(1, "id", Oid.Int8, -1),
      RelationColumn(0, "name", Oid.Text, -1),
      RelationColumn(0, "v", Oid.Int8, -1)))

    def ins(id: Long, name: String, v: Long) =
      Insert(relId, TupleData(Seq(text(id.toString), text(name),
        text(v.toString))))
    val key = (id: Long) =>
      TupleData(Seq(text(id.toString), NullColumn, NullColumn))

    // Three transactions: bulk insert; TOAST'd update + plain update;
    // delete + reinsert.
    val msgs: Seq[(Long, Message)] = Seq(
      1L -> (rel: Message),
      2L -> Begin(19L, PgEpochMicros + 100L, 1),
      3L -> ins(1, "a", 10), 4L -> ins(2, "b", 20), 5L -> ins(3, "c", 30),
      19L -> Commit(0, 19L, 20L, PgEpochMicros + 100L),
      21L -> Begin(29L, PgEpochMicros + 200L, 2),
      22L -> Update(relId, Some('K'), Some(key(1)),
        TupleData(Seq(text("1"), ToastColumn, text("111")))), // name TOAST'd
      23L -> Update(relId, None, None,
        TupleData(Seq(text("2"), text("b2"), text("222")))),
      29L -> Commit(0, 29L, 30L, PgEpochMicros + 200L),
      31L -> Begin(39L, PgEpochMicros + 300L, 3),
      32L -> Delete(relId, 'K', key(3)),
      33L -> ins(4, "d", 40),
      39L -> Commit(0, 39L, 40L, PgEpochMicros + 300L))

    val dec = new PgOutputDecoder(_ => true, _ => "dest.t")
    val records = msgs.flatMap { case (lsn, m) => dec.feed(lsn, encode(m)) }
    assert(records.size == 7)
    assert(dec.latestCheckpoint == 39L)

    val wal = tmpDir("pgo_wal")
    val base = tmpDir("pgo_mirror")
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
    assert(byId(1L).getAs[String]("name") == "a") // TOAST: name preserved
    assert(byId(1L).getAs[Long]("v") == 111L)
    assert(byId(2L).getAs[String]("name") == "b2")
    assert(byId(2L).getAs[Long]("v") == 222L)
    assert(byId(4L).getAs[String]("name") == "d")
    assert(dest.filter(col("id") === 3L).isEmpty)
  }
}
