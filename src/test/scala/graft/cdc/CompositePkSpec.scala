package graft.cdc

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.PgOutput._
import graft.mirror.{MirrorConfig, MirrorRunner}

/** COMPOSITE primary keys through the full wire→mirror path — order
  * lines keyed (order_id, line_no), the canonical multi-column
  * replica identity. Every PK-sensitive mechanism must treat the key
  * as the TUPLE: latest-version dedup, merge bucketing, delete
  * tombstones, TOAST backfill, and the PK-CHANGING update (line_no
  * renumbered), which must delete the OLD composite key and insert
  * the new one (the reference's old-key-delete-at-version−1 union).
  * Single-column specs cannot catch a path that accidentally keys on
  * the first PK column alone. */
class CompositePkSpec extends SparkSpec {

  test("composite (order_id, line_no) PK: upsert, partial-key " +
    "collisions, delete, TOAST backfill, and a PK-changing update") {
    val relId = 95
    val rel = Relation(relId, "public", "lines", 'd'.toInt, Seq(
      RelationColumn(1, "order_id", Oid.Int8, -1),
      RelationColumn(1, "line_no", Oid.Int4, -1),
      RelationColumn(0, "sku", Oid.Text, -1),
      RelationColumn(0, "qty", Oid.Int8, -1)))

    def ins(o: Long, l: Int, sku: String, q: Long) =
      Insert(relId, TupleData(Seq(text(o.toString), text(l.toString),
        text(sku), text(q.toString))))
    def key(o: Long, l: Int) = TupleData(Seq(
      text(o.toString), text(l.toString), NullColumn, NullColumn))

    val msgs: Seq[(Long, Message)] = Seq(
      1L -> (rel: Message),
      2L -> Begin(9L, PgEpochMicros, 1),
      // partial-key collisions in every direction: same order
      // different line, same line different order
      3L -> ins(1, 1, "a", 10),
      4L -> ins(1, 2, "b", 20),
      5L -> ins(2, 1, "c", 30),
      6L -> ins(2, 2, "d", 40),
      9L -> Commit(0, 9L, 10L, PgEpochMicros),
      11L -> Begin(19L, PgEpochMicros + 1, 2),
      // TOAST update on (1,2): sku unchanged, qty bumped
      12L -> Update(relId, Some('K'), Some(key(1, 2)),
        TupleData(Seq(text("1"), text("2"), ToastColumn, text("21")))),
      // delete exactly (2,1); (2,2) and (1,1) must survive
      13L -> Delete(relId, 'K', key(2, 1)),
      // PK-CHANGING update: (2,2) renumbers to (2,3)
      14L -> Update(relId, Some('K'), Some(key(2, 2)),
        TupleData(Seq(text("2"), text("3"), text("d"), text("40")))),
      19L -> Commit(0, 19L, 20L, PgEpochMicros + 1))

    val dec = new PgOutputDecoder(_ => true, _ => "lines")
    val records = msgs.flatMap { case (l, m) => dec.feed(l, encode(m)) }

    val wal = tmpDir("cpk_wal")
    val base = tmpDir("cpk_mirror")
    ChangeLogWal.append(wal, records)
    val runner = new MirrorRunner(spark, MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt",
      pkColumns = Seq("order_id", "line_no"),
      payloadSchema = StructType(Seq(
        StructField("order_id", LongType),
        StructField("line_no", IntegerType),
        StructField("sku", StringType),
        StructField("qty", LongType))),
      destinationTable = "lines"))
    runner.runAvailableNow()

    val dest = runner.destination().collect()
      .map(r => (r.getAs[Long]("order_id"),
        r.getAs[Int]("line_no")) -> r).toMap
    assert(dest.keySet == Set((1L, 1), (1L, 2), (2L, 3)),
      s"got keys ${dest.keySet}")
    assert(dest((1L, 1)).getAs[String]("sku") == "a")
    assert(dest((1L, 1)).getAs[Long]("qty") == 10L)
    // TOAST backfill preserved sku, took the new qty
    assert(dest((1L, 2)).getAs[String]("sku") == "b")
    assert(dest((1L, 2)).getAs[Long]("qty") == 21L)
    // the renumbered line carries its payload under the NEW key only
    assert(dest((2L, 3)).getAs[String]("sku") == "d")
    assert(dest((2L, 3)).getAs[Long]("qty") == 40L)
  }
}
