package graft.cdc

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.PgOutput._
import graft.mirror.{MirrorConfig, MirrorRunner}

/** The owners wide-type fixture (FIXTURES.md §1, the reference's
  * canonical type-coverage table from `flow/e2e/test_utils.go:308-483`)
  * driven through the BINARY WIRE PATH: pgoutput bytes with every
  * column format the decoder handles — binary int2/int4/int8/float8/
  * bool/bytea/uuid, text bool/numeric/date/timestamptz/varchar/jsonb,
  * and PG ARRAY LITERALS (`{1,2,3}` / `{"a",NULL,"c,x"}`) which must
  * become JSON arrays, not strings (a carrier string silently
  * from_jsons to NULL where the payload schema expects an array) —
  * then decoder → WAL → mirror → typed destination, including a
  * TOAST'd update that must preserve the array column. */
class OwnersFixtureSpec extends SparkSpec {

  private def be16(v: Short): Array[Byte] =
    java.nio.ByteBuffer.allocate(2).putShort(v).array()
  private def be32(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()
  private def be64(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()
  private def beD(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putDouble(v).array()

  test("owners wide-type row over the wire: binary + text + array " +
    "formats land typed; TOAST update preserves the array column") {
    val relId = 90
    val rel = Relation(relId, "public", "owners", 'd'.toInt, Seq(
      RelationColumn(1, "id", Oid.Int8, -1),
      RelationColumn(0, "u", Oid.Uuid, -1),
      RelationColumn(0, "price", Oid.Numeric, -1),
      RelationColumn(0, "flag", Oid.Bool, -1),
      RelationColumn(0, "cnt", Oid.Int4, -1),
      RelationColumn(0, "d", Oid.Float8, -1),
      RelationColumn(0, "name", Oid.Varchar, -1),
      RelationColumn(0, "created", Oid.TimestampTz, -1),
      RelationColumn(0, "day", Oid.Date, -1),
      RelationColumn(0, "f2", 1016, -1), // int8[]
      RelationColumn(0, "ss", 1009, -1), // text[]
      RelationColumn(0, "sh", Oid.Int2, -1),
      RelationColumn(0, "js", Oid.Jsonb, -1)))

    val uuidBytes = (0 until 16).map(i => (i * 17).toByte).toArray
    val insertTuple = TupleData(Seq(
      BinaryColumn(be64(1L)),
      BinaryColumn(uuidBytes),
      text("12345.67800000"),
      text("t"),
      BinaryColumn(be32(42)),
      BinaryColumn(beD(2.5)),
      text("o'reilly"),
      text("2024-01-02 03:04:05.123456+00"),
      text("2024-03-04"),
      text("{1,2,3}"),
      text("""{"a",NULL,"c,x","q\"uote"}"""),
      BinaryColumn(be16(7.toShort)),
      text("""{"k": [1, 2]}""")))

    // TOAST'd update: only id + name present; every other column —
    // including both arrays — arrives as unchanged-TOAST and must
    // backfill from the destination
    val toastUpdate = TupleData(Seq(
      BinaryColumn(be64(1L)),
      ToastColumn, ToastColumn, ToastColumn, ToastColumn, ToastColumn,
      text("updated"),
      ToastColumn, ToastColumn, ToastColumn, ToastColumn, ToastColumn,
      ToastColumn))

    val msgs: Seq[(Long, Message)] = Seq(
      1L -> (rel: Message),
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Insert(relId, insertTuple),
      9L -> Commit(0, 9L, 10L, PgEpochMicros),
      11L -> Begin(19L, PgEpochMicros + 1, 2),
      12L -> Update(relId, None, None, toastUpdate),
      19L -> Commit(0, 19L, 20L, PgEpochMicros + 1))

    val dec = new PgOutputDecoder(_ => true, _ => "owners")
    val records = msgs.flatMap { case (l, m) => dec.feed(l, encode(m)) }
    assert(records.size == 2)
    // the insert's row image carries real JSON arrays, not strings
    assert(records.head.data.contains(""""f2":[1,2,3]"""))
    assert(records.head.data.contains(""""ss":["a",null,"c,x","q\"uote"]"""))

    val wal = tmpDir("owners_wal")
    val base = tmpDir("owners_mirror")
    ChangeLogWal.append(wal, records)
    val runner = new MirrorRunner(spark, MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType),
        StructField("u", StringType),
        StructField("price", DecimalType(20, 8)),
        StructField("flag", BooleanType),
        StructField("cnt", IntegerType),
        StructField("d", DoubleType),
        StructField("name", StringType),
        StructField("created", TimestampType),
        StructField("day", DateType),
        StructField("f2", ArrayType(LongType)),
        StructField("ss", ArrayType(StringType)),
        StructField("sh", ShortType),
        StructField("js", StringType))),
      destinationTable = "owners"))
    runner.runAvailableNow()

    val dest = runner.destination().collect()
    assert(dest.length == 1)
    val r = dest.head
    assert(r.getAs[Long]("id") == 1L)
    assert(r.getAs[String]("u") ==
      "00112233-4455-6677-8899-aabbccddeeff")
    assert(r.getAs[java.math.BigDecimal]("price") ==
      new java.math.BigDecimal("12345.67800000"))
    assert(r.getAs[Boolean]("flag"))
    assert(r.getAs[Int]("cnt") == 42)
    assert(r.getAs[Double]("d") == 2.5)
    assert(r.getAs[String]("name") == "updated") // the TOAST update
    assert(r.getAs[java.sql.Timestamp]("created") ==
      java.sql.Timestamp.from(java.time.Instant.parse(
        "2024-01-02T03:04:05.123456Z")))
    assert(r.getAs[java.sql.Date]("day").toString == "2024-03-04")
    // arrays survived BOTH the wire decode and the TOAST backfill
    assert(r.getSeq[Long](r.fieldIndex("f2")) == Seq(1L, 2L, 3L))
    assert(r.getSeq[String](r.fieldIndex("ss")) ==
      Seq("a", null, "c,x", "q\"uote"))
    assert(r.getAs[Short]("sh") == 7)
    assert(r.getAs[String]("js").replaceAll("\\s", "") ==
      """{"k":[1,2]}""")
  }
}
