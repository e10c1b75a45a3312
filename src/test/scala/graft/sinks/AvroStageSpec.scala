package graft.sinks

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Avro staged-write coverage: golden bytes against the public Avro spec,
  * container-file framing, and a distributed write→read round trip. */
class AvroStageSpec extends SparkSpec {

  private def zig(v: Long): Seq[Int] = {
    val o = new ByteArrayOutputStream()
    AvroStage.writeLong(o, v)
    o.toByteArray.toSeq.map(_ & 0xFF)
  }

  test("golden zigzag varints per the Avro spec's own table") {
    assert(zig(0) == Seq(0x00))
    assert(zig(-1) == Seq(0x01))
    assert(zig(1) == Seq(0x02))
    assert(zig(-2) == Seq(0x03))
    assert(zig(2) == Seq(0x04))
    assert(zig(-64) == Seq(0x7F))
    assert(zig(64) == Seq(0x80, 0x01))
    assert(zig(8192) == Seq(0x80, 0x80, 0x01))
    assert(zig(-8193) == Seq(0x81, 0x80, 0x01))
  }

  test("golden record bytes: nullable long + string record") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType, nullable = true)))
    // id=3 → union branch 1 (0x02), zigzag(3)=0x06;
    // name="ab" → branch 1, len 2 (0x04), 'a', 'b'
    assert(AvroStage.encodeRow(schema, Row(3L, "ab")).toSeq ==
      Seq[Byte](0x02, 0x06, 0x02, 0x04, 'a', 'b'))
    // nulls: branch 0 for both fields
    assert(AvroStage.encodeRow(schema, Row(null, null)).toSeq ==
      Seq[Byte](0x00, 0x00))
  }

  test("schema JSON carries logical types and null unions") {
    val j = AvroStage.schemaJson(StructType(Seq(
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("amt", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType, containsNull = true)))))
    assert(j.contains(""""logicalType":"date""""))
    assert(j.contains(""""logicalType":"timestamp-micros""""))
    assert(j.contains(
      """"logicalType":"decimal","precision":12,"scale":2"""))
    assert(j.contains(""""type":"array""""))
    assert(j.contains("""["null","string"]"""))
  }

  test("container file framing: magic, metadata, sync-bracketed blocks") {
    val schema = StructType(Seq(StructField("id", LongType,
      nullable = false)))
    val out = new ByteArrayOutputStream()
    val sync = Array.tabulate[Byte](16)(_.toByte)
    AvroStage.writeContainer(out, AvroStage.schemaJson(schema),
      (1L to 5L).iterator.map(i => AvroStage.encodeRow(schema, Row(i))),
      recordsPerBlock = 2, sync = sync)
    val bytes = out.toByteArray
    assert(bytes.take(4).sameElements(Array[Byte]('O', 'b', 'j', 1)))
    assert(new String(bytes).contains("avro.schema"))
    // 5 records at 2/block → 3 blocks → 4 sync markers (header + 3)
    val syncCount = bytes.sliding(16).count(_.sameElements(sync))
    assert(syncCount == 4)
    // the reader reconstructs all records
    val rows = AvroStage.readContainer(bytes, schema)
    assert(rows.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("distributed write→read round trip over every mapped type") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ok", BooleanType),
      StructField("n", IntegerType),
      StructField("x", DoubleType),
      StructField("f", FloatType),
      StructField("s", StringType),
      StructField("b", BinaryType),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("amt", DecimalType(12, 2)),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    import scala.jdk.CollectionConverters._
    val rows = List(
      Row(1L, true, 42, 2.5, 1.25f, "hello", Array[Byte](9, 8),
        java.sql.Date.valueOf("2024-01-15"),
        java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-15T12:34:56.789012Z")),
        new java.math.BigDecimal("1234.56"),
        Seq("a", null, "c")),
      Row(2L, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows.asJava, schema).repartition(2)
    val dir = tmpDir("avrostage")
    val files = AvroStage.write(df, dir)
    assert(files.nonEmpty && files.forall(_.endsWith(".avro")))

    val back = files.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val in = fs.open(path)
      val bytes = try in.readAllBytes() finally in.close()
      AvroStage.readContainer(bytes, schema)
    }.sortBy(_.getLong(0))
    assert(back.size == 2)
    val r1 = back.head
    assert(r1.getLong(0) == 1L && r1.getBoolean(1) && r1.getInt(2) == 42)
    assert(r1.getDouble(3) == 2.5 && r1.getFloat(4) == 1.25f)
    assert(r1.getString(5) == "hello")
    assert(r1.getAs[Array[Byte]](6).toSeq == Seq[Byte](9, 8))
    assert(r1.getAs[java.sql.Date](7).toString == "2024-01-15")
    assert(r1.getAs[java.sql.Timestamp](8).toInstant ==
      java.time.Instant.parse("2024-01-15T12:34:56.789012Z"))
    assert(r1.getAs[java.math.BigDecimal](9) ==
      new java.math.BigDecimal("1234.56"))
    assert(r1.getAs[Seq[Any]](10) == Seq("a", null, "c"))
    val r2 = back(1)
    assert(r2.getLong(0) == 2L && (1 to 10).forall(r2.isNullAt))
  }

  test("streamContainer decodes block-at-a-time: identical rows to " +
    "readContainer, and rows of an early block surface WITHOUT " +
    "touching later file bytes (O(block) memory, not O(file))") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType)))
    val out = new ByteArrayOutputStream()
    AvroStage.writeContainer(out, AvroStage.schemaJson(schema),
      (1L to 1000L).iterator.map(i =>
        AvroStage.encodeRow(schema, Row(i, "v" + i))),
      recordsPerBlock = 100) // 10 blocks
    val bytes = out.toByteArray

    // full-stream equality with the array reader
    val streamed = AvroStage.streamContainer(
      new java.io.ByteArrayInputStream(bytes), schema).toSeq
    assert(streamed == AvroStage.readContainer(bytes, schema))

    // laziness proof: a stream that DIES after ~3 blocks still yields
    // the first blocks' rows — a whole-file buffering implementation
    // would throw before the first row
    val broken = new java.io.InputStream {
      private var pos = 0
      private val limit = bytes.length / 3
      override def read(): Int = {
        if (pos >= limit)
          throw new java.io.IOException("tail unavailable")
        val b = bytes(pos) & 0xFF; pos += 1; b
      }
    }
    val it = AvroStage.streamContainer(broken, schema)
    val first200 = it.take(200).toSeq
    assert(first200.map(_.getLong(0)) == (1L to 200L))
    intercept[java.io.IOException] { while (it.hasNext) it.next() }
  }

  test("streamContainerAuto decodes with the EMBEDDED writer schema: " +
    "mixed nullability (the union-byte layout) and logical types " +
    "round-trip with no caller schema at all — the COPY-replay " +
    "contract; a declared-DDL guess would misalign mid-block") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false), // no union byte
      StructField("s", StringType), // union byte
      StructField("d", DateType),
      StructField("n", DecimalType(10, 2)),
      StructField("tags", ArrayType(StringType))))
    val rows = (1L to 500L).map(i => Row(
      i, if (i % 7 == 0) null else "v" + i,
      java.sql.Date.valueOf("2024-03-01"),
      new java.math.BigDecimal("12345.67"),
      Seq("a" + i, "b")))
    val out = new ByteArrayOutputStream()
    AvroStage.writeContainer(out, AvroStage.schemaJson(schema),
      rows.iterator.map(AvroStage.encodeRow(schema, _)),
      recordsPerBlock = 64) // multi-block: misalignment would surface
    val (got, it) = AvroStage.streamContainerAuto(
      new java.io.ByteArrayInputStream(out.toByteArray))
    assert(got.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(!got("id").nullable && got("s").nullable)
    assert(got("d").dataType == DateType &&
      got("n").dataType == DecimalType(10, 2))
    val back = it.toSeq
    assert(back.size == 500)
    assert(back(6).isNullAt(1) && back(0).getString(1) == "v1")
    assert(back(41).getSeq[String](4) == Seq("a42", "b"))
    assert(back(99).getDecimal(3).compareTo(
      new java.math.BigDecimal("12345.67")) == 0)
  }
}
