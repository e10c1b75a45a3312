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

  test("deflate codec: independent golden bytes (raw RFC 1951 from " +
    "zlib wbits=-15, level 6) inflate to the exact payload — the OCF " +
    "spec's deflate is the RAW stream, no RFC 1950 wrapper/checksum") {
    val golden = Array[Byte](
      75, 47, 74, 76, 43, 81, 72, 44, 43, -54, 87, 72, 73, 77, -53,
      73, 44, 73, 85, 72, -49, -49, 73, 73, -51, 83, 72, -54, -55,
      79, -50, 86, 48, 48, 52, 50, 54, 49, 53, 51, -73, -80, 68, 98,
      2, 0)
    val want = "graft avro deflate golden block 0123456789 0123456789"
    assert(new String(AvroStage.inflate(golden),
      java.nio.charset.StandardCharsets.UTF_8) == want)
    // a zlib-WRAPPED stream (RFC 1950: 0x78 header + adler) is a
    // different format and must NOT decode as the OCF deflate codec
    intercept[Exception] {
      val zlibWrapped = {
        val d = new java.util.zip.Deflater(6, false) // nowrap = false
        d.setInput(want.getBytes); d.finish()
        val buf = new Array[Byte](4096)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      }
      // raw-inflate of a wrapped stream throws or mis-decodes; both
      // must surface as an exception, never silent wrong bytes
      val got = AvroStage.inflate(zlibWrapped)
      require(new String(got) == want, "mis-decode")
    }
  }

  test("deflate codec round trip: write(codec=deflate) → all three " +
    "readers (readContainer, streamContainer, streamContainerAuto) " +
    "decode identically; the header says deflate; repetitive blocks " +
    "actually shrink") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType),
      StructField("amt", DecimalType(12, 2))))
    val rows = (1L to 2000L).map(i => Row(
      i, "repetitive-payload-" + (i % 3),
      new java.math.BigDecimal("1234.56")))
    val json = AvroStage.schemaJson(schema)
    def container(codec: String): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      AvroStage.writeContainer(out, json,
        rows.iterator.map(AvroStage.encodeRow(schema, _)),
        recordsPerBlock = 256, codec = codec)
      out.toByteArray
    }
    val plain = container("null")
    val packed = container("deflate")
    assert(packed.length < plain.length / 3,
      s"deflate must shrink repetitive data: ${packed.length} vs " +
        s"${plain.length}")
    assert(new String(packed).contains("deflate"), "header codec")

    val viaRead = AvroStage.readContainer(packed, schema)
    val viaStream = AvroStage.streamContainer(
      new java.io.ByteArrayInputStream(packed), schema).toSeq
    val (autoSchema, autoIt) = AvroStage.streamContainerAuto(
      new java.io.ByteArrayInputStream(packed))
    val viaAuto = autoIt.toSeq
    assert(autoSchema.fieldNames.toSeq == schema.fieldNames.toSeq)
    Seq(viaRead, viaStream, viaAuto).foreach { got =>
      assert(got.size == 2000)
      assert(got.head.getLong(0) == 1L)
      assert(got(1999).getString(1) == "repetitive-payload-2")
      assert(got(42).getDecimal(2).compareTo(
        new java.math.BigDecimal("1234.56")) == 0)
    }

    // the distributed writer honors the codec too
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.take(100).asJava, schema)
      .repartition(2)
    val dir = tmpDir("avrodeflate")
    val files = AvroStage.write(df, dir, codec = "deflate")
    val back = files.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(path)
      try AvroStage.readContainer(in.readAllBytes(), schema)
      finally in.close()
    }
    assert(back.size == 100)
    assert(back.map(_.getLong(0)).sorted == (1L to 100L))

    // unknown codecs fail loudly on both sides
    intercept[IllegalArgumentException] {
      AvroStage.write(df, tmpDir("avrobad"), codec = "lz77")
    }
  }

  test("maxBytesPerFile rolls a partition's output into bounded OCFs " +
    "(PEERDB_S3_BYTES_PER_AVRO_FILE): every file under the bound + " +
    "one record's slack, no empty trailer when the bound lands on " +
    "the last record, union of files equals the input, and the " +
    "pre-compression bound is codec-independent") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType)))
    import scala.jdk.CollectionConverters._
    // ~30 bytes/record × 1000 records per partition; bound 4 KB →
    // expect ~8 files per partition
    val rows = (1L to 2000L).map(i => Row(i, "payload-%05d".format(i)))
    val df = spark.createDataFrame(rows.asJava, schema).repartition(2)
    Seq("null", "deflate").foreach { codec =>
      val dir = tmpDir(s"avroroll_$codec")
      val counter = spark.sparkContext.longAccumulator("roll")
      val files = AvroStage.write(df, dir, codec, counter,
        maxBytesPerFile = 4096)
      assert(counter.value == 2000)
      assert(files.size > 4,
        s"$codec: expected several rolled files, got ${files.size}")
      assert(files.forall(_.matches(".*part-\\d{5}-\\d{4}\\.avro$")),
        files.take(3).toString)
      val hc = spark.sparkContext.hadoopConfiguration
      val back = files.flatMap { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val in = p.getFileSystem(hc).open(p)
        try AvroStage.readContainer(in.readAllBytes(), schema)
        finally in.close()
      }
      assert(back.size == 2000, codec)
      assert(back.map(_.getLong(0)).sorted == (1L to 2000L), codec)
      // no header-only trailers
      assert(back.nonEmpty && files.size == files.distinct.size)
    }
    // the same data under different codecs splits at the SAME record
    // boundaries (pre-compression accounting) — file COUNT matches
    val n1 = AvroStage.write(df, tmpDir("avroroll_a"), "null",
      maxBytesPerFile = 4096).size
    val n2 = AvroStage.write(df, tmpDir("avroroll_b"), "zstandard",
      maxBytesPerFile = 4096).size
    assert(n1 == n2, "codec must not move the split points")
  }

  test("a TRUNCATED OCF (torn write, partial upload) fails loudly in " +
    "readContainer — copyOfRange zero-padding must never decode " +
    "fabricated zero rows") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType)))
    val out = new ByteArrayOutputStream()
    AvroStage.writeContainer(out, AvroStage.schemaJson(schema),
      (1L to 100L).iterator.map(i =>
        AvroStage.encodeRow(schema, Row(i, "v" + i))))
    val whole = out.toByteArray
    val torn = java.util.Arrays.copyOf(whole, whole.length - 40)
    val e = intercept[Exception] {
      AvroStage.readContainer(torn, schema)
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("truncated") ||
        e.getMessage.contains("EOF")), e.toString)
  }

  test("snappy codec: a HAND-BUILT block straight from the public " +
    "snappy format spec (varint length + one literal tag) + the OCF " +
    "spec's trailing big-endian CRC32 of the uncompressed data " +
    "decodes exactly; a corrupted CRC fails loudly") {
    val payload = "graft snappy golden".getBytes(
      java.nio.charset.StandardCharsets.UTF_8) // 19 bytes
    // snappy raw: preamble varint(19)=0x13; literal tag for len 19 =
    // (19-1)<<2 = 0x48; then the bytes verbatim
    val compressed = Array[Byte](0x13, 0x48) ++ payload
    val crc = new java.util.zip.CRC32(); crc.update(payload)
    val v = crc.getValue
    val block = compressed ++ Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    assert(AvroStage.snappyUnpack(block).toSeq == payload.toSeq)
    val bad = block.clone(); bad(bad.length - 1) =
      (bad(bad.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      AvroStage.snappyUnpack(bad)
    }
    assert(e.getMessage.contains("CRC32"))
  }

  test("zstandard codec: an INDEPENDENT golden frame (the zstd CLI's " +
    "own output, xxhash checksum included) decodes exactly — the " +
    "reader must be content-size-agnostic and checksum-tolerant") {
    val goldenHex =
      "28b52ffd04582101006772616674207a73746420676f6c64656e2070" +
        "61796c6f61642030313233343536373839c20b3da9"
    val golden = goldenHex.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(new String(AvroStage.zstdUnpack(golden),
      java.nio.charset.StandardCharsets.UTF_8) ==
      "graft zstd golden payload 0123456789")
  }

  test("snappy + zstandard round trip through write() and all three " +
    "readers, headers carry the codec, repetitive data shrinks") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType)))
    val rows = (1L to 1000L).map(i => Row(i, "payload-" + (i % 5)))
    val json = AvroStage.schemaJson(schema)
    Seq("snappy", "zstandard").foreach { codec =>
      val out = new ByteArrayOutputStream()
      AvroStage.writeContainer(out, json,
        rows.iterator.map(AvroStage.encodeRow(schema, _)),
        recordsPerBlock = 128, codec = codec)
      val packed = out.toByteArray
      val plain = {
        val o = new ByteArrayOutputStream()
        AvroStage.writeContainer(o, json,
          rows.iterator.map(AvroStage.encodeRow(schema, _)),
          recordsPerBlock = 128)
        o.toByteArray
      }
      assert(packed.length < plain.length, s"$codec must shrink")
      assert(new String(packed,
        java.nio.charset.StandardCharsets.ISO_8859_1).contains(codec))
      val viaRead = AvroStage.readContainer(packed, schema)
      val viaStream = AvroStage.streamContainer(
        new java.io.ByteArrayInputStream(packed), schema).toSeq
      val (_, autoIt) = AvroStage.streamContainerAuto(
        new java.io.ByteArrayInputStream(packed))
      Seq(viaRead, viaStream, autoIt.toSeq).foreach { got =>
        assert(got.size == 1000, codec)
        assert(got(999).getString(1) == "payload-0", codec)
      }
    }
  }
}
