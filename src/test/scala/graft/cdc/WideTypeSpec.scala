package graft.cdc

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.RawTable

/** Wide-type round trip — the owners-fixture analog (FIXTURES.md §1,
  * flow/e2e/test_utils.go:308-483): every payload kind the JSON carrier
  * supports flows through normalize intact, including the all-null row and
  * a pre-1970 date. */
class WideTypeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType),
    StructField("num", DecimalType(20, 8)),
    StructField("b", BooleanType),
    StructField("day", DateType),
    StructField("ts", TimestampNTZType),
    StructField("ls", ArrayType(LongType)),
    StructField("ss", ArrayType(StringType)),
    StructField("sh", ShortType)))

  test("every carrier kind round-trips; all-null row; pre-1970 date") {
    import scala.jdk.CollectionConverters._
    val full = """{"id":1,"s":"x''y","d":1.5,"num":"12345678901.23456789",
      |"b":true,"day":"1969-07-20","ts":"1969-07-20T20:17:40",
      |"ls":[1,2,3],"ss":["a",null,"c"],"sh":7}""".stripMargin
      .replace("\n", "")
    val allNull = """{"id":2}"""
    val raw = spark.createDataFrame(List(
      org.apache.spark.sql.Row("u1", 1L, "d", full, 0, null, 0L, ""),
      org.apache.spark.sql.Row("u2", 2L, "d", allNull, 0, null, 0L, "")
    ).asJava, RawTable.schema)

    val out = Normalizer.normalize(raw, NormalizeConfig(Seq("id"), schema))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

    val r1 = out(1L)
    assert(r1.getAs[String]("s") == "x''y")
    assert(r1.getAs[Double]("d") == 1.5)
    assert(r1.getAs[java.math.BigDecimal]("num") ==
      new java.math.BigDecimal("12345678901.23456789"))
    assert(r1.getAs[Boolean]("b"))
    assert(r1.getAs[java.sql.Date]("day").toString == "1969-07-20")
    assert(r1.getAs[java.time.LocalDateTime]("ts").getYear == 1969)
    assert(r1.getSeq[Long](r1.fieldIndex("ls")) == Seq(1L, 2L, 3L))
    assert(r1.getSeq[String](r1.fieldIndex("ss")) == Seq("a", null, "c"))
    assert(r1.getAs[Short]("sh") == 7)

    val r2 = out(2L)
    schema.fieldNames.filterNot(_ == "id").foreach(c =>
      assert(r2.isNullAt(r2.fieldIndex(c)), s"$c should be null"))
  }
}
