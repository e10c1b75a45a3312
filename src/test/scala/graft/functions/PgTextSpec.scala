package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PgTextSpec extends SparkSpec {

  test("extended time: >24h, negative, sub-second") {
    import spark.implicits._
    val df = Seq(0L, 93784500000L, -3600000000L, 500000L).toDF("us")
      .select(col("us"), PgText.formatExtendedTime(col("us")).as("t"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(0L) == "0:00:00.000000")
    assert(m(93784500000L) == "26:03:04.500000") // > 24h, no wrap
    assert(m(-3600000000L) == "-1:00:00.000000")
    assert(m(500000L) == "0:00:00.500000")
  }

  test("hstore text to JSON: quotes, escapes, NULL values") {
    assert(PgText.hstoreToJson(""""a"=>"1", "b"=>NULL""") ==
      """{"a":"1","b":null}""")
    assert(PgText.hstoreToJson(""""k\"ey"=>"v\\al"""") ==
      """{"k\"ey":"v\\al"}""")
    assert(PgText.hstoreToJson(""""x"=>"NULL"""") == """{"x":"NULL"}""")
    assert(PgText.hstoreToJson("") == "{}")
    assert(PgText.hstoreToJson(null) == null)

    // SQL surface
    PgText.register(spark)
    val j = spark.sql("""SELECT hstore_to_json('"m"=>"1"') AS j""")
      .head().getString(0)
    assert(j == """{"m":"1"}""")
  }
}
