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

  test("range parse: inclusivity, infinite + quoted bounds, empty") {
    import PgText._
    assert(parseRange("[1,10)") ==
      PgRange(empty = false, Some("1"), Some("10"), loInc = true,
        hiInc = false))
    assert(parseRange("(,5]") ==
      PgRange(empty = false, None, Some("5"), loInc = false, hiInc = true))
    assert(parseRange("empty").empty)
    // quoted bound with an embedded comma and escaped quote
    val q = parseRange("""["a,\"b",c]""")
    assert(q.lo == Some("""a,"b""") && q.hi == Some("c"))
  }

  test("discrete range canonicalization matches PG normalization") {
    import PgText._
    assert(canonicalIntRange("[1,10)") == "[1,10)")
    assert(canonicalIntRange("[1,10]") == "[1,11)")
    assert(canonicalIntRange("(1,10]") == "[2,11)")
    assert(canonicalIntRange("(1,10)") == "[2,10)")
    assert(canonicalIntRange("(1,2)") == "empty") // degenerate
    assert(canonicalIntRange("[5,5)") == "empty")
    assert(canonicalIntRange("empty") == "empty")
    assert(canonicalIntRange("[,5)") == "[,5)") // infinite lower survives
    assert(canonicalIntRange("(3,]") == "[4,)")
  }

  test("array literal parse: bare, quoted, escapes, NULL, empty") {
    import PgText._
    assert(parseArrayLiteral("{a,b,c}") == Seq("a", "b", "c"))
    assert(parseArrayLiteral("{1, 2 ,3}") == Seq("1", "2", "3"))
    assert(parseArrayLiteral("""{a,"b,c",NULL}""") == Seq("a", "b,c", null))
    assert(parseArrayLiteral("""{"d\"e","f\\g"}""") ==
      Seq("d\"e", "f\\g"))
    assert(parseArrayLiteral("""{"NULL",NULL}""") == Seq("NULL", null))
    assert(parseArrayLiteral("{}") == Nil)
    intercept[IllegalArgumentException](parseArrayLiteral("{{1},{2}}"))
    intercept[IllegalArgumentException](parseArrayLiteral("1,2"))
  }

  test("multirange canonicalization: sort, merge overlap + adjacency") {
    import PgText._
    assert(canonicalIntMultirange("{[5,7),[1,3)}") == "{[1,3),[5,7)}")
    assert(canonicalIntMultirange("{[1,3),[2,6)}") == "{[1,6)}")
    assert(canonicalIntMultirange("{[1,3),[3,5)}") == "{[1,5)}") // adjacent
    assert(canonicalIntMultirange("{(0,3],[5,5)}") == "{[1,4)}") // empty drops
    assert(canonicalIntMultirange("{}") == "{}")
    assert(canonicalIntMultirange("{[1,2),[1,2)}") == "{[1,2)}")
    assert(canonicalIntMultirange("{[,3),[2,5)}") == "{[,5)}")
  }
}
