package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Postgres-text-format conversions the type system needs at the decode
  * boundary.
  */
object PgText {

  /** Extended TIME rendering: the reference stores time-of-day as a
    * duration that may exceed 24h or be negative ("extended time",
    * flow/connectors/clickhouse/normalize_query.go:377-397); we carry it
    * as micros in a Long (QKind.QTime) and render `[-]H+:MM:SS.ffffff`
    * without wrapping at 24h. Pure integer column arithmetic. */
  def formatExtendedTime(micros: Column): Column = {
    val neg = micros < 0
    val a = abs(micros)
    val h = a.cast("bigint") / 3600000000L
    val m = (a % 3600000000L) / 60000000L
    val s = (a % 60000000L) / 1000000L
    val f = a % 1000000L
    concat(
      when(neg, "-").otherwise(""),
      h.cast("bigint").cast("string"), lit(":"),
      lpad(m.cast("bigint").cast("string"), 2, "0"), lit(":"),
      lpad(s.cast("bigint").cast("string"), 2, "0"), lit("."),
      lpad(f.cast("string"), 6, "0"))
  }

  /** hstore text → JSON object string (the ParseHstore normalization,
    * flow/model/record_items.go:131-146). Handles quoted keys/values with
    * `\"` and `\\` escapes and NULL values. Implemented as a Scala
    * function (registerable as a UDF) — hstore only appears at the decode
    * boundary, never in a hot analytic loop. */
  def hstoreToJson(hstore: String): String = {
    if (hstore == null) return null
    val out = new StringBuilder("{")
    var i = 0
    var first = true
    def skipWs(): Unit = while (i < hstore.length &&
      hstore.charAt(i).isWhitespace) i += 1
    def parseQuoted(): String = {
      require(hstore.charAt(i) == '"', s"expected quote at $i in: $hstore")
      i += 1
      val sb = new StringBuilder
      while (hstore.charAt(i) != '"') {
        if (hstore.charAt(i) == '\\') { i += 1 }
        sb.append(hstore.charAt(i)); i += 1
      }
      i += 1
      sb.toString
    }
    def jsonEscape(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    while ({ skipWs(); i < hstore.length }) {
      val k = parseQuoted()
      skipWs()
      require(hstore.startsWith("=>", i), s"expected => at $i in: $hstore")
      i += 2
      skipWs()
      val v =
        if (hstore.regionMatches(true, i, "NULL", 0, 4) &&
            (i + 4 >= hstore.length || hstore.charAt(i + 4) != '"')) {
          i += 4; null
        } else parseQuoted()
      if (!first) out.append(",")
      first = false
      out.append('"').append(jsonEscape(k)).append("\":")
      if (v == null) out.append("null")
      else out.append('"').append(jsonEscape(v)).append('"')
      skipWs()
      if (i < hstore.length && hstore.charAt(i) == ',') i += 1
    }
    out.append("}").toString
  }

  /** Register `hstore_to_json` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("hstore_to_json", hstoreToJson _)
}
