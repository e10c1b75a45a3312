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

  // ------------------------------------------------------ range decoding
  // PG ranges/multiranges replicate as their TEXT rendering (QString) —
  // convertToString's typed-range re-encode path
  // (flow/connectors/postgres/qvalue_convert.go:256-331). The parser and
  // the discrete-range canonicalization below are the engine-owned half:
  // bytes/text in, canonical PG text form out.

  /** One parsed PG range. `None` bounds are infinite. */
  final case class PgRange(empty: Boolean, lo: Option[String],
      hi: Option[String], loInc: Boolean, hiInc: Boolean)

  /** Parse PG range text: `empty` | `[lo,hi)` etc., bounds optionally
    * double-quoted with `\"`/`""` escapes, absent = infinite. */
  def parseRange(s: String): PgRange = {
    val t = s.trim
    if (t.equalsIgnoreCase("empty"))
      return PgRange(empty = true, None, None, loInc = false,
        hiInc = false)
    require(t.length >= 3 && (t.head == '[' || t.head == '(') &&
      (t.last == ']' || t.last == ')'), s"malformed range: $s")
    val body = t.substring(1, t.length - 1)
    // split on the ONE top-level comma (bounds may be quoted)
    var i = 0; var inQ = false; var commaAt = -1
    while (i < body.length && commaAt < 0) {
      body.charAt(i) match {
        case '"' => inQ = !inQ
        case '\\' if inQ => i += 1
        case ',' if !inQ => commaAt = i
        case _ =>
      }
      i += 1
    }
    require(commaAt >= 0, s"malformed range (no comma): $s")
    def bound(raw: String): Option[String] = {
      val b = raw.trim
      if (b.isEmpty) None
      else if (b.head == '"') {
        val sb = new StringBuilder
        var j = 1
        while (j < b.length - 1) {
          b.charAt(j) match {
            case '\\' => j += 1; sb.append(b.charAt(j))
            case '"' if j + 1 < b.length - 1 && b.charAt(j + 1) == '"' =>
              j += 1; sb.append('"')
            case c => sb.append(c)
          }
          j += 1
        }
        Some(sb.toString)
      } else Some(b)
    }
    PgRange(empty = false,
      bound(body.substring(0, commaAt)), bound(body.substring(commaAt + 1)),
      loInc = t.head == '[', hiInc = t.last == ']')
  }

  /** Canonical text form of a DISCRETE (integer/date-day) range — PG's own
    * normalization: always `[lo,hi)`; `(a` → `[a+1`, `b]` → `[,b+1)`;
    * degenerate (lo ≥ hi) → `empty`. Bounds parse as Long (covers
    * int4range/int8range; date ranges canonicalize the same way on their
    * epoch-day numbers). */
  def canonicalIntRange(s: String): String = {
    val r = parseRange(s)
    if (r.empty) return "empty"
    val lo = r.lo.map(v => v.toLong + (if (r.loInc) 0 else 1))
    val hi = r.hi.map(v => v.toLong + (if (r.hiInc) 1 else 0))
    (lo, hi) match {
      case (Some(a), Some(b)) if a >= b => "empty"
      case _ =>
        s"[${lo.map(_.toString).getOrElse("")}," +
          s"${hi.map(_.toString).getOrElse("")})"
    }
  }

  /** Canonical multirange text: parse `{r1,r2,...}`, canonicalize each
    * element, drop empties, sort, merge overlapping/ADJACENT ranges (PG
    * multirange semantics: `{[1,3),[3,5)}` → `{[1,5)}`). */
  def canonicalIntMultirange(s: String): String = {
    val t = s.trim
    require(t.length >= 2 && t.head == '{' && t.last == '}',
      s"malformed multirange: $s")
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) return "{}"
    // split elements: each starts at [ or ( and ends at the matching ) or ]
    val parts = Seq.newBuilder[String]
    var i = 0
    while (i < body.length) {
      while (i < body.length && (body.charAt(i) == ',' ||
        body.charAt(i).isWhitespace)) i += 1
      if (i < body.length) {
        var j = i; var inQ = false; var end = -1
        while (j < body.length && end < 0) {
          body.charAt(j) match {
            case '"' => inQ = !inQ
            case '\\' if inQ => j += 1
            case ')' | ']' if !inQ => end = j
            case _ =>
          }
          j += 1
        }
        require(end >= 0, s"malformed multirange: $s")
        parts += body.substring(i, end + 1)
        i = end + 1
      }
    }
    // canonical elements as (lo, hi), None = infinite
    val canon = parts.result().map(canonicalIntRange)
      .filter(_ != "empty")
      .map { c =>
        val r = parseRange(c)
        (r.lo.map(_.toLong), r.hi.map(_.toLong))
      }
    if (canon.isEmpty) return "{}"
    val sorted = canon.sortBy { case (lo, _) =>
      lo.getOrElse(Long.MinValue)
    }
    val merged = sorted.tail.foldLeft(List(sorted.head)) {
      case ((a, b) :: rest, (c, d)) =>
        val bV = b.getOrElse(Long.MaxValue)
        val cV = c.getOrElse(Long.MinValue)
        if (cV <= bV) { // overlap or adjacency ([1,3) + [3,5) merges)
          val hi = (b, d) match {
            case (Some(x), Some(y)) => Some(x max y)
            case _ => None
          }
          (a, hi) :: rest
        } else (c, d) :: (a, b) :: rest
      case (Nil, r) => List(r)
    }.reverse
    merged.map { case (lo, hi) =>
      s"[${lo.map(_.toString).getOrElse("")}," +
        s"${hi.map(_.toString).getOrElse("")})"
    }.mkString("{", ",", "}")
  }

  /** Parse a 1-D PG array literal (`{a,"b,c",NULL,"d\"e"}`) into its
    * elements — the text half of convertToStringArray
    * (flow/connectors/postgres/qvalue_convert.go:334+): unquoted `NULL`
    * → null element, double-quoted elements unescape `\x` and `""`.
    * The engine's array kinds are 1-D (kind.go:51-66); nested braces are
    * rejected. */
  def parseArrayLiteral(s: String): Seq[String] = {
    val t = s.trim
    require(t.length >= 2 && t.head == '{' && t.last == '}',
      s"malformed array literal: $s")
    val body = t.substring(1, t.length - 1)
    if (body.trim.isEmpty) return Nil
    val out = Seq.newBuilder[String]
    var i = 0
    var done = false
    while (!done) {
      while (i < body.length && body.charAt(i).isWhitespace) i += 1
      if (i < body.length && body.charAt(i) == '{')
        throw new IllegalArgumentException(
          s"nested (multi-dimensional) array literal: $s")
      if (i < body.length && body.charAt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (!closed) {
          body.charAt(i) match {
            case '\\' => sb.append(body.charAt(i + 1)); i += 2
            case '"' if i + 1 < body.length && body.charAt(i + 1) == '"' =>
              sb.append('"'); i += 2
            case '"' => closed = true; i += 1
            case c => sb.append(c); i += 1
          }
        }
        out += sb.toString
      } else {
        val end0 = body.indexOf(',', i)
        val end = if (end0 < 0) body.length else end0
        val bare = body.substring(i, end).trim
        out += (if (bare.equalsIgnoreCase("NULL")) null else bare)
        i = end
      }
      while (i < body.length && body.charAt(i).isWhitespace) i += 1
      if (i >= body.length) done = true
      else {
        require(body.charAt(i) == ',', s"malformed array literal: $s")
        i += 1
      }
    }
    out.result()
  }

  /** PG interval (micros, days, months) → the engine's interval JSON —
    * `intervalToString`'s PeerDBInterval shape
    * (flow/connectors/postgres/qvalue_convert.go:195-215,
    * flow/shared/datatypes/interval.go): hours/minutes/seconds split out
    * of the micros component, years/months out of the months component,
    * zero fields OMITTED (Go's `omitempty`), `valid` always present.
    * Integral seconds render bare (Go float marshalling). */
  def intervalToJson(micros: Long, days: Int, months: Int): String = {
    val sb = new StringBuilder("{")
    def field(name: String, v: Long): Unit =
      if (v != 0) sb.append('"').append(name).append("\":").append(v)
        .append(',')
    field("hours", micros / 3600000000L)
    field("minutes", (micros % 3600000000L) / 60000000L)
    val secMicros = micros % 60000000L
    if (secMicros != 0) {
      sb.append("\"seconds\":")
      if (secMicros % 1000000L == 0) sb.append(secMicros / 1000000L)
      else sb.append(secMicros.toDouble / 1000000.0)
      sb.append(',')
    }
    field("days", days.toLong)
    field("months", (months % 12).toLong)
    field("years", (months / 12).toLong)
    sb.append("\"valid\":true}")
    sb.toString
  }

  /** Register the boundary-decode helpers for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("hstore_to_json", hstoreToJson _)
    spark.udf.register("pg_canonical_int_range", canonicalIntRange _)
    spark.udf.register("pg_canonical_int_multirange",
      canonicalIntMultirange _)
    spark.udf.register("pg_parse_array", parseArrayLiteral _)
    spark.udf.register("pg_interval_json", intervalToJson _)
  }
}
