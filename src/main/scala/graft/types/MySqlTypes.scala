package graft.types

import java.nio.charset.Charset

import scala.util.Try

/** MySQL/MariaDB source-type classification + text decoding — the
  * engine-owned halves of the reference's MySQL connector:
  *
  *   - [[fromMysqlType]]: column-type string → QKind
  *     (`QkindFromMysqlColumnType`,
  *     flow/connectors/mysql/type_conversion.go:13-95): unsigned
  *     widening, `tinyint(1)` → bool, parameterized decimals, MariaDB
  *     spellings, zerofill/comment-suffix stripping;
  *   - [[MySqlCharsets]]: charset name → JVM [[Charset]] for transcoding
  *     column bytes to UTF-8 (`mysqlCharsetEncodings`,
  *     flow/connectors/mysql/charset.go:25-71) — UTF-8-compatible or
  *     opaque charsets pass through untranscoded.
  */
object MySqlTypes {

  import QKind._

  /** Classify a MySQL `COLUMN_TYPE` string. Throws on genuinely unknown
    * types (the reference errors too). */
  def fromMysqlType(columnType: String): QKind = {
    var ct = columnType.trim
    // MariaDB emits a trailing comment on old-format timestamps
    ct = ct.stripSuffix(" /* mariadb-5.3 */")
    ct = ct.stripSuffix(" zerofill")
    val unsigned = ct.endsWith(" unsigned")
    if (unsigned) ct = ct.stripSuffix(" unsigned")
    val cut = ct.indexOf('(')
    val (base, param) =
      if (cut < 0) (ct, "") else (ct.substring(0, cut), ct.substring(cut + 1))
    base.toLowerCase match {
      case "json" => QJson
      case "char" | "varchar" | "text" | "tinytext" | "mediumtext" |
          "longtext" | "clob" | "varchar2" | "xmltype" => QString
      case "set" => QString // engine carries sets as text
      case "enum" => QEnum
      case "binary" | "varbinary" | "blob" | "tinyblob" | "mediumblob" |
          "longblob" | "char byte" | "raw" => QBytes
      case "date" => QDate
      case "datetime" | "timestamp" => QTimestamp
      case "time" => QTime
      case "decimal" | "numeric" | "number" =>
        // "decimal(10,2)" / "decimal(10)" / bare "decimal"
        val spec = param.stripSuffix(")").split(",").map(_.trim)
          .filter(_.nonEmpty)
        spec.length match {
          case 2 => QNumeric(spec(0).toInt, spec(1).toInt)
          case 1 => QNumeric(spec(0).toInt, 0)
          case _ => QNumeric(10, 0) // MySQL's default decimal is (10,0)
        }
      case "float" => QFloat32
      case "double" => QFloat64
      case "tinyint" =>
        if (param.startsWith("1)")) QBool // tinyint(1) = boolean
        else if (unsigned) QUInt8 else QInt8
      case "smallint" | "year" => if (unsigned) QUInt16 else QInt16
      case "mediumint" | "int" => if (unsigned) QUInt32 else QInt32
      case "bit" => QUInt64
      case "bigint" => if (unsigned) QUInt64 else QInt64
      case "vector" => QArray(QFloat32)
      case "uuid" => QUuid // maria
      case "inet4" | "inet6" => QInet // maria
      case "geometry" | "point" | "polygon" | "linestring" |
          "multipoint" | "multilinestring" | "multipolygon" |
          "geomcollection" | "geometrycollection" => QGeometry
      case other =>
        throw new IllegalArgumentException(s"unknown mysql type $other")
    }
  }
}

/** MySQL character-set name → JVM charset for text-column transcoding. */
object MySqlCharsets {

  /** Charsets whose stored bytes are already valid UTF-8, or opaque
    * binary — no transcoding (charset.go:26-32). */
  val noTranscode: Set[String] =
    Set("utf8", "utf8mb3", "utf8mb4", "ascii", "binary")

  private val jvmNames: Map[String, String] = Map(
    // single-byte / Windows & ISO code pages
    "latin1" -> "windows-1252",
    "latin2" -> "ISO-8859-2",
    "latin5" -> "ISO-8859-9",
    "latin7" -> "ISO-8859-13",
    "cp1250" -> "windows-1250",
    "cp1251" -> "windows-1251",
    "cp1256" -> "windows-1256",
    "cp1257" -> "windows-1257",
    "cp850" -> "IBM850",
    "cp852" -> "IBM852",
    "cp866" -> "IBM866",
    "koi8r" -> "KOI8-R",
    "koi8u" -> "KOI8-U",
    "greek" -> "ISO-8859-7",
    "hebrew" -> "ISO-8859-8",
    "tis620" -> "x-windows-874",
    "macroman" -> "x-MacRoman",
    // multi-byte CJK
    "gbk" -> "GBK",
    "gb2312" -> "GBK", // GBK is a strict superset of GB2312/EUC-CN
    "gb18030" -> "GB18030",
    "big5" -> "Big5",
    "sjis" -> "Shift_JIS",
    "cp932" -> "windows-31j", // cp932 = Windows Shift-JIS variant
    "ujis" -> "EUC-JP",
    "eucjpms" -> "EUC-JP",
    "euckr" -> "EUC-KR",
    // wide Unicode
    "utf16" -> "UTF-16BE",
    "utf16le" -> "UTF-16LE",
    "ucs2" -> "UTF-16BE",
    "utf32" -> "UTF-32BE")

  /** None ⇒ pass bytes through untranscoded (UTF-8-compatible, binary,
    * or unknown — the reference warns and passes through too). */
  def charsetFor(mysqlName: String): Option[Charset] = {
    val n = mysqlName.toLowerCase
    if (noTranscode.contains(n)) None
    else jvmNames.get(n).flatMap(j => Try(Charset.forName(j)).toOption)
  }

  /** Column bytes → UTF-8 string under the column's charset. */
  def decodeText(bytes: Array[Byte], mysqlCharset: String): String =
    charsetFor(mysqlCharset) match {
      case Some(cs) => new String(bytes, cs)
      case None => new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    }
}
