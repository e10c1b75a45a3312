package graft.types

import org.scalatest.funsuite.AnyFunSuite

import graft.types.QKind._

class MySqlTypesSpec extends AnyFunSuite {

  test("column-type classification matches QkindFromMysqlColumnType") {
    import MySqlTypes.fromMysqlType
    val cases = Seq(
      "json" -> QJson,
      "varchar(255)" -> QString,
      "TEXT" -> QString,
      "enum('a','b')" -> QEnum,
      "set('x','y')" -> QString,
      "varbinary(16)" -> QBytes,
      "longblob" -> QBytes,
      "date" -> QDate,
      "datetime(6)" -> QTimestamp,
      "timestamp /* mariadb-5.3 */" -> QTimestamp,
      "time(3)" -> QTime,
      "decimal(10,2)" -> QNumeric(10, 2),
      "decimal(12)" -> QNumeric(12, 0),
      "decimal" -> QNumeric(10, 0),
      "number(8,3)" -> QNumeric(8, 3), // maria oracle-mode
      "float" -> QFloat32,
      "double" -> QFloat64,
      "tinyint(1)" -> QBool,
      "tinyint(4)" -> QInt8,
      "tinyint unsigned" -> QUInt8,
      "tinyint(3) unsigned zerofill" -> QUInt8,
      "smallint" -> QInt16,
      "smallint(5) unsigned" -> QUInt16,
      "year" -> QInt16,
      "mediumint" -> QInt32,
      "int unsigned" -> QUInt32,
      "int(11)" -> QInt32,
      "bit(64)" -> QUInt64,
      "bigint" -> QInt64,
      "bigint unsigned" -> QUInt64,
      "vector(1536)" -> QArray(QFloat32),
      "uuid" -> QUuid,
      "inet6" -> QInet,
      "geometry" -> QGeometry,
      "multipolygon" -> QGeometry)
    cases.foreach { case (ct, k) =>
      assert(fromMysqlType(ct) == k, ct)
    }
    intercept[IllegalArgumentException](fromMysqlType("frobnicator"))
  }

  test("charset map transcodes legacy pages, passes UTF-8 through") {
    import MySqlCharsets._
    assert(charsetFor("utf8mb4").isEmpty)
    assert(charsetFor("binary").isEmpty)
    assert(charsetFor("unknown_cs").isEmpty) // pass-through, not error
    // latin1 is Windows-1252, NOT ISO-8859-1: 0x80 is the Euro sign
    assert(decodeText(Array(0x80.toByte), "latin1") == "€")
    assert(decodeText(Array(0xE9.toByte), "latin1") == "é")
    // cp1251 Cyrillic
    assert(decodeText(Array(0xC0.toByte), "cp1251") == "А")
    // Shift-JIS two-byte sequence (katakana ア)
    assert(decodeText(Array(0x83.toByte, 0x41.toByte), "sjis") == "ア")
    // UTF-16BE
    assert(decodeText(Array(0x00.toByte, 0x41.toByte), "ucs2") == "A")
    // utf8 passes raw bytes as UTF-8
    assert(decodeText("héllo".getBytes("UTF-8"), "utf8mb4") == "héllo")
    // every mapped charset resolves on this JVM
    Seq("latin1", "latin2", "latin5", "latin7", "cp1250", "cp1251",
      "cp1256", "cp1257", "cp850", "cp852", "cp866", "koi8r", "koi8u",
      "greek", "hebrew", "gbk", "gb18030", "big5", "sjis", "cp932",
      "ujis", "euckr", "utf16", "utf16le", "ucs2", "utf32")
      .foreach(n => assert(charsetFor(n).isDefined, n))
  }
}
