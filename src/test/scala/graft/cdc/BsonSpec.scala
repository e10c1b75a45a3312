package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Bson._

class BsonSpec extends AnyFunSuite {

  test("golden bytes: the bsonspec.org example document") {
    // {"hello": "world"} — the spec's own worked example, byte-for-byte.
    val bytes = Array[Byte](
      0x16, 0x00, 0x00, 0x00, // total length 22, little-endian
      0x02, // string element
      'h', 'e', 'l', 'l', 'o', 0x00, // key
      0x06, 0x00, 0x00, 0x00, // string length 6 (incl. NUL)
      'w', 'o', 'r', 'l', 'd', 0x00,
      0x00) // document terminator
    assert(documentToJson(bytes) == """{"hello":"world"}""")
    assert(encode("hello" -> BString("world")).sameElements(bytes))
  }

  test("every type renders per the reference's converter rules") {
    val oid = (1 to 12).map(_.toByte).toArray
    val doc = encode(
      "d" -> BDouble(2.5),
      "di" -> BDouble(5.0), // integral double renders bare
      "s" -> BString("a\"b"),
      "sub" -> BDoc(Seq("x" -> BInt32(1))),
      "arr" -> BArray(Seq(BInt32(1), BString("two"), BNull)),
      "bin" -> BBinary(0, Array[Byte](1, 2, 3)),
      "oid" -> BObjectId(oid),
      "b" -> BBool(true),
      "dt" -> BDateTime(1705276800000L), // 2024-01-15T00:00:00Z
      "dtms" -> BDateTime(1705276800120L), // trimmed fraction .12
      "n" -> BNull,
      "re" -> BRegex("^a.*", "i"),
      "i32" -> BInt32(-7),
      "ts" -> BTimestamp(100, 2),
      "i64" -> BInt64(1234567890123L),
      "min" -> BMinKey,
      "max" -> BMaxKey)
    assert(documentToJson(doc) ==
      """{"d":2.5,"di":5,"s":"a\"b","sub":{"x":1},""" +
        """"arr":[1,"two",null],""" +
        """"bin":{"Subtype":0,"Data":"AQID"},""" +
        """"oid":"0102030405060708090a0b0c","b":true,""" +
        """"dt":"2024-01-15T00:00:00Z","dtms":"2024-01-15T00:00:00.12Z",""" +
        """"n":null,"re":{"Pattern":"^a.*","Options":"i"},""" +
        """"i32":-7,"ts":{"T":100,"I":2},"i64":1234567890123,""" +
        """"min":{},"max":{}}""")
  }

  test("decimal128 string: plain, negative-exponent, scientific, specials") {
    // value = significand * 10^(exponent); encode via the canonical form:
    // high = (exp + 6176) << 49 | sigHigh
    def enc(sig: BigInt, exp: Int, neg: Boolean = false): (Long, Long) = {
      val low = (sig & BigInt("FFFFFFFFFFFFFFFF", 16)).toLong
      val hi0 = (sig >> 64).toLong | ((exp + 6176).toLong << 49)
      ((if (neg) hi0 | Long.MinValue else hi0), low)
    }
    def str(sig: BigInt, exp: Int, neg: Boolean = false): String = {
      val (h, l) = enc(sig, exp, neg)
      decimal128String(h, l)
    }
    assert(str(BigInt(12345), 0) == "12345")
    assert(str(BigInt(12345), -2) == "123.45")
    assert(str(BigInt(5), -4) == "0.0005")
    assert(str(BigInt(12345), -2, neg = true) == "-123.45")
    assert(str(BigInt(5), 3) == "5E+3") // positive exponent → scientific
    assert(str(BigInt(1), -8) == "1E-8") // adjusted < -6 → scientific
    assert(str(BigInt(12345), -9) == "0.000012345") // adjusted −5 ≥ −6
    assert(str(BigInt(0), 0) == "0")
    assert(decimal128String(0x7C00000000000000L, 0L) == "NaN")
    assert(decimal128String(0x7800000000000000L, 0L) == "Infinity")
    assert(decimal128String(0xF800000000000000L, 0L) == "-Infinity")
    // BSON decimal128 via the full document path
    val doc = encode("price" -> {
      val (h, l) = enc(BigInt(123456), -2)
      BDecimal128(h, l)
    })
    assert(documentToJson(doc) == """{"price":"1234.56"}""")
  }

  test("_id extraction: ObjectId hex and bare strings, JSON otherwise") {
    val oid = (1 to 12).map(_.toByte).toArray
    assert(idToString(0x07, oid) == "0102030405060708090a0b0c")
    // string value bytes: int32 len + utf8 + NUL
    val sBytes = Array[Byte](4, 0, 0, 0, 'a', 'b', 'c', 0)
    assert(idToString(0x02, sBytes) == "abc")
    // an int64 _id keeps its JSON form
    val i64 = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(42L).array()
    assert(idToString(0x12, i64) == "42")
  }

  test("nested document round trip through encode/decode") {
    val doc = encode(
      "outer" -> BDoc(Seq(
        "inner" -> BArray(Seq(
          BDoc(Seq("k" -> BString("v"))),
          BArray(Seq(BInt64(1), BInt64(2))))))))
    assert(documentToJson(doc) ==
      """{"outer":{"inner":[{"k":"v"},[1,2]]}}""")
  }
}
