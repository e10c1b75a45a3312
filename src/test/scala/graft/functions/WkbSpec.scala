package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class WkbSpec extends AnyFunSuite {

  test("golden hex: the canonical little-endian POINT(1 2)") {
    // The standard worked example: 01 (LE), 01000000 (point),
    // two IEEE754 doubles.
    assert(Wkb.hexToWkt(
      "0101000000000000000000f03f0000000000000040") == "POINT (1 2)")
  }

  test("big-endian and EWKB SRID variants decode identically") {
    // Big-endian POINT(1 2): 00, 00000001, doubles BE.
    assert(Wkb.hexToWkt(
      "00000000013ff00000000000004000000000000000") == "POINT (1 2)")
    // EWKB: LE, type 1 | 0x20000000, SRID 4326, then coords.
    assert(Wkb.hexToWkt(
      "0101000020e6100000000000000000f03f0000000000000040") ==
      "POINT (1 2)")
    assert(Wkb.hexToWkt(Wkb.toHex(Wkb.pointWkb(1, 2, srid = 4326))) ==
      "POINT (1 2)")
  }

  test("linestring, polygon with hole, multi* and collections") {
    assert(Wkb.hexToWkt(Wkb.toHex(Wkb.lineWkb(Seq((30.0, 10.0),
      (10.0, 30.0), (40.0, 40.0))))) ==
      "LINESTRING (30 10, 10 30, 40 40)")
    // polygon with an interior ring, hand-assembled LE
    def d(v: Double) = {
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v)
      Wkb.toHex(b.array())
    }
    def i(v: Int) = {
      val b = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v)
      Wkb.toHex(b.array())
    }
    val outer = i(4) + d(0) + d(0) + d(10) + d(0) + d(10) + d(10) +
      d(0) + d(0)
    val inner = i(4) + d(2) + d(2) + d(3) + d(2) + d(3) + d(3) +
      d(2) + d(2)
    val poly = "01" + i(3) + i(2) + outer + inner
    assert(Wkb.hexToWkt(poly) ==
      "POLYGON ((0 0, 10 0, 10 10, 0 0), (2 2, 3 2, 3 3, 2 2))")
    // multipoint of two nested point geometries
    val mp = "01" + i(4) + i(2) +
      Wkb.toHex(Wkb.pointWkb(1, 2)) + Wkb.toHex(Wkb.pointWkb(3, 4))
    assert(Wkb.hexToWkt(mp) == "MULTIPOINT ((1 2), (3 4))")
    // collection: point + linestring keep their keywords
    val gc = "01" + i(7) + i(2) + Wkb.toHex(Wkb.pointWkb(5, 6)) +
      Wkb.toHex(Wkb.lineWkb(Seq((0.0, 0.0), (1.0, 1.0))))
    assert(Wkb.hexToWkt(gc) ==
      "GEOMETRYCOLLECTION (POINT (5 6), LINESTRING (0 0, 1 1))")
  }

  test("non-integral coordinates and rejection paths") {
    assert(Wkb.hexToWkt(Wkb.toHex(Wkb.pointWkb(1.5, -2.25))) ==
      "POINT (1.5 -2.25)")
    // Z flag rejected, unknown type rejected, trailing bytes rejected
    intercept[IllegalArgumentException](Wkb.hexToWkt(
      "01010000800000000000000000000000000000000000000000000000f0bf"))
    intercept[IllegalArgumentException](Wkb.hexToWkt("0163000000"))
    intercept[IllegalArgumentException](Wkb.hexToWkt(
      Wkb.toHex(Wkb.pointWkb(1, 2)) + "ff"))
  }

  test("interval JSON matches PeerDBInterval omitempty shape") {
    import PgText.intervalToJson
    // 1h 2m 3s + 4 days + 14 months (= 1y2m)
    assert(intervalToJson(3723000000L, 4, 14) ==
      """{"hours":1,"minutes":2,"seconds":3,"days":4,"months":2,""" +
        """"years":1,"valid":true}""")
    // zeros omitted; fractional seconds keep the decimal
    assert(intervalToJson(0L, 0, 0) == """{"valid":true}""")
    assert(intervalToJson(1500000L, 0, 0) ==
      """{"seconds":1.5,"valid":true}""")
    assert(intervalToJson(0L, 0, 24) == """{"years":2,"valid":true}""")
  }
}
