package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** WKB/EWKB → WKT conversion — the engine half of the reference's PostGIS
  * decode (`GeoValidate`, flow/shared/datatypes/geo.go:10-45: WKB hex in,
  * WKT out, invalid geometry rejected), against the public OGC
  * Simple-Features WKB layout. PostGIS EWKB extensions handled: per-ring
  * byte order, SRID flag (0x20000000, stripped — the reference's WKT also
  * carries no SRID). Z/M geometries are rejected loudly rather than
  * silently mis-decoded.
  *
  * WKT formatting follows the GEOS writer the reference links: type name,
  * one space, `, `-separated vertices, integral coordinates render bare
  * (`POINT (1 2)`).
  */
object Wkb {

  private val SridFlag = 0x20000000
  private val ZFlag = 0x80000000
  private val MFlag = 0x40000000

  def hexToWkt(hex: String): String = wkbToWkt(fromHex(hex))

  def fromHex(hex: String): Array[Byte] = {
    require(hex.length % 2 == 0, "odd-length hex")
    // Character.digit per nibble — no per-byte substring allocation (this
    // runs once per row per geometry in the decode hot path).
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(hex.charAt(2 * i), 16)
      val lo = Character.digit(hex.charAt(2 * i + 1), 16)
      require(hi >= 0 && lo >= 0, s"bad hex digit at ${2 * i}")
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out
  }

  def wkbToWkt(bytes: Array[Byte]): String = {
    val b = ByteBuffer.wrap(bytes)
    val sb = new java.lang.StringBuilder
    writeGeometry(b, sb, top = true)
    require(!b.hasRemaining, "trailing bytes after geometry")
    sb.toString
  }

  private def num(sb: java.lang.StringBuilder, d: Double): Unit =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) sb.append(d.toLong)
    else sb.append(d)

  private def point(b: ByteBuffer, sb: java.lang.StringBuilder): Unit = {
    num(sb, b.getDouble()); sb.append(' '); num(sb, b.getDouble())
  }

  private def ring(b: ByteBuffer, sb: java.lang.StringBuilder): Unit = {
    val n = b.getInt()
    sb.append('(')
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(", ")
      point(b, sb)
      i += 1
    }
    sb.append(')')
  }

  /** One geometry (recursive for multi-geometries and collections — EWKB
    * lets every nested geometry restate its own byte order). `top`
    * controls whether the type keyword is written (nested multi-geometry
    * members omit it except in GeometryCollection). */
  private def writeGeometry(b: ByteBuffer, sb: java.lang.StringBuilder,
      top: Boolean, expect: Int = -1): Unit = {
    b.order(b.get() match {
      case 0 => ByteOrder.BIG_ENDIAN
      case 1 => ByteOrder.LITTLE_ENDIAN
      case other =>
        throw new IllegalArgumentException(s"bad byte order $other")
    })
    val raw = b.getInt()
    require((raw & ZFlag) == 0 && (raw & MFlag) == 0,
      "Z/M geometries not supported")
    if ((raw & SridFlag) != 0) b.getInt() // EWKB SRID: strip
    val tpe = raw & 0xFFFF
    require(expect < 0 || tpe == expect,
      s"nested geometry type $tpe where $expect expected")
    tpe match {
      case 1 => // Point
        if (top) sb.append("POINT ")
        sb.append('('); point(b, sb); sb.append(')')
      case 2 => // LineString
        if (top) sb.append("LINESTRING ")
        ring(b, sb)
      case 3 => // Polygon
        if (top) sb.append("POLYGON ")
        val n = b.getInt()
        sb.append('(')
        for (i <- 0 until n) { if (i > 0) sb.append(", "); ring(b, sb) }
        sb.append(')')
      case 4 => // MultiPoint
        sb.append("MULTIPOINT (")
        val n = b.getInt()
        for (i <- 0 until n) {
          if (i > 0) sb.append(", ")
          writeGeometry(b, sb, top = false, expect = 1)
        }
        sb.append(')')
      case 5 => // MultiLineString
        sb.append("MULTILINESTRING (")
        val n = b.getInt()
        for (i <- 0 until n) {
          if (i > 0) sb.append(", ")
          writeGeometry(b, sb, top = false, expect = 2)
        }
        sb.append(')')
      case 6 => // MultiPolygon
        sb.append("MULTIPOLYGON (")
        val n = b.getInt()
        for (i <- 0 until n) {
          if (i > 0) sb.append(", ")
          writeGeometry(b, sb, top = false, expect = 3)
        }
        sb.append(')')
      case 7 => // GeometryCollection
        sb.append("GEOMETRYCOLLECTION (")
        val n = b.getInt()
        for (i <- 0 until n) {
          if (i > 0) sb.append(", ")
          writeGeometry(b, sb, top = true)
        }
        sb.append(')')
      case other =>
        throw new IllegalArgumentException(s"unknown WKB type $other")
    }
  }

  // ------------------------------------------------------ fixture encoding

  /** Little-endian WKB for a 2-D point (fixtures + round-trip oracle). */
  def pointWkb(x: Double, y: Double, srid: Int = 0): Array[Byte] = {
    val hasSrid = srid != 0
    val b = ByteBuffer.allocate(if (hasSrid) 25 else 21)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte)
    b.putInt(if (hasSrid) 1 | SridFlag else 1)
    if (hasSrid) b.putInt(srid)
    b.putDouble(x).putDouble(y)
    b.array()
  }

  def lineWkb(points: Seq[(Double, Double)]): Array[Byte] = {
    val b = ByteBuffer.allocate(9 + 16 * points.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(2).putInt(points.size)
    points.foreach { case (x, y) => b.putDouble(x).putDouble(y) }
    b.array()
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def toHex(bytes: Array[Byte]): String = {
    // Table-driven: the naive f"$x%02x" interpolator costs a full
    // String.format parse + boxing + a String per BYTE — measured 10.2 s
    // for q_wkb_wkt at sf0.1 (300k geometries); this form is ~0.3 s.
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xFF
      out(2 * i) = HexChars(v >>> 4)
      out(2 * i + 1) = HexChars(v & 0xF)
      i += 1
    }
    new String(out)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("wkb_to_wkt", hexToWkt _)
}
