package graft.qrep

/** String-watermark partition building for live MySQL QRep — the
  * reference's string partitioner
  * (flow/connectors/mysql/qrep_partition.go:24-298). A string key
  * space (uuid PKs, ULIDs, arbitrary VARCHAR keys) has no server-side
  * NTILE-able numeric image, so the reference splits it two ways:
  *
  *  - UUID-shaped min/max bounds: the 128-bit integer space between
  *    them divides uniformly and boundaries render back as UUID
  *    literals (casing preserved from the bounds).
  *  - Arbitrary strings: adaptive midpoint bisection — repeatedly
  *    split the partition with the LARGEST planner-estimated row
  *    count at an interpolated base-95 midpoint, snapped to a real
  *    key by a LIMIT 1 probe, until the target partition count is
  *    reached or nothing splits further.
  *
  * Partitions are `[start, end)` with end = the next partition's
  * start; only the last is end-inclusive — exactly-once coverage of
  * `[min, max]` by construction. The split quality only affects SKEW,
  * never correctness (the reference documents the same contract).
  *
  * Everything here is pure (the prober is a seam); the wire side
  * lives in [[LiveMysqlPull.pullStringKey]]. */
object MysqlStringPartitions {

  /** One partition: `wm >= start AND wm < end`, or BETWEEN when
    * `endInclusive` (the last partition, reaching max). */
  final case class Part(start: String, end: String, endInclusive: Boolean)

  private val UuidLower =
    "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$".r
  private val UuidUpper =
    "^[0-9A-F]{8}-[0-9A-F]{4}-[0-9A-F]{4}-[0-9A-F]{4}-[0-9A-F]{12}$".r

  /** Both bounds canonical UUIDs of one casing → Some(isUpper).
    * Classifying from the bounds alone can mis-split mixed data (the
    * reference documents the same best-effort posture) — skew, not
    * correctness. */
  def detectUuidCasing(min: String, max: String): Option[Boolean] =
    if (UuidLower.matches(min) && UuidLower.matches(max)) Some(false)
    else if (UuidUpper.matches(min) && UuidUpper.matches(max)) Some(true)
    else None

  def uuidToBigInt(s: String): BigInt =
    BigInt(s.replace("-", ""), 16)

  def bigIntToUuid(n: BigInt, upper: Boolean): String = {
    val hex = n.toString(16).reverse.padTo(32, '0').reverse
    val canonical = s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
      s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
      s"${hex.substring(20, 32)}"
    if (upper) canonical.toUpperCase else canonical
  }

  /** Uniform split of the 128-bit UUID space between the REAL min/max
    * bounds; interior boundaries are interpolated UUIDs (not
    * necessarily real keys — harmless: `[start, end)` chaining keeps
    * coverage exact). */
  def uuidPartitions(min: String, max: String, upper: Boolean,
      numPartitions: Int): Seq[Part] = {
    val minI = uuidToBigInt(min)
    val maxI = uuidToBigInt(max)
    require(minI <= maxI, s"min uuid $min greater than max $max")
    val n = BigInt(math.max(1, numPartitions))
    val step = (maxI - minI + n - 1) / n
    if (step <= 0) return Seq(Part(min, max, endInclusive = true))
    val bounds = Iterator.iterate(minI + step)(_ + step)
      .takeWhile(_ < maxI).map(bigIntToUuid(_, upper)).toSeq
    val starts = min +: bounds
    val ends = bounds :+ max
    starts.zip(ends).map { case (s, e) =>
      Part(s, e, endInclusive = e == max)
    }
  }

  // base-95 interpolation space: printable ASCII, 8 digits — 95^8
  // ≈ 6.6e15 fits a signed Long with room for the midpoint sum
  private val B95Min: Char = ' '
  private val B95Max: Char = '~'
  private val B95Radix: Long = (B95Max - B95Min + 1).toLong // 95
  private val B95Width = 8

  private[qrep] def toBase95(s: String): Long = {
    var res = 0L
    var i = 0
    while (i < B95Width) {
      val digit =
        if (i < s.length) {
          val ch = s.charAt(i)
          val clamped =
            if (ch < B95Min) B95Min
            else if (ch > B95Max) B95Max else ch
          (clamped - B95Min).toLong
        } else 0L
      res = res * B95Radix + digit
      i += 1
    }
    res
  }

  private[qrep] def fromBase95(n0: Long): String = {
    val digits = new Array[Char](B95Width)
    var n = n0
    var k = B95Width - 1
    while (k >= 0) {
      digits(k) = (B95Min + (n % B95Radix)).toChar
      n /= B95Radix
      k -= 1
    }
    new String(digits)
  }

  /** Interpolated midpoint strictly "between" s1 and s2 in base-95
    * space, or None when the pair is unsplittable (equal, or the
    * first differing bytes sit outside printable ASCII on the same
    * side — splitting there would rabbit-hole into single-row
    * partitions). The shared prefix backs off to a UTF-8 rune start:
    * the midpoint travels as a utf8mb4 literal, and a prefix ending
    * mid-character would fail the server's transcoding. */
  def stringMidpoint(s1: String, s2: String): Option[String] = {
    if (s1 == s2) return None
    val b1 = s1.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b2 = s2.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < b1.length && i < b2.length && b1(i) == b2(i)) i += 1
    // back off so the prefix doesn't end mid-multibyte-character
    while (i > 0 && i < b1.length && (b1(i) & 0xC0) == 0x80) i -= 1
    val prefix = new String(b1, 0, i,
      java.nio.charset.StandardCharsets.UTF_8)
    def tail(b: Array[Byte]): String =
      new String(b, i, b.length - i,
        java.nio.charset.StandardCharsets.UTF_8)
    val (t1, t2) = (tail(b1), tail(b2))
    val h1 = if (t1.nonEmpty) t1.charAt(0) else 0.toChar
    val h2 = if (t2.nonEmpty) t2.charAt(0) else 0.toChar
    if (math.max(h1, h2) < B95Min || math.min(h1, h2) > B95Max)
      return None
    val mid = (toBase95(t1) + toBase95(t2)) / 2
    // trim trailing SPACES only: PAD SPACE collations compare them
    // as insignificant, and a boundary differing only by padding
    // would make two partitions' predicates overlap
    Some((prefix + fromBase95(mid)).reverse.dropWhile(_ == ' ').reverse)
  }

  /** Probe seam: planner row estimates + real-key snapping, both
    * server-side in production ([[LiveMysqlPull]]), pure fixtures in
    * unit tests. */
  trait RangeProber {
    /** Planner-estimated rows in `[start, end)`. */
    def estimateRows(start: String, end: String): Long
    /** Smallest real key ≥ mid, strictly inside (start, end). */
    def nextRealKey(mid: String, start: String, end: String)
        : Option[String]
    /** Largest real key < mid, strictly inside (start, end). */
    def prevRealKey(mid: String, start: String, end: String)
        : Option[String]
  }

  /** Adaptive bisection: start from one `[min, max]` partition and
    * repeatedly split the largest (by estimated rows) at a
    * real-key-snapped midpoint, until `numPartitions` or nothing
    * splits. Estimates guide SKEW only — coverage is exact by
    * construction. */
  def adaptivePartitions(prober: RangeProber, min: String, max: String,
      numPartitions: Int): Seq[Part] = {
    if (min == max || numPartitions <= 1)
      return Seq(Part(min, max, endInclusive = true))
    final case class Entry(start: String, end: String, rows: Long)
    val heap = scala.collection.mutable.PriorityQueue.empty[Entry](
      Ordering.by(_.rows))
    heap.enqueue(Entry(min, max, prober.estimateRows(min, max)))
    val outputs = scala.collection.mutable.ArrayBuffer.empty[Entry]
    while (outputs.size + heap.size < numPartitions && heap.nonEmpty) {
      val p = heap.dequeue()
      stringMidpoint(p.start, p.end) match {
        case None => outputs += p
        case Some(mid) =>
          // the interpolated midpoint can overshoot every key in a
          // range whose keys occupy a narrow slice of the character
          // space — probe backwards before declaring unsplittable
          prober.nextRealKey(mid, p.start, p.end)
            .orElse(prober.prevRealKey(mid, p.start, p.end)) match {
            case None => outputs += p
            case Some(k) =>
              heap.enqueue(
                Entry(p.start, k, prober.estimateRows(p.start, k)),
                Entry(k, p.end, prober.estimateRows(k, p.end)))
          }
      }
    }
    (outputs ++ heap.dequeueAll).sortBy(_.start)
      .map(e => Part(e.start, e.end, endInclusive = e.end == max)).toSeq
  }
}
