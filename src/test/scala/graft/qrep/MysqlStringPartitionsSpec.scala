package graft.qrep

import org.scalatest.funsuite.AnyFunSuite

import MysqlStringPartitions._

/** The pure half of the MySQL string partitioner (the reference's
  * flow/connectors/mysql/qrep_partition.go restated): uuid-space
  * splitting, base-95 midpoint interpolation, and the adaptive
  * bisection driven by a prober seam. The load-bearing property
  * everywhere is COVERAGE — `[min, max]` chains exactly once through
  * `[start, end)` partitions with an inclusive tail — because the
  * estimates only steer skew, never membership. */
class MysqlStringPartitionsSpec extends AnyFunSuite {

  private def assertCovers(parts: Seq[Part], min: String, max: String)
      : Unit = {
    assert(parts.head.start == min)
    assert(parts.last.end == max && parts.last.endInclusive)
    parts.init.foreach(p => assert(!p.endInclusive))
    parts.sliding(2).foreach {
      case Seq(a, b) => assert(a.end == b.start,
        s"gap between ${a.end} and ${b.start}")
      case _ => ()
    }
    parts.foreach(p => assert(p.start <= p.end))
  }

  test("uuid round trip preserves value and casing") {
    val u = "65f00000-0000-0000-0000-00000000002a"
    assert(bigIntToUuid(uuidToBigInt(u), upper = false) == u)
    assert(bigIntToUuid(uuidToBigInt(u.toUpperCase), upper = true) ==
      u.toUpperCase)
    // zero-padding: a tiny value still renders 36 chars canonical
    assert(bigIntToUuid(BigInt(1), upper = false) ==
      "00000000-0000-0000-0000-000000000001")
  }

  test("detectUuidCasing: both-lower, both-upper, mixed, non-uuid") {
    val lo = "0f0e0d0c-0b0a-0908-0706-050403020100"
    assert(detectUuidCasing(lo, lo).contains(false))
    assert(detectUuidCasing(lo.toUpperCase, lo.toUpperCase)
      .contains(true))
    assert(detectUuidCasing(lo, lo.toUpperCase).isEmpty)
    assert(detectUuidCasing("abc", "def").isEmpty)
  }

  test("uuidPartitions: uniform split covers [min, max] exactly, " +
    "boundaries are canonical uuids of the bound casing") {
    val min = "65f00000-0000-0000-0000-000000000000"
    val max = "65f00000-0000-0000-0000-0000000003e7" // +999
    val parts = uuidPartitions(min, max, upper = false, 4)
    assert(parts.size == 4)
    assertCovers(parts, min, max)
    parts.foreach { p =>
      assert(detectUuidCasing(p.start, p.end).contains(false),
        s"non-canonical boundary: $p")
    }
    // a span smaller than the partition count still covers
    val tiny = uuidPartitions(min,
      "65f00000-0000-0000-0000-000000000002", upper = false, 8)
    assertCovers(tiny, min, "65f00000-0000-0000-0000-000000000002")
  }

  test("base95 round trip and ordering") {
    // exact inverse for width-8 printable strings (no trailing pad)
    for (s <- Seq("user-00x", "zzzzzzzz", "~~~~~~~~", "abcd0123"))
      assert(fromBase95(toBase95(s)) == s)
    // ordering is preserved for printable prefixes
    assert(toBase95("apple") < toBase95("banana"))
    assert(toBase95("user-001") < toBase95("user-999"))
  }

  test("stringMidpoint: lies strictly between, shares the prefix, " +
    "trims pad spaces, refuses unsplittable pairs") {
    val m1 = stringMidpoint("user-000", "user-999").get
    assert(m1 > "user-000" && m1 < "user-999")
    assert(m1.startsWith("user-"))
    // equal strings: nothing to split
    assert(stringMidpoint("same", "same").isEmpty)
    // first differing bytes both OUTSIDE printable ASCII on the same
    // side: refused (splitting there rabbit-holes into single-row
    // partitions)
    assert(stringMidpoint("p\u0001", "p\u0002").isEmpty)
    // no trailing spaces ever (PAD SPACE collations treat them as
    // insignificant and the boundary predicates would overlap)
    val m2 = stringMidpoint("a", "b").get
    assert(!m2.endsWith(" "))
    assert(m2 > "a" && m2 < "b")
  }

  test("stringMidpoint backs off a shared prefix ending mid-UTF-8 " +
    "character (the literal must transcode server-side)") {
    // two strings sharing a 2-byte UTF-8 char then diverging INSIDE
    // another multibyte char's continuation bytes
    val s1 = "ééa" // é = 0xC3 0xA9
    val s2 = "ééz"
    stringMidpoint(s1, s2).foreach { m =>
      // the midpoint must be VALID UTF-8 (round-trips the encoder)
      val bytes = m.getBytes("UTF-8")
      assert(new String(bytes, "UTF-8") == m)
      assert(m >= s1.substring(0, 1))
    }
  }

  test("adaptivePartitions: a heavily skewed key space splits by " +
    "estimated rows — partitions balance where uniform would " +
    "concentrate; coverage stays exact") {
    // corpus: 900 keys under 'user-0xxx', 100 keys under 'zz-xxx'
    val keys = ((0 until 900).map(i => f"user-0$i%03d") ++
      (0 until 100).map(i => f"zz-$i%03d")).sorted
    val prober = new RangeProber {
      private def inRange(s: String, e: String) =
        keys.count(k => k >= s && k < e)
      def estimateRows(s: String, e: String): Long =
        inRange(s, e).toLong
      def nextRealKey(mid: String, s: String, e: String)
          : Option[String] =
        keys.find(k => k >= mid && k > s && k < e)
      def prevRealKey(mid: String, s: String, e: String)
          : Option[String] =
        keys.filter(k => k < mid && k > s && k < e).lastOption
    }
    val parts = adaptivePartitions(prober, keys.head, keys.last, 8)
    assert(parts.size == 8)
    assertCovers(parts, keys.head, keys.last)
    // the balance claim is a CAP on the largest partition (slivers on
    // the small side are fine — a snapped midpoint can isolate one
    // key): uniform VALUE-space splitting leaves ~900 of the 1000
    // keys in one partition ('user-0*' occupies a narrow value
    // slice); adaptive must cap near the ideal 1000/8
    val counts = parts.map(p =>
      keys.count(k =>
        if (p.endInclusive) k >= p.start && k <= p.end
        else k >= p.start && k < p.end))
    assert(counts.sum == keys.size, s"coverage broke: $counts")
    assert(counts.max <= 250, s"largest partition uncapped: $counts")
  }

  test("adaptivePartitions stops early when nothing splits (identical " +
    "keys) and still covers") {
    val prober = new RangeProber {
      def estimateRows(s: String, e: String): Long = 1000L
      def nextRealKey(mid: String, s: String, e: String)
          : Option[String] = None
      def prevRealKey(mid: String, s: String, e: String)
          : Option[String] = None
    }
    val parts = adaptivePartitions(prober, "aaa", "aab", 8)
    assert(parts.nonEmpty && parts.size < 8)
    assertCovers(parts, "aaa", "aab")
  }
}
