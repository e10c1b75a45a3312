package graft.qrep

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the range invariants implicit in the reference's
  * PartitionHelper (utils/partition.go:158-447): contiguity, no overlap,
  * full coverage, exclusive resume. Pure arithmetic — no SparkSession.
  * Seeded random cases (scalacheck-style, fixed seed for determinism). */
class PartitionerSpec extends AnyFunSuite {

  private def cases: Seq[(Long, Long, Int)] = {
    val rnd = new Random(42)
    Seq.fill(300) {
      val mn = rnd.between(-100000L, 100000L)
      val span = rnd.between(0L, 500000L)
      (mn, mn + span, rnd.between(1, 65))
    } ++ Seq((0L, 0L, 1), (0L, 0L, 8), (5L, 6L, 64), (-10L, -10L, 3))
  }

  test("computeRanges: contiguous, non-overlapping, covers [mn, mx]") {
    for ((mn, mx, n) <- cases) {
      val rs = Partitioner.computeRanges(mn, mx, n)
      assert(rs.nonEmpty)
      assert(rs.head.lo == mn - 1) // (lo, hi] includes mn
      assert(rs.last.hi == mx)
      rs.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.lo == a.hi, s"gap/overlap between $a and $b")
        case _ =>
      }
      rs.foreach(r => assert(r.hi > r.lo, s"empty range $r"))
      // row-count balance: sizes differ by at most 1
      val sizes = rs.map(r => r.hi - r.lo)
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.sum == mx - mn + 1)
    }
  }

  test("computeRanges: never more partitions than keys") {
    for ((mn, mx, n) <- cases) {
      val rs = Partitioner.computeRanges(mn, mx, n)
      assert(rs.size <= (mx - mn + 1))
      assert(rs.size <= n)
    }
  }

  test("mergeContiguous preserves coverage and bounds") {
    val rnd = new Random(7)
    for ((mn, mx, n) <- cases) {
      val maxP = rnd.between(1, 9)
      val rs = Partitioner.computeRanges(mn, mx, n)
      val merged = Partitioner.mergeContiguous(rs, maxP)
      assert(merged.size <= math.max(maxP, 1))
      assert(merged.head.lo == rs.head.lo)
      assert(merged.last.hi == rs.last.hi)
      merged.sliding(2).foreach {
        case Seq(a, b) => assert(b.lo == a.hi)
        case _ =>
      }
    }
  }

  test("resume: ranges after watermark start strictly beyond it") {
    val rs = Partitioner.computeRanges(101L, 200L, 4)
    // caller passes after=100 by filtering; contract: lo of first = 100
    assert(rs.head.lo == 100L)
    assert(rs.flatMap(r => Seq(r.lo, r.hi)).forall(_ >= 100L))
  }
}
