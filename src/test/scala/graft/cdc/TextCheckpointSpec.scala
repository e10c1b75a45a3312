package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.TextCheckpoint._

class TextCheckpointSpec extends AnyFunSuite {

  private val u1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
  private val u2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeffff0000"

  test("GTID set parse normalizes: merge adjacent/overlapping, sort, case") {
    val g = GtidSet.parse(s"${u1.toUpperCase}:3-5:1-2:9, $u2:4")
    assert(g.render == s"$u1:1-5:9,$u2:4")
    assert(GtidSet.parse(g.render) == g) // parse ∘ render stable
  }

  test("containment is the GTID progress order") {
    val a = GtidSet.parse(s"$u1:1-10,$u2:1-3")
    val b = GtidSet.parse(s"$u1:1-7,$u2:1-3")
    val c = GtidSet.parse(s"$u1:1-7,$u2:5") // divergent vs b
    assert(a.contains(b) && !b.contains(a))
    assert(a.isNewerThan(b))
    assert(b.tryCompare(a) == Some(-1))
    assert(a.tryCompare(b) == Some(1))
    assert(a.tryCompare(a) == Some(0))
    assert(b.tryCompare(c) == None) // genuinely partial
    assert(a.containsTx(u1, 9) && !b.containsTx(u1, 9))
  }

  test("merge unions shard checkpoints") {
    val a = GtidSet.parse(s"$u1:1-5")
    val b = GtidSet.parse(s"$u1:4-9,$u2:1")
    val m = a.merge(b)
    assert(m.render == s"$u1:1-9,$u2:1")
    assert(m.contains(a) && m.contains(b))
  }

  test("resume tokens order lexicographically with prefix rule") {
    assert(compareResumeTokens("82635f01", "82635f02") < 0)
    assert(compareResumeTokens("82635f02", "82635f01") > 0)
    assert(compareResumeTokens("8263", "82635f01") < 0) // prefix = older
    assert(compareResumeTokens("82635f01", "82635f01") == 0)
  }
}
