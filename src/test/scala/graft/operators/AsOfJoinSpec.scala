package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("asof semantics: <=, latest wins, no-match null, key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l1"), // after r@5 and r@10 → r@10 (equal ts matches)
      (1L, 7L, "l2"),  // between r@5 and r@10 → r@5
      (1L, 3L, "l3"),  // before any right → null
      (2L, 100L, "l4") // key 2 has no right rows → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 10L, "r10"), (3L, 1L, "rX"))
      .toDF("k", "rt", "rv")

    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt",
      Seq("rt", "rv"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[String]("rv")).getOrElse("NONE")).toMap

    assert(out == Map(
      "l1" -> "r10", "l2" -> "r5", "l3" -> "NONE", "l4" -> "NONE"))
  }

  test("forward asof: >=, earliest wins, no-match null, key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l1"), // r@10 and r@15 ahead → r@10 (equal ts matches)
      (1L, 11L, "l2"), // only r@15 ahead → r15
      (1L, 20L, "l3"), // nothing at-or-after → null
      (2L, 1L, "l4")   // key 2 has no right rows → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 99L, "rX"))
      .toDF("k", "rt", "rv")

    val out = AsOfJoin.asOfForward(left, right, Seq("k"), "t", "rt",
      Seq("rt", "rv"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[String]("rv")).getOrElse("NONE")).toMap

    assert(out == Map(
      "l1" -> "r10", "l2" -> "r15", "l3" -> "NONE", "l4" -> "NONE"))
  }
}
