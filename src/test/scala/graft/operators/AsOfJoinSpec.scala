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

  test("asof tolerance: stale matches null out, fresh ones survive") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 50L, "l2")).toDF("k", "t", "tag")
    val right = Seq((1L, 8L, "r8")).toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt",
      Seq("rv"), tolerance = Some(5L))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[String]("rv")).getOrElse("NONE")).toMap
    // l1@10: gap 2 ≤ 5 → match; l2@50: gap 42 > 5 → nulled
    assert(out == Map("l1" -> "r8", "l2" -> "NONE"))
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

  test("differential: both directions match brute force on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(100).toLong, i.toLong))
    val right = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(100).toLong, 1000L + i))
    val lDf = left.toDF("k", "t", "lid")
    val rDf = right.toDF("k", "rt", "rid")

    // brute force: per left row, scan all right rows
    def expectBackward(k: Long, t: Long): Option[Long] = {
      val c = right.filter(r => r._1 == k && r._2 <= t)
      if (c.isEmpty) None
      else Some(c.maxBy(r => (r._2, r._3))._3) // latest time; ties → any
    }
    def expectForward(k: Long, t: Long): Option[Long] = {
      val c = right.filter(r => r._1 == k && r._2 >= t)
      if (c.isEmpty) None else Some(c.minBy(r => (r._2, -r._3))._3)
    }

    val back = AsOfJoin.asOf(lDf, rDf, Seq("k"), "t", "rt",
      Seq("rt", "rid")).collect()
      .map(r => r.getAs[Long]("lid") ->
        (Option(r.getAs[Any]("rt")), Option(r.getAs[Any]("rid")))).toMap
    val fwd = AsOfJoin.asOfForward(lDf, rDf, Seq("k"), "t", "rt",
      Seq("rt", "rid")).collect()
      .map(r => r.getAs[Long]("lid") ->
        (Option(r.getAs[Any]("rt")), Option(r.getAs[Any]("rid")))).toMap

    left.foreach { case (k, t, lid) =>
      // compare on matched TIME (tie rows share it; rid is arbitrary)
      val wantB = expectBackward(k, t).map(rid =>
        right.find(_._3 == rid).get._2)
      val gotB = back(lid)._1.map(_.asInstanceOf[Long])
      assert(gotB == wantB, s"backward lid=$lid k=$k t=$t")
      val wantF = expectForward(k, t).map(rid =>
        right.find(_._3 == rid).get._2)
      val gotF = fwd(lid)._1.map(_.asInstanceOf[Long])
      assert(gotF == wantF, s"forward lid=$lid k=$k t=$t")
    }
  }
}
