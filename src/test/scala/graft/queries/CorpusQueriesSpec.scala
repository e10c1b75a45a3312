package graft.queries

import graft.SparkSpec

/** Semantics of the corpus-prep operators on handcrafted fixtures:
  * winnowing's coverage guarantee, MOSS pair matching on a planted
  * shared span, chunk slicing arithmetic, and the Misra–Gries
  * deterministic guarantees on a skewed stream. */
class CorpusQueriesSpec extends SparkSpec {

  private def docTable(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("corpus")
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  override def afterAll(): Unit = {
    TokenStats.invalidate()
    super.afterAll()
  }

  test("winnowing: density guarantee holds and short docs are absent") {
    val long = (1 to 40).map(i => s"w${i % 13}").mkString(" ")
    val dir = docTable(Seq(
      (1L, long),
      (2L, "a b c d e"))) // 5 words -> 3 grams -> no full window
    val rows = CorpusQueries.winnowing.run(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    val (nFp, nWin, ok) =
      (rows(0).getLong(1), rows(0).getLong(2), rows(0).getInt(3))
    assert(nWin == 40 - 2 - 3) // n_grams - (w - 1)
    assert(ok == 1 && nFp * 4 >= nWin && nFp <= nWin)
  }

  test("winnow pairs: a planted 30-word shared span links exactly the " +
    "two docs that carry it; unrelated docs never pair") {
    TokenStats.invalidate() // fixture dirs change under the same session
    val span = (1 to 30).map(i => s"s$i").mkString(" ")
    val noiseA = (1 to 20).map(i => s"a$i").mkString(" ")
    val noiseB = (1 to 20).map(i => s"b$i").mkString(" ")
    val other = (1 to 60).map(i => s"c$i").mkString(" ")
    val dir = docTable(Seq(
      (1L, s"$noiseA $span"),
      (2L, s"$span $noiseB"),
      (3L, other)))
    val rows = CorpusQueries.dedupWinnowing.run(spark, dir).collect()
    assert(rows.length == 1)
    assert((rows(0).getLong(0), rows(0).getLong(1)) == ((1L, 2L)))
    assert(rows(0).getLong(2) >= 8) // the shared span's fingerprints
  }

  test("rag chunks: stride/size arithmetic, overlap, and content md5") {
    TokenStats.invalidate()
    val words = (1 to 50).map(i => s"t$i")
    val dir = docTable(Seq((1L, words.mkString(" "))))
    val rows = CorpusQueries.ragChunks.run(spark, dir).collect()
    // 50 tokens, stride 24: starts at 1, 25, 49 -> 3 chunks
    assert(rows.length == 3)
    assert(rows.map(_.getLong(2)).toSeq == Seq(1L, 25L, 49L))
    assert(rows.map(_.getInt(3)).toSeq == Seq(32, 26, 2)) // clamped tail
    // content address = md5 of the space-joined slice
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(words.slice(24, 50).mkString(" ").getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(rows(1).getString(4) == expect)
  }

  test("misra-gries: guarantees hold on a skewed stream under any " +
    "merge order, and the heavy item always survives") {
    val sc = spark.sparkContext
    // 1000 'heavy' + 9 distractors x 60 = 1540 items, k = 4:
    // threshold N/(k+1) = 308 < 1000 -> 'heavy' must be retained
    val items = ("heavy", 1000L) +:
      (1 to 9).map(i => (s"d$i", 60L))
    for (parts <- Seq(1, 3, 8)) {
      val sketch = CorpusQueries.misraGries(
        sc.parallelize(items, parts), k = 4)
      assert(sketch.contains("heavy"))
      assert(sketch.size <= 4)
      val total = items.map(_._2).sum
      for ((w, est) <- sketch) {
        val exact = items.find(_._1 == w).get._2
        assert(est <= exact)
        assert((exact - est) * 5 <= total)
      }
      // absent items must be below the threshold
      for ((w, c) <- items if !sketch.contains(w))
        assert(c * 5 <= total)
    }
  }

  test("q_heavy_hitters verdicts are all-true on the corpus tables " +
    "(the theorem holds or the query is broken)") {
    TokenStats.invalidate()
    val dir = docTable(Seq(
      (1L, Seq.fill(40)("big").mkString(" ")),
      (2L, Seq.fill(10)("x y z").mkString(" "))))
    val rows = CorpusQueries.heavyHitters.run(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(2) == 1 && r.getInt(3) == 1))
    // 'big' (40 of 70) is a true heavy hitter at k=4 and leads the list
    assert(rows.head.getString(0) == "big")
  }
}
