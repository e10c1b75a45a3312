package graft.queries

import graft.SparkSpec

/** Exact semantics of the TRAINED curation filters (NB-style classifier,
  * bigram-LM scoring) on handcrafted fixtures where every integer weight
  * is derivable by hand, plus data-skipping invariants of the Bloom
  * file index on the real sf0.001 tables. The DuckDB oracle gate proves
  * Spark↔SQL equivalence; these prove the numbers are the RIGHT ones.
  */
class TrainedFilterSpec extends SparkSpec {

  private def docTable(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("trained")
    rows.map { case (id, t, lang) => (id, t, lang, "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("nb classifier: hand-computed Laplace ratio weights and scores") {
    // tf: doc1(en): aa×2 bb×1 | doc2(fr): cc×2 bb×1
    // pos(aa,bb,cc) = (2,1,0), neg = (0,1,2), Npos = Nneg = 3, V = 3
    // r(aa) = (3·6·1000)//(1·6) = 3000, r(bb) = 1000, r(cc) = 333
    // doc1: (2·3000 + 1000)//3 = 2333 → en; doc2: (2·333 + 1000)//3 = 555
    val dir = docTable(Seq(
      (1L, "aa aa bb", "en"), (2L, "cc cc bb", "fr")))
    val rows = CurationQueries.nbClassifier.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      (1L, 3L, 2333L, "en", "en"),
      (2L, 3L, 555L, "other", "other")))
  }

  test("bigram lm: conditional costs from corpus bigram/context counts") {
    // doc1 "a b a b": bigrams (a,b)×2 (b,a)×1; doc2 "a a b": (a,a) (a,b)
    // corpus: c2(a,b)=3 c2(b,a)=1 c2(a,a)=1; c1(a)=4 c1(b)=1
    // costs: (a,b)=4000//3=1333, (b,a)=1000, (a,a)=4000
    // doc1: (2·1333 + 1000)//3 = 1222; doc2: (4000 + 1333)//2 = 2666
    val dir = docTable(Seq((1L, "a b a b", "en"), (2L, "a a b", "en")))
    val rows = CurationQueries.bigramLm.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 3L, 1222L), (2L, 2L, 2666L)))
  }

  test("bigram lm: sub-2-word documents carry no bigrams and drop") {
    val dir = docTable(Seq((1L, "solo", "en"), (2L, "a b", "en")))
    val rows = CurationQueries.bigramLm.run(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
    // The only bigram is its own model: cost = 1000 exactly.
    assert(rows.head.getLong(2) == 1000L)
  }

  test("bloom prune: no false negatives, and the index skips files " +
    "min/max cannot (sf0.001)") {
    val rows = LayoutQueries.bloomPrune.run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ft, fb, fm, tot) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(fb >= ft, s"false negative: bloom $fb < true $ft")
      assert(fb <= tot && fm <= tot)
      // The point of the index: a partkey lookup under orderkey layout
      // prunes (almost) nothing via min/max but most files via Bloom.
      assert(fb < fm, s"bloom $fb should beat min/max $fm")
    }
  }

  test("nb classifier is non-degenerate on real data: both classes " +
    "predicted, scores spread (sf0.001)") {
    val rows = CurationQueries.nbClassifier.run(spark, "/root/testdata/sf0.001")
      .collect()
    val preds = rows.map(_.getString(3)).toSet
    assert(preds == Set("en", "other"))
    val acc = rows.count(r => r.getString(3) == r.getString(4)).toDouble /
      rows.length
    assert(acc > 0.5, s"trained classifier no better than chance: $acc")
  }
}
