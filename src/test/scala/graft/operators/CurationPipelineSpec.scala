package graft.operators

import graft.SparkSpec

/** Planted-document funnel: one document engineered to die at each
  * stage, surviving all earlier ones — so the audit pins exactly WHERE
  * each failure mode is caught, not just how many die in aggregate. */
class CurationPipelineSpec extends SparkSpec {

  test("each planted failure dies at its own stage; clean docs survive") {
    val spark0 = spark
    import spark0.implicits._
    def t(words: Seq[String]) = words.mkString(" ")
    val a = (0 until 40).map(i => s"a$i")            // clean base
    val docA = t(a)
    val docB = docA                                  // exact copy → s1
    val docC = t(a.dropRight(2) ++ Seq("cx", "cy"))  // near-dup → s2
    val docD = t((0 until 5).map(i => s"d$i"))       // too short → s3
    val docE = t(Seq.fill(40)("spam"))               // repetition → s4
    val g = (0 until 25).map(i => s"g$i")            // benchmark doc
    // contaminated: 13 consecutive benchmark words inside fresh text
    val docF = t((0 until 8).map(i => s"f$i") ++ g.slice(3, 16) ++
      (0 until 6).map(i => s"ff$i"))
    val docH = t((0 until 30).map(i => s"h$i"))      // clean → survives

    val corpus = Seq(
      (1L, docA), (2L, docB), (3L, docC), (4L, docD),
      (5L, docE), (6L, docF), (7L, docH)).toDF("doc_id", "text")
    val bench = Seq((100L, t(g))).toDF("doc_id", "text")

    val (kept, audits) = CurationPipeline.run(corpus, bench)
    assert(audits.map(a => (a.ord, a.stage, a.docsIn, a.docsOut)) == Seq(
      (1, "exact_dedup", 7L, 6L),      // B dies (copy of A, higher id)
      (2, "near_dedup", 6L, 5L),       // C dies (J vs A ≈ 0.9 ≥ 0.5)
      (3, "length_gate", 5L, 4L),      // D dies (5 words < 20)
      (4, "repetition_gate", 4L, 3L),  // E dies (top-word 1000‰)
      (5, "decontaminate", 3L, 2L)),   // F dies (shared 13-gram)
      audits.mkString(", "))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 7L))
  }

  test("incremental run: increment docs die against the EXISTING corpus " +
    "(exact hash and near-dup), never the reverse") {
    val spark0 = spark
    import spark0.implicits._
    def t(words: Seq[String]) = words.mkString(" ")
    val a = (0 until 40).map(i => s"a$i")
    val corpus = Seq(
      (1L, t(a)),                                    // existing doc
      (2L, t((0 until 30).map(i => s"c$i")))).toDF("doc_id", "text")
    val incA = t(a)                                  // exact copy of 1
    val incB = t(a.dropRight(2) ++ Seq("nx", "ny"))  // near-dup of 1
    val incC = t((0 until 30).map(i => s"n$i"))      // genuinely new
    val incD = incC                                  // copy WITHIN inc
    val increment = Seq(
      (10L, incA), (11L, incB), (12L, incC), (13L, incD))
      .toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")

    val (kept, audits) =
      CurationPipeline.runIncrement(corpus, increment, bench)
    // s1: 13 dies within-increment (copy of 12), 10 dies vs corpus
    assert(audits.head == CurationPipeline.StageAudit(
      1, "exact_dedup", 4L, 2L), audits.mkString(", "))
    // s2: 11 dies as near-dup of CORPUS doc 1
    assert(audits(1) == CurationPipeline.StageAudit(
      2, "near_dedup", 2L, 1L), audits.mkString(", "))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(12L))
  }

  test("empty benchmark: decontamination drops nothing") {
    val spark0 = spark
    import spark0.implicits._
    val corpus = Seq(
      (1L, (0 until 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (kept, audits) = CurationPipeline.run(corpus, bench)
    assert(audits.last == CurationPipeline.StageAudit(
      5, "decontaminate", 1L, 1L))
    assert(kept.count() == 1L)
  }

  test("star-topology recall bound, pinned: a smaller FALSE-POSITIVE " +
    "collider anchoring every shared bucket hides a true pair (the " +
    "documented miss); on a real corpus star ≡ clique verified drops") {
    val spark0 = spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._

    // --- the adversarial layout, at the bands level: docs 1 and 2 are
    // true duplicates; doc 0 is a non-duplicate that shares EVERY band
    // bucket with them (the false-positive collider the scaladoc
    // bound describes)
    val bands = (0 until 8).flatMap(b =>
      Seq((0L, b, 42L), (1L, b, 42L), (2L, b, 42L)))
      .toDF("doc_id", "band", "key")
    val starPairs = CurationPipeline.keepFirstCandidates(bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // star emits only collider edges — the (1,2) edge never forms
    assert(starPairs == Set((0L, 1L), (0L, 2L)))
    // with shingle sets where J(1,2)=1 but J(0,·)<0.5, verify drops
    // NOTHING: doc 2 (the true duplicate) survives — the bounded miss
    val sh = (Seq(0L -> "x1", 0L -> "x2", 0L -> "x3", 0L -> "x4") ++
      Seq(1L -> "s1", 1L -> "s2", 2L -> "s1", 2L -> "s2"))
      .toDF("doc_id", "s")
    val cnt = Seq((0L, 4L), (1L, 2L), (2L, 2L)).toDF("doc_id", "n")
    val missed = CurationPipeline.verifiedDrops(
      starPairs.toSeq.toDF("d1", "d2"), sh, cnt)
    assert(missed.count() == 0L,
      "the adversarial layout must demonstrate the documented miss")
    // the clique over the same buckets WOULD catch it — the cost of
    // that guarantee (Σ bucket²/2 edges) is why star ships
    val clique = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    assert(CurationPipeline.verifiedDrops(clique, sh, cnt)
      .collect().map(_.getLong(0)).toSet == Set(2L))

    // --- empirical miss rate on a REAL corpus with planted dup
    // clusters + near-miss chaff: star and clique verify to the SAME
    // drop set (false-positive anchors are rare by LSH design — a
    // band collision of a J<0.5 doc needs all 4 minhash rows equal)
    def t(words: Seq[String]) = words.mkString(" ")
    val rnd = new scala.util.Random(7)
    val docs = (0 until 300).map { i =>
      val cluster = i % 60 // 60 clusters of 5: 4 dups + 1 distinct
      val base = (0 until 30).map(j => s"w${cluster}_$j")
      val text =
        if (i % 5 == 4) t((0 until 30).map(j => s"u${i}_$j")) // distinct
        else if (i % 5 == 3) // near-dup: 2 words swapped, J ≈ 0.87
          t(base.dropRight(2) ++ Seq(s"n$i", s"m$i"))
        else t(base) // exact-shingle dup of the cluster base
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val shaped = CurationPipeline.shapedOf(docs).localCheckpoint(true)
    val bands2 = CurationPipeline.bandsOf(shaped).localCheckpoint(true)
    val sh2 = shaped.select(col("doc_id"), explode(col("shs")).as("s"))
    val cnt2 = shaped.select(col("doc_id"),
      size(col("shs")).cast("long").as("n"))
    val starDrops = CurationPipeline.verifiedDrops(
      CurationPipeline.keepFirstCandidates(bands2), sh2, cnt2)
      .collect().map(_.getLong(0)).toSet
    val clique2 = bands2.as("a").join(bands2.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val cliqueDrops = CurationPipeline.verifiedDrops(clique2, sh2, cnt2)
      .collect().map(_.getLong(0)).toSet
    assert(starDrops == cliqueDrops,
      s"star missed ${(cliqueDrops -- starDrops).toSeq.sorted} " +
        s"of ${cliqueDrops.size} clique drops")
    assert(cliqueDrops.nonEmpty, "the corpus must exercise real drops")
    val _ = rnd
  }
}
