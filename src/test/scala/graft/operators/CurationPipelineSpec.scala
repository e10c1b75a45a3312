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
}
