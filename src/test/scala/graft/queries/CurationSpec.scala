package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Semantics of the corpus-curation operators on handcrafted fixtures
  * (known repetition / shared spans / duplicate vectors), plus the plan
  * properties that carry them to corpus scale. */
class CurationSpec extends SparkSpec {

  /** Write a handcrafted documents table and return its dir. */
  private def docTable(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("curation")
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embTable(rows: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val dir = tmpDir("curemb")
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("repetition gate: exact per-mille fractions and flag") {
    // 10 words, 6× "spam": top_word_pm = 600; bigrams: 9 total,
    // "spam spam" ×5 → 5 distinct bigrams → dup = (9-5)*1000 DIV 9 = 444
    val dir = docTable(Seq(
      (1L, "spam spam spam spam spam spam a b c d"),
      (2L, "a b c d e f g h i j")))
    val rows = CurationQueries.repetitionFilter.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(rows(0) == ((1L, 600L, 444L, 1)))
    assert(rows(1) == ((2L, 100L, 0L, 0))) // all unique: top = 1/10
  }

  test("pii scrub: email + denylist redaction counts and content") {
    val dir = docTable(Seq(
      (1L, "mail bob@example.com and customer customerx end"),
      (2L, "clean text only")))
    val out = CurationQueries.piiScrub.run(spark, dir).collect()
    val r1 = out(0)
    assert(r1.getInt(1) == 1)   // one email
    assert(r1.getLong(2) == 2L) // 'customer' substring twice (customerx)
    // redaction really happened: scrubbed text hash differs from raw md5
    import spark.implicits._
    val raw = spark.read.parquet(s"$dir/documents.parquet")
      .where($"doc_id" === 1L)
      .select(org.apache.spark.sql.functions.md5($"text"))
    assert(r1.getString(4) != raw.collect()(0).getString(0))
    // doc 2 untouched: scrubbed length == raw length
    assert(out(1).getLong(3) == "clean text only".length.toLong)
  }

  test("span dedup: spans shared across docs are counted, within-doc not") {
    // docs 1 and 2 share the span "v w x y z"; doc 3 is disjoint.
    val dir = docTable(Seq(
      (1L, "v w x y z a b c d e"),
      (2L, "p q r s t v w x y z"),
      (3L, "k l m n o k2 l2 m2 n2 o2")))
    val rows = CurationQueries.spanDedup.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 6 distinct 5-gram spans per 10-word doc; exactly one shared each
    assert(rows(0) == ((1L, 6L, 1L)))
    assert(rows(1) == ((2L, 6L, 1L)))
    assert(rows(2) == ((3L, 6L, 0L)))
  }

  test("semdedup: identical vectors collapse to the lowest id") {
    // 20 spread-out base vectors + two exact duplicates of vec 0.
    val base = (0 until 20).map { i =>
      (i.toLong, Seq.tabulate(8)(d =>
        (math.sin(i * 31 + d * 7) * (if (d % 2 == 0) 1 else -1)).toFloat))
    }
    val dups = Seq((100L, base(0)._2), (101L, base(0)._2))
    val out = CurationQueries.semDedup.run(spark, embTable(base ++ dups))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(out(0L) == 1)   // lowest id of the duplicate group survives
    assert(out(100L) == 0) // exact duplicates dropped
    assert(out(101L) == 0)
  }

  test("keyword search ranks by df-weighted tf, ties by doc_id") {
    val dir = docTable(Seq(
      (1L, "spark spark spark x"),   // rare term, tf 3
      (2L, "query query query query x"), // common term, tf 4
      (3L, "query x y z"),
      (4L, "query spark x y")))
    val rows = CurationQueries.keywordSearch.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (rank, doc_id, score); df(spark)=2 → w=500000; df(query)=3 → w=333333
    assert(rows.head == ((1L, 1L, 1500000L)))      // 3×500000
    assert(rows(1) == ((2L, 2L, 4 * 333333L)))     // 4×333333
    assert(rows(2) == ((3L, 4L, 500000L + 333333L)))
  }

  test("mix plan: rates fill the budget and cap at keep-everything") {
    val rows = CurationQueries.mixPlan.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { case (_, tokens, targetPm, ratePm) =>
      val want = 20000L * targetPm / 1000L
      val expected = math.min(1000L, want * 1000L / tokens)
      assert(ratePm == expected)
    }
  }

  test("differential: repetition + span stats vs plain-Scala on random docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docsGen = (0L until 40L).map { id =>
      val n = 6 + rnd.nextInt(20)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dir = docTable(docsGen)

    // plain-Scala reference for the repetition gate
    val expectedRep = docsGen.map { case (id, text) =>
      val ws = text.split(" ").toSeq
      val top = ws.groupBy(identity).values.map(_.size).max.toLong
      val n = ws.size.toLong
      val bgs = ws.sliding(2).map(_.mkString(" ")).toSeq
      val nb = bgs.size.toLong
      val ndb = bgs.distinct.size.toLong
      val topPm = top * 1000 / n
      val dupPm = (nb - ndb) * 1000 / nb
      id -> ((topPm, dupPm, if (topPm > 140 || dupPm > 65) 1 else 0))
    }.toMap
    val gotRep = CurationQueries.repetitionFilter.run(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(gotRep == expectedRep)

    // plain-Scala reference for cross-doc 5-gram span sharing
    val spansByDoc = docsGen.map { case (id, text) =>
      id -> text.split(" ").toSeq.sliding(5).filter(_.size == 5)
        .map(_.mkString(" ")).toSet
    }.toMap
    val allCounts = spansByDoc.values.flatten
      .groupBy(identity).map { case (sp, occ) => sp -> occ.size }
    val expectedSpan = spansByDoc.collect {
      case (id, sps) if sps.nonEmpty =>
        val shared = sps.count(sp => allCounts(sp) >= 2).toLong
        id -> ((sps.size.toLong, shared))
    }
    val gotSpan = CurationQueries.spanDedup.run(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(gotSpan == expectedSpan)
  }

  // ------------------------------------------------------ plan shape

  test("pii scrub is pure per-row compute: no exchange except the sort") {
    val plan = CurationQueries.piiScrub
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val shuffles = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 0, plan.take(2000))
  }

  test("keyword search: global top-k is TakeOrdered, never a window") {
    val df = CurationQueries.keywordSearch
      .run(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("repetition filter prunes the scan to doc_id + text") {
    val plan = CurationQueries.repetitionFilter
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("source") && !readSchema.contains("lang"),
      readSchema)
  }

  test("incremental dedup: new-vs-corpus duplicates drop, unique keep") {
    import spark.implicits._
    val dir = tmpDir("curinc")
    val corpusText = "a b c d e f g h i j k l"
    Seq(
      (1L, corpusText, "src0"),                       // existing corpus
      (2L, "z y x w v u t s r q p o", "src0"),
      (100L, corpusText, "src18"),                    // dup of corpus doc 1
      (101L, "completely different words here now one two three", "src19"),
      (102L, corpusText, "src19"))                    // dup of 1 AND 100
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationQueries.dedupIncremental.run(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
    assert(out.keySet == Set(100L, 101L, 102L)) // only the increment
    assert(out(100L)._2 == 0) // matches corpus doc 1
    assert(out(101L)._2 == 1) // unique: kept
    assert(out(102L) == ((2L, 0))) // matches corpus doc 1 + earlier new 100
  }

  test("filtered ANN: semi-join prunes candidates before scoring") {
    val plan = CurationQueries.annFiltered
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
    // the filter side reads ids+predicate columns only, never text
    val readSchemas = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(!readSchemas.contains("text"), readSchemas)
    // scoring happens above the semi-join: TakeOrdered sits over the
    // joined (pruned) frame
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("int8 scalar quantization keeps a useful recall floor") {
    val found = PipelineQueries.annSqRecall
      .run(spark, "/root/testdata/sf0.001")
      .collect().map(_.getAs[Int]("found")).sum
    // measured 9/10 at sf0.01 and sf0.001; assert a conservative floor
    assert(found >= 7, s"int8 recall@10 = $found/10")
  }

  test("PQ shortlist + exact re-rank keeps a useful recall floor") {
    val found = PipelineQueries.annPqRecall
      .run(spark, "/root/testdata/sf0.001")
      .collect().map(_.getAs[Int]("found")).sum
    // raw ADC top-10 measured 2/10 on this PQ-adversarial random corpus;
    // the top-50 shortlist + exact re-rank recovers 7/10 at sf0.01 —
    // assert a conservative floor on the re-ranked output
    assert(found >= 4, s"PQ re-ranked recall@10 = $found/10")
  }

  /** Documents table with per-row source (the split the bloom and
    * incremental ops key on). */
  private def docTableSrc(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("cursrc")
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("train split: buckets follow md5(doc_id) and are rerun-stable") {
    val dir = docTable((0L until 30L).map(i => (i, s"w$i x y")))
    def run() = CurationQueries.trainSplit.run(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val rows = run()
    assert(rows.map(_._3).sum == 30L)      // every doc labeled once
    assert(rows.map(_._4).sum == 30L * 3)  // 3 tokens per doc
    // same buckets the portable hash defines (first 15 md5 hex digits)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 10
    }
    val expect = (0L until 30L).groupBy { i =>
      val b = bucket(i)
      if (b < 8) "train" else if (b == 8) "val" else "test"
    }.view.mapValues(_.size.toLong).toMap
    val got = rows.groupBy(_._2)
      .view.mapValues(_.map(_._3).sum).toMap
    assert(got == expect, s"got $got expect $expect")
    assert(run().toSeq == rows.toSeq) // deterministic under rerun
  }

  test("bloom span dedup: only verified cross-increment spans survive") {
    // corpus doc 1 shares the span "v w x y z" with new doc 10; new doc
    // 11 has no corpus span — the bloom may or may not pass its spans,
    // the verify join must drop them either way.
    val dir = docTableSrc(Seq(
      (1L, "v w x y z a b c d e", "src0"),
      (2L, "p q r s t u aa bb cc dd", "src1"),
      (10L, "m n v w x y z k l o", "src18"),
      (11L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10", "src19")))
    val out = CurationQueries.dedupBloom.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((10L, 1L)), out.mkString(","))
  }

  test("chunk dedup: aligned 20-word chunks, keep-first semantics") {
    val w20a = (1 to 20).map(i => s"a$i").mkString(" ")
    val w20b = (1 to 20).map(i => s"b$i").mkString(" ")
    // doc 1: chunk a + 5-word tail; doc 2: SAME chunk a + different
    // tail (dup against doc 1); doc 3: all-new single short chunk.
    val dir = docTable(Seq(
      (1L, w20a + " t1 t2 t3 t4 t5"),
      (2L, w20a + " u1 u2 u3 u4 u5"),
      (3L, "c1 c2 c3")))
    val out = CurationQueries.dedupChunk.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 0L), (2L, 2L, 1L), (3L, 1L, 0L)),
      out.mkString(","))
  }

  test("bpe apply: priority-ordered merges tokenize like the merge table") {
    // "the" -> t h e -> (t h)->th -> (th e)->the : 1 token
    // "thin" -> t h i n -> th i n -> (i n)->in : "th in" = 2 tokens
    // "zq" -> z q : no merge applies : 2 tokens
    val dir = docTable(Seq((1L, "the thin zq")))
    val r = CurationQueries.bpeTokens.run(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("n_chars") == 9L)   // 3 + 4 + 2
    assert(r.getAs[Long]("bpe_tokens") == 5L) // 1 + 2 + 2
  }

  test("exact substring dedup: planted shared span merges into one " +
    "island; clean and short docs emit zero-dup rows") {
    // docs 1 and 2 share a 30-token run; at W=25 that yields 6
    // duplicated stride-1 windows in each doc which must merge into ONE
    // island spanning exactly the 30 shared tokens. doc 3 has one
    // unique window (clean), doc 4 is too short for any window — both
    // still emit rows (self-validating output).
    val shared = (1 to 30).map(i => s"s$i").mkString(" ")
    val dir = docTable(Seq(
      (1L, shared + " " + (1 to 5).map(i => s"x$i").mkString(" ")),
      (2L, "y1 y2 " + shared),
      (3L, (1 to 25).map(i => s"c$i").mkString(" ")),
      (4L, "t1 t2 t3 t4 t5")))
    val out = PipelineQueries.dedupSubstring.run(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("dup_tokens"), r.getAs[Long]("dup_pm")))
    assert(out.toSeq == Seq(
      (1L, 35L, 30L, 30L * 1000 / 35),
      (2L, 32L, 30L, 30L * 1000 / 32),
      (3L, 25L, 0L, 0L),
      (4L, 5L, 0L, 0L)), out.mkString(","))
  }

  test("13-gram contamination audit: planted overlap is counted and " +
    "clean docs still emit a zero-hit row") {
    // doc 0 (0 % 97 == 0) is the benchmark: exactly one 13-gram.
    // doc 1 embeds that 13-gram verbatim at the start of 18 words →
    // 6 distinct windows, exactly 1 of them contaminated.
    // doc 2 is 13 clean words → 1 window, 0 hits — the left join must
    // still produce its row (the r6 inner join dropped it, letting an
    // empty result pass as "clean").
    val bench13 = (1 to 13).map(i => s"w$i").mkString(" ")
    val dir = docTable(Seq(
      (0L, bench13),
      (1L, bench13 + " x1 x2 x3 x4 x5"),
      (2L, (1 to 13).map(i => s"c$i").mkString(" "))))
    val out = PipelineQueries.contaminationNgram.run(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_hit"), r.getAs[Long]("hit_pm")))
    assert(out.toSeq == Seq(
      (1L, 6L, 1L, 1000L / 6),
      (2L, 1L, 0L, 0L)), out.mkString(","))
  }
}
