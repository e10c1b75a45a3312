package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SignatureExprs, TextFunctions => TF}

/** The composed batch curation pipeline — the five standard stages a
  * training-corpus run chains, as ONE call with a per-stage audit
  * trail (the funnel table a 100 TB curation job publishes):
  *
  *   1. exact dedup       — keep the lowest doc_id per content hash
  *   2. near-dup removal  — MinHash(32) 8×4 LSH candidates, exact
  *                          3-gram Jaccard ≥ 0.5 verify, keep-first
  *                          (the higher id of every verified pair
  *                          drops)
  *   3. length gate       — word count within [minWords, maxWords]
  *   4. repetition gate   — top-word rate ≤ topWordPmMax per mille
  *                          (Gopher A1.1's first rule)
  *   5. decontamination   — any shared 13-gram with the benchmark set
  *                          drops the document (GPT-3/PaLM standard)
  *
  * Each stage reuses the SAME expressions its standalone query runs
  * (q_dedup_exact / q_dedup_minhash_lsh / q_length_gate /
  * q_repetition_filter / q_contamination_ngram), so the composition
  * adds no new semantics — only sequencing and the audit. Stages 3-5
  * and the audit scaffolding are ONE definition shared by [[run]] and
  * [[runIncrement]] — the two funnels cannot drift.
  *
  * Scale notes: every stage is the linear shape its query documents
  * (hash shuffles and band equi-joins, benchmark grams broadcast).
  * Only the two frames later work genuinely re-reads materialize
  * (`localCheckpoint`): the exact-dedup survivors and the near-dup
  * drop ids — the in-session stand-ins for the stage tables a real
  * run persists between increments; the stage-3-5 funnel resolves in
  * one aggregation over per-doc flags (see [[flagsFunnel]]). Docs too
  * short to carry a 3-shingle (stage 2) or a 13-gram (stage 5) pass
  * those stages untouched — the gates that can judge them are 3
  * and 4. */
object CurationPipeline {

  final case class Config(
      minWords: Int = 20,
      maxWords: Int = 1000,
      topWordPmMax: Long = 140,
      contamGram: Int = 13)

  /** One funnel row: documents entering and surviving the stage. */
  final case class StageAudit(ord: Int, stage: String,
      docsIn: Long, docsOut: Long)

  /** Run the five stages over `corpus` (doc_id BIGINT, text STRING).
    * `benchmark` (same shape) is the eval suite whose 13-grams poison;
    * pass an empty frame to skip decontamination semantics (stage 5
    * then drops nothing). Returns the surviving frame + the audit.
    *
    * CALLER CONTRACT (ADVICE r15): the source frames must be STABLE
    * across the run's actions — `docsIn` of stage 1 is counted in a
    * separate job from the survivor checkpoint, so a source that
    * changes between the two actions (or a non-deterministic input)
    * can make the audit row disagree with the checkpointed survivors.
    * And the returned kept frame is LAZY: every caller action on it
    * re-executes the flag joins, the near-dup verify join and the
    * contamination semi-join — checkpoint/persist it yourself if you
    * consume it more than once.
    *
    * Execution shape (optimization r15, guide §1/§2): the heavy stages
    * materialize exactly twice — the exact-dedup survivors (`s1`,
    * every later stage's base) and the near-dup drop set (`drops2`, a
    * tiny id frame) — and the five-stage funnel then resolves in ONE
    * aggregation over a per-doc flag frame instead of a checkpoint +
    * count action pair per stage. Gates 3-5 are pointwise per-doc
    * predicates, so cumulative conditional sums over one pass produce
    * the exact sequential funnel counts; the old shape paid ~10 driver
    * actions of pure fixed cost at every scale. */
  def run(corpus: DataFrame, benchmark: DataFrame,
      cfg: Config = Config()): (DataFrame, Seq[StageAudit]) = {
    val input = corpus.select("doc_id", "text")
    // count-pruned scan of the source — cheaper than checkpointing the
    // full text column just to count it
    val n0 = input.count()
    // tokenize ONCE at the s1 materialization: every later stage
    // (3-shingles, length, top-word rate, 13-grams) reads `ws` instead
    // of re-splitting the text it already carries — at 100 TB that is
    // one tokenization pass instead of four
    val s1 = exactDedupWithin(input)
      .withColumn("ws", TF.words(col("text")))
      .localCheckpoint(true)
    // drops2 stays LAZY: its single execution is inside the funnel
    // aggregation job, off the checkpointed `shaped` frame
    val drops2 = {
      val shaped = shapedOfWs(s1).localCheckpoint(true)
      // bands stay LAZY: both consumers in keepFirstCandidates
      // re-derive the cheap posexplode from the sig frame bandsOf
      // pins — cheaper than a third materialization
      val cand = keepFirstCandidates(bandsOf(shaped))
      val sh = shaped.select(col("doc_id"), explode(col("shs")).as("s"))
      val cnt = shaped.select(col("doc_id"),
        size(col("shs")).cast("long").as("n"))
      verifiedDrops(cand, sh, cnt)
    }
    flagsFunnel(s1, n0, drops2, benchmark, cfg)
  }

  /** The INCREMENTAL production loop: curate a new `increment` (a crawl
    * dump) against an already-kept `corpus` — the shape a recurring
    * 100 TB ingestion actually runs, where the corpus is orders of
    * magnitude larger than each increment and must never re-process.
    *
    * Stages are [[run]]'s five with the dedup stages widened to the
    * corpus boundary:
    *   1. exact dedup — within the increment AND against corpus
    *      content hashes (an anti-join on the hash: the corpus side
    *      reduces to its distinct hashes, never its text);
    *   2. near-dup — increment×increment pairs keep-first as in
    *      [[run]], plus increment×corpus candidates through the SAME
    *      band keys (corpus band keys are what a real run keeps
    *      persisted as its LSH index; corpus docs always win);
    *   3–5. gates and decontamination exactly as [[run]] — the same
    *      shared definitions, increment-local by nature.
    *
    * The corpus frame is only ever reduced (hashes, band keys,
    * shingles of CANDIDATE docs) — its text is never shuffled, and
    * increment×increment work never touches corpus scale. The corpus
    * shingle frame is checkpointed once (the in-session stand-in for
    * the persisted corpus LSH index a real recurring run keeps), so
    * corpus-side signature work runs once, not per consumer.
    *
    * CONTRACT: corpus and increment doc_ids share one global id space
    * (no collisions) — the verify machinery keys shingle counts by
    * doc_id across both sides. The stability and laziness caveats on
    * [[run]] apply here identically (stable sources across actions;
    * the returned kept frame is lazy — checkpoint it if consumed more
    * than once). */
  def runIncrement(corpus: DataFrame, increment: DataFrame,
      benchmark: DataFrame, cfg: Config = Config())
      : (DataFrame, Seq[StageAudit]) = {
    val corpusDocs = corpus.select("doc_id", "text")
    val input = increment.select("doc_id", "text")
    // count-pruned scan of the source — cheaper than a checkpoint
    val n0 = input.count()
    val s1 = {
      val corpusHashes = corpusDocs
        .select(md5(col("text")).as("h")).distinct()
      exactDedupWithin(input).withColumn("h", md5(col("text")))
        .join(corpusHashes, Seq("h"), "left_anti")
        .drop("h")
    }.withColumn("ws", TF.words(col("text"))) // tokenize once — see run()
      .localCheckpoint(true)
    val drops2 = {
        val incShaped = shapedOfWs(s1).localCheckpoint(true)
        // lazy: both consumers re-derive the cheap posexplode from the
        // sig frame bandsOf pins (saves one materialization per round)
        val incBands = bandsOf(incShaped)
        // increment×increment: keep-first exactly as in run()
        val candII = keepFirstCandidates(incBands)
        // increment×corpus: the increment's band keys are the small
        // side (the asymmetry the incremental loop exists to exploit);
        // corpus docs always win, so the increment doc is always d2.
        // The corpus shingle frame is the multi-consumer heavy side —
        // pinned once (≈ the persisted corpus LSH index).
        // Spread the (possibly one-file) corpus scan before the
        // shingle pass — no-op when it is already wide
        val corpusShaped = shapedOf(graft.util.Spread(corpusDocs))
          .localCheckpoint(true)
        // star again: per (increment doc, band) only the MINIMUM
        // corpus doc in the shared bucket verifies — ≤8 candidates per
        // increment doc regardless of corpus bucket sizes (an
        // increment doc has exactly one key per band, so grouping by
        // (d2, band) pins the bucket)
        val candIC = bandsOf(corpusShaped).as("c")
          .join(broadcast(incBands.as("i")),
            col("c.band") === col("i.band") &&
              col("c.key") === col("i.key"))
          .groupBy(col("i.doc_id").as("d2"), col("c.band"))
          .agg(min(col("c.doc_id")).as("d1"))
          .select(col("d1"), col("d2"))
          .distinct()
          .localCheckpoint(true) // 3 consumers below
        // verify both candidate sets with one shingle machinery;
        // corpus shingles enter ONLY for candidate docs
        val candCorpusIds = candIC.select(col("d1").as("doc_id"))
          .distinct()
        val corpusCandShaped = corpusShaped
          .join(candCorpusIds, Seq("doc_id"), "left_semi")
          .localCheckpoint(true) // shingles + counts both read it
        val sh = incShaped
          .select(col("doc_id"), explode(col("shs")).as("s"))
          .unionByName(corpusCandShaped
            .select(col("doc_id"), explode(col("shs")).as("s")))
        val cnt = incShaped
          .select(col("doc_id"), size(col("shs")).cast("long").as("n"))
          .unionByName(corpusCandShaped
            .select(col("doc_id"), size(col("shs")).cast("long").as("n")))
        val cand = candII.unionByName(candIC).distinct()
        verifiedDrops(cand, sh, cnt)
    } // lazy — single execution inside the funnel aggregation job
    flagsFunnel(s1, n0, drops2, benchmark, cfg)
  }

  // ------------------------------------------------ shared stage defs

  /** Stages 3-5 + the audit — identical in both entry points by
    * construction: ONE per-doc flags frame over the stage-1 survivors
    * and ONE aggregation for the whole funnel. The gate predicates are
    * the exact expressions the standalone queries run (q_length_gate /
    * q_repetition_filter / q_contamination_ngram); each is a pointwise
    * per-doc predicate, so conditional sums with cumulative ANDs
    * reproduce the sequential stage counts exactly. The rep/contam
    * subtrees only read docs passing the (pointwise, cheap) length
    * gate — a doc failing it never needs either flag, and at scale
    * this keeps the word/13-gram explodes off the short/long tail. */
  private def flagsFunnel(s1: DataFrame, n0: Long, drops2: DataFrame,
      benchmark: DataFrame, cfg: Config): (DataFrame, Seq[StageAudit]) = {
    val lenOk = size(col("ws")).between(cfg.minWords, cfg.maxWords)
    // top-word rate as ONE codegen'd expression over `ws` — the
    // explode → groupBy(doc, w) → groupBy(doc) formulation shuffles
    // |words| rows twice for a per-doc scalar; `top * 1000 DIV n` is
    // the exact integer arithmetic the standalone gate runs (DIV by
    // zero → NULL → coalesce(false), matching the inner join that
    // dropped wordless docs)
    val repOk = coalesce(
      expr(s"top_w * 1000 DIV n_w <= ${cfg.topWordPmMax}"), lit(false))
    val bench = grams13(benchmark, cfg).select("h").distinct()
    val contam = grams13Ws(s1.filter(lenOk), cfg)
      .join(broadcast(bench), Seq("h"), "left_semi")
      .select("doc_id").distinct()
      .select(col("doc_id"), lit(true).as("contam"))
    val flags = s1.select(col("doc_id"), lenOk.as("len_ok"),
        SignatureExprs.topWordCount(col("ws")).as("top_w"),
        size(col("ws")).cast("long").as("n_w"))
      .withColumn("rep_ok", repOk)
      .join(drops2.select(col("doc_id"), lit(true).as("drop2")),
        Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("drop2"), lit(false)).as("drop2"),
        col("len_ok"),
        col("rep_ok"),
        coalesce(col("contam"), lit(false)).as("contam"))
    val keepCond = !col("drop2") && col("len_ok") && col("rep_ok") &&
      !col("contam")
    def n(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val r = flags.agg(
      count(lit(1)).as("n1"),
      n(!col("drop2")).as("n2"),
      n(!col("drop2") && col("len_ok")).as("n3"),
      n(!col("drop2") && col("len_ok") && col("rep_ok")).as("n4"),
      n(keepCond).as("n5")).head()
    val counts = (0 until 5).map(r.getLong)
    val stageNames = Seq("exact_dedup", "near_dedup", "length_gate",
      "repetition_gate", "decontaminate")
    val audits = stageNames.zipWithIndex.map { case (name, i) =>
      StageAudit(i + 1, name, if (i == 0) n0 else counts(i - 1), counts(i))
    }
    // kept stays LAZY: the funnel's audit consumers never execute it,
    // and callers that do (spec / downstream writes) recompute only
    // the cheap flag joins from the checkpointed s1.
    val kept = s1.select("doc_id", "text")
      .join(flags.filter(keepCond).select("doc_id"),
        Seq("doc_id"), "left_semi")
    (kept, audits)
  }

  /** Keep the lowest doc_id per content hash (within one frame). */
  private def exactDedupWithin(d: DataFrame): DataFrame =
    d.withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")

  /** (doc_id, shs): distinct 3-shingles per doc with ≥ 3 words. */
  private[operators] def shapedOf(df: DataFrame): DataFrame =
    shapedOfWs(df.select(col("doc_id"), TF.words(col("text")).as("ws")))

  /** [[shapedOf]] over an already-tokenized frame (doc_id, …, ws). */
  private[operators] def shapedOfWs(df: DataFrame): DataFrame = df
    .filter(size(col("ws")) >= 3)
    .select(col("doc_id"), array_distinct(
      SignatureExprs.wordShingles(col("ws"), 3)).as("shs"))

  /** (doc_id, band, key) LSH rows. The signature frame is pinned
    * BEFORE banding — the banding HOF references `sig` once per band
    * and Catalyst does not hoist the common subexpression, so an
    * unmaterialized signature recomputes 8× (the measured 17× slowdown
    * documented at q_dedup_minhash_lsh). */
  private[operators] def bandsOf(shaped: DataFrame): DataFrame = {
    val sig = shaped.select(col("doc_id"),
        SignatureExprs.minhashSig(col("shs"), 32).as("sig"))
      .localCheckpoint(true)
    sig.withColumn("bands", TF.minhashBands("sig", 8, 4))
      .select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "key")))
  }

  /** Band rows → candidate pairs with STAR topology per (band, key)
    * bucket: every member links to the bucket MINIMUM, Σ(bucket−1)
    * edges. The clique formulation (all pairs, a.doc_id < b.doc_id)
    * is Σ bucket²/2 — measured catastrophic on a 100×-scaled corpus
    * whose duplicate clusters grow with the corpus (500k docs with
    * ~100-member clusters filled 79 GB of shuffle in the verify join
    * downstream; the star soaks the same corpus in seconds). Star is
    * sufficient for KEEP-LOWEST dedup when each bucket's minimum
    * belongs to the duplicate cluster: every other member then gets a
    * verify edge to it in each of the 8 bands, and the winner can
    * never be a `d2` of a smaller doc it doesn't share a bucket with.
    *
    * RECALL BOUND (documented, quantified in CurationPipelineSpec): a
    * true pair (dA, dB) is missed only if EVERY band bucket the two
    * share is "anchored" by a smaller FALSE-POSITIVE collider — a
    * non-duplicate d0 < dA landing in that same (band, key). Then the
    * star emits (d0,dA) and (d0,dB), both fail the Jaccard verify,
    * and no (dA,dB) edge exists. The probability is bounded by the
    * band false-positive rate to the power of the pair's shared-band
    * count: one band's non-dup collision is P ≈ J^rows (J < 0.5 ⇒
    * < 6.25% at rows = 4), and ALL shared bands must be anchored —
    * with the additional constraint that the collider's minhash
    * matches the bucket key exactly, which for J < 0.5 docs decays
    * geometrically. Empirically zero misses vs the clique on the test
    * corpus (spec asserts star ≡ clique drops there); an adversarial
    * synthetic bucket layout demonstrating the miss is pinned in the
    * same spec so the bound stays visible, not folklore.
    *
    * Both aggregate and join key on (band, key): one shuffle,
    * co-partitioned. */
  private[operators] def keepFirstCandidates(bands: DataFrame): DataFrame =
    // bucket minimum as a window over (band, key): ONE exchange, where
    // the groupBy-min + self-join pays the same exchange plus a join
    bands.withColumn("d1",
        min("doc_id").over(Window.partitionBy("band", "key")))
      .filter(col("doc_id") > col("d1"))
      .select(col("d1"), col("doc_id").as("d2"))
      .distinct()

  /** Exact-Jaccard verify over candidate pairs: returns the distinct
    * d2 (loser) ids whose pair clears J ≥ 0.5, as a (doc_id) frame. */
  private[operators] def verifiedDrops(cand: DataFrame, sh: DataFrame,
      cnt: DataFrame): DataFrame = {
    val inter = cand
      .join(sh.toDF("d1", "s"), "d1")
      .join(sh.toDF("d2", "s"), Seq("d2", "s"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.toDF("d1", "na"), "d1")
      .join(cnt.toDF("d2", "nb"), "d2")
      // J ≥ 0.5 ⇔ 2·inter ≥ union, all-integer
      .filter(col("inter") * 2 >= col("na") + col("nb") - col("inter"))
      .select(col("d2").as("doc_id")).distinct()
  }

  private def grams13(df: DataFrame, cfg: Config): DataFrame =
    grams13Ws(df.select(col("doc_id"),
      TF.words(col("text")).as("ws")), cfg)

  /** [[grams13]] over an already-tokenized frame (doc_id, …, ws). */
  private def grams13Ws(df: DataFrame, cfg: Config): DataFrame = df
    .filter(size(col("ws")) >= cfg.contamGram)
    .select(col("doc_id"), explode(array_distinct(
      SignatureExprs.wordShingles(col("ws"), cfg.contamGram))).as("g"))
    .select(col("doc_id"), expr(TF.hash60Sql("g")).as("h"))
}
