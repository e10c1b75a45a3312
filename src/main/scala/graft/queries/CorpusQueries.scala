package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Corpus-preparation operators beyond the dedup/ANN families:
  * winnowing fingerprints (the MOSS document-fingerprinting algorithm),
  * fingerprint-overlap near-dup pairs, sliding-window token chunking
  * (the RAG/embedding ingestion shape), and a mergeable Misra–Gries
  * frequency sketch with its guarantee verified against exact counts.
  *
  * All hashing lives in the engine-portable 60-bit md5 domain
  * ([[TF.hash60Sql]]) so every DuckDB oracle replays bit-identically.
  */
object CorpusQueries {

  /** Winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003): hash every
    * word trigram, slide a window of w=4 consecutive hashes, and select
    * each window's minimum (leftmost position on ties). The selected
    * (position, hash) set is the document's fingerprint — guaranteed to
    * catch any shared substring of >= k+w-1 = 6 words, at an expected
    * density of 2/(w+1) of all trigrams.
    *
    * Relational formulation: the window minima come from one partitioned
    * window function ([[TokenStats.winnow]]); recovering the minimum's
    * POSITION (a per-window argmin with a deterministic tie-break, which
    * no single portable window aggregate expresses) is an equi-join of
    * windows back to the gram frame on (doc_id, hash) — the position
    * list per (doc, hash) is tiny, so the join is a hash join keyed on
    * values that exist only inside one document. Per doc the plan is
    * one shuffle + one join: at 100 TB nothing global, no skew (hash
    * keys are near-unique).
    *
    * Output: per-doc fingerprint count, window count, and the density
    * guarantee verdict (selected fingerprints can never number fewer
    * than windows/w, since one selection persists at most w windows).
    * Docs with fewer than 6 words have no full window and are absent —
    * both engines agree. */
  val winnowing = GraftQuery(
    "q_winnowing",
    "winnowing fingerprints (k=3-word grams, w=4 windows, density check)",
    (s, dir) => {
      val w = TokenStats.winnow(s, dir)
      val sel = w.wf.as("w")
        .join(w.grams.as("g").hint("shuffle_hash"),
          col("g.doc_id") === col("w.doc_id") &&
            col("g.h") === col("w.mn") &&
            col("g.pos").between(col("w.p") - 3, col("w.p")))
        .groupBy(col("w.doc_id").as("doc_id"), col("w.p").as("p"),
          col("w.mn").as("fp"))
        .agg(min(col("g.pos")).as("sel_pos"))
      val fps = sel.select("doc_id", "sel_pos", "fp").distinct()
      val nfp = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
      val nw = w.wf.groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"))
      nfp.join(nw, "doc_id")
        .select(col("doc_id"), col("n_fp"), col("n_windows"),
          when(col("n_fp") * 4 >= col("n_windows"), 1).otherwise(0)
            .as("density_ok"))
        .orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
            |            FROM documents),
            |g AS (SELECT doc_id,
            |        unnest(generate_series(1, len(ws) - 2)) AS pos, ws
            |      FROM d WHERE len(ws) >= 3),
            |h AS (SELECT doc_id, pos,
            |        ${TF.hash60DuckSql(
               "ws[pos] || ' ' || ws[pos+1] || ' ' || ws[pos+2]")} AS h
            |      FROM g),
            |w AS (SELECT doc_id, pos AS p,
            |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
            |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn
            |      FROM h),
            |wf AS (SELECT * FROM w WHERE p >= 4),
            |sel AS (SELECT wf.doc_id, wf.p, wf.mn AS fp,
            |          min(h.pos) AS sel_pos
            |        FROM wf JOIN h ON h.doc_id = wf.doc_id
            |          AND h.h = wf.mn
            |          AND h.pos BETWEEN wf.p - 3 AND wf.p
            |        GROUP BY 1, 2, 3),
            |fps AS (SELECT DISTINCT doc_id, sel_pos, fp FROM sel),
            |nfp AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY 1),
            |nw AS (SELECT doc_id, count(*) AS n_windows FROM wf
            |       GROUP BY 1)
            |SELECT doc_id, n_fp, n_windows,
            |  CASE WHEN n_fp * 4 >= n_windows THEN 1 ELSE 0 END
            |    AS density_ok
            |FROM nfp JOIN nw USING (doc_id)
            |ORDER BY doc_id""".stripMargin))

  /** Near-duplicate pairs by winnowing-fingerprint overlap — the MOSS
    * matching step: two documents sharing >= 8 distinct selected hashes
    * share substantial text (each shared fingerprint witnesses a shared
    * 3-word gram that survived both documents' winnows). Inverted-index
    * self-join on the fingerprint value — candidate generation is
    * Σ(posting²) over fingerprints, never corpus², the same banding
    * discipline as the MinHash/SimHash gates. Hash distinct values per
    * doc first, so the join ships one row per (doc, fp). */
  val dedupWinnowing = GraftQuery(
    "q_dedup_winnowing",
    "near-dup pairs by shared winnowing fingerprints (MOSS matching)",
    (s, dir) => {
      val fpd = TokenStats.winnow(s, dir).wf
        .select(col("doc_id"), col("mn").as("fp")).distinct()
      // shuffle_hash: posting lists are tiny and near-unique — a
      // broadcast would ship the whole fingerprint table per task, and
      // sort-merge would pay two 60-bit sorts for nothing.
      fpd.as("a")
        .join(fpd.as("b").hint("shuffle_hash"),
          col("a.fp") === col("b.fp") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 8)
        .orderBy("d1", "d2")
    },
    Some(s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
            |            FROM documents),
            |g AS (SELECT doc_id,
            |        unnest(generate_series(1, len(ws) - 2)) AS pos, ws
            |      FROM d WHERE len(ws) >= 3),
            |h AS (SELECT doc_id, pos,
            |        ${TF.hash60DuckSql(
               "ws[pos] || ' ' || ws[pos+1] || ' ' || ws[pos+2]")} AS h
            |      FROM g),
            |w AS (SELECT doc_id, pos AS p,
            |        min(h) OVER (PARTITION BY doc_id ORDER BY pos
            |          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn
            |      FROM h),
            |fpd AS (SELECT DISTINCT doc_id, mn AS fp FROM w
            |        WHERE p >= 4)
            |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
            |FROM fpd a JOIN fpd b
            |  ON a.fp = b.fp AND a.doc_id < b.doc_id
            |GROUP BY 1, 2 HAVING count(*) >= 8
            |ORDER BY 1, 2""".stripMargin))

  /** Sliding-window token chunking — the retrieval/embedding ingestion
    * shape (chunk size 32 tokens, stride 24, so consecutive chunks
    * overlap by 8). Pure per-row array arithmetic: explode the chunk
    * starts, slice the token array, fingerprint the chunk text — zero
    * shuffle before the final presentation sort, so the operator is
    * embarrassingly parallel at any corpus size. The md5 column is the
    * chunk's content address (what a downstream embedding cache or
    * chunk-level dedup keys on). */
  val ragChunks = GraftQuery(
    "q_rag_chunks",
    "sliding-window token chunking (size 32 / stride 24, content md5)",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"), TF.words(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0), expr("(size(ws) - 1) DIV 24")))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * 24 + 1).as("start_tok"),
        expr("slice(ws, chunk_id * 24 + 1, 32)").as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("chunk")).as("n_tok"),
        md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id"),
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
           |            FROM documents),
           |c AS (SELECT doc_id,
           |        unnest(generate_series(0, (len(ws) - 1) // 24))
           |          AS chunk_id, ws
           |      FROM d)
           |SELECT doc_id, chunk_id, chunk_id * 24 + 1 AS start_tok,
           |  len(list_slice(ws, chunk_id * 24 + 1, chunk_id * 24 + 32))
           |    AS n_tok,
           |  md5(array_to_string(
           |    list_slice(ws, chunk_id * 24 + 1, chunk_id * 24 + 32),
           |    ' ')) AS chunk_md5
           |FROM c ORDER BY doc_id, chunk_id""".stripMargin))

  // ------------------------------------------------ frequency sketching

  /** One Misra–Gries summary: at most k counters; every increment of an
    * untracked item past capacity decrements the whole summary (the
    * classic algorithm), and two summaries merge by adding counters and
    * re-trimming to the k largest minus the (k+1)-th value — the
    * mergeable-summaries construction (Agarwal et al., PODS 2012),
    * which preserves the deterministic guarantee: estimates never
    * exceed true counts, undercount at most N/(k+1), and any item with
    * true count > N/(k+1) is retained. */
  private[queries] def mgTrim(
      m: scala.collection.mutable.Map[String, Long], k: Int): Unit =
    if (m.size > k) {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      for ((w, c) <- m.toSeq) {
        val nc = c - cut
        if (nc <= 0) m -= w else m(w) = nc
      }
    }

  /** Distributed Misra–Gries over weighted items — the treeAggregate
    * shape: per-partition summaries (fixed k memory), merged pairwise
    * on the tree. Zero shuffle; the driver receives k counters however
    * large the corpus. */
  private[queries] def misraGries(
      items: org.apache.spark.rdd.RDD[(String, Long)],
      k: Int): Map[String, Long] = {
    val zero = scala.collection.mutable.Map.empty[String, Long]
    items.treeAggregate(zero)(
      seqOp = (m, it) => {
        m(it._1) = m.getOrElse(it._1, 0L) + it._2
        mgTrim(m, k); m
      },
      combOp = (a, b) => {
        for ((w, c) <- b) a(w) = a.getOrElse(w, 0L) + c
        mgTrim(a, k); a
      }).toMap
  }

  /** Misra–Gries heavy hitters with the guarantee VERIFIED against
    * exact counts. Sketch contents depend on merge order, so (like the
    * HLL/quantile queries) the portable output is the THEOREM verdict,
    * which holds under any merge order: `hh_ok` — an item absent from
    * the summary has true count <= N/(k+1) (no heavy hitter is ever
    * lost); `err_ok` — a retained item's estimate is within
    * [wc - N/(k+1), wc]. Both checks in exact integer form
    * (multiply by k+1, never divide). k=4 against a ~31-word corpus
    * vocabulary, so the sketch is genuinely lossy here. At 100 TB this
    * is the frequency path that never shuffles: partition summaries
    * merge on a tree and a dashboard reads k counters. */
  val heavyHitters = GraftQuery(
    "q_heavy_hitters",
    "Misra-Gries heavy-hitter sketch, theorem-checked vs exact counts",
    (s, dir) => {
      import s.implicits._
      val k = 4
      val u = TokenStats.unigrams(s, dir)
      val sketch = misraGries(
        u.tf.select(col("w"), col("tf").cast("long"))
          .as[(String, Long)].rdd, k)
      val est = sketch.toSeq match {
        case Nil => Seq(("", -1L)) // degenerate: empty summary
        case xs => xs
      }
      val estDf = est.toDF("w", "est")
      u.stats.join(estDf, Seq("w"), "left")
        .select(col("w"), col("wc"),
          when(col("est").isNull,
            when(col("wc") * (k + 1) <= u.total, 1).otherwise(0))
            .otherwise(1).as("hh_ok"),
          when(col("est").isNull, 1)
            .otherwise(when(col("est") <= col("wc") &&
              (col("wc") - col("est")) * (k + 1) <= u.total, 1)
              .otherwise(0)).as("err_ok"))
        .orderBy(col("wc").desc, col("w"))
    },
    Some("""SELECT w, wc, 1 AS hh_ok, 1 AS err_ok
           |FROM (SELECT w, count(*) AS wc
           |      FROM (SELECT unnest(string_split(text, ' ')) AS w
           |            FROM documents)
           |      GROUP BY 1)
           |ORDER BY wc DESC, w""".stripMargin))

  /** Per-document keyword extraction — top-3 terms by an integer-exact
    * TF-IDF: term weight = dense rank of the vocabulary by DESCENDING
    * corpus frequency (rarer term, larger weight; ties share a rank so
    * the blend is deterministic), score = tf × weight. The vocabulary
    * rank is a window over the corpus word-stats table — the compact
    * (Zipf) side, shared with the rarity/perplexity queries through
    * [[TokenStats]]; the per-doc top-3 is a rank-limited window
    * (WindowGroupLimit ships ≤3 rows per doc before the shuffle). At
    * 100 TB the vocab rank would go through the range-partitioned
    * [[graft.operators.GlobalRank]] instead of a single-partition
    * window; the doc side is unchanged. */
  val tfidfTerms = GraftQuery(
    "q_tfidf_terms",
    "top-3 TF-IDF keywords per document (integer-exact rank weights)",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val u = TokenStats.unigrams(s, dir)
      val weights = u.stats.withColumn("weight",
        dense_rank().over(Window.orderBy(col("wc").desc)))
      val byDoc = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("w"))
      u.tf.join(weights, "w")
        .select(col("doc_id"), col("w"), col("tf"),
          (col("tf") * col("weight")).as("score"))
        .withColumn("rk", row_number().over(byDoc))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("w"), col("tf"),
          col("score"))
        .orderBy("doc_id", "rk")
    },
    Some("""WITH tf AS (SELECT doc_id, w, count(*) AS tf
           |            FROM (SELECT doc_id,
           |                    unnest(string_split(text, ' ')) AS w
           |                  FROM documents)
           |            GROUP BY 1, 2),
           |st AS (SELECT w, sum(tf) AS wc FROM tf GROUP BY 1),
           |wt AS (SELECT w,
           |         dense_rank() OVER (ORDER BY wc DESC) AS weight
           |       FROM st),
           |sc AS (SELECT tf.doc_id, tf.w, tf.tf,
           |         tf.tf * wt.weight AS score,
           |         row_number() OVER (PARTITION BY tf.doc_id
           |           ORDER BY tf.tf * wt.weight DESC, tf.w) AS rk
           |       FROM tf JOIN wt ON tf.w = wt.w)
           |SELECT doc_id, rk, w, tf, score FROM sc
           |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin))

  /** Tokenizer fertility audit per language — the table you read before
    * committing a tokenizer to a multilingual corpus: how many
    * subword-ish tokens the pre-tokenizer yields per whitespace word
    * (fertility) and how many characters ride in each token, per
    * declared language. High fertility on one language means its text
    * costs disproportionate sequence length — the signal that drives
    * per-language mixing and tokenizer retraining decisions. Pure
    * map-side column math + a |langs|-row aggregate; integer per-mille
    * ratios so both engines agree exactly. */
  val tokenizerFertility = GraftQuery(
    "q_tokenizer_fertility",
    "per-language tokenizer fertility + chars-per-token audit",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("lang"),
        size(TF.words(col("text"))).cast("long").as("ws"),
        TF.regexTokenCount(col("text")).cast("long").as("re"),
        length(col("text")).cast("long").as("chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("ws_tokens"), sum("re").as("re_tokens"),
        sum("chars").as("n_chars"))
      .withColumn("fert_pm",
        expr("re_tokens * 1000 DIV ws_tokens"))
      // per regex TOKEN, not per word (greatest-guard: a language whose
      // script the [a-z]+ pre-tokenizer cannot segment yields 0 tokens)
      .withColumn("chars_per_tok_x100",
        expr("n_chars * 100 DIV greatest(re_tokens, 1)"))
      .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
           |  CAST(sum(re) AS BIGINT) AS re_tokens,
           |  CAST(sum(chars) AS BIGINT) AS n_chars,
           |  CAST(sum(re) AS BIGINT) * 1000 //
           |    CAST(sum(ws) AS BIGINT) AS fert_pm,
           |  CAST(sum(chars) AS BIGINT) * 100 //
           |    greatest(CAST(sum(re) AS BIGINT), 1)
           |    AS chars_per_tok_x100
           |FROM (SELECT lang,
           |        CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
           |        CAST(len(regexp_extract_all(text, '[a-z]+'))
           |          AS BIGINT) AS re,
           |        CAST(length(text) AS BIGINT) AS chars
           |      FROM documents)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Duplicate-cluster size distribution — the one-line audit of how a
    * corpus duplicates (RefinedWeb/FineWeb publish exactly this table):
    * most clusters must be singletons; a fat tail of large clusters
    * means boilerplate or a crawler loop. Two hash aggregates (content
    * hash → copies, copies → cluster count), each with map-side
    * partials; the second input is one row per DISTINCT document, so
    * the histogram costs nothing at any scale. */
  val dedupClusterSizes = GraftQuery(
    "q_dedup_cluster_sizes",
    "duplicate-cluster size histogram from exact content hashing",
    (s, dir) => Tables(s, dir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("copies"))
      .groupBy("copies")
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", expr("copies * n_clusters"))
      .orderBy("copies"),
    Some("""SELECT copies, count(*) AS n_clusters,
           |  copies * count(*) AS n_docs
           |FROM (SELECT md5(text) AS h, count(*) AS copies
           |      FROM documents GROUP BY 1)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Corpus novelty curve — per ingestion batch (doc_id blocks standing
    * in for crawl increments), what fraction of the batch's distinct
    * 3-grams was never seen in any EARLIER batch? A fresh crawl runs
    * near 1000‰ and decays as the corpus saturates; a collapsed novelty
    * rate is the operational signal to stop paying for a source (the
    * staleness audit next to the dedup rate). Relational formulation:
    * first-occurrence batch per gram = one min-aggregate over the
    * exploded distinct (gram, batch) pairs; novelty = grams whose first
    * batch is this batch / grams present in this batch. One explode +
    * two hash aggregates — the linear n-gram discipline every corpus op
    * here follows, no window over history. */
  val ngramNovelty = GraftQuery(
    "q_ngram_novelty",
    "per-batch distinct-3-gram novelty rate (corpus staleness audit)",
    (s, dir) => {
      val grams = Tables(s, dir, "documents")
        .select(expr("doc_id DIV 100").as("batch"),
          explode(graft.functions.SignatureExprs.wordShingles(
            TF.words(col("text")), 3)).as("g"))
        .distinct()
      val first = grams.groupBy("g").agg(min("batch").as("first_batch"))
      grams.join(first, "g")
        .groupBy("batch")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_batch") === col("batch"), 1L)
            .otherwise(0L)).as("n_new"))
        .withColumn("novelty_pm", expr("n_new * 1000 DIV n_grams"))
        .orderBy("batch")
    },
    Some("""WITH grams AS (
           |  SELECT DISTINCT doc_id // 100 AS batch, g
           |  FROM (SELECT doc_id, unnest(list_transform(
           |          generate_series(1, len(ws) - 2),
           |          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
           |          AS g
           |        FROM (SELECT doc_id, string_split(text, ' ') AS ws
           |              FROM documents))),
           |fst AS (SELECT g, min(batch) AS first_batch
           |        FROM grams GROUP BY 1)
           |SELECT batch, count(*) AS n_grams,
           |  CAST(sum(CASE WHEN first_batch = batch THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_new,
           |  CAST(sum(CASE WHEN first_batch = batch THEN 1 ELSE 0 END)
           |    AS BIGINT) * 1000 // count(*) AS novelty_pm
           |FROM grams JOIN fst USING (g)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    winnowing, dedupWinnowing, ragChunks, heavyHitters, tfidfTerms,
    tokenizerFertility, dedupClusterSizes, ngramNovelty)
}
