package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{TextFunctions => TF, ZOrder}
import graft.operators.GlobalRank

/** Data-LAYOUT and corpus-CURATION follow-through operators: the steps a
  * 100 TB training-data pipeline runs after dedup/scoring — multi-column
  * layout clustering for data skipping, deterministic shard export,
  * cluster-representative selection, and target-distribution importance
  * weighting (DSIR-style). All integer/md5 arithmetic so the DuckDB
  * oracle replays every result exactly.
  */
object LayoutQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  // ------------------------------------------------------------ layout

  /** Z-order layout clustering (the public technique behind lakehouse
    * `OPTIMIZE ZORDER BY`): quantize two join/filter dimensions to the
    * 16-bit grid, interleave them into a Morton key
    * ([[graft.functions.ZValueExpr]], codegen'd), and bucket rows into
    * "files" by the key's high bits. The per-file report shows BOTH
    * dimensions' min/max bounded per file — the property single-column
    * sort cannot give — which is what lets a scan prune files on either
    * predicate. The min/max quantization bounds come from a 1-row
    * aggregate broadcast-joined back (no driver collect, one extra tiny
    * stage at any scale); file assignment is a pure column expression, so
    * the real write would be `repartitionByRange(zv)` + per-file stats,
    * shuffle-identical to any range write. */
  val zorderLayout = GraftQuery(
    "q_zorder_layout",
    "Z-order (Morton) file clustering with per-file dual-dim min/max",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val stats = li.agg(
        min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      val q = li.crossJoin(broadcast(stats))
        .withColumn("qx", expr(
          "(l_partkey - pmin) * 65535 DIV greatest(pmax - pmin, 1)"))
        .withColumn("qy", expr(
          "(l_suppkey - smin) * 65535 DIV greatest(smax - smin, 1)"))
        .withColumn("zv", ZOrder.zvalue(col("qx"), col("qy")))
        .withColumn("file_id", expr("CAST(zv >> 26 AS INT)"))
      q.groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
          min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
        .orderBy("file_id")
    },
    Some("""WITH s AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
           |             min(l_suppkey) AS smin, max(l_suppkey) AS smax
           |           FROM lineitem),
           |q AS (SELECT l_partkey, l_suppkey,
           |        (l_partkey - pmin) * 65535 // greatest(pmax - pmin, 1)
           |          AS qx,
           |        (l_suppkey - smin) * 65535 // greatest(smax - smin, 1)
           |          AS qy
           |      FROM lineitem CROSS JOIN s),
           |z AS (SELECT l_partkey, l_suppkey,
           |        CAST((SELECT SUM((((qx >> i) & 1) << (2*i)) +
           |                         (((qy >> i) & 1) << (2*i+1)))
           |              FROM generate_series(0, 15) t(i)) AS BIGINT) AS zv
           |      FROM q)
           |SELECT CAST(zv >> 26 AS INT) AS file_id, count(*) AS n_rows,
           |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
           |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The data-skipping payoff of [[zorderLayout]], quantified: for a
    * predicate on the SECOND dimension only (a ~10% suppkey band), count
    * how many of 64 files hold matching rows under (a) z-order layout
    * vs (b) the classic single-column (partkey) sort. The partkey sort
    * must touch every file for a suppkey predicate; the z-order layout
    * confines the band to the files sharing its interleaved suppkey
    * prefix bits — the measured difference IS the scan cost a 100 TB
    * reader avoids. Single aggregate pass over the filtered frame (both
    * distinct-file counts in one shuffle). */
  val zorderPrune = GraftQuery(
    "q_zorder_prune",
    "files touched for a 2nd-dim predicate: z-order vs single-col sort",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val stats = li.agg(
        min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      val withZ = li
        // Project to the 7 live columns BEFORE the range exchange: the
        // ntile shuffle otherwise moves every lineitem column.
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_suppkey")
        .crossJoin(broadcast(stats))
        .withColumn("qx", expr(
          "(l_partkey - pmin) * 65535 DIV greatest(pmax - pmin, 1)"))
        .withColumn("qy", expr(
          "(l_suppkey - smin) * 65535 DIV greatest(smax - smin, 1)"))
        .withColumn("file_z", shiftright(
          ZOrder.zvalue(col("qx"), col("qy")), 26).cast("int"))
        .drop("pmin", "pmax", "qx", "qy")
      val ranked = GlobalRank.withNtile(withZ,
        Seq(col("l_partkey"), col("l_orderkey"), col("l_linenumber")),
        64, "file_p",
        // Known total: a zero-column count over the base scan, instead of
        // counting the derived cross-join frame.
        total = li.count())
      ranked
        .filter(col("l_suppkey") >=
            expr("smin + (smax - smin) * 45 DIV 100") &&
          col("l_suppkey") <= expr("smin + (smax - smin) * 55 DIV 100"))
        .agg(countDistinct("file_z").as("files_zorder"),
          countDistinct("file_p").as("files_partkey_sort"),
          count(lit(1)).as("rows_matched"))
        .orderBy("files_zorder")
    },
    Some("""WITH s AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
           |             min(l_suppkey) AS smin, max(l_suppkey) AS smax
           |           FROM lineitem),
           |q AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           |        smin, smax,
           |        (l_partkey - pmin) * 65535 // greatest(pmax - pmin, 1)
           |          AS qx,
           |        (l_suppkey - smin) * 65535 // greatest(smax - smin, 1)
           |          AS qy
           |      FROM lineitem CROSS JOIN s),
           |z AS (SELECT *,
           |        CAST((SELECT SUM((((qx >> i) & 1) << (2*i)) +
           |                         (((qy >> i) & 1) << (2*i+1)))
           |              FROM generate_series(0, 15) t(i)) AS BIGINT)
           |          AS zv
           |      FROM q),
           |r AS (SELECT *, CAST(zv >> 26 AS INT) AS file_z,
           |        ntile(64) OVER (ORDER BY l_partkey, l_orderkey,
           |          l_linenumber) AS file_p
           |      FROM z)
           |SELECT count(DISTINCT file_z) AS files_zorder,
           |  count(DISTINCT file_p) AS files_partkey_sort,
           |  count(*) AS rows_matched
           |FROM r
           |WHERE l_suppkey >= smin + (smax - smin) * 45 // 100
           |  AND l_suppkey <= smin + (smax - smin) * 55 // 100
           |ORDER BY files_zorder""".stripMargin))

  // ------------------------------------------------------- shard export

  /** Deterministic seeded shuffle + shard manifest — the training-export
    * step: every run (and every engine) assigns the identical doc→shard
    * mapping from the seed alone. Order key is md5(seed || doc_id) (a
    * portable keyed hash); shard assignment is SQL-standard NTILE over
    * that order, computed distributed via [[GlobalRank.withNtile]]
    * (range-exchange + per-partition offsets — no single-partition
    * window, so the global shuffle order scales to any corpus). The
    * manifest row per shard (count, payload bytes, hash range) is what an
    * export job writes alongside each shard for resumability/audit. */
  val shardExport = GraftQuery(
    "q_shard_export",
    "seeded deterministic shard assignment + per-shard manifest",
    (s, dir) => {
      val h = docs(s, dir).select(col("doc_id"), col("n_chars"),
        md5(concat(lit("shard42:"), col("doc_id").cast("string")))
          .as("hk"))
      GlobalRank.withNtile(h, Seq(col("hk"), col("doc_id")), 16,
          "shard_id")
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          min("hk").as("min_hash"), max("hk").as("max_hash"))
        .orderBy("shard_id")
    },
    Some("""WITH h AS (SELECT doc_id, n_chars,
           |             md5('shard42:' || doc_id) AS hk FROM documents),
           |r AS (SELECT *, ntile(16) OVER (ORDER BY hk, doc_id)
           |        AS shard_id FROM h)
           |SELECT shard_id, count(*) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
           |  min(hk) AS min_hash, max(hk) AS max_hash
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin))

  // --------------------------------------------- cluster representative

  /** Near-dup cluster RESOLUTION — the keep/drop decision after
    * clustering: within every connected component of the simhash pair
    * graph keep the best document (longest, ties to the lowest id);
    * singletons keep themselves. This is the actual filter a corpus
    * dedup applies — q_dedup_cluster's labels say what collapses
    * together, this says which row survives. One extra window over the
    * cluster key (partitioned — never global) on top of the CC labels. */
  val dedupKeepBest = GraftQuery(
    "q_dedup_keep_best",
    "per-cluster representative selection (keep longest, tie → min id)",
    (s, dir) => {
      val lab = graft.operators.ConnectedComponents
        .minLabel(PipelineQueries.simhashPairs(s, dir), "d1", "d2")
        .withColumnRenamed("node", "doc_id")
      val ad = docs(s, dir).select("doc_id", "n_chars")
        .join(lab, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"),
          col("doc_id")))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      ad.withColumn("keep", row_number().over(w) === 1)
        .select("doc_id", "cluster_id", "keep")
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE ${PipelineQueries.duckSimhashPairs},
            |e AS (SELECT d1 AS a, d2 AS b FROM pairs
            |      UNION ALL SELECT d2, d1 FROM pairs),
            |cc(node, lbl) AS (
            |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
            |  UNION
            |  SELECT e.b, cc.lbl FROM cc JOIN e ON e.a = cc.node
            |  WHERE cc.lbl < e.b
            |),
            |lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id
            |        FROM cc GROUP BY 1),
            |ad AS (SELECT d.doc_id, d.n_chars,
            |         COALESCE(l.cluster_id, d.doc_id) AS cluster_id
            |       FROM documents d LEFT JOIN lab l ON l.doc_id = d.doc_id)
            |SELECT doc_id, cluster_id,
            |  (row_number() OVER (PARTITION BY cluster_id
            |     ORDER BY n_chars DESC, doc_id) = 1) AS keep
            |FROM ad ORDER BY doc_id""".stripMargin))

  // ------------------------------------------------ importance weighting

  /** Target-distribution importance weighting (the DSIR shape — Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every document by how much its tokens look like
    * a TARGET subcorpus (here lang='en') relative to the raw corpus.
    * Per-feature weight = target_count·10⁶ ÷ raw_count in integer
    * arithmetic (a monotone proxy for the log-likelihood ratio that both
    * engines compute exactly); doc score = Σ over token occurrences.
    *
    * Shuffle shape at scale: one explode→hash-agg for raw counts, one
    * for target counts, then the per-token scoring join. The weight
    * table is vocabulary-sized — in production DSIR hashes features into
    * a FIXED bucket space (2²⁰), which bounds the table at any corpus
    * size and is what makes the broadcast here the scale answer, not a
    * small-data shortcut. */
  val importanceWeight = GraftQuery(
    "q_importance_weight",
    "DSIR-style importance score vs an in-corpus target distribution",
    (s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(TF.words(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .localCheckpoint(true) // 3 consumers; one tokenize pass
      val raw = tok.groupBy("w").agg(count(lit(1)).as("r"))
      val tgt = tok.filter(col("lang") === "en")
        .groupBy("w").agg(count(lit(1)).as("t"))
      val wt = raw.join(tgt, Seq("w"), "left")
        .select(col("w"), expr("coalesce(t, 0) * 1000000 DIV r").as("wt"))
      val sc = tok.join(broadcast(wt), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("wt").as("score"))
      docs(s, dir).select("doc_id")
        .join(sc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("score"), lit(0L)).as("score"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, lang,
           |               unnest(string_split(text, ' ')) AS w
           |             FROM documents),
           |t2 AS (SELECT doc_id, lang, w FROM tok WHERE w <> ''),
           |raw AS (SELECT w, count(*) AS r FROM t2 GROUP BY 1),
           |tgt AS (SELECT w, count(*) AS t FROM t2
           |        WHERE lang = 'en' GROUP BY 1),
           |wt AS (SELECT raw.w, COALESCE(t, 0) * 1000000 // r AS wt
           |       FROM raw LEFT JOIN tgt ON raw.w = tgt.w),
           |sc AS (SELECT doc_id, count(*) AS n_tokens,
           |         CAST(SUM(wt) AS BIGINT) AS score
           |       FROM t2 JOIN wt ON t2.w = wt.w GROUP BY 1)
           |SELECT d.doc_id, COALESCE(sc.n_tokens, 0) AS n_tokens,
           |  COALESCE(sc.score, 0) AS score
           |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin))

  // ------------------------------------------------- bloom file skipping

  /** Split-block Bloom file-skipping index — the data-skipping tool for
    * POINT lookups on a column the file layout is NOT sorted by (parquet
    * column indexes and lakehouse bloom indexes are this exact
    * structure). Files are laid out by insertion order (orderkey
    * ranges), so per-file min/max on partkey prunes nothing for a
    * partkey lookup; a tiny per-file Bloom filter does. Per file: a
    * 4032-bit filter as 64×63-bit words (63-bit words keep every mask
    * positive — no sign-bit cases in either engine), built by one
    * bit_or hash-aggregation; k=2 multiply-mod hashes, all arithmetic
    * in BIGINT range at any SF.
    *
    * The query measures the payoff for a deterministic batch of point
    * keys (p_partkey ≡ 5 mod 211): per key, the files actually holding
    * it, the files a Bloom-index scan must touch (no false negatives —
    * files_bloom ≥ files_true always), and the files a min/max-only
    * scan touches (≈ all of them, the point of the comparison).
    *
    * At scale the index is tiny (64 words × 8 B per file per column =
    * 0.5 KB regardless of file size) and builds map-side: bit_or is
    * partial-aggregatable, so the shuffle carries ≤ 4096 rows per
    * file however many rows the file has. Lookups never touch data:
    * key×index joins are broadcasts of the word-indexed mask table. */
  val bloomPrune = GraftQuery(
    "q_bloom_prune",
    "per-file split-block Bloom index: files touched vs min/max scan",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
      // Bounded driver-side scalar (one max), NOT a crossJoin subquery:
      // three consumers re-derive the row frame below, and each would
      // re-run the max job. Re-scanning the 2-column pushed-down
      // projection per consumer is the scalable choice (pinning the
      // frame would hold O(corpus) blocks); re-running the max is not.
      // (max over zero rows is NULL → 0, an empty table stays empty)
      val mokRow = li.agg(max("l_orderkey")).head()
      val mok = if (mokRow.isNullAt(0)) 0L else mokRow.getLong(0)
      val rows = li
        .select(expr(s"CAST((l_orderkey * 64) DIV (${mok} + 1) AS INT)")
          .as("file_id"), col("l_partkey").as("pk"))
      val bloom = rows
        .withColumn("h1", expr("(pk * 2654435761 + 97) % 4032"))
        .withColumn("h2", expr("(pk * 1540483477 + 311) % 4032"))
        .select(col("file_id"), explode(array(col("h1"), col("h2")))
          .as("h"))
        .groupBy(col("file_id"), expr("h DIV 63").as("word_idx"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), " +
          "CAST(h % 63 AS INT)))").as("mask"))
        // pin the INDEX, not the data: ≤ 64 words × |files| rows
        // regardless of corpus size, and both hash probes (m1, m2)
        // consume it — without the pin each broadcast re-built the
        // index from its own full scan of the row frame
        .localCheckpoint(true)
      val keys = Tables(s, dir, "part")
        .filter("p_partkey % 211 = 5")
        .select(col("p_partkey").as("k"))
        .withColumn("h1", expr("(k * 2654435761 + 97) % 4032"))
        .withColumn("h2", expr("(k * 1540483477 + 311) % 4032"))
      // both probes through ONE broadcast join: a (key, file) pair is a
      // bloom hit iff BOTH probe bits are set — each exploded probe row
      // matches exactly one word per file (word_idx is unique per
      // file), so count == 2 ⇔ the old m1 ⋈ m2 inner join (one
      // broadcast build + one aggregation instead of two builds + a
      // pair join)
      val bloomCnt = keys
        .select(col("k"), explode(array(col("h1"), col("h2"))).as("h"))
        .join(broadcast(bloom), col("word_idx") === expr("h DIV 63"))
        .where(expr("(shiftright(mask, CAST(h % 63 AS INT)) & 1) = 1"))
        .groupBy("k", "file_id").agg(count(lit(1)).as("hits"))
        .filter(col("hits") === 2)
        .groupBy("k").agg(count(lit(1)).as("files_bloom"))
      val trueCnt = rows.join(broadcast(keys.select("k")),
          col("pk") === col("k"))
        .groupBy("k").agg(countDistinct("file_id").as("files_true"))
      val st = rows.groupBy("file_id")
        .agg(min("pk").as("mn"), max("pk").as("mxp"))
        // |files| rows, two consumers (min/max join + total count)
        .localCheckpoint(true)
      val mmCnt = keys.select("k").join(broadcast(st),
          col("k") >= col("mn") && col("k") <= col("mxp"))
        .groupBy("k").agg(count(lit(1)).as("files_minmax"))
      // distinct file_ids == the per-file stats rows — count those 64
      // instead of a fourth distinct pass over the row frame
      val tot = st.agg(count(lit(1)).as("total_files"))
      keys.select("k")
        .join(trueCnt, Seq("k"), "left")
        .join(bloomCnt, Seq("k"), "left")
        .join(mmCnt, Seq("k"), "left")
        .crossJoin(broadcast(tot))
        .select(col("k").as("partkey"),
          coalesce(col("files_true"), lit(0L)).as("files_true"),
          coalesce(col("files_bloom"), lit(0L)).as("files_bloom"),
          coalesce(col("files_minmax"), lit(0L)).as("files_minmax"),
          col("total_files"))
        .orderBy("partkey")
    },
    Some("""WITH mx AS (SELECT max(l_orderkey) AS mok FROM lineitem),
           |rows_ AS (SELECT CAST((l_orderkey * 64) // (mok + 1) AS INT)
           |            AS file_id, l_partkey AS pk
           |          FROM lineitem CROSS JOIN mx),
           |hs AS (SELECT file_id, pk,
           |         (pk * 2654435761 + 97) % 4032 AS h1,
           |         (pk * 1540483477 + 311) % 4032 AS h2 FROM rows_),
           |bloom AS (
           |  SELECT file_id, h // 63 AS word_idx,
           |    CAST(bit_or(1::BIGINT << CAST(h % 63 AS INT)) AS BIGINT)
           |      AS mask
           |  FROM (SELECT file_id, h1 AS h FROM hs
           |        UNION ALL SELECT file_id, h2 FROM hs)
           |  GROUP BY 1, 2),
           |keys AS (SELECT p_partkey AS k,
           |           (p_partkey * 2654435761 + 97) % 4032 AS h1,
           |           (p_partkey * 1540483477 + 311) % 4032 AS h2
           |         FROM part WHERE p_partkey % 211 = 5),
           |m1 AS (SELECT k, file_id FROM keys JOIN bloom
           |         ON word_idx = h1 // 63
           |       WHERE ((mask >> CAST(h1 % 63 AS INT)) & 1) = 1),
           |m2 AS (SELECT k, file_id FROM keys JOIN bloom
           |         ON word_idx = h2 // 63
           |       WHERE ((mask >> CAST(h2 % 63 AS INT)) & 1) = 1),
           |bl AS (SELECT k, count(*) AS files_bloom
           |       FROM m1 JOIN m2 USING (k, file_id) GROUP BY 1),
           |tru AS (SELECT k, count(DISTINCT file_id) AS files_true
           |        FROM keys JOIN rows_ ON pk = k GROUP BY 1),
           |st AS (SELECT file_id, min(pk) AS mn, max(pk) AS mxp
           |       FROM rows_ GROUP BY 1),
           |mm AS (SELECT k, count(*) AS files_minmax
           |       FROM keys JOIN st ON k >= mn AND k <= mxp GROUP BY 1),
           |tot AS (SELECT count(DISTINCT file_id) AS total_files
           |        FROM rows_)
           |SELECT k AS partkey,
           |  COALESCE(files_true, 0) AS files_true,
           |  COALESCE(files_bloom, 0) AS files_bloom,
           |  COALESCE(files_minmax, 0) AS files_minmax,
           |  total_files
           |FROM keys LEFT JOIN tru USING (k) LEFT JOIN bl USING (k)
           |  LEFT JOIN mm USING (k) CROSS JOIN tot
           |ORDER BY 1""".stripMargin))

  /** Per-SOURCE contribution caps — the anti-flood curation rule every
    * crawl pipeline applies (a single domain/dump must not dominate the
    * mix): keep the best K documents per source (longest as the quality
    * proxy, ties to the lowest id), drop the rest. The rank-≤-K filter
    * compiles to WindowGroupLimit: each map task forwards at most K rows
    * per source BEFORE the window shuffle, so the exchange carries
    * O(sources·K) rows per task, not the corpus — the property that
    * makes a per-domain cap feasible over 100 TB (plan asserted in
    * PlanSpec). */
  val sourceCap = GraftQuery(
    "q_source_cap",
    "per-source quota: keep the best 5 docs per source",
    (s, dir) => {
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      docs(s, dir).select("doc_id", "source", "n_chars")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .orderBy("source", "rnk")
    },
    Some("""SELECT doc_id, source, n_chars, rnk FROM (
           |  SELECT doc_id, source, n_chars,
           |    row_number() OVER (PARTITION BY source
           |      ORDER BY n_chars DESC, doc_id) AS rnk
           |  FROM documents)
           |WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin))

  val all: Seq[GraftQuery] = Seq(
    zorderLayout, zorderPrune, shardExport, dedupKeepBest,
    importanceWeight, bloomPrune, sourceCap)
}
