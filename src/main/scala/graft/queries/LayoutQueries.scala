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
      val withZ = li.crossJoin(broadcast(stats))
        .withColumn("qx", expr(
          "(l_partkey - pmin) * 65535 DIV greatest(pmax - pmin, 1)"))
        .withColumn("qy", expr(
          "(l_suppkey - smin) * 65535 DIV greatest(smax - smin, 1)"))
        .withColumn("file_z", shiftright(
          ZOrder.zvalue(col("qx"), col("qy")), 26).cast("int"))
      val ranked = GlobalRank.withNtile(withZ,
        Seq(col("l_partkey"), col("l_orderkey"), col("l_linenumber")),
        64, "file_p")
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

  val all: Seq[GraftQuery] = Seq(
    zorderLayout, zorderPrune, shardExport, dedupKeepBest,
    importanceWeight)
}
