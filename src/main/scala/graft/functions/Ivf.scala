package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to hyperplane LSH: partition the vector space into k
  * centroids (Lloyd's iterations), assign every vector to its nearest
  * centroid, and search only the `nProbe` centroids closest to the query.
  *
  * All index arithmetic is INTEGER over quantized vectors
  * (floor(x·1024), [[Similarity.quantize]]): integer sums are exact in
  * any order, so training is reproducible bit-for-bit across partition
  * counts, retries, AND engines — the DuckDB oracle replays the same
  * Lloyd rounds ([[ivfDuckSql]]) and must land on identical clusters.
  * (A float k-means is order-sensitive: fp addition does not associate,
  * so a tree-reduced cluster mean need not equal a sequential one.)
  *
  * Scale shape: training is a `treeAggregate` — each partition folds its
  * vectors into a local k×(dims+1) array of sums+counts against
  * BROADCAST centroids, the driver combines k·dims cells per partition.
  * One narrow pass per round, no shuffle at all (the MLlib k-means
  * shape); genuine per-partition imperative logic, hence the RDD.
  * Search prunes the corpus to the probed clusters; per-row assignment
  * is the codegen'd [[NearestCentroidExpr]].
  */
object Ivf {

  /** Squared L2 distance between a vector and a centroid; ≤ dims·(2·2^20)²
    * for |q| ≤ 2^20 — no overflow anywhere near quantized embeddings. */
  private def distSq(v: Array[Long], c: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < v.length) { val t = v(i) - c(i); d += t * t; i += 1 }
    d
  }

  /** Argmin over centroids, ties to the lowest centroid id — the
    * deterministic tiebreak the oracle mirrors (ORDER BY dist, cid). */
  private[functions] def nearestIdx(cs: Array[Array[Long]],
      v: Array[Long]): Int = {
    var best = 0
    var bestD = distSq(v, cs(0))
    var i = 1
    while (i < cs.length) {
      val d = distSq(v, cs(i))
      if (d < bestD) { best = i; bestD = d }
      i += 1
    }
    best
  }

  /** Integer Lloyd's k-means over a quantized `array<bigint>` column.
    * Seeds: the k lowest-`idCol` vectors (cid = position in that order).
    * Each round reassigns and recomputes centroids as the truncated
    * integer mean (sum / count, toward zero — identical in Scala, Spark
    * DIV and DuckDB `//`); empty clusters keep their previous centroid. */
  def trainQuantized(df: DataFrame, idCol: String, qeCol: String, k: Int,
      iters: Int = 3): Array[Array[Long]] = {
    var centroids: Array[Array[Long]] = df
      .orderBy(col(idCol)).limit(k).select(qeCol)
      .collect().map(_.getSeq[Long](0).toArray)
    require(centroids.length == k, s"corpus smaller than k=$k")
    val dims = centroids(0).length

    val rdd = df.select(qeCol).rdd.map(_.getSeq[Long](0).toArray)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 0 until iters) {
        val bc = rdd.sparkContext.broadcast(centroids)
        val sums = rdd.treeAggregate(
          Array.fill(k)(new Array[Long](dims + 1)))(
          seqOp = (acc, v) => {
            val c = nearestIdx(bc.value, v)
            val row = acc(c)
            var i = 0
            while (i < dims) { row(i) += v(i); i += 1 }
            row(dims) += 1
            acc
          },
          combOp = (a, b) => {
            var c = 0
            while (c < k) {
              val ra = a(c); val rb = b(c)
              var i = 0
              while (i <= dims) { ra(i) += rb(i); i += 1 }
              c += 1
            }
            a
          })
        centroids = centroids.zipWithIndex.map { case (old, ci) =>
          val row = sums(ci)
          val n = row(dims)
          if (n == 0L) old else Array.tabulate(dims)(d => row(d) / n)
        }
        bc.destroy()
      }
    } finally rdd.unpersist(blocking = false)
    centroids
  }

  /** `ivf_cluster` assignment column for a quantized embedding column. */
  def assignQuantized(qe: Column, centroids: Array[Array[Long]]): Column =
    GraftShims.column(
      NearestCentroidExpr(GraftShims.expression(qe), centroids))

  /** Probe order for a quantized query vector: centroid ids by ascending
    * integer L2 distance, ties to the lowest cid. */
  def probeOrderQuantized(query: Array[Long],
      centroids: Array[Array[Long]]): Seq[Int] =
    centroids.zipWithIndex
      .sortBy { case (c, cid) => (distSq(query, c), cid) }
      .map(_._2).toSeq

  /** DuckDB replica of the full IVF pipeline: quantize → k seed centroids
    * by lowest id → `iters` unrolled Lloyd rounds (integer argmin assign,
    * truncated-mean update, empty cluster keeps previous) → probe the
    * `nProbe` nearest centroids to the query → float-cosine top-`topK`
    * ranking within the probed clusters (rank-only output, same
    * cross-engine stability argument as q_ann_cosine_topk). */
  def ivfDuckSql(table: String, idCol: String, embCol: String, k: Int,
      iters: Int, nProbe: Int, topK: Int, queryId: Long): String = {
    s"""WITH ${trainAssignCtes(table, idCol, embCol, k, iters)},
       |q AS (SELECT qe AS qqe, emb AS qemb FROM e WHERE $idCol = $queryId),
       |probes AS (
       |  SELECT cid FROM c$iters, q
       |  ORDER BY ${l2Sql("c", "qqe")}, cid LIMIT $nProbe)
       |SELECT rank, $idCol, ivf_cluster FROM (
       |  SELECT ROW_NUMBER() OVER (
       |      ORDER BY list_cosine_similarity(e.emb, q.qemb) DESC,
       |        e.$idCol) AS rank,
       |    e.$idCol, CAST(f.cid AS INT) AS ivf_cluster
       |  FROM e JOIN fin f USING ($idCol), q
       |  WHERE f.cid IN (SELECT cid FROM probes) AND e.$idCol <> $queryId)
       |WHERE rank <= $topK ORDER BY rank""".stripMargin
  }

  /** Integer squared-L2 between two DuckDB list columns (1-based). */
  def l2Sql(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a)),
       |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin

  /** Shared DuckDB CTE block replaying [[trainQuantized]] +
    * [[assignQuantized]]: `e` (id, emb, qe), `c0..c$iters` (centroids per
    * Lloyd round), `fin` (per-vector cluster assignment with the same
    * dist-then-cid tiebreak as [[NearestCentroidExpr]]). Callers embed it
    * as `WITH <ctes>, ...` — used by the q_ann_ivf and q_semdedup
    * oracles. */
  def trainAssignCtes(table: String, idCol: String, embCol: String,
      k: Int, iters: Int): String = {
    val rounds = (0 until iters).map { r =>
      s"""a$r AS (
         |  SELECT $idCol, qe, cid FROM (
         |    SELECT e.$idCol, e.qe, c.cid, ROW_NUMBER() OVER (
         |        PARTITION BY e.$idCol
         |        ORDER BY ${l2Sql("e.qe", "c.c")}, c.cid) AS rn
         |    FROM e, c$r c) WHERE rn = 1),
         |m$r AS (
         |  SELECT cid, list(s ORDER BY dim) AS c FROM (
         |    SELECT cid, dim,
         |      CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT) AS s
         |    FROM (SELECT cid, unnest(qe) AS v,
         |            unnest(generate_series(1, len(qe))) AS dim FROM a$r)
         |    GROUP BY cid, dim) GROUP BY cid),
         |c${r + 1} AS (
         |  SELECT c$r.cid, COALESCE(m$r.c, c$r.c) AS c
         |  FROM c$r LEFT JOIN m$r ON c$r.cid = m$r.cid)""".stripMargin
    }.mkString(",\n")
    s"""e AS (
       |  SELECT $idCol, $embCol AS emb,
       |    list_transform($embCol, x ->
       |      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qe
       |  FROM $table),
       |c0 AS (
       |  SELECT (ROW_NUMBER() OVER (ORDER BY $idCol)) - 1 AS cid, qe AS c
       |  FROM (SELECT $idCol, qe FROM e ORDER BY $idCol LIMIT $k)),
       |$rounds,
       |fin AS (
       |  SELECT $idCol, cid FROM (
       |    SELECT e.$idCol, c.cid, ROW_NUMBER() OVER (
       |        PARTITION BY e.$idCol
       |        ORDER BY ${l2Sql("e.qe", "c.c")}, c.cid) AS rn
       |    FROM e, c$iters c) WHERE rn = 1)""".stripMargin
  }
}

/** Nearest-centroid id (integer argmin of squared L2, ties to the lowest
  * cid) for a quantized `array<bigint>` vector against a fixed centroid
  * set — the per-row IVF assignment as one fused codegen'd loop; the
  * centroid matrix rides along as a referenced object, not a literal
  * expression tree. NULL input or null element → NULL (unindexable). */
case class NearestCentroidExpr(child: Expression,
    centroids: Array[Array[Long]]) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid expects array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != centroids(0).length) return null
    val v = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      v(i) = x.getLong(i)
      i += 1
    }
    Integer.valueOf(Ivf.nearestIdx(centroids, v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cs = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val t = ctx.freshName("t"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val row = ctx.freshName("row")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $cs[0].length) { ${ev.isNull} = true; }
         |else {
         |  int $best = 0;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $cs.length && !${ev.isNull}; $c++) {
         |    final long[] $row = $cs[$c];
         |    long $d = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      final long $t = $x.getLong($i) - $row[$i];
         |      $d += $t * $t;
         |    }
         |    if (!${ev.isNull} && $d < $bestD) { $best = $c; $bestD = $d; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCentroidExpr = copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}
