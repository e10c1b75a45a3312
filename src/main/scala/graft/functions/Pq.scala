package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the third ANN scale path next to
  * hyperplane LSH and IVF: split each vector into `m` subspaces, k-means
  * each subspace independently, and represent a vector by its `m`
  * centroid ids (4 bits each at k=16 — a 64-dim float vector compresses
  * 64× to 4 bytes). Search scores candidates with an ADC (asymmetric
  * distance computation) table: the query's distance to every sub-centroid
  * is precomputed, so a candidate's approximate distance is `m` table
  * lookups + adds (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011).
  *
  * Everything runs in the same INTEGER domain as [[Ivf]] (quantized
  * vectors, integer L2, truncated-mean Lloyd rounds, dist-then-cid
  * tiebreaks), so codebooks, codes, and ADC scores are bit-reproducible
  * across partitionings, retries, and engines — the DuckDB oracle replays
  * the full pipeline ([[pqDuckSql]]).
  */
object Pq {

  /** Train `m` per-subspace codebooks (k centroids each) over a
    * quantized `array<bigint>` column of `m`·`dsub` dims — all `m`
    * k-means FUSED into one treeAggregate per Lloyd round (subspace
    * assignments are independent, so one corpus pass updates every
    * codebook: 3 jobs + 1 persist instead of m·iters jobs over m slice
    * projections; measured 8× fewer jobs at m=8). Seeds, truncated-mean
    * updates, empty-cluster retention and dist-then-lowest-cid tiebreaks
    * are exactly [[Ivf.trainQuantized]]'s, applied per slice — the
    * result is bit-identical to training each subspace separately, which
    * is what the DuckDB oracle replays. */
  def trainSubspaces(df: DataFrame, idCol: String, qeCol: String, m: Int,
      dsub: Int, k: Int, iters: Int = 3): Seq[Array[Array[Long]]] = {
    val seeds = df.orderBy(col(idCol)).limit(k).select(qeCol)
      .collect().map(_.getSeq[Long](0).toArray)
    require(seeds.length == k, s"corpus smaller than k=$k")
    require(seeds(0).length == m * dsub,
      s"dims ${seeds(0).length} != m*dsub ${m * dsub}")
    var books: Array[Array[Array[Long]]] = Array.tabulate(m)(mi =>
      seeds.map(v => v.slice(mi * dsub, (mi + 1) * dsub)))

    val rdd = df.select(qeCol).rdd.map(_.getSeq[Long](0).toArray)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 0 until iters) {
        val bc = rdd.sparkContext.broadcast(books)
        val sums = rdd.treeAggregate(
          Array.fill(m, k)(new Array[Long](dsub + 1)))(
          seqOp = (acc, v) => {
            var mi = 0
            while (mi < m) {
              val cbs = bc.value(mi)
              val off = mi * dsub
              var best = 0
              var bestD = Long.MaxValue
              var c = 0
              while (c < k) {
                val cent = cbs(c)
                var d = 0L
                var i = 0
                while (i < dsub) {
                  val t = v(off + i) - cent(i); d += t * t; i += 1
                }
                if (d < bestD) { bestD = d; best = c }
                c += 1
              }
              val row = acc(mi)(best)
              var i = 0
              while (i < dsub) { row(i) += v(off + i); i += 1 }
              row(dsub) += 1
              mi += 1
            }
            acc
          },
          combOp = (a, b) => {
            var mi = 0
            while (mi < m) {
              var c = 0
              while (c < k) {
                val ra = a(mi)(c); val rb = b(mi)(c)
                var i = 0
                while (i <= dsub) { ra(i) += rb(i); i += 1 }
                c += 1
              }
              mi += 1
            }
            a
          })
        books = Array.tabulate(m) { mi =>
          books(mi).zipWithIndex.map { case (old, ci) =>
            val row = sums(mi)(ci)
            val n = row(dsub)
            if (n == 0L) old else Array.tabulate(dsub)(d => row(d) / n)
          }
        }
        bc.destroy()
      }
    } finally rdd.unpersist(blocking = false)
    books.toSeq
  }

  /** Integer squared L2 between two quantized sub-vectors. */
  private def l2(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** ADC lookup tables for a quantized query vector: table(mi)(c) =
    * ||query_sub_mi − codebook_mi[c]||². Driver-side, m·k entries. */
  def adcTables(query: Array[Long], books: Seq[Array[Array[Long]]],
      dsub: Int): Seq[Seq[Long]] =
    books.zipWithIndex.map { case (cb, mi) =>
      val qSub = query.slice(mi * dsub, mi * dsub + dsub)
      cb.toSeq.map(c => l2(qSub, c))
    }

  /** Approximate distance column: assign each subspace's slice to its
    * nearest sub-centroid (codegen'd [[NearestCentroidExpr]] per
    * subspace) and sum the query's precomputed ADC entries — `m` lookups
    * and adds per row, never touching the full vector arithmetic. */
  def adcDistance(qe: Column, books: Seq[Array[Array[Long]]],
      adc: Seq[Seq[Long]], dsub: Int): Column =
    books.zipWithIndex.map { case (cb, mi) =>
      element_at(typedLit(adc(mi)),
        Ivf.assignQuantized(slice(qe, mi * dsub + 1, dsub), cb) + 1)
    }.reduce(_ + _)

  /** DuckDB replica of the full PQ retrieval: per-subspace k-means replay
    * (same seed/assign/update/tiebreak rules as [[Ivf.trainAssignCtes]]),
    * per-vector ADC distance as the sum of per-subspace L2s to the
    * assigned sub-centroids, top-`topK` by (dist, id). The `found` join
    * against an integer-dot reference ranking happens in the caller.
    * `restrict` optionally names an outer CTE with an `idCol` column:
    * the shortlist ranking then runs over its semi-join with the ADC
    * distances (the IVF-probed candidate set in q_ann_ivf_pq). */
  def pqDuckSql(table: String, idCol: String, embCol: String, m: Int,
      dsub: Int, k: Int, iters: Int, topK: Int, queryId: Long,
      restrict: Option[String] = None): String = {
    def sub(mi: Int) = s"qe[${mi * dsub + 1}:${mi * dsub + dsub}]"
    val perSub = (0 until m).map { mi =>
      val rounds = (0 until iters).map { r =>
        s"""a${mi}_$r AS (
           |  SELECT $idCol, sub, cid FROM (
           |    SELECT s.$idCol, s.sub, c.cid, ROW_NUMBER() OVER (
           |        PARTITION BY s.$idCol
           |        ORDER BY ${Ivf.l2Sql("s.sub", "c.c")}, c.cid) AS rn
           |    FROM s$mi s, c${mi}_$r c) WHERE rn = 1),
           |m${mi}_$r AS (
           |  SELECT cid, list(v ORDER BY dim) AS c FROM (
           |    SELECT cid, dim,
           |      CAST(CAST(sum(x) AS BIGINT) // count(*) AS BIGINT) AS v
           |    FROM (SELECT cid, unnest(sub) AS x,
           |            unnest(generate_series(1, len(sub))) AS dim
           |          FROM a${mi}_$r)
           |    GROUP BY cid, dim) GROUP BY cid),
           |c${mi}_${r + 1} AS (
           |  SELECT c${mi}_$r.cid, COALESCE(m${mi}_$r.c, c${mi}_$r.c) AS c
           |  FROM c${mi}_$r LEFT JOIN m${mi}_$r
           |    ON c${mi}_$r.cid = m${mi}_$r.cid)""".stripMargin
      }.mkString(",\n")
      s"""s$mi AS (SELECT $idCol, ${sub(mi)} AS sub FROM e),
         |c${mi}_0 AS (
         |  SELECT (ROW_NUMBER() OVER (ORDER BY $idCol)) - 1 AS cid,
         |    sub AS c
         |  FROM (SELECT $idCol, sub FROM s$mi ORDER BY $idCol LIMIT $k)),
         |$rounds,
         |fin$mi AS (
         |  SELECT $idCol, cid FROM (
         |    SELECT s.$idCol, c.cid, ROW_NUMBER() OVER (
         |        PARTITION BY s.$idCol
         |        ORDER BY ${Ivf.l2Sql("s.sub", "c.c")}, c.cid) AS rn
         |    FROM s$mi s, c${mi}_$iters c) WHERE rn = 1),
         |d$mi AS (
         |  SELECT f.$idCol, ${Ivf.l2Sql("q.sub", "c.c")} AS d
         |  FROM fin$mi f
         |  JOIN c${mi}_$iters c ON f.cid = c.cid,
         |    (SELECT ${sub(mi)} AS sub FROM e WHERE $idCol = $queryId) q)"""
        .stripMargin
    }.mkString(",\n")
    val dJoin = (1 until m)
      .map(mi => s"JOIN d$mi USING ($idCol)").mkString(" ")
    val dSum = (0 until m).map(mi => s"d$mi.d").mkString(" + ")
    val restrictJoin = restrict.map(r => s" JOIN $r USING ($idCol)")
      .getOrElse("")
    s"""WITH e AS (
       |  SELECT $idCol,
       |    list_transform($embCol, x ->
       |      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qe
       |  FROM $table),
       |$perSub,
       |dist AS (
       |  SELECT d0.$idCol, $dSum AS d
       |  FROM d0 $dJoin
       |  WHERE d0.$idCol <> $queryId)
       |SELECT $idCol FROM (
       |  SELECT ROW_NUMBER() OVER (ORDER BY d, $idCol) AS rank, $idCol
       |  FROM dist$restrictJoin)
       |WHERE rank <= $topK""".stripMargin
  }
}
