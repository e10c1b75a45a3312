package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to hyperplane LSH: partition the vector space into k
  * centroids (Lloyd's iterations as plain DataFrame ops, no ML library),
  * assign every vector to its nearest centroid, and search only the
  * `nProbe` centroids closest to the query.
  *
  * Scale shape: training touches each vector × k centroids per iteration
  * with the centroid set BROADCAST (k ≪ corpus, one narrow pass; the
  * element-wise mean is an explode + (cluster, dim) hash aggregation
  * whose map-side partials bound the shuffle at k×dims cells/partition);
  * search prunes the corpus to the probed clusters via an equi-join on
  * cluster id. All distances go through the codegen'd
  * [[CosineSimilarityExpr]].
  */
object Ivf {

  /** Nearest-centroid id for an embedding against a broadcast centroid
    * frame collected to an array literal column. */
  private def nearest(emb: Column, centroids: Seq[(Int, Seq[Float])])
      : Column = {
    // arg-max over cosine to each centroid: fold over literal centroids.
    val scored = centroids.map { case (cid, vec) =>
      struct(
        CosineSimilarityExpr.cosineSim(emb,
          typedLit(vec).cast("array<float>")).as("sim"),
        lit(cid).as("cid"))
    }
    greatest(scored: _*).getField("cid")
  }

  /** Deterministic k-means-lite: seeds = the k vectors with the smallest
    * xxhash64(id); `iters` Lloyd rounds of assign + element-wise mean. */
  def train(df: DataFrame, idCol: String, embCol: String, k: Int,
      iters: Int = 3): Seq[(Int, Seq[Float])] = {
    var centroids: Seq[(Int, Seq[Float])] = df
      .select(col(idCol), col(embCol))
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy("h")
      .limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).toSeq }
      .toSeq

    // Element-wise mean via posexplode into (cluster, dim) rows + one
    // hash aggregation: partial (map-side) aggregation collapses each
    // partition to ≤ k×dims cells before the shuffle, and the narrow
    // 3-column explode stays inside codegen. (A dims-wide column-per-avg
    // aggregate was measured ~25% slower — 64 aggregate expressions
    // overflow the JIT method budget and fall back to interpreted.)
    for (_ <- 0 until iters) {
      val assigned = df.select(col(embCol).as("e"),
        nearest(col(embCol), centroids).as("cid"))
      val means = assigned
        .select(col("cid"), posexplode(col("e")).as(Seq("dim", "v")))
        .groupBy("cid", "dim")
        .agg(avg("v").as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("dim"), col("m"))))
          .as("dims"))
        .select(col("cid"),
          expr("transform(dims, d -> CAST(d.m AS FLOAT))").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toSeq)
        .toMap
      // empty clusters keep their previous centroid
      centroids = centroids.map { case (cid, old) =>
        cid -> means.getOrElse(cid, old)
      }
    }
    centroids
  }

  /** Corpus with an ivf_cluster column (the index). */
  def assign(df: DataFrame, embCol: String,
      centroids: Seq[(Int, Seq[Float])]): DataFrame =
    df.withColumn("ivf_cluster", nearest(col(embCol), centroids))

  /** Probe order for a query vector: centroid ids by descending cosine. */
  def probeOrder(query: Seq[Float], centroids: Seq[(Int, Seq[Float])])
      : Seq[Int] = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    centroids.sortBy { case (cid, c) => (-cos(query, c), cid) }.map(_._1)
  }
}
