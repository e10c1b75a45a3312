package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer k-means must be bit-for-bit reproducible — the property the
  * DuckDB oracle and any cluster re-run depend on. */
class IvfSpec extends SparkSpec {

  private def embDf = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("qe", Similarity.quantize(col("embedding")))

  test("training is identical across partition layouts") {
    val narrow = Ivf.trainQuantized(
      embDf.repartition(1), "vec_id", "qe", k = 8, iters = 2)
    val wide = Ivf.trainQuantized(
      embDf.repartition(17), "vec_id", "qe", k = 8, iters = 2)
    assert(narrow.length == 8)
    narrow.zip(wide).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
  }

  test("assignment expression: codegen agrees with interpreted argmin") {
    val centroids = Ivf.trainQuantized(embDf, "vec_id", "qe", k = 8,
      iters = 1)
    val rows = embDf
      .withColumn("cid", Ivf.assignQuantized(col("qe"), centroids))
      .select("qe", "cid").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Long](0).toArray
      assert(r.getInt(1) == Ivf.nearestIdx(centroids, v))
    }
    // Every centroid id is in range; ties (if any) went to the lowest id.
    assert(rows.map(_.getInt(1)).forall(c => c >= 0 && c < 8))
  }

  test("probe order sorts by integer distance with cid tiebreak") {
    val centroids = Array(
      Array(0L, 0L), Array(3L, 4L), Array(4L, 3L), Array(0L, 1L))
    // query (0,0): dists 0, 25, 25, 1 -> order 0, 3, 1, 2 (tie 1<2)
    assert(Ivf.probeOrderQuantized(Array(0L, 0L), centroids) ==
      Seq(0, 3, 1, 2))
  }

  test("probed search recall vs brute force stays useful") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("qe", Similarity.quantize(col("embedding")))
      .localCheckpoint(true)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding"), col("qe")).head()
    val qEmb = q.getSeq[Float](0).toSeq
    def top10(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("vec_id") =!= 0)
        .withColumn("sim", Similarity.cosineFast(col("embedding"),
          typedLit(qEmb).cast("array<float>")))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    val brute = top10(e)
    val centroids = Ivf.trainQuantized(e, "vec_id", "qe", k = 16)
    val probes = Ivf.probeOrderQuantized(
      q.getSeq[Long](1).toArray, centroids).take(4)
    val probed = top10(e
      .withColumn("c", Ivf.assignQuantized(col("qe"), centroids))
      .filter(col("c").isin(probes.map(Integer.valueOf): _*)))
    val recall = brute.intersect(probed).size / 10.0
    // 4/16 probes over random 64-dim vectors; measured 0.8 at sf0.01 —
    // assert a conservative floor so index regressions still trip it.
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("empty clusters keep their previous centroid") {
    import spark.implicits._
    // k=3 over 3 identical far-apart groups; one seed never wins a row
    // after reassignment if its points migrate — construct 4 points where
    // seed 2 (vec 100) is strictly closer to seed 0's mean cluster.
    val df = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(1000L, 1000L)), (2L, Seq(2L, 2L)),
      (3L, Seq(1L, 1L))).toDF("vec_id", "qe")
    val c = Ivf.trainQuantized(df, "vec_id", "qe", k = 3, iters = 2)
    assert(c.length == 3)
    // seed order = lowest ids: c0 from (0,0), c1 from (1000,1000), c2 from
    // (2,2). Round 1: points 0,3 -> c0 cluster... point 2 -> c2. All
    // rounds keep three centroids defined (no NaN/empty collapse).
    c.foreach(arr => assert(arr.length == 2))
    assert(c(1).toSeq == Seq(1000L, 1000L)) // isolated point stays put
  }

  test("topic cluster: codegen'd inertia identity == explicit L2 sum") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.PipelineQueries.topicCluster.run(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .withColumn("qe", Similarity.quantize(col("embedding")))
      .select("vec_id", "qe").localCheckpoint(true)
    assert(out.map(_._2).sum == e.count()) // every vector assigned once
    // recompute inertia per cluster via the interpreted zip_with lambda
    val cents = Ivf.trainQuantized(e, "vec_id", "qe", k = 16)
    val centDf = {
      import spark.implicits._
      cents.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toDF("cid2", "c")
    }
    val explicit = e
      .withColumn("cid2", Ivf.assignQuantized(col("qe"), cents))
      .join(broadcast(centDf), "cid2")
      .withColumn("d2", expr(
        "aggregate(zip_with(qe, c, (a, b) -> (a - b) * (a - b)), 0L," +
          " (x, y) -> x + y)"))
      .groupBy("cid2").agg(sum("d2").as("inertia2"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    out.foreach { case (cid, _, inertia) =>
      assert(explicit(cid) == inertia, s"cluster $cid inertia diverged")
    }
  }

  test("batch ANN: per-query top-3 stays within the probed clusters") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.PipelineQueries.annBatch.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.groupBy(_._1).values.forall(_.length == 3))
    // per query: ranks are 1..3 and results are distinct candidates
    out.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1, 2, 3))
      assert(rs.map(_._3).distinct.length == 3)
      assert(rs.forall(_._3 >= 5L)) // never returns a query vector
    }
  }
}
