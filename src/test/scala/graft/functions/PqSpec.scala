package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private def quantized = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("qe", Similarity.quantize(col("embedding")))
    .select("vec_id", "qe")

  test("fused multi-subspace training == independent per-subspace k-means") {
    val e = quantized.localCheckpoint(true)
    val fused = Pq.trainSubspaces(e, "vec_id", "qe", m = 8, dsub = 8,
      k = 16)
    val independent = (0 until 8).map { mi =>
      Ivf.trainQuantized(
        e.select(col("vec_id"), slice(col("qe"), mi * 8 + 1, 8).as("sub")),
        "vec_id", "sub", k = 16)
    }
    fused.zip(independent).zipWithIndex.foreach {
      case ((f, ind), mi) =>
        f.zip(ind).zipWithIndex.foreach { case ((fc, ic), ci) =>
          assert(fc.sameElements(ic),
            s"subspace $mi centroid $ci diverged")
        }
    }
  }

  test("ADC distance equals explicit per-subspace L2 sum") {
    val e = quantized.localCheckpoint(true)
    val books = Pq.trainSubspaces(e, "vec_id", "qe", m = 8, dsub = 8,
      k = 16)
    val q = e.filter(col("vec_id") === 0)
      .select("qe").head().getSeq[Long](0).toArray
    val adc = Pq.adcTables(q, books, dsub = 8)
    val rows = e.limit(50)
      .withColumn("d", Pq.adcDistance(col("qe"), books, adc, dsub = 8))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Long](1).toArray
      val expected = (0 until 8).map { mi =>
        val sub = v.slice(mi * 8, mi * 8 + 8)
        val cid = books(mi).indices.minBy { c =>
          val cent = books(mi)(c)
          (sub.zip(cent).map { case (a, b) =>
            val t = a - b; t * t
          }.sum, c)
        }
        val qSub = q.slice(mi * 8, mi * 8 + 8)
        val cent = books(mi)(cid)
        qSub.zip(cent).map { case (a, b) => val t = a - b; t * t }.sum
      }.sum
      assert(r.getLong(2) == expected)
    }
  }

  test("IVF+PQ composite: probed clusters only, useful recall floor") {
    val out = graft.queries.PipelineQueries.annIvfPq
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 10)
    // every result sits in one of the 4 probed coarse clusters
    assert(out.map(_.getAs[Int]("ivf_cluster")).distinct.length <= 4)
    // recall vs the exact integer-dot top-10 (probe + ADC + re-rank
    // loses some, but the composite must stay useful)
    val exact = graft.queries.PipelineQueries.annSqRecall
      .run(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(1)).toSet // exact ref top-10 vec_ids
    val hits = out.map(_.getLong(1)).count(exact.contains)
    assert(hits >= 4, s"IVF+PQ recall@10 = $hits/10")
  }
}
