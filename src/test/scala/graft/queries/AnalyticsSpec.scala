package graft.queries

import graft.SparkSpec

/** Semantics of the warehouse-analytics + retrieval extensions on
  * handcrafted fixtures, plus the plan properties (broadcast dims,
  * TakeOrderedAndProject top-k, partial aggregation) that carry the
  * TPC-H shapes to cluster scale. */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def docTable(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = tmpDir("analytics")
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("argmax packing decodes to the true per-customer max order") {
    // against a window reference on the real table
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = AnalyticsQueries.argmaxOrder.run(spark, sf)
      .select("o_custkey", "best_price_c", "best_orderkey").collect()
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("price_c").desc, col("o_orderkey").desc)
    val want = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("price_c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("o_custkey", "price_c", "o_orderkey")
      .orderBy("o_custkey").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0))
      assert(g.getLong(1) == e.getLong(1), s"price for cust ${g.getLong(0)}")
      assert(g.getLong(2) == e.getLong(2), s"orderkey for cust ${g.getLong(0)}")
    }
  }

  test("top supplier returns every max-revenue tie") {
    val rows = AnalyticsQueries.topSupplier.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getLong(2)).distinct
    assert(revs.length == 1, "all returned suppliers share the max revenue")
  }

  test("promo share basis points are consistent with the two sums") {
    val r = AnalyticsQueries.promoRevenue.run(spark, sf).collect()(0)
    val (promo, total, bp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(promo >= 0 && promo <= total)
    assert(bp == promo * 10000 / total)
  }

  test("bm25: higher tf wins at equal length; longer doc penalized") {
    // docs 1/2 equal length, doc 1 has the term twice; doc 3 has the
    // same tf as doc 1 but is much longer → scores strictly below.
    val dir = docTable(Seq(
      (1L, "spark a spark b c d e f"),
      (2L, "spark a x b c d e f"),
      (3L, "spark a spark " + (1 to 40).map(i => s"w$i").mkString(" "))))
    val rows = AnalyticsQueries.bm25Search.run(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rows(1L) > rows(2L), s"tf=2 beats tf=1: $rows")
    assert(rows(1L) > rows(3L), s"length normalization penalizes: $rows")
  }

  test("bm25 idf: rarer term outranks common term at equal tf and dl") {
    // 'spark' appears in one doc, 'query' in five; probe docs 10/11 are
    // identical except for which term they contain → the rare-term doc
    // must score strictly higher.
    val fill = (1 to 6).map(i => s"f$i").mkString(" ")
    val dir = docTable(
      Seq((10L, s"spark $fill"), (11L, s"query $fill")) ++
        (1L to 4L).map(i => (20L + i, s"query pad$i $fill")))
    val rows = AnalyticsQueries.bm25Search.run(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rows(10L) > rows(11L), s"rare term wins: $rows")
  }

  test("knn graph: edges stay within LSH buckets, ranked by dot") {
    import org.apache.spark.sql.functions._
    val edges = AnalyticsQueries.knnGraph.run(spark, sf)
    val e = graft.queries.Tables(spark, sf, "embeddings")
      .select(col("vec_id"),
        graft.functions.Similarity.hyperplaneBucket("embedding", 6)
          .as("bucket"))
    val withB = edges
      .join(e.withColumnRenamed("vec_id", "v1")
        .withColumnRenamed("bucket", "b1"), col("vec_id") === col("v1"))
      .join(e.withColumnRenamed("vec_id", "v2")
        .withColumnRenamed("bucket", "b2"), col("nb_id") === col("v2"))
    assert(withB.filter(col("b1") =!= col("b2")).count() == 0)
    // per-vector ranks are 1..k dense and dots non-increasing
    val byVec = edges.collect().groupBy(_.getLong(0))
    byVec.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val dots = sorted.map(_.getLong(3))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b })
    }
  }

  test("Q3/Q10 plans: dims broadcast and top-k is TakeOrderedAndProject") {
    for (q <- Seq(AnalyticsQueries.shippingPriority,
        AnalyticsQueries.returnedItems)) {
      val plan = q.run(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("Q6 predicates push into the parquet scan") {
    val plan = AnalyticsQueries.discountRevenue.run(spark, sf)
      .queryExecution.executedPlan.toString
    // plan.toString truncates the PushedFilters list — assert the prefix
    // (discount/quantity bounds land in DataFilters visible above it)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "IsNotNull(l_discount)"), plan.take(2000))
    assert(plan.contains("(l_discount#") && plan.contains(">= 0.05"),
      plan.take(2000))
  }

  test("Q4 semi join: lineitem never duplicates order rows") {
    import org.apache.spark.sql.functions._
    val total = AnalyticsQueries.orderPriority.run(spark, sf)
      .agg(sum("n_orders")).collect()(0).getLong(0)
    val distinctOrders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(expr("year(o_orderdate) = 1996")).count()
    assert(total <= distinctOrders)
  }
}
