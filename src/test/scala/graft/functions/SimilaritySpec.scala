package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private def embDf = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codegen cosine == HOF cosine bit-for-bit on real embeddings") {
    val q = embDf.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val both = embDf.crossJoin(broadcast(q))
      .select(
        Similarity.cosineFast(col("embedding"), col("q_emb")).as("fast"),
        Similarity.cosine(col("embedding"), col("q_emb")).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null semantics: null array, length mismatch, zero norm -> NULL") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(1f, 2f)), Some(Seq(1f, 2f))),
      (2, None, Some(Seq(1f, 2f))),
      (3, Some(Seq(1f, 2f, 3f)), Some(Seq(1f, 2f))),
      (4, Some(Seq(0f, 0f)), Some(Seq(1f, 2f))))
      .toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<float>"),
        col("b").cast("array<float>"))
    val out = df.select(col("id"),
      Similarity.cosineFast(col("a"), col("b")).as("c"))
      .collect().map(r => r.getInt(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1 -> false, 2 -> true, 3 -> true, 4 -> true))
  }

  test("codegen hyperplane bucket == HOF bucket on real embeddings") {
    val both = embDf.select(
      Similarity.hyperplaneBucket("embedding", 6).as("fast"),
      Similarity.hyperplaneBucketHof("embedding", 6).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("multi-table LSH: table 0 is bit-identical to the base bucket; " +
    "higher tables use disjoint planes (independent bucketings)") {
    val rows = embDf.select(
      Similarity.hyperplaneBucket("embedding", 6).as("base"),
      Similarity.hyperplaneBucketTable("embedding", 6, 0).as("t0"),
      Similarity.hyperplaneBucketTable("embedding", 6, 1).as("t1"),
      Similarity.hyperplaneBucketTable("embedding", 6, 2).as("t2"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // independence, not identity: across the corpus the plane families
    // must disagree somewhere (identical bucketings would make extra
    // tables pure cost with zero recall gain)
    assert(rows.exists(r => r.getLong(1) != r.getLong(2)))
    assert(rows.exists(r => r.getLong(2) != r.getLong(3)))
  }

  test("codegen quantized cosine-threshold == HOF on candidate pairs") {
    val q = embDf
      .withColumn("qe", Similarity.quantize(col("embedding")))
      .select("vec_id", "qe")
    val both = q.as("a")
      .join(q.as("b"), col("a.vec_id") < col("b.vec_id") &&
        col("b.vec_id") <= 40)
      .select(
        Similarity.quantizedCosineAtLeast(
          col("a.qe"), col("b.qe"), 1L, 16L).as("fast"),
        Similarity.quantizedCosineAtLeastHof(
          col("a.qe"), col("b.qe"), 1L, 16L).as("ref"))
      .collect()
    assert(both.nonEmpty)
    assert(both.exists(_.getBoolean(0)) || both.exists(!_.getBoolean(0)))
    both.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("codegen int_dot == HOF integer dot, and null semantics") {
    val q = embDf
      .withColumn("qe", Similarity.quantize(col("embedding")))
      .select("vec_id", "qe")
    val probe = q.filter(col("vec_id") === 0)
      .select(col("qe").as("q_qe"))
    val both = q.crossJoin(broadcast(probe))
      .select(
        QuantizedExprs.intDot(col("qe"), col("q_qe")).as("fast"),
        aggregate(zip_with(col("qe"), col("q_qe"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("ref"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))

    import spark.implicits._
    val edge = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L))),   // length mismatch
      (None, Some(Seq(1L))))                // null input
      .toDF("a", "b")
      .select(QuantizedExprs.intDot(col("a"), col("b")).as("d"))
      .collect()
    assert(edge.forall(_.isNullAt(0)))

    QuantizedExprs.registerIntDot(spark)
    val viaSql = spark.sql(
      "SELECT int_dot(array(1L, 2L, 3L), array(4L, 5L, 6L))")
      .head().getLong(0)
    assert(viaSql == 32L)
  }

  test("Int192.cmpProd3 matches BigInteger on boundary-heavy inputs") {
    import java.math.BigInteger
    val rnd = new scala.util.Random(42)
    val interesting = Seq(0L, 1L, 2L, 3L, Int.MaxValue.toLong,
      (1L << 31) - 1, 1L << 31, (1L << 32) - 1, 1L << 32,
      3000000000L, Long.MaxValue / 3, Long.MaxValue - 1, Long.MaxValue)
    def pick(): Long =
      if (rnd.nextBoolean()) interesting(rnd.nextInt(interesting.size))
      else rnd.nextLong() & Long.MaxValue
    (0 until 20000).foreach { _ =>
      val v = Array.fill(6)(pick())
      val exact = BigInteger.valueOf(v(0)).multiply(BigInteger.valueOf(v(1)))
        .multiply(BigInteger.valueOf(v(2)))
        .compareTo(BigInteger.valueOf(v(3))
          .multiply(BigInteger.valueOf(v(4)))
          .multiply(BigInteger.valueOf(v(5))))
      val got = Int192.cmpProd3(v(0), v(1), v(2), v(3), v(4), v(5))
      assert(Integer.signum(got) == Integer.signum(exact),
        v.mkString("cmpProd3(", ",", ")"))
    }
  }

  test("quantized threshold exact where raw long products wrap") {
    import spark.implicits._
    // dot ≈ 2^32 per the ADVICE bound: dims=8 of magnitude ~2^30/8 each
    // puts dot²·denom far past 2^64 — raw long arithmetic wraps, the
    // 192-bit compare must still see the pair as identical (cos = 1).
    val big = Seq.fill(8)(1500000000L / 8)
    val df = Seq((big, big)).toDF("a", "b")
    val r = df.select(
      Similarity.quantizedCosineAtLeast(col("a"), col("b"), 99L, 100L)
        .as("ge")).collect().head
    assert(r.getBoolean(0)) // identical vectors pass any threshold < 1
  }

  test("SQL registration: cosine_sim callable from spark.sql") {
    CosineSimilarityExpr.register(spark)
    embDf.createOrReplaceTempView("emb_sql")
    val n = spark.sql(
      """SELECT count(*) FROM emb_sql a JOIN emb_sql b ON a.vec_id = 0
        |WHERE cosine_sim(a.embedding, b.embedding) > 0.99""".stripMargin)
      .head().getLong(0)
    assert(n >= 1) // at least the self-pair
  }
}
