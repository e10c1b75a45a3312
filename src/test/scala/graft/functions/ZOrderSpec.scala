package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton interleave: the bit-exact contract the z-layout query and its
  * DuckDB oracle (per-bit sum over generate_series) both rely on. */
class ZOrderSpec extends SparkSpec {

  /** Per-bit reference: bit i of x lands at 2i, bit i of y at 2i+1. */
  private def naive(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("shift-mask ladder equals the per-bit definition") {
    val rng = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (0xFFFFL, 0xFFFFL), (1L, 0L), (0L, 1L),
      (0xFFFFL, 0L), (0x5555L, 0xAAAAL)) ++
      Seq.fill(200)((rng.nextInt(65536).toLong, rng.nextInt(65536).toLong))
    cases.foreach { case (x, y) =>
      assert(ZOrder.interleave16(x, y) == naive(x, y), s"($x, $y)")
    }
  }

  test("z-value preserves locality: adjacent cells share high bits") {
    // Crossing a small step in either dim changes only low z bits when
    // inside an aligned block — the property file pruning exploits.
    assert(ZOrder.interleave16(4, 4) >> 6 == ZOrder.interleave16(5, 5) >> 6)
    assert(ZOrder.interleave16(4, 4) >> 6 == ZOrder.interleave16(7, 6) >> 6)
  }

  test("expression: codegen and interpreted agree, nulls propagate") {
    import spark.implicits._
    val df = Seq((1L, 2L), (65535L, 0L), (123L, 45678L))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zvalue(col("x"), col("y")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == ZOrder.interleave16(r.getLong(0),
        r.getLong(1)))
    }
    val withNull = Seq((Some(1L), None: Option[Long]))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zvalue(col("x"), col("y")))
    assert(withNull.collect().head.isNullAt(2))
    // Only the low 16 bits participate (callers quantize first).
    assert(ZOrder.interleave16(0x12345L, 0L) ==
      ZOrder.interleave16(0x2345L, 0L))
  }

  test("SQL registration: zvalue callable from spark.sql") {
    graft.Graft.registerSql(spark)
    val z = spark.sql("SELECT zvalue(CAST(3 AS BIGINT), CAST(5 AS BIGINT))")
      .collect().head.getLong(0)
    assert(z == ZOrder.interleave16(3L, 5L))
  }

  test("keep-best invariant: exactly one keeper per cluster") {
    val out = graft.queries.LayoutQueries.dedupKeepBest
      .run(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rs) =>
      assert(rs.count(_.getBoolean(2)) == 1, s"cluster $c")
    }
    // Keeper is the longest doc (ties -> min id): spot-check via recompute
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (_, rs) =>
      val keeper = rs.find(_.getBoolean(2)).get.getLong(0)
      val best = rs.map(_.getLong(0))
        .minBy(id => (-docs(id), id))
      assert(keeper == best)
    }
  }

  test("shard export: shards partition the corpus deterministically") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.LayoutQueries.shardExport.run(spark, dir)
      .collect()
    val b = graft.queries.LayoutQueries.shardExport.run(spark, dir)
      .collect()
    assert(a.toSeq == b.toSeq) // same seed -> same manifest
    assert(a.map(_.getLong(1)).sum == spark.read
      .parquet(s"$dir/documents.parquet").count())
    // NTILE balance: shard sizes differ by at most one.
    val sizes = a.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
  }
}
