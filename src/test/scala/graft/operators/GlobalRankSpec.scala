package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GlobalRank must agree with Spark's own single-partition window
  * functions (the semantic oracle) while never moving the data through
  * one partition. */
class GlobalRankSpec extends SparkSpec {

  test("withRowNumber matches row_number over a total order") {
    val df = spark.range(0, 10007)
      .selectExpr("pmod(id * 2654435761, 10007) AS k", "id AS payload")
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy("k")).cast("long"))
      .select("k", "rn").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val got = GlobalRank.withRowNumber(df, Seq(col("k")), numPartitions = 7)
      .select("k", "rn").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == expected)
  }

  test("withRowNumber supports descending sort and keeps payload") {
    val df = spark.range(1, 101).selectExpr("id AS k", "id * 10 AS v")
    val rows = GlobalRank
      .withRowNumber(df, Seq(col("k").desc), rnCol = "rank",
        numPartitions = 4)
      .filter(col("rank") <= 3).orderBy("rank")
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("k"),
        r.getAs[Long]("v")))
    assert(rows.toSeq == Seq((1L, 100L, 1000L), (2L, 99L, 990L),
      (3L, 98L, 980L)))
  }

  test("withNtile matches ntile() exactly, including remainder spread") {
    for (n <- Seq(1, 3, 8, 13)) {
      val df = spark.range(0, 1000)
        .selectExpr("pmod(id * 48271, 1009) AS k")
      val expected = df
        .withColumn("bucket", ntile(n).over(Window.orderBy("k")))
        .groupBy("bucket").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val got = GlobalRank.withNtile(df, Seq(col("k")), n)
        .groupBy("bucket").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == expected, s"n=$n")
    }
  }

  test("withNtile with more buckets than rows: one row per bucket") {
    val df = spark.range(1, 4).selectExpr("id AS k")
    val got = GlobalRank.withNtile(df, Seq(col("k")), 8)
      .orderBy("bucket").collect()
      .map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("k"))
    assert(got.toSeq == Seq(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("no single-partition exchange in the physical plan") {
    val df = spark.range(0, 1000).selectExpr("id AS k")
    val plan = GlobalRank.withRowNumber(df, Seq(col("k")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked into:\n$plan")
  }
}
