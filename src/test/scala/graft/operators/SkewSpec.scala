package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted aggregate equals plain aggregate under heavy skew") {
    import spark.implicits._
    // 90% of rows on one key
    val df = ((1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong)))
      .toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedAggregate(df, Seq("k"),
      Map("total" -> col("v"), "cnt" -> lit(1L)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(salted == plain)
  }

  test("salted join equals plain join row-for-row") {
    import spark.implicits._
    val left = ((1 to 5000).map(_ => 1L) ++ (2L to 100L)).toDF("id")
    val right = (1L to 100L).map(i => (i, s"dim$i")).toDF("id", "name")
    val plain = left.join(right, Seq("id"))
      .groupBy("id", "name").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedJoin(left, right, Seq("id"))
      .groupBy("id", "name").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(salted == plain)
  }
}
