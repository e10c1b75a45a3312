package graft.util

import graft.SparkSpec

/** Spread widens a NARROW scan to the session's cores and must be a
  * no-op on anything already wide — at real scale a corpus scan has
  * more partitions than cores, and repartitioning it would both
  * full-shuffle the data and coalesce its parallelism away. */
class SpreadSpec extends SparkSpec {

  test("narrow input widens to defaultParallelism") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "text")
      .coalesce(1)
    assert(Spread(df).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("already-wide input passes through untouched (same object — " +
    "no exchange added)") {
    val par = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 1000, 1, numPartitions = math.max(par, 4))
      .selectExpr("id", "CAST(id AS STRING) AS text")
    assert(Spread(df) eq df)
  }
}
