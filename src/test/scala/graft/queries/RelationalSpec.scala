package graft.queries

import graft.SparkSpec

/** Value invariants + scale-plan properties for the grouping-set and
  * lead/lag additions (the oracle gate checks exact values at sf0.01;
  * these pin the structural relationships and the plan shape). */
class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cube: grand total row equals table count; leaves sum to it") {
    val rows = RelationalQueries.cubeAgg.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = spark.read.parquet(s"$dir/orders.parquet").count()
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1 && grand.head._3 == total)
    val leaves = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    assert(leaves.map(_._3).sum == total)
    // both one-dimension margins also sum to the total
    assert(rows.filter(r => r._1 == "ALL" && r._2 != "ALL")
      .map(_._3).sum == total)
    assert(rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
      .map(_._3).sum == total)
  }

  test("cube plans one Expand + partial-then-final aggregate") {
    val plan = RelationalQueries.cubeAgg.run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(2000))
    // partial aggregation before the exchange: replicated rows combine
    // map-side, the shuffle carries group results
    val firstAgg = plan.indexOf("HashAggregate")
    val exchange = plan.indexOf("Exchange hashpartitioning")
    assert(firstAgg >= 0 && exchange >= 0)
  }

  test("event transitions: counts cover every non-first event exactly") {
    val e = spark.read.parquet(s"$dir/events.parquet")
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    val rows = RelationalQueries.eventTransitions.run(spark, dir)
      .collect()
    // each user's first event has no predecessor; every other event is
    // exactly one transition
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers)
    // gaps are time-ordered per user, so never negative
    assert(rows.forall(_.getLong(4) >= 0L)) // max_gap_us
    assert(rows.forall(_.getLong(3) >= 0L)) // sum_gap_us
  }

  test("Q5 shape: one fact shuffle join, dims broadcast, year pushed") {
    val df = RelationalQueries.localSupplierRevenue.run(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // at most one shuffled join (lineitem x orders; at sf0.001 even
    // orders broadcasts) and never a nested-loop/cartesian fallback
    val smj = "SortMergeJoin".r.findAllIn(plan).length
    val shj = "ShuffledHashJoin".r.findAllIn(plan).length
    assert(smj + shj <= 1, s"want <=1 shuffled join, smj=$smj shj=$shj")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    // customer/supplier/nation/region all broadcast
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3,
      plan.take(3000))
    // the year predicate reaches the orders scan as a pushed filter
    assert(plan.contains("o_orderdate"), plan.take(3000))
    val scans = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(scans.contains("o_orderdate") || plan.contains("year"),
      scans)
  }
}
