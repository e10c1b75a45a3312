package graft.queries

import graft.SparkSpec

/** Physical-plan assertions: the properties that make these pipelines
  * survive a 100× scale-up are checked as regressions, not hoped for —
  * filter pushdown to the parquet scan, column pruning, broadcast joins
  * for dims, map-side partial aggregation. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: GraftQuery): String =
    q.run(spark, dir).queryExecution.executedPlan.toString

  test("projection/exclusion prunes the parquet scan to selected columns") {
    val plan = planOf(CoreQueries.projectionExclude)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey"))
    assert(readSchema.contains("l_quantity"))
    // excluded wide columns never leave the scan
    assert(!readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_shipdate"))
  }

  test("watermark filter pushes down to the parquet scan") {
    val plan = planOf(CoreQueries.filterWatermark)
    // literal rendering differs by storage type (nanos Long vs µs
    // timestamp) — assert the ts inequality reached the scan either way
    assert(plan.contains("PushedFilters: [IsNotNull(ts), " +
      "GreaterThanOrEqual(ts,"), plan.take(2000))
  }

  test("dimension joins broadcast (no fact shuffle for the dim side)") {
    val plan = planOf(CoreQueries.joinAggNation)
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("grouped aggregation is partial (map-side combine) then final") {
    val plan = planOf(CoreQueries.q1Agg)
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$plan")
  }

  test("normalize dedup: one key shuffle + map-side top-1 per key") {
    val plan = planOf(CoreQueries.dedupLatest)
    // one hash exchange for the window, one range exchange for the final
    // ORDER BY — nothing else
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") ||
        l.contains("Exchange rangepartitioning"))
    assert(exchanges <= 2, s"unexpected extra shuffles:\n$plan")
    // rank-limit pushdown: rows drop to ≤1 per key BEFORE the shuffle
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("merge-style full-outer join keys on the pk hash partitioning") {
    val plan = planOf(CoreQueries.mergeUpsert)
    assert(plan.contains("FullOuter") || plan.contains("full_outer"))
  }

  test("binned interval join is a hash join, never nested-loop") {
    val plan = planOf(RelationalQueries.intervalJoinBinned)
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("stratified sampling never reads the text column") {
    val plan = planOf(PipelineQueries.sampleStratified)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("lang"))
    assert(!readSchema.contains("text"), readSchema)
  }

  test("salted aggregation: no exchange before the salt-partial stage") {
    val plan = planOf(CoreQueries.skewAgg)
    // Three HashAggregates (salt-partial, salt-final+key-partial fused or
    // separate, key-final) and the FIRST exchange only after a partial.
    val lines = plan.linesIterator.toSeq
    val firstExchange = lines.indexWhere(_.contains("Exchange"))
    val firstAgg = lines.indexWhere(_.contains("HashAggregate"))
    assert(firstAgg >= 0 && firstExchange >= 0)
    // plan prints top-down: the final agg appears first; the SCAN-side
    // partial must appear BELOW the last exchange (map-side combine).
    val lastExchange = lines.lastIndexWhere(_.contains("Exchange"))
    assert(lines.drop(lastExchange + 1).exists(
      _.contains("HashAggregate")), plan.take(3000))
  }

  test("inverted-index self-join is a shuffled hash join, not SMJ") {
    // the self-join lives in the SHARED shingle stage now (the gates
    // consume its checkpointed pair table) — assert on the stage's
    // un-pinned plan, which is what actually executes on first build
    val ix = TokenStats.shingleIndex3(spark, dir)
    val plan = TokenStats.shinglePairsPlan(ix.sh)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(3000))
  }

  test("per-source cap: rank filter limits groups BEFORE the shuffle " +
    "and the scan never reads the text column") {
    val plan = planOf(LayoutQueries.sourceCap)
    // map tasks forward ≤K rows per source ahead of the window exchange
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
    assert(!plan.contains("text"), "text column must be pruned")
  }

  test("contamination audit: benchmark gram set broadcasts into a " +
    "semi-join (the corpus never shuffles for the probe)") {
    val plan = planOf(PipelineQueries.contaminationNgram)
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), plan.take(3000))
  }

  test("hybrid RRF: both rank lists are TakeOrderedAndProject top-k, " +
    "never a global sort of the corpus") {
    val plan = planOf(CurationQueries.hybridRrf)
    val topk = plan.linesIterator
      .count(_.contains("TakeOrderedAndProject"))
    assert(topk >= 2, s"expected top-k on both sides:\n${plan.take(3000)}")
    assert(!plan.contains("GlobalSort"), plan.take(2000))
  }

  test("winnow-pair matching: fingerprint self-join is a hash join on " +
    "the posting key — no cartesian, no nested loop") {
    val plan = planOf(CorpusQueries.dedupWinnowing)
    assert(plan.contains("ShuffledHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("winnowing argmin-recovery join is equi-keyed (doc, hash) — " +
    "the range condition is a residual filter, not the join") {
    val plan = planOf(CorpusQueries.winnowing)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("rag chunking is shuffle-free before the presentation sort " +
    "(pure per-row explode + slice)") {
    val plan = planOf(CorpusQueries.ragChunks)
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 0,
      s"chunking must not hash-shuffle:\n${plan.take(3000)}")
  }

  test("quartiles run as codegen window+agg — the ObjectHashAggregate " +
    "percentile map stays out of the plan") {
    val plan = planOf(AnalyticsQueries.quartiles)
    assert(!plan.contains("ObjectHashAggregate"), plan.take(3000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("double-distinct sketch validation plans WITHOUT Expand " +
    "(no 3x row replication through the aggregate)") {
    val plan = planOf(AnalyticsQueries.approxDistinct)
    assert(!plan.contains("Expand"), plan.take(3000))
  }

  test("semantic decontamination: corpus path never hash-shuffles — " +
    "benchmark set broadcasts, assignment is map-side") {
    val plan = planOf(PipelineQueries.contaminationSemantic)
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 0,
      s"corpus must not hash-shuffle:\n${plan.take(3000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("MRL funnel: both retrieval passes are TakeOrderedAndProject " +
    "top-k, never a single-partition global sort of the corpus") {
    val plan = planOf(PipelineQueries.annMrlRecall)
    val topk = plan.linesIterator.count(
      _.contains("TakeOrderedAndProject"))
    assert(topk >= 2, s"expected shortlist+ref top-k:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("fuzzy join: the INCREMENT side is the broadcast build side " +
    "(corpus streams map-side); over the size guard the plan flips " +
    "to shuffle_hash instead of a giant broadcast") {
    val plan = planOf(PipelineQueries.fuzzyJoin)
    // the shingle join broadcasts (the tiny final left join may SMJ
    // pre-AQE — irrelevant, both sides are per-doc rows)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the broadcast exchange must hang under the increment's filter
    // (isin src18/src19), not the corpus side
    val bcastIdx = plan.indexOf("BroadcastExchange")
    assert(bcastIdx >= 0, plan.take(3000))
    assert(plan.substring(bcastIdx).contains("src18"),
      "broadcast side is not the increment:\n" + plan.take(3000))

    // force the guard: a 1-char budget must flip to shuffle_hash
    val key = "spark.graft.fuzzyJoin.maxBroadcastChars"
    spark.conf.set(key, "1")
    try {
      val guarded = planOf(PipelineQueries.fuzzyJoin)
      assert(guarded.contains("ShuffledHashJoin"), guarded.take(3000))
      assert(!guarded.contains("BroadcastHashJoin") ||
        // corpus-side dims may still broadcast elsewhere; the shingle
        // join itself must not
        !guarded.substring(guarded.indexOf("ShuffledHashJoin"))
          .contains("BroadcastHashJoin"))
    } finally spark.conf.unset(key)
  }

  test("lua stages run as ONE MapPartitions each (per-partition " +
    "interpreter, no shuffle before it, no driver collect): the CDC " +
    "adapt stage, the QRep typed transformRow, and the QRep queue " +
    "onRecord leg") {
    Seq(CoreQueries.luaTransform, CoreQueries.luaTyped,
      CoreQueries.qrepQueue).foreach { q =>
      val plan = planOf(q)
      val n = "MapPartitions".r.findAllIn(plan).length
      assert(n == 1,
        s"${q.name}: want exactly one MapPartitions, got $n:\n" +
          plan.take(3000))
      // below the interpreter stage only the deliberate small-batch
      // SPREAD (round-robin repartition to defaultParallelism — a
      // single-file scan would otherwise interpret single-threaded)
      // may shuffle; key-based exchanges feeding it would mean the
      // stage acquired a grouping it doesn't need
      val below = plan.substring(plan.indexOf("MapPartitions"))
      assert(!below.contains("hashpartitioning"),
        s"${q.name}: key shuffle feeding the interpreter stage:\n" +
          plan.take(3000))
    }
  }
}
