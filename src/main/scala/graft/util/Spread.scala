package graft.util

import org.apache.spark.sql.DataFrame

/** Widen a NARROW frame to the session's cores before per-row-heavy
  * work (shingle explode + hash, MinHash signatures, wire decode):
  * a one-file source arrives as one scan partition, and everything
  * narrow downstream then runs single-task while the other cores
  * idle. NO-OP when the input is already parallel — at real scale a
  * corpus scan has far more partitions than cores, and repartitioning
  * it would both full-shuffle the data AND coalesce its parallelism
  * away (strictly harmful); min(4, cores) is the same "already wide
  * enough" floor LuaParallelism uses.
  *
  * Callers must pass narrow chains (scans / checkpoint reads, no
  * exchange on top): there the rdd probe is free. Probing a plan WITH
  * an exchange would finalize the AdaptiveSparkPlan and execute the
  * shuffle once for the probe alone (see LuaParallelism's static
  * width reader for that case).
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.min(4, par)) df
    else df.repartition(par)
  }
}
