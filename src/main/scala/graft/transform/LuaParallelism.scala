package graft.transform

import org.apache.spark.sql.SparkSession

/** The Lua stages' fan-out width — PEERDB_QUEUE_PARALLELISM
  * (dynamicconf.go:199, the reference's LuaPool size) mapped onto the
  * small-batch spread repartition: a batch arriving as fewer
  * partitions than this spreads out so per-record interpretation
  * never runs single-threaded while cores idle. 0 (the default) uses
  * the session's defaultParallelism. */
private[transform] object LuaParallelism {
  def width(spark: SparkSession): Int = {
    val configured = graft.mirror.Settings
      .get(spark, "queue.parallelism").map(_.toInt).getOrElse(0)
    if (configured > 0) configured
    else spark.sparkContext.defaultParallelism
  }
}
