package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Empirical scale soak: run named registry queries against a data dir
  * (typically a scaled-up corpus) with steady-state repetitions,
  * reporting wall time AND the shuffle volume the plan actually moved —
  * the two numbers the scale ledger predicts. One JSON line per
  * (query, rep):
  *
  * {{{
  * sbt "runMain graft.Soak /tmp/graft_soak/sf1 q_dedup_minhash_lsh q_curation_pipeline"
  * }}}
  */
object Soak {

  /** Accumulates shuffle/spill totals across stages between marks. */
  final class ShuffleTally extends SparkListener {
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    @volatile var spill = 0L
    @volatile var inputRead = 0L
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        spill += m.diskBytesSpilled
        inputRead += m.inputMetrics.bytesRead
      }
    }
    def reset(): Unit = {
      shuffleRead = 0L; shuffleWrite = 0L; spill = 0L; inputRead = 0L
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Soak <dataDir> <query> [query...]")
    val dir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to 3).foreach { rep =>
        tally.reset()
        val t0 = System.nanoTime
        val rows = fn(spark, dir).queryExecution.toRdd.count()
        val sec = (System.nanoTime - t0) / 1e9
        // listener events post asynchronously; a short settle beats
        // reaching into the private listener bus for a soak tool
        Thread.sleep(300)
        // scalastyle:off println
        println(f"""{"query":"$name","rep":$rep,"sec":$sec%.3f,""" +
          s""""rows":$rows,"shuffle_read":${tally.shuffleRead},""" +
          s""""shuffle_write":${tally.shuffleWrite},""" +
          s""""spill":${tally.spill},"input_read":${tally.inputRead}}""")
        // scalastyle:on println
        graft.queries.SharedStages.sweep(spark)
      }
    }
    spark.stop()
  }
}
