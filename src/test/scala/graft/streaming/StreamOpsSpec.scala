package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.StreamOps.SessionEvent

class StreamOpsSpec extends SparkSpec {

  private val Minute = 60L * 1000000

  test("sessionize: gap split, watermark closes and evicts state") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[SessionEvent]
    val sessions = StreamOps.sessionize(input.toDS(),
      gapMicros = 5 * Minute, lateness = "1 minute")

    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // Base offset keeps event times clear of the initial watermark (an
      // event AT the watermark is treated as late and dropped).
      val B = 600 * Minute
      // key 1: two bursts 30min apart → two sessions; key 2: one burst.
      input.addData(
        SessionEvent(1, B), SessionEvent(1, B + 2 * Minute),
        SessionEvent(2, B + 1 * Minute))
      q.processAllAvailable()
      input.addData(SessionEvent(1, B + 30 * Minute),
        SessionEvent(1, B + 31 * Minute))
      q.processAllAvailable() // in-batch split emits session 1 immediately
      // advance watermark far past every session end → timeouts fire
      input.addData(SessionEvent(9, B + 120 * Minute))
      q.processAllAvailable()
      input.addData(SessionEvent(9, B + 121 * Minute))
      q.processAllAvailable()

      val out = spark.sql(
        "SELECT key, startMicros, endMicros, events FROM sessions_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
      assert(out.contains((1L, B, B + 2 * Minute, 2)))
      assert(out.contains((1L, B + 30 * Minute, B + 31 * Minute, 2)))
      assert(out.contains((2L, B + 1 * Minute, B + 1 * Minute, 1)))
    } finally q.stop()
  }

  test("windowed rollup emits per-window counts under watermark") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val rollup = StreamOps.windowedRollup(
      input.toDF().toDF("ts", "kind"), "ts", "kind", "10 minutes",
      "5 minutes")

    val q = rollup.writeStream.format("memory").queryName("rollup_out")
      .outputMode("append").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
      input.addData((ts(1), "a"), (ts(2), "a"), (ts(11), "b"))
      q.processAllAvailable()
      input.addData((ts(60), "a")) // watermark passes early windows
      q.processAllAvailable()
      input.addData((ts(61), "a"))
      q.processAllAvailable()
      val out = spark.sql("SELECT kind, cnt FROM rollup_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(out.contains(("a", 2L)))
      assert(out.contains(("b", 1L)))
    } finally q.stop()
  }
}
