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

  test("streaming sessionize equals the batch sessionizer on real events") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val Gap = 30L * 60 * 1000000 // the q_sessionize_batch gap

    // Batch truth from the verified query (user_id, start, end, n).
    val batch = graft.queries.RelationalQueries.sessionizeBatch
      .run(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
        r.getAs[Long]("session_end"), r.getAs[Long]("n_events")))
      .toSet

    val events = graft.queries.EventsTs.toNanos(spark.read
      .parquet("/root/testdata/sf0.001/events.parquet"))
      .selectExpr("user_id AS key", "ts div 1000 AS tsMicros")
      .as[SessionEvent].collect().toSeq
    val maxTs = events.map(_.tsMicros).max

    val input = MemoryStream[SessionEvent]
    val q = StreamOps.sessionize(input.toDS(), Gap, "1 minute")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      // Sentinel far past every session end advances the watermark so
      // every open session times out and emits (needs a SECOND batch for
      // the new watermark to take effect on timeouts).
      input.addData(SessionEvent(-1L, maxTs + 10L * Gap))
      q.processAllAvailable()
      input.addData(SessionEvent(-1L, maxTs + 11L * Gap))
      q.processAllAvailable()

      val streamed = spark.sql(
        "SELECT key, startMicros, endMicros, events FROM sess_parity")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3).toLong))
        .filter(_._1 >= 0) // drop the sentinel key
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup: duplicates within the watermark collapse") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val deduped = StreamOps.dedupWithinWatermark(
      input.toDF().toDF("ts", "id", "v"), "ts", "10 minutes", Seq("id"))

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
      // id=1 delivered three times (at-least-once replay), id=2 once.
      input.addData((ts(1), 1L, "a"), (ts(2), 1L, "a-dup"),
        (ts(3), 2L, "b"))
      q.processAllAvailable()
      input.addData((ts(4), 1L, "a-dup2"))
      q.processAllAvailable()
      val out = spark.sql("SELECT id, v FROM dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(out.toSet == Set((1L, "a"), (2L, "b"))) // first wins
      // After the watermark passes id=1's entry, a re-delivery is a NEW
      // row (state evicted — the documented watermark-bounded contract).
      input.addData((ts(60), 9L, "advance"))
      q.processAllAvailable()
      input.addData((ts(61), 1L, "late-replay"))
      q.processAllAvailable()
      val out2 = spark.sql("SELECT v FROM dedup_out").collect()
        .map(_.getString(0)).toSet
      assert(out2.contains("late-replay"))
    } finally q.stop()
  }

  test("stream-stream interval join: same-key matches within the window") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(36000000L + min * 60000)

    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamOps.intervalJoin(
      clicks.toDF().toDF("user", "clickTime"), "user", "clickTime",
      buys.toDF().toDF("buyer", "buyTime"), "buyer", "buyTime",
      lateness = "1 minute", window = "10 minutes")
      .selectExpr("user", "clickTime", "buyTime")

    val q = joined.writeStream
      .format("memory").queryName("sij_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // user 1 clicks at t=10; buys at t=15 (in window) and t=25 (out).
      // user 2 clicks at t=10; user 3 buys with no click.
      clicks.addData((1L, ts(10)), (2L, ts(10)))
      buys.addData((1L, ts(15)), (1L, ts(25)), (3L, ts(16)))
      q.processAllAvailable()
      val out = spark.sql("SELECT user, buyTime FROM sij_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1)))
      assert(out.toSet == Set((1L, ts(15))), out.mkString(","))
      // a buy BEFORE the click never matches (window is one-directional)
      buys.addData((2L, ts(9)))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM sij_out").head.getLong(0)
        == 1L)
    } finally q.stop()
  }

  test("streaming windowed rollup equals the batch hourly query") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._

    // Batch truth: q_window_hourly's (hour, type) counts.
    val batch = graft.queries.CoreQueries.windowHourly
      .run(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("hour_s"), r.getAs[String]("event_type"),
        r.getAs[Long]("cnt")))
      .toSet

    val rows = graft.queries.EventsTs.toNanos(spark.read
      .parquet("/root/testdata/sf0.001/events.parquet"))
      .selectExpr("ts div 1000 AS ts_us", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val maxTs = rows.map(_._1).max

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("ts_us", "event_type")
      .withColumn("ets", timestamp_micros(col("ts_us")))
    val out = StreamOps.windowedRollup(
      stream, "ets", "event_type", "1 hour", "1 minute")
    val q = out.writeStream.format("memory").queryName("rollup_parity")
      .outputMode("append").start()
    try {
      input.addData(rows)
      q.processAllAvailable()
      // push the watermark far past the last window so every window closes
      input.addData((maxTs + 10L * 3600000000L, "_sentinel"))
      q.processAllAvailable()
      input.addData((maxTs + 11L * 3600000000L, "_sentinel"))
      q.processAllAvailable()

      val streamed = spark.sql(
        """SELECT date_format(window_start, 'yyyy-MM-dd HH:00:00'),
          |  event_type, cnt FROM rollup_parity""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .filterNot(_._2 == "_sentinel")
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("left-outer interval join: unmatched lefts emit null-padded " +
    "after the watermark closes their window") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(36000000L + min * 60000)

    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamOps.intervalJoinLeftOuter(
      clicks.toDF().toDF("user", "clickTime"), "user", "clickTime",
      buys.toDF().toDF("buyer", "buyTime"), "buyer", "buyTime",
      lateness = "1 minute", window = "10 minutes")
      .selectExpr("user", "buyTime")

    val q = joined.writeStream.format("memory").queryName("sijo_out")
      .outputMode("append").start()
    try {
      // user 1 clicks and buys in-window; user 2 clicks, never buys.
      clicks.addData((1L, ts(10)), (2L, ts(10)))
      buys.addData((1L, ts(15)))
      q.processAllAvailable()
      // matched row emits immediately; the unmatched left must WAIT
      // until the watermark proves no buy can arrive for user 2
      val early = spark.sql("SELECT user, buyTime FROM sijo_out")
        .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1))))
      assert(early.toSet == Set((1L, Some(ts(15)))))
      // push both watermarks far past click+window+lateness
      clicks.addData((9L, ts(100)))
      buys.addData((9L, ts(100)))
      q.processAllAvailable()
      clicks.addData((9L, ts(101)))
      buys.addData((9L, ts(101)))
      q.processAllAvailable()
      val out = spark.sql("SELECT user, buyTime FROM sijo_out")
        .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1))))
        .toSet
      assert(out.contains((2L, None)), out.mkString(","))
    } finally q.stop()
  }

  test("transformWithState latest-version gate: regressions and replays " +
    "drop; TTL is per-key state with RocksDB") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamOps.VersionedChange

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    // Trigger.Once + an explicit checkpoint, ONE bounded microbatch per
    // phase: under any open-ended trigger (including AvailableNow) the
    // processing-time TTL schedules housekeeping batches back-to-back and
    // the query never drains (observed: 1300+ empty batches). The restart
    // between phases doubles as a state-durability check — phase 2's gate
    // decisions depend on phase 1's RocksDB state.
    val ckpt = java.nio.file.Files
      .createTempDirectory("lvd_ckpt").toString
    val input = MemoryStream[VersionedChange]
    // foreachBatch sink: the memory sink refuses checkpoint recovery,
    // and recovery is exactly what phase 2 exercises
    val collected = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, String)]()
    def runPhase(): Unit = {
      val q = StreamOps.latestVersionDedup(input.toDS(),
          java.time.Duration.ofHours(1))
        .writeStream
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[VersionedChange], _: Long) =>
            ds.collect().foreach(r =>
              collected.add((r.key, r.version, r.payload)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.Once())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    try {
      // phase 1: ascending versions pass, in-batch regression drops
      input.addData(
        VersionedChange(1, 10, "v10"), VersionedChange(1, 12, "v12"),
        VersionedChange(1, 11, "late-replay"),
        VersionedChange(2, 5, "v5"))
      runPhase()
      // phase 2 (new query, same checkpoint): cross-run replay of an old
      // version drops against the RECOVERED high-water mark; newer passes
      input.addData(
        VersionedChange(1, 12, "dup-redelivery"),
        VersionedChange(1, 13, "v13"), VersionedChange(2, 4, "old"))
      runPhase()
      import scala.jdk.CollectionConverters._
      assert(collected.asScala.toSet == Set(
        (1L, 10L, "v10"), (1L, 12L, "v12"), (1L, 13L, "v13"),
        (2L, 5L, "v5")))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("stream-stream interval join equals the batch join on real events") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._

    val ev = graft.queries.EventsTs.toNanos(spark.read
      .parquet("/root/testdata/sf0.001/events.parquet"))
      .selectExpr("event_id", "user_id", "event_type",
        "timestamp_micros(ts div 1000) AS ets")
    val errors = ev.filter(col("event_type") === "error")
      .selectExpr("event_id AS err_id", "user_id AS err_uid",
        "ets AS err_t")
    val clicks = ev.filter(col("event_type") === "click")
      .selectExpr("event_id AS clk_id", "user_id AS clk_uid",
        "ets AS clk_t")

    // batch truth with the SAME predicate the streaming join plans
    val batch = errors.join(clicks, expr(
      "err_uid = clk_uid AND clk_t >= err_t AND " +
        "clk_t <= err_t + interval 1 day"))
      .select("err_id", "clk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val errRows = errors.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSeq
    val clkRows = clicks.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSeq

    val errIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clkIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamOps.intervalJoin(
      errIn.toDF().toDF("err_id", "err_uid", "err_t"), "err_uid", "err_t",
      clkIn.toDF().toDF("clk_id", "clk_uid", "clk_t"), "clk_uid", "clk_t",
      lateness = "1 minute", window = "1 day")
      .selectExpr("err_id", "clk_id")
    val q = joined.writeStream.format("memory").queryName("sij_parity")
      .outputMode("append").start()
    try {
      errIn.addData(errRows)
      clkIn.addData(clkRows)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT err_id, clk_id FROM sij_parity")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"streamed ${streamed.size} vs batch ${batch.size}")
    } finally q.stop()
  }
}
