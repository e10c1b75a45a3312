package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured-Streaming analytic operators over a change/event stream —
  * the extension surface of the engine (the reference itself has no
  * event-time windows, SURVEY §2.6; these are the streaming rollups a
  * replication target feeds).
  *
  * Both operators are the standard scale shapes: windowed aggregation
  * keys on (window, key) — state store partitions by hash; sessionization
  * holds ONE small state object per key with event-time timeout, so state
  * size is O(active keys), evicted by watermark.
  */
object StreamOps {

  /** Watermarked tumbling-window rollup: the streaming statement of
    * CoreQueries.windowHourly. `eventTimeCol` must be a timestamp. */
  def windowedRollup(stream: DataFrame, eventTimeCol: String,
      keyCol: String, windowLength: String, lateness: String): DataFrame =
    stream
      .withWatermark(eventTimeCol, lateness)
      .groupBy(window(col(eventTimeCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col(s"window.start").as("window_start"), col(keyCol),
        col("cnt"))

  /** Streaming exact dedup — the streaming twin of q_dedup_exact and of
    * the sink-side latest-per-key guard: at-least-once upstream delivery
    * collapses to exactly-once rows downstream. State is bounded by the
    * watermark delay (`dropDuplicatesWithinWatermark`): a key's entry is
    * evicted once the watermark passes its event time + delay, so state
    * size is O(keys per delay window), not O(all keys ever). */
  def dedupWithinWatermark(stream: DataFrame, eventTimeCol: String,
      delay: String, keyCols: Seq[String]): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  final case class SessionEvent(key: Long, tsMicros: Long)
  final case class SessionState(start: Long, end: Long, events: Int)
  final case class Session(key: Long, startMicros: Long, endMicros: Long,
      events: Int)

  implicit val evEnc: Encoder[SessionEvent] = Encoders.product[SessionEvent]
  implicit val stEnc: Encoder[SessionState] = Encoders.product[SessionState]
  implicit val seEnc: Encoder[Session] = Encoders.product[Session]

  /** Gap-based sessionization via flatMapGroupsWithState: one state entry
    * per key; a session closes when the watermark passes its end + gap
    * (EventTimeTimeout — state evicted, no unbounded growth). */
  def sessionize(events: Dataset[SessionEvent], gapMicros: Long,
      lateness: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("eventTime", timestamp_micros(col("tsMicros")))
      .withWatermark("eventTime", lateness)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(key, s.start, s.end, s.events))
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { ts =>
              cur = cur match {
                case Some(s) if ts - s.end <= gapMicros =>
                  Some(SessionState(s.start, math.max(s.end, ts),
                    s.events + 1))
                case Some(s) =>
                  closed ::= Session(key, s.start, s.end, s.events)
                  Some(SessionState(ts, ts, 1))
                case None => Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end + gapMicros) / 1000 + 1)
            }
            closed.reverseIterator
          }
      }
  }

  /** Stream-stream interval join (the streaming twin of the batch
    * q_interval_join / as-of enrichment): each left event pairs with
    * right events of the SAME key whose event time falls in
    * [leftTime, leftTime + window]. Both sides carry watermarks and the
    * join condition bounds the time range in BOTH directions, so Spark
    * can evict buffered rows once the watermark passes their time +
    * window — state is O(rate × (window + lateness)) per side, never
    * unbounded. Inner join: matches emit as soon as both rows arrive
    * (no watermark wait), the watermark only drives state cleanup and
    * late-row dropping. */
  def intervalJoin(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      lateness: String, window: String): DataFrame = {
    val l = left.withWatermark(leftTime, lateness).alias("sij_l")
    val r = right.withWatermark(rightTime, lateness).alias("sij_r")
    l.join(r, expr(
      s"sij_l.$leftKey = sij_r.$rightKey AND " +
        s"sij_r.$rightTime >= sij_l.$leftTime AND " +
        s"sij_r.$rightTime <= sij_l.$leftTime + interval $window"))
  }

  /** LEFT OUTER stream-stream interval join: like [[intervalJoin]] but a
    * left event with NO matching right event still emits (null-padded) —
    * the enrichment-with-absence shape (click with no purchase, error
    * with no recovery). The outer row can only emit once the watermark
    * proves no match can still arrive, so unmatched results trail the
    * inner ones by watermark delay + window — the price of a correct
    * negative. State bounds are the same as the inner join's. */
  def intervalJoinLeftOuter(left: DataFrame, leftKey: String,
      leftTime: String, right: DataFrame, rightKey: String,
      rightTime: String, lateness: String, window: String): DataFrame = {
    val l = left.withWatermark(leftTime, lateness).alias("sij_l")
    val r = right.withWatermark(rightTime, lateness).alias("sij_r")
    l.join(r, expr(
      s"sij_l.$leftKey = sij_r.$rightKey AND " +
        s"sij_r.$rightTime >= sij_l.$leftTime AND " +
        s"sij_r.$rightTime <= sij_l.$leftTime + interval $window"),
      "left_outer")
  }

  // ------------------- transformWithState (Spark 4 arbitrary state API)

  final case class VersionedChange(key: Long, version: Long,
      payload: String)

  implicit val vcEnc: Encoder[VersionedChange] =
    Encoders.product[VersionedChange]

  /** Per-key latest-version gate on the new `transformWithState` API
    * (requires the RocksDB state store provider): a change record passes
    * only when its version is strictly newer than the key's stored
    * high-water mark — the streaming twin of the sink-side
    * latest-per-key normalize dedup, stated as an explicit state machine
    * instead of a window. TTL evicts a key's mark after `ttl` of
    * inactivity, so state is O(recently-active keys): the right contract
    * for a CDC firehose where version monotonicity only needs enforcing
    * within the redelivery horizon (a replay older than the TTL was
    * already normalized downstream). Within one batch, rows arriving in
    * version order all pass; regressions and replays drop. */
  class LatestVersionProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, VersionedChange, VersionedChange] {
    @transient private var hwm: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hwm = getHandle.getValueState[Long]("hwm", Encoders.scalaLong,
        TTLConfig(ttl))

    override def handleInputRows(key: Long,
        rows: Iterator[VersionedChange],
        timerValues: TimerValues): Iterator[VersionedChange] = {
      val existed = hwm.exists()
      var cur = if (existed) hwm.get() else Long.MinValue
      val out = Vector.newBuilder[VersionedChange]
      var sawRows = false
      rows.foreach { r =>
        sawRows = true
        if (r.version > cur) { cur = r.version; out += r }
      }
      // Refresh the mark on EVERY batch that touched the key, not only
      // when something passed: the TTL clock resets on writes, and a key
      // under pure replay traffic (all rows gated) must keep its mark
      // alive for as long as replays keep arriving — otherwise the mark
      // expires mid-replay-storm and a stale version slips through.
      if (sawRows && cur != Long.MinValue) hwm.update(cur)
      out.result().iterator
    }
  }

  /** See [[LatestVersionProcessor]]. The session must run the RocksDB
    * state store provider (`spark.sql.streaming.stateStore.providerClass`)
    * — transformWithState does not support the default HDFS-backed one. */
  def latestVersionDedup(changes: Dataset[VersionedChange],
      ttl: java.time.Duration): Dataset[VersionedChange] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      // ProcessingTime mode: TTL clocks are processing-time-based (the
      // API rejects TTL under TimeMode.None)
      .transformWithState(new LatestVersionProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
