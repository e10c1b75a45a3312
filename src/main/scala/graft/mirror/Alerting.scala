package graft.mirror

import scala.collection.mutable

/** Threshold alerting — the Spark restatement of the reference's alerting
  * core (`flow/alerting/alerting.go`): slot-lag and open-connections
  * threshold checks fanned out to N configured senders, with a per-
  * (sender, alert-key) minimum gap between repeats so a persistently bad
  * gauge doesn't page every poll cycle.
  *
  * Semantics ported exactly:
  *   - Each sender may carry its own threshold; 0 means "use the
  *     deployment default" (`alerting.go:148-151, 208-211`).
  *   - The RECORDING gate uses the LOWEST configured threshold, so the
  *     catalog entry (and the repeat-gap clock) starts at the earliest
  *     breach any sender cares about; each sender then actually fires
  *     only when its own effective threshold is exceeded
  *     (`alerting.go:163-176`, same two-level check for connections).
  *   - A sender scoped to specific mirrors ignores other flows
  *     (`AlertForMirrors`, `alerting.go:157-160, 222-224`).
  *   - Repeat suppression: an alert (sender, key) re-fires only when the
  *     last recorded firing is at least `gapMinutes` old; gap 0 disables
  *     alerting entirely (`checkAndAddAlertToCatalog`,
  *     `alerting.go:293-326`).
  *
  * Defaults mirror the reference's dynamic-config defaults
  * (`flow/internal/dynamicconf.go:244-264`): gap 15 min, slot lag
  * 5000 MB, open connections 5. The clock is injected so specs are
  * deterministic; the alert "catalog" is the in-memory `sent` map plus
  * the returned [[Alert]] rows — callers wanting durability append them
  * wherever mirror state already lives.
  */
object Alerting {

  /** One configured alert destination (Slack/email in the reference; the
    * transport is out of scope here — the engine's job ends at deciding
    * WHAT fires WHEN). Thresholds of 0 defer to the deployment default.
    */
  final case class Sender(
      id: Long,
      slotLagMbThreshold: Long = 0,
      openConnectionsThreshold: Long = 0,
      alertForMirrors: Seq[String] = Nil)

  final case class Alert(
      senderId: Long, key: String, message: String, atMs: Long)

  final class Alerter(
      senders: Seq[Sender],
      defaultSlotLagMb: Long = 5000,
      defaultOpenConnections: Long = 5,
      gapMinutes: Long = 15,
      clock: () => Long = () => System.currentTimeMillis()) {

    /** Last recorded firing per (senderId, alertKey) — the restatement
      * of the `peerdb_stats.alerts_v1` recency lookup. */
    private val sent = mutable.Map.empty[(Long, String), Long]
    private val log = mutable.ArrayBuffer.empty[Alert]

    /** The reference's two-level check for one gauge reading: record
      * (and start the gap clock) at the lowest configured threshold,
      * fire each sender at its own effective threshold. Returns the
      * alerts that actually fired now. */
    private def check(flowName: String, key: String, value: Long,
        senderThreshold: Sender => Long, default: Long,
        message: Long => String): Seq[Alert] = {
      if (gapMinutes <= 0) return Nil // gap 0 disables (alerting.go:300)
      def effective(s: Sender): Long = {
        val t = senderThreshold(s)
        if (t > 0) t else default
      }
      val lowest = (default +: senders.map(senderThreshold).filter(_ > 0)).min
      if (value <= lowest) return Nil
      val now = clock()
      senders.flatMap { s =>
        val scoped = s.alertForMirrors.isEmpty ||
          s.alertForMirrors.contains(flowName)
        val due = sent.get((s.id, key))
          .forall(last => now - last >= gapMinutes * 60000L)
        if (scoped && due) {
          // Recording happens at the lowest-threshold breach even when
          // this sender's own (higher) threshold doesn't fire, exactly
          // like the catalog insert in alerting.go:163-176.
          sent((s.id, key)) = now
          if (value > effective(s)) {
            val a = Alert(s.id, key, message(effective(s)), now)
            log += a
            Some(a)
          } else None
        } else None
      }
    }

    /** Slot-lag gauge check (`AlertIfSlotLag`, alerting.go:124-183).
      * `lagMb` in MB to match the reference's unit. */
    def alertIfSlotLag(flowName: String, peerName: String, slotName: String,
        lagMb: Long): Seq[Alert] =
      check(flowName, s"Slot Lag Threshold Exceeded for Peer $peerName",
        lagMb, _.slotLagMbThreshold, defaultSlotLagMb,
        t => s"Slot `$slotName` on peer `$peerName` has exceeded " +
          s"threshold size of ${t}MB, currently at ${lagMb}MB!")

    /** Normalize-staleness check (`AlertIfTooLongSinceLastNormalize`,
      * alerting.go:243-279): fires when the minutes since the
      * mirror's last completed normalize exceed `thresholdMinutes`
      * (PEERDB_INTERVAL_SINCE_LAST_NORMALIZE_THRESHOLD_MINUTES);
      * 0 disables this check entirely. One deployment-wide threshold
      * — the reference has no per-sender override for this gauge,
      * unlike slot lag; scoping and repeat-gap apply as usual. */
    def alertIfTooLongSinceLastNormalize(flowName: String,
        minutesSince: Long, thresholdMinutes: Long): Seq[Alert] =
      if (thresholdMinutes <= 0) Nil
      else check(flowName,
        s"Too long since last data normalize for PeerDB mirror " +
          flowName,
        minutesSince, _ => thresholdMinutes, thresholdMinutes,
        t => s"Data hasn't been synced to the target for mirror " +
          s"`$flowName` in the last $minutesSince minutes " +
          s"(threshold $t minutes) — this could indicate an issue " +
          "with the pipeline; check the mirror's state and logs.")

    /** Open-connections gauge check (`AlertIfOpenConnections`,
      * alerting.go:185-240). */
    def alertIfOpenConnections(flowName: String, peerName: String,
        user: String, open: Long): Seq[Alert] =
      check(flowName,
        s"Max Open Connections Threshold Exceeded for Peer $peerName",
        open, _.openConnectionsThreshold, defaultOpenConnections,
        t => s"Open connections from user `$user` on peer `$peerName` " +
          s"has exceeded threshold size of $t connections, " +
          s"currently at $open connections!")

    /** Every alert that fired, oldest first. */
    def history: Seq[Alert] = log.toSeq
  }
}
