package graft.mirror

import graft.SparkSpec
import graft.mirror.Alerting._

/** Threshold + repeat-gap semantics of [[Alerting.Alerter]], matching the
  * reference behavior in flow/alerting/alerting.go (two-level threshold
  * check, lowest-threshold recording, per-(sender,key) gap, mirror
  * scoping, gap-0 disable). Clock is injected: tests are deterministic.
  * (SparkSpec only for the stats-catalog readback in recordCheck.) */
class AlertingSpec extends SparkSpec {

  test("fires above threshold, silent below") {
    val a = new Alerter(Seq(Sender(1)), clock = () => 0L)
    assert(a.alertIfSlotLag("m1", "pg", "slot", 4999).isEmpty)
    val fired = a.alertIfSlotLag("m1", "pg", "slot", 5001)
    assert(fired.map(_.senderId) == Seq(1L))
    assert(fired.head.message.contains("5000MB"))
    assert(fired.head.message.contains("5001MB"))
  }

  test("repeat suppressed inside the gap, re-fires after it") {
    var now = 0L
    val a = new Alerter(Seq(Sender(1)), gapMinutes = 15, clock = () => now)
    assert(a.alertIfSlotLag("m1", "pg", "s", 9000).size == 1)
    now = 14 * 60000L // 14 min: inside the gap
    assert(a.alertIfSlotLag("m1", "pg", "s", 9000).isEmpty)
    now = 15 * 60000L // exactly the gap: due again (>= in the reference)
    assert(a.alertIfSlotLag("m1", "pg", "s", 9000).size == 1)
  }

  test("gap zero disables alerting entirely") {
    val a = new Alerter(Seq(Sender(1)), gapMinutes = 0, clock = () => 0L)
    assert(a.alertIfSlotLag("m1", "pg", "s", 1000000).isEmpty)
    assert(a.history.isEmpty)
  }

  test("per-sender threshold overrides the default; 0 defers to it") {
    val a = new Alerter(
      Seq(Sender(1, slotLagMbThreshold = 8000), Sender(2)),
      clock = () => 0L)
    // 7000 MB: above the 5000 default (sender 2 fires), below sender 1's
    // own 8000 override.
    val fired = a.alertIfSlotLag("m1", "pg", "s", 7000)
    assert(fired.map(_.senderId) == Seq(2L))
  }

  test("lowest-threshold recording starts the gap clock even for a " +
    "sender whose own threshold did not fire") {
    var now = 0L
    val a = new Alerter(
      Seq(Sender(1, slotLagMbThreshold = 8000)),
      gapMinutes = 15, clock = () => now)
    // 7000 > lowest(5000 default, 8000) = 5000: recorded for sender 1,
    // but 7000 <= 8000 so nothing fires...
    assert(a.alertIfSlotLag("m1", "pg", "s", 7000).isEmpty)
    // ...and the recorded breach suppresses a real 9000 MB firing that
    // lands inside the gap — exactly the reference's catalog-insert-
    // then-send ordering (alerting.go:163-176).
    now = 60000L
    assert(a.alertIfSlotLag("m1", "pg", "s", 9000).isEmpty)
    now = 16 * 60000L
    assert(a.alertIfSlotLag("m1", "pg", "s", 9000).size == 1)
  }

  test("mirror scoping: a sender with alertForMirrors ignores other flows") {
    val a = new Alerter(
      Seq(Sender(1, alertForMirrors = Seq("only_this")), Sender(2)),
      clock = () => 0L)
    val fired = a.alertIfOpenConnections("other_flow", "pg", "u", 10)
    assert(fired.map(_.senderId) == Seq(2L))
    val fired2 = a.alertIfOpenConnections("only_this", "pg", "u", 10)
    assert(fired2.map(_.senderId) == Seq(1L))
  }

  test("slot-lag bridge: WAL head minus committed offset drives the " +
    "alerter through Monitoring.alertCheck") {
    import graft.cdc.ChangeLogWal
    import graft.model.ChangeRecord
    val wal = java.nio.file.Files.createTempDirectory("alertwal").toString
    ChangeLogWal.append(wal, (1L to 120L).map(cp =>
      ChangeRecord(0, cp, cp.toString, cp * 1000, cp, "s.t", "d.t",
        s"""{"id":$cp}""", null, Nil)))
    // No checkpoint dir → nothing committed → lag = head + 1 = 121
    // records; a 100-record threshold fires, a 200-record one doesn't.
    val loud = new Alerter(Seq(Sender(1, slotLagMbThreshold = 100)),
      clock = () => 0L)
    val fired = SlotLag.alertCheck(loud, "m1", "pg", wal, s"$wal/no_ckpt")
    assert(fired.size == 1 && fired.head.message.contains("121"))
    val quiet = new Alerter(Seq(Sender(1, slotLagMbThreshold = 200)),
      clock = () => 0L)
    assert(SlotLag.alertCheck(quiet, "m1", "pg", wal,
      s"$wal/no_ckpt").isEmpty)
  }

  test("recordCheck: gauge history + fired alert land in the stats " +
    "catalog (peer_slot_size + flow_errors warn)") {
    import graft.cdc.ChangeLogWal
    import graft.model.ChangeRecord
    val wal = java.nio.file.Files.createTempDirectory("alertwal2").toString
    ChangeLogWal.append(wal, (1L to 60L).map(cp =>
      ChangeRecord(0, cp, cp.toString, cp * 1000, cp, "s.t", "d.t",
        s"""{"id":$cp}""", null, Nil)))
    val statsDir = java.nio.file.Files
      .createTempDirectory("alertstats").toString
    val st = new StatsCatalog(statsDir)
    val a = new Alerter(Seq(Sender(1, slotLagMbThreshold = 10)),
      clock = () => 0L)
    val fired = SlotLag.recordCheck(st, a, "m1", "pg", wal,
      s"$wal/no_ckpt")
    assert(fired.size == 1)
    val slots = st.table(spark, "peer_slot_size").collect()
    assert(slots.length == 1 &&
      slots.head.getAs[Long]("slot_size") == 61L)
    val warns = st.table(spark, "flow_errors").collect()
    assert(warns.length == 1 &&
      warns.head.getAs[String]("error_type") == "warn" &&
      warns.head.getAs[String]("flow_name") == "m1")
    // below-threshold tick: history row appended, no new warn
    val quiet = new Alerter(Seq(Sender(1, slotLagMbThreshold = 200)),
      clock = () => 0L)
    assert(SlotLag.recordCheck(st, quiet, "m1", "pg", wal,
      s"$wal/no_ckpt").isEmpty)
    assert(st.table(spark, "peer_slot_size").count() == 2)
    assert(st.table(spark, "flow_errors").count() == 1)
  }

  test("open-connections check uses its own default (5) and keys " +
    "independently of slot lag") {
    var now = 0L
    val a = new Alerter(Seq(Sender(1)), clock = () => now)
    assert(a.alertIfOpenConnections("m", "pg", "u", 5).isEmpty) // = not >
    assert(a.alertIfOpenConnections("m", "pg", "u", 6).size == 1)
    // Different alert key: slot lag still fires despite the fresh
    // connections alert on the same sender.
    assert(a.alertIfSlotLag("m", "pg", "s", 6000).size == 1)
    assert(a.history.size == 2)
  }

  test("normalize staleness (AlertIfTooLongSinceLastNormalize, " +
    "alerting.go:243-279): fires past the threshold, 0 disables, " +
    "repeat-gap suppresses") {
    var now = 0L
    val a = new Alerter(Seq(Sender(1)), gapMinutes = 15,
      clock = () => now)
    assert(a.alertIfTooLongSinceLastNormalize("m", 239, 240).isEmpty)
    assert(a.alertIfTooLongSinceLastNormalize("m", 500, 0).isEmpty)
    val fired = a.alertIfTooLongSinceLastNormalize("m", 241, 240)
    assert(fired.size == 1 &&
      fired.head.message.contains("241 minutes"))
    now = 14 * 60000L // inside the gap
    assert(a.alertIfTooLongSinceLastNormalize("m", 255, 240).isEmpty)
    now = 16 * 60000L // past it
    assert(a.alertIfTooLongSinceLastNormalize("m", 257, 240).size == 1)
  }
}
