package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cdc.ChangeLogWal
import graft.mirror.{MirrorConfig, MirrorRunner, StatsCatalog}
import graft.model.ChangeRecord

/** Empirical scale soak for the CDC MIRROR LOOP itself — the query
  * soak (graft.Soak) found two real scale-killers in the query
  * registry; this drives the same methodology through the mirror path
  * (WAL → raw append → normalize → merge → stats → retention):
  *
  *   1. CATCH-UP: a multi-record backlog (inserts + updates + deletes
  *      in whole transactions) drains through `runAvailableNow` in
  *      `maxBatchSize` micro-batches — the post-downtime shape the
  *      reference's "100s of GB" pitch describes;
  *   2. STEADY CHURN: rounds of update bursts against the
  *      now-populated destination — the regime where per-batch cost
  *      must track BATCH size, not destination size growth beyond the
  *      one merge read;
  *   3. VERIFY: the destination must equal a driver-side replay of the
  *      deterministic op stream exactly (row count, live count, and a
  *      full value checksum) — a throughput number over wrong rows is
  *      worthless.
  *
  * Per phase, one JSON line with wall seconds, records/s, shuffle
  * read/write, spill, batch count (from the stats catalog — the same
  * rows ops reads), and raw-retention state. Run at 1×/10×/100× in a
  * QUIET JVM:
  *
  *   sbt "runMain graft.MirrorSoak /tmp/graft_msoak 100000 5 20000"
  *   sbt "runMain graft.MirrorSoak /tmp/graft_msoak 1000000 5 100000"
  *   sbt "runMain graft.MirrorSoak /tmp/graft_msoak 10000000 5 250000"
  */
object MirrorSoak {

  private val Pad = "x" * 120 // realistic row width (~200B JSON)

  /** Deterministic op stream: record i of the catch-up is an INSERT of
    * id=i while i < keys, then cycling updates with every 20th an
    * op-stream DELETE; churn round r is `churnRecords` updates over
    * ids (r*31 + j*7) % keys. The driver-side replay in [[expected]]
    * walks the same function — the mirror must land exactly this. */
  private def catchupOp(i: Long, keys: Long): (Int, Long, Long) = {
    if (i < keys) (ChangeRecord.TypeInsert, i, i)
    else if (i % 20 == 0) (ChangeRecord.TypeDelete, i % keys, i)
    else (ChangeRecord.TypeUpdate, i % keys, i)
  }
  private def churnOp(round: Int, j: Long, keys: Long): (Long, Long) =
    ((round * 31L + j * 7L) % keys, 1000000L * round + j)

  private def rec(cp: Long, rt: Int, id: Long, v: Long): ChangeRecord = {
    val data = s"""{"id":$id,"v":$v,"pad":"$Pad"}"""
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10,
      "public.t", "dest.t", data,
      if (rt == ChangeRecord.TypeDelete) s"""{"id":$id}""" else null,
      Nil)
  }

  /** Optional 5th arg `lua`: attach a `transformRecord` adapt stage
    * ([[graft.transform.LuaAdapt]]) to the mirror — per-record
    * interpreter work (decimal-free: an integer double + a pattern
    * `string.upper` over the 120-char pad) so the END-TO-END rec/s
    * with the stage attached is pinned, not just the single-threaded
    * MicroBench ceiling. The verify phase replays the doubled values,
    * so a dropped or double-applied transform fails the checksum. */
  private val AdaptScript = """
    function transformRecord(r)
      local row = r.row
      if row then
        row.v = row.v * 2
        row.pad = string.upper(row.pad)
      end
    end"""

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: MirrorSoak <workDir> <catchupRecords> <churnRounds> " +
        "<churnRecords> [lua]")
    val work = args(0)
    val catchup = args(1).toLong
    val churnRounds = args(2).toInt
    val churnRecords = args(3).toLong
    val withLua = args.length > 4 && args(4) == "lua"
    val keys = math.max(1L, catchup / 2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-mirror-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new Soak.ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    val stamp = System.nanoTime().toHexString
    val base = s"$work/run_$stamp"
    val wal = s"$base/wal"
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v BIGINT, pad STRING"),
      destinationTable = "dest.t", flowName = "soak",
      statsDir = Some(s"$base/stats"),
      luaScript = if (withLua) Some(AdaptScript) else None,
      // raw retention ON: the soak must show cleanup keeping pace
      env = Map("mirror.raw_batch_cleanup_threshold" -> "2"))
    if (withLua) println("""{"phase":"config","lua":"transformRecord"}""")

    // ---- generate the catch-up WAL in whole-transaction chunks
    // scalastyle:off println
    val genT0 = System.nanoTime()
    val chunk = 250000
    var cp = 0L
    var i = 0L
    while (i < catchup) {
      val n = math.min(chunk.toLong, catchup - i).toInt
      val recs = new Array[ChangeRecord](n)
      var j = 0
      while (j < n) {
        val (rt, id, v) = catchupOp(i + j, keys)
        recs(j) = rec(cp, rt, id, v)
        cp += 1
        j += 1
      }
      // cp advances 1/record and tx = cp/10: chunks of 250k always cut
      // at a tx boundary (250k % 10 == 0) — the WAL writer invariant
      ChangeLogWal.append(wal, recs.toSeq)
      i += n
    }
    val genSecs = (System.nanoTime() - genT0) / 1e9
    println(f"""{"phase":"generate","records":$catchup,""" +
      f""""keys":$keys,"seconds":$genSecs%.1f}""")

    // ---- phase 1: catch-up drain
    tally.reset()
    val t0 = System.nanoTime()
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()
    val catchupSecs = (System.nanoTime() - t0) / 1e9
    val stats = new StatsCatalog(s"$base/stats")
    def batchStats(): (Long, Double, Double, Double) = {
      val b = stats.table(spark, "cdc_batches")
        .filter(col("end_time").isNotNull && col("start_time").isNotNull)
        .select(((col("end_time") - col("start_time")) / 1000.0)
          .as("secs"))
        .agg(count(lit(1)), min("secs"), avg("secs"), max("secs")).head
      (b.getLong(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    }
    val (nb, minB, avgB, maxB) = batchStats()
    def rawParts(): Int = {
      val d = new java.io.File(s"$base/raw")
      if (!d.exists()) 0
      else d.listFiles().count(_.getName.startsWith("_peerdb_batch_id="))
    }
    println(f"""{"phase":"catchup","records":$catchup,""" +
      f""""seconds":$catchupSecs%.1f,""" +
      f""""recs_per_sec":${(catchup / catchupSecs).toLong},""" +
      f""""batches":$nb,"batch_secs_min":$minB%.2f,""" +
      f""""batch_secs_avg":$avgB%.2f,"batch_secs_max":$maxB%.2f,""" +
      f""""shuffle_read_mb":${tally.shuffleRead / 1048576},""" +
      f""""shuffle_write_mb":${tally.shuffleWrite / 1048576},""" +
      f""""spill_mb":${tally.spill / 1048576},""" +
      f""""raw_parts":${rawParts()}}""")

    // ---- phase 2: steady churn rounds
    (1 to churnRounds).foreach { round =>
      val recs = new Array[ChangeRecord](churnRecords.toInt)
      var j = 0L
      while (j < churnRecords) {
        val (id, v) = churnOp(round, j, keys)
        recs(j.toInt) = rec(cp, ChangeRecord.TypeUpdate, id, v)
        cp += 1
        j += 1
      }
      ChangeLogWal.append(wal, recs.toSeq)
      tally.reset()
      val r0 = System.nanoTime()
      new MirrorRunner(spark, cfg).runAvailableNow()
      val secs = (System.nanoTime() - r0) / 1e9
      println(f"""{"phase":"churn","round":$round,""" +
        f""""records":$churnRecords,"seconds":$secs%.1f,""" +
        f""""recs_per_sec":${(churnRecords / secs).toLong},""" +
        f""""shuffle_read_mb":${tally.shuffleRead / 1048576},""" +
        f""""shuffle_write_mb":${tally.shuffleWrite / 1048576},""" +
        f""""spill_mb":${tally.spill / 1048576},""" +
        f""""raw_parts":${rawParts()}}""")
    }

    // ---- phase 3: exact verification against the driver-side replay
    // (the adapt stage doubles every v: the replay doubles too — a
    // dropped or double-applied transform fails the checksum)
    val (expLive, expSum0) = expected(catchup, churnRounds,
      churnRecords, keys)
    val expSum = if (withLua) expSum0 * 2 else expSum0
    val dest = new MirrorRunner(spark, cfg).destination()
    val agg = dest.agg(
      count(lit(1)),
      sum(when(!col("_peerdb_is_deleted"), 1L).otherwise(0L)),
      sum(when(!col("_peerdb_is_deleted"), col("v"))
        .otherwise(0L))).head
    val (rows, live, vsum) =
      (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    // dest rows = live + soft-deleted TOMBSTONES; a key whose insert
    // and delete collapse inside one micro-batch never lands at all
    // (normalize keeps the last image; the merge's NOT-MATCHED branch
    // has nothing to tombstone), so total row count is batch-layout-
    // dependent — the exact invariants are the LIVE count and the
    // full value checksum
    val ok = rows >= live && live == expLive && vsum == expSum
    println(s"""{"phase":"verify","dest_rows":$rows,""" +
      s""""live_rows":$live,"expected_live":$expLive,""" +
      s""""v_checksum":$vsum,"expected_checksum":$expSum,"ok":$ok}""")
    if (!ok) sys.exit(1)
    spark.stop()
  }

  /** Driver-side replay of the deterministic op stream → (live rows,
    * Σ v over live rows). O(records) longs — trivial even at 100×. */
  private def expected(catchup: Long, churnRounds: Int,
      churnRecords: Long, keys: Long): (Long, Long) = {
    val v = new Array[Long](keys.toInt)
    val deleted = new Array[Boolean](keys.toInt)
    var i = 0L
    while (i < catchup) {
      val (rt, id, value) = catchupOp(i, keys)
      if (rt == ChangeRecord.TypeDelete) deleted(id.toInt) = true
      else { v(id.toInt) = value; deleted(id.toInt) = false }
      i += 1
    }
    var round = 1
    while (round <= churnRounds) {
      var j = 0L
      while (j < churnRecords) {
        val (id, value) = churnOp(round, j, keys)
        v(id.toInt) = value
        deleted(id.toInt) = false
        j += 1
      }
      round += 1
    }
    var live = 0L
    var sum = 0L
    var k = 0
    while (k < keys.toInt) {
      if (!deleted(k)) { live += 1; sum += v(k) }
      k += 1
    }
    (live, sum)
  }
}
