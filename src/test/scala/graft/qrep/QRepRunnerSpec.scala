package graft.qrep

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QRepRunnerSpec extends SparkSpec {

  test("incremental append: watermark advances, no re-pull") {
    import spark.implicits._
    val base = tmpDir("qrep")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm", WriteMode.Append, 4))
    val src1 = spark.range(1, 101).selectExpr("id AS k", "id * 2 AS v")
    assert(runner.runOnce(src1) == 100)
    assert(runner.runOnce(src1) == 0)
    val src2 = spark.range(1, 151).selectExpr("id AS k", "id * 2 AS v")
    assert(runner.runOnce(src2) == 50)
    assert(spark.read.parquet(s"$base/dest").count() == 150)
  }

  test("TIMESTAMP watermark: sub-second precision survives the range " +
    "math and incremental resume (updated_at is the real-world " +
    "watermark; truncation to seconds double-pulls or misses rows)") {
    val base = tmpDir("qrepts")
    val runner = new QRepRunner(spark, QRepConfig(
      "updated_at", s"$base/dest", s"$base/wm", WriteMode.Append, 4))
    // 100 rows spread across FEWER THAN 100 distinct seconds: several
    // rows per second, microsecond-distinct
    val src1 = spark.range(0, 100).selectExpr("id AS k",
      "timestamp_micros(CAST(1700000000000000 + id * 250000 AS BIGINT))" +
        " AS updated_at")
    assert(runner.runOnce(src1) == 100)
    assert(runner.runOnce(src1) == 0, "re-run must pull nothing")
    // 40 new rows continuing at 250ms spacing, same-second overlap
    // with the last pulled second
    val src2 = spark.range(0, 140).selectExpr("id AS k",
      "timestamp_micros(CAST(1700000000000000 + id * 250000 AS BIGINT))" +
        " AS updated_at")
    assert(runner.runOnce(src2) == 40, "exactly the delta, no re-pull")
    assert(spark.read.parquet(s"$base/dest").count() == 140)
  }

  test("TIMESTAMP watermark + upsert: updated rows past the high-water " +
    "mark re-pull and their MICROS-stamped versions win the merge") {
    val base = tmpDir("qreptsup")
    val runner = new QRepRunner(spark, QRepConfig(
      "updated_at", s"$base/dest", s"$base/wm",
      WriteMode.Upsert(Seq("k")), 4))
    def src(v: String, extraMicros: Long) =
      spark.range(0, 10).selectExpr("id AS k", s"'$v' AS payload",
        "timestamp_micros(CAST(1700000000000000 + id * 250000 + " +
          s"$extraMicros AS BIGINT)) AS updated_at")
    assert(runner.runOnce(src("old", 0)) == 10)
    // all rows updated past the watermark, sub-second apart — the
    // upsert version must be the exact micros image (a cast-to-long
    // timestamp is an ANALYSIS ERROR; a seconds image would still
    // order these, but only micros matches the stored watermark and
    // re-pulls exactly the delta)
    assert(runner.runOnce(src("new", 3 * 1000000L)) == 10)
    val out = spark.read.parquet(s"$base/dest")
      .filter("NOT _peerdb_is_deleted")
    assert(out.count() == 10)
    assert(out.filter("payload = 'new'").count() == 10,
      "re-pulled updates must win the merge")
    // steady state: nothing re-pulls
    assert(runner.runOnce(src("new", 3 * 1000000L)) == 0)
  }

  test("DATE watermark: epoch-day image partitions and resumes") {
    val base = tmpDir("qrepdate")
    val runner = new QRepRunner(spark, QRepConfig(
      "d", s"$base/dest", s"$base/wm", WriteMode.Append, 4))
    val src1 = spark.range(0, 50).selectExpr("id AS k",
      "date_add(DATE'2024-01-01', CAST(id AS INT)) AS d")
    assert(runner.runOnce(src1) == 50)
    assert(runner.runOnce(src1) == 0)
    val src2 = spark.range(0, 60).selectExpr("id AS k",
      "date_add(DATE'2024-01-01', CAST(id AS INT)) AS d")
    assert(runner.runOnce(src2) == 10)
    assert(spark.read.parquet(s"$base/dest").count() == 60)
  }

  test("num_rows_per_partition chunks by row count (stats catalog " +
    "records one partition per chunk)") {
    val base = tmpDir("qrepchunk")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm", WriteMode.Append, 4,
      rowsPerPartition = Some(30L),
      statsDir = Some(s"$base/stats"), flowName = "chunked"))
    val src = spark.range(1, 101).selectExpr("id AS k", "id * 2 AS v")
    assert(runner.runOnce(src) == 100)
    val st = new graft.mirror.StatsCatalog(s"$base/stats",
      spark.sparkContext.hadoopConfiguration)
    // 100 rows at 30/partition → 4 chunks, plus the first-run
    // NULL-watermark partition the runner always schedules
    assert(st.table(spark, "qrep_partitions").count() == 5)
    assert(spark.read.parquet(s"$base/dest").count() == 100)
    assert(runner.runOnce(src) == 0)
  }

  test("scheduler retries transient round failures (alive with " +
    "lastError visible, success clears it); a sustained failure " +
    "streak stops the loop for SHOW MIRRORS to surface") {
    // fails 3 rounds then succeeds forever
    var calls = 0
    val flaky = new QRepScheduler(() => {
      calls += 1
      if (calls <= 3) throw new RuntimeException(s"blip $calls")
      1L
    }, refreshIntervalMs = 10L).start()
    val deadline = System.currentTimeMillis + 10000
    while (flaky.progress._2 < 2 &&
      System.currentTimeMillis < deadline) Thread.sleep(10)
    assert(flaky.isAlive, "loop must survive transient failures")
    assert(flaky.progress._2 >= 2, "rounds after recovery must count")
    assert(flaky.lastError.isEmpty, "success clears lastError")
    flaky.stop(); flaky.awaitStopped()

    // permanent failure: stops after the consecutive cap, error kept
    val dead = new QRepScheduler(
      () => throw new RuntimeException("gone"),
      refreshIntervalMs = 1L).start()
    val d2 = System.currentTimeMillis + 15000
    while (dead.isAlive && System.currentTimeMillis < d2)
      Thread.sleep(10)
    assert(!dead.isAlive, "sustained failure must stop the loop")
    assert(dead.lastError.exists(_.getMessage == "gone"))
  }

  test("overwrite mode replaces the destination wholesale") {
    val base = tmpDir("qrepow")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm", WriteMode.Overwrite, 4))
    val v1 = spark.range(1, 4).selectExpr("id AS k", "id * 2 AS v")
    assert(runner.runOnce(v1) == 3)
    assert(spark.read.parquet(s"$base/dest").count() == 3)
    // New snapshot with fewer, different rows: truncate+insert semantics.
    val v2 = spark.range(10, 12).selectExpr("id AS k", "id * 3 AS v")
    assert(runner.runOnce(v2) == 2)
    val rows = spark.read.parquet(s"$base/dest").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap
    assert(rows == Map(10L -> 30L, 11L -> 33L))
  }

  test("NULL-watermark rows: dedicated partition, first run only") {
    import spark.implicits._
    val base = tmpDir("qrepnull")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm", WriteMode.Append, 4))
    val withNulls = spark.range(1, 51)
      .selectExpr("id AS k", "id AS v")
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], 999L),
        (null.asInstanceOf[java.lang.Long], 998L)).toDF("k", "v"))
    assert(runner.runOnce(withNulls) == 52) // 50 ranged + 2 null-partition
    // second run: null rows must NOT be re-pulled
    assert(runner.runOnce(withNulls) == 0)
    val dest = spark.read.parquet(s"$base/dest")
    assert(dest.count() == 52)
    assert(dest.filter(col("k").isNull).count() == 2)
  }

  test("null-only first round: sentinel watermark, pulled exactly once") {
    import spark.implicits._
    val base = tmpDir("qrepnullonly")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm", WriteMode.Append, 4))
    val nullOnly = Seq(
      (null.asInstanceOf[java.lang.Long], 1L),
      (null.asInstanceOf[java.lang.Long], 2L)).toDF("k", "v")
    assert(runner.runOnce(nullOnly) == 2)
    // Without the sentinel the store stays empty and every round re-pulls
    // the NULL partition — duplicates in Append mode.
    assert(runner.runOnce(nullOnly) == 0)
    assert(runner.runOnce(nullOnly) == 0)
    assert(spark.read.parquet(s"$base/dest").count() == 2)
    // Non-null rows arriving later are still picked up past the sentinel.
    val grown = nullOnly.unionByName(Seq((5L, 50L)).toDF("k", "v"))
    assert(runner.runOnce(grown) == 1)
    assert(spark.read.parquet(s"$base/dest").count() == 3)
  }

  test("writeDisposition upsert: transformRow applies to the MERGED " +
    "changes, not only the append payload (a transform silently " +
    "dropped on the xmin upsert path would merge untransformed rows)") {
    import spark.implicits._
    val base = tmpDir("qrepwdlua")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm",
      WriteMode.Upsert(Seq("k")), 2,
      transformLua = Some(
        "function transformRow(row) row.v = row.v * 10 end")))
    val frame = Seq((1L, 3L, 100L), (2L, 4L, 101L))
      .toDF("k", "v", "xmin")
    assert(runner.writeDisposition(frame, Some("xmin")) == 2)
    val st = spark.read.parquet(s"$base/dest")
      .select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st == Map(1L -> 30L, 2L -> 40L),
      "the merged destination must hold TRANSFORMED values")
    // and the versionFrom column never reaches the destination
    assert(!spark.read.parquet(s"$base/dest").columns.contains("xmin"))
  }

  test("upsert: NULL-watermark rows get version 0, not all-null merges") {
    import spark.implicits._
    val base = tmpDir("qrepupnull")
    // Round 1 populates the destination …
    new QRepRunner(spark, QRepConfig(
      "w", s"$base/dest", s"$base/wm1",
      WriteMode.Upsert(Seq("id")), 2))
      .runOnce(Seq((1L, java.lang.Long.valueOf(10L), "a"))
        .toDF("id", "w", "name"))
    // … then a watermark-store reset (resync) re-pulls over the EXISTING
    // destination, this time including a NULL-watermark row. A NULL
    // version would fail every srcWins comparison and merge all-null rows;
    // it must land as version 0 instead.
    val withNull = Seq(
      (1L, java.lang.Long.valueOf(10L), "a"),
      (2L, null.asInstanceOf[java.lang.Long], "n"))
      .toDF("id", "w", "name")
    new QRepRunner(spark, QRepConfig(
      "w", s"$base/dest", s"$base/wm2",
      WriteMode.Upsert(Seq("id")), 2)).runOnce(withNull)
    val st = spark.read.parquet(s"$base/dest")
      .select("id", "name", graft.model.RawTable.Version).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(st == Map(1L -> (("a", 10L)), 2L -> (("n", 0L))))
  }

  test("scheduler: repeated rounds pick up source growth, stop is clean") {
    val base = tmpDir("qrepsched")
    val srcDir = s"$base/src"
    spark.range(1, 51).selectExpr("id AS k", "id AS v")
      .write.parquet(srcDir)
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/dest", s"$base/wm", WriteMode.Append, 2))
    val sched = new QRepScheduler(runner,
      () => spark.read.parquet(srcDir), refreshIntervalMs = 200).start()
    try {
      eventually(spark.read.parquet(s"$base/dest").count() == 50,
        "initial load")
      // grow the source; a later round must pick up exactly the delta
      spark.range(51, 81).selectExpr("id AS k", "id AS v")
        .write.mode("append").parquet(srcDir)
      eventually(spark.read.parquet(s"$base/dest").count() == 80,
        "incremental delta")
    } finally {
      sched.stop()
      sched.awaitStopped()
    }
    val (rounds, moved) = sched.progress
    assert(rounds >= 2)
    assert(moved == 80)
  }

  private def eventually(cond: => Boolean, what: String,
      timeoutMs: Long = 30000): Unit = {
    val t0 = System.currentTimeMillis()
    def ok = scala.util.Try(cond).getOrElse(false)
    while (!ok) {
      if (System.currentTimeMillis() - t0 > timeoutMs)
        fail(s"timed out: $what")
      Thread.sleep(200)
    }
  }

  test("upsert mode dedups by watermark version") {
    import spark.implicits._
    val base = tmpDir("qrepup")
    val runner = new QRepRunner(spark, QRepConfig(
      "w", s"$base/dest", s"$base/wm",
      WriteMode.Upsert(Seq("id")), 2))
    val v1 = Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "w", "name")
    runner.runOnce(v1)
    // same keys reappear with a later watermark → update, not duplicate
    val v2 = Seq((1L, 30L, "a2"), (3L, 31L, "c")).toDF("id", "w", "name")
    runner.runOnce(v2)
    val st = spark.read.parquet(s"$base/dest")
      .select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(st == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("LivePgXmin.epochExtended: xmin-derived versions stay monotone " +
    "across 32-bit xid wraparound (backward-only epoch extension)") {
    import spark.implicits._
    val epoch5 = 5L << 32
    val next = epoch5 + 600L // snapshot xid8: epoch 5, low word 600
    val got = Seq(4294967000L, 500L, 100L, 650L).toDF("xmin")
      .select(LivePgXmin.epochExtended(
        org.apache.spark.sql.functions.col("xmin"), next).as("v"))
      .collect().map(_.getLong(0))
    // a late-epoch-4 xid maps BACK one epoch; everything near or
    // below the snapshot's low word stays in the current epoch
    // (ancient frozen xmins included — below any future update)
    assert(got.toSeq == Seq((4L << 32) + 4294967000L, epoch5 + 500L,
      epoch5 + 100L, epoch5 + 650L))
    // the ordering that motivated this: an update committed AFTER the
    // wrap must beat one committed just BEFORE it — raw 32-bit values
    // would invert this comparison forever
    assert(got(1) > got(0))
  }

  test("rows-moved is counted INSIDE the one write job: the pull " +
    "executes exactly once per round on every parquet leg (a " +
    "post-write .count() re-ran the entire pull — at a 100 TB " +
    "initial load, a second full source scan per round)") {
    val evals = spark.sparkContext.longAccumulator("pull_evals")
    val tick = udf { (v: Long) => evals.add(1L); v }
    // the ticking column is deterministic, so the watermark probes
    // prune it away — only jobs that MOVE rows evaluate it
    def src(n: Long) = spark.range(1, n + 1).selectExpr("id AS k")
      .withColumn("v", tick(col("k") * 2))

    val base = tmpDir("qreponce")
    val app = new QRepRunner(spark, QRepConfig(
      "k", s"$base/a", s"$base/awm", WriteMode.Append, 4))
    assert(app.runOnce(src(200)) == 200L)
    assert(evals.value == 200L,
      s"append leg evaluated the pull ${evals.value / 200.0}x")

    evals.reset()
    val ow = new QRepRunner(spark, QRepConfig(
      "k", s"$base/o", s"$base/owm", WriteMode.Overwrite, 4))
    assert(ow.runOnce(src(200)) == 200L)
    assert(evals.value == 200L,
      s"overwrite leg evaluated the pull ${evals.value / 200.0}x")

    evals.reset()
    val up = new QRepRunner(spark, QRepConfig(
      "k", s"$base/u", s"$base/uwm", WriteMode.Upsert(Seq("k")), 4))
    assert(up.runOnce(src(200)) == 200L)
    assert(evals.value == 200L,
      s"upsert first-round evaluated the pull ${evals.value / 200.0}x")
  }
}
