package graft.qrep

import graft.SparkSpec
import graft.sinks.AvroStage

/** QRep → file/object-store Avro destination (s3/qrep.go:18-105):
  * `dest_url 's3path://dir'` writes one OCF per partition under
  * `<dir>/<flow>/<roundKey>/` plus a manifest, codec-configurable.
  * Append rounds must produce NON-OVERLAPPING file sets that a
  * schema-free streamContainerAuto replay reads back equal. */
class QRepAvroDestSpec extends SparkSpec {

  private def hc = spark.sparkContext.hadoopConfiguration

  private def replay(dir: String): Seq[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hc)
    val it = fs.listFiles(p, true)
    val rows = Seq.newBuilder[(Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".avro")) {
        val in = fs.open(f.getPath)
        try {
          val (schema, rowsIt) = AvroStage.streamContainerAuto(in)
          assert(schema.fieldNames.toSeq == Seq("k", "v"))
          rowsIt.foreach(r => rows += ((r.getLong(0), r.getLong(1))))
        } finally in.close()
      }
    }
    rows.result()
  }

  private def manifests(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hc)
    val it = fs.listFiles(p, true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName == "manifest.json") {
        val in = fs.open(f.getPath)
        try out += new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
    }
    out.result()
  }

  test("append rounds write NON-OVERLAPPING round dirs; a " +
    "streamContainerAuto replay of every staged file equals the " +
    "union of the increments; each manifest closes its round with " +
    "the file list and record count") {
    val base = tmpDir("qrepavro")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/ignored", s"$base/wm", WriteMode.Append, 4,
      destUrl = Some(s"s3path://$base/out"),
      flowName = "avroflow", stageCodec = "deflate"))
    def src(n: Long) =
      spark.range(1, n + 1).selectExpr("id AS k", "id * 2 AS v")
    assert(runner.runOnce(src(100)) == 100L)
    assert(runner.runOnce(src(100)) == 0L, "no growth → no new round")
    assert(runner.runOnce(src(150)) == 50L, "exactly the increment")

    val rounds = {
      val p = new org.apache.hadoop.fs.Path(s"$base/out/avroflow")
      val fs = p.getFileSystem(hc)
      fs.listStatus(p).map(_.getPath.getName).toSeq.sorted
    }
    assert(rounds.size == 2, s"two rounds, got $rounds")
    assert(rounds == Seq("0-100", "100-150"),
      "round keys are the (exclusive-lo, hi] watermark bounds")

    val all = replay(s"$base/out/avroflow")
    assert(all.size == 150, "no overlap, no loss")
    assert(all.toMap == (1L to 150L).map(k => k -> k * 2).toMap)

    val ms = manifests(s"$base/out/avroflow").sorted
    assert(ms.size == 2)
    assert(ms.exists(m => m.contains("\"round\":\"0-100\"") &&
      m.contains("\"records\":100") &&
      m.contains("\"codec\":\"deflate\"") &&
      m.contains(".avro")))
    assert(ms.exists(m => m.contains("\"round\":\"100-150\"") &&
      m.contains("\"records\":50")))
  }

  test("a crashed round REWRITES its round dir on retry (same-key " +
    "overwrite, s3/qrep.go:113): stale partial files never merge " +
    "into the retry's file set") {
    val base = tmpDir("qrepavro_retry")
    val cfg = QRepConfig(
      "k", s"$base/ignored", s"$base/wm", WriteMode.Append, 4,
      destUrl = Some(s"s3path://$base/out"), flowName = "f")
    def src() =
      spark.range(1, 11).selectExpr("id AS k", "id * 2 AS v")
    // simulate a crashed attempt: partial garbage in the round dir
    // the bounds (0, 10] will map to
    val roundDir = s"$base/out/f/0-10"
    graft.util.FsText.write(s"$roundDir/part-99999.avro",
      "partial garbage from a dead executor", hc)
    assert(new QRepRunner(spark, cfg).runOnce(src()) == 10L)
    val names = {
      val p = new org.apache.hadoop.fs.Path(roundDir)
      val fs = p.getFileSystem(hc)
      fs.listStatus(p).map(_.getPath.getName).toSeq
    }
    assert(!names.contains("part-99999.avro"),
      "the stale partial file must be wiped, not merged")
    assert(replay(roundDir).toMap ==
      (1L to 10L).map(k => k -> k * 2).toMap)
  }

  test("Overwrite (full-refresh) wipes EVERY prior round dir: the " +
    "destination equals exactly this round — an accumulating file " +
    "set would union stale snapshots and resurrect deleted rows") {
    val base = tmpDir("qrepavro_ow")
    def runner() = new QRepRunner(spark, QRepConfig(
      "k", s"$base/ignored", s"$base/wm", WriteMode.Overwrite, 2,
      destUrl = Some(s"s3path://$base/out"), flowName = "f"))
    def src(lo: Long, hi: Long) = spark.range(lo, hi + 1)
      .selectExpr("id AS k", "id * 2 AS v")
    assert(runner().runOnce(src(1, 100)) == 100L)
    // the source SHRANK (rows deleted) — full refresh must not keep
    // the old 51-100 around
    assert(runner().runOnce(src(1, 50)) == 50L)
    assert(replay(s"$base/out/f").toMap ==
      (1L to 50L).map(k => k -> k * 2).toMap,
      "only the latest full snapshot survives")
    assert(manifests(s"$base/out/f").size == 1)
  }

  test("manifest record count comes from the ONE write job (an " +
    "accumulator), not a second execution of the pull: a " +
    "non-deterministic source still gets records == rows in files") {
    val base = tmpDir("qrepavro_count")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/ignored", s"$base/wm", WriteMode.Append, 2,
      destUrl = Some(s"s3path://$base/out"), flowName = "f"))
    // a source whose re-execution yields DIFFERENT rows: rand()-gated
    // (seedless rand re-draws per job). The files and the manifest
    // count must still agree because both come from the same job.
    val src = spark.range(1, 2001)
      .selectExpr("id AS k", "id * 2 AS v")
      .filter("rand() < 0.5 OR k <= 1000") // ≥1000 rows, jittery tail
    val moved = runner.runOnce(src)
    val inFiles = replay(s"$base/out/f").size
    assert(moved == inFiles,
      s"manifest/count says $moved, files hold $inFiles")
    val m = manifests(s"$base/out/f").head
    assert(m.contains(s""""records":$inFiles"""), m)
  }

  test("transformRow shapes the rows before they land in the OCFs " +
    "(AttachToStream applies to ANY destination, flowable.go:756)") {
    val base = tmpDir("qrepavro_lua")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/ignored", s"$base/wm", WriteMode.Append, 2,
      destUrl = Some(s"s3path://$base/out"), flowName = "f",
      transformLua =
        Some("function transformRow(row) row.v = row.v + 1000 end")))
    assert(runner.runOnce(
      spark.range(1, 4).selectExpr("id AS k", "id * 2 AS v")) == 3L)
    assert(replay(s"$base/out/f").toMap ==
      Map(1L -> 1002L, 2L -> 1004L, 3L -> 1006L))
  }

  test("s3_uuid_prefix (PEERDB_S3_UUID_PREFIX, dynamicconf.go:841): " +
    "each round lands under a FRESH uuid level — keys never collide " +
    "across job re-creations, and the whole file set still replays " +
    "to the union of the increments; Overwrite + prefix is rejected " +
    "(nothing to refresh against fresh keys)") {
    val base = tmpDir("qrepavro_uuid")
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/ignored", s"$base/wm", WriteMode.Append, 2,
      destUrl = Some(s"s3path://$base/out"), flowName = "f",
      s3UuidPrefix = true))
    def src(n: Long) =
      spark.range(1, n + 1).selectExpr("id AS k", "id * 2 AS v")
    assert(runner.runOnce(src(20)) == 20L)
    assert(runner.runOnce(src(30)) == 10L)
    val p = new org.apache.hadoop.fs.Path(s"$base/out")
    val fs = p.getFileSystem(hc)
    val uuidDirs = fs.listStatus(p).map(_.getPath.getName).toSeq
    assert(uuidDirs.size == 2, s"one uuid level per round: $uuidDirs")
    assert(uuidDirs.forall(_.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    assert(replay(s"$base/out").toMap ==
      (1L to 30L).map(k => k -> k * 2).toMap)

    val ow = new QRepRunner(spark, QRepConfig(
      "k", s"$base/ignored2", s"$base/wm2", WriteMode.Overwrite, 2,
      destUrl = Some(s"s3path://$base/out2"), flowName = "f",
      s3UuidPrefix = true))
    val e = intercept[IllegalArgumentException] { ow.runOnce(src(5)) }
    assert(e.getMessage.contains("same-key layout"))
  }

  test("DDL: dest_url 's3path://…' through CREATE/EXECUTE MIRROR; " +
    "dst_table_full_resync against a file destination is rejected") {
    import org.apache.spark.sql.SparkSession
    val s = spark.newSession()
    SparkSession.setActiveSession(s)
    try {
      def run(sql: String) = graft.mirror.GraftSql.execute(s,
        graft.mirror.GraftSql.parse(sql)
          .getOrElse(fail(s"did not parse: $sql")))
      val base = tmpDir("qrepavroddl")
      s.range(1, 31).selectExpr("id AS k", "id * 3 AS v")
        .write.parquet(s"$base/src/rows.parquet")
      run(s"CREATE PEER qasrc TYPE parquet OPTIONS (dir '$base/src')")
      run(s"CREATE PEER qadst TYPE parquet OPTIONS (dir '$base/dst')")
      run("CREATE MIRROR qa FROM qasrc TO qadst FOR " +
        "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
        "{{.end}} $$ WITH (watermark_column 'k', " +
        s"source_table 'rows', dest_dir '$base/dest', " +
        s"dest_url 's3path://$base/files', flow_name 'ddlflow', " +
        "stage_codec 'deflate')")
      assert(run("EXECUTE MIRROR qa").head.getLong(0) == 30L)
      assert(replay(s"$base/files/ddlflow").size == 30)
      assert(run("EXECUTE MIRROR qa").head.getLong(0) == 0L)

      val e = intercept[IllegalArgumentException] {
        run("CREATE MIRROR qabad FROM qasrc TO qadst FOR " +
          "$$ SELECT k, v FROM rows WHERE k BETWEEN {{.start}} AND " +
          "{{.end}} $$ WITH (watermark_column 'k', " +
          s"source_table 'rows', dest_dir '$base/dest2', " +
          s"dest_url 's3path://$base/files2', mode 'overwrite', " +
          "dst_table_full_resync 'true')")
      }
      assert(e.getMessage.contains("no table to swap"))
      run("DROP MIRROR qa") // shared catalog: leave nothing behind
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("Overwrite + transformRow: the full-refresh payload is the " +
    "TRANSFORMED stream (AttachToStream spans every disposition — " +
    "handing the raw source to the refresh leg silently shipped " +
    "untransformed rows); a flow name carrying a quote still " +
    "produces a VALID-JSON manifest") {
    val base = tmpDir("qrepavro_owlua")
    val flow = "f\"low"
    val runner = new QRepRunner(spark, QRepConfig(
      "k", s"$base/ignored", s"$base/wm", WriteMode.Overwrite, 2,
      destUrl = Some(s"s3path://$base/out"), flowName = flow,
      transformLua =
        Some("function transformRow(row) row.v = row.v + 1000 end")))
    assert(runner.runOnce(
      spark.range(1, 4).selectExpr("id AS k", "id * 2 AS v")) == 3L)
    assert(replay(s"$base/out").toMap ==
      Map(1L -> 1002L, 2L -> 1004L, 3L -> 1006L))
    val m = manifests(s"$base/out").head
    val parsed = spark.read.json(spark.createDataset(Seq(m))(
      org.apache.spark.sql.Encoders.STRING))
    assert(!parsed.columns.contains("_corrupt_record"),
      s"manifest is not valid JSON: $m")
    val row = parsed.select("flow", "records").head
    assert(row.getString(0) == flow, "flow name round-trips escaped")
    assert(row.getLong(1) == 3L)
  }
}
