package graft

import org.apache.spark.sql.SparkSession

import graft.qrep.{QRepConfig, QRepRunner, WriteMode}
import graft.sinks.KafkaTestBroker

/** Soak of the two r14 QRep destinations at 10× their spec scale
  * (opt-in):
  *
  *   sbt "Test/runMain graft.QRepDestSoak [rowsPerRound] [rounds]"
  *
  * (a) QRep → kafka:// queue destination: `rounds` incremental
  *     append rounds of `rowsPerRound` rows each publish through the
  *     typed `onRecord` leg (DefaultOnRecord JSON image) against the
  *     live-wire fixture broker — rec/s per round and the flatness of
  *     the per-round cost are what NOTES records (a growing round
  *     time would mean the leg re-reads or re-publishes history).
  * (b) QRep → s3path:// file-Avro destination with file ROLLING
  *     engaged (`bytes_per_avro_file` far below a round's payload):
  *     per-round file counts must exceed the partition count (rolling
  *     proof), rounds must stay non-overlapping, and the manifest
  *     record total must equal rounds × rowsPerRound exactly.
  */
object QRepDestSoak {

  def main(args: Array[String]): Unit = {
    val rowsPerRound = args.headOption.map(_.toLong).getOrElse(100000L)
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(10)

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-qrep-dest-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files
      .createTempDirectory("qrepdestsoak").toString

    def src(hi: Long) = spark.range(1, hi + 1).selectExpr(
      "id AS k", "id * 2 AS v",
      "repeat('x', 64) AS pad") // ~90 B/row payload

    // ---------------------------------------------------- kafka leg
    val broker = KafkaTestBroker.start()
    try {
      val r = new QRepRunner(spark, QRepConfig(
        "k", s"$base/kdest", s"$base/kwm", WriteMode.Append, 8,
        destUrl = Some(s"kafka://127.0.0.1:${broker.port}"),
        destTable = "soak_topic", sourceTable = "soak",
        flowName = "ksoak"))
      println(s"== kafka:// QRep leg: $rounds rounds x $rowsPerRound ==")
      var times = Vector.empty[Double]
      for (i <- 1 to rounds) {
        val t0 = System.nanoTime()
        val moved = r.runOnce(src(rowsPerRound * i))
        val dt = (System.nanoTime() - t0) / 1e9
        times :+= dt
        assert(moved == rowsPerRound, s"round $i moved $moved")
        println(f"round $i%2d: $moved rows in $dt%6.2f s " +
          f"(${moved / dt}%,.0f rec/s)")
      }
      val total = broker.topicRecords("soak_topic").size.toLong
      assert(total == rowsPerRound * rounds,
        s"broker holds $total, expected ${rowsPerRound * rounds}")
      if (rounds >= 4) {
        val firstHalf = times.take(rounds / 2).sum / (rounds / 2)
        val lastHalf =
          times.drop(rounds / 2).sum / (rounds - rounds / 2)
        println(f"kafka leg: first-half avg $firstHalf%.2f s, " +
          f"last-half avg $lastHalf%.2f s " +
          f"(growth x${lastHalf / firstHalf}%.2f)")
        assert(lastHalf < firstHalf * 1.8,
          "per-round cost grows — the queue leg is re-reading history")
      }
    } finally broker.stop()

    // --------------------------------------------------- s3path leg
    val r2 = new QRepRunner(spark, QRepConfig(
      "k", s"$base/ignored", s"$base/awm", WriteMode.Append, 8,
      destUrl = Some(s"s3path://$base/avro"),
      flowName = "asoak", stageCodec = "deflate",
      stageBytesPerFile = 256L << 10)) // 256 KiB → ~4 rolls/partition
    println(s"== s3path:// QRep leg: $rounds rounds x $rowsPerRound, " +
      "256 KiB roll ==")
    var times2 = Vector.empty[Double]
    for (i <- 1 to rounds) {
      val t0 = System.nanoTime()
      val moved = r2.runOnce(src(rowsPerRound * i))
      val dt = (System.nanoTime() - t0) / 1e9
      times2 :+= dt
      assert(moved == rowsPerRound, s"round $i moved $moved")
      println(f"round $i%2d: $moved rows in $dt%6.2f s " +
        f"(${moved / dt}%,.0f rec/s)")
    }
    // rolling + manifest accounting over the whole flow dir
    val hc = spark.sparkContext.hadoopConfiguration
    val flowDir = new org.apache.hadoop.fs.Path(s"$base/avro/asoak")
    val fs = flowDir.getFileSystem(hc)
    val roundDirs = fs.listStatus(flowDir).map(_.getPath).toSeq
    assert(roundDirs.size == rounds, s"${roundDirs.size} round dirs")
    var totalRecords = 0L
    var totalFiles = 0
    roundDirs.foreach { rd =>
      val files = fs.listStatus(rd).map(_.getPath.getName)
        .filter(_.endsWith(".avro"))
      assert(files.length > 8,
        s"$rd: ${files.length} files — rolling did not engage")
      totalFiles += files.length
      val manifest = new String(graft.util.FsText
        .read(s"$rd/manifest.json", hc).get.getBytes("UTF-8"))
      val rec = """"records":(\d+)""".r.findFirstMatchIn(manifest)
        .get.group(1).toLong
      assert(rec == rowsPerRound, s"$rd manifest says $rec")
      totalRecords += rec
    }
    println(f"s3path leg: $totalFiles files over $rounds rounds " +
      f"(rolling engaged), $totalRecords%,d records accounted")
    assert(totalRecords == rowsPerRound * rounds)
    if (rounds >= 4) {
      val f2 = times2.take(rounds / 2).sum / (rounds / 2)
      val l2 = times2.drop(rounds / 2).sum / (rounds - rounds / 2)
      println(f"s3path leg: first-half avg $f2%.2f s, last-half avg " +
        f"$l2%.2f s (growth x${l2 / f2}%.2f)")
      assert(l2 < f2 * 1.8,
        "per-round cost grows — the avro leg is rewriting history")
    }

    spark.stop()
    println("QRepDestSoak PASS")
  }
}
