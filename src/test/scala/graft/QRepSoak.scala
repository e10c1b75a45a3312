package graft

import org.apache.spark.sql.SparkSession

import graft.cdc.StockPostgres
import graft.mirror.SnapshotFlow
import graft.qrep.{LivePgPull, QRepConfig, QRepRunner, WriteMode}

/** Live-PG pull soak (opt-in): throughput of the two live read paths
  * against a REAL stock PostgreSQL server at 100k/1M rows —
  *
  *   sbt "Test/runMain graft.QRepSoak [rows] [partitions]"
  *
  * Measures (a) a full live-QRep round (exported snapshot + min/max
  * probe + partition-parallel bound queries + JSON decode + parquet
  * write through QRepRunner), (b) an incremental round (10% new
  * rows), (c) an idle round (probe-only floor), and (d) the CTID
  * snapshot read ([[SnapshotFlow.readTable]]) over the same table.
  * The numbers this prints are the ones NOTES.md's live-pull table
  * records. */
object QRepSoak {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val parts = args.drop(1).headOption.map(_.toInt).getOrElse(8)

    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-qrep-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val server = StockPostgres.start().getOrElse {
      System.err.println("stock postgres unavailable; soak skipped")
      return
    }
    try {
      val s = server
      println(s"== QRepSoak rows=$rows partitions=$parts ==")
      s.psql("CREATE TABLE public.soak (id bigint PRIMARY KEY, " +
        "wm bigint, v bigint, payload text)")
      val t0 = System.nanoTime()
      s.psql("INSERT INTO public.soak SELECT g, g, g * 3, " +
        s"'payload-' || g || '-' || repeat('x', 80) " +
        s"FROM generate_series(1, $rows) g")
      // the deployment posture: watermark columns are indexed (the
      // reference's docs require it for QRep) — without this every
      // sub-range BETWEEN is a full seq scan per partition
      s.psql("CREATE INDEX ON public.soak (wm)")
      println(f"seeded $rows rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")

      val url = s"pg://postgres@127.0.0.1:${s.port}/postgres"
      val template = "SELECT id, wm, v, payload FROM public.soak " +
        "WHERE wm BETWEEN {{.start}} AND {{.end}}"
      val dest = java.nio.file.Files
        .createTempDirectory("qrepsoak").toString
      val cfg = QRepConfig(wmarkColumn = "wm", destDir = s"$dest/out",
        wmarkStorePath = s"$dest/wm", mode = WriteMode.Append,
        numPartitions = parts)
      val runner = new QRepRunner(spark, cfg)

      def round(label: String, last: Option[Long]): Unit = {
        val t = System.nanoTime()
        val df = LivePgPull.pull(spark, url, template, "wm", last, parts)
        val pulled = (System.nanoTime() - t) / 1e9
        val n = df.count() // checkpointed: no re-pull
        val t2 = System.nanoTime()
        val moved = runner.runOnce(df)
        val wrote = (System.nanoTime() - t2) / 1e9
        println(f"$label%-12s pulled $n%8d rows in $pulled%6.1f s " +
          f"(${if (pulled > 0) n / pulled else 0}%8.0f rec/s pull), " +
          f"moved $moved%8d in $wrote%5.1f s write")
      }

      round("full", None)
      s.psql("INSERT INTO public.soak SELECT g, g, g * 3, " +
        s"'payload-' || g FROM generate_series(${rows + 1}, " +
        s"${rows + rows / 10}) g")
      round("increment", Some(rows))
      round("idle", Some(rows + rows / 10))

      // CTID snapshot read over the same table (slot-exported snapshot)
      s.psql("CREATE PUBLICATION soak_pub FOR TABLE public.soak")
      val session = SnapshotFlow.createExportedSlot(
        s"pgwire://postgres@127.0.0.1:${s.port}/postgres" +
          "?slot=soak_slot&publication=soak_pub")
      try {
        val t = System.nanoTime()
        val df = SnapshotFlow.readTable(spark,
          s"pgwire://postgres@127.0.0.1:${s.port}/postgres",
          session.exported.snapshotName, "public.soak",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("wm",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.StringType))), parts)
        val n = df.count()
        val took = (System.nanoTime() - t) / 1e9
        println(f"ctid-snapshot read $n%8d rows in $took%6.1f s " +
          f"(${n / took}%8.0f rec/s)")
      } finally session.close()
      s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='soak_slot'")

      // (f) ctid-watermark QRep pull (the block-partitioned
      // initial-load flavor): one exported snapshot + block ranges,
      // full refresh — the path `watermark_column 'ctid'` mirrors run
      {
        val t = System.nanoTime()
        val df = LivePgPull.pullCtid(spark, url,
          "SELECT id, wm, v, payload FROM public.soak " +
            "WHERE ctid BETWEEN {{.start}} AND {{.end}}",
          "public.soak", numPartitions = parts)
        val n = df.count()
        val took = (System.nanoTime() - t) / 1e9
        println(f"ctid-qrep pull $n%8d rows in $took%6.1f s " +
          f"(${n / took}%8.0f rec/s, " +
          f"${df.rdd.getNumPartitions} block ranges)")
      }

      // (e) interactive live-peer scan (the SQL router's pg:// leg:
      // CTID slices without an exported snapshot, lazy build + one
      // action) — the rec/s the LivePeerQuerySpec path sustains
      {
        val t = System.nanoTime()
        val df = graft.mirror.LivePeerScan.pgTable(spark, url,
          "public.soak", parts)
        val built = (System.nanoTime() - t) / 1e9
        val t2 = System.nanoTime()
        val n = df.count()
        val took = (System.nanoTime() - t2) / 1e9
        println(f"live-peer scan $n%8d rows in $took%6.1f s " +
          f"(${n / took}%8.0f rec/s; build probe $built%.2f s, " +
          f"${df.rdd.getNumPartitions} slices)")
      }
    } finally server.stop()
  }
}
