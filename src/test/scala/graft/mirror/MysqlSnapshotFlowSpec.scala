package graft.mirror

import java.net.ServerSocket

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.{MysqlBinlog, WireServers}
import graft.cdc.WireServers.{MysqlAnswer, MysqlCol, MysqlOk}
import graft.qrep.MysqlClient

/** The MySQL snapshot→CDC handoff ([[MysqlSnapshotFlow]]) against ONE
  * fixture server speaking both surfaces — COM_QUERY for the
  * partitioned snapshot reads and COM_BINLOG_DUMP for the stream
  * (like a real mysqld). Pins the reference's ordering argument
  * (flow/connectors/mysql/cdc.go:340-382): binlog position captured
  * and made durable BEFORE the reads, post-position churn replayed
  * through the stream exactly once on top of the snapshot. */
class MysqlSnapshotFlowSpec extends SparkSpec {

  import MysqlBinlog._

  private val Between = "BETWEEN (-?\\d+) AND (-?\\d+)".r

  private val tm = TableMap(9L, "app", "t",
    Array(ColType.LongLong, ColType.Varchar),
    Array(0, 255), Array(false, true),
    Seq("id", "name"), Seq(true, true))

  /** The post-snapshot churn: one tx updating id=1 and inserting
    * id=2001, committed past the captured position (4000). */
  private def churnEvents(): Seq[Array[Byte]] = Seq(
    encodeRotate(0L, 0L, 4L, "binlog.000002"),
    encodeFormatDescription(1L, 4L),
    encodeTableMap(1L, 4010L, tm),
    encodeQuery(1L, 4020L, "app", "BEGIN"),
    encodeRows(1L, 4030L, Ev.UpdateRowsV2, tm, Seq(
      Seq(Some(Some(fLong(1L))), Some(Some(fVarchar("n1", 255)))),
      Seq(Some(Some(fLong(1L))), Some(Some(fVarchar("updated", 255)))))),
    encodeRows(1L, 4040L, Ev.WriteRowsV2, tm, Seq(
      Seq(Some(Some(fLong(2001L))), Some(Some(fVarchar("fresh", 255)))))),
    encodeXid(1L, 4100L, 77L))

  private def queryHandler(
      table: () => Seq[(Long, String)]): String => MysqlAnswer = {
    val cols = Seq(
      MysqlCol("id", MysqlClient.TypeLongLong),
      MysqlCol("name", 0xFD))
    sql =>
      if (sql.startsWith("SET ")) MysqlOk
      else if (sql.startsWith("SHOW MASTER STATUS")) MysqlAnswer(
        Seq(MysqlCol("File", 0xFD),
          MysqlCol("Position", MysqlClient.TypeLongLong)),
        Seq(Seq(Some("binlog.000002"), Some("4000"))))
      else if (sql.contains("LIMIT 0") && !sql.contains("`name`"))
        MysqlAnswer(cols.take(1), Nil) // numeric-pk probe
      else if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else if (sql.contains("MIN(")) {
        val f = Between.findFirstMatchIn(sql) match {
          case Some(m) => table().filter(r =>
            r._1 >= m.group(1).toLong && r._1 <= m.group(2).toLong)
          case None => table()
        }
        MysqlAnswer(
          Seq(MysqlCol("mn", MysqlClient.TypeLongLong),
            MysqlCol("mx", MysqlClient.TypeLongLong),
            MysqlCol("n", MysqlClient.TypeLongLong)),
          Seq(Seq(
            if (f.isEmpty) None else Some(f.map(_._1).min.toString),
            if (f.isEmpty) None else Some(f.map(_._1).max.toString),
            Some(f.size.toString))))
      } else {
        val f = Between.findFirstMatchIn(sql) match {
          case Some(m) => table().filter(r =>
            r._1 >= m.group(1).toLong && r._1 <= m.group(2).toLong)
          case None => table()
        }
        MysqlAnswer(cols, f.map(r =>
          Seq(Some(r._1.toString), Some(r._2))))
      }
  }

  test("full handoff: position captured before the reads, snapshot " +
    "bootstraps at version 0, the stream replays post-position churn " +
    "exactly once; replays are no-ops") {
    val listener = new ServerSocket(0)
    val rows = (1L to 1000L).map(i => (i, s"n$i"))
    WireServers.serveMysqlQuery(listener, "pw",
      queryHandler(() => rows), dumpEvents = () => churnEvents())
    try {
      val base = tmpDir("mysnap")
      val cfg = MirrorConfig(
        walDir = s"$base/wal", rawDir = s"$base/raw",
        destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
        pkColumns = Seq("id"),
        payloadSchema = StructType(Seq(
          StructField("id", LongType), StructField("name", StringType))),
        destinationTable = "app.t",
        captureDir = Some(
          s"mysql://root:pw@127.0.0.1:${listener.getLocalPort}"))

      val runner = MysqlSnapshotFlow.initialLoad(spark, cfg,
        rowsPerPartition = Some(250L))
      // the offset was durable BEFORE the reads
      assert(graft.util.FsText.read(s"$base/ckpt/_capture_offset",
        spark.sparkContext.hadoopConfiguration)
        .contains("binlog.000002:4000"))
      val snap = runner.destination("app.t")
      assert(snap.count() == 1000)
      assert(snap.filter(col("id") === 1L).head.getString(1) == "n1")

      // the stream: churn committed past 4000 lands exactly once
      runner.runAvailableNow()
      val after = runner.destination("app.t")
      assert(after.count() == 1001)
      assert(after.filter(col("id") === 1L).head.getString(1) ==
        "updated")
      assert(after.filter(col("id") === 2001L).count() == 1)
      // the same dump replays on the next pull: the skip guard holds
      runner.runAvailableNow()
      assert(runner.destination("app.t").count() == 1001)
      val dups = runner.destination("app.t").groupBy("id").count()
        .filter(col("count") > 1).count()
      assert(dups == 0)
    } finally listener.close()
  }

  test("mysql.default_partition_key_enabled 'false': no pk-derived " +
    "partition key — the clone is ONE full scan, no BETWEEN ranges " +
    "(PEERDB_MYSQL_DEFAULT_PARTITION_KEY_ENABLED, " +
    "snapshot_activity.go:185-215)") {
    val listener = new ServerSocket(0)
    val rows = (1L to 500L).map(i => (i, s"n$i"))
    val sawBetween = new java.util.concurrent.atomic.AtomicBoolean(false)
    val inner = queryHandler(() => rows)
    WireServers.serveMysqlQuery(listener, "pw", sql => {
      if (Between.findFirstMatchIn(sql).isDefined) sawBetween.set(true)
      inner(sql)
    }, dumpEvents = () => Seq(
      encodeRotate(0L, 0L, 4L, "binlog.000002"),
      encodeFormatDescription(1L, 4L)))
    try {
      val base = tmpDir("mysnap_nokey")
      val cfg = MirrorConfig(
        walDir = s"$base/wal", rawDir = s"$base/raw",
        destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
        pkColumns = Seq("id"),
        payloadSchema = StructType(Seq(
          StructField("id", LongType), StructField("name", StringType))),
        destinationTable = "app.t",
        captureDir = Some(
          s"mysql://root:pw@127.0.0.1:${listener.getLocalPort}"))
      spark.conf.set(
        "spark.graft.mysql.default_partition_key_enabled", "false")
      try {
        val runner = MysqlSnapshotFlow.initialLoad(spark, cfg,
          rowsPerPartition = Some(100L))
        assert(runner.destination("app.t").count() == 500)
        assert(!sawBetween.get,
          "gate off must clone as one full scan (no BETWEEN ranges)")
      } finally spark.conf.unset(
        "spark.graft.mysql.default_partition_key_enabled")
    } finally listener.close()
  }

  test("DDL surface: CREATE MIRROR with a mysql:// capture_dir and " +
    "do_initial_snapshot takes the live binlog-position snapshot " +
    "path; EXECUTE snapshots then drains CDC; re-EXECUTE reuses the " +
    "durable marker") {
    val listener = new ServerSocket(0)
    val rows = (1L to 400L).map(i => (i, s"n$i"))
    WireServers.serveMysqlQuery(listener, "pw",
      queryHandler(() => rows), dumpEvents = () => churnEvents())
    try {
      val base = tmpDir("mysnapddl")
      def run(sql: String) = GraftSql.execute(spark,
        GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))
      run(s"""CREATE MIRROR mysnap WITH (
         |  wal_dir '$base/wal', dest_dir '$base/dest',
         |  checkpoint_dir '$base/ckpt', pk 'id', table 'app.t',
         |  schema 'id BIGINT, name STRING',
         |  capture_dir 'mysql://root:pw@127.0.0.1:${listener.getLocalPort}',
         |  do_initial_snapshot 'true',
         |  snapshot_num_rows_per_partition '100')""".stripMargin)
      val v = run("VALIDATE MIRROR mysnap")
      val snapCheck = v.find(_.getString(0) == "snapshot_source").get
      assert(snapCheck.getString(1) == "valid", v.mkString(";"))
      assert(snapCheck.getString(2).contains("binlog-position"))

      run("EXECUTE MIRROR mysnap")
      def destDf() = spark.read.parquet(s"$base/dest")
        .filter(!col("_peerdb_is_deleted"))
      // 400 snapshot rows + the post-position churn (update + insert)
      assert(destDf().count() == 401)
      assert(destDf().filter(col("id") === 1L)
        .head.getAs[String]("name") == "updated")

      // durable marker: re-EXECUTE does not re-snapshot; the replayed
      // dump is absorbed by the skip guard
      run("EXECUTE MIRROR mysnap")
      assert(destDf().count() == 401)
      run("DROP MIRROR mysnap")
    } finally listener.close()
  }

  test("STRING primary key partitions the snapshot through the " +
    "adaptive string partitioner (the reference's default-partition-" +
    "key posture); rows arrive exactly once, column-pruned") {
    val listener = new ServerSocket(0)
    val cols = Seq(
      MysqlCol("code", 0xFD), MysqlCol("v", MysqlClient.TypeLongLong))
    val keys = (1 to 400).map(i => f"c$i%04d")
    val vOf = keys.zipWithIndex.toMap
    val Lit = "'([^']*)'".r
    def lits(sql: String) = Lit.findAllMatchIn(sql).map(_.group(1)).toSeq
    WireServers.serveMysqlQuery(listener, "", { sql =>
      if (sql.startsWith("SET ")) MysqlOk
      else if (sql.contains("LIMIT 0") && !sql.contains("`v`"))
        MysqlAnswer(cols.take(1), Nil) // pk-type probe: VARCHAR
      else if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else if (sql.contains("SELECT MIN(")) MysqlAnswer(
        Seq(MysqlCol("mn", 0xFD), MysqlCol("mx", 0xFD),
          MysqlCol("n", MysqlClient.TypeLongLong)),
        Seq(Seq(Some(keys.head), Some(keys.last),
          Some(keys.size.toString))))
      else if (sql.startsWith("EXPLAIN")) {
        val Seq(s, e) = lits(sql)
        MysqlAnswer(Seq(MysqlCol("rows", MysqlClient.TypeLongLong)),
          Seq(Seq(Some(keys.count(k => k >= s && k < e).toString))))
      } else if (sql.contains("LIMIT 1")) {
        val Seq(mid, s, e) = lits(sql)
        val k =
          if (sql.contains("DESC"))
            keys.filter(k => k < mid && k > s && k < e).lastOption
          else keys.find(k => k >= mid && k > s && k < e)
        MysqlAnswer(Seq(MysqlCol("code", 0xFD)),
          k.toSeq.map(v => Seq(Some(v))))
      } else if (sql.contains("IS NULL")) MysqlAnswer(cols, Nil)
      else {
        val Seq(s, e) = lits(sql)
        val sel: String => Boolean =
          if (sql.contains("BETWEEN")) k => k >= s && k <= e
          else k => k >= s && k < e
        MysqlAnswer(cols, keys.filter(sel).map(k =>
          Seq(Some(k), Some(vOf(k).toString))))
      }
    })
    try {
      val url = s"mysql://root@127.0.0.1:${listener.getLocalPort}"
      val df = MysqlSnapshotFlow.readTable(spark, url, "app.codes",
        StructType(Seq(StructField("code", StringType),
          StructField("v", LongType))), pkColumns = Seq("code"),
        numPartitions = 4)
      // 4 string ranges + the IS NULL partition
      assert(df.rdd.getNumPartitions == 5)
      assert(df.count() == 400)
      assert(df.select("code").distinct().count() == 400)
      assert(df.agg(org.apache.spark.sql.functions.sum("v"))
        .head.getLong(0) == 399L * 400 / 2)
    } finally listener.close()
  }

  test("composite primary key falls back to one full-scan partition " +
    "(the reference's FullTablePartition)") {
    val listener = new ServerSocket(0)
    val cols = Seq(
      MysqlCol("a", 0xFD), MysqlCol("b", 0xFD),
      MysqlCol("v", MysqlClient.TypeLongLong))
    WireServers.serveMysqlQuery(listener, "", { sql =>
      if (sql.startsWith("SET ")) MysqlOk
      else if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else MysqlAnswer(cols, (1 to 50).map(i =>
        Seq(Some(s"a$i"), Some(s"b$i"), Some(i.toString))))
    })
    try {
      val url = s"mysql://root@127.0.0.1:${listener.getLocalPort}"
      val df = MysqlSnapshotFlow.readTable(spark, url, "app.pairs",
        StructType(Seq(StructField("a", StringType),
          StructField("b", StringType), StructField("v", LongType))),
        pkColumns = Seq("a", "b"))
      assert(df.rdd.getNumPartitions == 1)
      assert(df.count() == 50)
      assert(df.agg(org.apache.spark.sql.functions.sum("v"))
        .head.getLong(0) == 50L * 51 / 2)
    } finally listener.close()
  }
}
