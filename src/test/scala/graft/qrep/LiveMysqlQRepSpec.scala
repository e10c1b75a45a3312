package graft.qrep

import java.net.ServerSocket

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.cdc.WireServers
import graft.cdc.WireServers.{MysqlAnswer, MysqlCol, MysqlOk}
import graft.mirror.GraftSql

/** LIVE MySQL QRep over the wire ([[LiveMysqlPull]] +
  * [[MysqlClient]]) against a protocol-41 fixture server (no mysqld
  * in this environment; the PG twin of this path is pinned against
  * stock PostgreSQL, and the protocol codec here is exercised
  * byte-for-byte: handshake, auth, COM_QUERY, classic resultset
  * framing, length-encoded cells, 0xFB NULLs, 16 MB-split packets by
  * construction of readFullPacket). Mirrors the reference's MySQL
  * QRep (flow/connectors/mysql/qrep.go: min/max range discovery +
  * per-partition bound pulls). */
class LiveMysqlQRepSpec extends SparkSpec {

  private def run(sql: String) = GraftSql.execute(spark,
    GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))

  private val Between = "BETWEEN (-?\\d+) AND (-?\\d+)".r
  private val IntervalUs = "INTERVAL (-?\\d+) MICROSECOND".r

  test("integer watermark through the DDL: full + idle + incremental " +
    "rounds, each bound query running on the fixture server; " +
    "destination checksum equals the source") {
    val listener = new ServerSocket(0)
    // the in-memory "table": (id, wm, v)
    @volatile var table: Seq[(Long, Long, String)] =
      (1L to 1000L).map(i => (i, i, s"p-$i"))
    val cols = Seq(
      MysqlCol("id", MysqlClient.TypeLongLong),
      MysqlCol("wm", MysqlClient.TypeLongLong),
      MysqlCol("v", 0xFD)) // VAR_STRING
    def filtered(sql: String): Seq[(Long, Long, String)] =
      Between.findFirstMatchIn(sql) match {
        case Some(m) =>
          val (lo, hi) = (m.group(1).toLong, m.group(2).toLong)
          table.filter(r => r._2 >= lo && r._2 <= hi)
        case None => table
      }
    WireServers.serveMysqlQuery(listener, "pw", { sql =>
      if (sql.startsWith("SET ")) MysqlOk
      else if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else if (sql.contains("MIN(")) {
        val f = filtered(sql)
        MysqlAnswer(
          Seq(MysqlCol("mn", MysqlClient.TypeLongLong),
            MysqlCol("mx", MysqlClient.TypeLongLong),
            MysqlCol("n", MysqlClient.TypeLongLong)),
          Seq(Seq(
            if (f.isEmpty) None else Some(f.map(_._2).min.toString),
            if (f.isEmpty) None else Some(f.map(_._2).max.toString),
            Some(f.size.toString))))
      } else MysqlAnswer(cols, filtered(sql).map(r =>
        Seq(Some(r._1.toString), Some(r._2.toString), Some(r._3))))
    })
    try {
      val base = tmpDir("livemysqlqrep")
      run(s"CREATE PEER mqsrc TYPE mysql OPTIONS (" +
        s"url 'mysql://root:pw@127.0.0.1:${listener.getLocalPort}/db')")
      run(s"CREATE PEER mqdst TYPE parquet OPTIONS (dir '$base/dst')")
      run("CREATE MIRROR mq1 FROM mqsrc TO mqdst FOR " +
        "$$ SELECT id, wm, v FROM t WHERE wm BETWEEN {{.start}} AND " +
        "{{.end}} $$ " +
        "WITH (watermark_column 'wm', source_table 't', " +
        s"dest_dir '$base/dest', num_partitions '3')")

      assert(run("EXECUTE MIRROR mq1").head.getLong(0) == 1000L)
      assert(run("EXECUTE MIRROR mq1").head.getLong(0) == 0L) // idle

      table = table ++ (1001L to 1050L).map(i => (i, i, s"p-$i"))
      assert(run("EXECUTE MIRROR mq1").head.getLong(0) == 50L)

      val rows = spark.read.parquet(s"$base/dest")
        .orderBy("id").collect()
      assert(rows.length == 1050)
      assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq == table.sortBy(_._1))

      run("DROP MIRROR mq1"); run("DROP PEER mqsrc")
      run("DROP PEER mqdst")
    } finally listener.close()
  }

  test("timestamp watermark: INTERVAL-MICROSECOND bounds are exact at " +
    "sub-second spacing (no re-pull, no miss), DATETIME/DECIMAL/NULL " +
    "cells decode typed, rows-per-partition drives the slice count") {
    val listener = new ServerSocket(0)
    val t0 = 1709251200000000L // 2024-03-01T00:00:00Z µs
    // (k, micros, amt, v) — 250 ms spacing, one NULL v
    @volatile var table: Seq[(Long, Long, String, Option[String])] =
      (0L until 100L).map(k =>
        (k, t0 + k * 250000L, s"${k}.25",
          if (k == 7) None else Some(s"v$k")))
    val cols = Seq(
      MysqlCol("k", MysqlClient.TypeLongLong),
      MysqlCol("updated_at", MysqlClient.TypeDatetime,
        decimals = 6, length = 26),
      MysqlCol("amt", MysqlClient.TypeNewDecimal,
        decimals = 2, length = 12), // → DECIMAL(10,2)
      MysqlCol("v", 0xFD))
    val tsFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
    def tsText(us: Long): String = tsFmt.format(
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000))
    def filtered(sql: String): Seq[(Long, Long, String, Option[String])] =
      IntervalUs.findAllMatchIn(sql).map(_.group(1).toLong).toSeq match {
        case Seq(lo, hi) => table.filter(r => r._2 >= lo && r._2 <= hi)
        case _ => table
      }
    WireServers.serveMysqlQuery(listener, "", { sql =>
      if (sql.startsWith("SET ")) MysqlOk
      else if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else if (sql.contains("MIN(")) {
        val f = filtered(sql)
        MysqlAnswer(
          Seq(MysqlCol("mn", MysqlClient.TypeLongLong),
            MysqlCol("mx", MysqlClient.TypeLongLong),
            MysqlCol("n", MysqlClient.TypeLongLong)),
          Seq(Seq(
            if (f.isEmpty) None else Some(f.map(_._2).min.toString),
            if (f.isEmpty) None else Some(f.map(_._2).max.toString),
            Some(f.size.toString))))
      } else MysqlAnswer(cols, filtered(sql).map(r =>
        Seq(Some(r._1.toString), Some(tsText(r._2)), Some(r._3), r._4)))
    })
    try {
      val url = s"mysql://root@127.0.0.1:${listener.getLocalPort}/db"
      val template = "SELECT k, updated_at, amt, v FROM t2 WHERE " +
        "updated_at BETWEEN {{.start_ts}} AND {{.end_ts}}"

      val df = LiveMysqlPull.pull(spark, url, template, "updated_at",
        last = None, numPartitions = 3)
      assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ==
        Seq("k" -> "bigint", "updated_at" -> "timestamp",
          "amt" -> "decimal(10,2)", "v" -> "string"))
      assert(df.count() == 100)
      val got = df.selectExpr("k", "unix_micros(updated_at) AS us",
        "CAST(amt * 100 AS BIGINT) AS cents", "v")
        .orderBy("k").collect()
      assert(got.forall(r =>
        r.getLong(1) == t0 + r.getLong(0) * 250000L))
      assert(got.forall(r => r.getLong(2) == r.getLong(0) * 100 + 25))
      assert(got(7).isNullAt(3) && got(8).getString(3) == "v8")

      // incremental from the exact stored-watermark image: rows
      // continuing INSIDE the last second arrive once, nothing re-pulls
      val lastWm = Partitioner.wmarkLong(df, "updated_at")
      val last = df.agg(org.apache.spark.sql.functions.max(lastWm))
        .head.getLong(0)
      assert(last == t0 + 99 * 250000L)
      table = table ++ (100L until 140L).map(k =>
        (k, t0 + k * 250000L, s"${k}.25", Some(s"v$k")))
      val inc = LiveMysqlPull.pull(spark, url, template, "updated_at",
        last = Some(last), numPartitions = 3)
      assert(inc.count() == 40)
      assert(inc.agg(org.apache.spark.sql.functions
        .min(col("k"))).head.getLong(0) == 100L)

      // rows-per-partition sizing: ceil(140 / 20) = 7 range slices
      val sized = LiveMysqlPull.pull(spark, url, template,
        "updated_at", last = None, rowsPerPartition = Some(20L))
      assert(sized.count() == 140)
      assert(sized.rdd.getNumPartitions == 7)
    } finally listener.close()
  }

  test("pre-1970 timestamp watermark rows survive the range probe: " +
    "the probe is TIMESTAMPDIFF (signed, full DATETIME range) — a " +
    "UNIX_TIMESTAMP probe floors them to 0 and drops them forever " +
    "(the fixture emulates MySQL's out-of-range semantics for both)") {
    val listener = new ServerSocket(0)
    val t0 = 1709251200000000L // 2024-03-01T00:00:00Z µs
    // one historic row a decade before the epoch, plus modern rows
    val historicUs = -315619200000000L // 1960-01-01T00:00:00Z µs
    @volatile var table: Seq[(Long, Long)] =
      Seq((0L, historicUs)) ++ (1L to 50L).map(k => (k, t0 + k * 1000000L))
    val cols = Seq(
      MysqlCol("k", MysqlClient.TypeLongLong),
      MysqlCol("updated_at", MysqlClient.TypeDatetime,
        decimals = 6, length = 26))
    val tsFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(java.time.ZoneOffset.UTC)
    def tsText(us: Long): String = tsFmt.format(
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000))
    def filtered(sql: String): Seq[(Long, Long)] =
      IntervalUs.findAllMatchIn(sql).map(_.group(1).toLong).toSeq match {
        case Seq(lo, hi) => table.filter(r => r._2 >= lo && r._2 <= hi)
        case _ => table
      }
    // FAITHFUL probe semantics: MySQL's UNIX_TIMESTAMP() is 0 outside
    // the TIMESTAMP range, TIMESTAMPDIFF is signed-exact everywhere —
    // the fixture reproduces both so the probe choice is observable.
    def probeUs(sql: String, us: Long): Long =
      if (sql.contains("UNIX_TIMESTAMP")) math.max(0L, us) else us
    WireServers.serveMysqlQuery(listener, "", { sql =>
      if (sql.startsWith("SET ")) MysqlOk
      else if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else if (sql.contains("MIN(")) {
        val f = filtered(sql)
        MysqlAnswer(
          Seq(MysqlCol("mn", MysqlClient.TypeLongLong),
            MysqlCol("mx", MysqlClient.TypeLongLong),
            MysqlCol("n", MysqlClient.TypeLongLong)),
          Seq(Seq(
            if (f.isEmpty) None
            else Some(f.map(r => probeUs(sql, r._2)).min.toString),
            if (f.isEmpty) None
            else Some(f.map(r => probeUs(sql, r._2)).max.toString),
            Some(f.size.toString))))
      } else MysqlAnswer(cols, filtered(sql).map(r =>
        Seq(Some(r._1.toString), Some(tsText(r._2)))))
    })
    try {
      val url = s"mysql://root@127.0.0.1:${listener.getLocalPort}/db"
      val template = "SELECT k, updated_at FROM t3 WHERE " +
        "updated_at BETWEEN {{.start_ts}} AND {{.end_ts}}"

      val df = LiveMysqlPull.pull(spark, url, template, "updated_at",
        last = None, numPartitions = 3)
      assert(df.count() == 51) // the 1960 row arrived
      val ks = df.select("k").collect().map(_.getLong(0)).toSet
      assert(ks.contains(0L))

      // the stored watermark is the Spark-side max (signed micros);
      // an idle incremental round pulls nothing and re-pulls nothing
      val last = df.agg(org.apache.spark.sql.functions.max(
        Partitioner.wmarkLong(df, "updated_at"))).head.getLong(0)
      assert(last == t0 + 50L * 1000000L)
      val idle = LiveMysqlPull.pull(spark, url, template, "updated_at",
        last = Some(last), numPartitions = 3)
      assert(idle.count() == 0)
    } finally listener.close()
  }

  /** Fixture for the STRING-watermark tests: a (id, uid, v) table
    * served over the protocol, answering the schema probe, MIN/MAX,
    * EXPLAIN row estimates, the real-key LIMIT 1 probes, and the
    * generated range/IS NULL pulls — the full surface
    * [[LiveMysqlPull.pullStringKey]] drives. */
  private def stringKeyHandler(
      rows: () => Seq[(Long, Option[String], String)])
      : String => MysqlAnswer = {
    val cols = Seq(
      MysqlCol("id", MysqlClient.TypeLongLong),
      MysqlCol("uid", 0xFD), // VAR_STRING watermark
      MysqlCol("v", 0xFD))
    val Lit = "'([^']*)'".r
    def lits(sql: String): Seq[String] =
      Lit.findAllMatchIn(sql).map(_.group(1)).toSeq
    def keyed = rows().collect { case (_, Some(k), _) => k }

    { sql: String =>
      if (sql.startsWith("SET ")) MysqlOk
      else if (sql.contains("VERSION()")) // CREATE-time validation probe
        MysqlAnswer(Seq(MysqlCol("v", 0xFD)),
          Seq(Seq(Some("8.0.36-fixture"))))
      else if (sql.contains("LIMIT 0")) MysqlAnswer(cols, Nil)
      else if (sql.contains("SELECT MIN(")) {
        val ks = keyed
        MysqlAnswer(
          Seq(MysqlCol("mn", 0xFD), MysqlCol("mx", 0xFD),
            MysqlCol("n", MysqlClient.TypeLongLong)),
          Seq(Seq(ks.minOption, ks.maxOption,
            Some(rows().size.toString))))
      } else if (sql.startsWith("EXPLAIN")) {
        val Seq(s, e) = lits(sql)
        MysqlAnswer(Seq(MysqlCol("rows", MysqlClient.TypeLongLong)),
          Seq(Seq(Some(keyed.count(k => k >= s && k < e).toString))))
      } else if (sql.contains("LIMIT 1")) {
        val Seq(mid, s, e) = lits(sql)
        val k =
          if (sql.contains("DESC"))
            keyed.filter(k => k < mid && k > s && k < e)
              .sorted.lastOption
          else keyed.filter(k => k >= mid && k > s && k < e)
            .sorted.headOption
        MysqlAnswer(Seq(MysqlCol("uid", 0xFD)),
          k.toSeq.map(v => Seq(Some(v))))
      } else if (sql.contains("IS NULL")) {
        MysqlAnswer(cols, rows().filter(_._2.isEmpty).map(r =>
          Seq(Some(r._1.toString), None, Some(r._3))))
      } else {
        val Seq(s, e) = lits(sql)
        val sel: String => Boolean =
          if (sql.contains("BETWEEN")) k => k >= s && k <= e
          else k => k >= s && k < e
        MysqlAnswer(cols, rows()
          .filter(_._2.exists(sel))
          .map(r => Seq(Some(r._1.toString), r._2, Some(r._3))))
      }
    }
  }

  test("STRING watermark, uuid-shaped keys: the 128-bit space splits " +
    "uniformly, every row (including the NULL-watermark one) arrives " +
    "exactly once across the range partitions + the IS NULL scan") {
    val listener = new ServerSocket(0)
    def uuidOf(i: Int): String = f"65f00000-0000-0000-0000-$i%012x"
    val table: Seq[(Long, Option[String], String)] =
      (0 until 1000).map(i => (i.toLong, Some(uuidOf(i)), s"u$i")) :+
        ((9999L, None, "null-key"))
    WireServers.serveMysqlQuery(listener, "",
      stringKeyHandler(() => table))
    try {
      val url = s"mysql://root@127.0.0.1:${listener.getLocalPort}/db"
      val df = LiveMysqlPull.pullStringKey(spark, url, "t4", "uid",
        numPartitions = 4)
      assert(df.count() == 1001)
      assert(df.select("id").distinct().count() == 1001)
      // 4 uuid ranges + the IS NULL partition
      assert(df.rdd.getNumPartitions == 5)
      val sizes = df.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
        .collect().map(_._2)
      assert(sizes.sum == 1001)
      // sequential uuids → near-uniform range populations
      assert(sizes.count(_ >= 200) == 4, s"sizes: ${sizes.mkString(",")}")
      assert(sizes.min == 1) // the null scan
    } finally listener.close()
  }

  test("STRING watermark, skewed arbitrary keys: adaptive bisection " +
    "(EXPLAIN-estimate-guided, real-key-snapped) caps the largest " +
    "partition where a uniform value split would take ~90% on one " +
    "connection; DDL surface runs it as a full-refresh mirror and " +
    "rejects append mode") {
    val listener = new ServerSocket(0)
    @volatile var table: Seq[(Long, Option[String], String)] =
      ((0 until 900).map(i => (i.toLong, Some(f"user-0$i%03d"), s"a$i")) ++
        (0 until 100).map(i =>
          (1000L + i, Some(f"zz-$i%03d"), s"z$i"))).sortBy(_._1)
    WireServers.serveMysqlQuery(listener, "",
      stringKeyHandler(() => table))
    try {
      val url = s"mysql://root@127.0.0.1:${listener.getLocalPort}/db"
      val df = LiveMysqlPull.pullStringKey(spark, url, "t5", "uid",
        numPartitions = 8)
      assert(df.count() == 1000)
      assert(df.select("id").distinct().count() == 1000)
      val sizes = df.rdd
        .mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
        .collect().map(_._2)
      assert(sizes.sum == 1000)
      assert(sizes.max <= 250,
        s"largest partition uncapped: ${sizes.mkString(",")}")

      // DDL: partition_strategy 'string' needs no template and is
      // full-refresh shaped (overwrite); a shrunken source replaces
      val base = tmpDir("livemysqlstr")
      run(s"CREATE PEER strsrc TYPE mysql OPTIONS (url '$url')")
      run(s"CREATE PEER strdst TYPE parquet OPTIONS (dir '$base/dst')")
      intercept[IllegalArgumentException] {
        run("CREATE MIRROR mstrbad FROM strsrc TO strdst FOR " +
          "$$ full $$ WITH (watermark_column 'uid', " +
          "source_table 't5', partition_strategy 'string', " +
          s"dest_dir '$base/destbad', mode 'append')")
      }
      // an UNSUPPORTED strategy on a mysql peer must fail the DDL,
      // not silently run uniform (the PG path throws on unknown
      // strategies; a per-peer silent no-op is a misconfig trap)
      val eStrat = intercept[IllegalArgumentException] {
        run("CREATE MIRROR mstrntile FROM strsrc TO strdst FOR " +
          "$$ SELECT * FROM t5 WHERE uid > {{.start}} AND uid <= " +
          "{{.end}} $$ WITH (watermark_column 'uid', " +
          "source_table 't5', partition_strategy 'ntile', " +
          s"dest_dir '$base/destntile')")
      }
      assert(eStrat.getMessage.contains("ntile") &&
        eStrat.getMessage.contains("not supported"), eStrat.getMessage)
      run("CREATE MIRROR mstr FROM strsrc TO strdst FOR " +
        "$$ full $$ WITH (watermark_column 'uid', " +
        "source_table 't5', partition_strategy 'string', " +
        s"dest_dir '$base/dest', num_partitions '6')")
      assert(run("EXECUTE MIRROR mstr").head.getLong(0) == 1000L)
      table = table.take(700)
      assert(run("EXECUTE MIRROR mstr").head.getLong(0) == 700L)
      assert(spark.read.parquet(s"$base/dest").count() == 700)
      run("DROP MIRROR mstr"); run("DROP PEER strsrc")
      run("DROP PEER strdst")
    } finally listener.close()
  }
}
