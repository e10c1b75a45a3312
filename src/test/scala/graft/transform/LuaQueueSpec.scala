package graft.transform

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.mirror.{GraftSql, MirrorConfig, MirrorRunner}
import graft.model.ChangeRecord
import graft.sinks.KafkaTestBroker

/** `script_lang 'lua'` end to end: a user's `onRecord` routing script
  * — the reference's only extensibility surface (flow/pua/peerdb.go,
  * kafka.go:340-390) — drives a live kafka:// mirror's topic/key/value
  * routing through the scripts catalog, running unmodified on the
  * in-process interpreter. */
class LuaQueueSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType)))

  private def rec(cp: Long, rt: Int, data: String,
      matchData: String = null): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "dest.t", data, matchData, Nil)

  private def run(sql: String) = GraftSql.execute(spark,
    GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))

  test("a lua onRecord script routes a kafka:// mirror: per-record " +
    "topic/key/value off the record surface (r.kind/r.source/r.row), " +
    "deletes dropped by returning nil, headers carried — and the DDL " +
    "path (CREATE SCRIPT ... LANG lua + script 'name') wires it") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 2)
    try {
      val wal = tmpDir("lua_wal")
      val base = tmpDir("lua_mirror")
      ChangeLogWal.append(wal, Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
        rec(2, ChangeRecord.TypeInsert, """{"id":2,"v":20}"""),
        rec(3, ChangeRecord.TypeUpdate, """{"id":1,"v":11}"""),
        rec(4, ChangeRecord.TypeDelete, """{"id":2,"v":20}""",
          matchData = """{"id":2}""")))

      // the scripts-catalog DDL: CREATE SCRIPT ... LANG lua validates
      // (parse + onRecord presence) at CREATE time
      run("""CREATE SCRIPT route LANG lua AS $$
        local json = require "json"
        function onRecord(r)
          if r.kind == "delete" then
            return nil -- deletes stay off the topic
          end
          return {
            topic = "evt." .. r.source,
            key = tostring(r.row.id),
            value = json.encode(r.row),
            headers = {kind = r.kind},
          }
        end
      $$""")
      run(s"""CREATE MIRROR luamir WITH (
         |  wal_dir '$wal', dest_dir '$base/dest',
         |  checkpoint_dir '$base/ckpt', pk 'id',
         |  table 'dest.t', schema 'id BIGINT, v BIGINT',
         |  script 'route',
         |  queue_url 'kafka://127.0.0.1:${broker.port}')""".stripMargin)
      run("EXECUTE MIRROR luamir")

      // topic from the script (source-table based), not the default
      val stored = broker.topicRecords("evt.public.t")
      assert(stored.size == 3,
        s"3 non-delete records expected, got ${stored.size}")
      assert(broker.topicRecords("dest.t").isEmpty,
        "nothing lands on the default destination-table topic")
      val kv = stored.map(s => (new String(s.record.key, UTF_8),
        new String(s.record.value, UTF_8)))
      // key = row id (not uid): id 1 appears twice (insert + update)
      assert(kv.count(_._1 == "1") == 2)
      assert(kv.count(_._1 == "2") == 1)
      assert(kv.exists(_._2 == """{"id":1,"v":11}"""),
        s"update image must flow: $kv")
      // headers from the script table
      val hdrs = stored.flatMap(_.record.headers)
        .map(h => h.key -> new String(h.value, UTF_8)).distinct.sorted
      assert(hdrs == Seq("kind" -> "insert", "kind" -> "update"),
        hdrs.toString)

      // restart: durable queue HWM — nothing re-produces
      run("EXECUTE MIRROR luamir")
      assert(broker.topicRecords("evt.public.t").size == 3)
      run("DROP MIRROR luamir"); run("DROP SCRIPT route")
    } finally broker.stop()
  }

  test("a script's explicit `partition` field routes VERBATIM under " +
    "partitioner=manual (kgo.ManualPartitioner parity, " +
    "kafka.go:106-107/192-197) — and is ignored under the default " +
    "key partitioner") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 4)
    try {
      val base = tmpDir("lua_part")
      // all records share one key (keyed partitioning would co-locate
      // them) but the script spreads them by id % 4 explicitly
      run("""CREATE SCRIPT spread LANG lua AS $$
        function onRecord(r)
          return {
            key = "same",
            value = tostring(r.row.id),
            partition = r.row.id % 4,
          }
        end
      $$""")
      ChangeLogWal.append(s"$base/wal", (1L to 8L).map(i =>
        rec(i, ChangeRecord.TypeInsert, s"""{"id":$i,"v":$i}""")))
      run(s"""CREATE MIRROR luapart WITH (
         |  wal_dir '$base/wal', dest_dir '$base/dest',
         |  checkpoint_dir '$base/ckpt', pk 'id',
         |  table 'dest.t', schema 'id BIGINT, v BIGINT',
         |  script 'spread',
         |  queue_url 'kafka://127.0.0.1:${broker.port}?partitioner=manual')"""
        .stripMargin)
      run("EXECUTE MIRROR luapart")
      val byPart = (0 until 4).map(p => p -> broker.log("dest.t", p)
        .map(s => new String(s.record.value, UTF_8).toLong).toSet)
        .toMap
      assert(byPart.values.forall(_.nonEmpty),
        s"manual spread must hit all 4 partitions: $byPart")
      assert(byPart(1) == Set(1L, 5L) && byPart(3) == Set(3L, 7L),
        byPart.toString)
      run("DROP MIRROR luapart")

      // same shape WITHOUT partitioner=manual: the shared key decides
      // — everything lands on ONE partition (the default key-hash
      // posture; the script's partition field is ignored)
      run("""CREATE SCRIPT spread2 LANG lua AS $$
        function onRecord(r)
          return {
            topic = "keyed.t",
            key = "same",
            value = tostring(r.row.id),
            partition = r.row.id % 4,
          }
        end
      $$""")
      ChangeLogWal.append(s"$base/wal2", (1L to 8L).map(i =>
        rec(i, ChangeRecord.TypeInsert, s"""{"id":$i,"v":$i}""")))
      run(s"""CREATE MIRROR luakeyed WITH (
         |  wal_dir '$base/wal2', dest_dir '$base/dest2',
         |  checkpoint_dir '$base/ckpt2', pk 'id',
         |  table 'dest.t', schema 'id BIGINT, v BIGINT',
         |  script 'spread2',
         |  queue_url 'kafka://127.0.0.1:${broker.port}')""".stripMargin)
      run("EXECUTE MIRROR luakeyed")
      assert(broker.topicRecords("keyed.t").size == 8)
      assert((0 until 4).count(p =>
        broker.log("keyed.t", p).nonEmpty) == 1,
        "keyed: one partition for one key")
      run("DROP MIRROR luakeyed"); run("DROP SCRIPT spread2")

      // an out-of-range assignment fails the batch loudly
      run("""CREATE SCRIPT oob LANG lua AS $$
        function onRecord(r)
          return {key = "k", value = "v", partition = 99}
        end
      $$""")
      ChangeLogWal.append(s"$base/wal3", Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":1}""")))
      run(s"""CREATE MIRROR luaoob WITH (
         |  wal_dir '$base/wal3', dest_dir '$base/dest3',
         |  checkpoint_dir '$base/ckpt3', pk 'id',
         |  table 'dest3.t', schema 'id BIGINT, v BIGINT',
         |  script 'oob',
         |  queue_url 'kafka://127.0.0.1:${broker.port}?partitioner=manual')"""
        .stripMargin)
      val e = intercept[Exception] { run("EXECUTE MIRROR luaoob") }
      def rootMsg(t: Throwable): String =
        (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")) ++
          Iterator("")).mkString(" | ")
      assert(rootMsg(e).contains("out of range"), rootMsg(e))
      run("DROP MIRROR luaoob")
      run("DROP SCRIPT oob"); run("DROP SCRIPT spread")

      // manual without a script is a config error, not a silent 0-route
      val e2 = intercept[Exception] {
        run(s"""CREATE MIRROR luanoman WITH (
           |  wal_dir '$base/wal4', dest_dir '$base/dest4',
           |  checkpoint_dir '$base/ckpt4', pk 'id',
           |  table 'dest4.t', schema 'id BIGINT, v BIGINT',
           |  queue_url 'kafka://127.0.0.1:${broker.port}?partitioner=manual')"""
          .stripMargin)
        run("EXECUTE MIRROR luanoman")
      }
      assert(rootMsg(e2).contains("partitioner=manual"), rootMsg(e2))
      scala.util.Try(run("DROP MIRROR luanoman"))
    } finally broker.stop()
  }

  test("msgpack queue values ride the wire VERBATIM: a script's " +
    "msgpack.encode payload (bytes >0x7F included) lands on the " +
    "broker byte-identical to the spec's golden encoding — the " +
    "UTF-8-boundary mangling a string value column would cause") {
    val broker = KafkaTestBroker.start(partitionsPerTopic = 1)
    try {
      val base = tmpDir("lua_mp")
      run("""CREATE SCRIPT mp LANG lua AS $$
        local msgpack = require "msgpack"
        function onRecord(r)
          return {
            key = tostring(r.row.id),
            value = msgpack.encode({id = r.row.id, v = r.row.v}),
          }
        end
      $$""")
      ChangeLogWal.append(s"$base/wal", Seq(
        rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":200}""")))
      run(s"""CREATE MIRROR luamp WITH (
         |  wal_dir '$base/wal', dest_dir '$base/dest',
         |  checkpoint_dir '$base/ckpt', pk 'id',
         |  table 'dest.t', schema 'id BIGINT, v BIGINT',
         |  script 'mp',
         |  queue_url 'kafka://127.0.0.1:${broker.port}')""".stripMargin)
      run("EXECUTE MIRROR luamp")
      val stored = broker.topicRecords("dest.t")
      assert(stored.size == 1)
      // {id=1, v=200} → fixmap(2) "id" 1 "v" uint8(200): the 0xCC 0xC8
      // tail proves bytes >0x7F crossed the whole pipeline unmangled
      val want = Array(0x82, 0xA2, 'i', 'd', 0x01, 0xA1, 'v',
        0xCC, 0xC8).map(_.toByte)
      assert(java.util.Arrays.equals(stored.head.record.value, want),
        stored.head.record.value.map(b => f"${b & 0xff}%02x")
          .mkString)
      run("DROP MIRROR luamp"); run("DROP SCRIPT mp")
    } finally broker.stop()
  }

  test("queue.parallelism (PEERDB_QUEUE_PARALLELISM, the reference's " +
    "LuaPool SIZE — a concurrency bound): wide inputs CAP to it, " +
    "narrow inputs spread to it; 0/unset keeps the small-batch " +
    "spread to defaultParallelism") {
    val script = "function onRecord(r) return tostring(r.row.k) end"
    def shapedParts(inputParts: Int): Int = {
      val df = spark.range(1, 100).selectExpr("id AS k")
        .repartition(inputParts)
      graft.transform.LuaQueue.typedRecords(df, script, "s", "d")
        .rdd.getNumPartitions
    }
    assert(shapedParts(1) ==
      spark.sparkContext.defaultParallelism, "default spread width")
    spark.conf.set("spark.graft.queue.parallelism", "2")
    try {
      assert(shapedParts(1) == 2, "narrow input spreads to the bound")
      assert(shapedParts(16) == 2,
        "wide input CAPS at the bound — the pool-size semantics an " +
          "operator sets the knob for")
    } finally spark.conf.unset("spark.graft.queue.parallelism")
  }

  test("DDL validation: a lua script with a syntax error fails " +
    "CREATE SCRIPT (a hook-less one is a require-able library); a " +
    "mirror referencing a lua script keeps transformSql empty (the " +
    "SQL-parse check must not eat the lua source)") {
    // hook-less lua = library (LoadPeerdbScript semantics) — created
    // fine; binding it to a mirror is what errors
    run("CREATE SCRIPT bad1 LANG lua AS $$ local x = 1 $$")
    run("DROP SCRIPT bad1")
    intercept[Exception] {
      run("CREATE SCRIPT bad2 LANG lua AS $$ function onRecord(r) $$")
    }
    intercept[Exception] {
      run("CREATE SCRIPT bad3 LANG cobol AS $$ MOVE A TO B $$")
    }
    // a valid lua script attached to a mirror must NOT be parsed as a
    // SQL transform expression (it would fail the CREATE MIRROR)
    run("""CREATE SCRIPT ok LANG lua AS $$
      function onRecord(r) return tostring(r.checkpoint) end
    $$""")
    val base = tmpDir("lua_ddl")
    run(s"""CREATE MIRROR luaddl WITH (
       |  wal_dir '$base/wal', dest_dir '$base/dest',
       |  checkpoint_dir '$base/ckpt', pk 'id',
       |  table 'dest.t', schema 'id BIGINT, v BIGINT',
       |  script 'ok',
       |  queue_url 'kafka://127.0.0.1:9')""".stripMargin)
    run("DROP MIRROR luaddl")
    // a lua script on a destination that never calls onRecord is a
    // silent no-op — the DDL rejects it (es:// has no script hook)
    val e = intercept[IllegalArgumentException] {
      run(s"""CREATE MIRROR luanohook WITH (
         |  wal_dir '$base/wal2', dest_dir '$base/dest2',
         |  checkpoint_dir '$base/ckpt2', pk 'id',
         |  table 'dest.t', schema 'id BIGINT, v BIGINT',
         |  script 'ok',
         |  queue_url 'es://127.0.0.1:9')""".stripMargin)
    }
    assert(e.getMessage.contains("onRecord"), e.getMessage)
    run("DROP SCRIPT ok")
  }
}
