package graft.transform

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.mirror.GraftSql
import graft.model.ChangeRecord

/** The CDC adapt-stream seam (flowable.go:485-512 +
  * pua/stream_adapter.go): a mirror's lua script defining
  * `transformRecord`/`transformRow` mutates pulled row images in place
  * before raw staging — on ANY destination, not just queues. */
class LuaAdaptSpec extends SparkSpec {

  private def rec(cp: Long, rt: Int, data: String,
      matchData: String = null): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "dest.t", data, matchData, Nil)

  private def run(sql: String) = GraftSql.execute(spark,
    GraftSql.parse(sql).getOrElse(fail(s"did not parse: $sql")))

  test("hooksOf reports the script's callable hooks; a hook-less lua " +
    "source is an accepted LIBRARY at CREATE SCRIPT but rejected " +
    "when bound as a mirror's script") {
    assert(LuaAdapt.hooksOf("function onRecord(r) end") ==
      Set("onRecord"))
    assert(LuaAdapt.hooksOf(
      "function transformRow(row) end\nfunction onRecord(r) end") ==
      Set("onRecord", "transformRow"))
    assert(LuaAdapt.hooksOf("x = 1\ntransformRecord = 'nope'").isEmpty)
    // a library (no hooks) is createable — it exists to be require'd
    run("CREATE SCRIPT lib_ok LANG lua AS $$ local m = {} " +
      "function m.f(x) return x end return m $$")
    // ... but binding it as a mirror's script is a DDL error
    val wal = tmpDir("lib_wal"); val base = tmpDir("lib_base")
    val e = intercept[IllegalArgumentException] {
      run(s"""CREATE MIRROR libm WITH (
         |  wal_dir '$wal', dest_dir '$base/d',
         |  checkpoint_dir '$base/c', pk 'id',
         |  table 'dest.t', schema 'id BIGINT',
         |  script 'lib_ok')""".stripMargin)
    }
    assert(e.getMessage.contains("library"))
    // a top-level run error still fails CREATE SCRIPT
    intercept[Lua.LuaError] {
      run("CREATE SCRIPT bad LANG lua AS $$ error('boom') $$")
    }
  }

  test("require resolves OTHER catalog scripts (LoadPeerdbScript, " +
    "peerdb.go:122-147): a transform script require's a shared " +
    "library through the snapshot that rides to executors, loaded " +
    "once per interpreter (package.loaded)") {
    import spark.implicits._
    val libSrc = """
      local m = {}
      function m.uplift(cents)
        return (peerdb.Decimal(cents) * "1.07").int64
      end
      return m"""
    run(s"CREATE OR REPLACE SCRIPT taxlib LANG lua AS $$$$$libSrc $$$$")
    val libs = Map("taxlib" -> libSrc)
    val batch = Seq(
      rec(1, ChangeRecord.TypeInsert, """{"id":1,"cents":1000}"""),
      rec(2, ChangeRecord.TypeInsert, """{"id":2,"cents":999}"""))
      .toDS().toDF()
    val out = LuaAdapt.records(batch, """
      local tax = require "taxlib"
      local tax2 = require "taxlib"  -- cached, not re-run
      function transformRecord(r)
        r.row.cents = tax.uplift(r.row.cents)
      end""", libs).as[ChangeRecord].collect().sortBy(_.checkpointId)
    assert(out(0).data == """{"id":1,"cents":1070}""")
    assert(out(1).data == """{"id":2,"cents":1068}""") // 1068.93 → int64
    // unresolvable require is a script error carrying the reference's
    // loader message
    val e = intercept[Lua.LuaError] {
      LuaAdapt.hooksOf("""local x = require "missing" """)
    }
    assert(e.getMessage.contains("Could not find script missing"))
  }

  test("transformRecord mutates images in place: kind-dispatched " +
    "writes land in data/matchData, untouched records keep their " +
    "ORIGINAL json bytes, relation records flow through") {
    import spark.implicits._
    // odd spacing proves passthrough records are NOT re-encoded
    val oddJson = """{ "id" : 3 ,  "v" : 30 }"""
    val batch = Seq(
      rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
      rec(2, ChangeRecord.TypeUpdate, """{"id":2,"v":21}""",
        matchData = """{"id":2,"v":20}"""),
      rec(3, ChangeRecord.TypeDelete, oddJson),
      rec(4, ChangeRecord.TypeRelation,
        """{"dstTableName":"dest.t","addedColumns":[]}"""))
      .toDS().toDF()
    val out = LuaAdapt.records(batch, """
      function transformRecord(r)
        if r.kind == "insert" then
          r.row.v = r.row.v * 2
          r.row.tag = "ins"
        elseif r.kind == "update" then
          -- old and new are distinct images of one update
          r.new.v = r.new.v + 100
          r.old.v = r.old.v + 1000
        end
        -- deletes and relation records untouched
      end""").as[ChangeRecord].collect().sortBy(_.checkpointId)

    assert(out(0).data == """{"id":1,"v":20,"tag":"ins"}""")
    assert(out(1).data == """{"id":2,"v":121}""")
    assert(out(1).matchData == """{"id":2,"v":1020}""")
    // byte-identical passthrough (no re-encode of untouched images)
    assert(out(2).data == oddJson)
    assert(out(3).data ==
      """{"dstTableName":"dest.t","addedColumns":[]}""")
    // stream shape preserved: every record flows, metadata unchanged
    assert(out.map(_.recordType).toSeq == Seq(0, 1, 2, 3))
    assert(out.map(_.checkpointText).toSeq ==
      Seq("1", "2", "3", "4"))
  }

  test("transformRow is the reference's wrapper (flowable.go:499-508):" +
    " called on `old` and `new` when non-nil — update hits both " +
    "images, insert only new, delete only the old image riding data; " +
    "row aliasing means one write per image") {
    import spark.implicits._
    val batch = Seq(
      rec(1, ChangeRecord.TypeInsert, """{"id":1,"calls":0}"""),
      rec(2, ChangeRecord.TypeUpdate, """{"id":2,"calls":0}""",
        matchData = """{"id":2,"calls":0}"""),
      rec(3, ChangeRecord.TypeDelete, """{"id":3,"calls":0}"""))
      .toDS().toDF()
    val out = LuaAdapt.records(batch, """
      function transformRow(row)
        row.calls = row.calls + 1
      end""").as[ChangeRecord].collect().sortBy(_.checkpointId)
    assert(out(0).data == """{"id":1,"calls":1}""")
    assert(out(1).data == """{"id":2,"calls":1}""")
    assert(out(1).matchData == """{"id":2,"calls":1}""")
    // delete: ONE call — old aliases the image riding data, new is nil
    assert(out(2).data == """{"id":3,"calls":1}""")
    assert(out(2).matchData == null)
  }

  test("transformRecord wins when both hooks are defined " +
    "(flowable.go:496-498 checks it first)") {
    import spark.implicits._
    val batch =
      Seq(rec(1, ChangeRecord.TypeInsert, """{"id":1}""")).toDS().toDF()
    val out = LuaAdapt.records(batch, """
      function transformRecord(r) r.row.who = "record" end
      function transformRow(row) row.who = "row" end""")
      .as[ChangeRecord].collect()
    assert(out(0).data == """{"id":1,"who":"record"}""")
  }

  test("a lua transform script runs on a WAREHOUSE mirror end to end " +
    "through the DDL path: the raw changefeed and the normalized " +
    "destination both hold transformed images (redaction + exact " +
    "decimal tax shaping)") {
    val wal = tmpDir("adapt_wal")
    val base = tmpDir("adapt_mirror")
    ChangeLogWal.append(wal, Seq(
      rec(1, ChangeRecord.TypeInsert,
        """{"id":1,"email":"a@x.com","cents":19999}"""),
      rec(2, ChangeRecord.TypeInsert,
        """{"id":2,"email":"b@y.org","cents":100}"""),
      rec(3, ChangeRecord.TypeUpdate,
        """{"id":1,"email":"c@z.io","cents":29999}""",
        matchData = """{"id":1}""")))

    run("""CREATE SCRIPT redact LANG lua AS $$
      function transformRow(row)
        if row.email ~= nil then
          row.email = string.gsub(row.email, "^[^@]+", "***")
        end
        if row.cents ~= nil then
          -- exact decimal: 5% uplift in integer cents
          row.cents = (peerdb.Decimal(row.cents) * "1.05").int64
        end
      end
    $$""")
    run(s"""CREATE MIRROR adaptmir WITH (
       |  wal_dir '$wal', dest_dir '$base/dest',
       |  checkpoint_dir '$base/ckpt', pk 'id',
       |  table 'dest.t',
       |  schema 'id BIGINT, email STRING, cents BIGINT',
       |  raw_dir '$base/raw',
       |  script 'redact')""".stripMargin)
    run("EXECUTE MIRROR adaptmir")

    val dest = spark.read.parquet(s"$base/dest")
      .filter("NOT _peerdb_is_deleted")
      .select("id", "email", "cents")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(dest == Seq(
      (1L, "***@z.io", 31498L), // 29999 * 1.05 = 31498.95 → int64
      (2L, "***@y.org", 105L)))

    // the durable changefeed already holds transformed images — the
    // reference attaches its adapter BEFORE raw staging
    val raw = spark.read.parquet(s"$base/raw")
      .select("_peerdb_data").collect().map(_.getString(0))
    assert(raw.forall(!_.contains("a@x.com")),
      s"raw must not leak pre-transform images: ${raw.mkString("; ")}")
  }

  test("QRep transformRow over TYPED rows (flowable.go:756-771, " +
    "AttachToStream): integral/floating/decimal/timestamp/array " +
    "bridge both ways, schema pinned, added columns ignored, " +
    "untouched rows pass through unconverted") {
    val df = spark.sql("""SELECT * FROM VALUES
        (1L, 'widget', CAST(1.50 AS DECIMAL(10,2)), 3L, 10.0D,
         timestamp_micros(1700000000000000), array('a','b')),
        (2L, 'gadget', CAST(2.25 AS DECIMAL(10,2)), 5L, 20.0D,
         timestamp_micros(1700000001000000), array('c')),
        (3L, NULL, CAST(9.99 AS DECIMAL(10,2)), 0L, 0.5D,
         timestamp_micros(1700000002000000), array())
      AS t(id, name, price, qty, score, ts, tags)""")
    val out = LuaRowTransform.rows(df, """
      function transformRow(row)
        if row.name ~= nil then
          row.name = string.upper(row.name)
          row.price = row.price * 2
          row.qty = row.qty + 1
          row.score = row.score / 4
          row.extra = "not in schema"
        end
        if row.id == 1 then row.tags = {"x", "y", "z"} end
      end""")
    assert(out.schema == df.schema, "schema must be pinned")
    val rows = out.collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) == "WIDGET")
    assert(rows(0).getDecimal(2).toPlainString == "3.00")
    assert(rows(0).getLong(3) == 4L)
    assert(rows(0).getDouble(4) == 2.5)
    assert(rows(0).getSeq[String](6) == Seq("x", "y", "z"))
    assert(rows(1).getString(1) == "GADGET")
    assert(rows(1).getDecimal(2).toPlainString == "4.50")
    // row 3: name NULL → script wrote nothing → identical values
    assert(rows(2).isNullAt(1))
    assert(rows(2).getDecimal(2).toPlainString == "9.99")
    assert(rows(2).getTimestamp(5).toInstant.toEpochMilli ==
      1700000002000L)
  }

  test("a lua transformRow script runs on a QREP mirror through the " +
    "DDL path; a lua script without transformRow fails the qrep " +
    "CREATE") {
    import org.apache.spark.sql.SparkSession
    val s = spark.newSession()
    SparkSession.setActiveSession(s)
    try {
      val base = tmpDir("qrep_lua")
      s.range(0, 50).selectExpr("id AS k", "id * 10 AS v",
        "CAST(id AS STRING) AS label")
        .write.parquet(s"$base/src/rows.parquet")
      GraftSql.execute(s, GraftSql.parse(
        s"CREATE PEER qlsrc TYPE parquet OPTIONS (dir '$base/src')").get)
      GraftSql.execute(s, GraftSql.parse(
        s"CREATE PEER qldst TYPE parquet OPTIONS (dir '$base/dst')").get)
      GraftSql.execute(s, GraftSql.parse(
        """CREATE SCRIPT qshape LANG lua AS $$
          function transformRow(row)
            row.v = row.v + 1
            row.label = "L" .. row.label
          end $$""").get)
      GraftSql.execute(s, GraftSql.parse(
        "CREATE MIRROR qlua FROM qlsrc TO qldst FOR " +
          "$$ SELECT k, v, label FROM rows WHERE k " +
          "BETWEEN {{.start}} AND {{.end}} $$ " +
          "WITH (watermark_column 'k', source_table 'rows', " +
          s"dest_dir '$base/dest', num_partitions '4', " +
          "script 'qshape')").get)
      val moved = GraftSql.execute(s, GraftSql.parse(
        "EXECUTE MIRROR qlua").get).head.getLong(0)
      assert(moved == 50L)
      val got = s.read.parquet(s"$base/dest")
        .selectExpr("k", "v", "label").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1)
      assert(got(0) == ((0L, 1L, "L0")))
      assert(got(49) == ((49L, 491L, "L49")))

      // reachability: QRep reads ONLY transformRow
      GraftSql.execute(s, GraftSql.parse(
        """CREATE SCRIPT qroute LANG lua AS $$
          function onRecord(r) return "x" end $$""").get)
      val e = intercept[IllegalArgumentException] {
        GraftSql.execute(s, GraftSql.parse(
          "CREATE MIRROR qlua2 FROM qlsrc TO qldst FOR " +
            "$$ SELECT k FROM rows WHERE k " +
            "BETWEEN {{.start}} AND {{.end}} $$ " +
            "WITH (watermark_column 'k', source_table 'rows', " +
            s"dest_dir '$base/dest2', script 'qroute')").get)
      }
      assert(e.getMessage.contains("transformRow"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("DDL validation: onRecord-only script still needs a queue " +
    "destination; a queue mirror needs onRecord") {
    val wal = tmpDir("adapt_v_wal")
    val base = tmpDir("adapt_v_base")
    run("""CREATE SCRIPT routeonly LANG lua AS $$
      function onRecord(r) return tostring(r.checkpoint) end $$""")
    run("""CREATE SCRIPT roweronly LANG lua AS $$
      function transformRow(row) end $$""")
    val e1 = intercept[IllegalArgumentException] {
      run(s"""CREATE MIRROR vm1 WITH (
         |  wal_dir '$wal', dest_dir '$base/d1',
         |  checkpoint_dir '$base/c1', pk 'id',
         |  table 'dest.t', schema 'id BIGINT',
         |  script 'routeonly')""".stripMargin)
    }
    assert(e1.getMessage.contains("queue_url"))
    val e2 = intercept[IllegalArgumentException] {
      run(s"""CREATE MIRROR vm2 WITH (
         |  wal_dir '$wal', dest_dir '$base/d2',
         |  checkpoint_dir '$base/c2', pk 'id',
         |  table 'dest.t', schema 'id BIGINT',
         |  script 'roweronly',
         |  queue_url 'kafka://127.0.0.1:1')""".stripMargin)
    }
    assert(e2.getMessage.contains("onRecord"))
  }
}
