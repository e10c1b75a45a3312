package graft.mirror

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.model.ChangeRecord

/** Long-tail table-churn scenarios from the reference's e2e matrix:
  * cancel-table-addition mid-snapshot
  * (`flow/e2e/cancel_table_addition_test.go`) and mixed-case /
  * quoted-identifier churn (the generic suite's identifier cases). */
class TableChurnSpec extends SparkSpec {

  private def rec(cp: Long, table: String, json: String,
      tpe: Int = ChangeRecord.TypeInsert, matchJson: String = null)
      : ChangeRecord =
    ChangeRecord(tpe, cp, cp.toString, 1000L + cp, cp, "t", table,
      json, matchJson, Nil)

  test("cancel table addition mid-snapshot: the catch-up job is " +
    "interrupted, the partial destination is removed, the original " +
    "table keeps replicating") {
    val base = tmpDir("cancel_add")
    val wal = s"$base/wal"
    // primary table rows + a LARGE backlog for the to-be-added table
    // so its snapshot replay runs long enough to be interrupted
    ChangeLogWal.append(wal, Seq(
      rec(1, "d", """{"id":1,"v":10}"""),
      rec(2, "d", """{"id":2,"v":20}""")))
    val big = (10L until 120010L).map(i =>
      rec(i, "t5", s"""{"id":$i,"v":${i % 97}}"""))
    big.grouped(30000).foreach(g => ChangeLogWal.append(wal, g))

    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      destinationTable = "d")
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()
    assert(runner.destination().count() == 2)

    val tc = TableConfig(Seq("id"), cfg.payloadSchema)
    @volatile var caught: Option[Throwable] = None
    val adder = new Thread(() => {
      try runner.catchUpTable("t5", tc)
      catch { case e: Throwable => caught = Some(e) }
    }, "table-adder")
    adder.start()
    // cancel once the replay has live jobs in its group (canceling
    // before any job is submitted would be a no-op)
    val group = s"graft-addtable-d-t5"
    val deadline = System.nanoTime + 30000000000L
    while (spark.sparkContext.statusTracker
        .getJobIdsForGroup(group).isEmpty &&
      adder.isAlive && System.nanoTime < deadline) Thread.sleep(5)
    val interrupted = runner.cancelTableAddition("t5")
    adder.join(30000)
    assert(!adder.isAlive)
    if (interrupted) {
      // the normal path: the snapshot died mid-flight
      assert(caught.isDefined, "catch-up should fail when canceled")
    } // else the replay won the race — cleanup below must still hold

    // partial destination removed either way (idempotent cancel)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$base/dest_tables/t5")))

    // the mirror keeps replicating its pre-addition set
    ChangeLogWal.append(wal, Seq(rec(200000, "d", """{"id":3,"v":30}""")))
    runner.runAvailableNow()
    val d = runner.destination().filter(!col(graft.model.RawTable.IsDeleted))
    assert(d.count() == 3)
    assert(d.filter(col("id") === 3).count() == 1)

    // a retry after cancel starts clean and completes
    ChangeLogWal.append(wal, Seq(rec(200001, "t6", """{"id":7,"v":70}""")))
    runner.catchUpTable("t6", tc)
    assert(spark.read.parquet(s"$base/dest_tables/t6")
      .filter(col("id") === 7).count() == 1)
  }

  test("partitioned-table inheritance churn: leaf partitions route to " +
    "one root destination via table_map; a NEW partition announced " +
    "mid-stream lands in the same merged table on resume") {
    import graft.cdc.PgOutput._
    import java.nio.file.Paths
    val base = tmpDir("part_churn")
    val cap = s"$base/cap"
    def leafRel(relId: Int, name: String) =
      Relation(relId, "public", name, 'd'.toInt, Seq(
        RelationColumn(1, "id", Oid.Int8, -1),
        RelationColumn(0, "v", Oid.Int8, -1)))
    def ins(relId: Int, id: Long, v: Long) = Insert(relId,
      TupleData(Seq(text(id.toString), text(v.toString))))
    def tx(base: Long, msgs: Seq[Message], txId: Int) =
      Seq(base -> encode(Begin(base + 9, PgEpochMicros, txId))) ++
        msgs.zipWithIndex.map { case (m, i) =>
          (base + 1 + i) -> encode(m) } ++
        Seq((base + 9) -> encode(
          Commit(0, base + 9, base + 10, PgEpochMicros)))

    // two leaf partitions of "measurements" publish as themselves
    graft.cdc.PgOutputFrames.appendFrames(
      Paths.get(cap, "000001.pgout"),
      Seq(1L -> encode(leafRel(21, "measurements_2024")),
        2L -> encode(leafRel(22, "measurements_2025"))) ++
        tx(10, Seq(ins(21, 1, 100), ins(22, 2, 200)), 1))

    val cfg = GraftSql.parse(
      s"""CREATE MIRROR m_part WITH (
         |  wal_dir '$base/wal', dest_dir '$base/dest',
         |  checkpoint_dir '$base/ckpt', pk 'id',
         |  table 'public.measurements',
         |  schema 'id BIGINT, v BIGINT',
         |  capture_dir '$cap',
         |  table_map 'public.measurements_2024:public.measurements,
         |    public.measurements_2025:public.measurements,
         |    public.measurements_2026:public.measurements')""".stripMargin)
    assert(cfg.isDefined) // the DDL surface carries the routing
    val mc = MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("v", LongType))),
      destinationTable = "public.measurements",
      captureDir = Some(cap),
      tableRoutes = Map(
        "public.measurements_2024" -> "public.measurements",
        "public.measurements_2025" -> "public.measurements",
        "public.measurements_2026" -> "public.measurements"))
    val runner = new MirrorRunner(spark, mc)
    runner.runAvailableNow()
    val d1 = runner.destination().orderBy("id").collect()
    assert(d1.map(_.getLong(0)).toSeq == Seq(1L, 2L))

    // churn: a NEW leaf appears mid-stream (its Relation message
    // precedes its rows, like a freshly attached partition) plus more
    // rows in an old leaf — all merge into the same root on resume
    graft.cdc.PgOutputFrames.appendFrames(
      Paths.get(cap, "000002.pgout"),
      Seq(30L -> encode(leafRel(23, "measurements_2026"))) ++
        tx(40, Seq(ins(23, 3, 300), ins(21, 4, 400)), 2))
    runner.runAvailableNow()
    val d2 = runner.destination().orderBy("id").collect()
    assert(d2.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(d2.map(_.getLong(1)).toSeq == Seq(100L, 200L, 300L, 400L))
  }

  test("cancel is refused for an ESTABLISHED table: a long-replicating " +
    "extra table is never deleted by a stray/retried cancel") {
    val base = tmpDir("cancel_established")
    val wal = s"$base/wal"
    ChangeLogWal.append(wal, Seq(
      rec(1, "d", """{"id":1,"v":10}"""),
      rec(2, "x2", """{"id":5,"v":50}""")))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType)))
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = schema, destinationTable = "d",
      extraTables = Map("x2" -> TableConfig(Seq("id"), schema)))
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()
    assert(runner.destination("x2").count() == 1)
    // the cancel RPC on an established table is a refused no-op
    assert(!runner.cancelTableAddition("x2"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$base/dest_tables/x2")))
    assert(runner.destination("x2").count() == 1)
  }

  test("mixed-case identifiers: a quoted-style table name and " +
    "camel-case columns survive the whole pipeline (normalize, " +
    "pk merge, soft delete) without case folding") {
    val base = tmpDir("mixed_case")
    val wal = s"$base/wal"
    val table = "Public.MixedCase"
    ChangeLogWal.append(wal, Seq(
      rec(1, table, """{"Id":1,"CamelVal":"a"}"""),
      rec(2, table, """{"Id":2,"CamelVal":"b"}"""),
      // update by mixed-case pk
      rec(3, table, """{"Id":1,"CamelVal":"a2"}""",
        tpe = ChangeRecord.TypeUpdate, matchJson = """{"Id":1}"""),
      // delete by mixed-case pk
      rec(4, table, null, tpe = ChangeRecord.TypeDelete,
        matchJson = """{"Id":2}""")))

    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("Id"),
      payloadSchema = StructType(Seq(
        StructField("Id", LongType), StructField("CamelVal", StringType))),
      destinationTable = table)
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()

    val dest = runner.destination()
    // exact-case preservation end to end
    assert(dest.schema.fieldNames.toSeq.containsSlice(
      Seq("Id", "CamelVal")))
    val live = dest.filter(!col(graft.model.RawTable.IsDeleted))
    assert(live.count() == 1)
    val r = live.select("Id", "CamelVal").head()
    assert(r.getLong(0) == 1L && r.getString(1) == "a2")
    // the delete matched Id=2 by its mixed-case pk: no live row (an
    // in-batch insert+delete never materializes, so no tombstone either)
    assert(dest.filter(col("Id") === 2).filter(
      !col(graft.model.RawTable.IsDeleted)).count() == 0)

    // a CROSS-batch delete must match the materialized mixed-case pk
    // and leave a soft-delete tombstone
    ChangeLogWal.append(wal, Seq(
      rec(5, table, null, tpe = ChangeRecord.TypeDelete,
        matchJson = """{"Id":1}""")))
    runner.runAvailableNow()
    // destination() hides tombstones; the storage keeps them
    assert(runner.destination().count() == 0)
    val stored = spark.read.parquet(s"$base/dest")
    assert(stored.filter(col("Id") === 1 &&
      col(graft.model.RawTable.IsDeleted)).count() == 1)
  }
}
