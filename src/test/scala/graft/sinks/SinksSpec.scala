package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.RawTable

class SinksSpec extends SparkSpec {

  private val target = MergeTarget(
    table = "pub.dst", stagingTable = "stage.batch",
    pkColumns = Seq("id"),
    schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType))))

  test("CREATE TABLE carries engine metadata columns and PK") {
    val ddl = MergeSqlGenerator.createTable(target)
    assert(ddl.contains(""""id" BIGINT NOT NULL"""))
    assert(ddl.contains(""""v" DOUBLE PRECISION"""))
    assert(ddl.contains(s""""${RawTable.Version}" BIGINT NOT NULL"""))
    assert(ddl.contains("""PRIMARY KEY ("id")"""))
  }

  test("MERGE: version guard, absent-column coalesce, soft delete branch") {
    val m = MergeSqlGenerator.merge(target)
    assert(m.contains("""ON dst."id" = src."id""""))
    assert(m.contains(""""name" = COALESCE(src."name", dst."name")"""))
    assert(m.contains(
      s"""src."${RawTable.Version}" >= dst."${RawTable.Version}""""))
    assert(m.contains(s""""${RawTable.IsDeleted}" = TRUE"""))
    assert(!m.contains("THEN DELETE"))
    val hard = MergeSqlGenerator.merge(target.copy(softDelete = false))
    assert(hard.contains("THEN DELETE"))
    assert(hard.contains(s"""AND NOT src."${RawTable.IsDeleted}" THEN"""))
  }

  test("UPSERT fallback uses ON CONFLICT with version guard") {
    val stmts = MergeSqlGenerator.upsertFallback(
      target.copy(softDelete = false))
    assert(stmts.size == 2)
    assert(stmts.head.contains("""ON CONFLICT ("id") DO UPDATE SET"""))
    assert(stmts.head.contains(
      s"""pub.dst."${RawTable.Version}" <=\n  EXCLUDED."${RawTable.Version}""""))
    assert(stmts(1).startsWith("DELETE FROM pub.dst"))
  }

  test("queue records take the kafka sink shape with routing hook") {
    import spark.implicits._
    val raw = Seq(("u1", 1L, "pub.t", """{"id":1}""", 0))
      .toDF(RawTable.Uid, RawTable.Timestamp, RawTable.DestinationTable,
        RawTable.Data, RawTable.RecordType)

    val out = QueueSink.defaultRecords(raw)
    assert(out.columns.toSeq ==
      Seq("topic", "key", "value", "headers"))
    val r = out.collect().head
    assert(r.getAs[String]("topic") == "pub.t")
    assert(r.getAs[String]("key") == "u1")
    assert(r.getAs[String]("value").contains("\"_peerdb_record_type\":0"))

    val routed = QueueSink.records(raw,
      topic = concat(lit("cdc."), col(RawTable.DestinationTable)),
      key = col(RawTable.Timestamp),
      value = col(RawTable.Data),
      headers = Map("src" -> lit("graft")))
    val rr = routed.collect().head
    assert(rr.getAs[String]("topic") == "cdc.pub.t")
    assert(rr.getAs[String]("value") == """{"id":1}""")
  }
}
