package graft.mirror

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.{ChangeLogWal, SchemaEvolution, TableSchemaDelta,
  AddedColumn}
import graft.model.ChangeRecord
import graft.types.QKind

/** TableMapping.exclude (pull + schema-delta halves, cdc.go:364,
  * 1327-1334) and the SoftDeleteColName / SyncedAtColName destination
  * column options (model.go:167-168). */
class ColumnSettingsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", LongType),
    StructField("secret", StringType)))

  private def rec(cp: Long, rt: Int, data: String,
      matchData: String = null): ChangeRecord =
    ChangeRecord(rt, cp, cp.toString, cp * 1000, cp / 10, "public.t",
      "dest.t", data, matchData, Nil)

  test("excluded column never replicates, even via a schema delta") {
    val wal = tmpDir("wal")
    val base = tmpDir("mirror")
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = schema, destinationTable = "dest.t",
      excludeColumns = Set("secret"))

    ChangeLogWal.append(wal, Seq(
      rec(1, ChangeRecord.TypeInsert,
        """{"id":1,"v":10,"secret":"pw1"}"""),
      rec(2, ChangeRecord.TypeInsert,
        """{"id":2,"v":20,"secret":"pw2"}""")))
    val r1 = new MirrorRunner(spark, cfg)
    r1.runAvailableNow()
    assert(!r1.destination().columns.contains("secret"))
    assert(r1.destination().count() == 2)

    // A RelationRecord re-announcing `secret` (plus a genuinely new
    // column) must add only the new one — the reference's
    // isAddedColumnAndNotExcluded guard.
    val delta = TableSchemaDelta("public.t", "dest.t", Seq(
      AddedColumn("secret", QKind.QString),
      AddedColumn("extra", QKind.QInt64)))
    ChangeLogWal.append(wal, Seq(
      rec(10, ChangeRecord.TypeRelation,
        SchemaEvolution.deltaToJson(delta)),
      rec(11, ChangeRecord.TypeInsert,
        """{"id":3,"v":30,"secret":"pw3","extra":7}""")))
    val r2 = new MirrorRunner(spark, cfg)
    r2.runAvailableNow()
    val cols = r2.destination().columns.toSet
    assert(cols.contains("extra") && !cols.contains("secret"))
    val row3 = r2.destination().filter(col("id") === 3L).collect().head
    assert(row3.getAs[Long]("extra") == 7L)

    // …and a restart recovering the widened schema from the destination
    // must not resurrect the excluded column either.
    val r3 = new MirrorRunner(spark, cfg)
    assert(!r3.destination().columns.contains("secret"))
  }

  test("excluding a replica-identity column is rejected") {
    intercept[IllegalArgumentException] {
      TableConfig(Seq("id"), schema, excludeColumns = Set("id", "v"))
    }
  }

  test("custom soft-delete + synced-at destination columns") {
    val wal = tmpDir("wal")
    val base = tmpDir("mirror")
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(schema.fields.take(2)),
      destinationTable = "dest.t",
      softDeleteColName = "_PEERDB_IS_DELETED",
      syncedAtColName = Some("_PEERDB_SYNCED_AT"))

    ChangeLogWal.append(wal, Seq(
      rec(1, ChangeRecord.TypeInsert, """{"id":1,"v":10}"""),
      rec(2, ChangeRecord.TypeInsert, """{"id":2,"v":20}"""),
      rec(3, ChangeRecord.TypeDelete, null, """{"id":2}""")))
    val r1 = new MirrorRunner(spark, cfg)
    r1.runAvailableNow()

    // Physical parquet carries the configured names; the logical surface
    // (destination()) still filters soft deletes.
    val phys = spark.read.parquet(s"$base/dest")
    assert(phys.columns.contains("_PEERDB_IS_DELETED"))
    assert(phys.columns.contains("_PEERDB_SYNCED_AT"))
    assert(!phys.columns.contains(graft.model.RawTable.IsDeleted))
    assert(phys.filter(col("_PEERDB_IS_DELETED")).count() == 1) // tombstone
    assert(r1.destination().count() == 1)
    val stamp1 = phys.filter(col("id") === 1L).collect()
      .head.getAs[Long]("_PEERDB_SYNCED_AT")
    assert(stamp1 > 0L)

    // Second batch touches only id=2 (reinsert): its stamp is fresh,
    // id=1's survives the bucket rewrite unchanged.
    Thread.sleep(5)
    ChangeLogWal.append(wal, Seq(
      rec(20, ChangeRecord.TypeInsert, """{"id":2,"v":22}""")))
    new MirrorRunner(spark, cfg).runAvailableNow()
    val after = spark.read.parquet(s"$base/dest").collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("_PEERDB_SYNCED_AT"),
          r.getAs[Boolean]("_PEERDB_IS_DELETED"))).toMap
    assert(after(1L)._1 == stamp1)
    assert(after(2L)._1 >= stamp1 && !after(2L)._2)
    assert(after(2L)._1 > after(1L)._1)
  }
}
