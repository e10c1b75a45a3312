package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.QKind

/** Schema-change deltas and their application — the RelationRecord →
  * TableSchemaDelta path (flow/connectors/postgres/cdc.go:1259-1443,
  * applied in applySchemaDeltas, flow/activities/flowable_core.go:65-119;
  * proto at protos/flow.proto:490).
  *
  * In this engine the payload travels as JSON until normalize, so an added
  * column needs NO stream replan: the delta only widens the payload
  * `StructType` the normalizer parses with (old rows yield NULL for the new
  * field — exactly the reference's backfill-as-null semantics) and emits
  * `ALTER TABLE` DDL for warehouse sinks.
  */
final case class AddedColumn(name: String, kind: QKind)

final case class TableSchemaDelta(
    srcTable: String,
    dstTable: String,
    addedColumns: Seq[AddedColumn])

object SchemaEvolution {

  /** Diff a freshly observed relation schema against the cached one —
    * processRelationMessage's column diff (cdc.go:1259-1443). Dropped
    * columns are retained on the destination (reference behavior: only
    * additive deltas replicate). */
  def diff(srcTable: String, dstTable: String, cached: StructType,
      observed: StructType): Option[TableSchemaDelta] = {
    val known = cached.fieldNames.toSet
    val added = observed.fields.toSeq.collect {
      case f if !known.contains(f.name) =>
        AddedColumn(f.name, QKind.fromSpark(f.dataType))
    }
    if (added.isEmpty) None
    else Some(TableSchemaDelta(srcTable, dstTable, added))
  }

  /** Widened payload schema for the normalizer. */
  def apply(schema: StructType, delta: TableSchemaDelta): StructType =
    StructType(schema.fields ++ delta.addedColumns.map(c =>
      StructField(c.name, c.kind.toSpark, nullable = true)))

  /** Wire codec for the delta — RelationRecords carry it as the `data`
    * payload of a recordType-3 change (ChangeRecord.TypeRelation), the
    * analog of the RelationMessage travelling inside the stream. */
  private lazy val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(
      com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def deltaToJson(d: TableSchemaDelta): String = {
    val cols = d.addedColumns.map(c =>
      java.util.Map.of("name", c.name, "kind", c.kind.name))
    mapper.writeValueAsString(java.util.Map.of(
      "srcTable", d.srcTable, "dstTable", d.dstTable,
      "addedColumns", cols.toArray))
  }

  def deltaFromJson(json: String): TableSchemaDelta = {
    val n = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    TableSchemaDelta(
      n.get("srcTable").asText(),
      n.get("dstTable").asText(),
      n.get("addedColumns").elements().asScala.map(c =>
        AddedColumn(c.get("name").asText(),
          QKind.fromName(c.get("kind").asText()))).toSeq)
  }

  /** Warehouse-sink DDL for the delta (the replayAddedColumns step,
    * clickhouse/cdc.go:228-330). */
  def alterTableSql(delta: TableSchemaDelta): Seq[String] =
    delta.addedColumns.map(c =>
      s"""ALTER TABLE ${delta.dstTable} ADD COLUMN IF NOT EXISTS """ +
        s""""${c.name}" ${QKind.toAnsiDdl(c.kind)}""")

  /** Align an existing parquet-backed destination to a widened schema:
    * reads tolerate missing columns by selecting with null fill —
    * the Delta-`mergeSchema` equivalent for the plain-parquet writer. */
  def alignFrame(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    val cols = target.fields.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } ++ df.columns.filterNot(target.fieldNames.contains).map(col)
    df.select(cols.toSeq: _*)
  }
}
