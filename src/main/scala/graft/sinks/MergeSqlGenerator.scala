package graft.sinks

import org.apache.spark.sql.types.StructType

import graft.model.RawTable
import graft.types.QKind

/** Warehouse-sink SQL generation: the statements a JDBC destination runs to
  * create the normalized table and merge a staged batch into it — the
  * engine-owned text-generation half of the reference's per-warehouse
  * generators (postgres/normalize_stmt_generator.go:74-327,
  * snowflake/merge_stmt_generator.go:29-225).
  *
  * Differences by design (Spark-first restatement):
  *   - the staged batch is already deduped + TOAST-backfilled by
  *     [[graft.cdc.Normalizer]], so the MERGE needs no RANK() CTE and no
  *     per-TOAST-combination UPDATE branches — unchanged columns arrive as
  *     `COALESCE(src.c, dst.c)` (the coalesce-by-presence strategy);
  *   - one ANSI dialect: peers that can't run MERGE use the
  *     UPSERT+DELETE fallback (the PG<15 path,
  *     normalize_stmt_generator.go:89-146).
  */
final case class MergeTarget(
    table: String,
    stagingTable: String,
    pkColumns: Seq[String],
    schema: StructType,
    softDelete: Boolean = true)

object MergeSqlGenerator {

  private def q(id: String) = "\"" + id.replace("\"", "\"\"") + "\""

  def dataColumns(t: MergeTarget): Seq[String] =
    t.schema.fieldNames.toSeq

  private def valueColumns(t: MergeTarget): Seq[String] =
    dataColumns(t).filterNot(t.pkColumns.contains)

  /** CREATE TABLE with engine metadata columns (the SetupNormalizedTables
    * step, flow/connectors/core.go:216-224). */
  def createTable(t: MergeTarget): String = {
    val cols = t.schema.fields.map(f =>
      s"${q(f.name)} ${QKind.toAnsiDdl(QKind.fromSpark(f.dataType))}" +
        (if (t.pkColumns.contains(f.name)) " NOT NULL" else ""))
    val meta = Seq(
      s"${q(RawTable.Version)} BIGINT NOT NULL",
      s"${q(RawTable.IsDeleted)} BOOLEAN NOT NULL DEFAULT FALSE",
      s"${q(RawTable.SyncedAt)} TIMESTAMP")
    val pk = s"PRIMARY KEY (${t.pkColumns.map(q).mkString(", ")})"
    s"""CREATE TABLE IF NOT EXISTS ${t.table} (
       |  ${(cols ++ meta :+ pk).mkString(",\n  ")}
       |)""".stripMargin
  }

  /** ANSI MERGE: matched+delete → soft-delete UPDATE or DELETE; matched →
    * version-guarded UPDATE with absent-column coalesce; not matched →
    * INSERT (skipping tombstones on hard-delete targets). */
  def merge(t: MergeTarget): String = {
    val pkOn = t.pkColumns.map(c => s"dst.${q(c)} = src.${q(c)}")
      .mkString(" AND ")
    val setCols = valueColumns(t)
      .map(c => s"${q(c)} = COALESCE(src.${q(c)}, dst.${q(c)})")
    val setMeta = Seq(
      s"${q(RawTable.Version)} = src.${q(RawTable.Version)}",
      s"${q(RawTable.SyncedAt)} = CURRENT_TIMESTAMP")
    val insCols = (dataColumns(t) ++
      Seq(RawTable.Version, RawTable.IsDeleted, RawTable.SyncedAt)).map(q)
    val insVals = dataColumns(t).map(c => s"src.${q(c)}") ++
      Seq(s"src.${q(RawTable.Version)}",
        s"src.${q(RawTable.IsDeleted)}", "CURRENT_TIMESTAMP")
    val newer = s"src.${q(RawTable.Version)} >= dst.${q(RawTable.Version)}"
    val whenDelete =
      if (t.softDelete)
        s"""WHEN MATCHED AND src.${q(RawTable.IsDeleted)} AND $newer THEN
           |  UPDATE SET ${q(RawTable.IsDeleted)} = TRUE,
           |    ${(setMeta).mkString(", ")}""".stripMargin
      else
        s"WHEN MATCHED AND src.${q(RawTable.IsDeleted)} AND $newer THEN" +
          " DELETE"
    val insertGuard =
      if (t.softDelete) "" else s" AND NOT src.${q(RawTable.IsDeleted)}"
    s"""MERGE INTO ${t.table} dst
       |USING ${t.stagingTable} src
       |ON $pkOn
       |$whenDelete
       |WHEN MATCHED AND NOT src.${q(RawTable.IsDeleted)} AND $newer THEN
       |  UPDATE SET ${(setCols ++ setMeta :+
      s"${q(RawTable.IsDeleted)} = FALSE").mkString(", ")}
       |WHEN NOT MATCHED$insertGuard THEN
       |  INSERT (${insCols.mkString(", ")})
       |  VALUES (${insVals.mkString(", ")})""".stripMargin
  }

  /** UPSERT + DELETE fallback for peers without MERGE (PG<15 path,
    * normalize_stmt_generator.go:89-146). */
  def upsertFallback(t: MergeTarget): Seq[String] = {
    val cols = (dataColumns(t) ++
      Seq(RawTable.Version, RawTable.IsDeleted)).map(q)
    val conflictSets = (valueColumns(t).map(c =>
      s"${q(c)} = COALESCE(EXCLUDED.${q(c)}, ${t.table}.${q(c)})") ++ Seq(
      s"${q(RawTable.Version)} = EXCLUDED.${q(RawTable.Version)}",
      s"${q(RawTable.IsDeleted)} = EXCLUDED.${q(RawTable.IsDeleted)}"))
      .mkString(", ")
    val upsert =
      s"""INSERT INTO ${t.table} (${cols.mkString(", ")})
         |SELECT ${cols.map(c => s"src.$c").mkString(", ")}
         |FROM ${t.stagingTable} src
         |ON CONFLICT (${t.pkColumns.map(q).mkString(", ")}) DO UPDATE SET
         |  $conflictSets
         |WHERE ${t.table}.${q(RawTable.Version)} <=
         |  EXCLUDED.${q(RawTable.Version)}""".stripMargin
    if (t.softDelete) Seq(upsert)
    else Seq(upsert,
      s"DELETE FROM ${t.table} WHERE ${q(RawTable.IsDeleted)}")
  }
}
