package graft.transform

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import graft.model.ChangeRecord

/** Per-record user transform hook — the Spark restatement of the
  * reference's Lua `script` stage (flow/pua/stream_adapter.go:41-85): a
  * function that can mutate a record, drop it (None), or fan it out
  * (route/duplicate). Plain Scala closures on a typed Dataset — no sandbox
  * runtime needed; the closure serializes to executors and runs inside the
  * stream, exactly where the Lua pool sat in the reference.
  *
  * For SQL-surface user expressions, register plain Spark UDFs via
  * `spark.udf.register` instead — this hook is for whole-record logic
  * (routing, filtering, redaction).
  */
object RowTransform {

  implicit val changeRecordEncoder: Encoder[ChangeRecord] =
    Encoders.product[ChangeRecord]

  /** Mutate-or-drop, 1→0..1 (the CDC stream adapter contract). */
  def apply(ds: Dataset[ChangeRecord])(
      f: ChangeRecord => Option[ChangeRecord]): Dataset[ChangeRecord] =
    ds.flatMap(r => f(r))

  /** Fan-out variant, 1→0..n (queue-sink routing returns multiple
    * destination records, kafka.go:173-224). */
  def flat(ds: Dataset[ChangeRecord])(
      f: ChangeRecord => Seq[ChangeRecord]): Dataset[ChangeRecord] =
    ds.flatMap(r => f(r))

  /** STRING-configured per-record transform — the declarative face of the
    * Lua `script` option (a CREATE MIRROR can carry it as DDL text, like
    * the reference's `script` flow option): one Spark SQL expression,
    * evaluated once per record with the row-image JSON bound to `data`,
    * whose result replaces the image.
    *
    * Matching the reference's `transformRow` semantics exactly
    * (flow/activities/flowable.go:498-509: the SAME user fn runs over
    * the OLD and NEW row images), the expression is applied twice — to
    * `data` (new image) and, when present, to `matchData` (old image,
    * rebound under the `data` name so one expression serves both).
    * Codegen'd Catalyst all the way: unlike the reference's per-record
    * Lua pool, the "script" here fuses into the scan stage.
    *
    * Columns other than `data`/`matchData` are visible to the expression
    * read-only (e.g. `destinationTable` for table-conditional redaction)
    * and pass through unchanged. */
  def sqlTransform(frame: org.apache.spark.sql.DataFrame, exprStr: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // Row records only: relation/message records (recordType ≥ 3) carry
    // schema deltas / signals in `data`, not row images — the Lua
    // adapter never sees them either (they are not Insert/Update/Delete
    // records). Nil images skip the fn, as in the adapter's nil check.
    val isRow = col("recordType") <= lit(ChangeRecord.TypeDelete)
    frame
      .withColumn("_t_new",
        when(isRow && col("data").isNotNull, expr(exprStr))
          .otherwise(col("data")))
      .withColumn("data", col("matchData")) // rebind: old image as `data`
      .withColumn("_t_old",
        when(isRow && col("data").isNotNull, expr(exprStr))
          .otherwise(col("data")))
      .withColumn("data", col("_t_new"))
      .withColumn("matchData", col("_t_old"))
      .select(frame.columns.map(col).toIndexedSeq: _*)
  }
}
