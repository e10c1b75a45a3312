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
}
