package graft.transform

import org.apache.spark.sql.DataFrame

/** The reference's CDC adapt-stream seam (flow/activities/flowable.go:
  * 485-512 + flow/pua/stream_adapter.go `AttachToCdcStream`): a
  * mirror's `script_lang 'lua'` script may define
  *
  *   - `transformRecord(record)` — called once per pulled change
  *     record; the script mutates the record's row images IN PLACE
  *     through the row userdata's __newindex (LuaRowNewIndex), and
  *     the mutated images ride on to raw staging, or
  *   - `transformRow(row)` — the reference's convenience wrapper
  *     (flowable.go:499-508): called on the record's `old` and `new`
  *     images, each when non-nil.
  *
  * Unlike `onRecord` (queue routing — records are REPLACED by shaped
  * queue messages), the transform hooks keep the stream's shape: every
  * record flows through with the same checkpoint/type/table metadata,
  * only data/matchData change. The stage runs between pull and raw
  * staging, so the durable changefeed already holds transformed images
  * and normalize/replays/catch-up all see one consistent stream —
  * exactly where the reference attaches its adapter.
  *
  * Distributed like [[LuaQueue]]: one interpreter per Spark partition
  * (the reference's LuaPool keeps one LState per worker), records
  * never collect to the driver. Untouched records keep their ORIGINAL
  * JSON bytes — only images a script actually wrote are re-encoded
  * ([[LuaRecordEnv.RowItems.isDirty]]), so a `transformRecord` that
  * filters on `r.kind` costs nothing on the records it skips.
  */
final class LuaAdaptScript(val source: String,
    val libs: Map[String, String] = Map.empty) extends Serializable {

  @transient private lazy val ast = Lua.parse(source)

  private def boot(): (Lua.Interp, Option[Lua.V], Option[Lua.V]) = {
    val interp = new Lua.Interp()
    val g = LuaRecordEnv.env(interp, libs = libs)
    interp.run(ast, g)
    def fn(name: String): Option[Lua.V] = g.lookup(name).filter {
      case _: Lua.VFunc | _: Lua.VNative => true
      case _ => false
    }
    // transformRecord wins when both are defined (flowable.go:496-498
    // checks it first)
    (interp, fn("transformRecord"), fn("transformRow"))
  }

  /** DDL-time probe: does the script define either transform hook?
    * (A script with neither — e.g. a pure `onRecord` routing script —
    * passes the stream through untouched, flowable.go:511.) */
  def hasHook: Boolean = {
    val (_, rec, row) = boot()
    rec.isDefined || row.isDefined
  }

  /** Per-partition executor: run the hook over one record and return
    * its (data, matchData) images — the ORIGINAL string instances when
    * the script didn't write to an image (`eq`-checkable upstream). */
  final class PartitionRunner {
    private val (interp, recFn, rowFn) = boot()

    def transformImages(r: LuaRecordEnv.Rec): (String, String) = {
      if (recFn.isEmpty && rowFn.isEmpty) return (r.data, r.matchData)
      val imgs = LuaRecordEnv.imagesOf(r)
      recFn match {
        case Some(f) =>
          interp.call(f, Seq(LuaRecordEnv.recordUD(r, () => imgs)))
        case None =>
          // the reference wrapper reads the record's `old` then `new`
          // fields and calls transformRow on each non-nil image
          val (_, oldI, newI) = imgs.views(r.recordType)
          Seq(oldI, newI).flatten.distinct.foreach { items =>
            interp.call(rowFn.get,
              Seq(LuaRecordEnv.rowUD(items)))
          }
      }
      (imgs.dataRow.filter(_.isDirty)
        .map(i => LuaRecordEnv.jsonEncode(LuaRecordEnv.rowUD(i)))
        .getOrElse(r.data),
        imgs.matchRow.filter(_.isDirty)
          .map(i => LuaRecordEnv.jsonEncode(LuaRecordEnv.rowUD(i)))
          .getOrElse(r.matchData))
    }
  }
}

object LuaAdapt {

  /** Which of the script's extensibility hooks are defined — drives
    * DDL-time validation (a lua script whose hooks can never fire on
    * the mirror's destination is a CREATE error, not a silent no-op)
    * and the runner's decision to attach the adapt stage at all. */
  def hooksOf(source: String,
      libs: Map[String, String] = Map.empty): Set[String] = {
    val interp = new Lua.Interp()
    val g = LuaRecordEnv.env(interp, libs = libs)
    interp.run(Lua.parse(source), g)
    Set("onRecord", "transformRecord", "transformRow").filter { n =>
      g.lookup(n).exists {
        case _: Lua.VFunc | _: Lua.VNative => true
        case _ => false
      }
    }
  }

  /** WAL batch → the SAME frame (schema, column order, extra columns,
    * toast representation — csv string from the stream source or
    * array from batch callers — all preserved) with transformed
    * data/matchData images. Relation/message records flow through the
    * script too (their images are nil — kind-dispatch is the script's
    * job), and their payloads are never re-encoded. */
  def records(batch: DataFrame, script: String,
      libs: Map[String, String] = Map.empty,
      env: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.StringType
    val compiled = new LuaAdaptScript(script, libs)
    val schema = batch.schema
    val iType = schema.fieldIndex("recordType")
    val iCp = schema.fieldIndex("checkpointId")
    val iCt = schema.fieldIndex("commitTimeMicros")
    val iTx = schema.fieldIndex("transactionId")
    val iSrc = schema.fieldIndex("sourceTable")
    val iDst = schema.fieldIndex("destinationTable")
    val iData = schema.fieldIndex("data")
    val iMatch = schema.fieldIndex("matchData")
    val iToast = schema.fieldIndex("unchangedToastColumns")
    val toastIsCsv = schema(iToast).dataType == StringType
    // same spread policy as LuaQueue: per-record interpretation
    // parallelizes per PARTITION — small batches spread, wide ones
    // cap at queue.parallelism (the LuaPool size)
    val spread = LuaParallelism.spread(batch, env)
    spread.mapPartitions { it =>
      val runner = new compiled.PartitionRunner
      it.map { r =>
        val toast: Seq[String] =
          if (r.isNullAt(iToast)) Nil
          else if (toastIsCsv) r.getString(iToast).split(",")
            .toSeq.filter(_.nonEmpty)
          else r.getSeq[String](iToast)
        val rec = LuaRecordEnv.Rec(r.getInt(iType), r.getLong(iCp),
          r.getLong(iCt), r.getLong(iTx), r.getString(iSrc),
          r.getString(iDst), r.getString(iData), r.getString(iMatch),
          toast)
        val (data, matchData) = runner.transformImages(rec)
        if ((data eq rec.data) && (matchData eq rec.matchData)) r
        else Row.fromSeq(
          r.toSeq.updated(iData, data).updated(iMatch, matchData))
      }
    }(Encoders.row(schema))
  }
}
