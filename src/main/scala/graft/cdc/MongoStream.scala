package graft.cdc

/** Mongo change-stream session setup — the engine-owned half of the
  * reference's Mongo CDC pull restated as pure functions:
  *
  *   - [[pipeline]] builds the aggregation pipeline the watch session
  *     installs (`createPipeline`,
  *     /root/reference/flow/connectors/mongo/cdc.go:580-639): a `$match`
  *     keeping only in-pipe (db, collection) pairs, an optional `$match`
  *     excluding operation types, and the recommended `$project` down to
  *     the six change-event fields the decoder consumes.
  *   - [[timestampFromResumeToken]] decodes the cluster timestamp out of
  *     a resume token's `_data` KeyString (resume_token.go:16-64) — the
  *     `StartAtOperationTime` FALLBACK used when a stored token refers
  *     to a collection that has since been filtered out of the pipeline
  *     (pause + edit-mirror), where `ResumeAfter` would fail.
  *
  * Output is canonical JSON text (sorted dbs, stable field order) so the
  * pipeline is directly comparable in specs and durable in mirror
  * configs; the live `client.Watch` call itself is environment-blocked
  * (no Mongo driver jar in the container) — exactly the split the JDBC
  * snapshot source documents. Token ORDERING lives in
  * [[TextCheckpoint.compareResumeTokens]]; this module only opens them.
  */
object MongoStream {

  /** KeyString type tag for a timestamp (mongo key_string.cpp:91). */
  val KTimestamp = 130

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** The watch pipeline for a set of `db.collection` names and excluded
    * operation types, as canonical JSON. Tables must be db-qualified
    * (`db.coll`) — the same validation as the reference. */
  def pipeline(tables: Seq[String],
      excludedOps: Seq[String] = Nil): String = {
    val stages = Seq.newBuilder[String]
    if (tables.nonEmpty) {
      val byDb = tables.map { t =>
        val i = t.indexOf('.')
        require(i > 0 && i < t.length - 1,
          s"invalid table name '$t' — need db.collection")
        (t.substring(0, i), t.substring(i + 1))
      }.groupBy(_._1).toSeq.sortBy(_._1)
      val ors = byDb.map { case (db, pairs) =>
        val colls = pairs.map(_._2).map(jsonStr).mkString(",")
        s"""{"$$and":[{"ns.db":${jsonStr(db)}},""" +
          s"""{"ns.coll":{"$$in":[$colls]}}]}"""
      }
      stages += s"""{"$$match":{"$$or":[${ors.mkString(",")}]}}"""
    }
    if (excludedOps.nonEmpty) {
      val ops = excludedOps.map(jsonStr).mkString(",")
      stages +=
        s"""{"$$match":{"operationType":{"$$nin":[$ops]}}}"""
    }
    stages += """{"$project":{"operationType":1,"clusterTime":1,""" +
      """"wallTime":1,"documentKey":1,"fullDocument":1,"ns":1}}"""
    stages.result().mkString("[", ",", "]")
  }

  /** Parse the `mongo.excluded_operation_types` setting value
    * (PEERDB_MONGODB_EXCLUDED_OPERATION_TYPES, dynamicconf.go:522-529;
    * applied once per repl setup, mongo/cdc.go:661-685): comma list of
    * insert|update|replace|delete, case-folded, duplicates collapsed,
    * invalid entries dropped (the reference logs-and-ignores them) —
    * returned separately so callers can surface them. */
  def parseExcludedOps(value: String): (Seq[String], Seq[String]) = {
    val valid = Set("insert", "update", "replace", "delete")
    val entries = value.split(",").iterator
      .map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).toSeq.distinct
    entries.partition(valid)
  }

  /** Cluster timestamp (seconds, increment) from a resume token's
    * `_data` hex KeyString: one type byte (130 = timestamp) then the
    * 64-bit value big-endian — high 32 bits epoch seconds, low 32 the
    * ordinal within the second. This is what seeds
    * `StartAtOperationTime` when `ResumeAfter` is no longer valid. */
  def timestampFromResumeToken(dataHex: String): (Long, Long) = {
    require(dataHex.length >= 18 && dataHex.length % 2 == 0,
      s"KeyString data too short for timestamp: ${dataHex.length} chars")
    val bytes =
      try dataHex.take(18).grouped(2)
        .map(h => Integer.parseInt(h, 16).toByte).toArray
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"invalid hex string in _data field")
      }
    require((bytes(0) & 0xFF) == KTimestamp,
      s"invalid type expecting $KTimestamp, got ${bytes(0) & 0xFF}")
    var v = 0L
    (1 to 8).foreach(i => v = (v << 8) | (bytes(i) & 0xFFL))
    (v >>> 32, v & 0xFFFFFFFFL)
  }

  /** Resume decision (`ResumeAfter` vs the operation-time fallback):
    * when the stored token's collection may have been filtered out of a
    * RESHAPED pipeline (tables added/removed since the token was
    * stored), resuming by token throws server-side — fall back to the
    * token's cluster time. Returns the option name and its value text. */
  def resumeOption(tokenDataHex: Option[String],
      pipelineChanged: Boolean): Option[(String, String)] =
    tokenDataHex.map { hex =>
      if (!pipelineChanged) ("resumeAfter", hex)
      else {
        val (secs, inc) = timestampFromResumeToken(hex)
        ("startAtOperationTime", s"Timestamp($secs, $inc)")
      }
    }

  /** Change-stream → WAL ingest through a [[Wire.MongoSource]] — the
    * engine half of the reference's Mongo pull loop (mongo/cdc.go
    * PullRecords): build the watch pipeline, make the
    * ResumeAfter-vs-StartAtOperationTime decision, pull change events,
    * decode them into [[graft.model.ChangeRecord]]s and append them to
    * the WAL. Each change event is its own transaction — change
    * streams deliver post-commit majority-read events, so durability
    * cuts fall between events, and replayed events (the operation-time
    * fallback REPLAYS the event carrying the stored token) are skipped
    * by token order ([[TextCheckpoint.compareResumeTokens]]).
    *
    * Records are re-stamped with dense WAL-native checkpoint ids (the
    * batch-id vs offset split, as in the PG/MySQL ingests); the token
    * travels in checkpointText. Returns (records appended, last token
    * hex — persist it for the next run). */
  def ingest(source: Wire.MongoSource, walDir: String,
      tables: Seq[String],
      afterTokenHex: Option[String] = None,
      pipelineChanged: Boolean = false,
      excludedOps: Seq[String] = Nil,
      destinationFor: String => String = identity,
      segmentRecords: Int = 100000,
      previousTables: Option[Seq[String]] = None,
      /** First-run seed when NO token exists yet: open the stream at
        * this cluster time instead of "now" — the snapshot→CDC
        * handoff's start point ([[graft.mirror.MongoSnapshotFlow]]
        * captures it BEFORE the snapshot reads; the reference's
        * startAtOperationTime initial-load posture). Ignored once a
        * stored token takes over. */
      startAtOpTime: Option[(Long, Long)] = None): (Long, String) = {
    import graft.model.ChangeRecord
    val pipe = pipeline(tables, excludedOps)
    val resume = resumeOption(afterTokenHex, pipelineChanged)
      .orElse(startAtOpTime.map { case (s, i) =>
        ("startAtOperationTime", s"Timestamp($s, $i)")
      })
    val inPipe = tables.toSet
    // The token-order guard dedups events REPLAYED by the
    // operation-time fallback — but a collection newly ADDED to the
    // scope has boundary-second events with tokens below the stored
    // one that were never ingested (they were out of the old scope):
    // those are exempt from the guard when the caller can say what the
    // old scope was. Without that knowledge the guard stays global
    // (conservative: dedup-safe, may lose the new collection's
    // boundary second — the pre-reshape behavior).
    val replayExempt: String => Boolean = previousTables match {
      case Some(prev) if pipelineChanged =>
        val prevSet = prev.toSet
        src => !prevSet.contains(src)
      case _ => _ => false
    }
    val ready = scala.collection.mutable.ArrayBuffer.empty[ChangeRecord]
    var nextCp = math.max(ChangeLogWal.headCp(walDir), 0L) + 1
    var appended = 0L
    var lastToken = afterTokenHex.getOrElse("")
    def flush(force: Boolean): Unit =
      if (ready.nonEmpty && (force || ready.size >= segmentRecords)) {
        ChangeLogWal.append(walDir, ready.toSeq)
        appended += ready.size
        ready.clear()
      }
    try {
      source.changes(pipe, resume).foreach { case (token, bson) =>
      val inOrder = afterTokenHex.forall(a =>
        TextCheckpoint.compareResumeTokens(token, a) > 0)
      if (inOrder || pipelineChanged) {
        val els = Bson.elements(bson)
          .map(e => e._1 -> (e._2, e._3)).toMap
        val op = els.get("operationType")
          .map { case (t, v) => Bson.elementString(t, v) }.getOrElse("")
        val recType = op match {
          case "insert" => ChangeRecord.TypeInsert
          case "update" | "replace" => ChangeRecord.TypeUpdate
          case "delete" => ChangeRecord.TypeDelete
          case _ => -1 // ddl/invalidate events: no row to stage
        }
        if (recType >= 0) {
          val ns = els.get("ns").map { case (_, v) =>
            Bson.elements(v).map(e => e._1 ->
              Bson.elementString(e._2, e._3)).toMap
          }.getOrElse(Map.empty)
          val src = ns.getOrElse("db", "") + "." + ns.getOrElse("coll", "")
          // the pipeline already $matches in-pipe tables server-side;
          // re-filter here so a transport that ignores the pipeline
          // (or a stale one) cannot leak foreign collections
          if (inPipe.contains(src) &&
              (inOrder || replayExempt(src))) {
            val ctMicros = els.get("clusterTime")
              .map { case (_, v) => Bson.timestampOf(v)._1 * 1000000L }
              .getOrElse(0L)
            val dataJson = els.get("fullDocument")
              .map { case (_, v) => Bson.documentToJson(v) }
            val keyJson = els.get("documentKey")
              .map { case (_, v) => Bson.documentToJson(v) }
            val cp = nextCp; nextCp += 1
            ready += ChangeRecord(recType, cp, token, ctMicros, 0L,
              src, destinationFor(src), dataJson.orNull, keyJson.orNull,
              Nil)
            flush(force = false)
          }
        }
      }
        lastToken = token
      }
      flush(force = true)
      // ack BEFORE close (socket transports ack on the live connection)
      source.ack(lastToken)
    } finally source.close()
    (appended, lastToken)
  }
}
