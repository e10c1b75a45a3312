package graft.cdc

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types.StructType

import graft.model.ChangeRecord
import graft.types.QKind

/** The pgoutput logical-replication wire protocol (protocol version 1) —
  * binary message parse/encode per the public PostgreSQL docs
  * ("Logical Streaming Replication Protocol → Message Formats"), plus a
  * stateful session decoder that turns the message stream into
  * [[ChangeRecord]]s. This is the Spark restatement of the reference's
  * actual CDC core: `processMessage`'s dispatch over pglogrepl messages
  * (/root/reference/flow/connectors/postgres/cdc.go:999-1095), the tuple
  * walk (`processTuple`, cdc.go:335-386) and column decode
  * (`decodeColumnData`, cdc.go:388-470).
  *
  * Message framing (1-byte tag, big-endian fixed ints, NUL-terminated
  * strings):
  *   - 'B' Begin:    finalLsn i64, commitTime i64 (µs since 2000-01-01),
  *                   xid i32
  *   - 'M' Message:  flags i8 (1=transactional), lsn i64, prefix cstr,
  *                   length i32, content bytes
  *   - 'C' Commit:   flags i8, commitLsn i64, endLsn i64, commitTime i64
  *   - 'O' Origin:   commitLsn i64, name cstr
  *   - 'R' Relation: relId i32, namespace cstr, name cstr, replident i8,
  *                   ncols i16, per column: flags i8 (1=key), name cstr,
  *                   typeOid i32, typmod i32
  *   - 'Y' Type:     typeOid i32, namespace cstr, name cstr
  *   - 'I' Insert:   relId i32, 'N', TupleData
  *   - 'U' Update:   relId i32, ['K'|'O' TupleData], 'N', TupleData
  *   - 'D' Delete:   relId i32, 'K'|'O', TupleData
  *   - 'T' Truncate: nrels i32, options i8, relId i32 × nrels
  *
  * TupleData: ncols i16, then per column one of
  *   'n' (SQL NULL) | 'u' (unchanged TOAST — value NOT sent) |
  *   't' len i32 + text bytes | 'b' len i32 + binary bytes.
  */
object PgOutput {

  /** PostgreSQL epoch (2000-01-01T00:00:00Z) offset from Unix, in µs —
    * Begin/Commit timestamps travel relative to it. */
  val PgEpochMicros: Long = 946684800000000L

  // ------------------------------------------------------------ message ADT

  sealed trait Message
  final case class Begin(finalLsn: Long, commitTimeMicros: Long, xid: Int)
      extends Message
  final case class Commit(flags: Int, commitLsn: Long, endLsn: Long,
      commitTimeMicros: Long) extends Message
  final case class Origin(commitLsn: Long, name: String) extends Message
  final case class RelationColumn(flags: Int, name: String, typeOid: Int,
      typeModifier: Int)
  final case class Relation(relId: Int, namespace: String, name: String,
      replicaIdentity: Int, columns: Seq[RelationColumn]) extends Message {
    def qualifiedName: String =
      if (namespace.isEmpty) name else s"$namespace.$name"
  }
  final case class TypeMessage(typeOid: Int, namespace: String, name: String)
      extends Message
  final case class Insert(relId: Int, newTuple: TupleData) extends Message
  /** `oldKind`: 'K' = replica-identity key image, 'O' = full old row
    * (REPLICA IDENTITY FULL); None = no old image sent. */
  final case class Update(relId: Int, oldKind: Option[Char],
      oldTuple: Option[TupleData], newTuple: TupleData) extends Message
  final case class Delete(relId: Int, oldKind: Char, oldTuple: TupleData)
      extends Message
  final case class Truncate(options: Int, relIds: Seq[Int]) extends Message
  final case class LogicalMessage(transactional: Boolean, lsn: Long,
      prefix: String, content: Array[Byte]) extends Message

  sealed trait TupleColumn
  case object NullColumn extends TupleColumn
  /** Unchanged TOAST: the value was NOT sent — absent ≠ null
    * (record.go:77-89). */
  case object ToastColumn extends TupleColumn
  final case class TextColumn(bytes: Array[Byte]) extends TupleColumn
  final case class BinaryColumn(bytes: Array[Byte]) extends TupleColumn
  final case class TupleData(columns: Seq[TupleColumn])

  // ---------------------------------------------------------------- parsing

  private def cstr(b: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var c = b.get()
    while (c != 0) { sb.write(c); c = b.get() }
    sb.toString(StandardCharsets.UTF_8)
  }

  private def bytesOf(b: ByteBuffer, n: Int): Array[Byte] = {
    // length is untrusted input: bound BEFORE allocating, or a corrupt
    // frame forces a multi-GB allocation ahead of the underflow error
    require(n >= 0 && n <= b.remaining(),
      s"declared length $n exceeds remaining ${b.remaining()} bytes")
    val a = new Array[Byte](n); b.get(a); a
  }

  private def tuple(b: ByteBuffer): TupleData = {
    val n = b.getShort().toInt
    TupleData((0 until n).map { _ =>
      b.get().toChar match {
        case 'n' => NullColumn
        case 'u' => ToastColumn
        case 't' => TextColumn(bytesOf(b, b.getInt()))
        case 'b' => BinaryColumn(bytesOf(b, b.getInt()))
        case other => throw new IllegalArgumentException(
          s"unknown tuple column kind '$other'")
      }
    })
  }

  /** Parse ONE pgoutput message (the WALData payload of one XLogData). */
  def parse(data: Array[Byte]): Message = {
    val b = ByteBuffer.wrap(data) // big-endian by default
    b.get().toChar match {
      case 'B' => Begin(b.getLong(), b.getLong() + PgEpochMicros, b.getInt())
      case 'C' =>
        Commit(b.get().toInt, b.getLong(), b.getLong(),
          b.getLong() + PgEpochMicros)
      case 'O' => Origin(b.getLong(), cstr(b))
      case 'R' =>
        val (relId, ns, name, ident) = (b.getInt(), cstr(b), cstr(b), b.get())
        val ncols = b.getShort().toInt
        Relation(relId, ns, name, ident.toInt, (0 until ncols).map { _ =>
          RelationColumn(b.get().toInt, cstr(b), b.getInt(), b.getInt())
        })
      case 'Y' => TypeMessage(b.getInt(), cstr(b), cstr(b))
      case 'I' =>
        val relId = b.getInt()
        val marker = b.get().toChar
        require(marker == 'N', s"Insert expects 'N' tuple, got '$marker'")
        Insert(relId, tuple(b))
      case 'U' =>
        val relId = b.getInt()
        b.get().toChar match {
          case k @ ('K' | 'O') =>
            val old = tuple(b)
            val n = b.get().toChar
            require(n == 'N', s"Update expects 'N' after old, got '$n'")
            Update(relId, Some(k), Some(old), tuple(b))
          case 'N' => Update(relId, None, None, tuple(b))
          case other => throw new IllegalArgumentException(
            s"Update: unexpected tuple marker '$other'")
        }
      case 'D' =>
        val relId = b.getInt()
        val k = b.get().toChar
        require(k == 'K' || k == 'O', s"Delete expects 'K'|'O', got '$k'")
        Delete(relId, k, tuple(b))
      case 'T' =>
        val n = b.getInt()
        val opts = b.get().toInt
        Truncate(opts, (0 until n).map(_ => b.getInt()))
      case 'M' =>
        val flags = b.get().toInt
        val lsn = b.getLong()
        val prefix = cstr(b)
        LogicalMessage((flags & 1) != 0, lsn, prefix,
          bytesOf(b, b.getInt()))
      case other => throw new IllegalArgumentException(
        s"unknown pgoutput message type '$other'")
    }
  }

  // --------------------------------------------------------------- encoding
  // The inverse codec — golden-fixture assembly for the decoder specs and
  // the executor-side stream builder of q_pgoutput_decode. (PostgreSQL is
  // the only real producer; this encoder exists so the decoder can be
  // tested byte-for-byte without a live server.)

  private final class W {
    private val out = new java.io.ByteArrayOutputStream()
    def i8(v: Int): W = { out.write(v); this }
    def ch(c: Char): W = i8(c.toInt)
    def i16(v: Int): W = { out.write(v >>> 8); out.write(v); this }
    def i32(v: Int): W = { i16(v >>> 16); i16(v & 0xFFFF); this }
    def i64(v: Long): W = { i32((v >>> 32).toInt); i32(v.toInt); this }
    def cstr(s: String): W = {
      out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0); this
    }
    def raw(b: Array[Byte]): W = { out.write(b); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def writeTuple(w: W, t: TupleData): Unit = {
    w.i16(t.columns.size)
    t.columns.foreach {
      case NullColumn => w.ch('n')
      case ToastColumn => w.ch('u')
      case TextColumn(b) => w.ch('t').i32(b.length).raw(b)
      case BinaryColumn(b) => w.ch('b').i32(b.length).raw(b)
    }
  }

  def encode(m: Message): Array[Byte] = {
    val w = new W
    m match {
      case Begin(finalLsn, ctMicros, xid) =>
        w.ch('B').i64(finalLsn).i64(ctMicros - PgEpochMicros).i32(xid)
      case Commit(flags, commitLsn, endLsn, ctMicros) =>
        w.ch('C').i8(flags).i64(commitLsn).i64(endLsn)
          .i64(ctMicros - PgEpochMicros)
      case Origin(lsn, name) => w.ch('O').i64(lsn).cstr(name)
      case Relation(relId, ns, name, ident, cols) =>
        w.ch('R').i32(relId).cstr(ns).cstr(name).i8(ident).i16(cols.size)
        cols.foreach(c =>
          w.i8(c.flags).cstr(c.name).i32(c.typeOid).i32(c.typeModifier))
        w
      case TypeMessage(oid, ns, name) =>
        w.ch('Y').i32(oid).cstr(ns).cstr(name)
      case Insert(relId, t) =>
        w.ch('I').i32(relId).ch('N'); writeTuple(w, t); w
      case Update(relId, oldKind, oldTuple, newTuple) =>
        w.ch('U').i32(relId)
        oldKind.foreach { k => w.ch(k); writeTuple(w, oldTuple.get) }
        w.ch('N'); writeTuple(w, newTuple); w
      case Delete(relId, k, t) =>
        w.ch('D').i32(relId).ch(k); writeTuple(w, t); w
      case Truncate(opts, relIds) =>
        w.ch('T').i32(relIds.size).i8(opts)
        relIds.foreach(w.i32); w
      case LogicalMessage(tx, lsn, prefix, content) =>
        w.ch('M').i8(if (tx) 1 else 0).i64(lsn).cstr(prefix)
          .i32(content.length).raw(content)
    }
    w.bytes
  }

  /** Text helpers for building fixture tuples. */
  def text(s: String): TupleColumn =
    TextColumn(s.getBytes(StandardCharsets.UTF_8))

  // ----------------------------------------------------- column value decode

  /** Well-known PostgreSQL type OIDs (pg_type.dat — public catalog). */
  object Oid {
    val Bool = 16; val Bytea = 17; val Int8 = 20; val Int2 = 21
    val Int4 = 23; val Text = 25; val Oid = 26; val Json = 114
    val Float4 = 700; val Float8 = 701; val Varchar = 1043
    val Date = 1082; val Time = 1083; val Timestamp = 1114
    val TimestampTz = 1184; val Numeric = 1700; val Uuid = 2950
    val Jsonb = 3802
  }

  /** OID → QKind (postgresOIDToQValueKind's table, the decode half of
    * flow/connectors/postgres/qvalue_convert.go). Unknown OIDs fold to
    * QString — text-format values pass through unchanged. */
  def oidToQKind(oid: Int): QKind = oid match {
    case Oid.Bool => QKind.QBool
    case Oid.Bytea => QKind.QBytes
    case Oid.Int2 => QKind.QInt16
    case Oid.Int4 => QKind.QInt32
    case Oid.Int8 | Oid.Oid => QKind.QInt64
    case Oid.Float4 => QKind.QFloat32
    case Oid.Float8 => QKind.QFloat64
    case Oid.Numeric => QKind.QNumeric()
    case Oid.Json => QKind.QJson
    case Oid.Jsonb => QKind.QJsonb
    case Oid.Date => QKind.QDate
    case Oid.Time => QKind.QTime
    case Oid.Timestamp => QKind.QTimestamp
    case Oid.TimestampTz => QKind.QTimestampTZ
    case Oid.Uuid => QKind.QUuid
    case _ => QKind.QString
  }

  /** Is the OID's TEXT rendering already a valid bare JSON token? (ints,
    * floats, numeric; bool maps t/f → true/false; json passes through). */
  private def jsonBare(oid: Int): Boolean = oid match {
    case Oid.Int2 | Oid.Int4 | Oid.Int8 | Oid.Oid | Oid.Float4 |
        Oid.Float8 | Oid.Numeric => true
    case _ => false
  }

  /** PG array type OID → element OID (pg_type's typelem for the
    * array kinds the reference replicates — qvalue_convert.go's
    * array cases). Text-format array literals must decode into JSON
    * ARRAYS here: a carrier string `"{1,2,3}"` where the payload
    * schema expects `array<bigint>` would silently from_json to
    * NULL at normalize — array columns are common (the owners
    * fixture alone has six). */
  private[cdc] val arrayElemOid: Map[Int, Int] = Map(
    1000 -> Oid.Bool, 1001 -> Oid.Bytea, 1005 -> Oid.Int2,
    1007 -> Oid.Int4, 1016 -> Oid.Int8, 1021 -> Oid.Float4,
    1022 -> Oid.Float8, 1009 -> Oid.Text, 1015 -> Oid.Varchar,
    1182 -> Oid.Date, 1183 -> Oid.Time, 1115 -> Oid.Timestamp,
    1185 -> Oid.TimestampTz, 1231 -> Oid.Numeric, 2951 -> Oid.Uuid,
    199 -> Oid.Json, 3807 -> Oid.Jsonb)

  private def elementJson(elemOid: Int, v: String): String =
    elemOid match {
      case Oid.Bool => if (v == "t") "true" else "false"
      case Oid.Json | Oid.Jsonb => v // already JSON
      case oid if jsonBare(oid) =>
        if (v == "NaN" || v == "Infinity" || v == "-Infinity") "null"
        else v
      case _ => "\"" + jsonEscape(v) + "\""
    }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private val HexChars = "0123456789abcdef".toCharArray
  private def hex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = HexChars((b(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(b(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** One column value → its JSON fragment, from the wire bytes.
    * Text format ('t'): render per OID class (decodeColumnData's text
    * path, cdc.go:388-470). Binary format ('b'): decode the common fixed
    * binary layouts; bytea keeps PG's `\x`-hex text convention. */
  def columnJson(col: RelationColumn, v: TupleColumn): Option[String] =
    v match {
      case ToastColumn => None // absent, NOT null
      case NullColumn => Some("null")
      case TextColumn(b) =>
        val s = new String(b, StandardCharsets.UTF_8)
        col.typeOid match {
          case Oid.Bool => Some(if (s == "t") "true" else "false")
          case Oid.Json | Oid.Jsonb => Some(s) // already JSON
          case oid if jsonBare(oid) =>
            // JSON has no NaN/±Infinity tokens — null them like the
            // engine's serialization policy (record_items.go:174-207,
            // q_nan_inf_null)
            if (s == "NaN" || s == "Infinity" || s == "-Infinity")
              Some("null")
            else Some(s)
          case oid if arrayElemOid.contains(oid) =>
            val elem = arrayElemOid(oid)
            Some(graft.functions.PgText.parseArrayLiteral(s).map {
              case null => "null"
              case e => elementJson(elem, e)
            }.mkString("[", ",", "]"))
          case _ => Some("\"" + jsonEscape(s) + "\"")
        }
      case BinaryColumn(b) =>
        val buf = ByteBuffer.wrap(b)
        col.typeOid match {
          case Oid.Bool => Some(if (b.nonEmpty && b(0) != 0) "true" else "false")
          case Oid.Int2 => Some(buf.getShort().toString)
          case Oid.Int4 => Some(buf.getInt().toString)
          case Oid.Int8 | Oid.Oid => Some(buf.getLong().toString)
          case Oid.Float4 => Some(buf.getFloat().toString)
          case Oid.Float8 => Some(buf.getDouble().toString)
          case Oid.Bytea => Some("\"\\\\x" + hex(b) + "\"")
          case Oid.Uuid if b.length == 16 =>
            val h = hex(b)
            Some("\"" + Seq(h.substring(0, 8), h.substring(8, 12),
              h.substring(12, 16), h.substring(16, 20), h.substring(20))
              .mkString("-") + "\"")
          case Oid.Text | Oid.Varchar =>
            Some("\"" + jsonEscape(new String(b, StandardCharsets.UTF_8))
              + "\"")
          case other => throw new IllegalArgumentException(
            s"no binary-format decode for OID $other (column ${col.name})")
        }
    }
}

/** Stateful pgoutput session decoder: feed XLogData payloads in WAL order,
  * get [[ChangeRecord]]s out — `processMessage`'s dispatch loop
  * (cdc.go:1024-1095) with the relation registry
  * (`relationMessageMapping`), the commit lock (`p.commitLock`: Begin
  * pins commit time + xid for the records of its transaction) and the
  * unchanged-TOAST/old-image rules of `processTuple`.
  *
  * One decoder instance per serialized stream (a replication slot is
  * single-reader by protocol); the class is cheap — in the distributed
  * query path each executor partition runs its own decoder over its own
  * byte stream.
  *
  * @param tableFilter    source tables to emit (srcTableIDNameMapping
  *                       membership — others' messages are consumed and
  *                       dropped, cdc.go:1106-1110)
  * @param destinationFor source→destination table rename
  */
final class PgOutputDecoder(
    tableFilter: String => Boolean = _ => true,
    destinationFor: String => String = identity) {

  import PgOutput._

  private val relations =
    scala.collection.mutable.HashMap.empty[Int, Relation]
  /** Cached schema per relation for schema-delta diffs. */
  private val schemas =
    scala.collection.mutable.HashMap.empty[Int, StructType]
  private var currentBegin: Option[Begin] = None
  private var lastCommitCp: Long = -1L

  /** Latest safe checkpoint: the last Commit's LSN (or a non-transactional
    * message's) — `UpdateLatestCheckpointID`'s value, the tx-atomic batch
    * cut. */
  def latestCheckpoint: Long = lastCommitCp

  private def base(walStart: Long): (Long, Long, Long) = currentBegin match {
    case Some(b) => (walStart, b.commitTimeMicros, b.xid.toLong)
    case None => (walStart, 0L, 0L) // baseRecord with commitLock nil
  }

  /** JSON object from a tuple against its relation's column list; returns
    * (json, unchangedToastColumnNames). Columns in relation order; TOAST
    * ('u') columns are ABSENT from the object, not null. */
  private def tupleJson(rel: Relation, t: TupleData)
      : (String, Seq[String]) = {
    require(t.columns.size <= rel.columns.size,
      s"tuple has more columns than the last Relation message: " +
        s"${t.columns.size} > ${rel.columns.size}") // processTuple:353
    val toast = Seq.newBuilder[String]
    val parts = t.columns.zip(rel.columns).flatMap { case (v, rc) =>
      if (v == ToastColumn) { toast += rc.name; None }
      else columnJson(rc, v).map(j => "\"" + rc.name + "\":" + j)
    }
    (parts.mkString("{", ",", "}"), toast.result())
  }

  /** For a key-only old tuple ('K'), non-key columns arrive as 'n' — a
    * delete/update old image should not render them as JSON nulls. Strip
    * trailing/interleaved null NON-KEY columns when the image is a key
    * image. */
  private def keyJson(rel: Relation, t: TupleData): String = {
    val parts = t.columns.zip(rel.columns).flatMap { case (v, rc) =>
      v match {
        case NullColumn if (rc.flags & 1) == 0 => None // non-key, not sent
        case ToastColumn => None
        case other => columnJson(rc, other).map(j =>
          "\"" + rc.name + "\":" + j)
      }
    }
    parts.mkString("{", ",", "}")
  }

  private def rel(relId: Int): Option[Relation] =
    relations.get(relId).filter(r => tableFilter(r.qualifiedName))

  /** Feed one message; returns the decoded record, if this message emits
    * one (Begin/Commit/Origin/Type/Truncate and filtered tables do not). */
  def feed(walStart: Long, message: Array[Byte]): Option[ChangeRecord] =
    feedParsed(walStart, parse(message))

  def feedParsed(walStart: Long, msg: Message): Option[ChangeRecord] =
    msg match {
      case b: Begin =>
        currentBegin = Some(b) // the commit lock (cdc.go:1029)
        None
      case c: Commit =>
        lastCommitCp = c.commitLsn // UpdateLatestCheckpointID
        currentBegin = None
        None
      case _: Origin | _: TypeMessage => None // metadata only
      case _: Truncate => None // unhandled in the reference (warn path)
      case r: Relation =>
        val out = decodeRelation(walStart, r)
        relations(r.relId) = r
        schemas(r.relId) = relationSchema(r)
        out
      case m: LogicalMessage =>
        if (!m.transactional) lastCommitCp = m.lsn
        val (cp, ct, tx) =
          if (m.transactional) base(walStart) else (m.lsn, 0L, 0L)
        Some(ChangeRecord(ChangeRecord.TypeMessage, cp, null, ct, tx,
          m.prefix, "",
          new String(m.content, StandardCharsets.UTF_8), null, Nil))
      case Insert(relId, t) => rel(relId).map { r =>
        val (cp, ct, tx) = base(walStart)
        val (json, _) = tupleJson(r, t)
        ChangeRecord(ChangeRecord.TypeInsert, cp, null, ct, tx,
          r.qualifiedName, destinationFor(r.qualifiedName), json, null, Nil)
      }
      case Update(relId, oldKind, oldTuple, t) => rel(relId).map { r =>
        val (cp, ct, tx) = base(walStart)
        val (newJson, toast) = tupleJson(r, t)
        // Replident-full TOAST backfill (cdc.go:1190-1205): when the OLD
        // tuple carries a value for an unchanged-TOAST column, fold it
        // into the new image and drop it from the unchanged set (and from
        // the old image — "we only use _peerdb_data anyway").
        val oldVals: Map[String, String] = oldTuple match {
          case Some(o) if oldKind.contains('O') =>
            o.columns.zip(r.columns).flatMap { case (v, rc) =>
              columnJson(rc, v).map(rc.name -> _)
            }.toMap
          case _ => Map.empty
        }
        val (backfilled, stillToast) = toast.partition(oldVals.contains)
        val json =
          if (backfilled.isEmpty) newJson
          else {
            val extra = backfilled.map(c =>
              "\"" + c + "\":" + oldVals(c)).mkString(",")
            if (newJson == "{}") "{" + extra + "}"
            else newJson.dropRight(1) + "," + extra + "}"
          }
        val matchJson = oldTuple.map { o =>
          if (oldKind.contains('K')) keyJson(r, o)
          else {
            val parts = o.columns.zip(r.columns).flatMap { case (v, rc) =>
              if (backfilled.contains(rc.name)) None // DeleteColName
              else columnJson(rc, v).map(j => "\"" + rc.name + "\":" + j)
            }
            parts.mkString("{", ",", "}")
          }
        }.orNull
        ChangeRecord(ChangeRecord.TypeUpdate, cp, null, ct, tx,
          r.qualifiedName, destinationFor(r.qualifiedName), json,
          matchJson, stillToast)
      }
      case Delete(relId, oldKind, t) => rel(relId).map { r =>
        val (cp, ct, tx) = base(walStart)
        val json = if (oldKind == 'K') keyJson(r, t) else tupleJson(r, t)._1
        ChangeRecord(ChangeRecord.TypeDelete, cp, null, ct, tx,
          r.qualifiedName, destinationFor(r.qualifiedName), null, json, Nil)
      }
    }

  private def relationSchema(r: Relation): StructType =
    StructType(r.columns.map(c => org.apache.spark.sql.types.StructField(
      c.name, oidToQKind(c.typeOid).toSpark)))

  /** Relation redefinition → additive TableSchemaDelta record
    * (processRelationMessage, cdc.go:1259-1443): the first sighting only
    * registers; a later message with new columns emits a TypeRelation
    * ChangeRecord whose payload is the SchemaEvolution delta JSON. */
  private def decodeRelation(walStart: Long, r: Relation)
      : Option[ChangeRecord] = {
    if (!tableFilter(r.qualifiedName)) return None
    schemas.get(r.relId).flatMap { prev =>
      SchemaEvolution.diff(r.qualifiedName,
        destinationFor(r.qualifiedName), prev, relationSchema(r))
        .map { delta =>
          val (cp, ct, tx) = base(walStart)
          ChangeRecord(ChangeRecord.TypeRelation, cp, null, ct, tx,
            r.qualifiedName, destinationFor(r.qualifiedName),
            SchemaEvolution.deltaToJson(delta), null, Nil)
        }
    }
  }
}
