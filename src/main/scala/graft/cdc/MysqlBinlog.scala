package graft.cdc

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.model.ChangeRecord

/** MySQL binlog (ROW format) binary event codec + stateful session
  * decoder — the MySQL twin of [[PgOutput]]/[[PgOutputDecoder]],
  * implemented against the public MySQL binary-log event spec. This is
  * the Spark restatement of the reference's MySQL CDC core: the event
  * dispatch loop (/root/reference/flow/connectors/mysql/cdc.go:660-1036 —
  * XID/Rotate/Query/TableMap/Rows handling), its checkpoint rules
  * (`advanceCheckpoint`: GTID set when available, else file:pos, only
  * BETWEEN transactions), and the per-row record construction
  * (WRITE/UPDATE/DELETE_ROWS → Insert/Update/DeleteRecord with
  * `SkippedColumns` → unchanged-TOAST names, cdc.go:899-1025). The
  * byte-level row decode the reference delegates to its replication
  * library is implemented here directly from the published format.
  *
  * Framing: every event is a 19-byte little-endian common header
  * (timestamp u32, type u8, server_id u32, event_size u32, log_pos u32,
  * flags u16) followed by a type-specific body. Fixtures declare
  * checksum_alg=off in the FormatDescription event, so bodies carry no
  * trailing CRC32 (the decoder supports both via the FDE flag).
  *
  * Row images: `binlog_row_image=MINIMAL` sends only changed columns +
  * the primary key; a column absent from the after-image bitmap of an
  * UPDATE is exactly the reference's `SkippedColumns` → the engine's
  * unchanged-TOAST set (absent ≠ null). Column names and signedness
  * ride the TABLE_MAP optional metadata (binlog_row_metadata=FULL) —
  * the reference REQUIRES column names when the server supports the
  * metadata (cdc.go:845-849); this decoder does the same.
  */
object MysqlBinlog {

  // ------------------------------------------------------ event type codes
  object Ev {
    val Query = 2; val Rotate = 4; val FormatDescription = 15
    val Xid = 16; val TableMap = 19
    val WriteRowsV1 = 23; val UpdateRowsV1 = 24; val DeleteRowsV1 = 25
    val WriteRowsV2 = 30; val UpdateRowsV2 = 31; val DeleteRowsV2 = 32
    val Gtid = 33
    /** MariaDB's GTID event (its binlog numbering space, 162). */
    val MariadbGtid = 162
  }

  // ----------------------------------------------------- column type codes
  object ColType {
    val Tiny = 1; val Short = 2; val Long = 3; val Float = 4
    val Double = 5; val Null = 6; val Timestamp = 7; val LongLong = 8
    val Int24 = 9; val Date = 10; val Time = 11; val DateTime = 12
    val Year = 13; val Varchar = 15; val Bit = 16
    val Timestamp2 = 17; val DateTime2 = 18; val Time2 = 19
    val Json = 245; val NewDecimal = 246; val Enum = 247; val Set = 248
    val Blob = 252; val VarString = 253; val StringT = 254
  }

  final case class Header(timestampSec: Long, eventType: Int,
      serverId: Long, eventSize: Int, logPos: Long, flags: Int)

  sealed trait Event
  /** BEGIN / COMMIT / DDL statement. */
  final case class Query(schema: String, sql: String) extends Event
  final case class Rotate(position: Long, nextLog: String) extends Event
  final case class FormatDescription(binlogVersion: Int,
      serverVersion: String, checksumAlg: Int) extends Event
  final case class Xid(xid: Long) extends Event
  /** GTID for the FOLLOWING transaction: uuid text + sequence number. */
  final case class Gtid(uuid: String, gno: Long) extends Event
  /** MariaDB GTID for the following transaction: domain-server-seq
    * (server id rides the event header). */
  final case class MariadbGtid(domain: Long, serverId: Long, seq: Long)
      extends Event
  final case class TableMap(tableId: Long, schema: String, table: String,
      columnTypes: Array[Int], columnMeta: Array[Int],
      nullable: Array[Boolean], columnNames: Seq[String],
      signedness: Seq[Boolean],
      /** ENUM/SET member names per column index, from the
        * binlog_row_metadata=FULL ENUM_STR_VALUE / SET_STR_VALUE TLVs
        * — the reference's EnumStrValueMap/SetStrValueMap
        * (mysql/cdc.go:853-859). Absent (non-FULL metadata) leaves
        * ordinals/masks, as go-mysql does without the TLVs. */
      enumSetValues: Map[Int, Seq[String]] = Map.empty) extends Event {
    def qualifiedName: String = s"$schema.$table"
    /** The REAL column type: ENUM/SET ride STRING(254) with the real
      * type in the metadata high byte on modern servers. */
    def realType(i: Int): Int =
      if (columnTypes(i) == ColType.StringT) (columnMeta(i) >> 8) & 0xFF
      else columnTypes(i)
  }
  /** One decoded row image: for each table column, None = not present in
    * the image (MINIMAL row image — the unchanged/skipped case), Some
    * with None = present SQL NULL, Some with a JSON fragment otherwise. */
  final case class RowImage(cols: IndexedSeq[Option[Option[String]]])
  final case class WriteRows(tableId: Long, rows: Seq[RowImage])
      extends Event
  final case class UpdateRows(tableId: Long,
      rows: Seq[(RowImage, RowImage)]) extends Event
  final case class DeleteRows(tableId: Long, rows: Seq[RowImage])
      extends Event
  final case class Unsupported(eventType: Int) extends Event

  // --------------------------------------------------------------- parsing

  val HeaderLen = 19

  def parseHeader(data: Array[Byte]): Header = {
    val b = ByteBuffer.wrap(data, 0, HeaderLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    Header(b.getInt() & 0xFFFFFFFFL, b.get() & 0xFF,
      b.getInt() & 0xFFFFFFFFL, b.getInt(), b.getInt() & 0xFFFFFFFFL,
      b.getShort() & 0xFFFF)
  }

  private def lenc(b: ByteBuffer): Long = (b.get() & 0xFF) match {
    case 0xFB => -1L // NULL
    case 0xFC => b.getShort() & 0xFFFFL
    case 0xFD => (b.get() & 0xFFL) | (b.get() & 0xFFL) << 8 |
      (b.get() & 0xFFL) << 16
    case 0xFE => b.getLong()
    case v => v.toLong
  }

  private def u48(b: ByteBuffer): Long =
    (b.getInt() & 0xFFFFFFFFL) | (b.getShort() & 0xFFFFL) << 32

  private def bytesOf(b: ByteBuffer, n: Int): Array[Byte] = {
    require(n >= 0 && n <= b.remaining(),
      s"declared length $n exceeds remaining ${b.remaining()} bytes")
    val a = new Array[Byte](n); b.get(a); a
  }

  private def bitmap(b: ByteBuffer, nBits: Int): Array[Boolean] = {
    val bytes = bytesOf(b, (nBits + 7) / 8)
    Array.tabulate(nBits)(i => (bytes(i / 8) >> (i % 8) & 1) != 0)
  }

  /** Per-type metadata width in the TABLE_MAP metadata block. */
  private def metaLen(t: Int): Int = t match {
    case ColType.Varchar | ColType.VarString | ColType.StringT |
        ColType.NewDecimal | ColType.Enum | ColType.Set |
        ColType.Bit => 2
    case ColType.Blob | ColType.Double | ColType.Float |
        ColType.Timestamp2 | ColType.DateTime2 | ColType.Time2 |
        ColType.Json => 1
    case _ => 0
  }

  /** Parse one event (header + body). `tableMap` resolves ROWS events'
    * table ids — rows decode needs the column types of the governing
    * TABLE_MAP, exactly like the reference's `tableIdToName` registry.
    * `checksummed` strips the 4-byte CRC32 trailer when the session FDE
    * declared checksum_alg=CRC32. */
  def parse(data: Array[Byte], tableMap: Long => Option[TableMap],
      checksummed: Boolean = false): (Header, Event) = {
    val h = parseHeader(data)
    val end = data.length - (if (checksummed && h.eventType != Ev.FormatDescription) 4 else 0)
    val b = ByteBuffer.wrap(data, HeaderLen, end - HeaderLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    val ev = h.eventType match {
      case Ev.FormatDescription =>
        val ver = b.getShort() & 0xFFFF
        val sv = new String(bytesOf(b, 50), StandardCharsets.UTF_8)
          .takeWhile(_ != 0)
        b.getInt() // create timestamp
        val headerLen = b.get() & 0xFF
        require(headerLen == HeaderLen, s"unsupported header len $headerLen")
        // post-header length table, then (5.6.1+) checksum alg byte +
        // its CRC32 — last 5 bytes of the event
        val alg = if (b.remaining() >= 5) data(end - 5) & 0xFF else 0
        FormatDescription(ver, sv, alg)
      case Ev.Rotate =>
        val pos = b.getLong()
        Rotate(pos, new String(bytesOf(b, b.remaining()),
          StandardCharsets.UTF_8))
      case Ev.Xid => Xid(b.getLong())
      case Ev.Gtid =>
        b.get() // flags
        val sid = bytesOf(b, 16)
        val gno = b.getLong()
        val hex = graft.functions.Wkb.toHex(sid) // table-driven, not format
        Gtid(Seq(hex.substring(0, 8), hex.substring(8, 12),
          hex.substring(12, 16), hex.substring(16, 20), hex.substring(20))
          .mkString("-"), gno)
      case Ev.MariadbGtid =>
        // u64 seq, u32 domain, u8 flags2 (+ optional commit id) — the
        // originating server id is the header's server_id
        val seq = b.getLong()
        val domain = b.getInt() & 0xFFFFFFFFL
        MariadbGtid(domain, h.serverId, seq)
      case Ev.Query =>
        b.getInt() // slave_proxy_id
        b.getInt() // execution time
        val schemaLen = b.get() & 0xFF
        b.getShort() // error code
        val statusLen = b.getShort() & 0xFFFF
        bytesOf(b, statusLen)
        val schema = new String(bytesOf(b, schemaLen),
          StandardCharsets.UTF_8)
        b.get() // NUL
        Query(schema, new String(bytesOf(b, b.remaining()),
          StandardCharsets.UTF_8))
      case Ev.TableMap => parseTableMap(b)
      case t @ (Ev.WriteRowsV1 | Ev.WriteRowsV2 | Ev.UpdateRowsV1 |
          Ev.UpdateRowsV2 | Ev.DeleteRowsV1 | Ev.DeleteRowsV2) =>
        parseRows(t, b, tableMap)
      case other => Unsupported(other)
    }
    (h, ev)
  }

  private def parseTableMap(b: ByteBuffer): TableMap = {
    val tableId = u48(b)
    b.getShort() // flags
    val schema = new String(bytesOf(b, b.get() & 0xFF),
      StandardCharsets.UTF_8)
    b.get() // NUL
    val table = new String(bytesOf(b, b.get() & 0xFF),
      StandardCharsets.UTF_8)
    b.get() // NUL
    val nCols = lenc(b).toInt
    val types = Array.tabulate(nCols)(_ => b.get() & 0xFF)
    val metaBlock = ByteBuffer.wrap(bytesOf(b, lenc(b).toInt))
      .order(ByteOrder.LITTLE_ENDIAN)
    val meta = types.map { t =>
      metaLen(t) match {
        case 0 => 0
        case 1 => metaBlock.get() & 0xFF
        case 2 => t match {
          // STRING/ENUM/SET pack (real_type, len) as two single bytes;
          // VARCHAR/VAR_STRING/BIT carry a little-endian u16;
          // NEWDECIMAL packs (precision, scale) as two single bytes.
          case ColType.StringT | ColType.Enum | ColType.Set |
              ColType.NewDecimal =>
            ((metaBlock.get() & 0xFF) << 8) | (metaBlock.get() & 0xFF)
          case _ => metaBlock.getShort() & 0xFFFF
        }
      }
    }
    val nullable = bitmap(b, nCols)
    // Optional metadata TLVs (binlog_row_metadata=FULL): we consume
    // SIGNEDNESS (1) and COLUMN_NAME (4), skip the rest.
    var names = Seq.empty[String]
    var signed = Seq.fill(nCols)(true)
    val enumSet = scala.collection.mutable.Map.empty[Int, Seq[String]]
    while (b.remaining() > 0) {
      val tlvType = b.get() & 0xFF
      val tlvLen = lenc(b).toInt
      val body = ByteBuffer.wrap(bytesOf(b, tlvLen))
        .order(ByteOrder.LITTLE_ENDIAN)
      tlvType match {
        case 1 => // SIGNEDNESS: one bit per NUMERIC column, MSB first
          val numericIdx = types.zipWithIndex.collect {
            case (t, i) if isNumeric(t) => i }
          val bits = body.array()
          val s = Array.fill(nCols)(true)
          numericIdx.zipWithIndex.foreach { case (colIdx, k) =>
            val unsignedBit = (bits(k / 8) >> (7 - k % 8) & 1) != 0
            s(colIdx) = !unsignedBit
          }
          signed = s.toSeq
        case 4 => // COLUMN_NAME: lenc-prefixed strings
          val out = Seq.newBuilder[String]
          while (body.remaining() > 0)
            out += new String(bytesOf(body, lenc(body).toInt),
              StandardCharsets.UTF_8)
          names = out.result()
        case 5 | 6 => // ENUM_STR_VALUE (5) / SET_STR_VALUE (6): for
          // each enum (resp. set) column in order: lenc count, then
          // count lenc-prefixed member names
          val want = if (tlvType == 5) ColType.Enum else ColType.Set
          def realType(i: Int): Int =
            if (types(i) == ColType.StringT) (meta(i) >> 8) & 0xFF
            else types(i)
          val colIdx = types.indices.filter(realType(_) == want)
          colIdx.foreach { i =>
            if (body.remaining() > 0) {
              val n = lenc(body).toInt
              enumSet += i -> (0 until n).map(_ =>
                new String(bytesOf(body, lenc(body).toInt),
                  StandardCharsets.UTF_8))
            }
          }
        case _ => // other TLVs (charsets, pk, ...) skipped
      }
    }
    TableMap(tableId, schema, table, types, meta, nullable, names,
      signed, enumSet.toMap)
  }

  private def isNumeric(t: Int): Boolean = t match {
    case ColType.Tiny | ColType.Short | ColType.Int24 | ColType.Long |
        ColType.LongLong | ColType.Float | ColType.Double |
        ColType.NewDecimal => true
    case _ => false
  }

  private def parseRows(eventType: Int, b: ByteBuffer,
      tableMap: Long => Option[TableMap]): Event = {
    val tableId = u48(b)
    b.getShort() // flags
    if (eventType >= Ev.WriteRowsV2) {
      val extraLen = b.getShort() & 0xFFFF
      if (extraLen > 2) bytesOf(b, extraLen - 2)
    }
    val nCols = lenc(b).toInt
    val isUpdate =
      eventType == Ev.UpdateRowsV1 || eventType == Ev.UpdateRowsV2
    val present1 = bitmap(b, nCols)
    val present2 = if (isUpdate) bitmap(b, nCols) else present1
    val tm = tableMap(tableId).getOrElse(throw new IllegalStateException(
      s"ROWS event for unknown table id $tableId (no TABLE_MAP seen)"))
    require(tm.columnTypes.length == nCols,
      s"TABLE_MAP has ${tm.columnTypes.length} columns, rows event $nCols")

    def row(present: Array[Boolean]): RowImage = {
      val nPresent = present.count(identity)
      val nulls = bitmap(b, nPresent)
      var k = 0
      RowImage(IndexedSeq.tabulate(nCols) { i =>
        if (!present(i)) None
        else {
          val isNull = nulls(k); k += 1
          if (isNull) Some(None)
          else Some(Some(renderEnumSet(tm, i,
            decodeValue(b, tm.columnTypes(i),
              tm.columnMeta(i), tm.signedness.lift(i).getOrElse(true)))))
        }
      })
    }

    eventType match {
      case Ev.WriteRowsV1 | Ev.WriteRowsV2 =>
        val rows = Seq.newBuilder[RowImage]
        while (b.remaining() > 0) rows += row(present1)
        WriteRows(tableId, rows.result())
      case Ev.DeleteRowsV1 | Ev.DeleteRowsV2 =>
        val rows = Seq.newBuilder[RowImage]
        while (b.remaining() > 0) rows += row(present1)
        DeleteRows(tableId, rows.result())
      case _ =>
        val rows = Seq.newBuilder[(RowImage, RowImage)]
        while (b.remaining() > 0) rows += (row(present1) -> row(present2))
        UpdateRows(tableId, rows.result())
    }
  }

  // ------------------------------------------------------ value decoding
  // Each decoded value is rendered directly as its JSON fragment (the
  // same convention as PgOutput.columnJson): numbers bare, strings
  // escaped, temporal values as quoted canonical text, binary as
  // PG-style \x hex so raw payloads look identical across sources.

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

  private def quoted(s: String): String = "\"" + jsonEscape(s) + "\""

  private val HexChars = "0123456789abcdef".toCharArray
  private def hex(a: Array[Byte]): String = {
    val out = new Array[Char](a.length * 2)
    var i = 0
    while (i < a.length) {
      out(2 * i) = HexChars((a(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(a(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  private def u24(b: ByteBuffer): Int =
    (b.get() & 0xFF) | (b.get() & 0xFF) << 8 | (b.get() & 0xFF) << 16

  /** Big-endian unsigned read of n bytes (temporal/decimal groups are
    * the binlog's only big-endian fields). */
  private def beUint(b: ByteBuffer, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b.get() & 0xFFL); i += 1 }
    v
  }

  /** Map a decoded ENUM ordinal / SET bitmask to its member names
    * when FULL row metadata supplied them (QValueFromMysqlRowEvent's
    * enum/set cases); without the TLVs the ordinal stays, matching
    * go-mysql. ENUM ordinals are 1-based, 0 = the invalid-empty
    * value; SET renders as the comma-joined member list. */
  private def renderEnumSet(tm: TableMap, i: Int, raw: String): String =
    tm.enumSetValues.get(i) match {
      case None => raw
      case Some(values) => tm.realType(i) match {
        case ColType.Enum =>
          val ord = raw.toLong.toInt
          quoted(if (ord >= 1 && ord <= values.length) values(ord - 1)
            else "")
        case ColType.Set =>
          val mask = raw.toLong
          quoted(values.zipWithIndex.collect {
            case (v, k) if (mask & (1L << k)) != 0 => v
          }.mkString(","))
        case _ => raw
      }
    }

  def decodeValue(b: ByteBuffer, colType: Int, meta: Int,
      signed: Boolean): String = colType match {
    case ColType.Tiny =>
      val v = b.get(); (if (signed) v.toInt else v & 0xFF).toString
    case ColType.Short =>
      val v = b.getShort(); (if (signed) v.toInt else v & 0xFFFF).toString
    case ColType.Int24 =>
      val u = u24(b)
      (if (signed && (u & 0x800000) != 0) u - 0x1000000 else u).toString
    case ColType.Long =>
      val v = b.getInt()
      (if (signed) v.toLong else v & 0xFFFFFFFFL).toString
    case ColType.LongLong =>
      val v = b.getLong()
      if (signed || v >= 0) v.toString
      else java.lang.Long.toUnsignedString(v)
    case ColType.Float => floatJson(b.getFloat().toDouble)
    case ColType.Double => floatJson(b.getDouble())
    case ColType.Year =>
      val v = b.get() & 0xFF
      (if (v == 0) 0 else 1900 + v).toString
    case ColType.Date =>
      val v = u24(b)
      val (d, m, y) = (v & 0x1F, (v >> 5) & 0xF, v >> 9)
      quoted(f"$y%04d-$m%02d-$d%02d")
    case ColType.Varchar | ColType.VarString =>
      val len = if (meta > 255) b.getShort() & 0xFFFF else b.get() & 0xFF
      quoted(new String(bytesOf(b, len), StandardCharsets.UTF_8))
    case ColType.StringT =>
      // meta = (real_type << 8) | length from TABLE_MAP
      val realType = (meta >> 8) & 0xFF
      realType match {
        case ColType.Enum =>
          val width = meta & 0xFF // 1 or 2 bytes: the ordinal
          beLeUint(b, width).toString
        case ColType.Set => beLeUint(b, meta & 0xFF).toString
        case _ => // CHAR(n): 1- or 2-byte length prefix by declared width
          val maxLen = charFieldLength(meta)
          val len = if (maxLen > 255) b.getShort() & 0xFFFF
            else b.get() & 0xFF
          quoted(new String(bytesOf(b, len), StandardCharsets.UTF_8))
      }
    case ColType.Blob =>
      val len = (meta match {
        case 1 => b.get() & 0xFFL
        case 2 => b.getShort() & 0xFFFFL
        case 3 => u24(b).toLong
        case _ => b.getInt() & 0xFFFFFFFFL
      }).toInt
      "\"\\\\x" + hex(bytesOf(b, len)) + "\""
    case ColType.Bit =>
      val bits = ((meta >> 8) & 0xFF) * 8 + (meta & 0xFF)
      beUint(b, (bits + 7) / 8).toString
    case ColType.Timestamp2 =>
      val secs = beUint(b, 4)
      val micros = fracMicros(b, meta)
      quoted(renderDateTime(
        java.time.LocalDateTime.ofEpochSecond(secs, micros.toInt * 1000,
          java.time.ZoneOffset.UTC), meta))
    case ColType.DateTime2 =>
      val packed = beUint(b, 5)
      val micros = fracMicros(b, meta)
      val ym = ((packed >> 22) & 0x1FFFF).toInt
      val (year, month) = (ym / 13, ym % 13)
      val day = ((packed >> 17) & 0x1F).toInt
      val hour = ((packed >> 12) & 0x1F).toInt
      val minute = ((packed >> 6) & 0x3F).toInt
      val second = (packed & 0x3F).toInt
      quoted(renderDateTime(java.time.LocalDateTime.of(year, month, day,
        hour, minute, second, micros.toInt * 1000), meta))
    case ColType.Time2 =>
      // TIMEF binary (my_time.c my_time_binary_to_packed): a SIGNED
      // packed longlong, offset-stored. fsp 0-4 split int3 intpart +
      // frac bytes — for negative values the stored intpart is the
      // FLOOR (nr >> 24) while the frac byte is truncated-toward-zero,
      // so a nonzero negative fraction needs the +1/-0x100 rebalance;
      // fsp 5-6 store the whole offset longlong in 6 bytes. Negative
      // times (legal range -838:59:59) decode to '-HH:MM:SS[.ffffff]'
      // exactly as the server renders them.
      val packed: Long = meta match {
        case 0 => (beUint(b, 3) - 0x800000L) << 24
        case 1 | 2 =>
          var ip = beUint(b, 3) - 0x800000L
          var fr = b.get() & 0xFFL
          if (ip < 0 && fr > 0) { ip += 1; fr -= 0x100 }
          (ip << 24) + fr * 10000L
        case 3 | 4 =>
          var ip = beUint(b, 3) - 0x800000L
          var fr = beUint(b, 2)
          if (ip < 0 && fr > 0) { ip += 1; fr -= 0x10000 }
          (ip << 24) + fr * 100L
        case _ => beUint(b, 6) - 0x800000000000L
      }
      val abs = math.abs(packed)
      val micros = abs & 0xFFFFFFL
      val v = abs >> 24
      val hour = ((v >> 12) & 0x3FF).toInt
      val minute = ((v >> 6) & 0x3F).toInt
      val second = (v & 0x3F).toInt
      val sign = if (packed < 0) "-" else ""
      val base = f"$sign$hour%02d:$minute%02d:$second%02d"
      quoted(if (meta == 0) base
        else base + "." + f"$micros%06d".take(meta))
    case ColType.NewDecimal =>
      decodeDecimal(b, (meta >> 8) & 0xFF, meta & 0xFF)
    // modern servers carry ENUM/SET as STRING(254) with the real type in
    // the metadata high byte (handled above); bare 247/248 column types
    // appear in older TABLE_MAPs — same ordinal/mask payload
    case ColType.Enum | ColType.Set => beLeUint(b, meta & 0xFF).toString
    case ColType.Json =>
      // blob-style length prefix (meta = length-byte width), then the
      // binary JSON document — rendered to compact text, which is
      // already a valid JSON fragment
      val len = (meta match {
        case 1 => b.get() & 0xFFL
        case 2 => b.getShort() & 0xFFFFL
        case 3 => u24(b).toLong
        case _ => b.getInt() & 0xFFFFFFFFL
      }).toInt
      MysqlBinaryJson.render(bytesOf(b, len))
    case ColType.Null => "null"
    case other => throw new IllegalArgumentException(
      s"no row decode for MySQL column type $other")
  }

  private def floatJson(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" // JSON has no NaN/Inf tokens
    else if (d == d.toLong.toDouble) d.toLong.toString
    else d.toString

  /** ENUM/SET ordinals are little-endian (row values), 1/2/8 bytes. */
  private def beLeUint(b: ByteBuffer, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b.get() & 0xFFL) << (8 * i); i += 1 }
    v
  }

  /** CHAR column max byte length from the packed STRING metadata
    * (the ((m1 & 0x30) ^ 0x30) << 4 | m2 folding of the public spec). */
  private def charFieldLength(meta: Int): Int = {
    val m1 = (meta >> 8) & 0xFF
    val m2 = meta & 0xFF
    if ((m1 & 0x30) != 0x30) (((m1 & 0x30) ^ 0x30) << 4) | m2 else m2
  }

  /** Fractional seconds: (fsp+1)/2 bytes big-endian, scaled to µs. */
  private def fracMicros(b: ByteBuffer, fsp: Int): Long = {
    val n = (fsp + 1) / 2
    if (n == 0) 0L
    else beUint(b, n) * math.pow(100, 3 - n).toLong
  }

  private def renderDateTime(dt: java.time.LocalDateTime,
      fsp: Int): String = {
    val base = f"${dt.getYear}%04d-${dt.getMonthValue}%02d-" +
      f"${dt.getDayOfMonth}%02d ${dt.getHour}%02d:${dt.getMinute}%02d:" +
      f"${dt.getSecond}%02d"
    if (fsp == 0) base
    else base + "." + f"${dt.getNano / 1000}%06d".take(fsp)
  }

  /** MySQL packed decimal: 9-digit groups as 4-byte big-endian ints,
    * partial groups in {0,1,1,2,2,3,3,4,4} bytes; the integer part's
    * FIRST byte carries the sign in its top bit (XOR 0x80), negative
    * numbers store the one's complement. Rendered at full declared
    * scale (DECIMAL(12,2) 5 → "5.00"), matching server string output. */
  private val Dig2Bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4)

  def decodeDecimal(b: ByteBuffer, precision: Int, scale: Int): String = {
    val intg = precision - scale
    val intBytes = (intg / 9) * 4 + Dig2Bytes(intg % 9)
    val fracBytes = (scale / 9) * 4 + Dig2Bytes(scale % 9)
    val raw = bytesOf(b, intBytes + fracBytes)
    val negative = (raw(0) & 0x80) == 0
    raw(0) = (raw(0) ^ 0x80).toByte
    if (negative) {
      var i = 0
      while (i < raw.length) { raw(i) = (~raw(i)).toByte; i += 1 }
    }
    val buf = ByteBuffer.wrap(raw)
    val sb = new StringBuilder
    val lead = intg % 9
    if (lead > 0) sb.append(beUint(buf, Dig2Bytes(lead)).toString
      .reverse.padTo(lead, '0').reverse)
    for (_ <- 0 until intg / 9)
      sb.append(beUint(buf, 4).toString.reverse.padTo(9, '0').reverse)
    val intPart = {
      val t = sb.toString.dropWhile(_ == '0')
      if (t.isEmpty) "0" else t
    }
    val fb = new StringBuilder
    for (_ <- 0 until scale / 9)
      fb.append(beUint(buf, 4).toString.reverse.padTo(9, '0').reverse)
    val tail = scale % 9
    if (tail > 0) fb.append(beUint(buf, Dig2Bytes(tail)).toString
      .reverse.padTo(tail, '0').reverse)
    val body = if (scale == 0) intPart else intPart + "." + fb.toString
    if (negative && body.exists(c => c != '0' && c != '.')) "-" + body
    else body
  }

  // --------------------------------------------------------------- encoding
  // Inverse codec for golden fixtures and the distributed round-trip
  // query — MySQL servers are the only real producers; this exists so
  // the decoder is testable byte-for-byte without one (same role as
  // PgOutput.encode).

  final class W {
    private val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): W = { out.write(v); this }
    def u16(v: Int): W = { out.write(v); out.write(v >>> 8); this }
    def u24v(v: Int): W = { u16(v & 0xFFFF); u8(v >>> 16) }
    def u32(v: Long): W = { u16((v & 0xFFFF).toInt); u16((v >>> 16).toInt) }
    def u48(v: Long): W = { u32(v & 0xFFFFFFFFL); u16((v >>> 32).toInt) }
    def u64(v: Long): W = { u32(v & 0xFFFFFFFFL); u32(v >>> 32) }
    def be(v: Long, n: Int): W = {
      var i = n - 1
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xFF).toInt); i -= 1 }
      this
    }
    def raw(b: Array[Byte]): W = { out.write(b); this }
    def str(s: String): W = raw(s.getBytes(StandardCharsets.UTF_8))
    def lenc(v: Long): W =
      if (v < 0xFB) u8(v.toInt)
      else if (v <= 0xFFFF) { u8(0xFC); u16(v.toInt) }
      else if (v <= 0xFFFFFF) { u8(0xFD); u24v(v.toInt) }
      else { u8(0xFE); u64(v) }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def withHeader(timestampSec: Long, eventType: Int,
      logPos: Long, body: Array[Byte]): Array[Byte] = {
    val w = new W
    w.u32(timestampSec).u8(eventType).u32(1L)
      .u32(HeaderLen + body.length.toLong).u32(logPos).u16(0)
    w.raw(body).bytes
  }

  def encodeFormatDescription(timestampSec: Long,
      logPos: Long): Array[Byte] = {
    val w = new W
    w.u16(4).raw(java.util.Arrays.copyOf(
      "8.0.0-graft-fixture".getBytes(StandardCharsets.UTF_8), 50))
    w.u32(timestampSec).u8(HeaderLen)
    // post-header length table for event types 1..38 + checksum off
    w.raw(Array.fill[Byte](38)(0)).u8(0).u32(0)
    withHeader(timestampSec, Ev.FormatDescription, logPos, w.bytes)
  }

  def encodeQuery(timestampSec: Long, logPos: Long, schema: String,
      sql: String): Array[Byte] = {
    val w = new W
    w.u32(0).u32(0).u8(schema.getBytes(StandardCharsets.UTF_8).length)
      .u16(0).u16(0).str(schema).u8(0).str(sql)
    withHeader(timestampSec, Ev.Query, logPos, w.bytes)
  }

  def encodeXid(timestampSec: Long, logPos: Long, xid: Long): Array[Byte] =
    withHeader(timestampSec, Ev.Xid, logPos, new W().u64(xid).bytes)

  def encodeRotate(timestampSec: Long, logPos: Long, position: Long,
      nextLog: String): Array[Byte] =
    withHeader(timestampSec, Ev.Rotate, logPos,
      new W().u64(position).str(nextLog).bytes)

  def encodeGtid(timestampSec: Long, logPos: Long, uuid: String,
      gno: Long): Array[Byte] = {
    val clean = uuid.replace("-", "")
    val sid = Array.tabulate(16)(i =>
      Integer.parseInt(clean.substring(2 * i, 2 * i + 2), 16).toByte)
    withHeader(timestampSec, Ev.Gtid, logPos,
      new W().u8(0).raw(sid).u64(gno).bytes)
  }

  def encodeMariadbGtid(timestampSec: Long, logPos: Long, serverId: Long,
      domain: Long, seq: Long): Array[Byte] = {
    val w = new W
    w.u32(timestampSec).u8(Ev.MariadbGtid).u32(serverId)
      .u32(HeaderLen + 13L).u32(logPos).u16(0)
    w.u64(seq).u32(domain).u8(0)
    w.bytes
  }

  def encodeTableMap(timestampSec: Long, logPos: Long,
      tm: TableMap): Array[Byte] = {
    val w = new W
    w.u48(tm.tableId).u16(1)
    val sb = tm.schema.getBytes(StandardCharsets.UTF_8)
    val tb = tm.table.getBytes(StandardCharsets.UTF_8)
    w.u8(sb.length).raw(sb).u8(0).u8(tb.length).raw(tb).u8(0)
    w.lenc(tm.columnTypes.length.toLong)
    tm.columnTypes.foreach(w.u8)
    val mw = new W
    tm.columnTypes.zip(tm.columnMeta).foreach { case (t, m) =>
      metaLen(t) match {
        case 0 =>
        case 1 => mw.u8(m)
        case 2 => t match {
          case ColType.StringT | ColType.Enum | ColType.Set |
              ColType.NewDecimal => mw.u8((m >> 8) & 0xFF).u8(m & 0xFF)
          case _ => mw.u16(m)
        }
      }
    }
    val metaBytes = mw.bytes
    w.lenc(metaBytes.length.toLong).raw(metaBytes)
    val nullBytes = new Array[Byte]((tm.columnTypes.length + 7) / 8)
    tm.nullable.zipWithIndex.foreach { case (n, i) =>
      if (n) nullBytes(i / 8) = (nullBytes(i / 8) | (1 << (i % 8))).toByte
    }
    w.raw(nullBytes)
    // optional metadata: SIGNEDNESS then COLUMN_NAME
    val numericIdx = tm.columnTypes.zipWithIndex.collect {
      case (t, i) if isNumeric(t) => i }
    if (numericIdx.nonEmpty) {
      val bits = new Array[Byte]((numericIdx.length + 7) / 8)
      numericIdx.zipWithIndex.foreach { case (colIdx, k) =>
        if (!tm.signedness.lift(colIdx).getOrElse(true))
          bits(k / 8) = (bits(k / 8) | (1 << (7 - k % 8))).toByte
      }
      w.u8(1).lenc(bits.length.toLong).raw(bits)
    }
    if (tm.columnNames.nonEmpty) {
      val nw = new W
      tm.columnNames.foreach { n =>
        val nb = n.getBytes(StandardCharsets.UTF_8)
        nw.lenc(nb.length.toLong).raw(nb)
      }
      val nb = nw.bytes
      w.u8(4).lenc(nb.length.toLong).raw(nb)
    }
    // ENUM_STR_VALUE (5) / SET_STR_VALUE (6), per column in order
    Seq(ColType.Enum -> 5, ColType.Set -> 6).foreach {
      case (want, tlv) =>
        val cols = tm.columnTypes.indices
          .filter(i => tm.realType(i) == want)
          .filter(tm.enumSetValues.contains)
        if (cols.nonEmpty) {
          val vw = new W
          cols.foreach { i =>
            val vs = tm.enumSetValues(i)
            vw.lenc(vs.length.toLong)
            vs.foreach { v =>
              val vb = v.getBytes(StandardCharsets.UTF_8)
              vw.lenc(vb.length.toLong).raw(vb)
            }
          }
          val vb = vw.bytes
          w.u8(tlv).lenc(vb.length.toLong).raw(vb)
        }
    }
    withHeader(timestampSec, Ev.TableMap, logPos, w.bytes)
  }

  /** Fixture value encoders (inverse of [[decodeValue]] for the types the
    * specs exercise). `v` is the raw Scala value per type. */
  def encodeRows(timestampSec: Long, logPos: Long, eventType: Int,
      tm: TableMap, images: Seq[Seq[Option[Option[Array[Byte]]]]])
      : Array[Byte] = {
    val w = new W
    val n = tm.columnTypes.length
    w.u48(tm.tableId).u16(1)
    if (eventType >= Ev.WriteRowsV2) w.u16(2) // extra-data len (none)
    w.lenc(n.toLong)
    val isUpdate =
      eventType == Ev.UpdateRowsV1 || eventType == Ev.UpdateRowsV2
    // per-image present bitmaps; for updates images alternate old,new
    def presentBits(image: Seq[Option[Option[Array[Byte]]]]): Array[Byte] = {
      val bits = new Array[Byte]((n + 7) / 8)
      image.zipWithIndex.foreach { case (c, i) =>
        if (c.isDefined) bits(i / 8) = (bits(i / 8) | (1 << (i % 8))).toByte
      }
      bits
    }
    if (isUpdate) {
      require(images.size % 2 == 0, "update images must alternate old,new")
      w.raw(presentBits(images.head))
      w.raw(presentBits(images(1)))
    } else {
      w.raw(presentBits(images.head))
    }
    images.foreach { image =>
      val present = image.filter(_.isDefined).map(_.get)
      val nulls = new Array[Byte]((present.size + 7) / 8)
      present.zipWithIndex.foreach { case (v, k) =>
        if (v.isEmpty) nulls(k / 8) = (nulls(k / 8) | (1 << (k % 8))).toByte
      }
      w.raw(nulls)
      present.foreach {
        case Some(bytes) => w.raw(bytes)
        case None =>
      }
    }
    withHeader(timestampSec, eventType, logPos, w.bytes)
  }

  // fixture field encoders
  def fLong(v: Long): Array[Byte] = new W().u64(v).bytes
  def fInt(v: Int): Array[Byte] = new W().u32(v.toLong).bytes
  def fShort(v: Int): Array[Byte] = new W().u16(v).bytes
  def fTiny(v: Int): Array[Byte] = new W().u8(v & 0xFF).bytes
  def fVarchar(s: String, maxLen: Int): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val w = new W
    if (maxLen > 255) w.u16(b.length) else w.u8(b.length)
    w.raw(b).bytes
  }
  def fDate(y: Int, m: Int, d: Int): Array[Byte] =
    new W().u24v(d | (m << 5) | (y << 9)).bytes
  def fInt24(v: Int): Array[Byte] = new W().u24v(v & 0xFFFFFF).bytes
  def fFloat(v: Float): Array[Byte] =
    new W().u32(java.lang.Float.floatToIntBits(v) & 0xFFFFFFFFL).bytes
  def fDouble(v: Double): Array[Byte] =
    new W().u64(java.lang.Double.doubleToLongBits(v)).bytes
  def fYear(y: Int): Array[Byte] =
    new W().u8(if (y == 0) 0 else y - 1900).bytes
  /** TIMEF encode, the exact my_time_packed_to_binary layout — pass a
    * negative `h` for negative times (m/s/micros stay non-negative
    * magnitudes). */
  /** `negative` covers the hour-zero range ('-00:30:00' is MySQL-legal
    * but `h = 0` cannot carry the sign); `h < 0` implies it. */
  def fTime2(h: Int, m: Int, s: Int, micros: Long, fsp: Int,
      negative: Boolean = false): Array[Byte] = {
    val neg = h < 0 || negative
    val hms = (math.abs(h).toLong << 12) | (m.toLong << 6) | s
    val n = (fsp + 1) / 2
    val fracAbs = if (n == 0) 0L else micros / math.pow(100, 3 - n).toLong
    val w = new W
    if (n == 3) {
      val nr = (hms << 24) + micros
      w.be((if (neg) -nr else nr) + 0x800000000000L, 6)
    } else {
      val carry = neg && fracAbs > 0
      val ip = (if (neg) -hms else hms) - (if (carry) 1L else 0L)
      w.be(0x800000L + ip, 3)
      if (n > 0) {
        val span = if (n == 1) 0x100L else 0x10000L
        w.be(if (carry) span - fracAbs else fracAbs, n)
      }
    }
    w.bytes
  }
  def fTimestamp2(epochSecs: Long, micros: Long, fsp: Int): Array[Byte] = {
    val w = new W().be(epochSecs, 4)
    val n = (fsp + 1) / 2
    if (n > 0) w.be(micros / math.pow(100, 3 - n).toLong, n)
    w.bytes
  }
  def fBit(v: Long, bits: Int): Array[Byte] =
    new W().be(v, (bits + 7) / 8).bytes
  def fEnum(ordinal: Int, width: Int): Array[Byte] = {
    val w = new W
    if (width == 1) w.u8(ordinal) else w.u16(ordinal)
    w.bytes
  }
  def fSet(mask: Long, width: Int): Array[Byte] = {
    val w = new W
    (0 until width).foreach(i => w.u8(((mask >> (8 * i)) & 0xFF).toInt))
    w.bytes
  }
  def fBlob(data: Array[Byte], lenBytes: Int): Array[Byte] = {
    val w = new W
    lenBytes match {
      case 1 => w.u8(data.length)
      case 2 => w.u16(data.length)
      case 3 => w.u24v(data.length)
      case _ => w.u32(data.length.toLong)
    }
    w.raw(data).bytes
  }
  def fChar(s: String, meta: Int): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    val w = new W
    val m1 = (meta >> 8) & 0xFF
    val m2 = meta & 0xFF
    val maxLen =
      if ((m1 & 0x30) != 0x30) (((m1 & 0x30) ^ 0x30) << 4) | m2 else m2
    if (maxLen > 255) w.u16(b.length) else w.u8(b.length)
    w.raw(b).bytes
  }
  def fDateTime2(dt: java.time.LocalDateTime, fsp: Int): Array[Byte] = {
    val ym = dt.getYear * 13 + dt.getMonthValue
    val packed = (1L << 39) | (ym.toLong << 22) |
      (dt.getDayOfMonth.toLong << 17) | (dt.getHour.toLong << 12) |
      (dt.getMinute.toLong << 6) | dt.getSecond.toLong
    val w = new W().be(packed & ((1L << 40) - 1), 5)
    val n = (fsp + 1) / 2
    if (n > 0) {
      val micros = dt.getNano / 1000
      w.be(micros / math.pow(100, 3 - n).toLong, n)
    }
    w.bytes
  }
  def fDecimal(s: String, precision: Int, scale: Int): Array[Byte] = {
    val negative = s.startsWith("-")
    val body = if (negative) s.substring(1) else s
    val (ip0, fp0) = body.split("\\.", 2) match {
      case Array(i) => (i, "")
      case Array(i, f) => (i, f)
    }
    val intg = precision - scale
    // exactly intg digits (pad AND truncate): intg = 0 must emit zero
    // integer bytes, not a spurious "0" group
    val ip = ip0.reverse.padTo(intg, '0').reverse.takeRight(intg)
    val fp = fp0.padTo(scale, '0').take(scale)
    val w = new W
    val lead = intg % 9
    if (lead > 0)
      w.be(ip.take(lead).toLong, Dig2Bytes(lead))
    ip.drop(lead).grouped(9).foreach(g => w.be(g.toLong, 4))
    fp.take((scale / 9) * 9).grouped(9).foreach(g => w.be(g.toLong, 4))
    val tail = scale % 9
    if (tail > 0) w.be(fp.drop((scale / 9) * 9).toLong, Dig2Bytes(tail))
    val raw = w.bytes
    if (negative) {
      var i = 0
      while (i < raw.length) { raw(i) = (~raw(i)).toByte; i += 1 }
    }
    raw(0) = (raw(0) ^ 0x80).toByte
    raw
  }
}

/** Stateful binlog session decoder: feed raw events in log order, get
  * [[ChangeRecord]]s out — the reference's `processEvent` loop
  * (mysql/cdc.go:724-1036) restated:
  *
  *   - TABLE_MAP registers tableId → schema (the `tableIdToName` map);
  *   - WRITE/UPDATE/DELETE_ROWS emit one record per row, commit time =
  *     the event header's seconds timestamp ×1e6 (MySQL binlog carries
  *     no finer clock there), transaction id 0 (MySQL exposes none
  *     until XID — the reference's BaseRecord does the same);
  *   - UPDATE images alternate (old, new); columns absent from the
  *     after image (MINIMAL row image — `SkippedColumns`) become the
  *     record's unchangedToastColumns;
  *   - the checkpoint advances ONLY at transaction boundaries (XID, or
  *     a COMMIT/ROLLBACK QueryEvent for non-transactional engines) —
  *     the tx-atomic batch-cut rule (`advanceCheckpoint`);
  *   - checkpoint text is the GTID set when GTID events flow, else
  *     "file:pos" ([[TextCheckpoint]] owns the ordering rules);
  *   - ROTATE switches the current file name;
  *   - an ALTER TABLE ... ADD COLUMN QueryEvent emits a TypeRelation
  *     schema-delta record ([[SchemaEvolution]] JSON), the
  *     `processAlterTableQuery` path with [[graft.types.MySqlTypes]]
  *     supplying the column-type classification.
  */
final class MysqlBinlogDecoder(
    tableFilter: String => Boolean = _ => true,
    destinationFor: String => String = identity,
    startFile: String = "binlog.000001") {

  import MysqlBinlog._

  private val tableMaps =
    scala.collection.mutable.HashMap.empty[Long, TableMap]
  private var checksummed = false
  private var file: String = startFile
  private var committedPos: Long = 0L
  private var pendingPos: Long = 0L
  private var gtidSet: TextCheckpoint.GtidSet = TextCheckpoint.GtidSet.empty
  private var mariaSet: TextCheckpoint.MariadbGtidSet =
    TextCheckpoint.MariadbGtidSet.empty
  private var pendingGtid: Option[Gtid] = None
  private var pendingMaria: Option[MariadbGtid] = None
  private var useGtid = false
  private var useMaria = false

  /** Latest SAFE checkpoint: advanced only at commit boundaries.
    * Numeric half = byte position in the current file (the DSv2
    * source's monotonic cp), text half = GTID set (MySQL uuid:ranges or
    * MariaDB domain-server-seq, whichever flavor the stream speaks) or
    * file:pos. */
  def latestCheckpoint: Long = committedPos
  def latestCheckpointText: String =
    if (useMaria) mariaSet.render
    else if (useGtid) gtidSet.render
    else s"$file:$committedPos"

  /** Seed the file cursor when a capture file opens. The capture
    * contract — enforced HERE, relied on by resume skipping and the
    * capture-lag gauge — is that a capture file's stem IS the binlog
    * file name it holds. A no-op when the previous file's trailing
    * Rotate already moved the cursor there; otherwise the switch resets
    * the position the way the missing Rotate would have (byte positions
    * restart in every binlog file, after the 4-byte magic). */
  def seedFile(name: String): Unit =
    if (name != file) { file = name; committedPos = 4L }

  /** Seed ack/GTID state from a persisted checkpoint text (resuming
    * past capture files skipped as fully acked): a GTID render IS the
    * full ack state (the whole set), a file:pos text is the cursor.
    * Unknown/empty text seeds nothing. */
  def seedCheckpointText(text: String): Unit =
    if (text.nonEmpty) TextCheckpoint.flavor(text) match {
      case TextCheckpoint.MariaGtid =>
        mariaSet = mariaSet.merge(TextCheckpoint.MariadbGtidSet.parse(text))
        useMaria = true
      case TextCheckpoint.MysqlGtid =>
        gtidSet = gtidSet.merge(TextCheckpoint.GtidSet.parse(text))
        useGtid = true
      case TextCheckpoint.FilePos => text.split(":", 2) match {
        case Array(f, p) if p.forall(_.isDigit) && p.nonEmpty =>
          file = f; committedPos = p.toLong
        case _ => ()
      }
    }

  private def commitBoundary(logPos: Long): Unit = {
    pendingGtid.foreach { g =>
      gtidSet = gtidSet.merge(TextCheckpoint.GtidSet.parse(
        s"${g.uuid}:${g.gno}"))
      useGtid = true
      pendingGtid = None
    }
    pendingMaria.foreach { g =>
      mariaSet = mariaSet.merge(TextCheckpoint.MariadbGtidSet.parse(
        s"${g.domain}-${g.serverId}-${g.seq}"))
      useMaria = true
      pendingMaria = None
    }
    committedPos = logPos
  }

  private def imageJson(tm: TableMap, img: RowImage)
      : (String, Seq[String]) = {
    require(tm.columnNames.nonEmpty,
      s"TABLE_MAP for ${tm.qualifiedName} carries no column names — " +
        "binlog_row_metadata=FULL is required (cdc.go:845-849)")
    val absent = Seq.newBuilder[String]
    val parts = img.cols.zipWithIndex.flatMap { case (c, i) =>
      val name = tm.columnNames(i)
      c match {
        case None => absent += name; None
        case Some(None) => Some("\"" + name + "\":null")
        case Some(Some(json)) => Some("\"" + name + "\":" + json)
      }
    }
    (parts.mkString("{", ",", "}"), absent.result())
  }

  private def recordsFor(h: Header, tm: TableMap, ev: Event)
      : Seq[ChangeRecord] = {
    if (!tableFilter(tm.qualifiedName)) return Nil
    val ctMicros = h.timestampSec * 1000000L
    val src = tm.qualifiedName
    val dest = destinationFor(src)
    val cpText = latestCheckpointText
    ev match {
      case WriteRows(_, rows) => rows.map { r =>
        val (json, _) = imageJson(tm, r)
        ChangeRecord(ChangeRecord.TypeInsert, h.logPos, cpText, ctMicros,
          0L, src, dest, json, null, Nil)
      }
      case DeleteRows(_, rows) => rows.map { r =>
        val (json, _) = imageJson(tm, r)
        ChangeRecord(ChangeRecord.TypeDelete, h.logPos, cpText, ctMicros,
          0L, src, dest, null, json, Nil)
      }
      case UpdateRows(_, rows) => rows.map { case (oldR, newR) =>
        val (oldJson, _) = imageJson(tm, oldR)
        val (newJson, skipped) = imageJson(tm, newR)
        ChangeRecord(ChangeRecord.TypeUpdate, h.logPos, cpText, ctMicros,
          0L, src, dest, newJson, oldJson, skipped)
      }
      case _ => Nil
    }
  }

  private val AlterAdd =
    """(?is)\s*ALTER\s+TABLE\s+[`"]?(\w+)[`"]?(?:\.[`"]?(\w+)[`"]?)?\s+ADD\s+(?:COLUMN\s+)?[`"]?(\w+)[`"]?\s+([^,;]+?)\s*(?:;.*)?""".r

  private def alterRecord(h: Header, schema: String, sql: String)
      : Option[ChangeRecord] = sql match {
    case AlterAdd(p1, p2, colName, colType) =>
      val qualified =
        if (p2 != null) s"$p1.$p2"
        else if (schema.nonEmpty) s"$schema.$p1" else p1
      if (!tableFilter(qualified)) None
      else {
        val kind = graft.types.MySqlTypes.fromMysqlType(colType.trim)
        val delta = TableSchemaDelta(qualified, destinationFor(qualified),
          Seq(AddedColumn(colName, kind)))
        Some(ChangeRecord(ChangeRecord.TypeRelation, h.logPos,
          latestCheckpointText, h.timestampSec * 1000000L, 0L, qualified,
          destinationFor(qualified),
          graft.cdc.SchemaEvolution.deltaToJson(delta), null, Nil))
      }
    case _ => None
  }

  /** Feed one raw event; returns the decoded records it emits (rows
    * events emit one per row, most events none). */
  def feed(data: Array[Byte]): Seq[ChangeRecord] = {
    val (h, ev) = parse(data, tableMaps.get, checksummed)
    ev match {
      case fde: FormatDescription =>
        checksummed = fde.checksumAlg == 1
        Nil
      case Rotate(position, next) =>
        // a real rotate (ts != 0 or name change) moves the file cursor
        if (h.timestampSec != 0 || next != file) {
          file = next
          committedPos = position
        }
        Nil
      case g: Gtid => pendingGtid = Some(g); Nil
      case g: MariadbGtid => pendingMaria = Some(g); Nil
      case Xid(_) => commitBoundary(h.logPos); Nil
      case tm: TableMap => tableMaps(tm.tableId) = tm; Nil
      case q: Query =>
        val sql = q.sql.trim.toUpperCase
        if (sql == "COMMIT" || sql == "ROLLBACK") {
          commitBoundary(h.logPos); Nil // non-transactional engines
        } else if (sql == "BEGIN") Nil
        else alterRecord(h, q.schema, q.sql).toSeq
      case rows @ (_: WriteRows | _: UpdateRows | _: DeleteRows) =>
        pendingPos = h.logPos
        val tid = rows match {
          case WriteRows(t, _) => t
          case UpdateRows(t, _) => t
          case DeleteRows(t, _) => t
          case _ => -1L
        }
        tableMaps.get(tid).map(tm => recordsFor(h, tm, rows))
          .getOrElse(Nil)
      case Unsupported(_) => Nil
    }
  }
}

/** MySQL binary JSON (the in-binlog storage format of JSON columns) →
  * compact JSON text, implemented from the public format description
  * (json_binary.h): small/large objects and arrays with offset tables,
  * inlined small scalars in value entries, varint strings, opaque
  * decimals. The reference receives this decode from its replication
  * library and only compacts the text (mysql/qvalue_convert.go:33-35,
  * `compactMySQLJSON`); here the binary walk itself is restated. The
  * inverse encoder (small format) exists for golden fixtures. */
object MysqlBinaryJson {

  import java.nio.{ByteBuffer, ByteOrder}
  import java.nio.charset.StandardCharsets

  private object T {
    val SmallObject = 0x00; val LargeObject = 0x01
    val SmallArray = 0x02; val LargeArray = 0x03
    val Literal = 0x04; val Int16 = 0x05; val Uint16 = 0x06
    val Int32 = 0x07; val Uint32 = 0x08; val Int64 = 0x09
    val Uint64 = 0x0A; val Double = 0x0B; val Str = 0x0C
    val Opaque = 0x0F
  }

  private def varint(b: ByteBuffer): Int = {
    var len = 0; var shift = 0; var more = true
    while (more) {
      val x = b.get() & 0xFF
      len |= (x & 0x7F) << shift
      shift += 7
      more = (x & 0x80) != 0
    }
    len
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

  /** Render a full binary JSON value: [type byte][payload]. */
  def render(bytes: Array[Byte]): String = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val t = b.get() & 0xFF
    renderValue(t, b.slice().order(ByteOrder.LITTLE_ENDIAN))
  }

  /** `payload` is positioned at the start of the type-specific data;
    * container offsets are relative to that start. */
  private def renderValue(t: Int, payload: ByteBuffer): String = t match {
    case T.Literal => (payload.get() & 0xFF) match {
      case 0x00 => "null"
      case 0x01 => "true"
      case 0x02 => "false"
      case other => throw new IllegalArgumentException(
        s"bad JSON literal $other")
    }
    case T.Int16 => payload.getShort().toString
    case T.Uint16 => (payload.getShort() & 0xFFFF).toString
    case T.Int32 => payload.getInt().toString
    case T.Uint32 => (payload.getInt() & 0xFFFFFFFFL).toString
    case T.Int64 => payload.getLong().toString
    case T.Uint64 =>
      java.lang.Long.toUnsignedString(payload.getLong())
    case T.Double =>
      val d = payload.getDouble()
      if (d.isNaN || d.isInfinite) "null"
      else if (d == d.toLong.toDouble) d.toLong.toString + ".0"
      else d.toString
    case T.Str =>
      val len = varint(payload)
      val a = new Array[Byte](len); payload.get(a)
      "\"" + jsonEscape(new String(a, StandardCharsets.UTF_8)) + "\""
    case T.Opaque =>
      val fieldType = payload.get() & 0xFF
      val len = varint(payload)
      val a = new Array[Byte](len); payload.get(a)
      if (fieldType == MysqlBinlog.ColType.NewDecimal && len >= 2) {
        // precision u8 + scale u8 + packed decimal
        val p = a(0) & 0xFF; val s = a(1) & 0xFF
        MysqlBinlog.decodeDecimal(
          ByteBuffer.wrap(a, 2, a.length - 2), p, s)
      } else throw new IllegalArgumentException(
        s"unsupported opaque JSON field type $fieldType")
    case T.SmallObject | T.LargeObject =>
      renderContainer(payload, obj = true, large = t == T.LargeObject)
    case T.SmallArray | T.LargeArray =>
      renderContainer(payload, obj = false, large = t == T.LargeArray)
    case other => throw new IllegalArgumentException(
      s"unsupported binary JSON type $other")
  }

  private def renderContainer(b: ByteBuffer, obj: Boolean,
      large: Boolean): String = {
    val base = b.position() // container offsets are relative to here
    def off(): Int = if (large) b.getInt() else b.getShort() & 0xFFFF
    val count = off()
    off() // total binary size (unused for the walk)
    val keyRefs = if (obj) (0 until count).map { _ =>
      val o = off(); val l = b.getShort() & 0xFFFF; (o, l)
    } else Nil
    val valueRefs = (0 until count).map { _ =>
      val t = b.get() & 0xFF
      // literal/int16/uint16 (+int32/uint32 when large) inline in the
      // offset slot instead of pointing at trailing data
      val inlineable = t == T.Literal || t == T.Int16 || t == T.Uint16 ||
        (large && (t == T.Int32 || t == T.Uint32))
      if (inlineable) {
        val raw = new Array[Byte](if (large) 4 else 2)
        b.get(raw); (t, -1, raw)
      } else (t, off(), null)
    }
    def at(offset: Int): ByteBuffer = {
      val d = b.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      d.position(base + offset)
      d
    }
    val keys = keyRefs.map { case (o, l) =>
      val d = at(o); val a = new Array[Byte](l); d.get(a)
      new String(a, StandardCharsets.UTF_8)
    }
    val values = valueRefs.map {
      case (t, -1, raw) =>
        renderValue(t,
          ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN))
      case (t, o, _) => renderValue(t, at(o))
    }
    if (obj)
      keys.zip(values).map { case (k, v) =>
        "\"" + jsonEscape(k) + "\":" + v
      }.mkString("{", ",", "}")
    else values.mkString("[", ",", "]")
  }

  // ------------------------------------------------------------ encoding
  // Small-format fixture encoder: Map → object, Seq → array, String,
  // Long/Int, Boolean, Double, null. MySQL stores object keys sorted by
  // (length, bytes); the encoder follows that so fixtures match server
  // output ordering.

  def encode(v: Any): Array[Byte] = {
    val (t, payload) = encodeValue(v)
    val out = new java.io.ByteArrayOutputStream()
    out.write(t); out.write(payload)
    out.toByteArray
  }

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  private def varintBytes(len: Int): Array[Byte] = {
    var v = len
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    while (v > 0x7F) { out += ((v & 0x7F) | 0x80).toByte; v >>= 7 }
    out += v.toByte
    out.toArray
  }

  /** (type byte, payload). Inlining decisions happen in the container. */
  private def encodeValue(v: Any): (Int, Array[Byte]) = v match {
    case null => (T.Literal, Array(0x00.toByte))
    case true => (T.Literal, Array(0x01.toByte))
    case false => (T.Literal, Array(0x02.toByte))
    case i: Int => encodeValue(i.toLong)
    case l: Long =>
      if (l >= Short.MinValue && l <= Short.MaxValue)
        (T.Int16, u16(l.toInt & 0xFFFF))
      else if (l >= Int.MinValue && l <= Int.MaxValue)
        (T.Int32, Array.tabulate(4)(i => ((l >> (8 * i)) & 0xFF).toByte))
      else
        (T.Int64, Array.tabulate(8)(i => ((l >> (8 * i)) & 0xFF).toByte))
    case d: Double =>
      val bits = java.lang.Double.doubleToLongBits(d)
      (T.Double,
        Array.tabulate(8)(i => ((bits >> (8 * i)) & 0xFF).toByte))
    case s: String =>
      val sb = s.getBytes(StandardCharsets.UTF_8)
      (T.Str, varintBytes(sb.length) ++ sb)
    case m: Map[_, _] =>
      val entries = m.toSeq.map { case (k, vv) =>
        (k.toString, encodeValue(vv))
      }.sortBy { case (k, _) =>
        (k.getBytes(StandardCharsets.UTF_8).length, k)
      }
      (T.SmallObject, container(entries.map(_._1), entries.map(_._2)))
    case s: Seq[_] =>
      (T.SmallArray, container(Nil, s.map(encodeValue)))
    case other => throw new IllegalArgumentException(
      s"cannot encode ${other.getClass} as binary JSON")
  }

  private def container(keys: Seq[String],
      values: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val obj = keys.nonEmpty || values.isEmpty && keys.isEmpty && false
    val isObj = keys.nonEmpty
    val count = values.size
    val keyBytes = keys.map(_.getBytes(StandardCharsets.UTF_8))
    val headerSize = 4 + (if (isObj) count * 4 else 0) + count * 3
    var dataOff = headerSize + keyBytes.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream()
    out.write(u16(count))
    // total size patched at the end
    val sizePos = out.size()
    out.write(u16(0))
    var keyOff = headerSize
    keyBytes.foreach { kb =>
      out.write(u16(keyOff)); out.write(u16(kb.length))
      keyOff += kb.length
    }
    val trailing = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    values.foreach { case (t, payload) =>
      out.write(t)
      val inline = t == T.Literal || t == T.Int16 || t == T.Uint16
      if (inline) {
        // literal payload is 1 byte: pad to the 2-byte offset slot
        out.write(payload.padTo(2, 0.toByte), 0, 2)
      } else {
        out.write(u16(dataOff))
        trailing += payload
        dataOff += payload.length
      }
    }
    keyBytes.foreach(out.write)
    trailing.foreach(out.write)
    val bytes = out.toByteArray
    val total = bytes.length
    bytes(sizePos) = (total & 0xFF).toByte
    bytes(sizePos + 1) = ((total >> 8) & 0xFF).toByte
    bytes
  }
}
