package graft.transform

import scala.collection.mutable

import graft.transform.Lua._

/** The peerdb Lua environment — the record/row surface user scripts
  * program against, restated from flow/pua/peerdb.go:
  *
  *   - `peerdb.*` helpers (RowTable, RowColumns, RowColumnKind, Now,
  *     UUID, Time, type, tostring, unix_epoch — peerdb.go:110-123);
  *   - record userdata with kind/row/old/new/checkpoint/commit_time/
  *     transaction_id/target/source/unchanged_columns
  *     (LuaRecordIndex, peerdb.go:476-540);
  *   - row userdata indexing columns (LuaRowIndex:158) with `#row` =
  *     column count;
  *   - the `json` module (gluajson) with `encode`/`decode`, where a
  *     record encodes as its LuaRecordJson table (peerdb.go:552-570)
  *     and a row as its column map.
  *
  * Values come from the parsed change-row JSON, so numbers keep the
  * glua64 integer exactness ([[Lua.VInt]]) and strings/booleans/nulls
  * map directly; nested JSON appears as tables. */
object LuaRecordEnv {

  /** One change record as the script sees it — built from the WAL
    * batch row (the full [[graft.model.ChangeRecord]] image, not the
    * reduced raw-table projection, so source table and transaction id
    * survive to the script). */
  final case class Rec(
      recordType: Int,
      checkpointId: Long,
      commitTimeMicros: Long,
      transactionId: Long,
      sourceTable: String,
      destinationTable: String,
      data: String,
      matchData: String,
      unchangedToast: Seq[String])

  // ------------------------------------------------------ JSON bridge

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def jsonToLua(n: com.fasterxml.jackson.databind.JsonNode): V =
    if (n == null || n.isNull) VNil
    else if (n.isTextual) VStr(n.asText())
    else if (n.isIntegralNumber && n.canConvertToLong) VInt(n.asLong())
    else if (n.isNumber) VNum(n.asDouble())
    else if (n.isBoolean) VBool(n.asBoolean())
    else if (n.isArray) {
      val t = new VTable
      var i = 0
      val it = n.elements()
      while (it.hasNext) { i += 1; t.set(VInt(i.toLong), jsonToLua(it.next())) }
      t
    } else {
      val t = new VTable
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        t.set(VStr(e.getKey), jsonToLua(e.getValue))
      }
      t
    }

  /** Ordered column map of a row-image JSON (null/absent → empty). */
  private def parseRow(json: String): Option[Vector[(String, V)]] =
    Option(json).filter(_.nonEmpty).flatMap { j =>
      scala.util.Try {
        val n = mapper.readTree(j)
        val out = Vector.newBuilder[(String, V)]
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          out += (e.getKey -> jsonToLua(e.getValue))
        }
        out.result()
      }.toOption
    }

  private def jsonStr(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  /** gluajson-shaped encode: tables with a pure 1..n integer key set
    * are arrays (empty → []), everything else objects; rows encode as
    * their column maps; records as the LuaRecordJson table
    * (peerdb.go:552-570); times as RFC3339. */
  def jsonEncode(v: V): String = {
    val sb = new StringBuilder
    enc(sb, v)
    sb.toString
  }

  private def enc(sb: StringBuilder, v: V): Unit = v match {
    case VNil => sb.append("null")
    case VBool(b) => sb.append(b)
    case VInt(i) => sb.append(i)
    case VNum(d) =>
      if (d.isNaN || d.isInfinity) sb.append("null")
      else if (d.isWhole && d.abs < 1e15) sb.append(d.toLong)
      else sb.append(d)
    case VStr(s) => jsonStr(sb, s)
    case t: VTable =>
      val n = t.len
      if (t.hash.size == n) { // array (incl. empty)
        sb.append('[')
        var i = 1L
        while (i <= n) {
          if (i > 1) sb.append(',')
          enc(sb, t.get(VInt(i)))
          i += 1
        }
        sb.append(']')
      } else {
        sb.append('{')
        var first = true
        t.hash.foreach { case (k, value) =>
          if (!first) sb.append(',')
          first = false
          jsonStr(sb, tostr(k))
          sb.append(':')
          enc(sb, value)
        }
        sb.append('}')
      }
    case u: VUserData => u.payload match {
      case items: RowItems => // a row: ordered column map
        sb.append('{')
        items.cols.zipWithIndex.foreach {
          case ((k, value), i) =>
            if (i > 0) sb.append(',')
            jsonStr(sb, k); sb.append(':'); enc(sb, value)
        }
        sb.append('}')
      case r: Rec => enc(sb, recordJsonTable(u, r))
      // times serialize RFC3339 in JSON (the engine's timestamp canon)
      // even though tostring prints Go's time.String() image
      case t: java.time.Instant if u.tag == "peerdb_time" =>
        jsonStr(sb, Rfc3339.format(t))
      case _ => jsonStr(sb, u.ts(u.payload))
    }
    case f => jsonStr(sb, tostr(f))
  }

  // ---------------------------------------------------- userdata types

  private val Rfc3339 = java.time.format.DateTimeFormatter.ISO_INSTANT

  /** Go's `time.Time.String()` image for a UTC instant — what
    * gopher-lua's __tostring prints (LuaTimeString, peerdb.go:719-723;
    * pinned by pua/peerdb_test.go: "1970-01-01 00:00:00 +0000 UTC").
    * Fractional seconds trim trailing zeros and vanish at zero. */
  private[transform] def goTimeString(t: java.time.Instant): String = {
    val utc = t.atZone(java.time.ZoneOffset.UTC)
    val frac =
      if (t.getNano == 0) ""
      else "." + f"${t.getNano}%09d".reverse.dropWhile(_ == '0').reverse
    f"${utc.getYear}%04d-${utc.getMonthValue}%02d-" +
      f"${utc.getDayOfMonth}%02d ${utc.getHour}%02d:" +
      f"${utc.getMinute}%02d:${utc.getSecond}%02d$frac +0000 UTC"
  }

  def timeUD(instant: java.time.Instant): VUserData =
    VUserData("peerdb_time", instant,
      index = (p, k) => {
        val t = p.asInstanceOf[java.time.Instant]
        // the calendar accessors (LuaTimeIndex, peerdb.go:685-717)
        // read in UTC — commit times are wall-clock-free instants
        lazy val utc = t.atZone(java.time.ZoneOffset.UTC)
        k match {
          case "unix" => VNum(t.getEpochSecond.toDouble +
            t.getNano / 1e9)
          case "unix_second" => VInt(t.getEpochSecond)
          case "unix_milli" => VInt(t.toEpochMilli)
          case "unix_micro" => VInt(t.getEpochSecond * 1000000L +
            t.getNano / 1000L)
          case "unix_nano" => VInt(t.getEpochSecond * 1000000000L +
            t.getNano.toLong)
          case "year" => VInt(utc.getYear.toLong)
          case "month" => VInt(utc.getMonthValue.toLong)
          case "day" => VInt(utc.getDayOfMonth.toLong)
          case "yearday" => VInt(utc.getDayOfYear.toLong)
          case "hour" => VInt(utc.getHour.toLong)
          case "minute" => VInt(utc.getMinute.toLong)
          case "second" => VInt(utc.getSecond.toLong)
          case "nanosecond" => VInt(t.getNano.toLong)
          case _ => VNil
        }
      },
      ts = p => goTimeString(p.asInstanceOf[java.time.Instant]),
      order = (a, b) => a.asInstanceOf[java.time.Instant]
        .compareTo(b.asInstanceOf[java.time.Instant]))

  /** One record image's columns — MUTABLE, because scripts may assign
    * through the row (LuaRowNewIndex, peerdb.go:197-421): reads see
    * the write, json.encode sees it, and `row`/`new` aliases of the
    * same image share it (the reference's RecordItems is one map). A
    * nil write keeps the column as an explicit NULL (QValueNull). */
  final class RowItems(private var order: Vector[String],
      private var lookup: Map[String, V]) extends Lua.HasLuaLen {
    /** Set by any script write — lets the adapt stage re-encode ONLY
      * mutated images, so untouched records keep their original JSON
      * bytes (no formatting drift, no re-encode cost). */
    private var mutated = false
    def isDirty: Boolean = mutated
    def cols: Vector[(String, V)] =
      order.map(k => k -> lookup(k))
    def get(k: String): V = lookup.getOrElse(k, VNil)
    def set(k: String, v: V): Unit = {
      mutated = true
      if (!lookup.contains(k)) order = order :+ k
      lookup = lookup.updated(k, v)
    }
    def luaLen: Long = order.size.toLong
  }
  object RowItems {
    def apply(cols: Vector[(String, V)]): RowItems =
      new RowItems(cols.map(_._1), cols.toMap)
  }

  def rowUD(items: RowItems): VUserData =
    VUserData("peerdb_row", items,
      index = (p, k) => p.asInstanceOf[RowItems].get(k),
      ts = _ => "peerdb_row",
      newindex = (p, k, v) => p.asInstanceOf[RowItems].set(k, v))

  def rowUD(cols: Vector[(String, V)]): VUserData =
    rowUD(RowItems(cols))

  /** NUMERIC as an exact decimal (shared.LuaDecimal, shopspring
    * semantics): value-equality/ordering via compareTo (1.5 == 1.50),
    * the arithmetic metamethods with LVAsDecimal-style operand
    * coercion (peerdb.go:632-659: number, string, int64/bigint or
    * decimal userdata), division at shopspring's DivisionPrecision=16
    * rounded half away from zero, `%` as the truncated-quotient
    * remainder, `^` exact for whole exponents. */
  def decimalUD(bd: java.math.BigDecimal): VUserData =
    VUserData("peerdb_decimal", bd,
      index = (p, k) => {
        val d = p.asInstanceOf[java.math.BigDecimal]
        k match { // LuaDecimalIndex, peerdb.go:796-814
          case "coefficient" => bigIntUD(d.unscaledValue)
          case "coefficient64" => VInt(d.unscaledValue.longValue)
          case "exponent" => VInt(-d.scale.toLong)
          case "bigint" => bigIntUD(d.toBigInteger)
          case "int64" => VInt(d.toBigInteger.longValue)
          case "float64" => VNum(d.doubleValue)
          case _ => VNil
        }
      },
      // shopspring String() trims trailing zeros ("1.50" → "1.5")
      ts = p => p.asInstanceOf[java.math.BigDecimal]
        .stripTrailingZeros.toPlainString,
      order = (a, b) => a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal]),
      arith = (op, l, r) => {
        import java.math.{BigDecimal => JBD, RoundingMode}
        def coerce(v: V): JBD = v match {
          case VInt(i) => JBD.valueOf(i)
          case VNum(d) => new JBD(d.toString) // minimal round-trip digits
          case VStr(s) => try new JBD(s) catch {
            case _: NumberFormatException =>
              throw new Lua.LuaError(s"can't convert '$s' to decimal")
          }
          case u: VUserData if u.tag == "peerdb_decimal" =>
            u.payload.asInstanceOf[JBD]
          case u: VUserData if u.tag == "peerdb_bigint" =>
            new JBD(u.payload.asInstanceOf[java.math.BigInteger])
          case other => throw new Lua.LuaError(
            s"cannot create decimal from ${other.typeName}")
        }
        val (a, b) = (coerce(l), coerce(r))
        decimalUD(op match {
          case "+" => a.add(b)
          case "-" => a.subtract(b)
          case "*" => a.multiply(b)
          case "/" => a.divide(b, 16, RoundingMode.HALF_UP)
            .stripTrailingZeros
          case "%" => a.remainder(b)
          case "^" =>
            if (b.stripTrailingZeros.scale <= 0 &&
                b.abs.compareTo(JBD.valueOf(100000L)) <= 0) {
              val e = b.intValueExact
              if (e >= 0) a.pow(e)
              else JBD.ONE.divide(a.pow(-e), 16, RoundingMode.HALF_UP)
                .stripTrailingZeros
            } else new JBD(math.pow(a.doubleValue, b.doubleValue)
              .toString)
          case "unm" => a.negate
          case other => throw new Lua.LuaError(
            s"decimal: unsupported operator $other")
        })
      })

  /** NUMERIC coefficients (shared.LuaBigInt): tostring/compare/negate
    * only — the reference installs no binary arithmetic on big ints
    * (peerdb.go:75-80). */
  def bigIntUD(bi: java.math.BigInteger): VUserData =
    VUserData("peerdb_bigint", bi,
      index = (p, k) => {
        val b = p.asInstanceOf[java.math.BigInteger]
        k match { // LuaBigIntIndex, peerdb.go:746-760
          case "sign" => VInt(b.signum.toLong)
          // Go big.Int.Bytes(): ABSOLUTE value, big-endian, no
          // leading zeros (zero → empty)
          case "bytes" => Lua.VBytes(
            b.abs.toByteArray.dropWhile(_ == 0))
          case "int64" => VInt(b.longValue)
          case "is64" => VBool(b.bitLength < 64)
          case _ => VNil
        }
      },
      ts = _.toString,
      order = (a, b) => a.asInstanceOf[java.math.BigInteger]
        .compareTo(b.asInstanceOf[java.math.BigInteger]),
      arith = (op, l, _) => op match {
        case "unm" => bigIntUD(l.asInstanceOf[VUserData].payload
          .asInstanceOf[java.math.BigInteger].negate)
        case other => throw new Lua.LuaError(
          s"bigint: unsupported operator $other")
      })

  /** UUID userdata (shared.LuaUuid): tostring is the canonical form,
    * uuid[0]..uuid[15] read the raw bytes (LuaUuidIndex), equality is
    * byte equality, msgpack encodes as bin16 (LuaUuidMsgpack). */
  def uuidUD(bytes: Array[Byte]): VUserData = {
    require(bytes.length == 16, "uuid needs 16 bytes")
    VUserData("peerdb_uuid", bytes,
      index = (p, k) =>
        if (k.nonEmpty && k.forall(_.isDigit) && k.length <= 2 &&
            k.toInt < 16)
          VInt((p.asInstanceOf[Array[Byte]](k.toInt) & 0xFF).toLong)
        else VNil,
      ts = p => {
        val b = p.asInstanceOf[Array[Byte]]
        val bb = java.nio.ByteBuffer.wrap(b)
        new java.util.UUID(bb.getLong, bb.getLong).toString
      },
      order = (a, b) => java.util.Arrays.compareUnsigned(
        a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]))
  }

  def uuidUD(u: java.util.UUID): VUserData = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits)
    bb.putLong(u.getLeastSignificantBits)
    uuidUD(bb.array)
  }

  /** The two parsed wire images of one change record, each ONE shared
    * RowItems (reference: RecordItems is one map — for an insert,
    * `row` and `new` alias the same items, so a write through one is
    * visible through the other). The adapt stage re-encodes these
    * back into data/matchData after the script ran. */
  private[transform] final case class RecImages(
      dataRow: Option[RowItems], matchRow: Option[RowItems]) {
    /** (row, old, new) views by record type (the LuaRecordIndex
      * dispatch, peerdb.go:481-513): insert row/new = data; update
      * row/new = data and old = match image; delete row/old = the old
      * image riding `data`, new absent. */
    def views(recordType: Int): (Option[RowItems],
        Option[RowItems], Option[RowItems]) = {
      import graft.model.ChangeRecord._
      recordType match {
        case TypeInsert => (dataRow, None, dataRow)
        case TypeUpdate => (dataRow, matchRow, dataRow)
        case TypeDelete => (dataRow, dataRow, None)
        case _ => (None, None, None)
      }
    }
  }

  private[transform] def imagesOf(r: Rec): RecImages =
    RecImages(parseRow(r.data).map(RowItems(_)),
      parseRow(r.matchData).map(RowItems(_)))

  private def kindOf(rt: Int): String = {
    import graft.model.ChangeRecord._
    rt match {
      case TypeInsert => "insert"
      case TypeUpdate => "update"
      case TypeDelete => "delete"
      case TypeRelation => "relation"
      case TypeMessage => "message"
      case _ => "unknown"
    }
  }

  def recordUD(r: Rec): VUserData =
    recordUD(r, () => imagesOf(r))

  private[transform] def recordUD(r: Rec,
      mkImages: () => RecImages): VUserData = {
    // the images parse (and their row userdata) memoize per record:
    // a script touching r.row several times plus json.encode(r.row)
    // must parse the JSON once, not once per access — this is the
    // per-record hot path of the whole script stage
    lazy val imgs = mkImages().views(r.recordType)
    lazy val rowV: V = imgs._1.map(i => rowUD(i)).getOrElse(VNil)
    lazy val oldV: V = imgs._2.map(i => rowUD(i)).getOrElse(VNil)
    lazy val newV: V = imgs._3.map(i => rowUD(i)).getOrElse(VNil)
    VUserData("peerdb_record", r,
      index = (p, k) => {
        val rec = p.asInstanceOf[Rec]
        k match {
          case "kind" => VStr(kindOf(rec.recordType))
          case "row" => rowV
          case "old" => oldV
          case "new" => newV
          case "checkpoint" => VInt(rec.checkpointId)
          case "commit_time" => timeUD(java.time.Instant.ofEpochSecond(
            rec.commitTimeMicros / 1000000L,
            (rec.commitTimeMicros % 1000000L) * 1000L))
          case "transaction_id" => VInt(rec.transactionId)
          case "target" => VStr(rec.destinationTable)
          case "source" => VStr(rec.sourceTable)
          case "unchanged_columns" =>
            if (rec.recordType == graft.model.ChangeRecord.TypeUpdate) {
              val t = new VTable
              rec.unchangedToast.foreach(c =>
                t.set(VStr(c), VBool(true)))
              t
            } else VNil
          case _ => VNil
        }
      },
      ts = _ => "peerdb_record")
  }

  /** The LuaRecordJson table (peerdb.go:552-570): the seven fields +
    * unchanged_columns for updates. Reads through the USERDATA's own
    * index closure, not a rebuilt one — a typed QRep record's row
    * images live in the closure (no JSON `data` to re-parse), and a
    * rebuild would encode its old/new as null. */
  private def recordJsonTable(ud: VUserData, r: Rec): VTable = {
    val t = new VTable
    Seq("kind", "old", "new", "checkpoint", "commit_time",
      "transaction_id", "source").foreach { k =>
      t.set(VStr(k), ud.index(r, k))
    }
    if (r.recordType == graft.model.ChangeRecord.TypeUpdate &&
        r.unchangedToast.nonEmpty) {
      val u = new VTable
      r.unchangedToast.zipWithIndex.foreach { case (c, i) =>
        u.set(VInt(i + 1L), VStr(c))
      }
      t.set(VStr("unchanged_columns"), u)
    }
    t
  }

  // ----------------------------------------------------- environment

  private def native(name: String)(f: Seq[V] => Seq[V]): VNative =
    VNative(name, f)

  private def jsonModule(interp: Lua.Interp): VTable = {
    val t = new VTable
    t.set(VStr("encode"), native("encode")(a =>
      Seq(VStr(jsonEncode(a.headOption.getOrElse(VNil))))))
    t.set(VStr("decode"), native("decode") { a =>
      a.headOption match {
        case Some(VStr(s)) =>
          Seq(scala.util.Try(jsonToLua(mapper.readTree(s)))
            .getOrElse(throw new Lua.LuaError("json.decode: bad input")))
        case _ => throw new Lua.LuaError("json.decode needs a string")
      }
    })
    t
  }

  private def peerdbTable(interp: Lua.Interp): VTable = {
    val t = new VTable
    def rowOf(a: Seq[V]): Vector[(String, V)] = a.headOption match {
      case Some(u: VUserData) if u.tag == "peerdb_row" =>
        u.payload.asInstanceOf[RowItems].cols
      case _ => throw new Lua.LuaError("peerdb: row expected")
    }
    t.set(VStr("RowTable"), native("RowTable") { a =>
      val out = new VTable
      rowOf(a).foreach { case (k, v) => out.set(VStr(k), v) }
      Seq(out)
    })
    t.set(VStr("RowColumns"), native("RowColumns") { a =>
      val out = new VTable
      rowOf(a).zipWithIndex.foreach { case ((k, _), i) =>
        out.set(VInt(i + 1L), VStr(k))
      }
      Seq(out)
    })
    t.set(VStr("RowColumnKind"), native("RowColumnKind") { a =>
      val col = a.lift(1) match {
        case Some(VStr(s)) => s
        case _ => throw new Lua.LuaError("RowColumnKind needs a column")
      }
      Seq(VStr(rowOf(a).toMap.getOrElse(col, VNil) match {
        case _: VInt => "int64"
        case _: VNum => "float64"
        case _: VStr => "string"
        case _: VBool => "bool"
        case _: VTable => "json"
        case _ => "invalid"
      }))
    })
    t.set(VStr("Now"), native("Now")(_ =>
      Seq(timeUD(java.time.Instant.now()))))
    t.set(VStr("UUID"), native("UUID") { a =>
      // LuaUUID (peerdb.go:610-620): no arg = random, string = parse
      a.headOption match {
        case None | Some(VNil) =>
          Seq(uuidUD(java.util.UUID.randomUUID()))
        case Some(VStr(s)) =>
          Seq(try uuidUD(java.util.UUID.fromString(s)) catch {
            case _: IllegalArgumentException =>
              throw new Lua.LuaError(s"invalid UUID '$s'")
          })
        case _ => throw new Lua.LuaError(
          "uuid must be created from string")
      }
    })
    t.set(VStr("Time"), native("Time") { a =>
      // LuaTime (peerdb.go:623-630): no arg = the zero time, number =
      // seconds(.fraction) since the epoch, time passes through
      a.headOption match {
        case None | Some(VNil) =>
          Seq(timeUD(java.time.Instant.parse("0001-01-01T00:00:00Z")))
        case Some(VInt(i)) =>
          Seq(timeUD(java.time.Instant.ofEpochSecond(i)))
        case Some(VNum(d)) =>
          Seq(timeUD(java.time.Instant.ofEpochSecond(d.toLong,
            ((d - d.toLong) * 1e9).toLong)))
        case Some(u: VUserData) if u.tag == "peerdb_time" => Seq(u)
        case _ => throw new Lua.LuaError("peerdb.Time needs a number")
      }
    })
    t.set(VStr("Decimal"), native("Decimal") { a =>
      // LuaParseDecimal → LVAsDecimal (peerdb.go:632-664)
      a.headOption match {
        case Some(VInt(i)) => Seq(decimalUD(
          java.math.BigDecimal.valueOf(i)))
        case Some(VNum(d)) => Seq(decimalUD(
          new java.math.BigDecimal(d.toString)))
        case Some(VStr(s)) =>
          Seq(try decimalUD(new java.math.BigDecimal(s)) catch {
            case _: NumberFormatException => throw new Lua.LuaError(
              s"can't convert '$s' to decimal")
          })
        case Some(u: VUserData) if u.tag == "peerdb_decimal" => Seq(u)
        case Some(u: VUserData) if u.tag == "peerdb_bigint" =>
          Seq(decimalUD(new java.math.BigDecimal(
            u.payload.asInstanceOf[java.math.BigInteger])))
        case other => throw new Lua.LuaError(
          "cannot create decimal from " +
            other.map(_.typeName).getOrElse("no value"))
      }
    })
    t.set(VStr("type"), native("type") { a =>
      // LuaType (peerdb.go:666-673): the Go %T of a userdata payload;
      // anything else returns NOTHING (reads as nil — the test pins
      // `not peerdb.type(0)`)
      a.headOption match {
        case Some(u: VUserData) => Seq(VStr(u.tag match {
          case "peerdb_uuid" => "uuid.UUID"
          case "peerdb_time" => "time.Time"
          case "peerdb_decimal" => "decimal.Decimal"
          case "peerdb_bigint" => "*big.Int"
          case other => other
        }))
        case _ => Nil
      }
    })
    t.set(VStr("tostring"), native("tostring") { a =>
      // LuaToString (peerdb.go:675-682): fmt.Sprint of a userdata
      // payload; non-userdata returns NOTHING
      a.headOption match {
        case Some(u: VUserData) => Seq(VStr(u.ts(u.payload)))
        case _ => Nil
      }
    })
    t.set(VStr("unix_epoch"), timeUD(java.time.Instant.EPOCH))
    t
  }

  /** bit32 (the reference preloads gluabit32, peerdb.go:42): 32-bit
    * unsigned semantics — operands truncate mod 2^32, results are
    * 0..2^32−1. */
  private def bit32Module: VTable = {
    val t = new VTable
    def u32(v: V): Long = (v match {
      case VInt(i) => i
      case VNum(d) => d.toLong
      case other => Lua.tonum(other) match {
        case Some(VInt(i)) => i
        case Some(VNum(d)) => d.toLong
        case _ => throw new Lua.LuaError("bit32: number expected")
      }
    }) & 0xffffffffL
    def fold(name: String, zero: Long, op: (Long, Long) => Long): Unit =
      t.set(VStr(name), native(name)(a =>
        Seq(VInt(a.map(u32).foldLeft(zero)(op) & 0xffffffffL))))
    fold("band", 0xffffffffL, _ & _)
    fold("bor", 0L, _ | _)
    fold("bxor", 0L, _ ^ _)
    t.set(VStr("bnot"), native("bnot")(a =>
      Seq(VInt(~u32(a.headOption.getOrElse(VNil)) & 0xffffffffL))))
    t.set(VStr("lshift"), native("lshift") { a =>
      val n = u32(a.lift(1).getOrElse(VInt(0))).toInt
      Seq(VInt(
        if (n >= 32) 0L
        else (u32(a.headOption.getOrElse(VNil)) << n) & 0xffffffffL))
    })
    t.set(VStr("rshift"), native("rshift") { a =>
      val n = u32(a.lift(1).getOrElse(VInt(0))).toInt
      Seq(VInt(
        if (n >= 32) 0L
        else u32(a.headOption.getOrElse(VNil)) >>> n))
    })
    t
  }

  /** msgpack (the reference preloads gluamsgpack, peerdb.go:44):
    * encode/decode against the PUBLIC msgpack specification
    * (github.com/msgpack/msgpack/blob/master/spec.md), canonical
    * smallest-form encodings. `encode` returns a BYTE string
    * ([[Lua.VBytes]]) — the queue value leg ships it verbatim, so a
    * script can put msgpack payloads on Kafka like the reference's
    * (kafka.go value shaping). Tables with a pure 1..n integer key
    * set encode as arrays, everything else as maps; text strings as
    * str-family (UTF-8), byte strings as bin-family. */
  private def msgpackModule(interp: Lua.Interp): VTable = {
    import java.nio.charset.StandardCharsets.UTF_8
    def fail(msg: String): Nothing = throw new Lua.LuaError(msg)

    def encTo(o: java.io.ByteArrayOutputStream, v: V): Unit = {
      def u8(x: Int): Unit = o.write(x & 0xFF)
      def u16(x: Int): Unit = { u8(x >>> 8); u8(x) }
      def u32(x: Long): Unit = { u16((x >>> 16).toInt); u16(x.toInt) }
      def u64(x: Long): Unit = { u32(x >>> 32); u32(x) }
      v match {
        case VNil => u8(0xC0)
        case VBool(false) => u8(0xC2)
        case VBool(true) => u8(0xC3)
        case VInt(i) =>
          if (i >= 0) {
            if (i < 0x80) u8(i.toInt) // positive fixint
            else if (i <= 0xFF) { u8(0xCC); u8(i.toInt) }
            else if (i <= 0xFFFF) { u8(0xCD); u16(i.toInt) }
            else if (i <= 0xFFFFFFFFL) { u8(0xCE); u32(i) }
            else { u8(0xCF); u64(i) }
          } else {
            if (i >= -32) u8(0xE0 | (i.toInt & 0x1F)) // negative fixint
            else if (i >= -0x80) { u8(0xD0); u8(i.toInt) }
            else if (i >= -0x8000) { u8(0xD1); u16(i.toInt) }
            else if (i >= -0x80000000L) { u8(0xD2); u32(i & 0xFFFFFFFFL) }
            else { u8(0xD3); u64(i) }
          }
        case VNum(d) =>
          u8(0xCB); u64(java.lang.Double.doubleToLongBits(d))
        case VStr(s) =>
          val b = s.getBytes(UTF_8)
          if (b.length < 32) u8(0xA0 | b.length) // fixstr
          else if (b.length <= 0xFF) { u8(0xD9); u8(b.length) }
          else if (b.length <= 0xFFFF) { u8(0xDA); u16(b.length) }
          else { u8(0xDB); u32(b.length.toLong) }
          o.write(b, 0, b.length)
        case bs: Lua.VBytes =>
          val b = bs.b
          if (b.length <= 0xFF) { u8(0xC4); u8(b.length) }
          else if (b.length <= 0xFFFF) { u8(0xC5); u16(b.length) }
          else { u8(0xC6); u32(b.length.toLong) }
          o.write(b, 0, b.length)
        case t: VTable =>
          val n = t.len
          if (t.hash.size == n) { // pure 1..n array (incl. empty)
            if (n < 16) u8(0x90 | n.toInt) // fixarray
            else if (n <= 0xFFFF) { u8(0xDC); u16(n.toInt) }
            else { u8(0xDD); u32(n) }
            var i = 1L
            while (i <= n) { encTo(o, t.get(VInt(i))); i += 1 }
          } else {
            val m = t.hash.size
            if (m < 16) u8(0x80 | m) // fixmap
            else if (m <= 0xFFFF) { u8(0xDE); u16(m) }
            else { u8(0xDF); u32(m.toLong) }
            t.hash.foreach { case (k, x) =>
              encTo(o, k); encTo(o, x)
            }
          }
        case u: VUserData if u.tag == "peerdb_uuid" =>
          // __msgpack = the raw bytes as bin16 (LuaUuidMsgpack,
          // peerdb.go:597-605)
          encTo(o, Lua.VBytes(u.payload.asInstanceOf[Array[Byte]]))
        case u: VUserData if u.tag == "peerdb_row" ||
            u.tag == "peerdb_record" =>
          // the reference installs no __msgpack on rows/records —
          // gluamsgpack rejects them; "peerdb_row" as a string would
          // be silent nonsense on the wire
          fail(s"msgpack.encode: cannot encode a ${u.tag} " +
            "(encode peerdb.RowTable(row) instead)")
        case u: VUserData => encTo(o, VStr(u.ts(u.payload)))
        case other => fail(
          s"msgpack.encode: cannot encode a ${other.typeName}")
      }
    }

    def decode(b: Array[Byte]): V = {
      var p = 0
      def u8(): Int = {
        if (p >= b.length) fail("msgpack.decode: truncated input")
        val x = b(p) & 0xFF; p += 1; x
      }
      def u16(): Int = (u8() << 8) | u8()
      def u32(): Long = (u16().toLong << 16) | u16().toLong
      def u64(): Long = (u32() << 32) | u32()
      def take(n: Int): Array[Byte] = {
        if (n < 0 || p + n > b.length)
          fail("msgpack.decode: truncated input")
        val a = java.util.Arrays.copyOfRange(b, p, p + n); p += n; a
      }
      def str(n: Int): V = VStr(new String(take(n), UTF_8))
      def arr(n: Int): V = {
        val t = new VTable
        var i = 1
        while (i <= n) { t.set(VInt(i.toLong), one()); i += 1 }
        t
      }
      def map(n: Int): V = {
        val t = new VTable
        var i = 0
        while (i < n) { val k = one(); t.set(k, one()); i += 1 }
        t
      }
      def one(): V = {
        val h = u8()
        if (h < 0x80) VInt(h.toLong)
        else if (h >= 0xE0) VInt((h - 0x100).toLong) // negative fixint
        else if ((h & 0xF0) == 0x90) arr(h & 0x0F)
        else if ((h & 0xF0) == 0x80) map(h & 0x0F)
        else if ((h & 0xE0) == 0xA0) str(h & 0x1F)
        else h match {
          case 0xC0 => VNil
          case 0xC2 => VBool(false)
          case 0xC3 => VBool(true)
          case 0xC4 => Lua.VBytes(take(u8()))
          case 0xC5 => Lua.VBytes(take(u16()))
          case 0xC6 => Lua.VBytes(take(u32().toInt))
          case 0xCA => VNum(java.lang.Float.intBitsToFloat(
            u32().toInt).toDouble)
          case 0xCB => VNum(java.lang.Double.longBitsToDouble(u64()))
          case 0xCC => VInt(u8().toLong)
          case 0xCD => VInt(u16().toLong)
          case 0xCE => VInt(u32())
          case 0xCF => VInt(u64()) // >2^63-1 wraps, like a Go uint cast
          case 0xD0 => VInt(u8().toByte.toLong)
          case 0xD1 => VInt(u16().toShort.toLong)
          case 0xD2 => VInt(u32().toInt.toLong)
          case 0xD3 => VInt(u64())
          case 0xD9 => str(u8())
          case 0xDA => str(u16())
          case 0xDB => str(u32().toInt)
          case 0xDC => arr(u16())
          case 0xDD => arr(u32().toInt)
          case 0xDE => map(u16())
          case 0xDF => map(u32().toInt)
          case other => fail(
            f"msgpack.decode: unsupported format 0x$other%02x")
        }
      }
      val out = one()
      if (p != b.length) fail(
        s"msgpack.decode: ${b.length - p} trailing bytes")
      out
    }

    val t = new VTable
    t.set(VStr("encode"), native("encode") { a =>
      val o = new java.io.ByteArrayOutputStream()
      encTo(o, a.headOption.getOrElse(VNil))
      Seq(Lua.VBytes(o.toByteArray))
    })
    t.set(VStr("decode"), native("decode") { a =>
      a.headOption match {
        case Some(bs: Lua.VBytes) => Seq(decode(bs.b))
        case Some(VStr(s)) => Seq(decode(s.getBytes(UTF_8)))
        case other => fail("msgpack.decode: string expected, got " +
          other.map(_.typeName).getOrElse("no value"))
      }
    })
    t
  }

  /** utf8 (the reference preloads gluautf8, peerdb.go:45): the Lua
    * 5.3 utf8 library, semantics per lutf8lib.c — positions are
    * 1-based BYTE indices into the string's UTF-8 image, computed
    * here by encoding the JVM string per call (every text string
    * round-trips; a lone surrogate encodes as the JVM's '?'
    * replacement, same as anywhere else it would leave the JVM). */
  private def utf8Module(interp: Lua.Interp): VTable = {
    import java.nio.charset.StandardCharsets.UTF_8
    def fail(msg: String): Nothing = throw new Lua.LuaError(msg)
    def bytesOf(a: Seq[V], i: Int): Array[Byte] = a.lift(i) match {
      case Some(VStr(s)) => s.getBytes(UTF_8)
      case Some(bs: Lua.VBytes) => bs.b // byte strings ARE strings
      case other => fail("utf8: string expected, got " +
        other.map(_.typeName).getOrElse("no value"))
    }
    def intArg(a: Seq[V], i: Int, dflt: Long): Long = a.lift(i) match {
      case Some(VInt(n)) => n
      case Some(VNum(d)) => d.toLong
      case None | Some(VNil) => dflt
      case other => fail("utf8: number expected, got " +
        other.map(_.typeName).getOrElse("no value"))
    }
    /** string.sub-style relative position (u_posrelat). */
    def relat(pos: Long, len: Int): Long =
      if (pos >= 0) pos
      else if (-pos > len) 0
      else len + pos + 1
    def isCont(b: Byte): Boolean = (b & 0xC0) == 0x80
    /** Decode the char at 0-based `i`; (codepoint, width) or null. */
    def decode(b: Array[Byte], i: Int): (Int, Int) = {
      val b0 = b(i) & 0xFF
      def cont(k: Int): Int = {
        if (i + k >= b.length || !isCont(b(i + k)))
          fail("invalid UTF-8 code")
        b(i + k) & 0x3F
      }
      if (b0 < 0x80) (b0, 1)
      else if ((b0 & 0xE0) == 0xC0) (((b0 & 0x1F) << 6) | cont(1), 2)
      else if ((b0 & 0xF0) == 0xE0)
        (((b0 & 0x0F) << 12) | (cont(1) << 6) | cont(2), 3)
      else if ((b0 & 0xF8) == 0xF0)
        (((b0 & 0x07) << 18) | (cont(1) << 12) | (cont(2) << 6) |
          cont(3), 4)
      else fail("invalid UTF-8 code")
    }
    val t = new VTable
    // the 5.3 constant, byte-for-byte (each byte as one char here)
    t.set(VStr("charpattern"), VStr(
      "\u005b\u0000-\u007f\u00c2-\u00fd\u005d" +
      "\u005b\u0080-\u00bf\u005d*"))
    t.set(VStr("char"), native("char") { a =>
      val sb = new StringBuilder
      a.foreach {
        case VInt(cp) => sb.appendAll(Character.toChars(cp.toInt))
        case VNum(d) => sb.appendAll(Character.toChars(d.toInt))
        case other => fail("utf8.char: number expected, got " +
          other.typeName)
      }
      Seq(VStr(sb.toString))
    })
    t.set(VStr("len"), native("len") { a =>
      val b = bytesOf(a, 0)
      val i = relat(intArg(a, 1, 1), b.length)
      val j = relat(intArg(a, 2, -1), b.length)
      if (i < 1 || i - 1 > b.length) fail("utf8.len: initial " +
        "position out of string")
      if (j > b.length) fail("utf8.len: final position out of string")
      var pos = (i - 1).toInt // 0-based
      var n = 0L
      var bad = -1 // invalid start position (continuation byte)
      while (bad < 0 && pos < j) {
        if (isCont(b(pos))) bad = pos + 1
        else {
          val (_, w) = decode(b, pos)
          n += 1
          pos += w
        }
      }
      // real utf8.len: nil + the failing position on an invalid start
      if (bad >= 0) Seq(Lua.VNil, VInt(bad.toLong)) else Seq(VInt(n))
    })
    t.set(VStr("codepoint"), native("codepoint") { a =>
      val b = bytesOf(a, 0)
      val i = relat(intArg(a, 1, 1), b.length)
      val j = relat(intArg(a, 2, i), b.length)
      if (i < 1) fail("utf8.codepoint: out of bounds")
      if (j > b.length) fail("utf8.codepoint: out of bounds")
      val out = Seq.newBuilder[V]
      var pos = (i - 1).toInt
      while (pos < j) {
        val (cp, w) = decode(b, pos)
        out += VInt(cp.toLong)
        pos += w
      }
      out.result()
    })
    t.set(VStr("offset"), native("offset") { a =>
      val b = bytesOf(a, 0)
      var n = intArg(a, 1, 0)
      val len = b.length
      var posi = relat(intArg(a, 2, if (n >= 0) 1 else len + 1L),
        len).toInt - 1 // 0-based
      if (posi < 0 || posi > len) fail("utf8.offset: position out " +
        "of range")
      if (n == 0) {
        while (posi > 0 && isCont(b(posi))) posi -= 1
        Seq(VInt(posi + 1L))
      } else {
        if (posi < len && isCont(b(posi)))
          fail("initial position is a continuation byte")
        if (n < 0) {
          while (n < 0 && posi > 0) {
            posi -= 1
            while (posi > 0 && isCont(b(posi))) posi -= 1
            n += 1
          }
        } else {
          n -= 1 // the 1st character is AT posi
          while (n > 0 && posi < len) {
            posi += 1
            while (posi < len && isCont(b(posi))) posi += 1
            n -= 1
          }
        }
        if (n == 0) Seq(VInt(posi + 1L)) else Seq(Lua.VNil)
      }
    })
    t.set(VStr("codes"), native("codes") { a =>
      val b = bytesOf(a, 0)
      val s = a.headOption.getOrElse(Lua.VNil)
      val iter = native("codes_iter") { args =>
        var pos = intArg(args, 1, 0).toInt // previous char position
        if (pos > 0) { // advance past the previous char
          pos += 1
          while (pos <= b.length && isCont(b(pos - 1))) pos += 1
        } else pos = 1
        if (pos > b.length) Seq(Lua.VNil)
        else {
          if (isCont(b(pos - 1))) fail("invalid UTF-8 code")
          val (cp, _) = decode(b, pos - 1)
          Seq(VInt(pos.toLong), VInt(cp.toLong))
        }
      }
      Seq(iter, s, VInt(0L))
    })
    t
  }

  /** Fresh sandboxed environment with the peerdb surface + the json,
    * bit32, utf8 and msgpack modules preloaded under `require` — the
    * reference's full preload set (peerdb.go:42-45). msgpack payloads
    * ride [[Lua.VBytes]] byte strings, which the queue value leg
    * ships verbatim. */
  def env(interp: Lua.Interp,
      printSink: String => Unit = _ => (),
      /** `require "name"` beyond the builtins resolves lua SOURCE from
        * here — the snapshot of the scripts catalog that rides to
        * executors (the reference's LoadPeerdbScript reads the catalog
        * per require, peerdb.go:122-147). */
      libs: Map[String, String] = Map.empty): Lua.Env = {
    val g = Lua.baseEnv(interp,
      modules = Map("json" -> jsonModule(interp),
        "bit32" -> bit32Module,
        "utf8" -> utf8Module(interp),
        "msgpack" -> msgpackModule(interp)),
      printSink = printSink,
      loader = libs.get)
    g.define("peerdb", peerdbTable(interp))
    g
  }
}

/** Distributed execution of a queue-routing script over a WAL batch:
  * one interpreter per Spark partition (the reference's LuaPool keeps
  * one LState per worker the same way, kafka.go:239-248 /
  * utils/lua.go LuaPool), records flowing through `onRecord` without
  * ever collecting to the driver. */
object LuaQueue {
  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types._

  private val shapedSchema = StructType(Seq(
    StructField("topic", StringType),
    StructField("key", StringType),
    // BYTES: a text value travels as its UTF-8 image, a msgpack
    // (VBytes) payload verbatim — a StringType column would mangle
    // bytes >0x7F at the UTF-8 boundary
    StructField("value", BinaryType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType))))),
    // the script's explicit partition assignment (kafka.go:192-197
    // sets kgo.Record.Partition; absent reads as 0 like LVAsNumber
    // on nil) — honored by the Kafka sink under partitioner=manual
    StructField("partition", IntegerType, nullable = false),
    // the zero-padded checkpoint: per-key publish order for the
    // ordered destinations (Pub/Sub)
    StructField("__ord", StringType)))

  /** WAL batch → shaped queue records via the script's `onRecord`.
    * Output: (topic, key, value, headers, partition, __ord). Only
    * change records flow (type ≤ delete), like the reference's record
    * channel. */
  def records(batch: DataFrame, script: String,
      libs: Map[String, String] = Map.empty,
      /** per-flow setting overrides (FlowConnectionConfigs.env) —
        * queue.parallelism resolves env-first like dynLookup */
      env: Map[String, String] = Map.empty): DataFrame = {
    val compiled = new LuaQueueScript(script, libs)
    val cols = Seq("recordType", "checkpointId", "commitTimeMicros",
      "transactionId", "sourceTable", "destinationTable", "data",
      "matchData", "unchangedToastColumns")
    val enc = org.apache.spark.sql.Encoders.row(shapedSchema)
    val selected = batch
      .filter(col("recordType") <= graft.model.ChangeRecord.TypeDelete)
      .select(cols.map(col): _*)
    // per-record interpretation parallelizes per PARTITION (one
    // interpreter each) — a batch that arrives as a single scan
    // partition (one small WAL file; a 2 MB parquet at 128 MB
    // maxPartitionBytes) would otherwise interpret single-threaded
    // while every other core idles; queue.parallelism caps wide
    // batches like the reference's LuaPool size
    val spread = LuaParallelism.spread(selected, env)
    spread
      .mapPartitions { it =>
        val runner = new compiled.PartitionRunner
        it.flatMap { r =>
          val rec = LuaRecordEnv.Rec(
            r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getString(4), r.getString(5), r.getString(6),
            r.getString(7),
            Option(r.getSeq[String](8)).getOrElse(Nil))
          val ord = "%019d".format(rec.checkpointId)
          runner.onRecord(rec).map { sh =>
            Row(sh.topic, sh.key, sh.value,
              if (sh.headers.isEmpty) null
              else sh.headers.map { case (k, v) =>
                Row(k, v.getBytes(
                  java.nio.charset.StandardCharsets.UTF_8))
              },
              sh.partition,
              ord)
          }
        }
      }(enc)
  }

  /** The reference's no-script queue default (utils/lua.go:82
    * DefaultOnRecord): every record publishes as json.encode(record)
    * — kind/old/new/checkpoint/commit_time/transaction_id/source —
    * to the destination-table topic, no key. */
  val DefaultOnRecordScript: String =
    """local json = require "json"
      |function onRecord(r) return json.encode(r) end""".stripMargin

  /** QRep increment → shaped queue records: each pulled TYPED row
    * wraps as an InsertRecord and passes through the script's
    * `onRecord` (kafka/qrep.go:57-99 — the same Lua pool the CDC
    * mirror uses, fed from the pull stream). Output schema matches
    * [[records]]; `__ord` is a per-partition sequence (QRep rows
    * carry no checkpoint — ordering keys, when a script assigns
    * them, get partition-stable publish order). Distribution: one
    * interpreter per partition, no driver collect. */
  def typedRecords(df: DataFrame, script: String,
      sourceTable: String, destTable: String,
      libs: Map[String, String] = Map.empty,
      env: Map[String, String] = Map.empty): DataFrame = {
    val compiled = new LuaQueueScript(script, libs)
    val enc = org.apache.spark.sql.Encoders.row(shapedSchema)
    val fields = df.schema.fields
    val spread = LuaParallelism.spread(df, env)
    spread.mapPartitions { it =>
      val runner = new compiled.PartitionRunner
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var seq = 0L
      it.flatMap { r =>
        val cols = Vector.newBuilder[(String, Lua.V)]
        var i = 0
        while (i < fields.length) {
          cols += (fields(i).name -> LuaRowTransform.luaOf(r.get(i)))
          i += 1
        }
        seq += 1
        val ord = f"$pid%05d-$seq%014d"
        runner.onTypedRow(cols.result(), sourceTable, destTable)
          .map { sh =>
            Row(sh.topic, sh.key, sh.value,
              if (sh.headers.isEmpty) null
              else sh.headers.map { case (k, v) =>
                Row(k, v.getBytes(
                  java.nio.charset.StandardCharsets.UTF_8))
              },
              sh.partition,
              ord)
          }
      }
    }(enc)
  }
}

/** A compiled queue-routing script: the reference's `onRecord`
  * contract (kafka.go:340-390, pubsub.go:102-140) — the function is
  * called once per change record and each returned value becomes a
  * queue record: `nil` drops, a string is a value-only record, a
  * table carries {key, value, topic, partition, headers}; an empty
  * topic defaults to the record's destination table (kafka.go:
  * 376-378). Serializable: executors re-interpret the SOURCE per
  * partition (the reference's LuaPool builds one LState per worker
  * the same way). */
final class LuaQueueScript(val source: String,
    val libs: Map[String, String] = Map.empty) extends Serializable {

  /** One shaped queue record. `value` is BYTES — a text return ships
    * its UTF-8 image, a [[Lua.VBytes]] (msgpack.encode output) ships
    * verbatim, exactly the reference's LVAsReadOnlyBytes value leg
    * (kafka.go:183-186). */
  final case class Shaped(topic: String, key: String,
      value: Array[Byte], partition: Int,
      headers: Seq[(String, String)])

  @transient private lazy val ast = Lua.parse(source)

  /** Build a fresh interpreter + env and run the chunk (defines
    * onRecord). Returns (interp, env, onRecord). */
  private def boot(): (Lua.Interp, Lua.Env, Lua.V) = {
    val interp = new Lua.Interp()
    val g = LuaRecordEnv.env(interp, libs = libs)
    interp.run(ast, g)
    val fn = g.lookup("onRecord").getOrElse(Lua.VNil)
    fn match {
      case _: Lua.VFunc | _: Lua.VNative => ()
      case other => throw new Lua.LuaError(
        s"script should define `onRecord` as function, not " +
          other.typeName)
    }
    (interp, g, fn)
  }

  /** DDL-time validation: parse AND run the chunk, requiring a
    * callable global `onRecord` (kafka.go:352-356's check, moved to
    * CREATE time like the SQL-script parse check). */
  def validate(): Unit = { boot(); () }

  /** Per-partition executor: call with each record, collect shaped
    * outputs. */
  final class PartitionRunner {
    private val (interp, _, fn) = boot()
    def onRecord(rec: LuaRecordEnv.Rec): Seq[Shaped] =
      shape(interp.call(fn, Seq(LuaRecordEnv.recordUD(rec))),
        rec.destinationTable)

    /** The QRep leg (kafka/qrep.go:57-99, pubsub/qrep.go:67-110):
      * each pulled TYPED row wraps as an InsertRecord — checkpoint 0,
      * zero commit time, source = the watermark table — and passes
      * through the same `onRecord`. The row images ride the typed
      * Lua bridge ([[LuaRowTransform.luaOf]]), not a JSON re-parse,
      * so decimals/timestamps reach the script as real userdata. */
    def onTypedRow(cols: Vector[(String, Lua.V)], sourceTable: String,
        destinationTable: String): Seq[Shaped] = {
      val rec = LuaRecordEnv.Rec(graft.model.ChangeRecord.TypeInsert,
        0L, 0L, 0L, sourceTable, destinationTable, null, null, Nil)
      val items = LuaRecordEnv.RowItems(cols)
      val ud = LuaRecordEnv.recordUD(rec,
        () => LuaRecordEnv.RecImages(Some(items), None))
      shape(interp.call(fn, Seq(ud)), destinationTable)
    }

    private def shape(results: Seq[Lua.V],
        destTable: String): Seq[Shaped] = {
      def valueBytes(v: Lua.V): Array[Byte] = v match {
        case Lua.VNil => null
        case bs: Lua.VBytes => bs.b // msgpack payloads verbatim
        case other => Lua.tostr(other).getBytes(
          java.nio.charset.StandardCharsets.UTF_8)
      }
      results.flatMap {
        case Lua.VNil => None
        case Lua.VStr(s) =>
          Some(Shaped(destTable, null, valueBytes(Lua.VStr(s)),
            0, Nil))
        case bs: Lua.VBytes =>
          Some(Shaped(destTable, null, bs.b, 0, Nil))
        case t: Lua.VTable =>
          def strOf(k: String): String = t.get(Lua.VStr(k)) match {
            case Lua.VNil => null
            case v => Lua.tostr(v)
          }
          val topic = Option(strOf("topic"))
            .filter(_.nonEmpty).getOrElse(destTable)
          val partition = t.get(Lua.VStr("partition")) match {
            case Lua.VInt(i) => i.toInt
            case Lua.VNum(d) => d.toInt
            case _ => 0
          }
          val headers = t.get(Lua.VStr("headers")) match {
            case h: Lua.VTable =>
              h.hash.toSeq.map { case (k, v) =>
                Lua.tostr(k) -> Lua.tostr(v)
              }
            case Lua.VNil => Nil
            case other => throw new Lua.LuaError(
              "invalid headers, must be nil or table: " +
                other.typeName)
          }
          Some(Shaped(topic, strOf("key"),
            valueBytes(t.get(Lua.VStr("value"))), partition, headers))
        case other => throw new Lua.LuaError(
          s"script returned invalid value: ${other.typeName}")
      }
    }
  }
}
