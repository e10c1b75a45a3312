package graft.transform

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** The QRep leg of the reference's Lua script surface
  * (flow/activities/flowable.go:756-771 + pua/stream_adapter.go
  * `AttachToStream`): a QRep mirror's `script` may define
  * `transformRow(row)`, called once per pulled row; the script
  * mutates TYPED column values in place, and after the call each
  * SCHEMA field is re-read from the row — added columns are ignored
  * and the output schema is exactly the input schema, matching the
  * reference's `record[i] = row.GetColumnValue(field.Name)` loop.
  *
  * Unlike the CDC adapt stage (JSON images, [[LuaAdapt]]), QRep rows
  * carry real Spark types, so this bridge maps both ways: integral →
  * Lua's exact integers, floating → numbers, DECIMAL → the
  * shopspring-shaped decimal userdata, TIMESTAMP/DATE → time
  * userdata, BINARY → byte strings, ARRAY/MAP/STRUCT → tables.
  * Distributed like [[LuaQueue]]: one interpreter per partition.
  */
object LuaRowTransform {

  import Lua.{V, VNil, VBool, VInt, VNum, VStr, VBytes, VTable,
    VUserData, LuaError}

  /** Spark external value → Lua value (type-directed by the value —
    * the schema only matters on the way back). */
  def luaOf(v: Any): V = v match {
    case null => VNil
    case b: java.lang.Boolean => VBool(b)
    case i: java.lang.Integer => VInt(i.longValue)
    case l: java.lang.Long => VInt(l)
    case s: java.lang.Short => VInt(s.longValue)
    case b: java.lang.Byte => VInt(b.longValue)
    case f: java.lang.Float => VNum(f.doubleValue)
    case d: java.lang.Double => VNum(d)
    case s: String => VStr(s)
    case d: java.math.BigDecimal => LuaRecordEnv.decimalUD(d)
    case d: scala.math.BigDecimal => LuaRecordEnv.decimalUD(d.bigDecimal)
    case t: java.sql.Timestamp => LuaRecordEnv.timeUD(t.toInstant)
    case i: java.time.Instant => LuaRecordEnv.timeUD(i)
    // TIMESTAMP_NTZ: wall-clock-free reading pins UTC, matching the
    // engine's session-timezone posture
    case l: java.time.LocalDateTime => LuaRecordEnv.timeUD(
      l.toInstant(java.time.ZoneOffset.UTC))
    case d: java.sql.Date => LuaRecordEnv.timeUD(
      java.time.Instant.ofEpochSecond(d.toLocalDate.toEpochDay * 86400L))
    case d: java.time.LocalDate => LuaRecordEnv.timeUD(
      java.time.Instant.ofEpochSecond(d.toEpochDay * 86400L))
    case b: Array[Byte] => new VBytes(b)
    case seq: scala.collection.Seq[_] =>
      val t = new VTable
      seq.zipWithIndex.foreach { case (x, i) =>
        t.set(VInt(i + 1L), luaOf(x))
      }
      t
    case m: scala.collection.Map[_, _] =>
      val t = new VTable
      m.foreach { case (k, x) => t.set(luaOf(k), luaOf(x)) }
      t
    case r: Row =>
      val t = new VTable
      val sch = r.schema
      if (sch != null)
        sch.fields.zipWithIndex.foreach { case (f, i) =>
          t.set(VStr(f.name), luaOf(r.get(i)))
        }
      else (0 until r.length).foreach(i =>
        t.set(VInt(i + 1L), luaOf(r.get(i))))
      t
    case other => throw new LuaError(
      s"qrep transform: unsupported source value ${other.getClass}")
  }

  /** Lua value → Spark external value of the target column type —
    * strict where a silent coercion would corrupt (no string→number
    * guessing), exact where Lua's model allows it. */
  def sparkOf(v: V, dt: DataType, col: String): Any = {
    def fail(): Nothing = throw new LuaError(
      s"qrep transform: cannot convert ${v.typeName} to $dt " +
        s"for column '$col'")
    v match {
      case VNil => null
      case VBool(b) => dt match {
        case BooleanType => b
        case StringType => if (b) "true" else "false"
        case _ => fail()
      }
      case VInt(i) => dt match {
        case LongType => i
        case IntegerType => i.toInt
        case ShortType => i.toShort
        case ByteType => i.toByte
        case DoubleType => i.toDouble
        case FloatType => i.toFloat
        case _: DecimalType => java.math.BigDecimal.valueOf(i)
        case StringType => i.toString
        case _ => fail()
      }
      case VNum(d) => dt match {
        case DoubleType => d
        case FloatType => d.toFloat
        case LongType =>
          if (d == math.rint(d)) d.toLong else fail()
        case IntegerType =>
          if (d == math.rint(d)) d.toInt else fail()
        case _: DecimalType => new java.math.BigDecimal(d.toString)
        case StringType => Lua.tostr(v)
        case _ => fail()
      }
      case VStr(s) => dt match {
        case StringType => s
        case BinaryType =>
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case _ => fail()
      }
      case bs: VBytes => dt match {
        case BinaryType => bs.b
        case StringType => bs.latin1
        case _ => fail()
      }
      case u: VUserData if u.tag == "peerdb_decimal" =>
        val bd = u.payload.asInstanceOf[java.math.BigDecimal]
        dt match {
          case t: DecimalType =>
            bd.setScale(t.scale, java.math.RoundingMode.HALF_UP)
          case DoubleType => bd.doubleValue
          case LongType => bd.toBigInteger.longValueExact
          case StringType => bd.stripTrailingZeros.toPlainString
          case _ => fail()
        }
      case u: VUserData if u.tag == "peerdb_time" =>
        val inst = u.payload.asInstanceOf[java.time.Instant]
        dt match {
          case TimestampType => java.sql.Timestamp.from(inst)
          case TimestampNTZType => java.time.LocalDateTime
            .ofInstant(inst, java.time.ZoneOffset.UTC)
          case DateType => java.sql.Date.valueOf(
            java.time.LocalDateTime
              .ofInstant(inst, java.time.ZoneOffset.UTC).toLocalDate)
          case LongType => inst.getEpochSecond * 1000000L +
            inst.getNano / 1000L // epoch micros, the engine's canon
          case StringType => Lua.tostr(u)
          case _ => fail()
        }
      case t: VTable => dt match {
        case ArrayType(et, _) =>
          (1L to t.len).map(i => sparkOf(t.get(VInt(i)), et, col))
        case MapType(StringType, vt, _) =>
          t.hash.collect { case (VStr(k), x) =>
            k -> sparkOf(x, vt, col)
          }.toMap
        case st: StructType =>
          Row.fromSeq(st.fields.toSeq.map(f =>
            sparkOf(t.get(VStr(f.name)), f.dataType, s"$col.${f.name}")))
        case _ => fail()
      }
      case _ => fail()
    }
  }

  /** Pulled increment → the SAME schema with each row passed through
    * the script's `transformRow`. Rows the script didn't write to are
    * returned as-is (zero conversion cost on the way back). */
  def rows(df: DataFrame, script: String,
      libs: Map[String, String] = Map.empty,
      env: Map[String, String] = Map.empty): DataFrame = {
    val compiled = new LuaRowScript(script, libs)
    val schema = df.schema
    val spread = LuaParallelism.spread(df, env)
    spread.mapPartitions { it =>
      val runner = new compiled.PartitionRunner(schema)
      it.map(runner.transform)
    }(Encoders.row(schema))
  }
}

/** A compiled `transformRow` script for typed QRep rows. Serializable
  * like [[LuaQueueScript]]: executors re-interpret the SOURCE per
  * partition. */
final class LuaRowScript(val source: String,
    val libs: Map[String, String] = Map.empty) extends Serializable {

  @transient private lazy val ast = Lua.parse(source)

  private def boot(): (Lua.Interp, Lua.V) = {
    val interp = new Lua.Interp()
    val g = LuaRecordEnv.env(interp, libs = libs)
    interp.run(ast, g)
    val fn = g.lookup("transformRow").getOrElse(Lua.VNil)
    fn match {
      case _: Lua.VFunc | _: Lua.VNative => ()
      case other => throw new Lua.LuaError(
        "script should define `transformRow` as function, not " +
          other.typeName)
    }
    (interp, fn)
  }

  /** DDL-time validation (the flowable.go:760 lookup, moved to
    * CREATE time). */
  def validate(): Unit = { boot(); () }

  final class PartitionRunner(schema: StructType) {
    private val (interp, fn) = boot()
    private val fields = schema.fields

    def transform(r: Row): Row = {
      val cols = Vector.newBuilder[(String, Lua.V)]
      var i = 0
      while (i < fields.length) {
        cols += (fields(i).name -> LuaRowTransform.luaOf(r.get(i)))
        i += 1
      }
      val items = LuaRecordEnv.RowItems(cols.result())
      interp.call(fn, Seq(LuaRecordEnv.rowUD(items)))
      if (!items.isDirty) r
      else Row.fromSeq(fields.toSeq.map(f =>
        LuaRowTransform.sparkOf(items.get(f.name), f.dataType, f.name)))
    }
  }
}
