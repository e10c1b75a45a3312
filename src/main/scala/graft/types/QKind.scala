package graft.types

import org.apache.spark.sql.types._

/** Universal type system: the Spark restatement of the reference's QValueKind
  * (see /root/reference/flow/shared/types/kind.go:9-67 and
  * /root/reference/flow/shared/types/qvalue.go). Every source column is
  * classified into a `QKind`; `toSpark` gives the engine-internal Catalyst
  * type, and the DDL maps give sink column types for warehouse targets
  * (mirrors QValueKindToSnowflakeTypeMap / QValueKindToClickHouseTypeMap,
  * kind.go:73-170).
  *
  * Design notes (Spark-first, not a port):
  *   - values never live in a per-cell tagged union; rows are Tungsten
  *     `InternalRow`s under a `StructType` derived from these kinds.
  *   - kinds exist only at the boundary (source decode, sink DDL, clamping
  *     policy); inside the engine everything is plain Catalyst types so
  *     whole-stage codegen applies.
  */
sealed trait QKind {
  /** Engine-internal Catalyst type. */
  def toSpark: DataType
  /** Name as it appears in mirror configs (stable identifier). */
  def name: String
}

object QKind {
  case object QBool extends QKind { val toSpark = BooleanType; val name = "bool" }
  case object QInt8 extends QKind { val toSpark = ByteType; val name = "int8" }
  case object QInt16 extends QKind { val toSpark = ShortType; val name = "int16" }
  case object QInt32 extends QKind { val toSpark = IntegerType; val name = "int32" }
  case object QInt64 extends QKind { val toSpark = LongType; val name = "int64" }
  // unsigned ints widen to the next signed type; uint64 needs DECIMAL(20,0)
  // (kind.go:18-21, MySQL sources).
  case object QUInt8 extends QKind { val toSpark = ShortType; val name = "uint8" }
  case object QUInt16 extends QKind { val toSpark = IntegerType; val name = "uint16" }
  case object QUInt32 extends QKind { val toSpark = LongType; val name = "uint32" }
  case object QUInt64 extends QKind { val toSpark = DecimalType(20, 0); val name = "uint64" }
  // 256-bit ints (ClickHouse) carry as 32-byte binary (avro fixed in the
  // reference, avro_converter.go:102-104).
  case object QInt256 extends QKind { val toSpark = BinaryType; val name = "int256" }
  case object QUInt256 extends QKind { val toSpark = BinaryType; val name = "uint256" }
  case object QFloat32 extends QKind { val toSpark = FloatType; val name = "float32" }
  case object QFloat64 extends QKind { val toSpark = DoubleType; val name = "float64" }
  /** numeric with typmod; unbounded → (38,18) mirroring
    * GetNumericDestinationType (flow/model/qvalue/kind.go:23-40). */
  final case class QNumeric(precision: Int = 38, scale: Int = 18) extends QKind {
    val toSpark = DecimalType(precision min DecimalType.MAX_PRECISION, scale)
    val name = s"numeric($precision,$scale)"
  }
  case object QString extends QKind { val toSpark = StringType; val name = "string" }
  case object QQChar extends QKind { val toSpark = StringType; val name = "qchar" }
  case object QEnum extends QKind { val toSpark = StringType; val name = "enum" }
  case object QTimestamp extends QKind { val toSpark = TimestampNTZType; val name = "timestamp" }
  case object QTimestampTZ extends QKind { val toSpark = TimestampType; val name = "timestamptz" }
  case object QDate extends QKind { val toSpark = DateType; val name = "date" }
  /** time-of-day held as micros-of-day Long; the reference stores durations
    * that may exceed 24h ("extended time",
    * clickhouse/normalize_query.go:377-397) — a Long carries those too. */
  case object QTime extends QKind { val toSpark = LongType; val name = "time" }
  case object QTimeTZ extends QKind { val toSpark = LongType; val name = "timetz" }
  /** intervals render to ISO-8601 strings (kind.go:94). */
  case object QInterval extends QKind { val toSpark = StringType; val name = "interval" }
  case object QBytes extends QKind { val toSpark = BinaryType; val name = "bytes" }
  case object QUuid extends QKind { val toSpark = StringType; val name = "uuid" }
  case object QJson extends QKind { val toSpark = StringType; val name = "json" }
  case object QJsonb extends QKind { val toSpark = StringType; val name = "jsonb" }
  /** hstore normalizes to a JSON object string (record_items.go:131-146). */
  case object QHstore extends QKind { val toSpark = StringType; val name = "hstore" }
  // PostGIS values carry as WKT strings (qvalue_convert.go WKB→WKT).
  case object QGeometry extends QKind { val toSpark = StringType; val name = "geometry" }
  case object QGeography extends QKind { val toSpark = StringType; val name = "geography" }
  case object QPoint extends QKind { val toSpark = StringType; val name = "point" }
  case object QCidr extends QKind { val toSpark = StringType; val name = "cidr" }
  case object QInet extends QKind { val toSpark = StringType; val name = "inet" }
  case object QMacaddr extends QKind { val toSpark = StringType; val name = "macaddr" }
  /** 1-D arrays of any scalar kind (kind.go:51-66). */
  final case class QArray(elem: QKind) extends QKind {
    val toSpark = ArrayType(elem.toSpark, containsNull = true)
    val name = s"array_${elem.name}"
  }

  val scalarKinds: Seq[QKind] = Seq(
    QBool, QInt8, QInt16, QInt32, QInt64, QUInt8, QUInt16, QUInt32, QUInt64,
    QInt256, QUInt256, QFloat32, QFloat64, QNumeric(), QString, QQChar, QEnum,
    QTimestamp, QTimestampTZ, QDate, QTime, QTimeTZ, QInterval, QBytes, QUuid,
    QJson, QJsonb, QHstore, QGeometry, QGeography, QPoint, QCidr, QInet,
    QMacaddr)

  /** Parse the stable name back to a kind (mirror-config round trip). */
  def fromName(n: String): QKind = n match {
    case s if s.startsWith("array_") => QArray(fromName(s.stripPrefix("array_")))
    case s if s.startsWith("numeric(") =>
      val Array(p, sc) = s.stripPrefix("numeric(").stripSuffix(")").split(",")
      QNumeric(p.trim.toInt, sc.trim.toInt)
    case "numeric" => QNumeric()
    case other =>
      scalarKinds.find(_.name == other).getOrElse(
        throw new IllegalArgumentException(s"unknown QKind: $other"))
  }

  /** Classify a Catalyst type back into the kind used for sink DDL decisions
    * (lossy: strings fold to QString). */
  def fromSpark(dt: DataType): QKind = dt match {
    case BooleanType => QBool
    case ByteType => QInt8
    case ShortType => QInt16
    case IntegerType => QInt32
    case LongType => QInt64
    case FloatType => QFloat32
    case DoubleType => QFloat64
    case d: DecimalType => QNumeric(d.precision, d.scale)
    case StringType => QString
    case TimestampNTZType => QTimestamp
    case TimestampType => QTimestampTZ
    case DateType => QDate
    case BinaryType => QBytes
    case ArrayType(e, _) => QArray(fromSpark(e))
    case other => throw new IllegalArgumentException(s"unmapped: $other")
  }

  /** Sink DDL type for a generic ANSI warehouse target (the shape of
    * ToDWHColumnType, flow/model/qvalue/kind.go:55-114). */
  def toAnsiDdl(k: QKind): String = k match {
    case QBool => "BOOLEAN"
    case QInt8 | QInt16 => "SMALLINT"
    case QInt32 | QUInt8 | QUInt16 => "INTEGER"
    case QInt64 | QUInt32 => "BIGINT"
    case QUInt64 => "DECIMAL(20,0)"
    case QNumeric(p, s) => s"DECIMAL($p,$s)"
    case QFloat32 => "REAL"
    case QFloat64 => "DOUBLE PRECISION"
    case QTimestamp => "TIMESTAMP"
    case QTimestampTZ => "TIMESTAMP WITH TIME ZONE"
    case QDate => "DATE"
    case QTime | QTimeTZ => "BIGINT" // micros-of-day
    case QBytes | QInt256 | QUInt256 => "VARBINARY"
    case QArray(e) => s"${toAnsiDdl(e)} ARRAY"
    case _ => "VARCHAR" // string-carried kinds: json, uuid, geo, net, interval
  }
}
