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
  /** numeric with typmod; (0,0) = UNBOUNDED (typmod absent, the
    * reference's typmod == -1) — carried internally as (38,18) mirroring
    * GetNumericDestinationType (flow/model/qvalue/kind.go:23-40), but
    * remembered as unbounded for dialect DDL (ClickHouse maps it to
    * String when `numeric_as_string`). */
  final case class QNumeric(precision: Int = 0, scale: Int = 0) extends QKind {
    def isUnbounded: Boolean = precision == 0 && scale == 0
    // Lazy + clamped: PG permits scale > precision (and both beyond 38),
    // which Spark's DecimalType cannot carry — the DECLARED values still
    // drive dialect DDL, only the Catalyst carrier clamps.
    lazy val toSpark =
      if (isUnbounded) DecimalType(38, 18)
      else {
        val p = precision min DecimalType.MAX_PRECISION
        DecimalType(p, scale min p)
      }
    val name = if (isUnbounded) "numeric" else s"numeric($precision,$scale)"
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

  // ------------------------------------------------- per-warehouse DDL maps

  /** Destination dialects of ToDWHColumnType
    * (flow/model/qvalue/kind.go:55-114). */
  sealed trait Dialect
  object Dialect {
    case object Ansi extends Dialect
    case object Snowflake extends Dialect
    case object ClickHouse extends Dialect
    case object BigQuery extends Dialect
    val all: Seq[Dialect] = Seq(Ansi, Snowflake, ClickHouse, BigQuery)
    def fromName(n: String): Dialect = n.toLowerCase match {
      case "ansi" | "postgres" => Ansi
      case "snowflake" => Snowflake
      case "clickhouse" => ClickHouse
      case "bigquery" => BigQuery
      case other =>
        throw new IllegalArgumentException(s"unknown dialect: $other")
    }
  }

  /** Warehouse numeric compatibility (flow/shared/datatypes/numeric.go):
    * precision/scale clamp to the destination's limits; out-of-range
    * falls back to the destination default. */
  private final case class NumCompat(maxP: Int, maxS: Int, defP: Int,
      defS: Int) {
    def resolve(p: Int, s: Int): (Int, Int) = {
      if (p == 0 && s == 0) return (defP, defS) // unbounded
      val cp = if (p > maxP) maxP else p
      if (s > maxS) (defP, defS)
      // PG permits scale > precision (numeric(5,10)); warehouses reject
      // it — clamp like the Catalyst carrier does.
      else (cp, s min cp)
    }
  }
  private val SnowflakeNum = NumCompat(38, 37, 38, 20)
  private val BigQueryNum = NumCompat(38, 20, 38, 20)
  private val ClickHouseNum = NumCompat(76, 76, 76, 38)

  /** Dialect-correct sink column DDL — the port of
    * QValueKindToSnowflakeTypeMap / QValueKindToClickHouseTypeMap
    * (flow/shared/types/kind.go:73-170), qValueKindToBigQueryType
    * (flow/connectors/bigquery/qvalue_convert.go:13-90) and the numeric
    * warehouse rules (GetNumericDestinationType,
    * flow/model/qvalue/kind.go:18-53; datatypes/numeric.go).
    *
    * @param nullable           ClickHouse wraps `Nullable(...)` (arrays
    *                           excepted); Snowflake/BigQuery/ANSI append
    *                           `NOT NULL` when false.
    * @param chNumericAsString  the `unboundedNumericAsString` env rule:
    *                           unbounded numerics land as CH String
    *                           (precision > 76 always does).
    */
  def toDdl(k: QKind, dialect: Dialect, nullable: Boolean = true,
      chNumericAsString: Boolean = false): String = dialect match {
    case Dialect.Ansi =>
      toAnsiDdl(k) + (if (nullable) "" else " NOT NULL")
    case Dialect.Snowflake =>
      val t = k match {
        case QNumeric(p, s) =>
          val (rp, rs) = SnowflakeNum.resolve(p, s)
          s"NUMERIC($rp,$rs)"
        case QBool => "BOOLEAN"
        case QInt8 | QInt16 | QInt32 | QInt64 | QUInt8 | QUInt16 |
            QUInt32 | QUInt64 => "INTEGER"
        case QFloat32 | QFloat64 => "FLOAT"
        case QQChar => "CHAR"
        case QJson | QJsonb | QHstore | QInterval => "VARIANT"
        case QTimestamp => "TIMESTAMP_NTZ"
        case QTimestampTZ => "TIMESTAMP_TZ"
        case QTime | QTimeTZ => "TIME"
        case QDate => "DATE"
        case QBytes => "BINARY"
        case QGeography => "GEOGRAPHY"
        case QGeometry | QPoint => "GEOMETRY"
        case QArray(_) => "VARIANT"
        case _ => "STRING" // string/enum/uuid/net kinds and the catch-all
      }
      t + (if (nullable) "" else " NOT NULL")
    case Dialect.ClickHouse =>
      def scalar(s: QKind): String = s match {
        case QNumeric(p, _) if p > 76 => "String"
        case n @ QNumeric(_, _) if n.isUnbounded && chNumericAsString =>
          "String"
        case QNumeric(p, s2) =>
          val (rp, rs) = ClickHouseNum.resolve(p, s2)
          s"Decimal($rp, $rs)"
        case QBool => "Bool"
        case QInt8 => "Int8"
        case QInt16 => "Int16"
        case QInt32 => "Int32"
        case QInt64 => "Int64"
        case QInt256 => "Int256"
        case QUInt8 => "UInt8"
        case QUInt16 => "UInt16"
        case QUInt32 => "UInt32"
        case QUInt64 => "UInt64"
        case QUInt256 => "UInt256"
        case QFloat32 => "Float32"
        case QFloat64 => "Float64"
        case QQChar => "FixedString(1)"
        case QEnum => "LowCardinality(String)"
        case QTimestamp | QTimestampTZ | QTime | QTimeTZ => "DateTime64(6)"
        case QDate => "Date32"
        case QUuid => "UUID"
        case _ => "String" // string/json/bytes/hstore/geo/net + catch-all
      }
      val t = k match {
        // array exceptions (kind.go:160-170): json arrays flatten to one
        // String; interval arrays are string arrays; Date arrays use Date
        case QArray(QJson) | QArray(QJsonb) => "String"
        case QArray(QInterval) => "Array(String)"
        case QArray(QDate) => "Array(Date)"
        case QArray(e) => s"Array(${scalar(e)})"
        case s => scalar(s)
      }
      k match {
        case QArray(_) => t // Nullable never wraps CH arrays
        case _ if nullable && t == "LowCardinality(String)" =>
          "LowCardinality(Nullable(String))"
        case _ if nullable => s"Nullable($t)"
        case _ => t
      }
    case Dialect.BigQuery =>
      def scalar(s: QKind): String = s match {
        case QNumeric(p, s2) =>
          val (rp, rs) = BigQueryNum.resolve(p, s2)
          s"BIGNUMERIC($rp,$rs)"
        case QBool => "BOOL"
        case QInt8 | QInt16 | QInt32 | QInt64 | QUInt8 | QUInt16 |
            QUInt32 | QUInt64 => "INT64"
        case QFloat32 | QFloat64 => "FLOAT64"
        case QJson | QJsonb | QHstore => "JSON"
        case QTimestamp | QTimestampTZ => "TIMESTAMP"
        case QDate => "DATE"
        case QTime | QTimeTZ => "TIME"
        case QBytes => "BYTES"
        case QGeography | QGeometry | QPoint => "GEOGRAPHY"
        case QInterval => "STRING"
        case _ => "STRING" // string/enum/uuid/net + catch-all
      }
      val t = k match {
        // repeated fields; interval arrays are string arrays, uuid
        // arrays string arrays (qvalue_convert.go:58-84)
        case QArray(e) => s"ARRAY<${scalar(e)}>"
        case s => scalar(s)
      }
      // BigQuery DDL: ARRAY columns can't be NOT NULL (repeated already)
      t + (if (nullable || k.isInstanceOf[QArray]) "" else " NOT NULL")
  }

  /** Sink DDL type for a generic ANSI warehouse target (the shape of
    * ToDWHColumnType, flow/model/qvalue/kind.go:55-114). */
  def toAnsiDdl(k: QKind): String = k match {
    case QBool => "BOOLEAN"
    case QInt8 | QInt16 => "SMALLINT"
    case QInt32 | QUInt8 | QUInt16 => "INTEGER"
    case QInt64 | QUInt32 => "BIGINT"
    case QUInt64 => "DECIMAL(20,0)"
    case n @ QNumeric(_, _) if n.isUnbounded => "DECIMAL(38,18)"
    case QNumeric(p, s) => s"DECIMAL($p,${s min p})"
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
