package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class QKindSpec extends AnyFunSuite {

  test("every scalar kind maps to a Catalyst type and ANSI DDL") {
    QKind.scalarKinds.foreach { k =>
      assert(k.toSpark != null, k.name)
      assert(QKind.toAnsiDdl(k).nonEmpty, k.name)
    }
  }

  test("name round trip, incl. parameterized numerics and arrays") {
    QKind.scalarKinds.foreach(k =>
      assert(QKind.fromName(k.name) == k, k.name))
    assert(QKind.fromName("numeric(20,4)") == QKind.QNumeric(20, 4))
    assert(QKind.fromName("array_int64") == QKind.QArray(QKind.QInt64))
    assert(QKind.fromName("array_array_string") ==
      QKind.QArray(QKind.QArray(QKind.QString)))
    intercept[IllegalArgumentException](QKind.fromName("nope"))
  }

  test("unsigned widening and 256-bit carriers (kind.go:13-22)") {
    assert(QKind.QUInt8.toSpark == ShortType)
    assert(QKind.QUInt32.toSpark == LongType)
    assert(QKind.QUInt64.toSpark == DecimalType(20, 0))
    assert(QKind.QInt256.toSpark == BinaryType)
    assert(QKind.toAnsiDdl(QKind.QUInt64) == "DECIMAL(20,0)")
  }

  test("spark round trip is stable for the carrier types") {
    val carriers = Seq(BooleanType, ByteType, ShortType, IntegerType,
      LongType, FloatType, DoubleType, DecimalType(20, 8), StringType,
      TimestampNTZType, TimestampType, DateType, BinaryType,
      ArrayType(LongType, containsNull = true))
    carriers.foreach { dt =>
      assert(QKind.fromSpark(dt).toSpark == dt, dt.simpleString)
    }
  }

  test("time kinds carry micros in BIGINT (extended time support)") {
    assert(QKind.QTime.toSpark == LongType)
    assert(QKind.toAnsiDdl(QKind.QTime) == "BIGINT")
  }

  // ---------------------------------------------- per-warehouse DDL maps

  test("every kind (scalar + array-of-scalar) × every dialect emits DDL") {
    val kinds = QKind.scalarKinds ++ QKind.scalarKinds.map(QKind.QArray(_))
    for (k <- kinds; d <- QKind.Dialect.all;
         n <- Seq(true, false)) {
      assert(QKind.toDdl(k, d, nullable = n).nonEmpty, s"${k.name} / $d")
    }
  }

  test("Snowflake map matches QValueKindToSnowflakeTypeMap (kind.go:73)") {
    import QKind._, QKind.Dialect.Snowflake
    val expected = Seq(
      QBool -> "BOOLEAN", QInt8 -> "INTEGER", QInt64 -> "INTEGER",
      QUInt64 -> "INTEGER", QFloat32 -> "FLOAT", QFloat64 -> "FLOAT",
      QQChar -> "CHAR", QString -> "STRING", QEnum -> "STRING",
      QJson -> "VARIANT", QJsonb -> "VARIANT", QHstore -> "VARIANT",
      QInterval -> "VARIANT", QTimestamp -> "TIMESTAMP_NTZ",
      QTimestampTZ -> "TIMESTAMP_TZ", QTime -> "TIME", QTimeTZ -> "TIME",
      QDate -> "DATE", QBytes -> "BINARY", QUuid -> "STRING",
      QGeography -> "GEOGRAPHY", QGeometry -> "GEOMETRY",
      QPoint -> "GEOMETRY", QArray(QInt64) -> "VARIANT",
      QArray(QString) -> "VARIANT")
    expected.foreach { case (k, t) =>
      assert(QKind.toDdl(k, Snowflake) == t, k.name)
    }
    assert(QKind.toDdl(QString, Snowflake, nullable = false) ==
      "STRING NOT NULL")
    // SF numeric compat (38,37, default scale 20): clamp + fallback
    assert(QKind.toDdl(QNumeric(20, 4), Snowflake) == "NUMERIC(20,4)")
    assert(QKind.toDdl(QNumeric(50, 4), Snowflake) == "NUMERIC(38,4)")
    assert(QKind.toDdl(QNumeric(20, 38), Snowflake) == "NUMERIC(38,20)")
    assert(QKind.toDdl(QNumeric(), Snowflake) == "NUMERIC(38,20)")
    // PG allows scale > precision; warehouse DDL must clamp (both reject)
    assert(QKind.toDdl(QNumeric(5, 10), Snowflake) == "NUMERIC(5,5)")
    assert(QKind.toDdl(QNumeric(5, 10), Dialect.ClickHouse,
      nullable = false) == "Decimal(5, 5)")
    // ANSI: unbounded renders the (38,18) carrier, never DECIMAL(0,0)
    assert(QKind.toDdl(QNumeric(), Dialect.Ansi) == "DECIMAL(38,18)")
    assert(QKind.toAnsiDdl(QNumeric(5, 10)) == "DECIMAL(5,5)")
  }

  test("ClickHouse map matches QValueKindToClickHouseTypeMap (kind.go:128)") {
    import QKind._, QKind.Dialect.ClickHouse
    val expectedBare = Seq(
      QBool -> "Bool", QInt8 -> "Int8", QInt16 -> "Int16",
      QInt32 -> "Int32", QInt64 -> "Int64", QInt256 -> "Int256",
      QUInt8 -> "UInt8", QUInt64 -> "UInt64", QUInt256 -> "UInt256",
      QFloat32 -> "Float32", QFloat64 -> "Float64",
      QQChar -> "FixedString(1)", QString -> "String",
      QJson -> "String", QHstore -> "String",
      QTimestamp -> "DateTime64(6)", QTimestampTZ -> "DateTime64(6)",
      QTime -> "DateTime64(6)", QDate -> "Date32", QBytes -> "String",
      QUuid -> "UUID")
    expectedBare.foreach { case (k, t) =>
      assert(QKind.toDdl(k, ClickHouse, nullable = false) == t, k.name)
      assert(QKind.toDdl(k, ClickHouse, nullable = true) ==
        s"Nullable($t)", k.name)
    }
    // enum: LowCardinality, with the inner Nullable placement
    assert(QKind.toDdl(QEnum, ClickHouse, nullable = false) ==
      "LowCardinality(String)")
    assert(QKind.toDdl(QEnum, ClickHouse, nullable = true) ==
      "LowCardinality(Nullable(String))")
    // arrays: never Nullable-wrapped; json arrays flatten to String
    assert(QKind.toDdl(QArray(QInt64), ClickHouse) == "Array(Int64)")
    assert(QKind.toDdl(QArray(QEnum), ClickHouse) ==
      "Array(LowCardinality(String))")
    assert(QKind.toDdl(QArray(QJson), ClickHouse) == "String")
    assert(QKind.toDdl(QArray(QInterval), ClickHouse) == "Array(String)")
    assert(QKind.toDdl(QArray(QDate), ClickHouse) == "Array(Date)")
    assert(QKind.toDdl(QArray(QTimestamp), ClickHouse) ==
      "Array(DateTime64(6))")
  }

  test("ClickHouse numeric rules (GetNumericDestinationType)") {
    import QKind._, QKind.Dialect.ClickHouse
    // bounded: passthrough under 76
    assert(QKind.toDdl(QNumeric(20, 4), ClickHouse, nullable = false) ==
      "Decimal(20, 4)")
    // precision beyond CH max 76 → String, regardless of the env flag
    assert(QKind.toDdl(QNumeric(100, 4), ClickHouse, nullable = false) ==
      "String")
    // unbounded + numeric-as-string env rule → String
    assert(QKind.toDdl(QNumeric(), ClickHouse, nullable = false,
      chNumericAsString = true) == "String")
    // unbounded without the flag → CH default Decimal(76, 38)
    assert(QKind.toDdl(QNumeric(), ClickHouse, nullable = false) ==
      "Decimal(76, 38)")
  }

  test("BigQuery map matches qValueKindToBigQueryType") {
    import QKind._, QKind.Dialect.BigQuery
    val expected = Seq(
      QBool -> "BOOL", QInt8 -> "INT64", QInt64 -> "INT64",
      QUInt32 -> "INT64", QFloat64 -> "FLOAT64", QString -> "STRING",
      QEnum -> "STRING", QJson -> "JSON", QJsonb -> "JSON",
      QHstore -> "JSON", QTimestamp -> "TIMESTAMP",
      QTimestampTZ -> "TIMESTAMP", QDate -> "DATE", QTime -> "TIME",
      QTimeTZ -> "TIME", QBytes -> "BYTES", QUuid -> "STRING",
      QGeography -> "GEOGRAPHY", QGeometry -> "GEOGRAPHY",
      QPoint -> "GEOGRAPHY", QInterval -> "STRING",
      QArray(QInt32) -> "ARRAY<INT64>", QArray(QFloat32) ->
        "ARRAY<FLOAT64>", QArray(QString) -> "ARRAY<STRING>",
      QArray(QUuid) -> "ARRAY<STRING>",
      QArray(QTimestamp) -> "ARRAY<TIMESTAMP>")
    expected.foreach { case (k, t) =>
      assert(QKind.toDdl(k, BigQuery) == t, k.name)
    }
    // BQ numeric compat: BIGNUMERIC with (38,20) default, scale cap 20
    assert(QKind.toDdl(QNumeric(20, 4), BigQuery) == "BIGNUMERIC(20,4)")
    assert(QKind.toDdl(QNumeric(), BigQuery) == "BIGNUMERIC(38,20)")
    assert(QKind.toDdl(QNumeric(38, 30), BigQuery) == "BIGNUMERIC(38,20)")
    // arrays are REPEATED — never NOT NULL
    assert(QKind.toDdl(QArray(QInt64), BigQuery, nullable = false) ==
      "ARRAY<INT64>")
    assert(QKind.toDdl(QInt64, BigQuery, nullable = false) ==
      "INT64 NOT NULL")
  }
}
