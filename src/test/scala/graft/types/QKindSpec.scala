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
}
