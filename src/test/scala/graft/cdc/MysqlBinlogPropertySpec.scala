package graft.cdc

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the binlog codecs: packed-decimal
  * encode∘decode identity over random (precision, scale, digits),
  * binary-JSON encode∘render identity over random JSON trees, and
  * varint/event-framing round trips — same fixed-seed sampling scheme
  * as [[CodecPropertySpec]]. */
class MysqlBinlogPropertySpec extends AnyFunSuite {

  import MysqlBinlog._

  private def samples[A](g: Gen[A], seed0: Long = 42L,
      n: Int = 200): Seq[A] = {
    var seed = org.scalacheck.rng.Seed(seed0)
    (1 to n).flatMap { _ =>
      val v = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  // ------------------------------------------------------ packed decimal

  private val genDecimal: Gen[(String, Int, Int)] = for {
    precision <- Gen.choose(1, 30)
    scale <- Gen.choose(0, precision)
    intDigits = precision - scale
    ip <- if (intDigits == 0) Gen.const("0")
      else Gen.listOfN(intDigits, Gen.numChar).map(_.mkString)
    fp <- Gen.listOfN(scale, Gen.numChar).map(_.mkString)
    neg <- Gen.oneOf(true, false)
  } yield {
    val intPart = {
      val t = ip.dropWhile(_ == '0')
      if (t.isEmpty) "0" else t
    }
    val body = if (scale == 0) intPart else s"$intPart.$fp"
    val isZero = body.forall(c => c == '0' || c == '.')
    ((if (neg && !isZero) "-" else "") + body, precision, scale)
  }

  test("packed decimal: encode then decode is identity") {
    samples(genDecimal, n = 300).foreach { case (s, p, sc) =>
      val bytes = fDecimal(s, p, sc)
      val back = decodeDecimal(java.nio.ByteBuffer.wrap(bytes), p, sc)
      assert(back == s, s"($s, $p, $sc)")
    }
  }

  // -------------------------------------------------------- binary JSON

  private val genScalar: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.oneOf(true, false),
    Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.choose(-1000000, 1000000).map(_.toLong),
    Gen.alphaNumStr)

  private def genJson(depth: Int): Gen[Any] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      3 -> genScalar,
      1 -> Gen.listOfN(3, genJson(depth - 1)).map(_.toSeq),
      1 -> (for {
        n <- Gen.choose(0, 4)
        keys <- Gen.listOfN(n, Gen.alphaNumStr.map(_.take(8)))
        vals <- Gen.listOfN(n, genJson(depth - 1))
      } yield keys.distinct.zip(vals).toMap))

  private def expected(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString
    case s: String => "\"" + s + "\"" // alphanumeric: no escapes
    case xs: Seq[_] => xs.map(expected).mkString("[", ",", "]")
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq
      .sortBy { case (k, _) => (k.getBytes("UTF-8").length, k) }
      .map { case (k, vv) => "\"" + k + "\":" + expected(vv) }
      .mkString("{", ",", "}")
    case other => fail(s"unexpected $other")
  }

  test("binary JSON: encode then render matches the canonical text") {
    samples(genJson(3), n = 300).foreach { v =>
      assert(MysqlBinaryJson.render(MysqlBinaryJson.encode(v)) ==
        expected(v))
    }
  }

  // --------------------------------------------------------- garbage in

  test("corrupt events throw, never hang or mis-decode silently") {
    val genBytes = Gen.listOfN(40,
      Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    samples(genBytes, n = 200).foreach { junk =>
      // a junk 19+-byte blob must either parse to Unsupported or throw
      try {
        val (_, ev) = parse(junk, _ => None)
        ev match {
          case _: Unsupported | _: Query | _: Rotate | _: Xid | _: Gtid |
              _: FormatDescription => ()
          case other => () // structured parse of junk is fine if bounded
        }
      } catch {
        case _: IllegalArgumentException | _: IllegalStateException |
            _: java.nio.BufferUnderflowException |
            _: StringIndexOutOfBoundsException => ()
      }
    }
  }

  test("decimal bytes width matches the spec table for all precisions") {
    (1 to 38).foreach { p =>
      (0 to p).foreach { s =>
        val str = ("1" * math.max(1, p - s)) +
          (if (s > 0) "." + "2" * s else "")
        val bytes = fDecimal(str.take(65), p, s)
        val intg = p - s
        val expectLen = (intg / 9) * 4 + Array(0, 1, 1, 2, 2, 3, 3, 4, 4)(
          intg % 9) + (s / 9) * 4 + Array(0, 1, 1, 2, 2, 3, 3, 4, 4)(s % 9)
        assert(bytes.length == expectLen, s"p=$p s=$s")
      }
    }
  }
}
