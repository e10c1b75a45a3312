package graft.cdc

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.PgOutput._
import graft.cdc.TextCheckpoint._

/** Property coverage for the round's binary codecs: encode∘parse
  * identity over random inputs, algebraic laws of the checkpoint
  * structures, idempotence of the canonicalizers, and
  * garbage-in-exception-out (never hang/mis-decode) for the parsers.
  * Generators sample with a FIXED seed (deterministic CI; no
  * scalatestplus bridge in the container, so sampling is explicit). */
class CodecPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], seed0: Long = 42L,
      n: Int = 200): Seq[A] = {
    var seed = org.scalacheck.rng.Seed(seed0)
    (1 to n).flatMap { _ =>
      val v = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  // pair inputs drawn from two INDEPENDENT seed streams
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])
      (body: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2, seed0 = 1337L)).foreach(body.tupled)

  // ----------------------------------------------------- pgoutput messages

  private val genColumn: Gen[TupleColumn] = Gen.oneOf(
    Gen.const(NullColumn), Gen.const(ToastColumn),
    Gen.alphaNumStr.map(s => TextColumn(s.getBytes("UTF-8"))),
    Gen.listOf(Arbitrary.arbitrary[Byte]).map(b =>
      BinaryColumn(b.toArray)))
  private val genTuple: Gen[TupleData] =
    Gen.listOfN(3, genColumn).map(TupleData(_))
  private val genName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(20))

  private val genMessage: Gen[Message] = Gen.oneOf(
    for (l <- Gen.posNum[Long]; t <- Gen.posNum[Long];
         x <- Gen.posNum[Int])
      yield Begin(l, PgEpochMicros + t, x),
    for (l <- Gen.posNum[Long]; t <- Gen.posNum[Long])
      yield Commit(0, l, l + 1, PgEpochMicros + t),
    for (l <- Gen.posNum[Long]; n <- genName) yield Origin(l, n),
    for (r <- Gen.posNum[Int]; t <- genTuple) yield Insert(r, t),
    for (r <- Gen.posNum[Int]; old <- genTuple; nw <- genTuple;
         k <- Gen.oneOf('K', 'O'))
      yield Update(r, Some(k), Some(old), nw),
    for (r <- Gen.posNum[Int]; nw <- genTuple)
      yield Update(r, None, None, nw),
    for (r <- Gen.posNum[Int]; t <- genTuple; k <- Gen.oneOf('K', 'O'))
      yield Delete(r, k, t),
    for (ids <- Gen.nonEmptyListOf(Gen.posNum[Int]);
         o <- Gen.chooseNum(0, 3)) yield Truncate(o, ids),
    for (ns <- genName; n <- genName; r <- Gen.posNum[Int];
         cols <- Gen.listOfN(3, for {
           cn <- genName; oid <- Gen.posNum[Int]; fl <- Gen.oneOf(0, 1)
         } yield RelationColumn(fl, cn, oid, -1)))
      yield Relation(r, ns, n, 'd'.toInt, cols))

  private def normalize(m: Message): Any = m match {
    case Insert(r, t) => ("I", r, normT(t))
    case Update(r, k, o, n) => ("U", r, k, o.map(normT), normT(n))
    case Delete(r, k, t) => ("D", r, k, normT(t))
    case other => other
  }
  private def normT(t: TupleData): Seq[Any] = t.columns.map {
    case TextColumn(b) => ("t", b.toSeq)
    case BinaryColumn(b) => ("b", b.toSeq)
    case other => other
  }

  test("pgoutput: parse is a left inverse of encode for random messages") {
    forAll(genMessage) { m =>
      assert(normalize(parse(encode(m))) == normalize(m))
    }
  }

  test("pgoutput: random garbage raises, never hangs or mis-decodes") {
    forAll(Gen.nonEmptyListOf(Arbitrary.arbitrary[Byte])) { bytes =>
      try { parse(bytes.toArray); () }
      catch { case _: RuntimeException => () } // incl. require/BufferUnderflow wraps
    }
  }

  // ----------------------------------------------------------------- BSON

  test("bson: random garbage raises, never hangs") {
    forAll(Gen.nonEmptyListOf(Arbitrary.arbitrary[Byte])) { bytes =>
      try { Bson.documentToJson(bytes.toArray); () }
      catch { case _: RuntimeException => () }
    }
  }

  test("bson: scalar documents round-trip through the encoder") {
    import Bson._
    val genVal: Gen[BVal] = Gen.oneOf(
      Arbitrary.arbitrary[Long].map(BInt64(_)),
      Arbitrary.arbitrary[Int].map(BInt32(_)),
      Gen.alphaNumStr.map(BString(_)),
      Arbitrary.arbitrary[Boolean].map(BBool(_)),
      Gen.const(BNull))
    forAll(Gen.listOfN(4, genVal)) { vals =>
      val fields = vals.zipWithIndex.map { case (v, i) => s"f$i" -> v }
      val json = documentToJson(encodeDoc(BDoc(fields)))
      // the JSON carries every field, in order, with the right rendering
      assert(json.startsWith("{") && json.endsWith("}"))
      fields.foreach { case (k, v) =>
        val frag = v match {
          case BInt64(x) => s""""$k":$x"""
          case BInt32(x) => s""""$k":$x"""
          case BString(s) => s""""$k":"$s""""
          case BBool(b) => s""""$k":$b"""
          case BNull => s""""$k":null"""
          case _ => fail("unreachable")
        }
        assert(json.contains(frag), s"$json missing $frag")
      }
    }
  }

  // ----------------------------------------------------- checkpoint algebra

  private val genGtid: Gen[GtidSet] = for {
    n <- Gen.chooseNum(1, 3)
    uuids <- Gen.listOfN(n, Gen.oneOf("u1", "u2", "u3"))
    ivs <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(1L, 50L); w <- Gen.chooseNum(0L, 10L)
    } yield (a, a + w))
  } yield GtidSet(uuids.zip(ivs.map(List(_))).toMap)
    .merge(GtidSet.empty) // normalize via merge

  test("gtid: merge is an upper bound and is commutative + idempotent") {
    forAll(genGtid, genGtid) { (a, b) =>
      val m = a.merge(b)
      assert(m.contains(a) && m.contains(b))
      assert(m == b.merge(a))
      assert(m.merge(m) == m)
      assert(m.merge(a) == m)
    }
  }

  test("gtid: parse∘render is the identity on normalized sets") {
    forAll(genGtid) { g =>
      assert(GtidSet.parse(g.render) == g)
    }
  }

  test("gtid: containment is consistent with tryCompare") {
    forAll(genGtid, genGtid) { (a, b) =>
      (a.tryCompare(b), a.contains(b), b.contains(a)) match {
        case (Some(0), ca, cb) => assert(ca && cb)
        case (Some(1), ca, _) => assert(ca)
        case (Some(-1), _, cb) => assert(cb)
        case (None, ca, cb) => assert(!ca && !cb)
        case other => fail(s"impossible: $other")
      }
    }
  }

  // ------------------------------------------------------------- PG ranges

  test("range canonicalization is idempotent") {
    import graft.functions.PgText._
    val genRange: Gen[String] = for {
      lo <- Gen.chooseNum(-100L, 100L)
      w <- Gen.chooseNum(-3L, 10L)
      lb <- Gen.oneOf("[", "(")
      ub <- Gen.oneOf("]", ")")
    } yield s"$lb$lo,${lo + w}$ub"
    forAll(genRange) { r =>
      val c = canonicalIntRange(r)
      assert(canonicalIntRange(c) == c)
      // canonical form is always [a,b) or empty
      assert(c == "empty" || (c.startsWith("[") && c.endsWith(")")))
    }
  }

  test("multirange canonicalization is idempotent and sorted") {
    import graft.functions.PgText._
    val genMr: Gen[String] = for {
      n <- Gen.chooseNum(1, 4)
      rs <- Gen.listOfN(n, for {
        lo <- Gen.chooseNum(-50L, 50L); w <- Gen.chooseNum(-2L, 8L)
      } yield s"[$lo,${lo + w})")
    } yield rs.mkString("{", ",", "}")
    forAll(genMr) { mr =>
      val c = canonicalIntMultirange(mr)
      assert(canonicalIntMultirange(c) == c)
      // elements are disjoint, non-adjacent and ascending
      if (c != "{}") {
        val bounds = c.substring(1, c.length - 1).split("\\),\\[")
          .map(_.replaceAll("[\\[\\)\\{\\}]", "").split(","))
          .map(a => (a(0).toLong, a(1).toLong))
        bounds.sliding(2).foreach {
          case Array((_, b1), (a2, _)) => assert(a2 > b1) // gap required
          case _ =>
        }
      }
    }
  }
}
