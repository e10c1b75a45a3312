package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property round-trip for the PG array-literal parser feeding the
  * pgoutput array decode: arbitrary element strings (quotes,
  * backslashes, commas, braces, whitespace, NULL-lookalikes, empty)
  * render through PG's own quoting rules and parse back identical;
  * and the decoded JSON array is valid JSON element for element. */
class ArrayLiteralPropertySpec extends AnyFunSuite {

  // fixed-seed sampling (no scalatestplus bridge in the container —
  // same pattern as CodecPropertySpec)
  private def forAll[A](g: Gen[A], n: Int = 300)(body: A => Unit)
      : Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (1 to n).foreach { _ =>
      g.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
    }
  }

  /** PG's array-output quoting (arrayout): quote when empty, equal to
    * NULL (any case), or containing {} , " \ or whitespace; escape
    * backslash and double quote with a backslash. */
  private def render(elems: Seq[Option[String]]): String =
    elems.map {
      case None => "NULL"
      case Some(e) =>
        val needsQuote = e.isEmpty || e.equalsIgnoreCase("null") ||
          e.exists(c => "{},\"\\".contains(c) || c.isWhitespace)
        if (!needsQuote) e
        else "\"" + e.flatMap {
          case '\\' => "\\\\"
          case '"' => "\\\""
          case c => c.toString
        } + "\""
    }.mkString("{", ",", "}")

  private val elemGen: Gen[Option[String]] = Gen.frequency(
    1 -> Gen.const(None),
    2 -> Gen.const(Some("")),
    2 -> Gen.const(Some("NULL")),
    10 -> Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf('{', '}', ',', '"', '\\', ' ', '\t', '\'',
        'é', '日', '\n'),
      1 -> Gen.oneOf('<', '>', '/'))).map(cs => Some(cs.mkString)))

  test("render → parse round-trips arbitrary element lists") {
    forAll(Gen.listOfN(8, elemGen)) { elems =>
      val parsed = PgText.parseArrayLiteral(render(elems))
      assert(parsed == elems.map(_.orNull))
    }
  }

  test("decoded elements embed as VALID JSON (the pgoutput array " +
    "path's contract with from_json)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    forAll(Gen.listOfN(6, elemGen)) { elems =>
      // mirror PgOutput's string-element policy: quoted + escaped
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val json = PgText.parseArrayLiteral(render(elems)).map {
        case null => "null"
        case e => "\"" + esc(e) + "\""
      }.mkString("[", ",", "]")
      val node = mapper.readTree(json)
      assert(node.isArray && node.size == elems.size)
      elems.zipWithIndex.foreach {
        case (None, i) => assert(node.get(i).isNull)
        case (Some(e), i) => assert(node.get(i).asText() == e)
      }
    }
  }
}
