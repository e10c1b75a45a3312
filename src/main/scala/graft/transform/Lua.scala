package graft.transform

import scala.collection.mutable

/** A minimal Lua interpreter — lexer, recursive-descent parser and
  * tree-walking evaluator for the record-transform subset the
  * reference's user scripts live in (flow/pua/peerdb.go registers the
  * environment; flow/connectors/kafka/kafka.go:173-224 and
  * pubsub/pubsub.go:102-140 consume `onRecord`'s return value). The
  * reference embeds gopher-lua (Lua 5.1); this implementation covers
  * the language surface those scripts exercise:
  *
  *   - values: nil, boolean, integer/float numbers (the glua64 dual
  *     representation — integers stay exact to ±2^63), strings,
  *     tables (array+hash, one object), closures, native functions,
  *     userdata (host objects with native index/tostring hooks);
  *   - statements: `local` (multi), assignment (multi-target, field/
  *     index targets), `function` declarations (global/local/dotted),
  *     if/elseif/else, while, repeat/until, numeric and generic for,
  *     do/end, break, return, call statements;
  *   - expressions: literals, table constructors, `and`/`or`
  *     short-circuit, comparisons, arithmetic (+ - * / % ^), `..`,
  *     `not`/unary minus/`#`, function expressions, calls incl.
  *     method sugar `a:b(...)`, parenthesized truncation and
  *     multi-value expansion in the tail position of call arguments,
  *     table constructors and return lists;
  *   - metatables: `setmetatable`/`getmetatable` with `__index`
  *     (table or function), `__newindex`, `__tostring`, `__call`.
  *
  * Deliberately absent (none appear in transform scripts): varargs
  * beyond `...` pass-through, coroutines, goto, `load`/`loadstring`
  * (the reference nils `loadfile`/`dofile` for the same sandboxing
  * reason, peerdb.go:35-37), the io/os libraries.
  *
  * The standard library subset (string/table/math/pairs/ipairs/
  * tostring/tonumber/type/error/assert/pcall/select/print) and module
  * system (`require` over a host-provided module map) live in
  * [[Lua.baseEnv]]; the peerdb record environment is layered on by
  * [[LuaRecordEnv]].
  */
object Lua {

  // ------------------------------------------------------------ values

  sealed trait V {
    def truthy: Boolean = this match {
      case VNil | VBool(false) => false
      case _ => true
    }
    def typeName: String = this match {
      case VNil => "nil"
      case _: VBool => "boolean"
      case _: VInt | _: VNum => "number"
      case _: VStr | _: VBytes => "string" // byte strings ARE strings
      case _: VTable => "table"
      case _: VFunc | _: VNative => "function"
      case _: VUserData => "userdata"
    }
  }
  case object VNil extends V
  final case class VBool(b: Boolean) extends V
  final case class VInt(i: Long) extends V
  final case class VNum(d: Double) extends V
  final case class VStr(s: String) extends V
  /** A BYTE string — what msgpack.encode produces and the queue value
    * leg ships verbatim (Lua strings are byte strings; a JVM String
    * cannot carry arbitrary bytes >0x7F through a UTF-8 boundary).
    * `type()` reports "string"; supports `#` (byte count), `==`
    * (content), `..` (via the latin-1 text image), table keys, and
    * the queue `value`/`key` fields; the TEXT stdlib (upper/format/…)
    * stays VStr-only. */
  final class VBytes(val b: Array[Byte]) extends V {
    override def equals(o: Any): Boolean = o match {
      case x: VBytes => java.util.Arrays.equals(b, x.b)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(b)
    /** Lossless text image: one char per byte (latin-1). */
    def latin1: String =
      new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
  }
  object VBytes {
    def apply(b: Array[Byte]): VBytes = new VBytes(b)
  }
  final class VTable extends V {
    val hash = mutable.LinkedHashMap.empty[V, V]
    var meta: Option[VTable] = None
    def get(k: V): V = hash.getOrElse(normKey(k), VNil)
    def set(k: V, v: V): Unit = {
      val kk = normKey(k)
      if (v == VNil) hash.remove(kk) else hash(kk) = v
    }
    /** Lua's array length: the border of the 1..n integer prefix. */
    def len: Long = {
      var n = 0L
      while (hash.contains(VInt(n + 1))) n += 1
      n
    }
    private def normKey(k: V): V = k match {
      case VNum(d) if d.isWhole && d.abs < 9.007199254740992e15 =>
        VInt(d.toLong)
      case other => other
    }
  }
  final case class VFunc(params: Seq[String], varargs: Boolean,
      body: Seq[Stat], env: Env) extends V
  final case class VNative(name: String,
      fn: Seq[V] => Seq[V]) extends V
  /** Host object: `index` serves field reads, `ts` renders tostring.
    * The optional hooks mirror the metamethods the reference installs
    * on its userdata types (flow/pua/peerdb.go:52-113): `newindex`
    * serves field WRITES (LuaRowNewIndex), `order` serves __eq/__lt/
    * __le between two userdata of the SAME tag (LuaTimeLt,
    * LuaDecimalLe, …), `arith` serves the arithmetic metamethods
    * (decimalBinop's __add family plus "unm" for __unm) with the raw
    * operand values so the hook owns coercion like LVAsDecimal does. */
  final case class VUserData(tag: String, payload: Any,
      index: (Any, String) => V,
      ts: Any => String = _.toString,
      newindex: (Any, String, V) => Unit = null,
      order: (Any, Any) => Int = null,
      arith: (String, V, V) => V = null) extends V

  /** Host payloads that answer the `#` operator (__len, LuaRowLen). */
  trait HasLuaLen { def luaLen: Long }

  final class LuaError(msg: String) extends RuntimeException(msg)
  private def err(msg: String): Nothing = throw new LuaError(msg)

  def tostr(v: V): String = v match {
    case VNil => "nil"
    case VBool(b) => b.toString
    case VInt(i) => i.toString
    case VNum(d) =>
      if (d.isWhole && d.abs < 1e15) d.toLong.toString
      else if (d.isNaN) "nan"
      else if (d.isInfinity) { if (d > 0) "inf" else "-inf" }
      else {
        val s = "%.14g".format(d)
        // trim trailing zeros the way Lua's %.14g prints
        if (s.contains('.') && !s.contains('e') && !s.contains('E'))
          s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
        else s
      }
    case VStr(s) => s
    case t: VTable =>
      t.meta.map(_.get(VStr("__tostring"))) match {
        case Some(f: VNative) => tostr(f.fn(Seq(t)).headOption
          .getOrElse(VNil))
        case Some(f: VFunc) => "table" // avoid re-entrancy headaches
        case _ => "table: 0x" + Integer.toHexString(
          System.identityHashCode(t))
      }
    case bs: VBytes => bs.latin1 // lossless: one char per byte
    case u: VUserData => u.ts(u.payload)
    case _: VFunc | _: VNative => "function: 0x0"
  }

  /** Raw byte image for byte-string concatenation: bytes stay bytes,
    * text renders UTF-8. */
  private def rawBytes(v: V): Array[Byte] = v match {
    case bs: VBytes => bs.b
    case other => tostr(other).getBytes(
      java.nio.charset.StandardCharsets.UTF_8)
  }

  def tonum(v: V): Option[V] = v match {
    case n: VInt => Some(n)
    case n: VNum => Some(n)
    case VStr(s0) =>
      val s = s0.trim
      if (s.matches("[+-]?\\d+")) scala.util.Try(VInt(s.toLong)).toOption
        .orElse(scala.util.Try(VNum(s.toDouble)).toOption)
      else if (s.matches("(?i)[+-]?0x[0-9a-f]+"))
        scala.util.Try(VInt(java.lang.Long.parseLong(
          s.replaceFirst("(?i)0x", ""), 16))).toOption
      else scala.util.Try(VNum(s.toDouble)).toOption
    case _ => None
  }

  // --------------------------------------------------------------- AST

  sealed trait Expr
  final case class ENil() extends Expr
  final case class ETrue() extends Expr
  final case class EFalse() extends Expr
  final case class EInt(v: Long) extends Expr
  final case class ENum(v: Double) extends Expr
  final case class EStr(v: String) extends Expr
  final case class EVararg() extends Expr
  final case class EName(n: String) extends Expr
  final case class EIndex(obj: Expr, key: Expr) extends Expr
  final case class ECall(fn: Expr, args: Seq[Expr]) extends Expr
  final case class EMethod(obj: Expr, name: String,
      args: Seq[Expr]) extends Expr
  final case class EFunc(params: Seq[String], varargs: Boolean,
      body: Seq[Stat]) extends Expr
  final case class ETable(arr: Seq[Expr],
      kv: Seq[(Expr, Expr)]) extends Expr
  final case class EBin(op: String, l: Expr, r: Expr) extends Expr
  final case class EUn(op: String, e: Expr) extends Expr
  final case class EParen(e: Expr) extends Expr

  sealed trait Stat
  final case class SLocal(names: Seq[String], init: Seq[Expr]) extends Stat
  final case class SAssign(targets: Seq[Expr], vals: Seq[Expr]) extends Stat
  final case class SCall(call: Expr) extends Stat
  final case class SIf(branches: Seq[(Expr, Seq[Stat])],
      els: Option[Seq[Stat]]) extends Stat
  final case class SWhile(cond: Expr, body: Seq[Stat]) extends Stat
  final case class SRepeat(body: Seq[Stat], until: Expr) extends Stat
  final case class SForNum(name: String, from: Expr, to: Expr,
      step: Option[Expr], body: Seq[Stat]) extends Stat
  final case class SForIn(names: Seq[String], exprs: Seq[Expr],
      body: Seq[Stat]) extends Stat
  final case class SDo(body: Seq[Stat]) extends Stat
  final case class SReturn(exprs: Seq[Expr]) extends Stat
  case object SBreak extends Stat

  // ------------------------------------------------------------- lexer

  private final case class Tok(kind: String, text: String, pos: Int)

  private val keywords = Set("and", "break", "do", "else", "elseif",
    "end", "false", "for", "function", "if", "in", "local", "nil",
    "not", "or", "repeat", "return", "then", "true", "until", "while")

  private def lex(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    def peek(k: Int = 0): Char = if (i + k < n) src.charAt(i + k) else '\u0000'
    while (i < n) {
      val c = src.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
      else if (c == '-' && peek(1) == '-') {
        i += 2
        if (peek() == '[' && (peek(1) == '[' || peek(1) == '=')) {
          // long comment --[[ ... ]] (with optional = levels)
          var eq = 0; var j = i + 1
          while (j < n && src.charAt(j) == '=') { eq += 1; j += 1 }
          if (j < n && src.charAt(j) == '[') {
            val close = "]" + ("=" * eq) + "]"
            val end = src.indexOf(close, j + 1)
            i = if (end < 0) n else end + close.length
          } else while (i < n && src.charAt(i) != '\n') i += 1
        } else while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c.isDigit ||
          (c == '.' && peek(1).isDigit)) {
        val start = i
        if (c == '0' && (peek(1) == 'x' || peek(1) == 'X')) {
          i += 2
          while (i < n && (src.charAt(i).isDigit ||
            "abcdefABCDEF".contains(src.charAt(i)))) i += 1
        } else {
          while (i < n && (src.charAt(i).isDigit ||
            src.charAt(i) == '.' || src.charAt(i) == 'e' ||
            src.charAt(i) == 'E' ||
            ((src.charAt(i) == '+' || src.charAt(i) == '-') &&
              (src.charAt(i - 1) == 'e' || src.charAt(i - 1) == 'E'))))
            i += 1
        }
        out += Tok("num", src.substring(start, i), start)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit ||
          src.charAt(i) == '_')) i += 1
        val w = src.substring(start, i)
        out += Tok(if (keywords(w)) w else "name", w, start)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src.charAt(i) != quote) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            i += 1
            sb.append(src.charAt(i) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case 'a' => '\u0007'; case 'b' => '\b'; case 'f' => '\f'
              case 'v' => '\u000b'; case '\\' => '\\'
              case '\'' => '\''; case '"' => '"'; case '\n' => '\n'
              case d if d.isDigit =>
                var code = d - '0'; var k = 0
                while (k < 2 && i + 1 < n && src.charAt(i + 1).isDigit) {
                  code = code * 10 + (src.charAt(i + 1) - '0')
                  i += 1; k += 1
                }
                code.toChar
              case other => other
            })
            i += 1
          } else { sb.append(ch); i += 1 }
        }
        if (i >= n) err(s"unterminated string at ${out.result().size}")
        i += 1
        out += Tok("str", sb.toString, i)
      } else if (c == '[' && (peek(1) == '[' || peek(1) == '=')) {
        var eq = 0; var j = i + 1
        while (j < n && src.charAt(j) == '=') { eq += 1; j += 1 }
        if (j < n && src.charAt(j) == '[') {
          val close = "]" + ("=" * eq) + "]"
          var bodyStart = j + 1
          if (bodyStart < n && src.charAt(bodyStart) == '\n')
            bodyStart += 1
          val end = src.indexOf(close, bodyStart)
          if (end < 0) err("unterminated long string")
          out += Tok("str", src.substring(bodyStart, end), i)
          i = end + close.length
        } else { out += Tok("[", "[", i); i += 1 }
      } else {
        val three = if (i + 3 <= n) src.substring(i, i + 3) else ""
        val two = if (i + 2 <= n) src.substring(i, i + 2) else ""
        if (three == "...") { out += Tok("...", three, i); i += 3 }
        else if (Set("==", "~=", "<=", ">=", "..", "//")(two)) {
          out += Tok(two, two, i); i += 2
        } else {
          out += Tok(c.toString, c.toString, i); i += 1
        }
      }
    }
    out += Tok("eof", "", n)
    out.result()
  }

  // ------------------------------------------------------------ parser

  final class Parser(toks: Vector[Tok]) {
    private var p = 0
    private def cur: Tok = toks(p)
    private def at(k: String): Boolean = cur.kind == k
    private def eat(k: String): Tok = {
      if (!at(k)) err(s"lua parse: expected '$k', got " +
        s"'${cur.text}' (${cur.kind}) at offset ${cur.pos}")
      val t = cur; p += 1; t
    }
    private def opt(k: String): Boolean =
      if (at(k)) { p += 1; true } else false

    def chunk(): Seq[Stat] = {
      val b = block()
      eat("eof")
      b
    }

    private def blockEnd: Set[String] =
      Set("end", "else", "elseif", "until", "eof")

    private def block(): Seq[Stat] = {
      val out = Seq.newBuilder[Stat]
      var done = false
      while (!done && !blockEnd(cur.kind)) {
        if (opt(";")) ()
        else if (at("return")) {
          p += 1
          val es =
            if (blockEnd(cur.kind) || at(";")) Nil else exprList()
          opt(";")
          out += SReturn(es)
          done = true
        } else out += statement()
      }
      out.result()
    }

    private def statement(): Stat = cur.kind match {
      case "break" => p += 1; SBreak
      case "do" => p += 1; val b = block(); eat("end"); SDo(b)
      case "while" =>
        p += 1; val c = expr(); eat("do"); val b = block(); eat("end")
        SWhile(c, b)
      case "repeat" =>
        p += 1; val b = block(); eat("until"); SRepeat(b, expr())
      case "if" =>
        p += 1
        val branches = Seq.newBuilder[(Expr, Seq[Stat])]
        val c0 = expr(); eat("then"); branches += ((c0, block()))
        while (at("elseif")) {
          p += 1; val c = expr(); eat("then"); branches += ((c, block()))
        }
        val els = if (opt("else")) Some(block()) else None
        eat("end")
        SIf(branches.result(), els)
      case "for" =>
        p += 1
        val n1 = eat("name").text
        if (opt("=")) {
          val from = expr(); eat(","); val to = expr()
          val step = if (opt(",")) Some(expr()) else None
          eat("do"); val b = block(); eat("end")
          SForNum(n1, from, to, step, b)
        } else {
          val names = Seq.newBuilder[String]
          names += n1
          while (opt(",")) names += eat("name").text
          eat("in")
          val es = exprList()
          eat("do"); val b = block(); eat("end")
          SForIn(names.result(), es, b)
        }
      case "function" =>
        p += 1
        // function Name{.Name}[:Name] funcbody — dotted/method names
        // desugar to assignments
        var target: Expr = EName(eat("name").text)
        var isMethod = false
        while (at(".") || at(":")) {
          val m = at(":")
          p += 1
          target = EIndex(target, EStr(eat("name").text))
          if (m) { isMethod = true }
        }
        val f = funcBody(selfParam = isMethod)
        SAssign(Seq(target), Seq(f))
      case "local" =>
        p += 1
        if (opt("function")) {
          val name = eat("name").text
          // local function f: the name is in scope inside the body
          SLocal(Seq(name), Seq(funcBody(selfParam = false,
            selfRecursive = Some(name))))
        } else {
          val names = Seq.newBuilder[String]
          names += eat("name").text
          while (opt(",")) names += eat("name").text
          val init = if (opt("=")) exprList() else Nil
          SLocal(names.result(), init)
        }
      case _ =>
        // exprstat: either a call or an assignment
        val e = suffixedExpr()
        if (at("=") || at(",")) {
          val targets = Seq.newBuilder[Expr]
          targets += e
          while (opt(",")) targets += suffixedExpr()
          eat("=")
          SAssign(targets.result(), exprList())
        } else e match {
          case _: ECall | _: EMethod => SCall(e)
          case _ => err(s"lua parse: unexpected expression statement " +
            s"at offset ${cur.pos}")
        }
    }

    private def funcBody(selfParam: Boolean,
        selfRecursive: Option[String] = None): EFunc = {
      eat("(")
      val params = Seq.newBuilder[String]
      if (selfParam) params += "self"
      var varargs = false
      if (!at(")")) {
        var more = true
        while (more) {
          if (at("...")) { p += 1; varargs = true; more = false }
          else { params += eat("name").text; more = opt(",") }
        }
      }
      eat(")")
      val b = block()
      eat("end")
      EFunc(params.result(), varargs, b)
    }

    private def exprList(): Seq[Expr] = {
      val out = Seq.newBuilder[Expr]
      out += expr()
      while (opt(",")) out += expr()
      out.result()
    }

    // precedence climbing (Lua 5.1 table)
    private val binPrec: Map[String, (Int, Int)] = Map(
      "or" -> (1, 1), "and" -> (2, 2),
      "<" -> (3, 3), ">" -> (3, 3), "<=" -> (3, 3), ">=" -> (3, 3),
      "~=" -> (3, 3), "==" -> (3, 3),
      ".." -> (9, 8), // right assoc
      "+" -> (10, 10), "-" -> (10, 10),
      "*" -> (11, 11), "/" -> (11, 11), "%" -> (11, 11),
      "//" -> (11, 11),
      "^" -> (14, 13)) // right assoc

    private def expr(limit: Int = 0): Expr = {
      var left: Expr =
        if (at("not") || at("-") || at("#")) {
          val op = cur.kind; p += 1
          EUn(op, expr(12))
        } else simpleExpr()
      var go = true
      while (go) binPrec.get(cur.kind) match {
        case Some((lp, rp)) if lp > limit =>
          val op = cur.kind; p += 1
          left = EBin(op, left, expr(rp))
        case _ => go = false
      }
      left
    }

    private def simpleExpr(): Expr = cur.kind match {
      case "nil" => p += 1; ENil()
      case "true" => p += 1; ETrue()
      case "false" => p += 1; EFalse()
      case "num" =>
        val t = eat("num").text
        if (t.toLowerCase.startsWith("0x")) {
          // fold with wraparound (real Lua reads hex literals modulo
          // 2^64) — parseLong on an oversized literal would throw a
          // raw NumberFormatException through the parser
          val hex = t.substring(2)
          if (hex.isEmpty ||
              !hex.forall(c => Character.digit(c, 16) >= 0))
            err(s"lua: malformed number near '$t'")
          var v = 0L
          hex.foreach(c => v = (v << 4) | Character.digit(c, 16))
          EInt(v)
        }
        else if (t.matches("\\d+") &&
            scala.util.Try(t.toLong).isSuccess) EInt(t.toLong)
        else ENum(try t.toDouble catch {
          case _: NumberFormatException =>
            err(s"lua: malformed number near '$t'")
        })
      case "str" => EStr(eat("str").text)
      case "..." => p += 1; EVararg()
      case "function" => p += 1; funcBody(selfParam = false)
      case "{" => tableCtor()
      case _ => suffixedExpr()
    }

    private def tableCtor(): Expr = {
      eat("{")
      val arr = Seq.newBuilder[Expr]
      val kv = Seq.newBuilder[(Expr, Expr)]
      while (!at("}")) {
        if (at("[")) {
          p += 1; val k = expr(); eat("]"); eat("="); kv += ((k, expr()))
        } else if (at("name") && toks(p + 1).kind == "=") {
          val k = eat("name").text; eat("="); kv += ((EStr(k), expr()))
        } else arr += expr()
        if (!opt(",") && !opt(";")) {
          if (!at("}")) err(s"lua parse: ',' or '}' expected at " +
            s"offset ${cur.pos}")
        }
      }
      eat("}")
      ETable(arr.result(), kv.result())
    }

    private def primaryExpr(): Expr = cur.kind match {
      case "(" =>
        p += 1; val e = expr(); eat(")"); EParen(e)
      case "name" => EName(eat("name").text)
      case _ => err(s"lua parse: unexpected '${cur.text}' at offset " +
        s"${cur.pos}")
    }

    private def suffixedExpr(): Expr = {
      var e = primaryExpr()
      var go = true
      while (go) cur.kind match {
        case "." => p += 1; e = EIndex(e, EStr(eat("name").text))
        case "[" => p += 1; val k = expr(); eat("]"); e = EIndex(e, k)
        case ":" =>
          p += 1
          val m = eat("name").text
          e = EMethod(e, m, callArgs())
        case "(" | "str" | "{" => e = ECall(e, callArgs())
        case _ => go = false
      }
      e
    }

    private def callArgs(): Seq[Expr] = cur.kind match {
      case "str" => Seq(EStr(eat("str").text))
      case "{" => Seq(tableCtor())
      case _ =>
        eat("(")
        val args = if (at(")")) Nil else exprList()
        eat(")")
        args
    }
  }

  // ------------------------------------------------------- environment

  final class Env(val parent: Option[Env]) {
    private val vars = mutable.HashMap.empty[String, V]
    def define(n: String, v: V): Unit = vars(n) = v
    def lookup(n: String): Option[V] =
      vars.get(n).orElse(parent.flatMap(_.lookup(n)))
    def assign(n: String, v: V): Boolean =
      if (vars.contains(n)) { vars(n) = v; true }
      else parent.exists(_.assign(n, v))
    def globals: Env = parent.map(_.globals).getOrElse(this)
  }

  // control-flow signals: stack traces disabled — EVERY function
  // return throws one, and fillInStackTrace would dominate the
  // per-record interpretation cost
  private final class BreakSignal
    extends RuntimeException(null, null, false, false)
  private final class ReturnSignal(val vals: Seq[V])
    extends RuntimeException(null, null, false, false)

  // --------------------------------------------------------- evaluator

  /** The interpreter currently executing on this thread (executors run
    * one interpreter per partition, single-threaded). */
  private val activeInterp = new ThreadLocal[Interp]

  /** Call a user function from stdlib code that has no Interp handle
    * (string.gsub function replacements, gmatch iterators). */
  private def callback(fn: V, args: Seq[V]): Seq[V] = {
    val i = activeInterp.get
    if (i == null) err("lua: no active interpreter for callback")
    i.call(fn, args)
  }

  final class Interp(maxSteps: Long = 10000000L,
      // gopher-lua's default CallStackSize (the reference's runtime)
      // — and ~14 JVM frames per interpreted call level means a much
      // deeper bound would hit the real StackOverflowError first
      maxDepth: Int = 256) {
    private var steps = 0L
    // explicit call-depth bound: unbounded script recursion would hit
    // the JVM's StackOverflowError (an Error — escapes pcall, kills
    // the task) long before the step budget; this surfaces it as a
    // catchable script error, like real Lua's "stack overflow"
    private var depth = 0
    private def tick(): Unit = {
      steps += 1
      if (steps > maxSteps) err("lua: step budget exceeded " +
        "(runaway loop?)")
    }

    /** Track the interpreter executing on this thread so that
      * interp-independent stdlib natives (string.gsub's function
      * replacement, gmatch iterators inside user loops) can call back
      * into user functions. Set once per outermost entry — re-entrant
      * calls see `prev eq this` and skip the ThreadLocal writes. */
    private def withActive[A](f: => A): A = {
      val prev = activeInterp.get
      if (prev eq this) f
      else {
        // outermost entry: the step budget bounds ONE top-level call
        // (a runaway loop), not the interpreter's lifetime — partition
        // runners reuse one Interp across every row of a partition and
        // a cumulative budget would spuriously trip on big partitions
        steps = 0L
        activeInterp.set(this)
        try f finally activeInterp.set(prev)
      }
    }

    def run(body: Seq[Stat], env: Env): Seq[V] = withActive {
      try { execBlock(body, env); Nil }
      catch { case r: ReturnSignal => r.vals }
    }

    def call(fn: V, args: Seq[V]): Seq[V] = withActive { callIn(fn, args) }

    private def callIn(fn: V, args: Seq[V]): Seq[V] = fn match {
      case VNative(_, f) => f(args)
      case VFunc(params, varargs, body, closure) =>
        depth += 1
        if (depth > maxDepth) {
          depth -= 1
          err(s"lua: stack overflow (call depth > $maxDepth)")
        }
        val local = new Env(Some(closure))
        params.zipWithIndex.foreach { case (pn, i) =>
          local.define(pn, if (i < args.size) args(i) else VNil)
        }
        if (varargs)
          local.define("...varargs",
            { val t = new VTable
              args.drop(params.size).zipWithIndex.foreach {
                case (v, i) => t.set(VInt(i + 1L), v) }
              t })
        try { execBlock(body, local); Nil }
        catch { case r: ReturnSignal => r.vals }
        finally depth -= 1
      case t: VTable =>
        t.meta.map(_.get(VStr("__call"))) match {
          case Some(f) if f != VNil => call(f, t +: args)
          case _ => err("lua: attempt to call a table value")
        }
      case other => err(s"lua: attempt to call a ${other.typeName} value")
    }

    private def execBlock(stats: Seq[Stat], env: Env): Unit =
      stats.foreach(exec(_, env))

    private def exec(s: Stat, env: Env): Unit = {
      tick()
      s match {
        case SLocal(names, init) =>
          val vals = evalMulti(init, env, names.size)
          names.zipWithIndex.foreach { case (n, i) =>
            env.define(n, vals.lift(i).getOrElse(VNil))
          }
          // local function recursion: rebind the closure env AFTER
          // definition (the closure captured env, which now holds it)
          ()
        case SAssign(targets, exprs) =>
          val vals = evalMulti(exprs, env, targets.size)
          targets.zipWithIndex.foreach { case (t, i) =>
            val v = vals.lift(i).getOrElse(VNil)
            t match {
              case EName(n) =>
                if (!env.assign(n, v)) env.globals.define(n, v)
              case EIndex(obj, key) =>
                evalOne(obj, env) match {
                  case tbl: VTable =>
                    val k = evalOne(key, env)
                    if (tbl.get(k) == VNil)
                      tbl.meta.map(_.get(VStr("__newindex"))) match {
                        case Some(f: VNative) => f.fn(Seq(tbl, k, v))
                        case Some(f: VFunc) => call(f, Seq(tbl, k, v))
                        case Some(mt: VTable) => mt.set(k, v)
                        case _ => tbl.set(k, v)
                      }
                    else tbl.set(k, v)
                  // userdata field writes (LuaRowNewIndex: a script
                  // mutating a record row, peerdb.go:197-421)
                  case u: VUserData if u.newindex != null =>
                    evalOne(key, env) match {
                      case VStr(k) => u.newindex(u.payload, k, v)
                      case VInt(k) => u.newindex(u.payload, k.toString, v)
                      case other => err("lua: invalid userdata key of " +
                        s"type ${other.typeName}")
                    }
                  case other => err("lua: attempt to index a " +
                    s"${other.typeName} value in assignment")
                }
              case _ => err("lua: invalid assignment target")
            }
          }
        case SCall(e) => eval(e, env)
        case SIf(branches, els) =>
          branches.find { case (c, _) => evalOne(c, env).truthy } match {
            case Some((_, body)) => execBlock(body, new Env(Some(env)))
            case None =>
              els.foreach(b => execBlock(b, new Env(Some(env))))
          }
        case SWhile(c, body) =>
          try while (evalOne(c, env).truthy) {
            tick()
            execBlock(body, new Env(Some(env)))
          } catch { case _: BreakSignal => () }
        case SRepeat(body, until) =>
          try {
            var go = true
            while (go) {
              tick()
              val local = new Env(Some(env))
              execBlock(body, local)
              if (evalOne(until, local).truthy) go = false
            }
          } catch { case _: BreakSignal => () }
        case SForNum(n, fromE, toE, stepE, body) =>
          val from = num(evalOne(fromE, env), "for initial value")
          val to = num(evalOne(toE, env), "for limit")
          val step = stepE.map(e => num(evalOne(e, env), "for step"))
            .getOrElse(1.0)
          if (step == 0) err("lua: 'for' step is zero")
          try {
            var i = from
            while ((step > 0 && i <= to) || (step < 0 && i >= to)) {
              tick()
              val local = new Env(Some(env))
              local.define(n,
                if (i.isWhole && from.isWhole && step.isWhole)
                  VInt(i.toLong) else VNum(i))
              execBlock(body, local)
              i += step
            }
          } catch { case _: BreakSignal => () }
        case SForIn(names, exprs, body) =>
          val vs = evalMulti(exprs, env, 3)
          val f = vs.headOption.getOrElse(VNil)
          var state = vs.lift(1).getOrElse(VNil)
          var control = vs.lift(2).getOrElse(VNil)
          try {
            var go = true
            while (go) {
              tick()
              val rs = call(f, Seq(state, control))
              val first = rs.headOption.getOrElse(VNil)
              if (first == VNil) go = false
              else {
                control = first
                val local = new Env(Some(env))
                names.zipWithIndex.foreach { case (nm, i) =>
                  local.define(nm, rs.lift(i).getOrElse(VNil))
                }
                execBlock(body, local)
              }
            }
          } catch { case _: BreakSignal => () }
        case SDo(body) => execBlock(body, new Env(Some(env)))
        case SReturn(exprs) =>
          throw new ReturnSignal(evalMulti(exprs, env, -1))
        case SBreak => throw new BreakSignal
      }
    }

    /** Evaluate an expression list with Lua's multi-value tail
      * expansion. `want` = -1 keeps everything. */
    private def evalMulti(exprs: Seq[Expr], env: Env,
        want: Int): Seq[V] =
      if (exprs.isEmpty) Nil
      else {
        val head = exprs.init.map(evalOne(_, env))
        val tail = eval(exprs.last, env)
        val all = head ++ tail
        if (want < 0) all
        else all.padTo(want, VNil)
      }

    /** Single-value evaluation WITHOUT the list allocation — the hot
      * path (every operand, index, condition and argument head goes
      * through here; only genuinely multi-valued nodes fall back to
      * [[eval]]). */
    def evalOne(e: Expr, env: Env): V = {
      tick()
      e match {
        case ENil() => VNil
        case ETrue() => VBool(true)
        case EFalse() => VBool(false)
        case EInt(v) => VInt(v)
        case ENum(v) => VNum(v)
        case EStr(v) => VStr(v)
        case EParen(inner) => evalOne(inner, env)
        case EName(n) => env.lookup(n).getOrElse(VNil)
        case EIndex(objE, keyE) =>
          index(evalOne(objE, env), evalOne(keyE, env))
        case EFunc(params, varargs, body) =>
          VFunc(params, varargs, body, env)
        case ETable(arr, kv) =>
          val t = new VTable
          if (arr.nonEmpty) {
            arr.init.zipWithIndex.foreach { case (ae, i) =>
              t.set(VInt(i + 1L), evalOne(ae, env))
            }
            // tail expands multi-values into the array part
            eval(arr.last, env).zipWithIndex.foreach { case (v, i) =>
              t.set(VInt(arr.size.toLong + i), v)
            }
          }
          kv.foreach { case (kE, vE) =>
            t.set(evalOne(kE, env), evalOne(vE, env))
          }
          t
        case EUn(op, inner) =>
          val v = evalOne(inner, env)
          op match {
            case "not" => VBool(!v.truthy)
            case "-" => v match {
              case VInt(i) => VInt(-i)
              case VNum(d) => VNum(-d)
              // __unm (LuaDecimalUnm / LuaBigIntUnm)
              case u: VUserData if u.arith != null => u.arith("unm", u, u)
              case other => tonum(other) match {
                case Some(VInt(i)) => VInt(-i)
                case Some(VNum(d)) => VNum(-d)
                case _ => err("lua: attempt to perform arithmetic on " +
                  s"a ${other.typeName} value")
              }
            }
            case "#" => v match {
              case VStr(s) => VInt(s.getBytes(
                java.nio.charset.StandardCharsets.UTF_8).length.toLong)
              case bs: VBytes => VInt(bs.b.length.toLong)
              case t: VTable => VInt(t.len)
              // `#row` = column count (LuaRowLen, peerdb.go's __len)
              case u: VUserData => u.payload match {
                case h: HasLuaLen => VInt(h.luaLen)
                case cols: Vector[_] => VInt(cols.size.toLong)
                case _ => err("lua: attempt to get length of a " +
                  "userdata value")
              }
              case other => err("lua: attempt to get length of a " +
                s"${other.typeName} value")
            }
          }
        case EBin("and", l, r) =>
          val lv = evalOne(l, env)
          if (!lv.truthy) lv else evalOne(r, env)
        case EBin("or", l, r) =>
          val lv = evalOne(l, env)
          if (lv.truthy) lv else evalOne(r, env)
        case EBin(op, l, r) =>
          binop(op, evalOne(l, env), evalOne(r, env))
        case _ => // calls / varargs: truncate the list
          eval(e, env).headOption.getOrElse(VNil)
      }
    }

    /** Evaluate to a value LIST — calls/varargs may yield many;
      * everything else routes through [[evalOne]]. */
    def eval(e: Expr, env: Env): Seq[V] = e match {
      case ECall(fnE, argEs) =>
        tick()
        call(evalOne(fnE, env), evalMulti(argEs, env, -1))
      case EMethod(objE, name, argEs) =>
        tick()
        val obj = evalOne(objE, env)
        val m = index(obj, VStr(name))
        call(m, obj +: evalMulti(argEs, env, -1))
      case EVararg() =>
        tick()
        env.lookup("...varargs") match {
          case Some(t: VTable) =>
            (1L to t.len).map(i => t.get(VInt(i)))
          case _ => Nil
        }
      case other => Seq(evalOne(other, env))
    }

    def index(obj: V, key: V): V = obj match {
      case t: VTable =>
        val direct = t.get(key)
        if (direct != VNil) direct
        else t.meta.map(_.get(VStr("__index"))) match {
          case Some(f: VNative) =>
            f.fn(Seq(t, key)).headOption.getOrElse(VNil)
          case Some(f: VFunc) =>
            call(f, Seq(t, key)).headOption.getOrElse(VNil)
          case Some(mt: VTable) => index(mt, key)
          case _ => VNil
        }
      case u: VUserData => key match {
        case VStr(k) => u.index(u.payload, k)
        // numeric indexing (LuaUuidIndex: uuid[0]..uuid[15] are the
        // raw bytes) routes through the decimal image of the key
        case VInt(k) => u.index(u.payload, k.toString)
        case _ => VNil
      }
      case VStr(s) => key match {
        // strings index into the string library (s:sub(...) sugar)
        case VStr(m) => stringLib.get(m).getOrElse(VNil)
        case _ => VNil
      }
      case _: VBytes => key match {
        // byte strings ARE strings: b:byte(...) sugar works on them
        case VStr(m) => stringLib.get(m).getOrElse(VNil)
        case _ => VNil
      }
      case VNil => err("lua: attempt to index a nil value")
      case other =>
        err(s"lua: attempt to index a ${other.typeName} value")
    }

    private def num(v: V, what: String): Double = v match {
      case VInt(i) => i.toDouble
      case VNum(d) => d
      case other => tonum(other) match {
        case Some(VInt(i)) => i.toDouble
        case Some(VNum(d)) => d
        case _ => err(s"lua: $what must be a number, got " +
          other.typeName)
      }
    }

    private def arith(op: String, l: V, r: V): V = {
      // userdata arithmetic metamethods (first operand's, else the
      // second's — Lua's binary-metamethod dispatch order)
      val hook = l match {
        case u: VUserData if u.arith != null => u.arith
        case _ => r match {
          case u: VUserData if u.arith != null => u.arith
          case _ => null
        }
      }
      if (hook != null) return hook(op, l, r)
      def asNum(v: V): Either[Long, Double] = v match {
        case VInt(i) => Left(i)
        case VNum(d) => Right(d)
        case other => tonum(other) match {
          case Some(VInt(i)) => Left(i)
          case Some(VNum(d)) => Right(d)
          case _ => err("lua: attempt to perform arithmetic on a " +
            s"${other.typeName} value")
        }
      }
      (asNum(l), asNum(r)) match {
        case (Left(a), Left(b)) => op match {
          case "+" => VInt(a + b)
          case "-" => VInt(a - b)
          case "*" => VInt(a * b)
          case "/" => VNum(a.toDouble / b)
          case "//" =>
            if (b == 0) err("lua: attempt to perform 'n//0'")
            else VInt(Math.floorDiv(a, b))
          case "%" =>
            if (b == 0) err("lua: attempt to perform 'n%%0'")
            else VInt(Math.floorMod(a, b))
          case "^" => VNum(math.pow(a.toDouble, b.toDouble))
          case _ => err(s"lua: bad arith op $op")
        }
        case (a, b) =>
          val (x, y) = (a.fold(_.toDouble, identity),
            b.fold(_.toDouble, identity))
          op match {
            case "+" => VNum(x + y)
            case "-" => VNum(x - y)
            case "*" => VNum(x * y)
            case "/" => VNum(x / y)
            case "//" => VNum(math.floor(x / y))
            case "%" => VNum(x - math.floor(x / y) * y)
            case "^" => VNum(math.pow(x, y))
            case _ => err(s"lua: bad arith op $op")
          }
      }
    }

    private def cmp(l: V, r: V): Int = (l, r) match {
      case (VInt(a), VInt(b)) => java.lang.Long.compare(a, b)
      case (VInt(a), VNum(b)) => java.lang.Double.compare(a.toDouble, b)
      case (VNum(a), VInt(b)) => java.lang.Double.compare(a, b.toDouble)
      case (VNum(a), VNum(b)) => java.lang.Double.compare(a, b)
      case (VStr(a), VStr(b)) => a.compareTo(b)
      // __lt/__le between two userdata of the same tag (LuaTimeLt,
      // LuaDecimalLe, LuaBigIntLt — fires only when both operands
      // share the handler, like the reference's metamethods)
      case (a: VUserData, b: VUserData)
          if a.tag == b.tag && a.order != null =>
        a.order(a.payload, b.payload)
      case _ => err("lua: attempt to compare " +
        s"${l.typeName} with ${r.typeName}")
    }

    private def rawEq(l: V, r: V): Boolean = (l, r) match {
      case (VInt(a), VNum(b)) => a.toDouble == b
      case (VNum(a), VInt(b)) => a == b.toDouble
      case (a: VTable, b: VTable) => a eq b
      // __eq is value equality through the order hook when present
      // (LuaDecimalEq is Cmp==0 — scale-insensitive, so 1.5 == 1.50)
      case (a: VUserData, b: VUserData)
          if a.tag == b.tag && a.order != null =>
        a.order(a.payload, b.payload) == 0
      case (a: VUserData, b: VUserData) => a.payload == b.payload
      // a byte string equals a text string whose UTF-8 image matches
      // (one string type in real Lua)
      case (a: VBytes, VStr(s)) => java.util.Arrays.equals(a.b,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (VStr(s), b: VBytes) => java.util.Arrays.equals(b.b,
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case _ => l == r
    }

    private def binop(op: String, l: V, r: V): V = op match {
      case "+" | "-" | "*" | "/" | "%" | "^" | "//" => arith(op, l, r)
      case ".." => (l, r) match {
        // byte-string concat stays bytes (text sides join via UTF-8)
        case (a: VBytes, b) if b.isInstanceOf[VBytes] ||
            b.isInstanceOf[VStr] || b.isInstanceOf[VInt] ||
            b.isInstanceOf[VNum] =>
          VBytes(a.b ++ rawBytes(b))
        case (a, b: VBytes) if a.isInstanceOf[VStr] ||
            a.isInstanceOf[VInt] || a.isInstanceOf[VNum] =>
          VBytes(rawBytes(a) ++ b.b)
        case (a, b) if (a.isInstanceOf[VStr] || a.isInstanceOf[VInt] ||
            a.isInstanceOf[VNum] || a.isInstanceOf[VUserData]) &&
            (b.isInstanceOf[VStr] || b.isInstanceOf[VInt] ||
              b.isInstanceOf[VNum] || b.isInstanceOf[VUserData]) =>
          VStr(tostr(a) + tostr(b))
        case _ =>
          val bad = if (l.isInstanceOf[VStr] || l.isInstanceOf[VInt] ||
            l.isInstanceOf[VNum]) r else l
          err(s"lua: attempt to concatenate a ${bad.typeName} value")
      }
      case "==" => VBool(rawEq(l, r))
      case "~=" => VBool(!rawEq(l, r))
      case "<" => VBool(cmp(l, r) < 0)
      case "<=" => VBool(cmp(l, r) <= 0)
      case ">" => VBool(cmp(l, r) > 0)
      case ">=" => VBool(cmp(l, r) >= 0)
      case other => err(s"lua: bad operator $other")
    }
  }

  // --------------------------------------------------- standard library

  private def native(name: String)(f: Seq[V] => Seq[V]): VNative =
    VNative(name, f)

  private def one(v: V): Seq[V] = Seq(v)

  /** string.* — also reachable via `("x"):sub(...)` sugar. */
  private[transform] lazy val stringLib: Map[String, V] = Map(
    "len" -> native("len") { args =>
      one(VInt(str(args, 0).getBytes(
        java.nio.charset.StandardCharsets.UTF_8).length.toLong))
    },
    "sub" -> native("sub") { args =>
      val s = str(args, 0)
      val n = s.length
      def norm(v: Long, dflt: Long): Int = {
        val x = if (v < 0) n + v + 1 else if (v == 0) 1 else v
        math.max(1, math.min(n + 1, x.toInt))
      }
      val i = norm(int(args, 1, 1), 1)
      val j = args.lift(2).map(v => int(Seq(v), 0, -1)) match {
        case Some(v) =>
          val x = if (v < 0) n + v + 1 else v
          math.max(0, math.min(n, x.toInt))
        case None => n
      }
      one(VStr(if (i > j) "" else s.substring(i - 1, j)))
    },
    "upper" -> native("upper")(a => one(VStr(str(a, 0).toUpperCase))),
    "lower" -> native("lower")(a => one(VStr(str(a, 0).toLowerCase))),
    "rep" -> native("rep") { a =>
      one(VStr(str(a, 0) * math.max(0, int(a, 1, 0)).toInt))
    },
    "reverse" -> native("reverse")(a => one(VStr(str(a, 0).reverse))),
    "byte" -> native("byte") { a =>
      val s = str(a, 0); val i = int(a, 1, 1).toInt
      if (i >= 1 && i <= s.length) one(VInt(s.charAt(i - 1).toLong))
      else Nil
    },
    "char" -> native("char") { a =>
      // real Lua strings are BYTES: codes beyond ASCII must keep byte
      // identity (string.char(0xc4) is the single byte 0xc4, not a
      // two-byte UTF-8 'Ä'), so those return a byte string — pure
      // ASCII stays text, where the two representations agree
      val codes = a.map(v => int(Seq(v), 0, 0))
      if (codes.exists(c => c > 127 || c < 0))
        one(VBytes(codes.map(_.toByte).toArray))
      else one(VStr(codes.map(_.toChar).mkString))
    },
    "format" -> native("format") { a =>
      val fmt = str(a, 0)
      val out = new StringBuilder
      var ai = 1
      var i = 0
      while (i < fmt.length) {
        val c = fmt.charAt(i)
        if (c != '%') { out.append(c); i += 1 }
        else {
          // %[flags][width][.prec]conv — delegate to java format
          var j = i + 1
          while (j < fmt.length &&
            "-+ #0123456789.".indexOf(fmt.charAt(j)) >= 0) j += 1
          if (j >= fmt.length) err("lua: invalid format string")
          val conv = fmt.charAt(j)
          val spec = fmt.substring(i, j + 1)
          conv match {
            case '%' => out.append('%')
            case 'd' | 'i' =>
              out.append(spec.dropRight(1).concat("d")
                .format(int(a, ai, 0))); ai += 1
            case 'u' =>
              out.append(int(a, ai, 0).toString); ai += 1
            case 'x' | 'X' | 'o' =>
              out.append(spec.format(int(a, ai, 0))); ai += 1
            case 'f' | 'F' | 'g' | 'G' | 'e' | 'E' =>
              out.append(spec.format(dbl(a, ai))); ai += 1
            case 's' =>
              out.append(spec.format(tostr(
                a.lift(ai).getOrElse(VNil)))); ai += 1
            case 'q' =>
              out.append("\"" + str(a, ai).replace("\\", "\\\\")
                .replace("\"", "\\\"").replace("\n", "\\n") + "\"")
              ai += 1
            case other => err(s"lua: unsupported format %$other")
          }
          i = j + 1
        }
      }
      one(VStr(out.toString))
    },
    "find" -> native("find") { a =>
      val s = str(a, 0); val pat = str(a, 1)
      val init = findInit(int(a, 2, 1), s.length)
      if (a.lift(3).exists(_.truthy)) {
        // plain find: the 4th-arg-true form turns patterns off
        val idx = s.indexOf(pat, init)
        if (idx < 0) one(VNil)
        else Seq(VInt(idx + 1L), VInt(idx.toLong + pat.length))
      } else LuaPattern.matchFrom(s, pat, init) match {
        case None => one(VNil)
        case Some(m) =>
          Seq(VInt(m.start + 1L), VInt(m.end.toLong)) ++
            (if (m.caps.isEmpty) Nil
             else m.captures(s).map(capV))
      }
    },
    "match" -> native("match") { a =>
      val s = str(a, 0); val pat = str(a, 1)
      val init = findInit(int(a, 2, 1), s.length)
      LuaPattern.matchFrom(s, pat, init) match {
        case None => one(VNil)
        case Some(m) => m.captures(s).map(capV)
      }
    },
    "gmatch" -> native("gmatch") { a =>
      val s = str(a, 0); val pat = str(a, 1)
      var pos = 0
      one(native("gmatch_iter") { _ =>
        if (pos > s.length) one(VNil)
        else LuaPattern.matchFrom(s, pat, pos,
            caretLiteral = true) match {
          case None => pos = s.length + 1; one(VNil)
          case Some(m) =>
            // an empty match must not stall the iteration
            pos = if (m.end > m.start) m.end else m.end + 1
            m.captures(s).map(capV)
        }
      })
    },
    "gsub" -> native("gsub") { a =>
      val s = str(a, 0); val pat = str(a, 1)
      val repl = a.lift(2).getOrElse(VNil)
      val maxN = a.lift(3) match {
        case None | Some(VNil) => Long.MaxValue
        case _ => int(a, 3, Long.MaxValue)
      }
      val anchored = pat.nonEmpty && pat.charAt(0) == '^'
      val out = new StringBuilder
      var pos = 0
      var count = 0L
      var going = true
      while (going && count < maxN && pos <= s.length) {
        LuaPattern.matchFrom(s, pat, pos) match {
          case Some(m) =>
            count += 1
            out.append(s.substring(pos, m.start))
            out.append(gsubValue(repl, s, m))
            if (m.end > m.start) pos = m.end
            else { // empty match: keep the char, step past it
              if (m.start < s.length) out.append(s.charAt(m.start))
              pos = m.start + 1
            }
            if (anchored) going = false
          case None => going = false
        }
      }
      out.append(s.substring(math.min(pos, s.length)))
      Seq(VStr(out.toString), VInt(count))
    })

  /** 1-based (possibly negative) init → clamped 0-based offset, the
    * posrelat dance of lstrlib's str_find_aux. */
  private def findInit(pos: Long, len: Int): Int = {
    val rel = if (pos >= 0) pos else if (-pos > len) 0L else len + pos + 1
    math.min(math.max(rel - 1, 0L), len.toLong).toInt
  }

  private def capV(c: Either[Long, String]): V = c match {
    case Left(p) => VInt(p)
    case Right(s) => VStr(s)
  }

  /** One gsub replacement (lstrlib add_value): string repl expands
    * %0-%9, a table is indexed by the first capture, a function is
    * called with all captures; nil/false keep the original match. */
  private def gsubValue(repl: V, src: String, m: LuaPattern.M): String = {
    lazy val whole = src.substring(m.start, m.end)
    lazy val caps = m.captures(src).map(capV)
    repl match {
      case VStr(r) =>
        val sb = new StringBuilder
        var i = 0
        while (i < r.length) {
          val c = r.charAt(i)
          if (c == '%') {
            if (i + 1 >= r.length)
              err("lua: invalid use of '%' in replacement string")
            val d = r.charAt(i + 1)
            if (d == '%') sb.append('%')
            else if (d == '0') sb.append(whole)
            else if (d >= '1' && d <= '9') {
              val k = d - '1'
              if (k >= caps.length)
                err(s"lua: invalid capture index %$d")
              sb.append(tostr(caps(k)))
            } else err("lua: invalid use of '%' in replacement string")
            i += 2
          } else { sb.append(c); i += 1 }
        }
        sb.toString
      case t: VTable => t.get(caps.head) match {
        case VNil | VBool(false) => whole
        case v @ (_: VStr | _: VInt | _: VNum) => tostr(v)
        case other =>
          err(s"lua: invalid replacement value (a ${other.typeName})")
      }
      case f @ (_: VFunc | _: VNative) =>
        callback(f, caps).headOption.getOrElse(VNil) match {
          case VNil | VBool(false) => whole
          case v @ (_: VStr | _: VInt | _: VNum) => tostr(v)
          case bs: VBytes => bs.latin1
          case other =>
            err(s"lua: invalid replacement value (a ${other.typeName})")
        }
      case other =>
        err("lua: bad argument to gsub (string/table/function " +
          s"expected, got ${other.typeName})")
    }
  }

  private def str(args: Seq[V], i: Int): String =
    args.lift(i) match {
      case Some(VStr(s)) => s
      // byte strings enter the text stdlib through their latin1 image
      // (one char per byte, lossless — so b:byte(i) IS the raw byte)
      case Some(bs: VBytes) => bs.latin1
      case Some(VInt(n)) => n.toString
      case Some(VNum(d)) => tostr(VNum(d))
      case other => err(s"lua: string expected, got " +
        other.map(_.typeName).getOrElse("no value"))
    }
  private def int(args: Seq[V], i: Int, dflt: Long): Long =
    args.lift(i) match {
      case Some(VInt(n)) => n
      case Some(VNum(d)) => d.toLong
      case Some(VStr(s)) => tonum(VStr(s)) match {
        case Some(VInt(n)) => n
        case Some(VNum(d)) => d.toLong
        case _ => err("lua: number expected")
      }
      case _ => dflt
    }
  private def dbl(args: Seq[V], i: Int): Double =
    args.lift(i) match {
      case Some(VInt(n)) => n.toDouble
      case Some(VNum(d)) => d
      // via tonum, not toDouble: "abc" must be a SCRIPT error (pcall
      // catches LuaError), never a host NumberFormatException that
      // kills the Spark task
      case Some(VStr(s)) => tonum(VStr(s)) match {
        case Some(VInt(n)) => n.toDouble
        case Some(VNum(d)) => d
        case _ => err(s"lua: number expected, got string '$s'")
      }
      case other => err("lua: number expected, got " +
        other.map(_.typeName).getOrElse("no value"))
    }

  /** The sandboxed base environment: stdlib subset + `require` over
    * the provided module map. `printSink` receives print() lines (the
    * reference routes them to flow logs, LuaPrintFn). `loader`
    * resolves non-builtin module names to lua SOURCE — the reference's
    * LoadPeerdbScript loader (peerdb.go:37-147: `require "name"` reads
    * the scripts catalog); loaded chunks run once against the globals
    * and cache their return value (package.loaded semantics). */
  def baseEnv(interp: Interp, modules: Map[String, VTable] = Map.empty,
      printSink: String => Unit = _ => (),
      loader: String => Option[String] = _ => None): Env = {
    val g = new Env(None)
    def tbl(entries: (String, V)*): VTable = {
      val t = new VTable
      entries.foreach { case (k, v) => t.set(VStr(k), v) }
      t
    }
    g.define("print", native("print") { args =>
      printSink(args.map(tostr).mkString("\t")); Nil
    })
    g.define("type", native("type")(a =>
      one(VStr(a.headOption.getOrElse(VNil).typeName))))
    g.define("tostring", native("tostring")(a =>
      one(VStr(tostr(a.headOption.getOrElse(VNil))))))
    g.define("tonumber", native("tonumber")(a =>
      one(tonum(a.headOption.getOrElse(VNil)).getOrElse(VNil))))
    g.define("error", native("error") { a =>
      err(tostr(a.headOption.getOrElse(VNil)))
    })
    g.define("assert", native("assert") { a =>
      if (!a.headOption.getOrElse(VNil).truthy)
        err(a.lift(1).map(tostr).getOrElse("assertion failed!"))
      a
    })
    g.define("pcall", native("pcall") { a =>
      try VBool(true) +: interp.call(a.headOption.getOrElse(VNil),
        a.drop(1))
      catch {
        case e: LuaError => Seq(VBool(false), VStr(e.getMessage))
        // control-flow signals are NOT errors — let them propagate
        case s: BreakSignal => throw s
        case s: ReturnSignal => throw s
        // host-level leaks (parser/stdlib edge cases) surface as
        // script errors, never as a dead Spark task; StackOverflow is
        // an Error, so name it explicitly
        case e: StackOverflowError =>
          Seq(VBool(false), VStr("lua: stack overflow"))
        case scala.util.control.NonFatal(e) =>
          Seq(VBool(false), VStr("lua: host error: " + e.toString))
      }
    })
    g.define("select", native("select") { a =>
      a.headOption match {
        case Some(VStr("#")) => one(VInt(a.size - 1L))
        case Some(VInt(n)) => a.drop(n.toInt)
        case _ => err("lua: bad argument to select")
      }
    })
    g.define("rawget", native("rawget") { a =>
      (a.headOption, a.lift(1)) match {
        case (Some(t: VTable), Some(k)) => one(t.get(k))
        case _ => err("lua: rawget needs a table")
      }
    })
    g.define("rawset", native("rawset") { a =>
      (a.headOption, a.lift(1), a.lift(2)) match {
        case (Some(t: VTable), Some(k), Some(v)) => t.set(k, v); one(t)
        case _ => err("lua: rawset needs a table")
      }
    })
    g.define("setmetatable", native("setmetatable") { a =>
      (a.headOption, a.lift(1)) match {
        case (Some(t: VTable), Some(m: VTable)) =>
          t.meta = Some(m); one(t)
        case (Some(t: VTable), Some(VNil)) => t.meta = None; one(t)
        case _ => err("lua: setmetatable needs (table, table|nil)")
      }
    })
    g.define("getmetatable", native("getmetatable") { a =>
      a.headOption match {
        case Some(t: VTable) => one(t.meta.getOrElse(VNil))
        case _ => one(VNil)
      }
    })
    g.define("pairs", native("pairs") { a =>
      a.headOption match {
        case Some(t: VTable) =>
          val it = t.hash.toSeq.iterator
          Seq(native("next") { _ =>
            if (it.hasNext) { val (k, v) = it.next(); Seq(k, v) }
            else one(VNil)
          }, t, VNil)
        case _ => err("lua: pairs needs a table")
      }
    })
    g.define("ipairs", native("ipairs") { a =>
      a.headOption match {
        case Some(t: VTable) =>
          Seq(native("inext") { st =>
            val i = int(st, 1, 0) + 1
            val v = t.get(VInt(i))
            if (v == VNil) one(VNil) else Seq(VInt(i), v)
          }, t, VInt(0))
        case _ => err("lua: ipairs needs a table")
      }
    })
    val strT = tbl(stringLib.toSeq: _*)
    g.define("string", strT)
    g.define("table", tbl(
      "insert" -> native("insert") { a =>
        a.headOption match {
          case Some(t: VTable) =>
            if (a.size >= 3) {
              val pos = int(a, 1, 1)
              var i = t.len
              while (i >= pos) { t.set(VInt(i + 1), t.get(VInt(i)))
                i -= 1 }
              t.set(VInt(pos), a(2))
            } else t.set(VInt(t.len + 1),
              a.lift(1).getOrElse(VNil))
            Nil
          case _ => err("lua: table.insert needs a table")
        }
      },
      "remove" -> native("remove") { a =>
        a.headOption match {
          case Some(t: VTable) =>
            val n = t.len
            if (n == 0) one(VNil)
            else {
              val pos = int(a, 1, n)
              val removed = t.get(VInt(pos))
              var i = pos
              while (i < n) { t.set(VInt(i), t.get(VInt(i + 1)))
                i += 1 }
              t.set(VInt(n), VNil)
              one(removed)
            }
          case _ => err("lua: table.remove needs a table")
        }
      },
      "concat" -> native("concat") { a =>
        a.headOption match {
          case Some(t: VTable) =>
            val sep = a.lift(1).map(tostr).getOrElse("")
            one(VStr((1L to t.len).map(i => tostr(t.get(VInt(i))))
              .mkString(sep)))
          case _ => err("lua: table.concat needs a table")
        }
      }))
    g.define("math", tbl(
      "floor" -> native("floor")(a => one(VInt(math.floor(dbl(a, 0))
        .toLong))),
      "ceil" -> native("ceil")(a => one(VInt(math.ceil(dbl(a, 0))
        .toLong))),
      "abs" -> native("abs")(a => a.headOption match {
        case Some(VInt(i)) => one(VInt(math.abs(i)))
        case _ => one(VNum(math.abs(dbl(a, 0))))
      }),
      "max" -> native("max")(a => one(a.maxBy(v => dbl(Seq(v), 0)))),
      "min" -> native("min")(a => one(a.minBy(v => dbl(Seq(v), 0)))),
      "fmod" -> native("fmod")(a =>
        one(VNum(dbl(a, 0) % dbl(a, 1)))),
      "huge" -> VNum(Double.PositiveInfinity),
      "pi" -> VNum(math.Pi)))
    val loadedModules = mutable.HashMap.empty[String, V]
    val loading = mutable.HashSet.empty[String]
    g.define("require", native("require") { a =>
      val name = str(a, 0)
      modules.get(name) match {
        case Some(m) => one(m)
        case None => loadedModules.get(name) match {
          case Some(v) => one(v)
          case None =>
            if (!loading.add(name))
              err(s"lua: loop in require('$name')")
            try loader(name) match {
              case Some(src) =>
                // the chunk runs against the globals (the reference's
                // ls.Load + call); its return value is the module —
                // a return-less library chunk yields `true` like 5.1
                val v = interp.run(parse(src), g)
                  .headOption.getOrElse(VBool(true))
                loadedModules(name) = v
                one(v)
              case None =>
                // the reference's loader message, peerdb.go:134-136
                err(s"lua: Could not find script $name (builtin: " +
                  s"${modules.keys.toSeq.sorted.mkString(", ")})")
            } finally loading.remove(name)
        }
      }
    })
    g
  }

  /** Parse a script. Throws [[LuaError]] with a position on bad
    * syntax — the DDL-time check. */
  def parse(src: String): Seq[Stat] = new Parser(lex(src)).chunk()
}
