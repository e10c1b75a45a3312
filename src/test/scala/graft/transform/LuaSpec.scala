package graft.transform

import org.scalatest.funsuite.AnyFunSuite

import graft.transform.Lua._

/** The minimal Lua interpreter: language semantics (closures,
  * multi-returns, metatables, stdlib) and the peerdb record
  * environment (flow/pua/peerdb.go surface) — the substrate
  * `script_lang 'lua'` queue routing runs on. */
class LuaSpec extends AnyFunSuite {

  private def run(src: String): Seq[V] = {
    val interp = new Interp()
    val env = LuaRecordEnv.env(interp)
    interp.run(Lua.parse("return (function() " + src +
      " end)()"), env)
  }
  private def evalStr(src: String): String =
    run(s"return $src").headOption.map(tostr).getOrElse("nil")

  test("literals, arithmetic, integer exactness, precedence") {
    assert(evalStr("1 + 2 * 3") == "7")
    assert(evalStr("(1 + 2) * 3") == "9")
    assert(evalStr("7 // 2") == "3")
    assert(evalStr("-7 // 2") == "-4") // floor division
    assert(evalStr("7 % 3") == "1")
    assert(evalStr("-1 % 3") == "2") // Lua modulo is floored
    assert(evalStr("2^10") == "1024")
    assert(evalStr("10 / 4") == "2.5")
    assert(evalStr("9007199254740993 + 0") == "9007199254740993",
      "int arithmetic must not round through double")
    assert(evalStr("0x1F") == "31")
    assert(evalStr("'a' .. 1 .. 'b'") == "a1b")
    assert(evalStr("1 == 1 and 'y' or 'n'") == "y")
    intercept[LuaError] { run("return 'a' .. true") } // like real Lua
    assert(evalStr("1 == 1.0") == "true")
    assert(evalStr("'10' + 5") == "15") // string→number coercion
  }

  test("strings: escapes, length, concat, stdlib") {
    assert(evalStr("""#"héllo"""") == "6") // byte length, like Lua
    assert(evalStr("""("Hello"):upper()""") == "HELLO")
    assert(evalStr("""string.sub("hello", 2, 4)""") == "ell")
    assert(evalStr("""("hello"):sub(-3)""") == "llo")
    assert(evalStr("""string.rep("ab", 3)""") == "ababab")
    assert(evalStr("""string.format("%s=%d/%x", "k", 42, 255)""") ==
      "k=42/ff")
    assert(evalStr("""string.format("%.2f", 1.5)""") == "1.50")
    assert(evalStr("""("a,b,c"):find(",", 1)""") == "2")
    assert(evalStr("""("a,b"):gsub(",", ";")""") == "a;b")
    assert(evalStr(""""x\ty\n"""") == "x\ty\n")
  }

  test("tables: constructors, nesting, length, insert/concat, pairs") {
    assert(evalStr("#({10, 20, 30})") == "3")
    assert(evalStr("({a = 1, b = 2}).b") == "2")
    assert(evalStr("({[2 + 2] = 'four'})[4]") == "four")
    assert(run("""
      local t = {}
      for i = 1, 5 do table.insert(t, i * i) end
      return table.concat(t, ",")
    """).map(tostr) == Seq("1,4,9,16,25"))
    assert(run("""
      local sum = 0
      for k, v in pairs({a = 1, b = 2, c = 3}) do sum = sum + v end
      return sum
    """).map(tostr) == Seq("6"))
    assert(run("""
      local out = {}
      for i, v in ipairs({"x", "y"}) do out[#out + 1] = i .. v end
      return table.concat(out, "|")
    """).map(tostr) == Seq("1x|2y"))
  }

  test("control flow: if/elseif, while, repeat, numeric for, break") {
    assert(run("""
      local function classify(n)
        if n < 0 then return "neg"
        elseif n == 0 then return "zero"
        else return "pos" end
      end
      return classify(-5), classify(0), classify(9)
    """).map(tostr) == Seq("neg", "zero", "pos"))
    assert(run("""
      local n, i = 0, 0
      while true do
        i = i + 1
        if i > 10 then break end
        n = n + i
      end
      return n
    """).map(tostr) == Seq("55"))
    assert(run("""
      local i = 0
      repeat i = i + 3 until i > 10
      return i
    """).map(tostr) == Seq("12"))
    assert(run("""
      local s = ""
      for i = 10, 1, -3 do s = s .. i .. " " end
      return s
    """).map(tostr) == Seq("10 7 4 1 "))
  }

  test("functions: closures, multiple returns, varargs, method sugar, " +
    "recursion") {
    assert(run("""
      local function counter()
        local n = 0
        return function() n = n + 1 return n end
      end
      local c = counter()
      c(); c()
      return c()
    """).map(tostr) == Seq("3"))
    assert(run("""
      local function mm(a, b) return b, a end
      local x, y = mm(1, 2)
      return x, y
    """).map(tostr) == Seq("2", "1"))
    assert(run("""
      local function sum(...)
        local t = {...}
        local s = 0
        for i = 1, #t do s = s + t[i] end
        return s
      end
      return sum(1, 2, 3, 4)
    """).map(tostr) == Seq("10"))
    assert(run("""
      local obj = {n = 41}
      function obj:bump() self.n = self.n + 1 return self.n end
      return obj:bump()
    """).map(tostr) == Seq("42"))
    assert(run("""
      local function fib(n)
        if n < 2 then return n end
        return fib(n - 1) + fib(n - 2)
      end
      return fib(15)
    """).map(tostr) == Seq("610"))
  }

  test("metatables: __index chain (table and function), __tostring, " +
    "__call; pcall catches errors") {
    assert(run("""
      local base = {greet = function(self) return "hi " .. self.name end}
      local obj = setmetatable({name = "bob"}, {__index = base})
      return obj:greet()
    """).map(tostr) == Seq("hi bob"))
    assert(run("""
      local t = setmetatable({}, {__index = function(t, k)
        return k .. "!"
      end})
      return t.boom
    """).map(tostr) == Seq("boom!"))
    assert(run("""
      local ok, err = pcall(function() error("kaput") end)
      return ok, err
    """).map(tostr) == Seq("false", "kaput"))
    assert(run("""
      local f = setmetatable({}, {__call = function(self, x)
        return x * 2
      end})
      return f(21)
    """).map(tostr) == Seq("42"))
  }

  test("sandbox: no io/os, unknown require fails, runaway loops cut " +
    "off by the step budget") {
    assert(evalStr("io") == "nil")
    assert(evalStr("os") == "nil")
    intercept[LuaError] { run("""return require("socket")""") }
    val interp = new Interp(maxSteps = 10000)
    val env = LuaRecordEnv.env(interp)
    intercept[LuaError] {
      interp.run(Lua.parse("while true do end"), env)
    }
  }

  test("step budget bounds ONE top-level call, not the interpreter's " +
    "lifetime: a partition runner reusing one Interp over many rows " +
    "must not spuriously trip on the cumulative count") {
    val interp = new Interp(maxSteps = 5000)
    val env = LuaRecordEnv.env(interp)
    interp.run(Lua.parse(
      "function f() local s = 0; for i = 1, 100 do s = s + i end; " +
        "return s end"), env)
    val fn = env.lookup("f").get
    // each call burns a few hundred steps; 100 calls would blow a
    // 5000-step LIFETIME budget many times over
    (1 to 100).foreach { _ =>
      assert(interp.call(fn, Nil).map(tostr) == Seq("5050"))
    }
    // the per-call bound still trips on an actual runaway call
    intercept[LuaError] {
      interp.run(Lua.parse("while true do end"), env)
    }
  }

  test("semantics torture battery: each snippet pinned to the value " +
    "real Lua produces") {
    val cases: Seq[(String, String)] = Seq(
      "tostring(10 / 2)" -> "5",
      "tostring(2 ^ 2)" -> "4",
      """#("")""" -> "0",
      """("abc"):byte(2)""" -> "98",
      "string.char(104, 105)" -> "hi",
      "table.remove({1, 2, 3})" -> "3",
      """select("#", 1, nil, 3)""" -> "3",
      """tonumber("0x10")""" -> "16",
      """tostring(tonumber("abc"))""" -> "nil",
      """("%d"):format(42)""" -> "42",
      """string.format("%5d", 42)""" -> "   42",
      "math.min(3, 1, 2)" -> "1",
      "math.floor(-1.5)" -> "-2",
      """tostring(nil == false)""" -> "false",
      """-"5"""" -> "-5", // unary minus coerces strings
      "tostring(1e3)" -> "1000",
      """tostring("10" < "9")""" -> "true", // string compare
      "tostring(10 < 9)" -> "false",
      """tostring(#{10, 20} == 2)""" -> "true",
      // rawget bypasses __index
      """rawget(setmetatable({}, {__index = function() return 1 end}),
        "k") == nil and "raw" or "meta"""" -> "raw",
      // float keys normalize onto integer slots
      "({[1.0] = 'x'})[1]" -> "x")
    cases.foreach { case (src, want) =>
      assert(evalStr(src.replace("\n", " ")) == want,
        s"snippet: $src")
    }
    // parenthesized call truncates to ONE value
    assert(run("""
      local function two() return 1, 2 end
      local a, b = (two())
      return tostring(a), tostring(b)
    """).map(tostr) == Seq("1", "nil"))
    // a descending range with a positive step never runs
    assert(run("""
      local n = 0
      for i = 3, 1 do n = n + 1 end
      return n
    """).map(tostr) == Seq("0"))
    // multiple returns expand only in the TAIL position
    assert(run("""
      local function two() return 1, 2 end
      local t = {two(), two()}
      return #t
    """).map(tostr) == Seq("3"))
  }

  test("bit32 module (gluabit32 parity): 32-bit unsigned semantics") {
    assert(evalStr("""require("bit32").band(0xFF, 0x0F)""") == "15")
    assert(evalStr("""require("bit32").bor(0xF0, 0x0F)""") == "255")
    assert(evalStr("""require("bit32").bxor(0xFF, 0x0F)""") == "240")
    assert(evalStr("""require("bit32").bnot(0)""") == "4294967295")
    assert(evalStr("""require("bit32").lshift(1, 31)""") == "2147483648")
    assert(evalStr("""require("bit32").rshift(0x80000000, 31)""") == "1")
    assert(evalStr("""require("bit32").lshift(1, 32)""") == "0")
  }

  test("closures in loops capture the per-iteration variable; nested " +
    "scoping shadows correctly") {
    assert(run("""
      local fns = {}
      for i = 1, 3 do fns[i] = function() return i end end
      return fns[1]() .. fns[2]() .. fns[3]()
    """).map(tostr) == Seq("123"))
    assert(run("""
      local x = "outer"
      do local x = "inner"; assert(x == "inner") end
      return x
    """).map(tostr) == Seq("outer"))
  }

  test("json module: encode arrays vs objects, nested values, decode " +
    "round trip") {
    assert(evalStr("""require("json").encode({1, 2, 3})""") == "[1,2,3]")
    assert(evalStr("""require("json").encode({a = 1})""") ==
      """{"a":1}""")
    assert(evalStr("""require("json").encode({})""") == "[]")
    assert(evalStr(
      """require("json").encode({s = "q\"uote", n = 1.5, b = true,
        |x = {1, {y = 2}}})""".stripMargin.replace("\n", " "))
      .contains(""""s":"q\"uote""""))
    assert(run("""
      local json = require "json"
      local v = json.decode('{"id": 7, "tags": ["a", "b"], "d": 1.25}')
      return v.id, v.tags[2], v.d
    """).map(tostr) == Seq("7", "b", "1.25"))
  }

  test("peerdb record surface: kind/row/old/new/target/source/" +
    "checkpoint/commit_time/unchanged_columns (peerdb.go:476-540)") {
    import LuaRecordEnv._
    val upd = Rec(graft.model.ChangeRecord.TypeUpdate, 777L,
      1700000000000000L, 9L, "public.src_t", "dest_t",
      """{"id":1,"v":20,"big":null}""", """{"id":1,"v":10}""",
      Seq("toasty"))
    val interp = new Interp()
    val env = LuaRecordEnv.env(interp)
    env.define("r", recordUD(upd))
    def ev(expr: String): String =
      interp.run(Lua.parse(s"return $expr"), env)
        .headOption.map(tostr).getOrElse("nil")
    assert(ev("r.kind") == "update")
    assert(ev("r.target") == "dest_t")
    assert(ev("r.source") == "public.src_t")
    assert(ev("r.checkpoint") == "777")
    assert(ev("r.transaction_id") == "9")
    assert(ev("r.row.v") == "20")
    assert(ev("r.old.v") == "10")
    assert(ev("r.new.v") == "20")
    assert(ev("r.row.big") == "nil") // explicit null reads nil
    assert(ev("r.unchanged_columns.toasty") == "true")
    assert(ev("tostring(r.commit_time)") ==
      "2023-11-14 22:13:20 +0000 UTC") // Go time.String() image
    assert(ev("r.commit_time.unix_micro") == "1700000000000000")
    assert(ev("peerdb.RowColumnKind(r.row, 'id')") == "int64")
    assert(ev("#peerdb.RowColumns(r.row)") == "3")
    assert(ev("#r.row") == "3") // LuaRowLen (__len on row userdata)
    assert(ev("peerdb.RowTable(r.row).id") == "1")
    assert(ev("""require("json").encode(r.row)""") ==
      """{"id":1,"v":20,"big":null}""")

    val del = Rec(graft.model.ChangeRecord.TypeDelete, 778L,
      1700000000000000L, 9L, "public.src_t", "dest_t",
      """{"id":2,"v":5}""", """{"id":2}""", Nil)
    env.define("d", recordUD(del))
    assert(ev("d.kind") == "delete")
    assert(ev("d.old.id") == "2")
    assert(ev("d.new") == "nil")
    assert(ev("d.unchanged_columns") == "nil")
  }

  test("onRecord contract: the reference's kafka routing script runs " +
    "unmodified — table results map to (topic,key,value,headers), " +
    "nil drops, a string is value-only, empty topic defaults to the " +
    "destination (kafka.go:173-224,376-378)") {
    // a PeerDB-docs-shaped routing script, as a user would write it
    val script = new LuaQueueScript("""
      local json = require "json"
      function onRecord(r)
        if r.kind == "delete" then
          return nil -- drop deletes from the topic
        end
        if r.row.priority ~= nil and r.row.priority > 5 then
          return {
            topic = "hot." .. r.target,
            key = tostring(r.row.id),
            value = json.encode(r.row),
            headers = {src = r.source},
          }
        end
        return {
          key = tostring(r.row.id),
          value = json.encode(r.row),
        }
      end
    """)
    script.validate()
    val runner = new script.PartitionRunner
    import LuaRecordEnv.Rec
    import graft.model.ChangeRecord._
    def rec(rt: Int, data: String) =
      Rec(rt, 1L, 0L, 0L, "public.t", "events", data,
        if (rt == TypeDelete) data else null, Nil)

    val hot = runner.onRecord(rec(TypeInsert,
      """{"id":7,"priority":9,"msg":"now"}"""))
    val hot2 = runner.onRecord(rec(TypeInsert,
      """{"id":7,"priority":9,"msg":"now"}"""))
    assert(hot.size == 1 && hot2.size == 1 &&
      hot.head.topic == hot2.head.topic &&
      java.util.Arrays.equals(hot.head.value, hot2.head.value))
    assert(hot.head.topic == "hot.events")
    assert(hot.head.key == "7")
    assert(new String(hot.head.value, "UTF-8") ==
      """{"id":7,"priority":9,"msg":"now"}""")
    assert(hot.head.headers == Seq("src" -> "public.t"))

    val cold = runner.onRecord(rec(TypeInsert,
      """{"id":8,"priority":1}"""))
    assert(cold.head.topic == "events", "empty topic → destination")
    assert(runner.onRecord(rec(TypeDelete, """{"id":7}""")).isEmpty,
      "nil return drops the record")

    // string return = value-only record (kafka.go:176-178)
    val s2 = new LuaQueueScript(
      """function onRecord(r) return "plain:" .. r.target end""")
    val r2 = (new s2.PartitionRunner).onRecord(
      rec(TypeInsert, """{"id":1}"""))
    assert(r2.size == 1 && r2.head.topic == "events" &&
      r2.head.key == null &&
      new String(r2.head.value, "UTF-8") == "plain:events")

    // multiple return values → multiple records (ls.GetTop loop,
    // kafka.go:367-383)
    val s3 = new LuaQueueScript("""
      function onRecord(r)
        return {value = "a"}, {value = "b", topic = "other"}
      end""")
    val r3 = (new s3.PartitionRunner).onRecord(
      rec(TypeInsert, """{"id":1}"""))
    assert(r3.map(x => (x.topic, new String(x.value, "UTF-8"))) ==
      Seq(("events", "a"), ("other", "b")))

    // a script without onRecord fails validation loudly
    intercept[LuaError] {
      new LuaQueueScript("local x = 1").validate()
    }
    // and a syntax error fails at parse
    intercept[LuaError] {
      new LuaQueueScript("function onRecord(r) return end end")
        .validate()
    }
  }

  test("host-level leaks stay inside the script world: bad " +
    "string.format number, unbounded recursion, and oversized hex " +
    "literals surface as catchable script errors, never as raw JVM " +
    "exceptions that kill a Spark task") {
    // string.format("%f","abc"): NumberFormatException class — pcall
    // must catch it as a plain script error
    assert(evalStr("""(function()
      local ok, err = pcall(function()
        return string.format("%f", "abc")
      end)
      return tostring(ok) .. ":" .. tostring(err)
    end)()""").startsWith("false:"))
    // direct (un-pcalled) call: still a LuaError, not NFE
    intercept[LuaError] { run("""return string.format("%f", "x")""") }

    // unbounded recursion: the explicit depth bound fires BEFORE the
    // JVM StackOverflowError, and pcall catches it
    assert(evalStr("""(function()
      local function boom(n) return boom(n + 1) end
      local ok, err = pcall(boom, 1)
      return tostring(ok) .. ":" .. tostring(err)
    end)()""").contains("stack overflow"))
    // legitimate deep-but-bounded recursion still works
    assert(evalStr("""(function()
      local function down(n) if n == 0 then return 0 end
        return down(n - 1) end
      return down(200)
    end)()""") == "0")

    // oversized hex literal: wraps modulo 2^64 like real Lua 5.3/5.4
    // (previously a raw NumberFormatException out of parseLong)
    assert(evalStr("0xFF") == "255")
    assert(evalStr("0xFFFFFFFFFFFFFFFF") == "-1")
    assert(evalStr("0xFFFFFFFFFFFFFFFFF1234") == "-60876")
  }

  test("utf8 module (gluautf8 parity, Lua 5.3 lutf8lib semantics): " +
    "byte positions over the string's UTF-8 image — len/codepoint/" +
    "offset/char/codes each pinned to the value real Lua produces") {
    def u(src: String): String = evalStr(
      """(function() local u = require "utf8" """ + src + " end)()")
    // "héllo": h@1  é@2(2 bytes)  l@4  l@5  o@6 — 6 bytes, 5 chars
    assert(u("""return u.len("héllo")""") == "5")
    assert(u("""return u.len("héllo", 4)""") == "3")
    // an initial continuation byte: nil + the failing position
    assert(u("""local n, p = u.len("héllo", 3)
      return tostring(n) .. ":" .. tostring(p)""") == "nil:3")
    assert(u("""return u.codepoint("héllo", 2)""") == "233")
    assert(u("""return table.concat({u.codepoint("héllo", 1, 4)},
      ",")""") == "104,233,108")
    assert(u("""return u.offset("héllo", 3)""") == "4")
    assert(u("""return u.offset("héllo", 6)""") == "7") // one past end
    assert(u("""return u.offset("héllo", 7)""") == "nil")
    assert(u("""return u.offset("héllo", -1)""") == "6")
    assert(u("""return u.offset("héllo", -5)""") == "1")
    assert(u("""return u.offset("héllo", -6)""") == "nil")
    assert(u("""return u.offset("héllo", 0, 3)""") == "2")
    intercept[LuaError] { u("""return u.offset("héllo", 1, 3)""") }
    assert(u("""return u.char(104, 233, 8364)""") == "hé€")
    assert(u("""local out = {}
      for p, c in u.codes("hé€") do out[#out + 1] = p .. ":" .. c end
      return table.concat(out, " ")""") == "1:104 2:233 4:8364")
    // 4-byte astral plane
    assert(u("""return u.len("a" .. u.char(128512))""") == "2")
    assert(u("""return u.codepoint("a" .. u.char(128512), 2)""") ==
      "128512")
    assert(u("""return #("a" .. u.char(128512))""") == "5")
    assert(u("""return type(u.charpattern)""") == "string")
  }

  test("msgpack module (gluamsgpack parity): golden bytes straight " +
    "from the msgpack spec, smallest-form canonical encodings, and a " +
    "nested round trip — encode returns a BYTE string that carries " +
    ">0x7F bytes losslessly") {
    def hexOf(src: String): String =
      run("""local msgpack = require "msgpack" """ + src) match {
        case Seq(b: VBytes) =>
          b.b.map(x => f"${x & 0xff}%02x").mkString
        case other => fail(s"expected bytes, got $other")
      }
    // golden encodings from the public spec (msgpack/spec.md)
    assert(hexOf("return msgpack.encode(nil)") == "c0")
    assert(hexOf("return msgpack.encode(true)") == "c3")
    assert(hexOf("return msgpack.encode(false)") == "c2")
    assert(hexOf("return msgpack.encode(7)") == "07")
    assert(hexOf("return msgpack.encode(127)") == "7f")
    assert(hexOf("return msgpack.encode(128)") == "cc80")
    assert(hexOf("return msgpack.encode(256)") == "cd0100")
    assert(hexOf("return msgpack.encode(65536)") == "ce00010000")
    assert(hexOf("return msgpack.encode(4294967296)") ==
      "cf0000000100000000")
    assert(hexOf("return msgpack.encode(-1)") == "ff")
    assert(hexOf("return msgpack.encode(-32)") == "e0")
    assert(hexOf("return msgpack.encode(-33)") == "d0df")
    assert(hexOf("return msgpack.encode(-129)") == "d1ff7f")
    assert(hexOf("return msgpack.encode(-40000)") == "d2ffff63c0")
    assert(hexOf("return msgpack.encode(1.5)") == "cb3ff8000000000000")
    assert(hexOf("""return msgpack.encode("abc")""") == "a3616263")
    assert(hexOf("""return msgpack.encode("")""") == "a0")
    assert(hexOf("""return msgpack.encode(("x"):rep(40))""") ==
      "d928" + "78" * 40)
    assert(hexOf("return msgpack.encode({1, 2, 3})") == "93010203")
    assert(hexOf("return msgpack.encode({})") == "90")
    assert(hexOf("""return msgpack.encode({a = 1})""") == "81a16101")
    // bytes nest as bin-family (the encode-of-an-encode shape)
    assert(hexOf("return msgpack.encode(msgpack.encode(200))") ==
      "c402ccc8")
    // multi-byte text as str-family UTF-8
    assert(hexOf("""return msgpack.encode("é")""") == "a2c3a9")

    // byte-string surface: type/length/equality/concat
    assert(evalStr("""(function()
      local msgpack = require "msgpack"
      local b = msgpack.encode(200)
      return type(b) .. ":" .. #b
    end)()""") == "string:2")
    assert(evalStr("""(function()
      local msgpack = require "msgpack"
      return tostring(msgpack.encode(7) == msgpack.encode(7))
    end)()""") == "true")

    // nested round trip, >0x7F payloads included
    assert(evalStr("""(function()
      local msgpack = require "msgpack"
      local v = {id = 300, tags = {"a", "é"}, deep = {ok = true,
        n = -129, f = 2.5}, blob = msgpack.encode(200)}
      local d = msgpack.decode(msgpack.encode(v))
      return d.id .. "|" .. d.tags[2] .. "|" .. tostring(d.deep.ok)
        .. "|" .. d.deep.n .. "|" .. d.deep.f .. "|"
        .. tostring(d.blob == msgpack.encode(200)) .. "|"
        .. msgpack.decode(d.blob)
    end)()""") == "300|é|true|-129|2.5|true|200")

    // malformed input is a script error (catchable), not a host crash
    assert(evalStr("""(function()
      local msgpack = require "msgpack"
      local ok = pcall(msgpack.decode, "zz")
      return tostring(ok)
    end)()""") == "false")
  }

  test("decimal userdata: shopspring-shaped arithmetic metamethods, " +
    "value-equality compare, index fields (peerdb.go:82-113,632-664," +
    "796-814)") {
    assert(evalStr("""tostring(peerdb.Decimal("1.5") +
      peerdb.Decimal("2.25"))""") == "3.75")
    assert(evalStr("""tostring(peerdb.Decimal("1.5") * 4)""") == "6")
    assert(evalStr("""tostring(peerdb.Decimal("10") - "2.5")""") ==
      "7.5")
    // division at DivisionPrecision=16, half away from zero
    assert(evalStr("""tostring(peerdb.Decimal("1") / 3)""") ==
      "0.3333333333333333")
    assert(evalStr("""tostring(peerdb.Decimal("7") % 3)""") == "1")
    assert(evalStr("""tostring(peerdb.Decimal("-7") % 3)""") == "-1",
      "remainder keeps the dividend's sign (Go's Mod)")
    assert(evalStr("""tostring(peerdb.Decimal("1.1") ^ 3)""") ==
      "1.331")
    assert(evalStr("""tostring(-peerdb.Decimal("2.5"))""") == "-2.5")
    // number coerces on EITHER side (metamethod dispatch order)
    assert(evalStr("""tostring(2 + peerdb.Decimal("0.5"))""") == "2.5")
    // __eq is Cmp()==0: scale-insensitive value equality
    assert(evalStr("""tostring(peerdb.Decimal("1.50") ==
      peerdb.Decimal("1.5"))""") == "true")
    assert(evalStr("""tostring(peerdb.Decimal("1.5") <
      peerdb.Decimal("1.51"))""") == "true")
    assert(evalStr("""tostring(peerdb.Decimal("3") <=
      peerdb.Decimal("3"))""") == "true")
    // LuaDecimalIndex fields
    assert(evalStr("""peerdb.Decimal("12.34").exponent""") == "-2")
    assert(evalStr("""peerdb.Decimal("12.34").coefficient64""") ==
      "1234")
    assert(evalStr("""peerdb.Decimal("12.9").int64""") == "12")
    assert(evalStr("""peerdb.Decimal("2.5").float64 * 2""") == "5")
    // bigint view: tostring/compare/negate/index, no binary arith
    assert(evalStr("""tostring(peerdb.Decimal("12.34").coefficient)""")
      == "1234")
    assert(evalStr("""peerdb.Decimal("12.34").coefficient.sign""") ==
      "1")
    assert(evalStr("""peerdb.Decimal("-5").bigint.int64""") == "-5")
    assert(evalStr("""tostring(peerdb.Decimal("9").bigint.is64)""") ==
      "true")
    assert(evalStr("""tostring(-peerdb.Decimal("5").bigint)""") == "-5")
    intercept[LuaError] {
      run("""return peerdb.Decimal("1").bigint +
        peerdb.Decimal("1").bigint""")
    } // reference installs no __add on big ints
    // bad input is a script error
    assert(evalStr("""tostring(pcall(function()
      return peerdb.Decimal("abc") end))""") == "false")
  }

  test("time userdata: ordering metamethods and UTC calendar fields " +
    "(peerdb.go:67-73,685-744)") {
    assert(evalStr("""tostring(peerdb.Time(100) <
      peerdb.Time(200))""") == "true")
    assert(evalStr("""tostring(peerdb.Time(100) <=
      peerdb.Time(100))""") == "true")
    assert(evalStr("""tostring(peerdb.Time(100) ==
      peerdb.Time(100))""") == "true")
    assert(evalStr("""tostring(peerdb.unix_epoch <
      peerdb.Now())""") == "true")
    // calendar accessors, UTC: 2023-11-14T22:13:20Z
    assert(evalStr("peerdb.Time(1700000000).year") == "2023")
    assert(evalStr("peerdb.Time(1700000000).month") == "11")
    assert(evalStr("peerdb.Time(1700000000).day") == "14")
    assert(evalStr("peerdb.Time(1700000000).hour") == "22")
    assert(evalStr("peerdb.Time(1700000000).minute") == "13")
    assert(evalStr("peerdb.Time(1700000000).second") == "20")
    assert(evalStr("peerdb.Time(1700000000).yearday") == "318")
    assert(evalStr("peerdb.Time(1700000000).unix_second") ==
      "1700000000")
    assert(evalStr("peerdb.Time(1700000000.5).nanosecond") ==
      "500000000")
    // no-arg = the zero time (time.Time{}), not the epoch
    assert(evalStr("tostring(peerdb.Time())") ==
      "0001-01-01 00:00:00 +0000 UTC")
    // a time argument passes through
    assert(evalStr("tostring(peerdb.Time(peerdb.unix_epoch))") ==
      "1970-01-01 00:00:00 +0000 UTC")
  }

  test("uuid userdata: parse/tostring round trip, byte indexing, " +
    "equality, msgpack bin16 (peerdb.go:575-620)") {
    val u = "12345678-9abc-def0-1234-56789abcdef0"
    assert(evalStr(s"""tostring(peerdb.UUID("$u"))""") == u)
    assert(evalStr(s"""peerdb.UUID("$u")[0]""") == "18") // 0x12
    assert(evalStr(s"""peerdb.UUID("$u")[15]""") == "240") // 0xf0
    assert(evalStr(s"""tostring(peerdb.UUID("$u")[16])""") == "nil")
    assert(evalStr(s"""tostring(peerdb.UUID("$u") ==
      peerdb.UUID("$u"))""") == "true")
    assert(evalStr("""tostring(peerdb.UUID() == peerdb.UUID())""") ==
      "false")
    assert(evalStr("""#tostring(peerdb.UUID())""") == "36")
    // __msgpack = bin16 of the raw bytes (LuaUuidMsgpack): C4 10 + 16
    assert(evalStr(s"""(function()
      local msgpack = require "msgpack"
      local b = msgpack.encode(peerdb.UUID("$u"))
      return #b .. "|" .. b:byte(1) .. "|" .. b:byte(2) .. "|"
        .. b:byte(3)
    end)()""") == "18|196|16|18")
    assert(evalStr("""tostring(pcall(function()
      return peerdb.UUID("nope") end))""") == "false")
  }

  test("row mutation through __newindex (LuaRowNewIndex, peerdb.go:" +
    "197-424): writes visible to reads, json.encode, RowTable, #row; " +
    "row/new alias one image, old stays distinct") {
    import LuaRecordEnv._
    val upd = Rec(graft.model.ChangeRecord.TypeUpdate, 1L,
      1700000000000000L, 2L, "public.t", "t",
      """{"id":1,"v":20,"secret":"xyz"}""", """{"id":1,"v":10}""", Nil)
    val interp = new Interp()
    val env = LuaRecordEnv.env(interp)
    env.define("r", recordUD(upd))
    def ev(expr: String): String =
      interp.run(Lua.parse(s"return $expr"), env)
        .headOption.map(tostr).getOrElse("nil")
    def st(stmt: String): Unit =
      interp.run(Lua.parse(stmt), env)
    st("r.row.v = 99")
    assert(ev("r.row.v") == "99")
    assert(ev("r.new.v") == "99", "row and new alias one image")
    assert(ev("r.old.v") == "10", "the old image is untouched")
    st("r.row.secret = nil") // redaction: column pins to NULL
    assert(ev("r.row.secret") == "nil")
    assert(ev("""require("json").encode(r.row)""") ==
      """{"id":1,"v":99,"secret":null}""")
    st("r.row.added = 'x'") // a new column appends
    assert(ev("#r.row") == "4")
    assert(ev("peerdb.RowTable(r.row).added") == "x")
    // non-row userdata still rejects writes
    intercept[LuaError] { st("r.commit_time.year = 1999") }
  }

  test("reference parity battery: the assertions of pua/peerdb_test.go " +
    "run unmodified (uuid indexing/equality, the decimal algebra " +
    "chain, Go-format time strings, peerdb.type %T names, msgpack " +
    "uuid bin16, json row encode)") {
    // the reference's own test script, minus the host-injected `row`
    // fixtures (replaced with equivalent literals below)
    run("""
      assert(require('bit32').band(173, 21) == 5)
      assert(dofile == nil)
      assert(loadfile == nil)
      assert(not peerdb.type(0))

      local uuidstring = "02030507-0b0d-1113-7f83-898b9597f1fb"
      local uuid = peerdb.UUID(uuidstring)
      assert(peerdb.type(uuid) == "uuid.UUID")
      assert(uuid[0] == 2)
      assert(uuid[1] == 3)
      assert(uuid[2] == 5)
      assert(uuid[3] == 7)
      assert(uuid[4] == 11)
      assert(uuid[5] == 13)
      assert(uuid[6] == 17)
      assert(uuid[7] == 19)
      assert(uuid[8] == 127)
      assert(uuid[9] == 131)
      assert(uuid[10] == 137)
      assert(uuid[11] == 139)
      assert(uuid[12] == 149)
      assert(uuid[13] == 151)
      assert(uuid[14] == 241)
      assert(uuid[15] == 251)
      assert(uuid == peerdb.UUID(uuidstring))
      assert(tostring(uuid) == uuidstring)

      local dec102 = peerdb.Decimal("10.2")
      local dec101 = peerdb.Decimal("10.1")
      assert(tostring(dec102) == "10.2")
      assert(dec101 < dec102)
      assert(dec101 <= dec102)
      assert(dec101 ~= dec102)
      assert(peerdb.Decimal(dec101) + dec101 == peerdb.Decimal("20.2"))
      assert(dec102 + dec101 == peerdb.Decimal("20.3"))
      assert(dec102 - dec101 == peerdb.Decimal("0.1"))
      assert(dec102 * dec101 == peerdb.Decimal("103.02"))
      assert(-dec101 == peerdb.Decimal("-10.1"))
      assert(peerdb.Decimal("5") / peerdb.Decimal("2") ==
        peerdb.Decimal("2.5"))
      assert(peerdb.Decimal("5") % peerdb.Decimal("3") ==
        peerdb.Decimal("2"))
      assert(peerdb.Decimal("9") ^ peerdb.Decimal("2") ==
        peerdb.Decimal("81"))
      assert(dec101.float64 == 10.1)
      assert(dec101.exponent == -1)
      assert(tostring(dec101.coefficient) == "101")
      assert(tostring(dec101.coefficient64) == "101")
      assert(tostring(dec101.int64) == "10")
      assert(tostring(dec101.bigint) == "10")
      assert(tostring(-dec101.bigint) == "-10")
      assert(dec101.coefficient < dec102.coefficient)
      assert(dec101.coefficient <= dec102.coefficient)
      assert(dec101.coefficient ~= dec102.coefficient)
      assert(dec101.coefficient.is64)
      assert(dec101.coefficient.int64 == dec101.coefficient64)
      assert(dec101.coefficient.sign == 1)
      assert(not dec101.coefficient.nothing)
      assert(not dec101.nothing)

      assert(peerdb.tostring(peerdb.unix_epoch) ==
        "1970-01-01 00:00:00 +0000 UTC")
      assert(tostring(peerdb.unix_epoch) ==
        "1970-01-01 00:00:00 +0000 UTC")

      local unix123 = peerdb.Time(123456.789)
      assert(peerdb.unix_epoch < unix123)
      assert(peerdb.unix_epoch <= unix123)
      assert(peerdb.unix_epoch ~= unix123)
      assert(tostring(unix123.unix_nano) == "123456789000000")
      assert(tostring(unix123.unix_micro) == "123456789000")
      assert(tostring(unix123.unix_milli) == "123456789")
      assert(tostring(unix123.unix_second) == "123456")
      assert(unix123.unix == 123456.789)
      assert(unix123.year == 1970)
      assert(unix123.month == 1)
      assert(unix123.day == 2)
      assert(unix123.yearday == 2)
      assert(unix123.hour == 10)
      assert(unix123.minute == 17)
      assert(unix123.second == 36)
      assert(unix123.nanosecond == 789000000)
      assert(not unix123.nothing)

      local msgpack = require "msgpack"
      assert(msgpack.encode(uuid) == string.char(0xc4, 16, 2, 3, 5, 7,
        11, 13, 17, 19, 127, 131, 137, 139, 149, 151, 241, 251))
      -- an empty array value encodes as fixarray 0 (gluamsgpack)
      assert(msgpack.encode({}) == string.char(0x90))
      return "ok"
    """)
    // the host-injected row fixture legs of the same test
    val interp = new Interp()
    val env = LuaRecordEnv.env(interp)
    env.define("row", LuaRecordEnv.rowUD(Vector("a" -> VInt(5040))))
    def ev(expr: String): String =
      interp.run(Lua.parse(s"return $expr"), env)
        .headOption.map(tostr).getOrElse("nil")
    assert(ev("#row") == "1")
    assert(ev("""require("json").encode(row)""") == """{"a":5040}""")
    assert(ev("""require("json").encode({})""") == "[]")
  }

  test("patterns: string.match — classes, sets, quantifiers, " +
    "captures (values pinned to real Lua 5.1)") {
    assert(evalStr("""string.match("hello world", "%a+")""") ==
      "hello")
    assert(evalStr("""string.match("abc123", "%d+")""") == "123")
    assert(evalStr("""string.match("abc123", "%D+")""") == "abc")
    assert(evalStr("""string.match("foo@bar.com", "[^@]+")""") ==
      "foo")
    assert(evalStr("""string.match("x  =  10", "(%w+)%s*=%s*(%w+)")""")
      == "x", "first capture")
    assert(run("""return string.match("x = 10", "(%w+)%s*=%s*(%w+)")
      """).map(tostr) == Seq("x", "10"))
    assert(run("""return string.match("2026-08-16",
      "(%d+)-(%d+)-(%d+)")""").map(tostr) ==
      Seq("2026", "08", "16"))
    // greedy vs lazy
    assert(evalStr("""string.match("<a><b>", "<(.*)>")""") == "a><b")
    assert(evalStr("""string.match("<a><b>", "<(.-)>")""") == "a")
    // optional
    assert(evalStr("""string.match("color", "colou?r")""") == "color")
    assert(evalStr("""string.match("colour", "colou?r")""") ==
      "colour")
    // anchors
    assert(evalStr("""string.match("abc", "^a")""") == "a")
    assert(evalStr("""string.match("abc", "^b")""") == "nil")
    assert(evalStr("""string.match("abc", "c$")""") == "c")
    assert(evalStr("""string.match("abc", "b$")""") == "nil")
    // sets with ranges, escaped class in set
    assert(evalStr("""string.match("a1b2", "[a-z%d]+")""") == "a1b2")
    assert(evalStr("""string.match("[x]", "%[(%a)%]")""") == "x")
    // position capture (1-based, like real Lua)
    assert(evalStr("""string.match("abc", "b()")""") == "3")
    // balanced match
    assert(evalStr("""string.match("(foo(bar))baz", "%b()")""") ==
      "(foo(bar))")
    // back-reference
    assert(evalStr("""string.match("abcabc", "(abc)%1")""") == "abc")
    assert(evalStr("""string.match("abcabd", "(abc)%1")""") == "nil")
    // init offset, negative init
    assert(evalStr("""string.match("hello", "%a+", 3)""") == "llo")
    assert(evalStr("""string.match("hello", "l", -2)""") == "l")
    // %z and punctuation class
    assert(evalStr("""string.match("a.b", "%p")""") == ".")
    // hex class
    assert(evalStr("""string.match("zzff00z", "%x+")""") == "ff00")
  }

  test("patterns: string.find — pattern form, captures, plain flag, " +
    "init clamp") {
    assert(run("""return string.find("abc def", "%s")""").map(tostr)
      == Seq("4", "4"))
    assert(run("""return string.find("key=val", "(%w+)=")""")
      .map(tostr) == Seq("1", "4", "key"))
    assert(evalStr("""string.find("abc", "%d")""") == "nil")
    // plain form: magic chars are literal
    assert(run("""return string.find("a.c", ".", 1, true)""")
      .map(tostr) == Seq("2", "2"))
    assert(run("""return string.find("abcdef", "cd", 1, true)""")
      .map(tostr) == Seq("3", "4"))
    // init beyond end → nil; negative init counts from the end
    assert(evalStr("""string.find("abc", "a", 5)""") == "nil")
    assert(run("""return string.find("aaa", "a", -1)""").map(tostr)
      == Seq("3", "3"))
    // empty pattern at end matches (len+1, len) like real Lua
    assert(run("""return string.find("abc", "", 4)""").map(tostr)
      == Seq("4", "3"))
  }

  test("patterns: string.gsub — string/table/function replacements, " +
    "%n expansion, count, anchored, empty matches") {
    assert(run("""return string.gsub("hello world", "o", "0")""")
      .map(tostr) == Seq("hell0 w0rld", "2"))
    assert(run("""return string.gsub("hello world", "(%w+)", "<%1>")
      """).map(tostr) == Seq("<hello> <world>", "2"))
    assert(run("""return string.gsub("hello world", "%w+", "%0!", 1)
      """).map(tostr) == Seq("hello! world", "1"))
    // %% literal percent
    assert(evalStr("""string.gsub("abc", "b", "%%")""") == "a%c")
    // empty-pattern interleave, exactly Lua's
    assert(run("""return string.gsub("abc", "", "-")""").map(tostr)
      == Seq("-a-b-c-", "4"))
    // anchored gsub replaces at most once, at the start
    assert(run("""return string.gsub("aaa", "^a", "b")""").map(tostr)
      == Seq("baa", "1"))
    assert(run("""return string.gsub("a@x.com", "^[^@]+", "***")""")
      .map(tostr) == Seq("***@x.com", "1"))
    // table replacement: missing key keeps the match
    assert(run("""return string.gsub("a b c", "%a", {a="1", c="3"})
      """).map(tostr) == Seq("1 b 3", "3"))
    // function replacement; nil return keeps the original
    assert(run("""return string.gsub("x = 10, y = 20", "%d+",
      function(n) if n == "10" then return tostring(n * 2) end end)
      """).map(tostr) == Seq("x = 20, y = 20", "2"))
    // collapse duplicated words via back-reference
    assert(run("""return string.gsub("hello hello world",
      "(%w+) %1", "%1")""").map(tostr) == Seq("hello world", "1"))
    // frontier: uppercase runs bounded by non-alpha
    assert(run("""return string.gsub("THE (quick) fox", "%f[%a]%u+",
      "X")""").map(tostr) == Seq("X (quick) fox", "1"))
    // invalid replacement escape is a script error
    intercept[LuaError] { run("""return string.gsub("a", "a", "%x")""") }
    // frontier edges read as \0 (lstrlib): %f[%s] must NOT fire at
    // position 0 — a space boundary would, NUL does not
    assert(run("""return string.gsub("a b", "%f[%s]", "|")""")
      .map(tostr) == Seq("a| b", "1"))
    // ... while %f[%a] DOES fire at position 0 (NUL is not alpha)
    assert(run("""return string.gsub("ab cd", "%f[%a]", "|")""")
      .map(tostr) == Seq("|ab |cd", "2"))
  }

  test("patterns: string.gmatch — iteration, multi-captures, empty " +
    "matches, literal ^ (5.1: gmatch never anchors)") {
    assert(evalStr("""(function()
      local out = {}
      for w in string.gmatch("one two three", "%a+") do
        out[#out + 1] = w
      end
      return table.concat(out, "|")
    end)()""") == "one|two|three")
    assert(evalStr("""(function()
      local out = {}
      for k, v in string.gmatch("a=1,b=2", "(%w+)=(%w+)") do
        out[#out + 1] = k .. ":" .. v
      end
      return table.concat(out, ",")
    end)()""") == "a:1,b:2")
    // empty matches advance (4 over "abc"), exactly real Lua
    assert(evalStr("""(function()
      local n = 0
      for _ in string.gmatch("abc", "a*") do n = n + 1 end
      return n
    end)()""") == "4")
    // 5.1 treats a leading ^ in gmatch as a literal caret
    assert(evalStr("""(function()
      local n = 0
      for _ in string.gmatch("a^b^c", "%^") do n = n + 1 end
      return n
    end)()""") == "2")
  }
}
