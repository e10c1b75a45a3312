package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM twin of the portable 60-bit hash domain (TextFunctions.hash60Sql):
  * first 15 hex chars of md5 == first 60 bits of the digest, extracted
  * numerically. Top-level object → guaranteed static forwarder, callable
  * from Janino-generated code. */
object TextHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `CAST(conv(substr(md5(s),1,15),16,10) AS BIGINT)`, bit-for-bit. */
  def hash60(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // 15 hex chars = bytes 0..6 (56 bits) + the high nibble of byte 7.
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** rotl60(h, i+1) ^ (i · golden32) — TextFunctions.permHashSql twin. */
  def permHash(h: Long, i: Int): Long = {
    val s = i + 1
    (((h & ((1L << (60 - s)) - 1)) << s) + (h >>> (60 - s))) ^
      (i.toLong * 2654435769L)
  }
}

/** MinHash(k) signature of a shingle array as ONE fused codegen'd loop:
  * hash each shingle once, update all k permutation minima in place. The
  * shuffle-free replacement for the explode + k-min-aggregates
  * formulation (TextFunctions.minhashSignaturesDf) — same values (min
  * over a set is explode-order free), zero data movement: the signature
  * is born in the scan stage. NULL array or element → NULL (no
  * signature). Callers pass the DISTINCT shingle set; duplicates would
  * not change the minima anyway. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      val h = TextHash.hash60(arr.getUTF8String(j))
      var i = 0
      while (i < k) {
        val p = TextHash.permHash(h, i)
        if (p < mins(i)) mins(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      val p = ctx.freshName("p"); val mins = ctx.freshName("mins")
      s"""
         |final int $n = $x.numElements();
         |final long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
         |  if ($x.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final long $h = graft.functions.TextHash.hash60(
         |    $x.getUTF8String($j));
         |  for (int $i = 0; $i < $k; $i++) {
         |    final long $p = graft.functions.TextHash.permHash($h, $i);
         |    if ($p < $mins[$i]) $mins[$i] = $p;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSigExpr = copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** FNV-1a 32-bit over a string's UTF-8 bytes — the EventHubs partition
  * hash (flow/connectors/eventhub/partition_hash.go:16), byte-for-byte,
  * as a codegen'd loop (the `aggregate`-over-`split` formulation runs
  * INTERPRETED — higher-order functions have no codegen — and was the
  * q_queue_eventhubs hot spot). The DuckDB oracle's list_reduce folds
  * CODE POINTS, which equals this on the ASCII values partition-key
  * columns carry. NULL in → NULL out (callers coalesce for the
  * nil-partition-value branch). */
case class Fnv1a32Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fnv1a32 expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val b = a.asInstanceOf[UTF8String].getBytes
    var h = 2166136261L
    var i = 0
    while (i < b.length) {
      h = ((h ^ (b(i) & 0xFFL)) * 16777619L) & 0xFFFFFFFFL
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = nullSafeCodeGen(ctx, ev, x => {
    val b = ctx.freshName("b")
    val h = ctx.freshName("h")
    val i = ctx.freshName("i")
    s"""
       |final byte[] $b = $x.getBytes();
       |long $h = 2166136261L;
       |for (int $i = 0; $i < $b.length; $i++) {
       |  $h = (($h ^ ($b[$i] & 0xFFL)) * 16777619L) & 0xFFFFFFFFL;
       |}
       |${ev.value} = $h;
       |""".stripMargin
  })

  override protected def withNewChildInternal(newChild: Expression)
      : Fnv1a32Expr = copy(child = newChild)

  override def prettyName: String = "fnv1a32"
}

/** 60-bit tf-weighted SimHash of a word array as one fused loop: hash
  * each occurrence once, accumulate the 60 bit votes, assemble the
  * signature — the shuffle-free replacement for the explode + 60-sum
  * aggregate (TextFunctions.simhashSignatures); identical values
  * (occurrence-summed votes are order-free). NULL array/element → NULL. */
case class SimHash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash60 expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](60)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      val h = TextHash.hash60(arr.getUTF8String(j))
      var b = 0
      while (b < 60) {
        votes(b) += (((h >>> b) & 1L) * 2L) - 1L
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val votes = ctx.freshName("votes"); val sig = ctx.freshName("sig")
      s"""
         |final int $n = $x.numElements();
         |final long[] $votes = new long[60];
         |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
         |  if ($x.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final long $h = graft.functions.TextHash.hash60(
         |    $x.getUTF8String($j));
         |  for (int $b = 0; $b < 60; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) * 2L) - 1L;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < 60; $b++) {
         |    if ($votes[$b] >= 0L) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash60Expr = copy(child = newChild)

  override def prettyName: String = "simhash60"
}

/** `n`-word shingles of a word array as one codegen'd loop — the fused
  * twin of TextFunctions.wordShingles (same values, same order: windows
  * of n consecutive words joined by spaces; fewer than n words → empty).
  * The HOF formulation runs interpreted AND re-evaluates `element_at` n
  * times per window; on a 2.5M-bigram corpus pass the fused loop is the
  * difference between the explode feeding codegen and not. NULL array or
  * element → NULL. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1: $n")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val out = math.max(0, len - n + 1)
    val res = new Array[AnyRef](out)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < out) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        if (arr.isNullAt(i + k)) return null
        parts(k) = arr.getUTF8String(i + k)
        k += 1
      }
      res(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val sep = ctx.addReferenceObj("sep", UTF8String.fromString(" "),
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, x => {
      val len = ctx.freshName("len"); val out = ctx.freshName("out")
      val res = ctx.freshName("res"); val parts = ctx.freshName("parts")
      val i = ctx.freshName("i"); val kk = ctx.freshName("kk")
      s"""
         |final int $len = $x.numElements();
         |final int $out = Math.max(0, $len - ${n - 1});
         |final org.apache.spark.unsafe.types.UTF8String[] $res =
         |  new org.apache.spark.unsafe.types.UTF8String[$out];
         |final org.apache.spark.unsafe.types.UTF8String[] $parts =
         |  new org.apache.spark.unsafe.types.UTF8String[$n];
         |for (int $i = 0; $i < $out && !${ev.isNull}; $i++) {
         |  for (int $kk = 0; $kk < $n; $kk++) {
         |    if ($x.isNullAt($i + $kk)) { ${ev.isNull} = true; break; }
         |    $parts[$kk] = $x.getUTF8String($i + $kk);
         |  }
         |  if (!${ev.isNull}) {
         |    $res[$i] = org.apache.spark.unsafe.types.UTF8String
         |      .concatWs($sep, $parts);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |      (Object[]) $res);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordShinglesExpr = copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

/** Max occurrence count of any element in a string array, as one
  * codegen'd hash-count loop — the zero-shuffle twin of
  * `explode → groupBy(id, w).count → groupBy(id).max(count)` (two
  * exchanges of |words| rows), which is exactly the Gopher top-word
  * rate's numerator. NULL array → NULL; NULL elements count as one
  * shared key (split() never produces them). Empty array → 0. */
case class TopWordCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_word_count expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    TopWordCountExpr.topCount(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = " +
        s"graft.functions.TopWordCountExpr.topCount($x);\n")

  override protected def withNewChildInternal(newChild: Expression)
      : TopWordCountExpr = copy(child = newChild)

  override def prettyName: String = "top_word_count"
}

object TopWordCountExpr {
  /** One pass, one open-addressed count per distinct element. Static
    * forwarder so Janino-generated code can call it. */
  def topCount(arr: ArrayData): Long = {
    val n = arr.numElements()
    val m = new java.util.HashMap[UTF8String, Array[Long]](
      Math.max(16, n * 2))
    var best = 0L
    var nulls = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        nulls += 1
        if (nulls > best) best = nulls
      } else {
        var c = m.get(arr.getUTF8String(i))
        if (c == null) { c = new Array[Long](1); m.put(arr.getUTF8String(i), c) }
        c(0) += 1
        if (c(0) > best) best = c(0)
      }
      i += 1
    }
    best
  }
}

object SignatureExprs {
  def fnv1a32(s: Column): Column =
    GraftShims.column(Fnv1a32Expr(GraftShims.expression(s)))

  def topWordCount(ws: Column): Column =
    GraftShims.column(TopWordCountExpr(GraftShims.expression(ws)))

  def minhashSig(shingles: Column, k: Int): Column =
    GraftShims.column(MinHashSigExpr(GraftShims.expression(shingles), k))

  def simhash60(words: Column): Column =
    GraftShims.column(SimHash60Expr(GraftShims.expression(words)))

  def wordShingles(ws: Column, n: Int): Column =
    GraftShims.column(WordShinglesExpr(GraftShims.expression(ws), n))
}
