package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd hot paths for the quantized (engine-portable, integer)
  * similarity family. The SQL higher-order formulations in [[Similarity]]
  * define the semantics and feed the DuckDB oracle; these expressions are
  * the same arithmetic as a single fused JIT'd loop — no intermediate
  * array allocation, no interpreted lambda per element — for the
  * million-vector candidate-verify joins. Equality with the HOF
  * formulations is asserted in SimilaritySpec.
  */

/** Exact comparison of triple products of non-negative longs in 192-bit
  * limb arithmetic (`Math.multiplyHigh`). Raw `long` triple products wrap
  * silently on the JVM while the DuckDB oracle's `list_sum` comparisons
  * promote to HUGEINT — for high-dimension / large-magnitude quantized
  * vectors the two engines would diverge. Called from both the interpreted
  * eval and the generated code of [[QuantizedCosineGeExpr]] (top-level
  * object → guaranteed static forwarder, Janino-callable). */
object Int192 {
  /** Sign of `(a·b·c) - (d·e·f)`; all six inputs must be ≥ 0. */
  def cmpProd3(a: Long, b: Long, c: Long, d: Long, e: Long, f: Long): Int = {
    val l = mul3(a, b, c)
    val r = mul3(d, e, f)
    var cmp = java.lang.Long.compareUnsigned(l(0), r(0))
    if (cmp == 0) cmp = java.lang.Long.compareUnsigned(l(1), r(1))
    if (cmp == 0) cmp = java.lang.Long.compareUnsigned(l(2), r(2))
    cmp
  }

  /** a·b·c (a,b,c ≥ 0) as three 64-bit limbs, most significant first. */
  private def mul3(a: Long, b: Long, c: Long): Array[Long] = {
    val pl = a * b                      // low limb of a·b (unsigned)
    val ph = Math.multiplyHigh(a, b)    // exact for non-negative operands
    val lo = pl * c
    // unsigned high of pl·c: signed multiplyHigh corrected for pl's sign bit
    val m1 = Math.multiplyHigh(pl, c) + (if (pl < 0) c else 0L)
    val l2 = ph * c
    val h2 = Math.multiplyHigh(ph, c)
    val mid = m1 + l2
    val carry = if (java.lang.Long.compareUnsigned(mid, m1) < 0) 1L else 0L
    Array(h2 + carry, mid, lo)
  }
}

/** `cos(a,b) ≥ √(num/denom)` on quantized `array<bigint>` vectors as an
  * exact integer comparison: dot ≥ 0 ∧ dot²·denom ≥ |a|²·|b|²·num, the
  * triple products compared in 192-bit arithmetic ([[Int192]]) so no
  * dims·scale combination can wrap. The element accumulations themselves
  * stay in `long`: exact for |q| ≤ 2^21 up to 2^20 dims (the floor(x·1024)
  * quantization of unit-norm floats is orders of magnitude below that).
  * NULL on null/mismatched arrays (never a candidate pair). */
case class QuantizedCosineGeExpr(left: Expression, right: Expression,
    num: Long, denom: Long) extends BinaryExpression {
  require(num >= 0 && denom > 0,
    s"threshold fraction must be non-negative: $num/$denom")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"quantized_cosine_ge expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getLong(i); val yv = y.getLong(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    java.lang.Boolean.valueOf(dot >= 0 &&
      Int192.cmpProd3(dot, dot, denom, nx, ny, num) >= 0)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  long $dot = 0L, $nx = 0L, $ny = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    final long $xv = $x.getLong($i);
         |    final long $yv = $y.getLong($i);
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot >= 0L && graft.functions.Int192.cmpProd3(
         |      $dot, $dot, ${denom}L, $nx, $ny, ${num}L) >= 0;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): QuantizedCosineGeExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantized_cosine_ge"
}

/** Random-hyperplane LSH bucket of a float embedding: `nBits` sign bits
  * of integer projections of the quantized vector (floor(x·1024)) onto
  * deterministic ±1 hyperplanes — the fused-loop twin of
  * [[Similarity.hyperplaneBucket]]'s arithmetic (sign hash inlined,
  * identical constants). NULL input array or null element → NULL. */
case class HyperplaneBucketExpr(child: Expression, nBits: Int,
    planeOffset: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket expects array<float>, got ${other.simpleString}")
    }

  /** ±1 for (plane h, dim j) — the portable xorshift avalanche
    * (Similarity.signSql), integer-exact. */
  @inline private def sign(h: Int, j: Int): Long = {
    val m = (h.toLong + planeOffset) * 2654435761L + j.toLong * 40503L
    val v = (m ^ (m / 8192L)) & 65535L
    (((v * 40503L) / 2048L) & 1L) * 2L - 1L
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val proj = new Array[Long](nBits)
    var j = 0
    while (j < n) {
      if (x.isNullAt(j)) return null
      val q = math.floor(x.getFloat(j).toDouble * 1024.0).toLong
      var h = 0
      while (h < nBits) { proj(h) += q * sign(h, j); h += 1 }
      j += 1
    }
    var bucket = 0L
    var h = 0
    while (h < nBits) {
      if (proj(h) >= 0) bucket |= (1L << h)
      h += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val q = ctx.freshName("q")
      val m = ctx.freshName("m"); val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val proj = ctx.freshName("proj"); val bkt = ctx.freshName("bkt")
      s"""
         |final int $n = $x.numElements();
         |final long[] $proj = new long[$nBits];
         |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
         |  if ($x.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  final long $q = (long) java.lang.Math.floor(
         |    ((double) $x.getFloat($j)) * 1024.0);
         |  for (int $h = 0; $h < $nBits; $h++) {
         |    final long $m = ((long) $h + ${planeOffset}L) * 2654435761L
         |      + ((long) $j) * 40503L;
         |    final long $v = ($m ^ ($m / 8192L)) & 65535L;
         |    final long $s = ((($v * 40503L) / 2048L) & 1L) * 2L - 1L;
         |    $proj[$h] += $q * $s;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $bkt = 0L;
         |  for (int $h = 0; $h < $nBits; $h++) {
         |    if ($proj[$h] >= 0L) $bkt |= (1L << $h);
         |  }
         |  ${ev.value} = $bkt;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneBucketExpr = copy(child = newChild)

  override def prettyName: String = "hyperplane_bucket"
}

/** Integer dot product of two quantized `array<bigint>` vectors as one
  * fused codegen'd loop — the retrieval scorer for scalar-quantized ANN
  * (q_ann_sq_recall). Exact for |q| ≤ 2^21 up to 2^20 dims (no wrap);
  * the HOF twin (`aggregate(zip_with(a,b,*), 0L, +)`) is the oracle
  * semantics but runs interpreted with an intermediate array per row.
  * NULL on null input, null element, or length mismatch. */
case class IntDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_dot expects (array<bigint>, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; }
         |else {
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $dot += $x.getLong($i) * $y.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): IntDotExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "int_dot"
}

object QuantizedExprs {
  def quantizedCosineGe(a: Column, b: Column, num: Long, denom: Long)
      : Column =
    GraftShims.column(QuantizedCosineGeExpr(
      GraftShims.expression(a), GraftShims.expression(b), num, denom))

  def hyperplaneBucket(emb: Column, nBits: Int,
      planeOffset: Int = 0): Column =
    GraftShims.column(HyperplaneBucketExpr(
      GraftShims.expression(emb), nBits, planeOffset))

  def intDot(a: Column, b: Column): Column =
    GraftShims.column(IntDotExpr(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** SQL registration: `SELECT int_dot(q1, q2)` (pairs with cosine_sim's
    * [[CosineSimilarityExpr.register]]). */
  def registerIntDot(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int_dot", exprs => IntDotExpr(exprs(0), exprs(1)), "built-in")
}
