package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve interleave for multi-column data layout.
  *
  * Sorting/partitioning a table by a single column gives perfect
  * data-skipping on that column and none on any other; interleaving the
  * bits of two columns into one sort key (Morton 1966 — the public
  * technique behind `OPTIMIZE ZORDER BY` in lakehouse table formats)
  * bounds BOTH dimensions' min/max ranges within every file, so filter
  * pushdown on either column prunes files. At 100 TB this is the
  * difference between scanning one clustered slice and scanning the whole
  * table for the second-dimension predicate.
  *
  * The bit-spread uses the standard shift-mask ladder (5 ops per
  * dimension, branch-free); both the interpreted eval and the generated
  * code call the same static helpers so results are identical by
  * construction. Inputs are the low 16 bits of two non-negative longs
  * (callers quantize wider domains first); output is the 32-bit z-value
  * as a long.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (0,2,…,30). */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit Morton code: bits of `x` at even, bits of `y` at odd slots. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Column form: `zvalue(x, y)` over two BIGINT columns. */
  def zvalue(x: Column, y: Column): Column = GraftShims.column(
    ZValueExpr(GraftShims.expression(x), GraftShims.expression(y)))

  /** SQL registration: `SELECT zvalue(x, y)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zvalue", exprs => ZValueExpr(exprs(0), exprs(1)), "built-in")
}

/** Codegen'd 2-D Morton interleave of the low 16 bits of two longs. */
case class ZValueExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"zvalue expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrder.interleave16($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZValueExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zvalue"
}
