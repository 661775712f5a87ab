package graft.stats

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving bijection double → signed long (the classic sortable-bits
  * transform, e.g. Lucene's `NumericUtils.doubleToSortableLong`): positive
  * doubles keep their IEEE-754 bit pattern, negative doubles flip every bit
  * except the sign, so SIGNED long comparison of keys orders exactly like
  * Spark's double ordering (-Inf < … < -0.0 < 0.0 < … < +Inf < NaN; NaN
  * canonicalized by `doubleToLongBits`). The rank-select kernel
  * ([[NumericStats.quantiles]]) buckets on the key's leading bits, which is
  * what makes its refinement provably terminate: each round consumes a fixed
  * number of KEY BITS, so ≤ ⌈64/bits⌉ rounds isolate an exact key no matter
  * how adversarial the value distribution is.
  *
  * [[DoubleOrderKey.fromKey]] is the exact inverse (driver-side decode).
  */
case class DoubleOrderKey(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType       = LongType

  override protected def nullSafeEval(v: Any): Any =
    DoubleOrderKey.toKey(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => {
      val b = ctx.freshName("bits")
      // expression form of toKey, inline in the generated projection
      s"""graft.stats.DoubleOrderKey.toKey($v)"""
    })

  override protected def withNewChildInternal(newChild: Expression): DoubleOrderKey =
    copy(child = newChild)

  override def prettyName: String = "graft_double_order_key"
}

object DoubleOrderKey {
  import org.apache.spark.sql.Column

  /** The transform itself — shared by interpreted eval, codegen, and the
    * driver-side sort/decode (one definition, no drift).
    */
  def toKey(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  /** Exact inverse of [[toKey]]. */
  def fromKey(k: Long): Double = {
    val b = if (k >= 0) k else k ^ 0x7fffffffffffffffL
    java.lang.Double.longBitsToDouble(b)
  }

  /** Column form; input must be DoubleType. */
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DoubleOrderKey(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
