package graft.similarity

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential-fold dot product helper shared by interpreted eval and the
  * generated code. The summation order (index 0 → n-1, one running double)
  * is EXACTLY the order the previous `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * formulation used, so on this library's inputs the produced doubles are
  * bit-identical and every declared oracle hash stays valid.
  *
  * PRECONDITION: equal-length arrays with no null elements (all call sites
  * pass `transform(embedding, …)` projections of a fixed-dim vector column).
  * Outside that domain the kernel diverges from the higher-order
  * formulation: it truncates to the shorter length where `zip_with`
  * null-pads (yielding null products), and a null element slot reads as 0.0
  * instead of nulling the sum.
  */
final class DotProductKernel extends Serializable {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Native dot product over two `array<double>` columns.
  *
  * Spark evaluates higher-order array functions (`aggregate`, `zip_with`)
  * INTERPRETED — per element it allocates lambda variable bindings and walks
  * expression trees, which dominates the similarity ops' runtime. This
  * expression runs the same fold as a tight compiled loop; `doGenCode`
  * embeds a kernel call so the surrounding projection stays inside
  * whole-stage codegen. Null if either side is null (null-intolerant binary
  * semantics, same as the higher-order formulation on null arrays).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  @transient private lazy val kernel = new DotProductKernel

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("dotKernel", kernel, classOf[DotProductKernel].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$k.dot($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  import org.apache.spark.sql.Column

  /** Column form; both inputs must already be `array<double>`. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DotProduct(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)
      )
    )
}
