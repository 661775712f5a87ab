package graft.similarity

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Sequential-fold squared-L2 kernel shared by interpreted eval and the
  * generated code. The operation sequence (index 0 → n-1: one subtraction,
  * one multiplication, one running-sum addition per element) is EXACTLY the
  * order the higher-order formulation
  * `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0d, _+_)` performs, so
  * on this library's inputs the produced doubles are bit-identical and every
  * declared oracle hash stays valid (the [[DotProductKernel]] argument,
  * applied to the PQ distance).
  *
  * PRECONDITION: equal-length arrays with no null elements (all call sites
  * pass fixed-dim `slice`/`transform` projections). Outside that domain the
  * kernel diverges from the higher-order formulation exactly like
  * [[DotProductKernel]] does (truncates to the shorter length; a null slot
  * reads 0.0).
  */
final class L2SqKernel extends Serializable {
  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i   = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

/** Native squared L2 distance over two `array<double>` columns — the PQ
  * tier's distance kernel.
  *
  * Spark evaluates higher-order array functions (`aggregate`, `zip_with`)
  * INTERPRETED — per element it allocates lambda variable bindings and walks
  * expression trees; the PQ encode evaluates the distance |codebook| times
  * per (vector, subspace), which made the interpreted form the dominant cost
  * of the `pq_*`/`ivfpq_*` queries. This expression runs the same fold as a
  * tight compiled loop; `doGenCode` embeds a kernel call so the surrounding
  * projection stays inside whole-stage codegen (the [[DotProduct]] pattern).
  * Null if either side is null.
  */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  @transient private lazy val kernel = new L2SqKernel

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("l2sqKernel", kernel, classOf[L2SqKernel].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$k.l2sq($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_l2sq"
}

object L2Sq {
  import org.apache.spark.sql.Column

  /** Column form; both inputs must already be `array<double>`. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      L2Sq(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)
      )
    )
}
