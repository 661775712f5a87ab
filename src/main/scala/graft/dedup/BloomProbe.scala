package graft.dedup

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Executor-side Bloom membership probe over a broadcast filter. The
  * broadcast handle (not the filter) rides inside the expression, so each
  * executor fetches the sketch once however many tasks probe it.
  *
  * Hash contract: `mightContainBinary(utf8Bytes)` — BYTE-identical to the
  * `mightContainString` probe the previous Scala-UDF formulation used
  * (`BloomFilterImpl.mightContainString` is exactly `mightContainBinary`
  * over the string's UTF-8 bytes, and `UTF8String.getBytes` yields those
  * bytes without the String decode/re-encode round-trip). BloomProbeSpec
  * fuzzes the equivalence over hostile unicode.
  *
  * Precondition (ADVICE r13): the byte-identity holds for WELL-FORMED
  * UTF-8 payloads — every string Spark materializes from Parquet/JSON/CSV
  * sources, and every shingle the contamination pipeline feeds this probe.
  * On an invalid-UTF-8 `UTF8String` (constructible only via raw binary
  * casts) this kernel intentionally probes the RAW bytes, where the old
  * UDF's `String` decode would first have replaced invalid sequences with
  * U+FFFD and probed the repaired encoding. Raw-bytes is the semantics we
  * WANT — both the filter's `putBinary` population and the probe then see
  * the same bytes, with no lossy repair in between; BloomProbeSpec's
  * invalid-byte case documents the divergence from the legacy repair path.
  */
final class BloomProbeKernel(bcast: Broadcast[BloomFilter]) extends Serializable {
  def mightContain(s: UTF8String): Boolean =
    bcast.value.mightContainBinary(s.getBytes)
}

/** Native Catalyst form of the Bloom contamination probe (VERDICT r12 #6):
  * the last interpreted per-row function in a declared hot loop becomes a
  * codegen expression, so the corpus-shingle filter stage stays inside
  * whole-stage codegen instead of boxing every row through a Scala UDF.
  * Null-intolerant unary semantics (null shingle → null → filtered), same
  * outcome as the UDF's `s != null && probe(s)` under a `where`.
  */
case class BloomMightContain(child: Expression, kernel: BloomProbeKernel)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(s: Any): Any =
    kernel.mightContain(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("bloomKernel", kernel, classOf[BloomProbeKernel].getName)
    defineCodeGen(ctx, ev, c => s"$k.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}

object BloomMightContain {

  /** Column form over a string column and a broadcast Bloom filter. */
  def apply(c: Column, bcast: Broadcast[BloomFilter]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.GraftColumnBridge.expression(c),
        new BloomProbeKernel(bcast)))
}
