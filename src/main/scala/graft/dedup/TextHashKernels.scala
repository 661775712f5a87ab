package graft.dedup

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the dedup hash pipeline.
  *
  * Spark evaluates higher-order array functions (`aggregate`, `transform`)
  * INTERPRETED — per element it allocates lambda bindings and walks an
  * expression tree. For SimHash that meant 32 bits × |tokens| tree walks per
  * document plus a `transform(..., md5)` pass; for MinHash, an explode +
  * 32 affine-hash aggregates over every shingle occurrence. These kernels run
  * the identical math as tight compiled loops and — crucially for the MinHash
  * path — turn the signature computation into a PER-ROW expression: no
  * explode, no per-doc shuffle at all. At the 100 TB design point that
  * converts signature generation from a shuffle-bound aggregation into an
  * embarrassingly parallel map pass.
  *
  * Bit-identical contract (spec-asserted in DedupOpsSpec against the
  * interpreted higher-order formulations, so every declared oracle hash is
  * unchanged):
  *   - token/shingle hash = first 8 md5 hex digits as unsigned 32-bit
  *     (= first 4 digest bytes big-endian), exactly
  *     `conv(substring(md5(cast(s AS binary)), 1, 8), 16, 10)` — md5 runs
  *     over the UTF-8 bytes in both formulations;
  *   - SimHash bit j from the sign of Σ±1 over token-hash bit j, with
  *     `(x DIV 2^j) % 2 ≡ (x >>> j) & 1` for the unsigned-32 hash values;
  *   - MinHash slot k = min over shingles of (aₖ·x + bₖ) mod p in signed-64
  *     arithmetic. Overflow proof: aₖ < 2³¹−1 and x < 2³² give
  *     aₖ·x ≤ (2³¹−2)(2³²−1) = 2⁶³ − 2³³ − 2³¹ + 2, leaving ≈ 1.07·10¹⁰
  *     (> 2³³) of headroom below 2⁶³−1, and bₖ < p ≈ 2³² fits inside it —
  *     no overflow, same as the SQL formulation. The constructor enforces
  *     these coefficient ranges so a future coefficient change cannot
  *     silently wrap.
  */
final class TextHashKernel(
    val coeffA: Array[Long],
    val coeffB: Array[Long],
    val prime: Long,
    val shingleSize: Int
) extends Serializable {
  require(
    coeffA.forall(a => a >= 0 && a < 2147483647L),
    "coeffA out of range: aₖ ∈ [0, 2³¹−1) is required for overflow-free aₖ·x"
  )
  require(
    coeffB.forall(b => b >= 0 && b <= 10737418237L),
    "coeffB out of range: bₖ must fit the ~1.07e10 aₖ·x headroom below 2⁶³−1"
  )
  import java.security.MessageDigest

  @transient private lazy val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 4 md5 digest bytes as an unsigned 32-bit value (big-endian) —
    * identical to parsing the first 8 lowercase hex digits in base 16.
    */
  private def hash32(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val dig = d.digest(bytes)
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) | ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }

  private def tokenAt(toks: ArrayData, i: Int): UTF8String = {
    val t = toks.getUTF8String(i)
    // clear failure for SQL callers passing arrays with null elements — the
    // library's own call sites (split/filter output) never produce them
    if (t == null) throw new IllegalArgumentException(s"null token at index $i")
    t
  }

  /** 32-bit SimHash over the token array (tokens hashed as-is; callers
    * pre-filter empties to match the declared formulation).
    */
  def simhash(toks: ArrayData): Long = {
    val n      = toks.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val x = hash32(tokenAt(toks, i).getBytes)
      var j = 0
      while (j < 32) {
        if (((x >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) h |= 1L << j
      j += 1
    }
    h
  }

  private val Space = UTF8String.fromString(" ")

  /** MinHash signature over the row's [[shingleSize]]-token shingles.
    * Duplicate shingles are naturally min-insensitive. Callers pre-filter
    * rows with fewer than [[shingleSize]] tokens (such docs drop out of the
    * signature table, as in the explode+groupBy formulation); for shorter
    * inputs this returns the empty-min sentinel signature (Long.MaxValue).
    */
  def minhashSig(toks: ArrayData): ArrayData = {
    val n   = toks.numElements()
    val w   = shingleSize
    val sig = Array.fill[Any](coeffA.length)(Long.MaxValue)
    var i = 0
    while (i <= n - w) {
      var s = tokenAt(toks, i)
      var j = 1
      while (j < w) {
        s = UTF8String.concat(s, Space, tokenAt(toks, i + j))
        j += 1
      }
      val x = hash32(s.getBytes)
      var k = 0
      while (k < coeffA.length) {
        val h = (coeffA(k) * x + coeffB(k)) % prime
        if (h < sig(k).asInstanceOf[Long]) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** The [[shingleSize]]-token shingle strings themselves (for the exact
    * inverted-index Jaccard tier, which joins on shingle identity). Empty
    * array for inputs shorter than one shingle — such docs contribute no
    * postings, same as the old conditional-`sequence` formulation.
    */
  def shingles(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val w = shingleSize
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - w + 1)
    var i = 0
    while (i <= n - w) {
      var s = tokenAt(toks, i)
      var j = 1
      while (j < w) {
        s = UTF8String.concat(s, Space, tokenAt(toks, i + j))
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native 32-bit SimHash of an `array<string>` token column. Null-intolerant
  * (null input → null), like the higher-order formulation it replaces.
  */
case class SimHash32(child: Expression, kernel: TextHashKernel) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = kernel.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("simhashKernel", kernel, classOf[TextHashKernel].getName)
    defineCodeGen(ctx, ev, c => s"$k.simhash($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash32"
}

/** Native MinHash signature (`array<long>`, one slot per affine hash) of an
  * `array<string>` token column.
  */
case class MinHashSig(child: Expression, kernel: TextHashKernel) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = kernel.minhashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("minhashKernel", kernel, classOf[TextHashKernel].getName)
    defineCodeGen(ctx, ev, c => s"$k.minhashSig($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

/** Native shingle construction: `array<string>` tokens → `array<string>` of
  * consecutive space-joined shingles.
  */
case class ShingleArray(child: Expression, kernel: TextHashKernel) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = kernel.shingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("shingleKernel", kernel, classOf[TextHashKernel].getName)
    defineCodeGen(ctx, ev, c => s"$k.shingles($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}
