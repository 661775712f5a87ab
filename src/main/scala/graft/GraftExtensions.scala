package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.dedup.{DedupOps, MinHashSig, ShingleArray, SimHash32, TextHashKernel}
import graft.similarity.DotProduct
import graft.stats.MultiPatternMask

/** `SparkSessionExtensions` injection point: registers graft's native
  * Catalyst expressions as SQL functions, so the kernels are first-class
  * from `spark.sql(...)` (and thus from any SQL-speaking client of a
  * session configured with
  * `spark.sql.extensions=graft.GraftExtensions`), not only from the Scala
  * DataFrame API:
  *
  *  - `graft_dot(a, b)` — compiled dot product over two array<double>
  *  - `graft_simhash32(tokens)` — 32-bit SimHash of an array<string>
  *  - `graft_minhash_sig(tokens)` — 32-slot MinHash signature over 3-shingles
  *  - `graft_shingles(tokens)` — the 3-token shingle strings
  *  - `graft_pattern_mask(s, p1, p2, …)` — multi-regex match bitmask
  *
  * The hash functions bind the library's canonical constants
  * ([[DedupOps.hashCoeffs]] etc.), so SQL results are bit-identical to the
  * declared-query surface. Registration goes through the injection API (not
  * a session-mutating side registry), so every session built with these
  * extensions — including thread-local cloned sessions on executors of a
  * real cluster — sees the functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def kernel = new TextHashKernel(
    DedupOps.hashCoeffs.map(_._1).toArray,
    DedupOps.hashCoeffs.map(_._2).toArray,
    DedupOps.HashPrime,
    DedupOps.ShingleSize
  )

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def unary(name: String, usage: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name), info(name, usage), { exprs: Seq[Expression] =>
      require(exprs.size == 1, s"$name expects 1 argument, got ${exprs.size}")
      f(exprs.head)
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
        info("graft_dot", "graft_dot(a, b) - compiled dot product of two array<double>"),
        { exprs: Seq[Expression] =>
          require(exprs.size == 2, s"graft_dot expects 2 arguments, got ${exprs.size}")
          DotProduct(exprs(0), exprs(1))
        })
    )
    ext.injectFunction(unary(
      "graft_simhash32",
      "graft_simhash32(tokens) - 32-bit SimHash of array<string>",
      SimHash32(_, kernel)
    ))
    ext.injectFunction(unary(
      "graft_minhash_sig",
      "graft_minhash_sig(tokens) - 32-slot MinHash signature over 3-shingles",
      MinHashSig(_, kernel)
    ))
    ext.injectFunction(unary(
      "graft_shingles",
      "graft_shingles(tokens) - 3-token shingle strings",
      ShingleArray(_, kernel)
    ))
    ext.injectFunction(
      (FunctionIdentifier("graft_pattern_mask"),
        info("graft_pattern_mask", "graft_pattern_mask(s, p1, p2, ...) - multi-regex match bitmask"),
        { exprs: Seq[Expression] =>
          require(exprs.size >= 2, s"graft_pattern_mask expects a value and at least one pattern")
          val patterns = exprs.tail.map {
            case e if e.foldable && e.dataType == org.apache.spark.sql.types.StringType =>
              val v = e.eval()
              if (v == null)
                throw new IllegalArgumentException("pattern arguments must be non-null string literals")
              v.toString
            case other =>
              throw new IllegalArgumentException(s"pattern arguments must be string literals, got $other")
          }
          MultiPatternMask(exprs.head, patterns)
        })
    )
  }
}
