package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocklist phrase tagging — the safety/compliance filter every corpus
  * pipeline runs before training: count occurrences of each listed phrase
  * (substring semantics, case-folded, multi-word phrases allowed) in every
  * document and flag the hits. The per-row kernel is the replace-length
  * identity `hits(p) = (len(t) − len(replace(t, p, ''))) / len(p)` — exact
  * integer arithmetic available verbatim in both engines, no regex dialect
  * surface at all (phrases are literals, not patterns).
  *
  * Scale shape: pure per-row projection — |phrases| replace scans per
  * document, zero shuffles before the declared ORDER BY. At a real corpus
  * the phrase list is broadcast by constant-folding (it is inlined into the
  * expression tree); a 10⁴-phrase production blocklist would swap the
  * per-phrase column for one Aho–Corasick pass in a native Expression, same
  * output contract.
  *
  * Overlapping-occurrence semantics are replace()'s: non-overlapping,
  * left-to-right — identical in Spark and DuckDB by definition of the
  * shared kernel.
  */
object Blocklist {

  /** (doc_id, n_hits, flagged) per document, doc_id order. */
  def blocklistHits(docs0: DataFrame, phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklist needs at least one phrase")
    require(phrases.forall(p => p.nonEmpty && !p.contains("'")),
      "phrases must be non-empty and quote-free")
    val docs = graft.Tables.widen(docs0)
    // simple-fold BOTH sides of the match: the text through the İ/Σ
    // pre-fold (TextOps.lowerSimple), the phrase through its JVM twin —
    // Java's raw toLowerCase would put a final sigma in a Greek phrase
    // where DuckDB's simple-mapped text has σ
    val lt = TextOps.LowerTextSql
    val hitTerms = phrases.map { p =>
      val lit = TextOps.lowerSimpleJvm(p)
      s"(length($lt) - length(replace($lt, '$lit', ''))) div ${lit.length}"
    }
    docs
      .select(
        col("doc_id"),
        expr(hitTerms.map(t => s"($t)").mkString(" + ")).cast("long").as("n_hits"))
      .withColumn("flagged", col("n_hits") > 0L)
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[blocklistHits]] — the same replace-length identity. */
  def oracleBlocklistHits(phrases: Seq[String]): String = {
    val terms = phrases.map { p =>
      // DuckDB's lower IS the simple mapping — only the phrase needs the fold
      val lit = TextOps.lowerSimpleJvm(p)
      s"(length(lower(text)) - length(replace(lower(text), '$lit', ''))) // ${lit.length}"
    }
    s"""SELECT doc_id,
       |  CAST(${terms.map(t => s"($t)").mkString(" + ")} AS BIGINT) AS n_hits,
       |  (${terms.map(t => s"($t)").mkString(" + ")}) > 0 AS flagged
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
