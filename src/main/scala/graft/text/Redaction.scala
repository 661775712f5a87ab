package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-text PII redaction — the document-level counterpart of the
  * column-level masking in [[graft.governance.Masking]]: a training corpus
  * scrubs emails/phone-shapes OUT of the text body before anything
  * downstream sees it, not just out of structured columns.
  *
  * Pure per-row `regexp_replace` chain (codegen'd builtin, no UDF, no
  * shuffle) in a fixed declared order, with patterns in the Java∩RE2 common
  * dialect. The e-mail pattern is the unanchored form of the profiling
  * bank's `email_2` ([[graft.pattern.PatternRules]]); the phone pattern is
  * deliberately conservative (separator-structured or +-prefixed number
  * runs) because an unanchored greedy number pattern would eat ordinary
  * integers in running text.
  */
object Redaction {

  /** (label, unanchored regex, replacement) in application order. */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""", "[EMAIL]"),
    ("phone", """\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}""", "[PHONE]")
  )

  /** `text` rewritten with every rule applied in order; other columns pass
    * through. Adds `n_redactions` = how many replacements happened (length
    * delta is not usable — replacements change length — so it recounts the
    * placeholder tokens).
    */
  def redact(docs: DataFrame): DataFrame = {
    val red = rules.foldLeft(col("text")) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl)
    }
    val counts = rules.map { case (label, _, repl) =>
      val quoted = java.util.regex.Pattern.quote(repl)
      size(split(col("redacted_text"), quoted)) - 1
    }
    graft.Tables.widen(docs)
      .select(col("doc_id"), red.as("redacted_text"))
      .withColumn("n_redactions", counts.reduce(_ + _).cast("long"))
      .orderBy("doc_id")
  }

  def oracleRedact: String = {
    val red = rules.foldLeft("text") { case (c, (_, re, repl)) =>
      s"regexp_replace($c, '${re.replace("'", "''")}', '$repl', 'g')"
    }
    val counts = rules
      .map { case (_, _, repl) => s"len(string_split(redacted_text, '$repl')) - 1" }
      .mkString(" + ")
    s"""SELECT doc_id, redacted_text, CAST($counts AS BIGINT) AS n_redactions
       |FROM (SELECT doc_id, $red AS redacted_text FROM documents)
       |ORDER BY doc_id""".stripMargin
  }
}
