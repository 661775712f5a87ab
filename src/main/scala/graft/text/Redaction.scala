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

  /** `text` rewritten (as `redacted_text`) with every rule applied in
    * order; every other column passes through. `n_redactions` counts the
    * ACTUAL matches of each rule against the text as-of its application
    * (rule 2 counts on rule 1's output), so pre-existing literal
    * placeholder strings in source text do not inflate it.
    */
  def redact(docs: DataFrame): DataFrame = {
    val (red, counts) = rules.foldLeft((col("text"), lit(0))) {
      case ((c, n), (_, re, repl)) =>
        (regexp_replace(c, re, repl), n + size(regexp_extract_all(c, lit(re), lit(0))))
    }
    val others = docs.columns.toIndexedSeq.filterNot(c => c == "text" || c == "doc_id").map(col)
    graft.Tables.widen(docs)
      .select(
        (col("doc_id") +: others) :+ red.as("redacted_text") :+
          counts.cast("long").as("n_redactions"): _*
      )
      .orderBy("doc_id")
  }

  def oracleRedact: String = {
    val (red, counts) = rules.foldLeft(("text", List.empty[String])) {
      case ((c, ns), (_, re, repl)) =>
        val esc = re.replace("'", "''")
        (s"regexp_replace($c, '$esc', '$repl', 'g')",
          ns :+ s"len(regexp_extract_all($c, '$esc'))")
    }
    s"""SELECT doc_id, lang, source, n_chars, $red AS redacted_text,
       |  CAST(${counts.mkString(" + ")} AS BIGINT) AS n_redactions
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }
}
