package graft.governance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.model.{ColumnProfile, PiiLevel}

/** PII-driven masking — the governance consumer of the profiling cascade
  * (the reference stores pii_level per column, `base.py:47`, but ships
  * nothing that ACTS on it; this is the natural downstream in a Data Vault
  * satellite serve path).
  *
  * Policy: every column whose profiled [[PiiLevel]] is at or above
  * `minLevel` serves as the md5 of its canonical rendering (deterministic
  * tokenization — equal plaintexts mask to equal tokens, so masked columns
  * still join/group); everything else serves as the rendering itself.
  * Entirely per-row projection — no shuffle, codegen'd.
  */
object Masking {

  private def canon(df: DataFrame, c: String): Column =
    if (df.schema(c).dataType == DoubleType) col(c).cast(DecimalType(18, 2)).cast("string")
    else col(c).cast("string")

  /** Mask `df` according to already-computed `profiles`. Output is all-VARCHAR
    * with the original column names, ordered by the first column's rendering.
    */
  def maskedDF(
      df: DataFrame,
      profiles: Seq[ColumnProfile],
      minLevel: PiiLevel = PiiLevel.Medium
  ): DataFrame = {
    val byName = profiles.map(p => p.originalName -> p.piiLevel).toMap
    val cells = df.columns.toSeq.map { c =>
      val level = byName.getOrElse(c, PiiLevel.None)
      val r     = canon(df, c)
      (if (level >= minLevel) md5(r.cast("binary")) else r).as(c)
    }
    graft.Tables.widen(df).select(cells: _*).orderBy(col(df.columns.head))
  }
}
