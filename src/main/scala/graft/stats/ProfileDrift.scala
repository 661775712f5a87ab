package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.ColumnProfile

/** Schema/semantic drift between two profile snapshots — the monitoring
  * layer of a recurring pipeline: yesterday's profile vs today's tells you
  * when a column appeared, vanished, changed inferred type, changed PII
  * classification, or shifted its null/uniqueness statistics past a
  * tolerance. Profiles are tiny (O(columns)), so the diff is driver-side
  * by design — the heavy lifting already happened in the profiling scans
  * (and at 100 TB those can be the MERGED per-slice profiles from
  * [[MergeableStats]], so drift monitoring costs no extra full scans).
  */
object ProfileDrift {

  final case class Drift(
      columnName: String,
      change: String,
      oldValue: String,
      newValue: String
  )

  /** One detected difference, carrying BOTH renderings of each side: the
    * driver-facing `toString` form ([[drift]]) and the engine-portable
    * `.value`-vocabulary form ([[driftPortableDF]]); ratio drifts carry the
    * raw doubles. ONE diff core feeds both consumers, so the removed/added/
    * changed logic and the tolerance rule cannot diverge between the
    * driver-side diff and the declared portable output (r11 review).
    */
  private final case class RawDrift(
      col: String,
      change: String,
      oldStr: String,
      newStr: String,
      oldPortable: String,
      newPortable: String,
      oldNum: Double,
      newNum: Double,
      isRatio: Boolean
  )

  private def diffCore(
      before: Seq[ColumnProfile],
      after: Seq[ColumnProfile],
      ratioTolerance: Double
  ): Seq[RawDrift] = {
    val b = before.map(p => p.originalName -> p).toMap
    val a = after.map(p => p.originalName -> p).toMap
    def cat(col: String, change: String, o: (String, String), n: (String, String)) =
      RawDrift(col, change, o._1, n._1, o._2, n._2, 0.0, 0.0, isRatio = false)
    val removed = before.filterNot(p => a.contains(p.originalName)).map { p =>
      cat(p.originalName, "removed", (p.dataType.toString, p.dataType.value), ("", ""))
    }
    val added = after.filterNot(p => b.contains(p.originalName)).map { p =>
      cat(p.originalName, "added", ("", ""), (p.dataType.toString, p.dataType.value))
    }
    val changed = after.flatMap { pa =>
      b.get(pa.originalName).toSeq.flatMap { pb =>
        val fields = Seq(
          ("data_type", (pb.dataType.toString, pb.dataType.value), (pa.dataType.toString, pa.dataType.value)),
          ("pii_level", (pb.piiLevel.toString, pb.piiLevel.value), (pa.piiLevel.toString, pa.piiLevel.value)),
          ("is_primary_key", (pb.isPrimaryKey.toString, pb.isPrimaryKey.toString),
            (pa.isPrimaryKey.toString, pa.isPrimaryKey.toString)),
          ("is_business_key", (pb.isBusinessKey.toString, pb.isBusinessKey.toString),
            (pa.isBusinessKey.toString, pa.isBusinessKey.toString))
        ).collect { case (f, o, n) if o._1 != n._1 => cat(pa.originalName, f, o, n) }
        val ratios = Seq(
          ("null_ratio", pb.nullRatio, pa.nullRatio),
          ("unique_ratio", pb.uniqueRatio, pa.uniqueRatio)
        ).collect {
          case (f, o, n) if math.abs(o - n) > ratioTolerance =>
            RawDrift(pa.originalName, f, o.toString, n.toString, "", "", o, n, isRatio = true)
        }
        fields ++ ratios
      }
    }
    (removed ++ added ++ changed).sortBy(d => (d.col, d.change))
  }

  /** Field-level differences between `before` and `after`. Ratio shifts
    * below `ratioTolerance` are noise, not drift.
    */
  def drift(
      before: Seq[ColumnProfile],
      after: Seq[ColumnProfile],
      ratioTolerance: Double = 0.05
  ): Seq[Drift] =
    diffCore(before, after, ratioTolerance).map(d => Drift(d.col, d.change, d.oldStr, d.newStr))

  def driftDF(
      spark: SparkSession,
      before: Seq[ColumnProfile],
      after: Seq[ColumnProfile],
      ratioTolerance: Double = 0.05
  ): DataFrame = {
    import spark.implicits._
    drift(before, after, ratioTolerance)
      .map(d => (d.columnName, d.change, d.oldValue, d.newValue))
      .toDF("column_name", "change", "old_value", "new_value")
  }

  /** The DECLARED cross-engine form of [[drift]] (r7): categorical changes
    * carry portable string renderings (`SemanticType.value`/`PiiLevel.value`
    * vocabulary, lowercase booleans — matching SQL `CAST(bool AS VARCHAR)`),
    * ratio shifts carry the raw doubles in separate NUMERIC columns (rounded
    * to 6 through Spark's own `round`, the repo float convention) — never a
    * `Double.toString`, whose shortest-representation rendering is not
    * engine-portable. Unused columns hold '' / 0.0 sentinels rather than
    * NULLs so the hash compare never depends on engine null ordering.
    */
  def driftPortableDF(
      spark: SparkSession,
      before: Seq[ColumnProfile],
      after: Seq[ColumnProfile],
      ratioTolerance: Double = 0.05
  ): DataFrame = {
    import spark.implicits._
    diffCore(before, after, ratioTolerance)
      .map { d =>
        if (d.isRatio) (d.col, d.change, "", "", d.oldNum, d.newNum)
        else (d.col, d.change, d.oldPortable, d.newPortable, 0.0, 0.0)
      }
      .toDF("column_name", "change", "old_str", "new_str", "old_raw", "new_raw")
      .selectExpr(
        "column_name", "change", "old_str", "new_str",
        "round(old_raw, 6) AS old_num", "round(new_raw, 6) AS new_num")
      .orderBy("column_name", "change")
  }
}
