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

  /** Field-level differences between `before` and `after`. Ratio shifts
    * below `ratioTolerance` are noise, not drift.
    */
  def drift(
      before: Seq[ColumnProfile],
      after: Seq[ColumnProfile],
      ratioTolerance: Double = 0.05
  ): Seq[Drift] = {
    val b = before.map(p => p.originalName -> p).toMap
    val a = after.map(p => p.originalName -> p).toMap
    val removed = before.filterNot(p => a.contains(p.originalName)).map { p =>
      Drift(p.originalName, "removed", p.dataType.toString, "")
    }
    val added = after.filterNot(p => b.contains(p.originalName)).map { p =>
      Drift(p.originalName, "added", "", p.dataType.toString)
    }
    val changed = after.flatMap { pa =>
      b.get(pa.originalName).toSeq.flatMap { pb =>
        val fields = Seq(
          ("data_type", pb.dataType.toString, pa.dataType.toString),
          ("pii_level", pb.piiLevel.toString, pa.piiLevel.toString),
          ("is_primary_key", pb.isPrimaryKey.toString, pa.isPrimaryKey.toString),
          ("is_business_key", pb.isBusinessKey.toString, pa.isBusinessKey.toString)
        ).collect { case (f, o, n) if o != n => Drift(pa.originalName, f, o, n) }
        val ratios = Seq(
          ("null_ratio", pb.nullRatio, pa.nullRatio),
          ("unique_ratio", pb.uniqueRatio, pa.uniqueRatio)
        ).collect {
          case (f, o, n) if math.abs(o - n) > ratioTolerance =>
            Drift(pa.originalName, f, o.toString, n.toString)
        }
        fields ++ ratios
      }
    }
    (removed ++ added ++ changed).sortBy(d => (d.columnName, d.change))
  }

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
    val b = before.map(p => p.originalName -> p).toMap
    val a = after.map(p => p.originalName -> p).toMap
    val removed = before.filterNot(p => a.contains(p.originalName)).map { p =>
      (p.originalName, "removed", p.dataType.value, "", 0.0, 0.0)
    }
    val added = after.filterNot(p => b.contains(p.originalName)).map { p =>
      (p.originalName, "added", "", p.dataType.value, 0.0, 0.0)
    }
    val changed = after.flatMap { pa =>
      b.get(pa.originalName).toSeq.flatMap { pb =>
        val fields = Seq(
          ("data_type", pb.dataType.value, pa.dataType.value),
          ("pii_level", pb.piiLevel.value, pa.piiLevel.value),
          ("is_primary_key", pb.isPrimaryKey.toString, pa.isPrimaryKey.toString),
          ("is_business_key", pb.isBusinessKey.toString, pa.isBusinessKey.toString)
        ).collect { case (f, o, n) if o != n => (pa.originalName, f, o, n, 0.0, 0.0) }
        val ratios = Seq(
          ("null_ratio", pb.nullRatio, pa.nullRatio),
          ("unique_ratio", pb.uniqueRatio, pa.uniqueRatio)
        ).collect {
          case (f, o, n) if math.abs(o - n) > ratioTolerance =>
            (pa.originalName, f, "", "", o, n)
        }
        fields ++ ratios
      }
    }
    (removed ++ added ++ changed)
      .toDF("column_name", "change", "old_str", "new_str", "old_raw", "new_raw")
      .selectExpr(
        "column_name", "change", "old_str", "new_str",
        "round(old_raw, 6) AS old_num", "round(new_raw, 6) AS new_num")
      .orderBy("column_name", "change")
  }
}
