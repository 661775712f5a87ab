package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnProfile, PiiLevel, SemanticType}
import graft.report.Datasheet
import graft.stats.ProfileDrift

/** Fuzz for two fixture-only seams of the reporting/monitoring tier:
  *
  *   - [[Datasheet]] — a COMPOSITION of five operator families — checked for
  *     composition consistency on random corpora: every (metric, value) row
  *     must equal the value derived from the constituent operator's OWN
  *     output (each family has its own differential fuzz elsewhere), so what
  *     is under test here is exactly the integration — the unionByName
  *     wiring, metric labels, long/ratio column placement, and ordering —
  *     not the families re-derived.
  *
  *   - [[ProfileDrift]] — the driver-side snapshot diff — against an
  *     independent set-logic reference (removed = names minus names,
  *     changed = field-by-field comparison over the intersection), plus the
  *     algebraic invariants a diff must satisfy: self-drift is empty,
  *     removed/added are dual under argument swap, a looser ratio tolerance
  *     reports a subset of a tighter one, and the driver-facing and
  *     portable renderings agree on the (column, change) relation.
  */
class CompositionDriftFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  // --- Datasheet -------------------------------------------------------------

  private val phrasePieces = Seq(
    "the quick brown fox", "and so it goes", "of the many words here",
    "lorem ipsum dolor sit amet", "el rapido zorro marron", "x", ""
  )

  private def randomDocs(seed: Long): Seq[(Long, String, String, String)] = {
    val rnd  = new scala.util.Random(seed)
    val n    = 12 + rnd.nextInt(40)
    val base = (0 until n).map { i =>
      val text = (0 until (1 + rnd.nextInt(5))).map(_ => phrasePieces(rnd.nextInt(phrasePieces.size)))
        .mkString(" ")
      (i.toLong, text, s"l${rnd.nextInt(3)}", s"s${rnd.nextInt(4)}")
    }
    // plant exact duplicates (some whitespace-variant: exactDuplicates
    // normalizes runs of whitespace, so these must land in one group)
    val dups = (0 until rnd.nextInt(6)).map { j =>
      val (_, t, l, s) = base(rnd.nextInt(base.size))
      val tv = if (j % 2 == 0) t else t.replace(" ", "  ")
      (n.toLong + j, tv, l, s)
    }
    base ++ dups
  }

  private def docsDF(docs: Seq[(Long, String, String, String)], parts: Int): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source").repartition(parts)
  }

  test("datasheet: every metric row equals its constituent operator's own aggregate on 4 random corpora") {
    val tok = java.util.regex.Pattern.compile("[^ ]+")
    for (seed <- 1L to 4L) {
      val docs = randomDocs(seed)
      val df   = docsDF(docs, 1 + new scala.util.Random(seed).nextInt(4))

      val nTokens = docs.map { case (_, t, _, _) =>
        val m = tok.matcher(t); var c = 0L; while (m.find()) c += 1; c
      }.sum
      val dupGroups = graft.dedup.DedupOps.exactDuplicates(df)
        .where(org.apache.spark.sql.functions.col("n_copies") > 1).count()
      val candPairs = graft.dedup.DedupOps.minhashCandidatePairs(df).count()
      val qualRows  = graft.text.TextOps.quality(df).collect()
      val pctGood   = qualRows.count(r => r.getAs[String]("quality_class") == "good").toDouble / qualRows.length
      val langRows  = graft.text.TextOps.langId(df).collect()
      val langCov   = langRows.count(r => r.getAs[String]("pred_lang") != "und").toDouble / langRows.length

      val expected: Seq[(String, Option[Long], Option[Double])] = Seq(
        ("exact_dup_groups", Some(dupGroups), None),
        ("minhash_candidate_pairs", Some(candPairs), None),
        ("n_docs", Some(docs.size.toLong), None),
        ("n_langs", Some(docs.map(_._3).distinct.size.toLong), None),
        ("n_sources", Some(docs.map(_._4).distinct.size.toLong), None),
        ("n_tokens", Some(nTokens), None),
        ("pct_good_quality", None, Some(pctGood)),
        ("pred_lang_coverage", None, Some(langCov))
      )
      val got = Datasheet.datasheet(df).collect().toSeq.map { r =>
        (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
      }
      assert(got == expected, s"seed $seed n ${docs.size}")
    }
  }

  // --- ProfileDrift ----------------------------------------------------------

  private val types = Seq(SemanticType.Identifier, SemanticType.Email, SemanticType.Text, SemanticType.Numeric)
  private val piis  = Seq(PiiLevel.None, PiiLevel.Low, PiiLevel.High)

  private def randomProfile(name: String, rnd: scala.util.Random): ColumnProfile =
    ColumnProfile(
      originalName = name,
      suggestedName = name,
      dataType = types(rnd.nextInt(types.size)),
      isPrimaryKey = rnd.nextBoolean(),
      isBusinessKey = rnd.nextBoolean(),
      piiLevel = piis(rnd.nextInt(piis.size)),
      nullRatio = rnd.nextInt(5) * 0.1,
      uniqueRatio = rnd.nextInt(5) * 0.2
    )

  private def snapshots(seed: Long): (Seq[ColumnProfile], Seq[ColumnProfile]) = {
    val rnd    = new scala.util.Random(seed)
    val names  = (0 until (3 + rnd.nextInt(8))).map(i => s"c$i")
    val before = names.filter(_ => rnd.nextInt(5) > 0).map(randomProfile(_, rnd))
    val after  = names.filter(_ => rnd.nextInt(5) > 0).map(randomProfile(_, rnd))
    (before, after)
  }

  /** Independent set-logic reference for the (column, change) relation. */
  private def refChanges(
      b: Seq[ColumnProfile], a: Seq[ColumnProfile], tol: Double): Set[(String, String)] = {
    val bm = b.map(p => p.originalName -> p).toMap
    val am = a.map(p => p.originalName -> p).toMap
    val removed = (bm.keySet -- am.keySet).map(_ -> "removed")
    val added   = (am.keySet -- bm.keySet).map(_ -> "added")
    val changed = (bm.keySet & am.keySet).flatMap { n =>
      val (pb, pa) = (bm(n), am(n))
      Seq(
        Option.when(pb.dataType != pa.dataType)(n -> "data_type"),
        Option.when(pb.piiLevel != pa.piiLevel)(n -> "pii_level"),
        Option.when(pb.isPrimaryKey != pa.isPrimaryKey)(n -> "is_primary_key"),
        Option.when(pb.isBusinessKey != pa.isBusinessKey)(n -> "is_business_key"),
        Option.when(math.abs(pb.nullRatio - pa.nullRatio) > tol)(n -> "null_ratio"),
        Option.when(math.abs(pb.uniqueRatio - pa.uniqueRatio) > tol)(n -> "unique_ratio")
      ).flatten
    }
    removed ++ added ++ changed
  }

  test("drift: detected (column, change) relation == set-logic reference on 20 random snapshot pairs") {
    for (seed <- 1L to 20L) {
      val (b, a) = snapshots(seed)
      for (tol <- Seq(0.05, 0.25)) {
        val got = ProfileDrift.drift(b, a, tol).map(d => d.columnName -> d.change)
        assert(got.toSet == refChanges(b, a, tol), s"seed $seed tol $tol")
        assert(got.size == got.toSet.size, s"seed $seed tol $tol: duplicate drift rows")
      }
    }
  }

  test("drift algebra: self-drift empty; removed/added dual under swap; looser tolerance ⊆ tighter; portable == driver rendering on the change relation") {
    for (seed <- 31L to 40L) {
      val (b, a) = snapshots(seed)
      assert(ProfileDrift.drift(b, b).isEmpty, s"seed $seed self")
      assert(ProfileDrift.drift(a, a).isEmpty, s"seed $seed self")

      val fwd = ProfileDrift.drift(b, a)
      val bwd = ProfileDrift.drift(a, b)
      assert(
        fwd.filter(_.change == "removed").map(_.columnName).toSet ==
          bwd.filter(_.change == "added").map(_.columnName).toSet, s"seed $seed dual")

      val loose = ProfileDrift.drift(b, a, 0.3).map(d => d.columnName -> d.change).toSet
      val tight = ProfileDrift.drift(b, a, 0.01).map(d => d.columnName -> d.change).toSet
      assert(loose.subsetOf(tight), s"seed $seed tolerance monotonicity")

      val portable = ProfileDrift.driftPortableDF(spark, b, a).collect()
        .map(r => r.getString(0) -> r.getString(1)).toSet
      assert(portable == fwd.map(d => d.columnName -> d.change).toSet, s"seed $seed portable")
    }
  }
}
