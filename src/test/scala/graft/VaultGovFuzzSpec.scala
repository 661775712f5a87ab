package graft

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.governance.Masking
import graft.model.{ColumnProfile, PiiLevel, SemanticType}
import graft.vault.DataVault

/** Differential fuzz of the Data Vault generators and the PII masking
  * projection against in-JVM digest references. The fiddly contracts pinned
  * here: `concat_ws('||', …)` SKIPS null parts entirely (a null business key
  * hashes as if absent — `sha256("entity")` when every part is null, and a
  * satellite whose attributes are all null hashdiffs the EMPTY string);
  * doubles canonicalize through DECIMAL(18,2) HALF_UP before hashing or
  * serving (`BigDecimal.valueOf(d).setScale(2)` — the Double.toString-based
  * path both engines share); hub/link grain is DISTINCT over keys with null
  * tuples as values; fdCandidates counts a null determinant value as a
  * group and a null dependent value as a distinct value; masking is
  * `md5(canonical rendering)` for columns at/above the policy level, the
  * rendering itself below it, and null stays null on both arms.
  */
class VaultGovFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  // --- digest references -----------------------------------------------------

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private def sha256(s: String): String =
    hex(MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8")))

  private def md5(s: String): String =
    hex(MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")))

  /** concat_ws('||', parts…) — null parts are skipped, not rendered. */
  private def joinParts(parts: Seq[Option[String]]): String =
    parts.flatten.mkString("||")

  private def hashKey(entity: String, parts: Seq[Option[String]]): String =
    sha256(joinParts(Some(entity) +: parts))

  /** DECIMAL(18,2) canon of a double (Double.toString-based, HALF_UP). */
  private def canonD(d: Double): String =
    java.math.BigDecimal.valueOf(d).setScale(2, java.math.RoundingMode.HALF_UP).toPlainString

  // --- corpus ----------------------------------------------------------------

  /** (id: Long, name: String?, bal: Double?, grp: String?) with planted
    * duplicate key combos, null keys/attrs, and 3-decimal doubles that
    * exercise the HALF_UP rounding.
    */
  private def rows(seed: Long): Seq[(Long, String, java.lang.Double, String)] = {
    val rnd = new scala.util.Random(seed)
    val n   = 25 + rnd.nextInt(50)
    (0 until n).map { _ =>
      val id   = rnd.nextInt(12).toLong // duplicates by construction
      val name = if (rnd.nextInt(5) == 0) null else s"n${rnd.nextInt(6)}"
      val bal: java.lang.Double =
        if (rnd.nextInt(6) == 0) null
        else rnd.nextInt(4) match {
          case 0 => rnd.nextInt(100000) / 100.0          // exact 2-dec
          case 1 => rnd.nextInt(100000) / 1000.0         // 3-dec → HALF_UP
          case 2 => -(rnd.nextInt(100000) / 100.0)       // negative
          case _ => rnd.nextInt(100).toDouble            // integral
        }
      val grp = if (rnd.nextInt(6) == 0) null else s"g${rnd.nextInt(4)}"
      (id, name, bal, grp)
    }
  }

  private def toDF(xs: Seq[(Long, String, java.lang.Double, String)], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("bal", DoubleType, nullable = true),
      StructField("grp", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(xs.map { case (a, b, c, d) => Row(a, b, c, d) }, parts), schema)
  }

  private def optS(r: Row, i: Int): Option[String] = if (r.isNullAt(i)) None else Some(r.getString(i))

  // --- tests -----------------------------------------------------------------

  test("hub == distinct keys + sha256 reference (null key parts skipped by concat_ws)") {
    for (seed <- 1L to 6L) {
      val xs = rows(seed)
      val got = DataVault.hub(toDF(xs, 1 + new scala.util.Random(seed).nextInt(5)), "ent", Seq("id", "name"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), optS(r, 2)))
        .toSet
      val expected = xs.map(x => (x._1, Option(x._2))).distinct.map { case (id, name) =>
        (hashKey("ent", Seq(Some(id.toString), name)), id, name)
      }.toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("satellite == per-row (hk, hashdiff) reference (all-null attrs hashdiff the empty string)") {
    for (seed <- 11L to 16L) {
      val xs = rows(seed)
      val got = DataVault
        .satellite(toDF(xs, 1 + new scala.util.Random(seed).nextInt(5)), "ent", Seq("id"), Seq("name", "bal"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), optS(r, 3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toSeq.sortBy(_.toString)
      val expected = xs.map { case (id, name, bal, _) =>
        val balC = Option(bal).map(b => canonD(b.doubleValue))
        (hashKey("ent", Seq(Some(id.toString))),
          sha256(joinParts(Seq(Option(name), balC))),
          id, Option(name), Option(bal).map(_.doubleValue))
      }.sortBy(_.toString)
      assert(got == expected, s"seed $seed")
    }
  }

  test("linkN == distinct member combos with per-member hub keys") {
    for (seed <- 21L to 26L) {
      val xs = rows(seed)
      val got = DataVault
        .linkN(toDF(xs, 1 + new scala.util.Random(seed).nextInt(5)), "lnk", Seq("a" -> "id", "b" -> "grp"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), optS(r, 4)))
        .toSet
      val expected = xs.map(x => (x._1, Option(x._4))).distinct.map { case (id, grp) =>
        (hashKey("lnk", Seq(Some(id.toString), grp)),
          hashKey("a", Seq(Some(id.toString))),
          hashKey("b", Seq(grp)),
          id, grp)
      }.toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("compositeKeys == distinct-count reference (null combos are values)") {
    for (seed <- 31L to 36L) {
      val xs   = rows(seed)
      val sets = Seq(Seq("id"), Seq("id", "name"), Seq("name", "grp"))
      val got = DataVault.compositeKeys(toDF(xs, 1 + new scala.util.Random(seed).nextInt(5)), sets)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSeq
      val expected = sets.map { ks =>
        val proj = xs.map(x => ks.map {
          case "id" => Option(x._1); case "name" => Option(x._2); case "grp" => Option(x._4)
        })
        val d = proj.distinct.size.toLong
        (ks.mkString(","), xs.size.toLong, d, d == xs.size.toLong)
      }.sortBy(_._1)
      assert(got == expected, s"seed $seed")
    }
  }

  test("fdCandidates == violating-group reference (null det is a group, null dep a distinct value)") {
    for (seed <- 41L to 46L) {
      val xs = rows(seed)
      val cols = Seq("id", "name", "grp")
      def render(x: (Long, String, java.lang.Double, String), c: String): Option[String] = c match {
        case "id" => Some(x._1.toString); case "name" => Option(x._2); case "grp" => Option(x._4)
      }
      val got = DataVault.fdCandidates(toDF(xs, 1 + new scala.util.Random(seed).nextInt(5)), cols)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
        .toSeq
      val expected = (for {
        det <- cols
        dep <- cols if dep != det
      } yield {
        val pairs = xs.map(x => (render(x, det), render(x, dep))).distinct
        val violating = pairs.groupBy(_._1).count(_._2.size > 1).toLong
        (det, dep, violating, violating == 0L)
      }).sortBy(p => (p._1, p._2))
      assert(got == expected, s"seed $seed")
    }
  }

  test("maskedDF == md5-token reference at each policy level (null stays null; below-level serves canon)") {
    for (seed <- 51L to 56L) {
      val xs = rows(seed)
      val profiles = Seq(
        ColumnProfile("id", "id", SemanticType.Identifier, piiLevel = PiiLevel.None),
        ColumnProfile("name", "name", SemanticType.Text, piiLevel = PiiLevel.High),
        ColumnProfile("bal", "bal", SemanticType.Numeric, piiLevel = PiiLevel.Medium),
        ColumnProfile("grp", "grp", SemanticType.Text, piiLevel = PiiLevel.Low))
      for (minLevel <- Seq(PiiLevel.Low, PiiLevel.Medium, PiiLevel.High)) {
        val got = Masking
          .maskedDF(toDF(xs, 1 + new scala.util.Random(seed).nextInt(5)), profiles, minLevel)
          .collect()
          .map(r => (optS(r, 0), optS(r, 1), optS(r, 2), optS(r, 3)))
          .toSeq.sorted
        def serve(level: PiiLevel, canon: Option[String]): Option[String] =
          if (level >= minLevel) canon.map(md5) else canon
        val expected = xs.map { case (id, name, bal, grp) =>
          (serve(PiiLevel.None, Some(id.toString)),
            serve(PiiLevel.High, Option(name)),
            serve(PiiLevel.Medium, Option(bal).map(b => canonD(b.doubleValue))),
            serve(PiiLevel.Low, Option(grp)))
        }.sorted
        assert(got == expected, s"seed $seed minLevel $minLevel")
      }
    }
  }
}
