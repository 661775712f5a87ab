package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-operator differential fuzz: random small event corpora are run
  * through the DISTRIBUTED operators and through straightforward in-JVM
  * reference implementations of the same declared semantics, and the results
  * must match EXACTLY. This is the third leg next to the DuckDB oracle gate
  * (one corpus shape, two engines) and the kernel-level PropertySpec fuzz
  * (pure functions): here the randomized axis is the CORPUS — same-microsecond
  * ties, single-event users, NULL users/types, empty types, out-of-order
  * ids — against the window-ordering-heavy operators where a partitioning or
  * tie-break bug would be invisible on friendly data.
  *
  * The corpora deliberately include NULL `ts` rows; the references implement
  * the timed-event doctrine (EventOps excludes rows that cannot sit on a
  * timeline), so these tests also pin that exclusion.
  */
class DifferentialFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private case class Ev(id: Long, ts: Option[Long], user: Option[Long], etype: Option[String])

  private def corpus(seed: Long, n: Int = 120): Seq[Ev] = {
    val rnd   = new scala.util.Random(seed)
    val types = Seq("signup", "view", "click", "purchase", "error")
    val base  = 1704067200000000L
    (0 until n).map { i =>
      val ts =
        if (rnd.nextInt(20) == 0) None
        // coarse grid so same-µs ties across and within users are common
        else Some(base + rnd.nextInt(50) * 600000000L + rnd.nextInt(3) * 1000000L)
      val user  = if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(6).toLong)
      val etype = if (rnd.nextInt(25) == 0) None else Some(types(rnd.nextInt(types.size)))
      Ev(i.toLong, ts, user, etype)
    }
  }

  private def toDF(evs: Seq[Ev]): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("user_id", LongType, nullable = true),
      StructField("event_type", StringType, nullable = true),
      StructField("value", DoubleType, nullable = true),
      StructField("props", StringType, nullable = true)
    ))
    val rows = evs.map { e =>
      Row(e.id, e.ts.map(us => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))).orNull,
        e.user.map(Long.box).orNull, e.etype.orNull, 1.0, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  /** timed + per-user (t, event_id)-sorted sequences — the shared reference
    * front half (None user is its own partition, like a NULL group key).
    */
  private def seqsByUser(evs: Seq[Ev]): Map[Option[Long], Seq[Ev]] =
    evs.filter(_.ts.isDefined).groupBy(_.user)
      .map { case (u, es) => u -> es.sortBy(e => (e.ts.get, e.id)) }

  test("sessionize: distributed gap-split == reference on 6 random corpora") {
    for (seed <- 1L to 6L) {
      val evs   = corpus(seed)
      val gapUs = 1800L * 1000000L
      val expected = seqsByUser(evs).toSeq.flatMap { case (user, es) =>
        // walk the sorted sequence, split on gap > gapUs
        val sessions = es.foldLeft(Vector.empty[Vector[Ev]]) { (acc, e) =>
          if (acc.isEmpty || e.ts.get - acc.last.last.ts.get > gapUs) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
        }
        sessions.zipWithIndex.map { case (s, i) =>
          (user, (i + 1).toLong, s.head.ts.get, s.last.ts.get, s.size.toLong)
        }
      }.sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
      val got = graft.streaming.Sessionize.batchSessions(toDF(evs)).collect().toSeq
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("transitions: distributed lag-pairs == reference on 6 random corpora") {
    for (seed <- 10L to 15L) {
      val evs = corpus(seed)
      val expected = seqsByUser(evs).values.flatMap { es =>
        es.sliding(2).collect { case Seq(a, b) if a.etype.isDefined => (a.etype, b.etype) }
      }.groupBy(identity).map { case ((p, nx), xs) => (p.get, nx.orNull, xs.size.toLong) }
        .toSeq.sortBy(r => (r._1, Option(r._2).getOrElse("")))
      val got = graft.analytics.EventOps.transitions(toDF(evs)).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(r => (r._1, Option(r._2).getOrElse("")))
      assert(got == expected, s"seed $seed")
    }
  }

  test("retention: distributed cohort matrix == reference on 6 random corpora") {
    val MicrosPerDay = 86400000000L
    for (seed <- 20L to 25L) {
      val evs = corpus(seed)
      // NULL users never survive the cohort equi-join (NULL key matches
      // nothing) and count_distinct ignores them — same on both engines
      val activity = evs.collect { case Ev(_, Some(t), Some(u), _) => (u, t / MicrosPerDay) }.distinct
      val cohorts  = activity.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
      val expected = activity
        .map { case (u, d) => (cohorts(u), d - cohorts(u), u) }
        .groupBy(r => (r._1, r._2))
        .map { case ((c, off), xs) => (c, off, xs.map(_._3).distinct.size.toLong) }
        .toSeq.sorted
      val got = graft.analytics.EventOps.retention(toDF(evs)).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got == expected, s"seed $seed")
    }
  }

  test("scd2 episodes: distributed islands == reference on 6 random changelogs") {
    import org.apache.spark.sql.functions.expr
    for (seed <- 40L to 45L) {
      val rnd  = new scala.util.Random(seed)
      val vals = Seq("A", "B", "C")
      val rows = (0 until 80).map { i =>
        val key     = rnd.nextInt(5).toLong
        val time    = if (rnd.nextInt(15) == 0) None else Some(1000L + rnd.nextInt(40) * 10L)
        val tracked = if (rnd.nextInt(10) == 0) None else Some(vals(rnd.nextInt(vals.size)))
        (i.toLong, key, time, tracked)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, k, t, v) =>
          Row(id, k, t.map(Long.box).orNull, v.orNull)
        }, 4),
        StructType(Seq(
          StructField("tie", LongType, nullable = false),
          StructField("key", LongType, nullable = false),
          StructField("t", LongType, nullable = true),
          StructField("v", StringType, nullable = true))))
      // reference: timed rows only, sorted per key by (t, tie); NULL-SAFE
      // change detection — a NULL tracked value is its own value, so chg = 1
      // on the first row or whenever Option[value] differs from the previous
      // row's Option[value]; then episode min-time/count + lead(valid_from)
      val expected = rows.collect { case (id, k, Some(t), v) => (k, t, id, v) }
        .groupBy(_._1).toSeq.flatMap { case (k, es) =>
          val sorted = es.sortBy(e => (e._2, e._3))
          var ep = 0L
          val numbered = sorted.zipWithIndex.map { case (e, i) =>
            val chg = i == 0 || sorted(i - 1)._4 != e._4
            if (chg) ep += 1
            (k, ep, e._4, e._2)
          }
          val eps = numbered.groupBy(x => (x._2, x._3)).toSeq
            .map { case ((ep0, v), xs) => (k, ep0, v, xs.map(_._4).min, xs.size.toLong) }
            .sortBy(_._2)
          eps.zipWithIndex.map { case ((kk, ep0, v, from, n), i) =>
            val to = if (i + 1 < eps.size) Some(eps(i + 1)._4) else None
            (kk, ep0, v.orNull, from, to.map(Long.box).orNull, n)
          }
        }.sortBy(r => (r._1, r._2))
      val got = graft.vault.Scd2.episodes(df, "key", "v", "t", "tie").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]).map(Long.box).orNull, r.getLong(5)))
        .sortBy(r => (r._1, r._2))
      assert(got == expected, s"seed $seed")
    }
  }

  test("cdc changelog: latest-wins snapshot == reference on 6 random changelogs") {
    for (seed <- 50L to 55L) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 60).map { i =>
        (i.toLong + 1L, rnd.nextInt(8).toLong, if (rnd.nextInt(4) == 0) "D" else "U",
          rnd.nextInt(100).toDouble)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (seq, k, op, pay) => Row(k, seq, op, pay) }, 4),
        StructType(Seq(
          StructField("key", LongType, nullable = false),
          StructField("seq", LongType, nullable = false),
          StructField("op", StringType, nullable = false),
          StructField("pay", DoubleType, nullable = false))))
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (k, es) =>
        val w = es.maxBy(_._1)
        if (w._3 == "D") None else Some((k, w._1, w._3, w._4))
      }.sortBy(_._1)
      val got = graft.cdc.ChangeCapture.applyChangelog(df, "key", "seq", "op")
        .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .sortBy(_._1)
      assert(got == expected, s"seed $seed")
    }
  }

  test("as-of join: union-window formulation == reference on 6 random inputs") {
    for (seed <- 60L to 65L) {
      val rnd = new scala.util.Random(seed)
      // right: (tie unique, key, time, attr) with NULL keys/times sprinkled
      val right = (0 until 50).map { i =>
        (i.toLong,
          if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(5).toLong),
          if (rnd.nextInt(8) == 0) None else Some(100L + rnd.nextInt(20) * 10L),
          rnd.nextInt(1000).toDouble)
      }
      val left = (0 until 40).map { i =>
        (1000L + i,
          if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(5).toLong),
          if (rnd.nextInt(8) == 0) None else Some(100L + rnd.nextInt(20) * 10L))
      }
      val rightDF = spark.createDataFrame(
        spark.sparkContext.parallelize(right.map { case (t, k, tm, a) =>
          Row(t, k.map(Long.box).orNull, tm.map(Long.box).orNull, a) }, 3),
        StructType(Seq(
          StructField("r_tie", LongType, nullable = false),
          StructField("r_key", LongType, nullable = true),
          StructField("r_time", LongType, nullable = true),
          StructField("attr", DoubleType, nullable = false))))
      val leftDF = spark.createDataFrame(
        spark.sparkContext.parallelize(left.map { case (id, k, tm) =>
          Row(id, k.map(Long.box).orNull, tm.map(Long.box).orNull) }, 3),
        StructType(Seq(
          StructField("l_id", LongType, nullable = false),
          StructField("l_key", LongType, nullable = true),
          StructField("l_time", LongType, nullable = true))))
      // reference: NULL left key/time → no match (equi-join + timeline
      // semantics); else latest right row (max (time, tie)) with the same
      // key at or before the left time, among non-null-key/time right rows
      val expected = left.map { case (id, k, tm) =>
        val m = (k, tm) match {
          case (Some(kk), Some(t)) =>
            right.collect { case (tie, Some(rk), Some(rt), a) if rk == kk && rt <= t => (rt, tie, a) }
              .sortBy(r => (r._1, r._2)).lastOption
          case _ => None
        }
        (id, m.map(x => Double.box(x._3)).orNull)
      }.sortBy(_._1)
      val got = graft.analytics.AsOfJoin.asOf(
          leftDF, "l_key", "l_time", rightDF, "r_key", "r_time",
          attrs = Seq("attr"), tieBreak = "r_tie")
        .select(col("l_id"), col("asof_attr"))
        .collect().toSeq
        .map(r => (r.getLong(0), Option(r.get(1)).map(x => Double.box(x.asInstanceOf[Double])).orNull))
        .sortBy(_._1)
      assert(got == expected, s"seed $seed")
    }
  }

  test("skyline: sort-filter frontier == quadratic dominance reference on 6 random catalogs") {
    for (seed <- 70L to 75L) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 60).map { i =>
        (i.toLong,
          if (rnd.nextInt(12) == 0) None else Some((rnd.nextInt(8) * 25).toDouble),
          if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(8)))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (id, p, s) =>
          Row(id, p.map(Double.box).orNull, s.map(Int.box).orNull) }, 4),
        StructType(Seq(
          StructField("pk", LongType, nullable = false),
          StructField("price", DoubleType, nullable = true),
          StructField("size", IntegerType, nullable = true))))
      val defined = rows.collect { case (id, Some(p), Some(s)) => (id, p, s.toLong) }
      def dominated(p: Double, s: Long): Boolean = defined.exists { case (_, q, t) =>
        q <= p && t >= s && (q < p || t > s)
      }
      val expected = defined.collect { case (id, p, s) if !dominated(p, s) => (id, p, s) }
        .sortBy(r => (r._2, -r._3, r._1))
      val got = graft.olap.Skyline.skyline(df, "price", "size", Seq("pk"))
        .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2).toLong))
        .sortBy(r => (r._2, -r._3, r._1))
      assert(got == expected, s"seed $seed")
    }
  }

  test("md5 gate: sample/stratified/quota == independent JVM MessageDigest reference") {
    // the gate is THE reproducibility primitive of the sampling family; this
    // reference recomputes it with java.security.MessageDigest (no Spark, no
    // DuckDB) so all three implementations must agree bit-for-bit
    def jvmGate(key: String, salt: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$key:$salt".getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    for (seed <- 80L to 83L) {
      val rnd  = new scala.util.Random(seed)
      val keys = (0 until 200).map(_ => rnd.nextLong(1000000L)).distinct
      val strata = keys.map(k => (k, s"s${k % 5}"))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(strata.map { case (k, s) => Row(k, s) }, 4),
        StructType(Seq(
          StructField("key", LongType, nullable = false),
          StructField("stratum", StringType, nullable = false))))

      val fr = 0.3
      val expSample = strata.collect {
        case (k, _) if jvmGate(k.toString, "graft") < graft.sampling.Sampling.HashSpace * 3 / 10 => k
      }.sorted
      val gotSample = graft.sampling.Sampling.sampleByHash(df, "key", fr)
        .select("key").collect().map(_.getLong(0)).toSeq.sorted
      assert(gotSample == expSample, s"sample seed $seed")

      val cap = 7
      val expQuota = strata.groupBy(_._2).toSeq.flatMap { case (_, ks) =>
        ks.map(_._1).sortBy(k => (jvmGate(k.toString, "graft"), k)).take(cap)
      }.sorted
      val gotQuota = graft.sampling.Sampling.quotaByHash(df, "key", "stratum", cap)
        .select("key").collect().map(_.getLong(0)).toSeq.sorted
      assert(gotQuota == expQuota, s"quota seed $seed")
    }
  }

  test("funnel: distributed earliest-chain == reference on 6 random corpora") {
    val steps = Seq("signup", "view", "purchase")
    val winUs = 7L * 86400L * 1000000L
    for (seed <- 30L to 35L) {
      val evs  = corpus(seed)
      val byUser = seqsByUser(evs)
      // reference: per user, earliest chain t1 < t2 < ... with tk from step k
      // strictly after t(k-1) and within t1 + win; count survivors per step
      val counts = Array.fill(steps.size)(0L)
      byUser.foreach { case (user, es) =>
        val t1 = es.filter(_.etype.contains(steps.head)).map(_.ts.get).minOption
        t1.foreach { start =>
          counts(0) += 1
          var prev = start
          var k    = 1
          // a NULL user_id can complete step 1 (groupBy keeps the NULL
          // group) but never step 2+: the step join's NULL key matches
          // nothing — identical on both engines, mirrored here
          var live = user.isDefined
          while (live && k < steps.size) {
            val tk = es.filter(e => e.etype.contains(steps(k)) &&
              e.ts.get > prev && e.ts.get <= start + winUs).map(_.ts.get).minOption
            tk match {
              case Some(t) => counts(k) += 1; prev = t; k += 1
              case None    => live = false
            }
          }
        }
      }
      val expected = steps.indices.map(i => ((i + 1).toLong, steps(i), counts(i))).toSeq
      val got = graft.analytics.EventOps.funnel(toDF(evs), steps).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(got == expected, s"seed $seed")
    }
  }
}
