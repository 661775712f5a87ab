package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.model._
import graft.pattern.PatternRules
import graft.stats.PatternBankMatcher

/** Property-based invariants of the pure rule layer + fuzz equivalence of
  * the native pattern-bank matcher against java.util.regex ground truth.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic generator driver (the scalatest-scalacheck bridge is not
    * in the offline cache; a seeded loop gives reproducible fuzzing).
    */
  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(params, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced of $n")
  }

  private val asciiString: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.stringOfN(n, Gen.choose(' ', '~')))

  private val nameGen: Gen[String] =
    Gen.chooseNum(1, 20).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('_'), 1 -> Gen.const(' ')))
    )

  test("suggestedName: lowercase, no edge underscores, idempotent") {
    forAll(nameGen) { name =>
      val s = PatternRules.suggestedName(name)
      assert(s == s.toLowerCase)
      assert(!s.startsWith("_") && !s.endsWith("_"))
      assert(PatternRules.suggestedName(s) == s) // fixed point
    }
  }

  test("businessMeaning is non-empty and mentions the normalized name words") {
    forAll(nameGen.suchThat(_.exists(_.isLetterOrDigit))) { name =>
      for (dt <- SemanticType.all) {
        val m = PatternRules.businessMeaning(name, dt)
        assert(m.nonEmpty)
      }
    }
  }

  test("PiiLevel ordering is total and merge-max is commutative/associative") {
    val lvls = PiiLevel.all
    for (a <- lvls; b <- lvls) {
      assert(Seq(a, b).max == Seq(b, a).max)
      for (c <- lvls)
        assert(Seq(Seq(a, b).max, c).max == Seq(a, Seq(b, c).max).max)
    }
    assert(lvls.max == PiiLevel.High && lvls.min == PiiLevel.None)
  }

  test("matchRatio stays within [0,1] whenever matches <= denominator") {
    val statsGen = for {
      total <- Gen.chooseNum(0L, 1000L)
      nn    <- Gen.chooseNum(0L, total)
      m     <- Gen.chooseNum(0L, nn)
    } yield ColumnStats("c", total, nn, nn, Map("email_1" -> m))
    forAll(statsGen) { s =>
      val r = s.matchRatio("email_1")
      assert(r >= 0.0 && r <= 1.0)
      assert(s.nullRatio >= 0.0 && s.nullRatio <= 1.0)
      assert(s.uniqueRatio >= 0.0 && s.uniqueRatio <= 1.0)
    }
  }

  test("detectDataType: a dominant email ratio always classifies Email") {
    val statsGen = for {
      nn    <- Gen.chooseNum(11L, 1000L)
      ratio <- Gen.chooseNum(80L, 100L)
      noise <- Gen.chooseNum(0L, 100L)
    } yield ColumnStats(
      "anything", nn, nn, nn,
      Map(
        "email_1" -> (nn * ratio / 100),
        "email_2" -> (nn * ratio / 100),
        "num_int" -> (nn * noise / 100) // lower-priority bank can't preempt
      )
    )
    forAll(statsGen) { s =>
      if (s.matchRatio("email_1") >= PatternRules.MatchThreshold)
        assert(PatternRules.detectDataType(s) == SemanticType.Email)
    }
  }

  test("native PatternBankMatcher bitmask == java.util.regex per pattern (fuzz)") {
    val bank = new PatternBankMatcher(PatternRules.measuredPatterns.map(_.regex).toArray)
    val compiled = PatternRules.measuredPatterns.map(p => java.util.regex.Pattern.compile(p.regex))
    forAll(asciiString) { str =>
      val mask = bank.mask(org.apache.spark.unsafe.types.UTF8String.fromString(str))
      for ((p, k) <- compiled.zipWithIndex) {
        val expected = p.matcher(str).find()
        assert(((mask >> k) & 1L) == (if (expected) 1L else 0L), s"pattern $k on '$str'")
      }
    }
  }

  test("TextHashKernel fuzz: bit-identity against the hex-string/BigInt formulation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val kernel = new graft.dedup.TextHashKernel(
      graft.dedup.DedupOps.hashCoeffs.map(_._1).toArray,
      graft.dedup.DedupOps.hashCoeffs.map(_._2).toArray,
      graft.dedup.DedupOps.HashPrime,
      graft.dedup.DedupOps.ShingleSize
    )
    // independent ground truth: the HEX-STRING md5 path (what the oracle SQL
    // does) with BigInt affine arithmetic (catches long overflow in the
    // kernel) and DIV-based bit extraction (the interpreted formulation)
    def hash32hex(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    def expSimhash(toks: Seq[String]): Long = {
      val counts = new Array[Int](32)
      for (t <- toks; x = hash32hex(t); j <- 0 until 32)
        counts(j) += (if ((x / (1L << j)) % 2 == 1) 1 else -1)
      (0 until 32).map(j => if (counts(j) > 0) 1L << j else 0L).sum
    }
    def expMinhash(toks: Seq[String]): Seq[Long] =
      graft.dedup.DedupOps.hashCoeffs.map { case (a, b) =>
        toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).map { sh =>
          ((BigInt(a) * hash32hex(sh) + b) mod BigInt(graft.dedup.DedupOps.HashPrime)).toLong
        }.foldLeft(Long.MaxValue)(math.min)
      }
    // unicode-heavy tokens exercise the UTF-8 byte path
    val tokenGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar, 1 -> Gen.oneOf('é', 'ß', '中', '✓', '-', '.'))))
    val toksGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tokenGen))
    forAll(toksGen, n = 150) { toks =>
      val arr = new GenericArrayData(toks.map(t => UTF8String.fromString(t)).toArray[Any])
      assert(kernel.simhash(arr) == expSimhash(toks), s"simhash on $toks")
      val gotShingles = kernel.shingles(arr)
      val expShingles = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      assert(
        (0 until gotShingles.numElements()).map(i => gotShingles.getUTF8String(i).toString) == expShingles,
        s"shingles on $toks"
      )
      if (toks.size >= 3) {
        val got = kernel.minhashSig(arr)
        assert((0 until got.numElements()).map(got.getLong) == expMinhash(toks), s"minhash on $toks")
      }
    }
  }

  test("fuzz: email-shaped and numeric-shaped strings hit their banks") {
    val emailGen = for {
      u <- Gen.stringOfN(5, Gen.alphaLowerChar)
      d <- Gen.stringOfN(5, Gen.alphaLowerChar)
      t <- Gen.oneOf("com", "org", "io")
    } yield s"$u@$d.$t"
    val bank = new PatternBankMatcher(PatternRules.measuredPatterns.map(_.regex).toArray)
    val emailIdx = PatternRules.measuredPatterns.indexWhere(_.key == "email_1")
    val intIdx   = PatternRules.measuredPatterns.indexWhere(_.key == "num_int")
    forAll(emailGen) { e =>
      val m = bank.mask(org.apache.spark.unsafe.types.UTF8String.fromString(e))
      assert(((m >> emailIdx) & 1L) == 1L)
      assert(((m >> intIdx) & 1L) == 0L)
    }
  }

  test("PageRank split identity: (r div ow)*w + ((r mod ow)*w) div ow == floor(r*w/ow) (fuzz)") {
    // the long-safe routed-mass form both PageRank variants compute must
    // equal the single-division form the DuckDB oracles compute — for every
    // (rank, weight, out-weight) in the declared operating range
    // (rank ≤ 10^12 total mass, out_w ≥ w ≥ 1, out-weights ≤ ~10^5)
    val gen = for {
      r  <- Gen.chooseNum(0L, 1000000000000L)
      ow <- Gen.chooseNum(1L, 100000L)
      w  <- Gen.chooseNum(1L, ow) // an edge's weight never exceeds its source's out-weight
    } yield (r, ow, w)
    forAll(gen, n = 2000) { case (r, ow, w) =>
      val split  = (r / ow) * w + ((r % ow) * w) / ow
      val direct = (BigInt(r) * BigInt(w) / BigInt(ow)).toLong // may exceed Long in the naive form
      assert(split == direct, s"r=$r ow=$ow w=$w")
    }
  }
}
