package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions injection point: a session configured with
  * `spark.sql.extensions=graft.GraftExtensions` can reach every native
  * kernel from SQL, with results bit-identical to the DataFrame-API
  * operators.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** A second session on the SHARED SparkContext, created with the
    * extensions installed via `withExtensions` (the `spark.sql.extensions`
    * config string is a STATIC conf — it only takes effect when the
    * SparkContext itself is created, so a test reusing the shared context
    * must inject through the builder; the injection object is the same
    * either way). getOrCreate would return the plain shared session, so
    * active/default are cleared around creation and restored after.
    */
  private lazy val extSpark: SparkSession = {
    val plain = SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession
      .builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    SparkSession.setDefaultSession(plain)
    SparkSession.setActiveSession(plain)
    s
  }

  test("SQL graft_dot matches the DataFrame DotProduct") {
    val r = extSpark
      .sql("SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .first()
      .getDouble(0)
    assert(r == 32.0)
  }

  test("SQL graft_simhash32 / graft_minhash_sig / graft_shingles match the operators") {
    import extSpark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta eps"),
      (2L, "zeta eta theta iota kappa lambda")
    ).map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("g_docs")

    val sqlSim = extSpark.sql(
      """SELECT doc_id,
        |  graft_simhash32(filter(split(lower(text), ' '), t -> t != '')) AS simhash
        |FROM g_docs ORDER BY doc_id""".stripMargin
    ).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val opSim = graft.dedup.DedupOps.simhash(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlSim == opSim)

    val sqlSig = extSpark.sql(
      "SELECT doc_id, graft_minhash_sig(split(lower(text), ' ')) AS sig FROM g_docs ORDER BY doc_id"
    ).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val opSig = graft.dedup.DedupOps.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long])).toMap
    assert(sqlSig.view.mapValues(_.toSeq).toMap == opSig)

    val shingles = extSpark.sql(
      "SELECT graft_shingles(split(lower(text), ' ')) AS sh FROM g_docs WHERE doc_id = 1"
    ).first().getSeq[String](0)
    assert(shingles == Seq("alpha beta gamma", "beta gamma delta", "gamma delta eps"))
  }

  test("wrong-typed SQL arguments fail analysis, not executors") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      extSpark.sql("SELECT graft_simhash32('not an array')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
    intercept[org.apache.spark.sql.AnalysisException] {
      extSpark.sql("SELECT graft_dot(array(1.0d), 'nope')").collect()
    }
  }

  test("SQL graft_pattern_mask evaluates a literal bank as a bitmask") {
    val m = extSpark
      .sql("""SELECT graft_pattern_mask('user@host.com', '^[^@]+@[^@]+\\.[a-z]+$', '^\\d+$') AS m""")
      .first()
      .getLong(0)
    assert(m == 1L) // bit 0 (email) set, bit 1 (numeric) clear
  }
}
