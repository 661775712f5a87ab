package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ProfilerEngine
import graft.model._

/** End-to-end profiling tests over real DataFrames: ports of the reference's
  * fixture suite (FIXTURES.md §A, `tests/conftest.py` /
  * `tests/unit/test_classifiers.py`) plus spot checks on the driver-generated
  * parquet testdata (FIXTURES.md §B).
  */
class ProfilerEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val engine = new ProfilerEngine()

  /** A1 `sample_customer_data` (conftest.py:12-27), with the status column
    * widened to 10 rows / 3 distinct so the reference's own unique_ratio
    * assertion holds (FIXTURES.md §A1 note).
    */
  private lazy val customerFixture = {
    val rows = Seq(
      (1001, "john@example.com", "+1-555-0123", "John", "Doe", 25, true, "2023-01-15", "active", 3, 150.50),
      (1002, "jane.smith@test.org", "555.987.6543", "Jane", "Smith", 34, false, "2023-02-20", "inactive", 0, 0.0),
      (1003, "bob+work@company.co.uk", "(555) 123-4567", "Bob", "Jones", 45, true, "2023-03-10", "pending", 12, 2500.75),
      (1004, "alice@domain.net", "5551234567", "Alice", "Brown", 29, false, "2023-04-05", "active", 5, 320.25),
      (1005, "charlie@email.com", "555-111-2222", "Charlie", "Wilson", 55, true, "2023-05-12", "active", 8, 1875.00),
      (1006, "dan@example.com", "555-222-3333", "Dan", "Lee", 31, true, "2023-06-01", "inactive", 2, 10.00),
      (1007, "eve@example.com", "555-333-4444", "Eve", "Kim", 28, false, "2023-06-02", "active", 1, 20.00),
      (1008, "frank@example.com", "555-444-5555", "Frank", "Cho", 40, true, "2023-06-03", "pending", 4, 30.00),
      (1009, "grace@example.com", "555-555-6666", "Grace", "Liu", 38, false, "2023-06-04", "active", 6, 40.00),
      (1010, "heidi@example.com", "555-666-7777", "Heidi", "Park", 27, true, "2023-06-05", "active", 7, 50.00)
    )
    rows.toDF(
      "customer_id", "email", "phone", "first_name", "last_name", "age",
      "is_premium", "signup_date", "status", "total_orders", "account_balance"
    )
  }

  private def profileMap(df: org.apache.spark.sql.DataFrame): Map[String, ColumnProfile] =
    engine.analyzeDataFrame(df).columnProfiles.map(p => p.originalName -> p).toMap

  test("A1 clean fixture classifies per the reference test intent") {
    val p = profileMap(customerFixture)
    assert(p("customer_id").dataType == SemanticType.Identifier)
    assert(p("customer_id").isPrimaryKey)
    assert(p("customer_id").uniqueRatio == 1.0)
    assert(p("email").dataType == SemanticType.Email)
    assert(p("email").piiLevel == PiiLevel.High)
    assert(p("phone").dataType == SemanticType.Phone)
    assert(p("phone").piiLevel == PiiLevel.High)
    assert(p("first_name").dataType == SemanticType.Text)
    assert(p("first_name").piiLevel == PiiLevel.Medium) // "name" keyword
    assert(p("age").dataType == SemanticType.Numeric)
    assert(p("is_premium").dataType == SemanticType.Boolean)
    assert(p("signup_date").dataType == SemanticType.Date)
    assert(p("status").dataType == SemanticType.Text)
    assert(p("status").isBusinessKey) // name keyword "status"
    assert(p("status").uniqueRatio < 0.5)
    assert(p("total_orders").dataType == SemanticType.Numeric)
    assert(p("account_balance").dataType == SemanticType.Numeric)
  }

  test("A2 messy fixture: sub-threshold ratios fall through (conftest.py:30-49)") {
    // Faithful port of conftest.py:30-49 (pandas astype(str) renderings).
    val df = Seq(
      ("ABC123", "USER@DOMAIN.COM", "555-1234", "2023-12-01", "100", "true", "This is a description", "A1", "550e8400-e29b-41d4-a716-446655440000"),
      ("DEF456", "test@site.org", "(555) 987-6543", "12/25/2023", "", "FALSE", "Another text field", "B2", "6ba7b810-9dad-11d1-80b4-00c04fd430c8"),
      ("GHI789", "", "not-a-phone", "Jan 15, 2024", "250.5", "1", "", "A1", "6ba7b811-9dad-11d1-80b4-00c04fd430c8"),
      ("JKL012", "bad.email", "555.123.4567", "2024/03/10", "500", "0", "Mixed content 123", "C3", "550e8401-e29b-41d4-a716-446655440001"),
      ("MNO345", "valid@test.com", "", "", null, "yes", "Final entry", "B2", "6ba7b812-9dad-11d1-80b4-00c04fd430c9")
    ).toDF(
      "ID_FIELD", "mixed_case_Email", "Phone_Numbers", "dates_various_formats",
      "numeric_with_nulls", "boolean_mixed", "free_text", "category_codes", "uuid_field"
    )
    val p = profileMap(df)
    assert(p("ID_FIELD").dataType == SemanticType.Identifier) // "id" name + unique 1.0
    assert(p("ID_FIELD").suggestedName == "id_field")
    assert(p("mixed_case_Email").dataType != SemanticType.Email) // 3/5 < 0.8
    assert(p("Phone_Numbers").dataType != SemanticType.Phone)
    assert(p("dates_various_formats").dataType == SemanticType.Text)
    assert(p("boolean_mixed").dataType == SemanticType.Text)
    assert(p("free_text").dataType == SemanticType.Text)
    assert(p("uuid_field").dataType == SemanticType.Identifier)
    assert(p("uuid_field").isPrimaryKey)
  }

  test("A3 edge: empty DataFrame → no profiles, no crash") {
    val df = spark.emptyDataFrame
    val res = engine.analyzeDataFrame(df)
    assert(res.columnProfiles.isEmpty)
    assert(res.summary.isEmpty)
  }

  test("A3 edge: zero-row DataFrame with columns → all-TEXT profiles") {
    val df = Seq.empty[(String, Int)].toDF("a_col", "b_col")
    val res = engine.analyzeDataFrame(df)
    assert(res.columnProfiles.size == 2)
    assert(res.columnProfiles.forall(_.dataType == SemanticType.Text))
    assert(res.columnProfiles.forall(_.totalRows == 0L))
  }

  test("nulls: null_ratio/unique_ratio/match denominators are null-aware") {
    val df = Seq(
      Some("john@x.com"), None, Some("jane@y.org"), Some("bob@z.net"), None
    ).toDF("contact_email")
    val p = profileMap(df)("contact_email")
    assert(p.nullCount == 2L)
    assert(p.nullRatio == 0.4)
    assert(p.uniqueCount == 3L)
    // 3/3 non-null values match → EMAIL despite 40% nulls
    assert(p.dataType == SemanticType.Email)
  }

  test("B spot checks on sf0.001 parquet (FIXTURES.md §B)") {
    val dir = "/root/testdata/sf0.001"
    val cust = profileMap(Tables.load(spark, dir, "customer"))
    assert(cust("c_custkey").dataType == SemanticType.Identifier)
    assert(cust("c_custkey").isPrimaryKey)
    assert(cust("c_mktsegment").dataType == SemanticType.BusinessKey)
    assert(cust("c_name").piiLevel == PiiLevel.Medium)

    val region = profileMap(Tables.load(spark, dir, "region"))
    assert(region("r_regionkey").dataType == SemanticType.Identifier)
    assert(region("r_regionkey").isPrimaryKey)

    val nation = profileMap(Tables.load(spark, dir, "nation"))
    assert(!nation("n_regionkey").isPrimaryKey) // id-named but 5/25 unique

    val li = profileMap(Tables.load(spark, dir, "lineitem"))
    assert(!li("l_orderkey").isPrimaryKey)
    assert(li("l_quantity").dataType == SemanticType.Numeric)
    assert(li("l_returnflag").isBusinessKey === false) // no keyword; type not text? flag via low-card code shape
    assert(li("l_linestatus").dataType == SemanticType.BusinessKey) // low-cardinality fallback

    val emb = profileMap(Tables.load(spark, dir, "embeddings"))
    assert(emb.contains("embedding")) // array column must not crash the pass
  }

  test("summary aggregates per data type (base.py:82-106)") {
    val res = engine.analyzeDataFrame(customerFixture)
    val s = res.summary.get
    assert(s.totalColumns == 11)
    assert(s.dataTypeBreakdown.values.sum == 11L)
    assert(math.abs(s.avgConfidence - 0.8) < 1e-9)
    assert(s.piiLevelBreakdown.getOrElse("high", 0L) >= 2L) // email + phone
  }

  test("Tables catalog matches live parquet schemas (oracle-drift guard)") {
    val dir = "/root/testdata/sf0.001"
    Tables.columns.foreach { case (t, cols) =>
      val actual = Tables.load(spark, dir, t).columns.toSeq
      assert(actual == cols, s"table $t drifted")
    }
  }
}
