package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.pattern.PatternRules
import graft.pattern.PatternRules._

/** Pure-function tests of the decision cascade, ported from the reference's
  * pattern-engine unit tests (`tests/unit/test_classifiers.py:27-122`), using
  * synthetic ColumnStats (value-level regex behavior is covered separately in
  * RegexDialectSpec / ProfilerEngineSpec against real DataFrames).
  */
class PatternRulesSpec extends AnyFunSuite {

  private def stats(
      name: String,
      total: Long,
      nonNull: Long,
      unique: Long,
      matches: Map[String, Long] = Map.empty
  ): ColumnStats =
    ColumnStats(name, total, nonNull, unique, matches.withDefaultValue(0L))

  private def fullMatch(name: String, n: Long, unique: Long, keys: String*) : ColumnStats =
    stats(name, n, n, unique, keys.map(_ -> n).toMap)

  test("email detection (test_classifiers.py:27-33)") {
    val s = fullMatch("email", 5, 5, "email_1", "email_2")
    assert(detectDataType(s) == SemanticType.Email)
    assert(detectPiiLevel("email", SemanticType.Email) == PiiLevel.High)
  }

  test("phone detection → PII HIGH (test_classifiers.py:35-42)") {
    val s = fullMatch("phone", 5, 5, "phone_3")
    assert(detectDataType(s) == SemanticType.Phone)
    assert(detectPiiLevel("phone", SemanticType.Phone) == PiiLevel.High)
  }

  test("identifier pre-empts bare-integer NUMERIC for id-named unique columns (§0.2(3) fix)") {
    // customer_id = [1001..1005]: matches num_int 100%, but name+uniqueness win.
    val s = fullMatch("customer_id", 5, 5, "num_int", "ident_numeric")
    assert(detectDataType(s) == SemanticType.Identifier)
    assert(isPrimaryKey(s, SemanticType.Identifier))
  }

  test("email bank still wins over identifier name heuristic") {
    val s = fullMatch("email_id", 5, 5, "email_1", "email_2")
    assert(detectDataType(s) == SemanticType.Email)
  }

  test("boolean detection (test_classifiers.py:52-58)") {
    val s = fullMatch("is_premium", 6, 2, "bool_tf")
    assert(detectDataType(s) == SemanticType.Boolean)
  }

  test("'1'/'0' columns classify NUMERIC before BOOLEAN (bank precedence)") {
    val s = fullMatch("flag", 6, 2, "bool_10", "num_int")
    assert(detectDataType(s) == SemanticType.Numeric)
  }

  test("10-15 digit integers classify PHONE before NUMERIC (bank precedence)") {
    val s = fullMatch("big", 5, 5, "phone_1", "num_int", "ident_numeric")
    assert(detectDataType(s) == SemanticType.Phone)
  }

  test("date detection (test_classifiers.py:60-66)") {
    val s = fullMatch("signup_date", 5, 5, "date_iso")
    assert(detectDataType(s) == SemanticType.Date)
  }

  test("business key by name keyword (test_classifiers.py:68-79)") {
    val s = stats("status", 10, 10, 3)
    val dt = detectDataType(s)
    assert(isBusinessKey(s, dt))
  }

  test("business key flag by low-cardinality code shape") {
    // 20 rows of A1/B2-style codes, 3 distinct, 100% code-pattern match:
    // type stays TEXT (0.15 unique_ratio not < 0.1), but the flag fires.
    val s = stats("col", 20, 20, 3, Map("biz_code" -> 20L))
    val dt = detectDataType(s)
    assert(dt == SemanticType.Text)
    assert(isBusinessKey(s, dt))
  }

  test("low-cardinality fallback → BUSINESS_KEY (pattern_classifier.py:163-164)") {
    val s = stats("c_mktsegment", 150, 150, 5)
    assert(detectDataType(s) == SemanticType.BusinessKey)
  }

  test("fallback TEXT for plain strings") {
    val s = stats("free_text", 5, 5, 5)
    assert(detectDataType(s) == SemanticType.Text)
  }

  test("empty column → TEXT (pattern_classifier.py:141-142)") {
    val s = stats("anything", 5, 0, 0)
    assert(detectDataType(s) == SemanticType.Text)
  }

  test("primary key detection (pattern_classifier.py:179-191)") {
    assert(isPrimaryKey(stats("customer_id", 100, 100, 100), SemanticType.Identifier))
    assert(isPrimaryKey(stats("order_key", 100, 100, 99), SemanticType.Numeric)) // 0.99 + key name
    assert(!isPrimaryKey(stats("l_orderkey", 100, 100, 25), SemanticType.Numeric))
    assert(isPrimaryKey(stats("uuid_field", 100, 100, 100), SemanticType.Identifier)) // 1.0 + id type
    assert(!isPrimaryKey(stats("plain", 100, 100, 100), SemanticType.Text))
  }

  test("PII keyword cascade (pattern_classifier.py:211-234)") {
    assert(detectPiiLevel("ssn_number", SemanticType.Text) == PiiLevel.High)
    assert(detectPiiLevel("first_name", SemanticType.Text) == PiiLevel.Medium) // "name" beats "first"
    assert(detectPiiLevel("birth_date", SemanticType.Date) == PiiLevel.Medium)
    assert(detectPiiLevel("first_contact", SemanticType.Text) == PiiLevel.Low)
    assert(detectPiiLevel("zip_code", SemanticType.Text) == PiiLevel.Low)
    assert(detectPiiLevel("amount", SemanticType.Numeric) == PiiLevel.None)
  }

  test("suggested name normalization (test_classifiers.py:111-122)") {
    assert(suggestedName("Customer ID") == "customer_id")
    assert(suggestedName("EmailAddress") == "email_address")
    assert(suggestedName("  weird--name!! ") == "weird_name")
    assert(suggestedName("already_snake") == "already_snake")
  }

  test("business meaning templates (pattern_classifier.py:243-258)") {
    assert(
      businessMeaning("customer_id", SemanticType.Identifier) == "Unique identifier for customer id"
    )
    assert(
      businessMeaning("email-address", SemanticType.Email) == "Email address field for email address"
    )
    assert(businessMeaning("x", SemanticType.Address) == "Data field for x")
  }

  test("PII ordinal severity: NONE < LOW < MEDIUM < HIGH (§0.2(4) fix)") {
    assert(PiiLevel.None < PiiLevel.Low)
    assert(PiiLevel.Low < PiiLevel.Medium)
    assert(PiiLevel.Medium < PiiLevel.High)
    assert(Seq[PiiLevel](PiiLevel.High, PiiLevel.None).max == PiiLevel.High)
  }
}
