package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pattern.PatternRules

/** Value-level behavior of the 19+1 ported pattern-bank regexes under
  * java.util.regex (the engine side of the Java∩RE2 common dialect —
  * the RE2 side is exercised by the DuckDB oracle harness on the same
  * literals). Each pattern gets canonical accept/reject fixtures drawn from
  * the reference's test data (`tests/conftest.py`, `pattern_classifier.py
  * docstrings`). Uses `find()` (rlike semantics); because every pattern is
  * `^...$`-anchored this equals full match — asserted explicitly below.
  */
class RegexDialectSpec extends AnyFunSuite {

  import java.util.regex.Pattern

  private val fixtures: Map[String, (Seq[String], Seq[String])] = Map(
    // key -> (matches, non-matches)
    "email_1" -> (Seq("john@example.com", "bob+work@company.co.uk", "a.b-c@x-y.z.w"),
                  Seq("not-an-email", "@nouser.com", "a@b", "a b@c.com")),
    "email_2" -> (Seq("jane.smith@test.org", "x_%y@domain.net"),
                  Seq("a@b", "a@b.c", "user@domain.")),
    "phone_1" -> (Seq("5551234567", "+15551234567", "123456789"),
                  Seq("12345678", "+2-555", "555-0123")),
    "phone_2" -> (Seq("(555) 123-4567", "555.987.6543", "555-111-2222", "5551234567"),
                  Seq("55-123-4567", "(555) 12-4567")),
    "phone_3" -> (Seq("+1-555-012-3456", "555 123 4567", "(555) 123.4567"),
                  Seq("555-0123", "abc-555-123-4567")),
    "date_iso" -> (Seq("2023-01-15", "1999-12-31"), Seq("2023-1-15", "15-01-2023", "2023/01/15")),
    "date_mdy" -> (Seq("01/15/2023", "01-15-2023"), Seq("1/15/2023", "2023-01-15")),
    "date_ymd_slash" -> (Seq("2023/01/15"), Seq("2023-01-15", "23/01/15")),
    "date_month_name" -> (Seq("January 15, 2023", "Mar 1, 1999"), Seq("15 January 2023", "January 15 2023")),
    "num_int" -> (Seq("42", "-7", "0"), Seq("4.2", "1,000", "abc", "+7")),
    "num_decimal" -> (Seq("3.14", "-0.5", ".5"), Seq("3.", "42", "1,000.5")),
    "num_comma" -> (Seq("1,000", "12,345,678.90", "-1,000", "999"), Seq("1000000.5.", "12,34", "1,0000")),
    "num_currency" -> (Seq("$19.99", "19.99", "$100", "100"), Seq("-$5", "$19.999", "19.9")),
    "bool_tf" -> (Seq("true", "FALSE", "True"), Seq("t", "f", "truthy")),
    "bool_yesno" -> (Seq("yes", "NO"), Seq("maybe", "y", "n")),
    "bool_yn" -> (Seq("y", "N"), Seq("yes", "no")),
    "bool_10" -> (Seq("1", "0"), Seq("2", "10", "01")),
    "bool_onoff" -> (Seq("on", "OFF"), Seq("o", "onn")),
    "biz_code" -> (Seq("AB", "ABCD", "A1", "B123"), Seq("A", "ABCDE", "ab", "A1234", "1A"))
  )

  test("every measured pattern has fixtures and every fixture behaves") {
    val patterns =
      (PatternRules.measuredPatterns :+ PatternRules.businessCodePattern)
        .map(p => p.key -> p.regex)
        .toMap
    assert(fixtures.keySet == patterns.keySet, "fixture coverage drift")

    for ((key, (yes, no)) <- fixtures) {
      val p = Pattern.compile(patterns(key))
      for (v <- yes)
        assert(p.matcher(v).find(), s"$key should match '$v'")
      for (v <- no)
        assert(!p.matcher(v).find(), s"$key should NOT match '$v'")
    }
  }

  test("anchoring makes find() equal full match for every pattern") {
    for (p <- PatternRules.measuredPatterns) {
      assert(p.regex.startsWith("^") || p.regex.startsWith("(?i)^"), s"${p.key} not left-anchored")
      assert(p.regex.endsWith("$"), s"${p.key} not right-anchored")
    }
  }

  test("identifier bank (unmeasured but shipped) compiles and behaves") {
    val byKey = PatternRules.identifierBank.patterns.map(p => p.key -> Pattern.compile(p.regex)).toMap
    assert(byKey("ident_uuid").matcher("123e4567-e89b-12d3-a456-426614174000").find())
    assert(byKey("ident_numeric").matcher("123456").find())
    assert(!byKey("ident_numeric").matcher("12345").find())
    assert(byKey("ident_alnum").matcher("ABCD1234").find())
    assert(!byKey("ident_alnum").matcher("abcd1234").find())
  }
}
