package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ProfilerEngine
import graft.governance.Masking
import graft.model.PiiLevel

/** Profile-driven masking semantics. Cross-engine agreement (including the
  * oracle's independent recomputation of the pii cascade in SQL) is covered
  * by the masked_customer gate query.
  */
class MaskingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "john@example.com", "John", "acct-1", 12.5),
    (2L, "jane@test.org", "Jane", "acct-2", 99.99),
    (3L, "bob@company.co.uk", "Bob", "acct-3", 0.0)
  ).toDF("id", "email", "first_name", "acct", "bal")

  private lazy val profiles = new ProfilerEngine().analyzeDataFrame(df).columnProfiles

  test("masks exactly the columns the cascade rates at/above the policy level") {
    val masked = Masking.maskedDF(df, profiles).collect()
    val first = masked.head
    // email → type email → HIGH: masked (64-hex token, not the address)
    assert(first.getAs[String]("email").matches("[0-9a-f]{32}"))
    // first_name → name keyword → LOW via "first"? no: "name" → MEDIUM: masked
    assert(first.getAs[String]("first_name").matches("[0-9a-f]{32}"))
    // id / acct / bal → none: served in the clear, canonical rendering
    assert(first.getAs[String]("id") == "1")
    assert(first.getAs[String]("bal") == "12.50") // DECIMAL(18,2) canon
  }

  test("masking is deterministic tokenization: equal plaintexts, equal tokens") {
    val d2 = Seq((1L, "x@y.com"), (2L, "x@y.com"), (3L, "z@w.org")).toDF("id", "email")
    val p2 = new ProfilerEngine().analyzeDataFrame(d2).columnProfiles
    val tokens = Masking.maskedDF(d2, p2).collect().map(_.getAs[String]("email"))
    assert(tokens(0) == tokens(1))
    assert(tokens(0) != tokens(2))
  }

  test("policy level is configurable: High-only policy leaves medium columns clear") {
    val masked = Masking.maskedDF(df, profiles, minLevel = PiiLevel.High).collect()
    assert(masked.head.getAs[String]("first_name") == "John") // medium → clear
    assert(masked.head.getAs[String]("email").matches("[0-9a-f]{32}")) // high → masked
  }
}
