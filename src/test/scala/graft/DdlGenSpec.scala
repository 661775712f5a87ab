package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ColumnProfile, PiiLevel, SemanticType}
import graft.vault.DdlGen

/** DDL generation semantics — the branches the no-null testdata corpus can't
  * reach (nullable columns, high-PII doubles) plus the determinism contract.
  * Cross-engine agreement of the full profiles→DDL integration is covered by
  * the DuckDB oracle gate (`dv_ddl_customer`).
  */
class DdlGenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def profile(
      name: String,
      nullCount: Long = 0L,
      pii: PiiLevel = PiiLevel.None
  ): ColumnProfile =
    ColumnProfile(name, name, SemanticType.Text, nullCount = nullCount, piiLevel = pii)

  private def fixture = {
    import spark.implicits._
    Seq((1L, "a", Option(2.5), true)).toDF("id", "name", "bal", "flag")
  }

  test("columnDef: NOT NULL iff the measured null_count is zero; nullable when unprofiled") {
    val df = fixture
    val ps = Map("id" -> profile("id"), "bal" -> profile("bal", nullCount = 3L))
    assert(DdlGen.columnDef(df, ps, "id") == "id BIGINT NOT NULL")
    assert(DdlGen.columnDef(df, ps, "bal") == "bal DOUBLE") // measured nulls
    assert(DdlGen.columnDef(df, ps, "name") == "name VARCHAR") // no profile → safe default
  }

  test("sqlTypeName: portable ANSI names; non-scalar types declare as VARCHAR") {
    import org.apache.spark.sql.types._
    assert(DdlGen.sqlTypeName(LongType) == "BIGINT")
    assert(DdlGen.sqlTypeName(DecimalType(18, 2)) == "DECIMAL(18,2)")
    assert(DdlGen.sqlTypeName(ArrayType(FloatType)) == "VARCHAR")
    assert(DdlGen.sqlTypeName(BooleanType) == "BOOLEAN")
  }

  test("maskedCell: PII at/above the threshold masks; doubles canonicalize through DECIMAL(18,2)") {
    val df = fixture
    val ps = Map(
      "name" -> profile("name", pii = PiiLevel.Medium),
      "bal"  -> profile("bal", pii = PiiLevel.High),
      "flag" -> profile("flag", pii = PiiLevel.Low)
    )
    assert(DdlGen.maskedCell(df, ps, "name", PiiLevel.Medium)
      == "md5(CAST(name AS VARCHAR)) AS name")
    assert(DdlGen.maskedCell(df, ps, "bal", PiiLevel.Medium)
      == "md5(CAST(CAST(bal AS DECIMAL(18,2)) AS VARCHAR)) AS bal")
    assert(DdlGen.maskedCell(df, ps, "flag", PiiLevel.Medium) == "flag") // below threshold
  }

  test("vaultDdl: four objects, deterministic text, DV metadata columns in place") {
    val df = fixture
    val ps = Seq(profile("id"), profile("name", pii = PiiLevel.Medium), profile("bal", nullCount = 1L))
    val out = DdlGen.vaultDdl(
      spark, df, ps, "e", Seq("id"), Seq("name", "bal"),
      linkDf = df, linkProfiles = ps, linkName = "e_x", linkMembers = Seq("e" -> "id", "x" -> "name"))
    val rows = out.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows.keySet == Set("hub_e", "link_e_x", "sat_e", "sat_e_masked"))
    assert(rows("hub_e")._2 ==
      "CREATE TABLE hub_e (hub_e_hk CHAR(64) NOT NULL, id BIGINT NOT NULL, " +
        "load_ts TIMESTAMP NOT NULL, record_source VARCHAR NOT NULL, PRIMARY KEY (hub_e_hk))")
    assert(rows("sat_e")._2 ==
      "CREATE TABLE sat_e (hub_e_hk CHAR(64) NOT NULL, hashdiff CHAR(64) NOT NULL, " +
        "name VARCHAR NOT NULL, bal DOUBLE, " + // bal nullable: measured nulls
        "load_ts TIMESTAMP NOT NULL, record_source VARCHAR NOT NULL, " +
        "PRIMARY KEY (hub_e_hk, load_ts))")
    assert(rows("sat_e_masked")._1 == "view")
    assert(rows("sat_e_masked")._2 ==
      "CREATE VIEW sat_e_masked AS SELECT hub_e_hk, hashdiff, " +
        "md5(CAST(name AS VARCHAR)) AS name, bal FROM sat_e")
    assert(rows("link_e_x")._2.startsWith(
      "CREATE TABLE link_e_x (link_e_x_hk CHAR(64) NOT NULL, " +
        "hub_e_hk CHAR(64) NOT NULL, hub_x_hk CHAR(64) NOT NULL, "))
    // regeneration is bit-identical (no randomness, no timestamps)
    val again = DdlGen.vaultDdl(
      spark, df, ps, "e", Seq("id"), Seq("name", "bal"),
      linkDf = df, linkProfiles = ps, linkName = "e_x", linkMembers = Seq("e" -> "id", "x" -> "name"))
    assert(again.collect().toSeq == out.collect().toSeq)
  }

  test("oracleVaultDdl: data-dependent terms stay in SQL (profile subqueries, not baked)") {
    val sql = DdlGen.oracleVaultDdl(
      "customer",
      Map("c_custkey" -> "BIGINT", "c_name" -> "VARCHAR"),
      "customer", Seq("c_custkey"), Seq("c_name"),
      "orders", Map("o_orderkey" -> "BIGINT"),
      "oc", Seq("order" -> "o_orderkey"))
    assert(sql.contains("SELECT null_count FROM"))  // NOT NULL is recomputed
    assert(sql.contains("SELECT pii_level FROM"))   // mask decision is recomputed
    assert(sql.contains("ORDER BY object_name"))
  }
}
