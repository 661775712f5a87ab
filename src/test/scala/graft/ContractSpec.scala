package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every declared query must carry an oracle
  * (a query silently missing its SQL would downgrade to a rows-only check —
  * this pins the all-oracled invariant), names must be well-formed, and the
  * flagship entry must produce rows.
  */
class ContractSpec extends AnyFunSuite {

  test("every declared query has an oracle and vice versa") {
    // the trained-IVF oracles inline centroid literals cached by a query run
    // (Verify's flow); train on the smallest SF so the invariant covers them,
    // and key the lookup by that dir exactly as Verify does (other suites may
    // have trained other dirs in this JVM — ADVICE r4)
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries("ivf_assign_embeddings")(SparkTestBase.spark, dir)
    // the trained-PQ oracles are gated on the codebook cache the same way
    SparkEntry.queries("pq_codes_embeddings")(SparkTestBase.spark, dir)
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSqlFor(Some(dir)).keySet
    assert(q == o, s"query/oracle drift: only-query=${q -- o}, only-oracle=${o -- q}")
    assert(q.nonEmpty)
  }

  test("query names are snake_case and unique per operator family") {
    for (name <- SparkEntry.queries.keySet)
      assert(name.matches("[a-z0-9_]+"), s"bad query name: $name")
  }

  test("oracle SQL references only catalog tables or its own CTEs") {
    val tables = Tables.columns.keySet
    for ((name, sql) <- SparkEntry.oracleSql) {
      // lint the SQL structure, not its data: a quoted literal may contain
      // SQL-looking text (the DDL oracle emits 'FROM sat_customer' as part
      // of a generated CREATE VIEW string)
      val code = sql.replaceAll("'(?:[^']|'')*'", "''")
      // digit-aware identifier capture: `s2` must parse as "s2", not "s" —
      // otherwise numbered CTE references escape the check entirely. The
      // lookbehind keeps a select list ending in `..._from` from matching
      // its own suffix and capturing the next keyword as a relation.
      // (?<!DISTINCT ): `x IS DISTINCT FROM y` is a comparison operator, not
      // a relation reference — without the lookbehind the lint reads `y` as
      // a table name
      val froms =
        "(?i)(?<![a-z0-9_])(?<!DISTINCT )FROM\\s+([a-z_][a-z0-9_]*)".r.findAllMatchIn(code).map(_.group(1)).toSet
      // names the SQL itself introduces: CTEs (`x AS (` / `x(cols) AS (`)
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([a-z0-9_,\\s]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(code).map(_.group(1)).toSet
      val unknown = froms -- tables -- ctes
      assert(unknown.isEmpty, s"$name references unknown relations: $unknown")
    }
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(SparkTestBase.spark).count() > 0)
  }
}
