package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden full-profile regression (SURVEY §5.2 item 4): the complete
  * Q-PROFILE output of every testdata table at sf0.001, pinned as checked-in
  * JSONL. The DuckDB oracle proves cross-engine agreement; the goldens
  * additionally pin the ABSOLUTE classification over time — a cascade edit
  * that shifts both engines identically still shows up here as a reviewable
  * diff. Regenerate intentionally with `sbt "Test/runMain graft.GoldenGen"`.
  */
class GoldenProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def golden(table: String): Seq[String] = {
    val in = getClass.getResourceAsStream(s"/goldens/$table.jsonl")
    assert(in != null, s"missing golden for $table — run Test/runMain graft.GoldenGen")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
  }

  for (table <- GoldenGen.tables)
    test(s"profile of $table matches its golden") {
      assert(GoldenGen.goldenLines(spark, table) == golden(table))
    }
}
