package graft

import org.scalatest.funsuite.AnyFunSuite

/** Totality sweep over the WHOLE declared surface on an EMPTY corpus — all
  * 10 catalog tables present with the live schemas, zero rows. The contract:
  * an empty slice (a day with no data, a filtered-out stratum, a fresh
  * environment) must never crash an operator with an undocumented
  * NPE/SparkException; every declared query either
  *
  *   - returns a frame (usually empty — the pipeline no-op), or
  *   - refuses with a NAMED precondition (`require` →
  *     IllegalArgument/IllegalStateException with a message) — only the
  *     training/graph operators whose output semantics genuinely need data
  *     (k-means centroids, PQ codebooks, PageRank's non-empty graph) may.
  *
  * The r11 sweep that introduced this spec found 8 undocumented crashes
  * (bloomFilter's null-buffer sketch, ANSI divide-by-zero in three ratio
  * queries, schema inference on a zero-file partitioned write, head() on
  * empty PQ training input); each fix is pinned here by the allowlist NOT
  * containing those queries.
  */
class EmptyCorpusSpec extends AnyFunSuite {

  /** Queries allowed to refuse on an empty corpus, with the reason they may:
    * their declared output embeds data-derived constants (trained centroids /
    * codebooks) or a non-empty structural precondition (PageRank's graph).
    */
  private val mayRefuse: Set[String] = Set(
    // k-means training: no vectors → no centroids to declare
    "ivf_centroids_embeddings", "ivf_assign_embeddings", "ivf_topk_embeddings",
    "ivf_recall_embeddings", "ivfpq_topk_embeddings", "outliers_embeddings",
    "semantic_dups_embeddings", "semantic_clusters_embeddings", "semantic_survivors_embeddings",
    // PQ codebook training: same contract as k-means
    "pq_codebooks_embeddings", "pq_codes_embeddings", "pq_topk_embeddings",
    // PageRank: ranks over an empty node set are undefined by construction
    "pagerank_events", "pagerank_users"
  )

  private def rootChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  private def sweep(dir: String): Seq[String] = {
    val spark = SparkTestBase.spark
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try {
        q(spark, dir).collect()
        None
      } catch {
        case e: Throwable =>
          val chain = rootChain(e)
          val named = chain.collectFirst {
            case x: IllegalArgumentException => x
            case x: IllegalStateException    => x
          }
          named match {
            case Some(x) if mayRefuse(name) && x.getMessage != null && x.getMessage.nonEmpty =>
              None // documented refusal
            case Some(x) =>
              Some(s"$name refused but is not allowlisted: ${x.getMessage}")
            case None =>
              val root = chain.last
              Some(s"$name crashed: ${root.getClass.getName}: ${String.valueOf(root.getMessage).take(160)}")
          }
      }
    }
  }

  test("every declared query is total on an empty corpus (or refuses by name)") {
    val spark = SparkTestBase.spark
    val dir   = java.nio.file.Files.createTempDirectory("graft-empty-corpus").toString
    for (t <- Tables.columns.keys)
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val failures = sweep(dir)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every declared query is total on a one-row corpus (or refuses by name)") {
    // one row per table: zero-variance / single-point inputs — the corr /
    // quantile / trend denominators' other degenerate pole
    val spark = SparkTestBase.spark
    val dir   = java.nio.file.Files.createTempDirectory("graft-onerow-corpus").toString
    for (t <- Tables.columns.keys)
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").limit(1)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    val failures = sweep(dir)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every declared query is total on a hostile-content corpus (or refuses by name)") {
    // the crash features the r11 adversarial cross-engine sweep found
    // (tools/adversarial_corpus.py is the full python twin with the DuckDB
    // compare): zero-norm and 1e30-component vectors (cosine 0/0, BIGINT
    // cast overflow), malformed JSON props, NULL event_type (driver-side
    // node sort), zero order totals (ratio divide), empty/İ/NULL text
    import org.apache.spark.sql.functions.{col, lit}
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hostile-corpus").toString
    for (t <- Tables.columns.keys)
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").limit(20)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")

    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and is of sound mind", "en", "src0", 65L),
      (1L, "İstanbul STRASSE groß İ ı i dotless", "und", "src1", 35L),
      (2L, "", "en", "src0", 0L),
      (3L, "dot . star * plus + bracket [ ] pipe | dollar $", "en", "src2", 47L),
      (4L, null, null, null, 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val dim = 64
    val zero  = Array.fill(dim)(0.0f)
    val huge  = Array.fill(dim)(1.0e30f)
    val unit  = Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)
    val embRows = Seq(
      (0L, unit.toSeq, 0), (1L, huge.toSeq, 1), (2L, zero.toSeq, 2),
      (3L, Array.tabulate(dim)(i => (i % 7 - 3).toFloat / 3f).toSeq, 3)
    ).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label").cast("int"))
    embRows.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val us0 = 1704067200000000L
    val events = Seq(
      (0L, Some(us0), 1L, "signup", 1.0, """{"k": 1}"""),
      (1L, Some(us0 + 1), 1L, "view", 2.0, "{k: 1"),
      (2L, Some(us0 + 2), 1L, null, 3.0, """{"k": "str"}"""),
      (3L, Some(0L), 2L, "view", 0.0, null),
      // untimed event: the timed-event doctrine must drop it BEFORE any
      // watermark (a NULL event time crashes stateful streaming otherwise)
      (4L, None: Option[Long], 2L, "view", 1.0, """{"k": 2}""")
    ).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), org.apache.spark.sql.functions.expr("timestamp_micros(us)").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val zeroOrder = spark.read.parquet(s"/root/testdata/sf0.001/orders.parquet").limit(1)
      .withColumn("o_totalprice", lit(0.0))
    spark.read.parquet(s"/root/testdata/sf0.001/orders.parquet").limit(20)
      .unionByName(zeroOrder)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val failures = sweep(dir)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every declared query is total on a null-filled corpus (or refuses by name)") {
    // keys present, every non-key column NULL: the hostile-ingest shape a
    // 100 TB feed WILL eventually produce. Operators may emit NULL-bearing
    // or empty results here — they may not throw undocumented errors.
    import org.apache.spark.sql.functions.{col, lit}
    val spark = SparkTestBase.spark
    val dir   = java.nio.file.Files.createTempDirectory("graft-null-corpus").toString
    for ((t, cols) <- Tables.columns) {
      val src = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").limit(2)
      val key = cols.head
      src.select(src.schema.fields.toIndexedSeq.map { f =>
        if (f.name == key) col(f.name) else lit(null).cast(f.dataType).as(f.name)
      }: _*).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = sweep(dir)
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
