package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources
import graft.multimodal.MediaOps

/** I1 CSV ingestion round-trip (reference `tests/conftest.py:64-73`),
  * streaming-vs-batch equivalence, and the multimodal featurize plumbing.
  */
class IoStreamingMediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("JDBC round-trip against embedded Derby, plain and partitioned reads") {
    val db  = java.nio.file.Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val df = (1L to 40L).map(i => (i, s"user$i@example.com", i * 2.5)).toDF("id", "email", "score")
    Sources.writeJdbc(df, url, "users")

    val plain = Sources.readJdbc(spark, url, "users")
    assert(plain.rdd.getNumPartitions == 1) // single connection — dimension-table mode
    assert(plain.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)

    // partitioned read spreads the scan over concurrent BETWEEN slices
    val part = Sources.readJdbc(spark, url, "users",
      partitioning = Some(Sources.JdbcPartitioning("id", 1L, 40L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)

    // append mode accumulates; overwrite replaces
    Sources.writeJdbc(df, url, "users", mode = org.apache.spark.sql.SaveMode.Append)
    assert(Sources.readJdbc(spark, url, "users").count() == 80)
    Sources.writeJdbc(df, url, "users", mode = org.apache.spark.sql.SaveMode.Overwrite)
    assert(Sources.readJdbc(spark, url, "users").count() == 40)
  }

  test("I1 CSV round-trip preserves rows and profiles like the in-memory frame") {
    val df = Seq(
      (1001L, "john@example.com", "active", 150.50),
      (1002L, "jane@test.org", "inactive", 0.0),
      (1003L, "bob@company.co.uk", "pending", 2500.75)
    ).toDF("customer_id", "email", "status", "balance")

    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/t"
    Sources.writeCsv(df, dir)
    val back = Sources.readCsv(spark, dir, schema = Some(df.schema))
    assert(back.count() == 3)
    assert(back.orderBy("customer_id").collect().toSeq == df.orderBy("customer_id").collect().toSeq)

    // inferred-schema path (the reference's pandas.read_csv behavior)
    val inferred = Sources.readCsv(spark, dir)
    assert(inferred.count() == 3)
    assert(inferred.schema("customer_id").dataType.typeName.matches("integer|long"))

    // profiling the round-tripped frame matches the in-memory profile
    val e = new graft.engine.ProfilerEngine()
    val a = e.analyzeDataFrame(df).columnProfiles.map(p => p.originalName -> p.dataType).toMap
    val b = e.analyzeDataFrame(back).columnProfiles.map(p => p.originalName -> p.dataType).toMap
    assert(a == b)
  }

  test("CSV round-trip preserves surrounding whitespace and embedded newlines (r11)") {
    // writer trim options default ON in Spark and the reader needs multiLine
    // to reassemble quoted newlines — both now pinned by Sources; this is
    // the text that used to corrupt silently
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    val d = Seq(
      (1L, " leading and trailing "),
      (2L, "embedded\nnewline"),
      (3L, "quote\" and ,comma"),
      (4L, "\ttabs\t")
    ).toDF("id", "text")
    val got  = graft.io.Sources.csvRoundTrip(d, tmp, "id").collect().toSeq
    val want = d.orderBy("id").collect().toSeq
    assert(got == want, s"round-trip drifted: $got")
  }

  test("JSONL round-trip preserves rows; malformed lines quarantine, not crash") {
    val df = Seq(
      (1L, "hello world", "en"),
      (2L, "zweite zeile", "de")
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/t"
    Sources.writeJsonl(df, dir)
    val back = Sources.readJsonl(spark, dir, schema = Some(df.schema))
    assert(back.orderBy("doc_id").collect().toSeq == df.orderBy("doc_id").collect().toSeq)

    // PERMISSIVE quarantine: a corrupt line lands in _corrupt_record
    val corruptDir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(corruptDir, "part.jsonl"),
      """{"doc_id": 1, "text": "ok", "lang": "en"}
        |this is not json
        |{"doc_id": 2, "text": "also ok", "lang": "en"}""".stripMargin
    )
    val schemaWithCorrupt = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType)
    )
    val got = Sources.readJsonl(spark, corruptDir, schema = Some(schemaWithCorrupt)).cache()
    assert(got.where("_corrupt_record IS NULL").count() == 2)
    assert(got.where("_corrupt_record IS NOT NULL").count() == 1)
    got.unpersist()
  }

  test("streaming windowed profile equals the batch equivalent (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingProfiler.eventWindowCounts(spark, dir).collect()
    import org.apache.spark.sql.functions._
    val batch = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("tv"))
      .select(col("w.start").cast("long").as("window_start"), col("event_type"),
        col("n_events"), col("tv").cast("double").as("total_value"))
      .orderBy("window_start", "event_type")
      .collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("multimodal featurize: per-partition decode with stable fake features") {
    val media = Seq(
      (1L, "payload-one".getBytes("UTF-8")),
      (2L, "payload-two".getBytes("UTF-8")),
      (3L, "payload-one".getBytes("UTF-8"))
    ).toDF("media_id", "payload").repartition(2)

    val feats = MediaOps.featurize(media, "media_id", "payload", MediaOps.DeterministicFakeDecoder)
    assert(feats.columns.toSeq == Seq("media_id", "features"))
    val m = feats.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(m(1L).length == MediaOps.DeterministicFakeDecoder.dim)
    assert(m(1L) == m(3L)) // same bytes → same features
    assert(m(1L) != m(2L))
    assert(m.values.flatten.forall(f => f >= 0.0f && f <= 1.0f))
  }

  test("decodeImages: real javax.imageio decode recovers encoded raster exactly (r10)") {
    // encode a fresh raster in-memory (not the committed fixture) and decode
    val gen = graft.multimodal.MediaFixtureGen.rows(6)
    val media = gen.map(r => (r.media_id, r.payload)).toDF("media_id", "payload")
      .repartition(3)
    val got = MediaOps.decodeImages(media, "media_id", "payload").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.size == 6)
    gen.foreach { r =>
      assert(got(r.media_id) ==
        ((r.true_width, r.true_height, r.true_sum_r, r.true_sum_g, r.true_sum_b)),
        s"media ${r.media_id} (${r.kind}) decode drifted from encode-time truth")
    }
    // undecodable bytes are quarantined (dropped), not a task failure
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    assert(MediaOps.decodeImages(junk, "media_id", "payload").count() == 0)
  }

  test("mediaQuarantine: corrupt payloads are counted, not silently dropped (r11)") {
    // every generated corrupt payload really is undecodable (the gen
    // self-checks too, but the committed-fixture contract lives here)
    val corrupt = graft.multimodal.MediaFixtureGen.corruptRows()
    assert(corrupt.length == 6 && corrupt.forall(!_.decodable))
    corrupt.foreach { r =>
      assert(MediaOps.ImageIoDecoder.decode(r.payload).isEmpty,
        s"corrupt media ${r.media_id} (${r.kind}) unexpectedly decoded")
      assert(!MediaOps.ImageIoDecoder.canDecode(r.payload),
        s"canDecode must agree with decode on corrupt media ${r.media_id}")
    }
    // canDecode (the sum-free predicate quarantine counts ride on) must agree
    // with decode on GOOD payloads too — same readImage, by construction
    graft.multimodal.MediaFixtureGen.rows(4).foreach { r =>
      assert(MediaOps.ImageIoDecoder.canDecode(r.payload) ==
        MediaOps.ImageIoDecoder.decode(r.payload).isDefined)
      assert(MediaOps.ImageIoDecoder.canDecode(r.payload),
        s"good media ${r.media_id} (${r.kind}) must be decodable")
    }
    val fx = new java.io.File(MediaOps.DefaultFixture)
    assume(fx.exists, s"committed fixture missing at $fx")
    val got = MediaOps.mediaQuarantine(spark).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 60 good rows alternate png/bmp (30/30); corrupt rows add 3 of each kind
    assert(got("png") == ((33L, 30L, 3L)), s"png counts drifted: $got")
    assert(got("bmp") == ((33L, 30L, 3L)), s"bmp counts drifted: $got")
  }

  test("mediaDecode: committed fixture decodes to its ground-truth columns (r10)") {
    val fx = new java.io.File(MediaOps.DefaultFixture)
    assume(fx.exists, s"committed fixture missing at $fx")
    val out = MediaOps.mediaDecode(spark).collect()
    assert(out.length == 60)
    assert(out.map(_.getString(1)).toSet == Set("png", "bmp"))
    val truth = spark.read.parquet(MediaOps.DefaultFixture)
      .select("media_id", "true_width", "true_height", "true_sum_r", "true_sum_g", "true_sum_b")
      .collect().map(r => r.getLong(0) -> r).toMap
    out.foreach { r =>
      val t = truth(r.getLong(0))
      assert((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
        ((t.getInt(1), t.getInt(2), t.getLong(3), t.getLong(4), t.getLong(5))))
    }
  }

  test("ORC round-trip preserves schema and rows exactly") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/t"
    val back = graft.io.Sources.orcRoundTrip(docs, dir, "doc_id")
    assert(back.schema.map(f => (f.name, f.dataType)) == docs.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSeq == docs.orderBy("doc_id").collect().toSeq)
  }

  test("MediaMeta rides as a typed struct column next to the payload") {
    val rows = Seq(
      (1L, "img-bytes".getBytes("UTF-8"), MediaOps.MediaMeta("image", 640, 480, 0)),
      (2L, "wav-bytes".getBytes("UTF-8"), MediaOps.MediaMeta("audio", 0, 0, 16000))
    ).toDF("media_id", "payload", "meta")
    val imgs = rows.where($"meta.kind" === "image")
    assert(imgs.count() == 1)
    assert(imgs.select($"meta.width").as[Int].head() == 640)
  }
}
