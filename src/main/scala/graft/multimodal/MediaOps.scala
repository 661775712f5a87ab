package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star family, SURVEY.md §7.4): media
  * payloads ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs per-partition so one task amortizes decoder
  * initialization over its whole partition (the Spark-side analogue of a
  * batched Pandas-UDF pipeline).
  *
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — behind [[MediaDecoder]]; [[DeterministicFakeDecoder]] derives
  * stable pseudo-features from the bytes so the plumbing (schema, batch
  * shape, partitioning, feature join-back) is real and tested. Swapping in a
  * real decoder is implementing one trait method.
  */
object MediaOps {

  /** Typed metadata carried alongside a binary payload. */
  final case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)

  /** The decode boundary: bytes → fixed-dim feature vector. Implementations
    * must be Serializable (shipped to executors) and thread-safe per
    * partition.
    */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** Stand-in for a real image/audio codec (STUB — deliberately fake, see
    * object scaladoc): md5-derived, deterministic, byte-content-sensitive.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    val dim = 8
    def decode(bytes: Array[Byte]): Array[Float] = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      Array.tabulate(dim)(i => (d(i) & 0xff) / 255.0f)
    }
  }

  /** Per-partition featurization: (id, payload) → (id, feature vector).
    * mapPartitions (not map) so a real decoder initializes once per
    * partition; the iterator stays lazy, so partition memory is one batch of
    * decoded features, never the whole partition's payloads.
    */
  def featurize(
      df: DataFrame,
      idCol: String,
      binCol: String,
      decoder: MediaDecoder
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(binCol).cast("binary")).as[(Long, Array[Byte])]
    pairs
      .mapPartitions { it =>
        // decoder init would happen here, once per partition
        it.map { case (id, bytes) => (id, decoder.decode(bytes)) }
      }
      .toDF(idCol, "features")
  }

  /** Declared media-features query: documents.text treated as the binary
    * payload (the testdata carries no real media); byte length, content md5,
    * and 8 md5-derived feature bytes as integer columns (engine-portable —
    * the float features of [[featurize]] stay spec-tested behind the stub).
    */
  def mediaFeatures(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    val m       = md5(payload)
    val bytes = (0 until 8).map { i =>
      conv(substring(m, 2 * i + 1, 2), 16, 10).cast("long").as(s"b$i")
    }
    graft.Tables.widen(docs)
      .select(
        Seq(
          col("doc_id"),
          length(payload).cast("long").as("n_bytes"),
          m.as("payload_md5")
        ) ++ bytes: _*
      )
      .orderBy("doc_id")
  }

  def oracleMediaFeatures: String = {
    val bytes = (0 until 8)
      .map(i => s"CAST('0x' || substr(md5(text), ${2 * i + 1}, 2) AS BIGINT) AS b$i")
      .mkString(", ")
    s"""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS payload_md5, $bytes
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
