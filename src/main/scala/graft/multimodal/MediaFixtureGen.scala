package graft.multimodal

import org.apache.spark.sql.SparkSession

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Writes the committed media fixture (`fixtures/media.parquet`): 60 small
  * REAL images — PNG and BMP alternating, encoded with `javax.imageio` —
  * with deterministic per-pixel values, alongside the ground-truth
  * dimension/channel-sum columns computed from the raster BEFORE encoding,
  * PLUS 6 deliberately corrupt payloads (truncations, garbage, empty) with
  * `decodable = false`. Both image formats are lossless, so
  * [[MediaOps.decodeImages]] must recover the truth exactly AND quarantine
  * exactly the corrupt rows; the hash gate compares both behaviors
  * (`media_decode` / `media_quarantine`).
  *
  * Run once and commit the output (the fixture is input data, not a build
  * artifact): `sbt "runMain graft.multimodal.MediaFixtureGen [outPath]"`.
  * The generator self-checks every row's `decodable` flag against an actual
  * [[MediaOps.ImageIoDecoder]] decode before writing, so the committed
  * ground truth can never disagree with the JDK codec's behavior.
  */
object MediaFixtureGen {

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte], decodable: Boolean,
      true_width: Int, true_height: Int,
      true_sum_r: Long, true_sum_g: Long, true_sum_b: Long)

  /** Deterministic pixel function — varied enough that every image has
    * distinct stats, simple enough to audit by eye.
    */
  private def pixel(i: Int, x: Int, y: Int): (Int, Int, Int) =
    ((i * 31 + x * 7 + y * 13) % 256, (i * 17 + x * 3 + y * 5) % 256, (i * 11 + x * 29 + y * 23) % 256)

  private def encode(i: Int, w: Int, h: Int, kind: String): (Array[Byte], Long, Long, Long) = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixel(i, x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      sr += r; sg += g; sb += b
    }
    val out = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, kind, out), s"no JDK writer for $kind")
    (out.toByteArray, sr, sg, sb)
  }

  def rows(n: Int = 60): Seq[MediaRow] = (0 until n).map { i =>
    val w    = 8 + i       % 9
    val h    = 8 + (i * 3) % 7
    val kind = if (i % 2 == 0) "png" else "bmp"
    val (bytes, sr, sg, sb) = encode(i, w, h, kind)
    MediaRow(i.toLong, kind, bytes, decodable = true, w, h, sr, sg, sb)
  }

  /** Corrupt payloads a real ingest meets: empty, random garbage, truncated
    * image files, a valid signature with no body, plain text. `kind` records
    * the INTENDED format (what the upstream metadata claimed), so per-kind
    * quarantine counts are meaningful; truth stats are 0 and decodable=false.
    */
  def corruptRows(startId: Long = 60L): Seq[MediaRow] = {
    val (png, _, _, _) = encode(0, 8, 8, "png")
    val (bmp, _, _, _) = encode(1, 9, 8, "bmp")
    val payloads: Seq[(String, Array[Byte])] = Seq(
      "png" -> Array.empty[Byte],                                    // empty upload
      "bmp" -> Array.tabulate(64)(i => ((i * 37 + 11) % 256).toByte), // garbage bytes
      "png" -> png.take(24),                                         // truncated PNG (signature + partial IHDR)
      "bmp" -> bmp.take(10),                                         // truncated BMP header
      "png" -> (png.take(8) ++ Array.fill[Byte](32)(0)),             // valid signature, zeroed body
      "bmp" -> "this is not an image at all".getBytes("UTF-8")       // mislabeled text
    )
    payloads.zipWithIndex.map { case ((kind, bytes), i) =>
      MediaRow(startId + i, kind, bytes, decodable = false, 0, 0, 0L, 0L, 0L)
    }
  }

  /** The full fixture: decodable truth rows + the corrupt quarantine rows,
    * every `decodable` flag verified against an actual JDK decode.
    */
  def allRows(n: Int = 60): Seq[MediaRow] = {
    val rs = rows(n) ++ corruptRows(n.toLong)
    rs.foreach { r =>
      require(MediaOps.ImageIoDecoder.decode(r.payload).isDefined == r.decodable,
        s"media ${r.media_id}: decodable flag ${r.decodable} disagrees with the JDK codec")
    }
    rs
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse(MediaOps.DefaultFixture)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-media-fixture")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      val rs = allRows()
      rs.toDF().coalesce(1).write.mode("overwrite").parquet(outPath)
      println(s"wrote ${rs.size} media rows (${rs.count(!_.decodable)} corrupt) to $outPath")
    } finally spark.stop()
  }
}
