package graft.multimodal

import org.apache.spark.sql.SparkSession

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Writes the committed media fixture (`fixtures/media.parquet`): 60 small
  * REAL images — PNG and BMP alternating, encoded with `javax.imageio` —
  * with deterministic per-pixel values, alongside the ground-truth
  * dimension/channel-sum columns computed from the raster BEFORE encoding.
  * Both formats are lossless, so [[MediaOps.decodeImages]] must recover the
  * truth exactly; the hash gate compares the two.
  *
  * Run once and commit the output (the fixture is input data, not a build
  * artifact): `sbt "runMain graft.multimodal.MediaFixtureGen [outPath]"`.
  */
object MediaFixtureGen {

  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      true_width: Int, true_height: Int,
      true_sum_r: Long, true_sum_g: Long, true_sum_b: Long)

  /** Deterministic pixel function — varied enough that every image has
    * distinct stats, simple enough to audit by eye.
    */
  private def pixel(i: Int, x: Int, y: Int): (Int, Int, Int) =
    ((i * 31 + x * 7 + y * 13) % 256, (i * 17 + x * 3 + y * 5) % 256, (i * 11 + x * 29 + y * 23) % 256)

  def rows(n: Int = 60): Seq[MediaRow] = (0 until n).map { i =>
    val w    = 8 + i       % 9
    val h    = 8 + (i * 3) % 7
    val kind = if (i % 2 == 0) "png" else "bmp"
    val img  = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pixel(i, x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      sr += r; sg += g; sb += b
    }
    val out = new ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, kind, out), s"no JDK writer for $kind")
    MediaRow(i.toLong, kind, out.toByteArray, w, h, sr, sg, sb)
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
      val rs = rows()
      rs.toDF().coalesce(1).write.mode("overwrite").parquet(outPath)
      println(s"wrote ${rs.size} media rows to $outPath")
    } finally spark.stop()
  }
}
