package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImageMetadataSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jpegExifCensus: SOF dims, both TIFF byte orders, offset-stored " +
      "Make, GPS presence; the walk stops at SOS") {
    val df = Seq(
      (0L, 640, 480, 6, 2, true, true),
      (1L, 320, 240, 1, 4, false, false))
      .toDF("doc_id", "w", "h", "ori", "mk", "be", "gps")
      .select(col("doc_id"), ImageMetadata.syntheticExifJpeg(
        col("w"), col("h"), col("ori"), col("mk"), col("be"), col("gps")).as("payload"))
    val out = ImageMetadata.jpegExifCensus(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r0 = out(0L)
    assert(r0.getAs[String]("parse_error") == null)
    assert(r0.getAs[Int]("sof_width") == 640 && r0.getAs[Int]("sof_height") == 480)
    assert(r0.getAs[Boolean]("has_exif") && r0.getAs[Boolean]("exif_big_endian"))
    assert(r0.getAs[Int]("exif_orientation") == 6)
    assert(r0.getAs[String]("exif_make") == "Camera2")
    assert(r0.getAs[Boolean]("gps_present"))
    val r1 = out(1L)
    assert(!r1.getAs[Boolean]("exif_big_endian") && !r1.getAs[Boolean]("gps_present"))
    assert(r1.getAs[Int]("exif_orientation") == 1)
    assert(r1.getAs[String]("exif_make") == "Camera4")
  }

  test("jpegExifCensus: a REAL JDK-encoded JPEG (no Exif) reports dims " +
      "from SOF and exif-absent, never a crash") {
    // JDK JPEG writer emits JFIF APP0 + SOF0 — a real codec's output
    // through the census, not just the synthetic fixture
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val out = ImageMetadata.jpegExifCensus(
      Seq((0L, bos.toByteArray)).toDF("doc_id", "payload")).collect().head
    assert(out.getAs[String]("parse_error") == null)
    assert(out.getAs[Int]("sof_width") == 24 && out.getAs[Int]("sof_height") == 16)
    assert(!out.getAs[Boolean]("has_exif"))
    assert(out.isNullAt(out.fieldIndex("exif_orientation")))
  }

  test("jpegExifCensus: degradation — PNG bytes, truncation, null") {
    val png = Seq((0, 1)).toDF("a", "b").select(
      Multimodal.syntheticPngGradient(lit(16), lit(8), lit(0), lit(1)).as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    val full = Seq((0, 1)).toDF("a", "b").select(
      ImageMetadata.syntheticExifJpeg(lit(64), lit(32), lit(1), lit(0),
        lit(true), lit(false)).as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    val df = Seq(
      (1L, png),
      (2L, java.util.Arrays.copyOf(full, 9)), // cut inside APP1 header
      (3L, null: Array[Byte])).toDF("doc_id", "payload")
    val out = ImageMetadata.jpegExifCensus(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("parse_error") == "not a JPEG (no SOI marker)")
    // truncated: walk stops, no dims, no exif claim, no error invented
    assert(out(2L).getAs[String]("parse_error") == null)
    assert(out(2L).isNullAt(out(2L).fieldIndex("sof_width")))
    assert(!out(2L).getAs[Boolean]("has_exif"))
    assert(out(3L).getAs[String]("parse_error") == "null payload")
  }
}
