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

  test("jpegExifCensus: fill bytes before a marker are skipped (T.81 " +
      "B.1.1.2) and corrupt TIFF offsets never fabricate or crash") {
    val full = Seq((0, 1)).toDF("a", "b").select(
      ImageMetadata.syntheticExifJpeg(lit(48), lit(32), lit(3), lit(1),
        lit(true), lit(true)).as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    // insert three 0xFF fill bytes after SOI, before APP1: some camera
    // writers pad — the census must still see Exif AND the SOF dims
    val padded = (full.take(2) :+ 0xff.toByte :+ 0xff.toByte :+ 0xff.toByte) ++
      full.drop(2)
    val p = ImageMetadata.jpegExifCensus(
      Seq((0L, padded.toArray)).toDF("doc_id", "payload")).collect().head
    assert(p.getAs[String]("parse_error") == null)
    assert(p.getAs[Int]("sof_width") == 48 && p.getAs[Boolean]("gps_present"))
    assert(p.getAs[Int]("exif_orientation") == 3)
    // corrupt IFD0 offset: backwards (points into the TIFF header) and
    // high-bit (wraps toInt negative) — both must degrade to exif-less
    // census rows, never fabricate metadata, never throw
    def patchIfd0(v: Long): Array[Byte] = {
      val c = full.clone()
      // TIFF starts after SOI(2) + APP1 marker+len(4) + "Exif\0\0"(6) = 12;
      // big-endian fixture → IFD0 offset is the u32 at TIFF+4
      val t = 12
      c(t + 4) = ((v >> 24) & 0xff).toByte; c(t + 5) = ((v >> 16) & 0xff).toByte
      c(t + 6) = ((v >> 8) & 0xff).toByte; c(t + 7) = (v & 0xff).toByte
      c
    }
    for (bad <- Seq(0L, 2L, 0x80000000L, 0x7ffffff0L)) {
      val row = ImageMetadata.jpegExifCensus(
        Seq((0L, patchIfd0(bad))).toDF("doc_id", "payload")).collect().head
      assert(row.getAs[String]("parse_error") == null, s"offset $bad threw")
      assert(row.getAs[Boolean]("has_exif"), s"offset $bad lost exif flag")
      assert(row.isNullAt(row.fieldIndex("exif_orientation")),
        s"offset $bad fabricated an orientation")
      assert(!row.getAs[Boolean]("gps_present"),
        s"offset $bad fabricated a GPS flag")
      assert(row.getAs[Int]("sof_width") == 48, s"offset $bad lost SOF dims")
    }
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
  test("hostile IFD entries cannot fabricate metadata: an offset-stored " +
      "orientation (count > 1) and an out-of-range value are both " +
      "skipped; a Make value-offset pointing into the TIFF header is " +
      "rejected") {
    // take a valid fixture and corrupt IFD0 entries in place
    val base = Seq(Tuple1(0L)).toDF("doc_id").select(
      ImageMetadata.syntheticExifJpeg(lit(640), lit(480), lit(6), lit(2),
        lit(true), lit(false)).as("payload"))
      .collect()(0).getAs[Array[Byte]]("payload")
    def census(b: Array[Byte]) = ImageMetadata.jpegExifCensus(
      Seq(Tuple1(b)).toDF("payload")).collect()(0)
    val ok = census(base)
    assert(ok.getAs[Int]("exif_orientation") == 6)
    // locate the orientation entry (tag 0x0112 big-endian) and corrupt
    // its count to 3: the value field becomes an offset, which must NOT
    // be read as an orientation
    def findTag(b: Array[Byte], t0: Int, t1: Int): Int = {
      var i = 0
      while (i + 1 < b.length &&
        !((b(i) & 0xff) == t0 && (b(i + 1) & 0xff) == t1)) i += 1
      i
    }
    val cntCorrupt = base.clone()
    val oe = findTag(cntCorrupt, 0x01, 0x12)
    cntCorrupt(oe + 7) = 3 // count 3 (big-endian low byte)
    val r1 = census(cntCorrupt)
    assert(r1.isNullAt(r1.fieldIndex("exif_orientation")),
      s"offset-stored orientation fabricated: ${r1.getAs[Int]("exif_orientation")}")
    // out-of-range value (312) skipped
    val rangeCorrupt = base.clone()
    rangeCorrupt(oe + 8) = 0x01; rangeCorrupt(oe + 9) = 0x38
    val r2 = census(rangeCorrupt)
    assert(r2.isNullAt(r2.fieldIndex("exif_orientation")))
    // Make (tag 0x010F, offset-stored): point the value offset at the
    // TIFF header (0) — no TIFF value can live there
    val makeCorrupt = base.clone()
    val me = findTag(makeCorrupt, 0x01, 0x0F)
    makeCorrupt(me + 8) = 0; makeCorrupt(me + 9) = 0
    makeCorrupt(me + 10) = 0; makeCorrupt(me + 11) = 0
    val r3 = census(makeCorrupt)
    assert(r3.getAs[String]("exif_make") == null ||
      !r3.getAs[String]("exif_make").startsWith("MM"),
      s"header bytes parsed as Make: '${r3.getAs[String]("exif_make")}'")
  }

}
