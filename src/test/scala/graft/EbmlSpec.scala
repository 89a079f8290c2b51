package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WebM/Matroska structure census ([[Ebml]]): RFC 8794 vint coding,
  * the track/duration/keyframe walk over real EBML nesting, unknown-size
  * masters, and per-clip degradation on garbage.
  */
class EbmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("readVint: widths, marker stripping, unknown-size sentinel") {
    // 1-byte: 0x81 → id 0x81, size 1
    assert(Ebml.readVint(Array(0x81.toByte), 0, keepMarker = true) == ((0x81L, 1)))
    assert(Ebml.readVint(Array(0x81.toByte), 0, keepMarker = false) == ((1L, 1)))
    // 2-byte: 0x42 0x82 → size (0x42&0x3f)<<8 | 0x82 = 0x282
    assert(Ebml.readVint(Array(0x42.toByte, 0x82.toByte), 0,
      keepMarker = false) == ((0x282L, 2)))
    // 4-byte ID keeps all bits
    assert(Ebml.readVint(Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte,
      0xA3.toByte), 0, keepMarker = true) == ((0x1A45DFA3L, 4)))
    // all-ones size = unknown → -1
    assert(Ebml.readVint(Array(0xFF.toByte), 0, keepMarker = false) == ((-1L, 1)))
    // truncated / invalid
    assert(Ebml.readVint(Array(0x40.toByte), 0, keepMarker = false) == null)
    assert(Ebml.readVint(Array(0x00.toByte, 0x01.toByte), 0,
      keepMarker = false) == null)
  }

  test("webmTracks: synthetic clip walks to exact census rows") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      Ebml.syntheticWebm(lit(1), lit(640), lit(360), lit(0), lit(48000),
        lit(2), lit(5), lit(2), lit(1500)).as("payload"))
    val rows = Ebml.webmTracks(df, "payload").collect()
      .sortBy(_.getAs[Long]("track_number"))
    assert(rows.length == 2)
    val v = rows(0)
    assert(v.getAs[String]("parse_error") == null)
    assert(v.getAs[String]("doc_type") == "webm")
    assert(v.getAs[String]("track_type") == "video")
    assert(v.getAs[String]("codec_id") == "V_VP9")
    assert(v.getAs[Long]("pixel_width") == 640)
    assert(v.getAs[Long]("pixel_height") == 360)
    assert(v.isNullAt(v.fieldIndex("sampling_hz")))
    assert(v.getAs[Double]("duration_s") == 1.5)
    assert(v.getAs[Int]("cluster_count") == 2)
    assert(v.getAs[Int]("block_count") == 10)
    assert(v.getAs[Int]("keyframe_count") == 6) // blocks 0,2,4 per cluster
    val a = rows(1)
    assert(a.getAs[String]("track_type") == "audio")
    assert(a.getAs[String]("codec_id") == "A_OPUS")
    assert(a.getAs[Double]("sampling_hz") == 48000.0)
    assert(a.getAs[Long]("channels") == 2)
    assert(a.isNullAt(a.fieldIndex("pixel_width")))
  }

  test("unknown-size Segment (streaming mux convention) still walks") {
    // take a definite clip and rewrite the Segment size to all-ones of
    // the same width, which is exactly what live muxers emit
    val clip = Seq(Tuple1(0L)).toDF("doc_id").select(
      Ebml.syntheticWebm(lit(0), lit(320), lit(240), lit(0), lit(48000),
        lit(1), lit(4), lit(2), lit(1000)).as("payload"))
      .collect()(0).getAs[Array[Byte]]("payload")
    // EBML header: 4-byte id + 1-byte size + payload; find Segment start
    val hdrSize = clip(4) & 0x7f
    val segOff = 5 + hdrSize
    assert((clip(segOff) & 0xff) == 0x18) // Segment id first byte
    val szOff = segOff + 4
    val szWidth = java.lang.Integer.numberOfLeadingZeros(clip(szOff) & 0xff) - 24 + 1
    for (i <- 0 until szWidth)
      clip(szOff + i) = (if (i == 0) (0xff >> (szWidth - 1)) | (1 << (8 - szWidth))
        else 0xff).toByte
    val df = Seq(Tuple1(clip)).toDF("payload")
    val rows = Ebml.webmTracks(df, "payload").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("parse_error") == null))
    assert(rows.exists(_.getAs[String]("codec_id") == "V_VP8"))
  }

  // hand-built EBML for crafted-input tests (sizes < 127 → 1-byte vints)
  private def elem(id: Array[Int], payload: Array[Byte]): Array[Byte] =
    id.map(_.toByte) ++ Array((0x80 | payload.length).toByte) ++ payload
  private def minimalClip(segChildren: Array[Byte]): Array[Byte] =
    elem(Array(0x1A, 0x45, 0xDF, 0xA3),
      elem(Array(0x42, 0x82), "webm".getBytes)) ++
      elem(Array(0x18, 0x53, 0x80, 0x67), segChildren)

  test("SimpleBlock with 2-byte track vint in a 4-byte block at buffer " +
      "end does not read past the block (no throw, not a keyframe)") {
    // block payload: 41 01 (2-byte track vint) + 2 timestamp bytes; the
    // flags byte would sit at offset 4 == block length → out of bounds
    val sb = elem(Array(0xA3), Array[Byte](0x41, 0x01, 0x00, 0x00))
    val clip = minimalClip(elem(Array(0x1F, 0x43, 0xB6, 0x75), sb))
    val w = Ebml.parseWebm(clip)
    assert(w.isRight)
    assert(w.toOption.get.blockCount == 1)
    assert(w.toOption.get.keyframeCount == 0)
    // and through the Spark op (payload ends exactly at the block end)
    val rows = Ebml.webmTracks(Seq(Tuple1(clip)).toDF("payload")).collect()
    assert(rows.length == 1)
  }

  test("declared child size in [2^31,2^56) stops the walk instead of " +
      "wrapping under toInt and mis-walking") {
    // real cluster, then a crafted cluster declaring size 2^32 + 2 via a
    // 5-byte vint (0x09 00 00 00 02 with the 1<<35 marker bit)
    val sb = elem(Array(0xA3), Array[Byte](0x81.toByte, 0x00, 0x00, 0x80.toByte))
    val realCluster = elem(Array(0x1F, 0x43, 0xB6, 0x75), sb)
    val fake = Array(0x1F, 0x43, 0xB6, 0x75).map(_.toByte) ++
      Array(0x09, 0x00, 0x00, 0x00, 0x02).map(_.toByte) ++
      Array[Byte](0x00, 0x00) // 2 bytes present of the declared 2^32+2
    val clip = minimalClip(realCluster ++ fake)
    val w = Ebml.parseWebm(clip)
    assert(w.isRight)
    // pre-fix the wrapped size (2) passed the Int bounds check and the
    // fake cluster was walked (clusterCount 2); the Long check stops it
    assert(w.toOption.get.clusterCount == 1)
    assert(w.toOption.get.keyframeCount == 1)
  }

  test("degradation: non-EBML, truncated, and fuzzed payloads never throw") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 0, 0, 0)
    val d1 = Ebml.webmTracks(Seq(Tuple1(png)).toDF("payload")).collect()
    assert(d1.length == 1 && d1(0).getAs[String]("parse_error").contains("not EBML"))
    // truncate a valid clip at every 13th byte: per-clip error or partial
    val clip = Seq(Tuple1(0L)).toDF("doc_id").select(
      Ebml.syntheticWebm(lit(0), lit(320), lit(240), lit(1), lit(44100),
        lit(1), lit(4), lit(2), lit(1000)).as("payload"))
      .collect()(0).getAs[Array[Byte]]("payload")
    val cuts = (8 until clip.length by 13).map(n => Tuple1(clip.take(n)))
    val out = Ebml.webmTracks(cuts.toDF("payload")).collect()
    assert(out.length >= cuts.length) // every cut yields at least one row
    val rnd = new scala.util.Random(3)
    val fuzz = (0 until 40).map(_ => Tuple1(Array.fill(rnd.nextInt(64) + 4)(
      rnd.nextInt(256).toByte)))
    assert(Ebml.webmTracks(fuzz.toDF("payload")).collect().length >= 40)
  }
}
