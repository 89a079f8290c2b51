package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AudioBitstreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clips(rows: (Long, Int, Int, Int, Int, Int, Int)*) =
    rows.toSeq.toDF("doc_id", "nf", "b1", "b2", "sri", "pad", "seed")
      .select(col("doc_id"), AudioBitstream.syntheticMp3(col("nf"), col("b1"),
        col("b2"), col("sri"), col("pad"), col("seed")).as("payload"))

  test("mp3FrameCensus: CBR round-trip — id3 size, frames, rate, duration") {
    val out = AudioBitstream.mp3FrameCensus(clips((0L, 4, 10, 10, 0, 37, 5)))
      .collect().head
    assert(out.getAs[Int]("id3v2_bytes") == 47) // 10 header + 37 pad
    assert(out.getAs[Int]("frame_count") == 4)
    assert(out.getAs[Int]("mp3_sample_rate") == 44100)
    assert(out.getAs[Int]("bitrate_kbps_min") == 160)
    assert(out.getAs[Int]("bitrate_kbps_max") == 160)
    assert(!out.getAs[Boolean]("is_vbr"))
    assert(math.abs(out.getAs[Double]("duration_s") - 4 * 1152.0 / 44100) < 1e-12)
    assert(out.getAs[String]("parse_error") == null)
  }

  test("mp3FrameCensus: planted VBR stream reports min/max and the flag") {
    val out = AudioBitstream.mp3FrameCensus(clips((1L, 5, 3, 12, 1, 0, 9)))
      .collect().head
    assert(out.getAs[Int]("mp3_sample_rate") == 48000)
    assert(out.getAs[Int]("bitrate_kbps_min") == 48) // index 3
    assert(out.getAs[Int]("bitrate_kbps_max") == 224) // index 12
    assert(out.getAs[Boolean]("is_vbr"))
    assert(out.getAs[Int]("frame_count") == 5)
  }

  test("mp3FrameCensus: leading junk resyncs, trailing truncation keeps " +
      "counted frames, garbage and null degrade per clip") {
    val base = clips((0L, 3, 8, 8, 2, 0, 1)).collect().head.getAs[Array[Byte]]("payload")
    val junked = "leading junk".getBytes("UTF-8") ++ base
    val truncated = java.util.Arrays.copyOf(base, base.length - 30)
    val df = Seq(
      (0L, junked), (1L, truncated),
      (2L, "definitely not audio".getBytes("UTF-8")),
      (3L, null: Array[Byte])).toDF("doc_id", "payload")
    val out = AudioBitstream.mp3FrameCensus(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Int]("frame_count") == 3)
    assert(out(0L).getAs[Int]("mp3_sample_rate") == 32000)
    // the cut frame's HEADER was intact, so it still counts — the walk
    // just can't continue past the payload end
    assert(out(1L).getAs[Int]("frame_count") == 3)
    assert(out(2L).getAs[String]("parse_error") == "no MPEG audio frame sync")
    assert(out(3L).getAs[String]("parse_error") == "null payload")
  }

  test("mp3FrameCensus: MPEG2 Layer III variant (22.05 kHz, 576 samples)") {
    // hand-built single MPEG2-L3 frame: 0xFF 0xF3 (ver 10, L3), bitrate
    // index 8 = 64 kbps, sr index 0 = 22050; len = 72000*64/22050 = 208
    val kbps = 64
    val len = 72000 * kbps / 22050
    val frame = Array[Byte](0xff.toByte, 0xf3.toByte, (8 << 4 | 0 << 2).toByte, 0xc0.toByte) ++
      Array.fill(len - 4)(0x41.toByte)
    val df = Seq((0L, frame)).toDF("doc_id", "payload")
    val out = AudioBitstream.mp3FrameCensus(df).collect().head
    assert(out.getAs[Int]("frame_count") == 1)
    assert(out.getAs[Int]("mp3_sample_rate") == 22050)
    assert(out.getAs[Int]("bitrate_kbps_min") == 64)
    assert(math.abs(out.getAs[Double]("duration_s") - 576.0 / 22050) < 1e-12)
  }
}
