package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ogg/FLAC census ([[AudioContainers]]): exact STREAMINFO unpack, page
  * walk with lacing, granule→duration math, and degradation.
  */
class AudioContainersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("FLAC: STREAMINFO 64-bit pack round-trips exactly") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticFlac(lit(44100), lit(2), lit(24),
        lit(1234567L)).as("payload"))
    val r = AudioContainers.audioContainerMeta(df).collect()(0)
    assert(r.getAs[String]("parse_error") == null)
    assert(r.getAs[String]("container") == "flac")
    assert(r.getAs[Long]("sample_rate") == 44100)
    assert(r.getAs[Int]("channels") == 2)
    assert(r.getAs[Int]("bits_per_sample") == 24)
    assert(r.getAs[Long]("total_samples") == 1234567L)
    assert(r.getAs[Int]("meta_blocks") == 3)
    assert(r.getAs[Double]("duration_s") == 1234567.0 / 44100)
  }

  test("Ogg-Opus: pre-skip subtracted from the final 48 kHz granule") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticOggOpus(lit(2), lit(312), lit(3),
        lit(96000L)).as("payload"))
    val r = AudioContainers.audioContainerMeta(df).collect()(0)
    assert(r.getAs[String]("parse_error") == null)
    assert(r.getAs[String]("codec") == "opus")
    assert(r.getAs[Long]("sample_rate") == 48000)
    assert(r.getAs[Int]("channels") == 2)
    assert(r.getAs[Int]("page_count") == 4)
    assert(r.getAs[Long]("total_samples") == 96000L)
    assert(r.getAs[Double]("duration_s") == 2.0)
  }

  test("Ogg-Vorbis: identification header + granule duration") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticOggVorbis(lit(2), lit(44100), lit(2),
        lit(88200L)).as("payload"))
    val r = AudioContainers.audioContainerMeta(df).collect()(0)
    assert(r.getAs[String]("parse_error") == null)
    assert(r.getAs[String]("codec") == "vorbis")
    assert(r.getAs[Long]("sample_rate") == 44100)
    assert(r.getAs[Double]("duration_s") == 2.0)
    assert(r.getAs[Int]("page_count") == 3)
  }

  test("degradation: wrong magic, truncations, fuzz — named errors, no throw") {
    val mp3ish = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x00)
    val d = AudioContainers.audioContainerMeta(
      Seq(Tuple1(mp3ish)).toDF("payload")).collect()(0)
    assert(d.getAs[String]("parse_error").contains("magic"))
    val clip = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticOggOpus(lit(1), lit(0), lit(2),
        lit(48000L)).as("payload")).collect()(0).getAs[Array[Byte]]("payload")
    val cuts = (4 until clip.length by 11).map(n => Tuple1(clip.take(n)))
    val out = AudioContainers.audioContainerMeta(cuts.toDF("payload")).collect()
    assert(out.length == cuts.length)
    val rnd = new scala.util.Random(9)
    val fuzz = (0 until 30).map { i =>
      val b = Array.fill(30 + rnd.nextInt(40))(rnd.nextInt(256).toByte)
      if (i % 2 == 0) { b(0) = 'O'; b(1) = 'g'; b(2) = 'g'; b(3) = 'S' }
      else { b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C' }
      Tuple1(b)
    }
    assert(AudioContainers.audioContainerMeta(fuzz.toDF("payload"))
      .collect().length == 30)
  }

  test("FLAC total_samples = 0 is the UNKNOWN sentinel: null duration " +
      "and null total, not a zero-length file") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticFlac(lit(48000), lit(2), lit(16),
        lit(0L)).as("payload"))
    val r = AudioContainers.audioContainerMeta(df).collect()(0)
    assert(r.getAs[String]("parse_error") == null)
    assert(r.getAs[Long]("sample_rate") == 48000)
    assert(r.isNullAt(r.fieldIndex("total_samples")))
    assert(r.isNullAt(r.fieldIndex("duration_s")))
  }

  test("mid-block/mid-page truncation KEEPS what was walked (the " +
      "documented contract): FLAC after STREAMINFO, Ogg after the " +
      "codec header") {
    val flac = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticFlac(lit(44100), lit(1), lit(16),
        lit(99999L)).as("payload")).collect()(0).getAs[Array[Byte]]("payload")
    // cut INSIDE the second metadata block (STREAMINFO ends at 4+4+34)
    val cutFlac = flac.take(4 + 4 + 34 + 10)
    val r1 = AudioContainers.audioContainerMeta(
      Seq(Tuple1(cutFlac)).toDF("payload")).collect()(0)
    assert(r1.getAs[String]("parse_error") == null)
    assert(r1.getAs[Long]("sample_rate") == 44100)
    assert(r1.getAs[Long]("total_samples") == 99999L)
    // ...but a cut BEFORE STREAMINFO completes stays a named error
    val r1b = AudioContainers.audioContainerMeta(
      Seq(Tuple1(flac.take(20))).toDF("payload")).collect()(0)
    assert(r1b.getAs[String]("parse_error") != null)
    val ogg = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticOggOpus(lit(2), lit(312), lit(3),
        lit(96000L)).as("payload")).collect()(0).getAs[Array[Byte]]("payload")
    // cut mid final page: codec/rate survive, granule is the last FULL page
    val cutOgg = ogg.take(ogg.length - 3)
    val r2 = AudioContainers.audioContainerMeta(
      Seq(Tuple1(cutOgg)).toDF("payload")).collect()(0)
    assert(r2.getAs[String]("parse_error") == null)
    assert(r2.getAs[String]("codec") == "opus")
    assert(r2.getAs[Long]("sample_rate") == 48000)
  }

  test("chained Ogg (second BOS, new serial): the census covers the " +
      "FIRST chain, not a nonsense cross-chain granule") {
    val one = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticOggOpus(lit(2), lit(100), lit(2),
        lit(48000L)).as("payload")).collect()(0).getAs[Array[Byte]]("payload")
    val two = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticOggOpus(lit(1), lit(0), lit(2),
        lit(480000L)).as("payload")).collect()(0).getAs[Array[Byte]]("payload")
    // second stream gets a different serial (bytes 14..17 of each page)
    var o = 0
    while (o + 27 <= two.length && two(o) == 'O') {
      two(o + 14) = (two(o + 14) ^ 0x55).toByte
      val nSeg = two(o + 26) & 0xff
      var bl = 0
      for (i <- 0 until nSeg) bl += two(o + 27 + i) & 0xff
      o += 27 + nSeg + bl
    }
    val r = AudioContainers.audioContainerMeta(
      Seq(Tuple1(one ++ two)).toDF("payload")).collect()(0)
    assert(r.getAs[String]("parse_error") == null)
    // duration reflects chain ONE (its generator bakes preSkip into the
    // final granule, so ticks = 48000 exactly), never chain two's 480000
    assert(r.getAs[Long]("total_samples") == 48000L)
  }


  test("grouped (multiplexed) Ogg: a second BOS page at the start is " +
      "another stream's header, not a chain — the audio censuses fully") {
    val ogg = Seq(Tuple1(0L)).toDF("doc_id").select(
      AudioContainers.syntheticOggOpus(lit(2), lit(100), lit(2),
        lit(48000L)).as("payload")).collect()(0).getAs[Array[Byte]]("payload")
    // end of the audio BOS page (page 0)
    val nSeg = ogg(26) & 0xff
    var bl = 0
    for (i <- 0 until nSeg) bl += ogg(27 + i) & 0xff
    val p1 = 27 + nSeg + bl
    // a foreign (video-ish) BOS page with a different serial: 27-byte
    // header, flags=BOS, 1 segment of 8 body bytes
    val foreign = new java.io.ByteArrayOutputStream()
    foreign.write("OggS".getBytes("US-ASCII"))
    foreign.write(0) // version
    foreign.write(2) // header type: BOS
    for (_ <- 0 until 8) foreign.write(0) // granule
    foreign.write(Array[Byte](0x44, 0x33, 0x22, 0x11)) // serial != audio's
    for (_ <- 0 until 8) foreign.write(0) // seq + crc
    foreign.write(1) // one segment
    foreign.write(8) // of 8 bytes
    foreign.write(0x80); foreign.write("theora?".getBytes("US-ASCII"))
    // RFC 3533 grouped layout: ALL BOS pages first, then data pages
    val grouped = ogg.take(p1) ++ foreign.toByteArray ++ ogg.drop(p1)
    val r = AudioContainers.audioContainerMeta(
      Seq(Tuple1(grouped)).toDF("payload")).collect()(0)
    assert(r.getAs[String]("parse_error") == null, r.toString)
    assert(r.getAs[String]("codec") == "opus")
    // the full audio stream was walked — same ticks as the plain file
    assert(r.getAs[Long]("total_samples") == 48000L)
  }
}
