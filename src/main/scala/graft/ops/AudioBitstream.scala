package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MPEG audio (MP3) bitstream STRUCTURE ops (ISO/IEC 11172-3 +
  * 13818-3, public spec): ID3v2-aware frame-header walk giving the
  * census a curation pipeline gates on — duration, bitrate profile,
  * sample rate, CBR/VBR — without an audio decoder. Crawled audio is
  * overwhelmingly MP3, which the JDK cannot decode
  * ([[Multimodal.decodeAudio]] handles WAV/PCM); the frame GRAMMAR
  * needs no decoder at all: every header states its own frame length,
  * so duration is frames × samples-per-frame / sample-rate, summed in
  * one forward walk.
  *
  * Scale shape: one narrow per-partition map, one clip's bytes in
  * memory at a time; per-clip error degradation like the other
  * structure parsers.
  */
object AudioBitstream {

  // MPEG1 bitrate tables (kbps) by layer; index 0 = free, 15 = bad
  private val Br1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, -1)
  private val Br1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, -1)
  private val Br1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  // MPEG2/2.5 Layer III
  private val Br2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)
  private val Sr1 = Array(44100, 48000, 32000, -1)

  private final case class FrameInfo(lengthBytes: Int, samples: Int,
      sampleRate: Int, bitrateKbps: Int)

  /** Parse the 4-byte header at `o`; null if not a valid frame sync /
    * supported variant. Supported: MPEG1 L1/L2/L3, MPEG2 & 2.5 L3 (the
    * crawl-common shapes); free-format (bitrate index 0) is rejected —
    * its frame length is not derivable from the header alone.
    */
  private def parseFrameHeader(b: Array[Byte], o: Int): FrameInfo = {
    if (o + 4 > b.length) return null
    if ((b(o) & 0xff) != 0xff || (b(o + 1) & 0xe0) != 0xe0) return null
    val verBits = (b(o + 1) >> 3) & 3 // 0=2.5, 1=rsv, 2=MPEG2, 3=MPEG1
    val layerBits = (b(o + 1) >> 1) & 3 // 1=L3, 2=L2, 3=L1
    if (verBits == 1 || layerBits == 0) return null
    val brIdx = (b(o + 2) >> 4) & 0xf
    val srIdx = (b(o + 2) >> 2) & 3
    val padding = (b(o + 2) >> 1) & 1
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val mpeg1 = verBits == 3
    val sr0 = Sr1(srIdx)
    val sr = verBits match {
      case 3 => sr0
      case 2 => sr0 / 2
      case _ => sr0 / 4
    }
    val kbps = (mpeg1, layerBits) match {
      case (true, 3) => Br1L1(brIdx)
      case (true, 2) => Br1L2(brIdx)
      case (true, 1) => Br1L3(brIdx)
      case (false, 1) => Br2L3(brIdx)
      case _ => return null // MPEG2 L1/L2: not in the supported set
    }
    val (len, samples) = layerBits match {
      case 3 => ((12000 * kbps / sr + padding) * 4, 384) // Layer I
      case 2 => (144000 * kbps / sr + padding, 1152) // Layer II
      case _ =>
        if (mpeg1) (144000 * kbps / sr + padding, 1152) // L3 MPEG1
        else (72000 * kbps / sr + padding, 576) // L3 MPEG2/2.5
    }
    FrameInfo(len, samples, sr, kbps)
  }

  /** ID3v2 tag length at stream start (0 if absent): 10-byte header,
    * syncsafe 28-bit size, optional footer flag adds 10.
    */
  private def id3v2Length(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    val footer = (b(5) & 0x10) != 0
    10 + size + (if (footer) 10 else 0)
  }

  private val mp3Cols = Seq(
    StructField("id3v2_bytes", IntegerType),
    StructField("frame_count", IntegerType),
    StructField("mp3_sample_rate", IntegerType),
    StructField("bitrate_kbps_min", IntegerType),
    StructField("bitrate_kbps_max", IntegerType),
    StructField("is_vbr", BooleanType),
    StructField("duration_s", DoubleType),
    StructField("parse_error", StringType))

  /** One row per clip: ID3v2 size, frame count, sample rate, min/max
    * frame bitrate (min ≠ max ⇔ VBR), and the walked duration
    * (Σ samples-per-frame / sample-rate). Leading junk before the first
    * sync is skipped (crawled files); junk AFTER a valid run ends the
    * walk, keeping the frames already counted — same truncation stance
    * as the AVI/MP4 walks. A sample-rate change mid-stream is malformed
    * (reported, frames kept).
    */
  def mp3FrameCensus(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    Multimodal.requireFreshColumns(df, "mp3FrameCensus", mp3Cols.map(_.name))
    val schema = StructType(df.schema.fields ++ mp3Cols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        def errRow(msg: String) = Row.fromSeq(r.toSeq ++
          Seq(null, null, null, null, null, null, null, msg))
        if (r.isNullAt(idx)) errRow("null payload")
        else try {
          val bytes = r.getAs[Array[Byte]](idx)
          val id3 = id3v2Length(bytes)
          // scan to the first valid sync after the tag
          var o = id3
          var first: FrameInfo = null
          while (first == null && o + 4 <= bytes.length) {
            first = parseFrameHeader(bytes, o)
            if (first == null) o += 1
          }
          if (first == null) errRow("no MPEG audio frame sync")
          else {
            var frames = 0
            var brMin = Int.MaxValue
            var brMax = 0
            var sampleSum = 0L
            var srErr = false
            var fi = first
            while (fi != null) {
              frames += 1
              brMin = math.min(brMin, fi.bitrateKbps)
              brMax = math.max(brMax, fi.bitrateKbps)
              sampleSum += fi.samples
              if (fi.sampleRate != first.sampleRate) srErr = true
              o += fi.lengthBytes
              fi = if (o + 4 <= bytes.length) parseFrameHeader(bytes, o) else null
            }
            Row.fromSeq(r.toSeq ++ Seq(id3, frames, first.sampleRate,
              brMin, brMax, brMin != brMax,
              sampleSum.toDouble / first.sampleRate,
              if (srErr) "sample rate changes mid-stream" else null))
          }
        } catch { case e: Exception =>
          errRow(s"frame walk failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  /** Deterministic synthetic MP3: an ID3v2 tag of `id3Pad` content bytes
    * (syncsafe-sized, filler avoids 0xFF) followed by `nFrames` MPEG1
    * Layer III frames — even frames at `Br1L3(brIdx)` kbps, odd frames
    * at `Br1L3(brIdx2)` (brIdx2 ≠ brIdx plants a VBR stream) —
    * `Sr1(srIdx)` Hz, padding bit 0, frame bodies never 0xFF so no
    * false sync can appear: the oracle's frame-length arithmetic stays
    * closed-form (len = 144000·kbps/sr, integer division).
    */
  val syntheticMp3: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((nFrames: Int, brIdx: Int, brIdx2: Int, srIdx: Int, id3Pad: Int, seed: Int) => {
      val out = new java.io.ByteArrayOutputStream()
      // ID3v2.4 header: "ID3", version, flags 0, syncsafe size
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0)
      out.write((id3Pad >> 21) & 0x7f); out.write((id3Pad >> 14) & 0x7f)
      out.write((id3Pad >> 7) & 0x7f); out.write(id3Pad & 0x7f)
      var i = 0
      while (i < id3Pad) { out.write(0x20 + ((seed + i) % 64)); i += 1 }
      val sr = Sr1(srIdx)
      var f = 0
      while (f < nFrames) {
        val bi = if (f % 2 == 0) brIdx else brIdx2
        val len = 144000 * Br1L3(bi) / sr
        out.write(0xff); out.write(0xfb) // MPEG1 L3, no CRC
        out.write((bi << 4) | (srIdx << 2)) // padding 0, private 0
        out.write(0xc0) // single channel
        var j = 4
        while (j < len) { out.write(0x40 + ((seed + f + j) % 64)); j += 1 }
        f += 1
      }
      out.toByteArray
    })
}
