package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** H.264/AVC bitstream STRUCTURE ops (ITU-T H.264, public spec): Annex-B
  * NAL unit scan, RBSP un-escaping, Exp-Golomb SPS parse. These make
  * keyframe-aware video curation REAL without a pixel decoder — a
  * training pipeline's first questions about a crawled clip (how many
  * access units? where are the IDR sync points? what resolution/profile?)
  * are answered from NAL headers and the SPS alone, reading only the
  * byte stream. Pixel decode of H.264 frames still has no JDK codec and
  * stays behind [[Multimodal.decodeStub]]'s contract (reference:
  * rdfizer has zero video handling; this is beyond-reference plumbing).
  *
  * Scale shape: both ops are narrow per-partition flatMaps over the
  * payload column — no shuffle, one clip's byte array in memory at a
  * time, output rows bounded by NAL count (parse) or 1 (meta).
  * Degradation is per-scope like [[Multimodal.decodeVideoFrames]]: a
  * clip that is not Annex-B yields one `parse_error` row; a malformed
  * SPS yields the clip's NAL rows with null dims — one bad crawl clip
  * cannot kill the job.
  */
object VideoBitstream {

  /** Annex-B NAL scan: byte spans (offsetOfHeader, length) for every NAL
    * unit, delimited by 00 00 01 start codes (a preceding 00 making a
    * 4-byte code belongs to the delimiter, not the previous NAL — NALs
    * never end in a zero byte because rbsp_trailing_bits puts the stop
    * bit in the last byte, so trailing zeros are stripped as
    * trailing_zero_8bits). Returns null if no start code exists.
    */
  private[ops] def findNals(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += i + 3
        i += 3
      } else i += 1
    }
    if (starts.isEmpty) return null
    starts.toSeq.zipWithIndex.map { case (s, k) =>
      var e = if (k + 1 < starts.length) starts(k + 1) - 3 else bytes.length
      while (e > s && bytes(e - 1) == 0) e -= 1 // trailing_zero_8bits
      (s, e - s)
    }.filter(_._2 > 0)
  }

  /** RBSP extraction: drop each emulation_prevention_three_byte (the 03
    * in 00 00 03 0x, x ≤ 3) from the NAL payload after the header byte.
    */
  private[ops] def rbspBytes(bytes: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    var n = 0
    var i = 0
    while (i < len) {
      val b = bytes(off + i)
      if (b == 3 && n >= 2 && out(n - 1) == 0 && out(n - 2) == 0 &&
          i + 1 < len && (bytes(off + i + 1) & 0xff) <= 3) {
        // skip the emulation byte itself
      } else {
        out(n) = b; n += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** MSB-first bit reader with ue(v)/se(v) Exp-Golomb (H.264 §9.1). Reads
    * past-the-end throw; callers catch and degrade per-clip.
    */
  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    def u1(): Int = {
      val b = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        require(zeros <= 31, "ue(v) too long")
      }
      (1 << zeros) - 1 + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  private[ops] final case class SpsInfo(profile: Int, level: Int,
      width: Int, height: Int)

  /** SPS parse (H.264 §7.3.2.1.1) → profile, level, luma frame dims with
    * cropping applied. High-profile chroma/bit-depth branches handled;
    * scaling matrices are skipped structurally (4×4 and 8×8 lists,
    * §7.3.2.1.1.1). `rbsp` excludes the NAL header byte.
    */
  private[ops] def parseSps(rbsp: Array[Byte]): SpsInfo = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint_set flags + reserved
    val level = r.u(8)
    r.ue() // seq_parameter_set_id
    var chromaFormatIdc = 1
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profile)) {
      chromaFormatIdc = r.ue()
      if (chromaFormatIdc == 3) r.u1() // separate_colour_plane_flag
      r.ue(); r.ue() // bit_depth_luma/chroma _minus8
      r.u1() // qpprime_y_zero_transform_bypass_flag
      if (r.u1() == 1) { // seq_scaling_matrix_present_flag
        val lists = if (chromaFormatIdc == 3) 12 else 8
        var i = 0
        while (i < lists) {
          if (r.u1() == 1) { // seq_scaling_list_present_flag[i]
            val size = if (i < 6) 16 else 64
            var lastScale = 8
            var nextScale = 8
            var j = 0
            while (j < size && nextScale != 0) {
              nextScale = (lastScale + r.se() + 256) % 256
              if (nextScale != 0) lastScale = nextScale
              j += 1
            }
          }
          i += 1
        }
      }
    }
    r.ue() // log2_max_frame_num_minus4
    r.ue() match { // pic_order_cnt_type
      case 0 => r.ue()
      case 1 =>
        r.u1(); r.se(); r.se()
        val n = r.ue()
        var i = 0
        while (i < n) { r.se(); i += 1 }
      case _ => ()
    }
    r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num_value_allowed_flag
    val widthMbs = r.ue() + 1
    val heightMapUnits = r.ue() + 1
    val frameMbsOnly = r.u1()
    if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field_flag
    r.u1() // direct_8x8_inference_flag
    var w = widthMbs * 16
    var h = heightMapUnits * 16 * (2 - frameMbsOnly)
    if (r.u1() == 1) { // frame_cropping_flag
      val (cl, cr, ct, cb) = (r.ue(), r.ue(), r.ue(), r.ue())
      val (ux, uy) = chromaFormatIdc match {
        case 0 => (1, 2 - frameMbsOnly)
        case 1 => (2, 2 * (2 - frameMbsOnly))
        case 2 => (2, 2 - frameMbsOnly)
        case _ => (1, 2 - frameMbsOnly)
      }
      w -= (cl + cr) * ux
      h -= (ct + cb) * uy
    }
    SpsInfo(profile, level, w, h)
  }

  private val nalCols = Seq(
    StructField("nal_idx", IntegerType),
    StructField("nal_type", IntegerType),
    StructField("nal_ref_idc", IntegerType),
    StructField("nal_offset", IntegerType),
    StructField("nal_size", IntegerType),
    StructField("is_idr", BooleanType),
    StructField("parse_error", StringType))

  /** One row per NAL unit of an Annex-B H.264 payload: index, type,
    * ref_idc, byte span, IDR flag. Keyframe sampling at corpus scale is
    * `parseH264Nals(df).where(col("is_idr"))` — the sync points a seek
    * or a frame-sampling decode starts from, found WITHOUT decoding.
    */
  def parseH264Nals(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    Multimodal.requireFreshColumns(df, "parseH264Nals", nalCols.map(_.name))
    val schema = StructType(df.schema.fields ++ nalCols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val errRow = (msg: String) =>
          Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null, msg)))
        if (r.isNullAt(idx)) errRow("null payload")
        else {
          val bytes = r.getAs[Array[Byte]](idx)
          val nals = findNals(bytes)
          if (nals == null) errRow("no Annex-B start code")
          else nals.zipWithIndex.map { case ((off, len), i) =>
            val hdr = bytes(off) & 0xff
            val tpe = hdr & 0x1f
            Row.fromSeq(r.toSeq ++ Seq(i, tpe, (hdr >> 5) & 3, off, len,
              tpe == 5, null))
          }
        }
      }
    }(enc)
  }

  private val metaCols = Seq(
    StructField("h264_profile", IntegerType),
    StructField("h264_level", IntegerType),
    StructField("h264_width", IntegerType),
    StructField("h264_height", IntegerType),
    StructField("nal_count", IntegerType),
    StructField("idr_count", IntegerType),
    StructField("parse_error", StringType))

  /** One row per clip: SPS-derived profile/level/dims plus NAL and IDR
    * counts — the metadata a curation filter (resolution gates, keyframe
    * density) needs, from structure alone. First SPS wins (spec allows
    * several; crawled clips virtually always carry one).
    */
  def h264ClipMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    Multimodal.requireFreshColumns(df, "h264ClipMeta", metaCols.map(_.name))
    val schema = StructType(df.schema.fields ++ metaCols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        def errRow(msg: String) =
          Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null, msg))
        if (r.isNullAt(idx)) errRow("null payload")
        else {
          val bytes = r.getAs[Array[Byte]](idx)
          val nals = findNals(bytes)
          if (nals == null) errRow("no Annex-B start code")
          else {
            var idr = 0
            var sps: SpsInfo = null
            var spsErr: String = null
            nals.foreach { case (off, len) =>
              val tpe = bytes(off) & 0x1f
              if (tpe == 5) idr += 1
              if (tpe == 7 && sps == null)
                try sps = parseSps(rbspBytes(bytes, off + 1, len - 1))
                catch { case e: Exception =>
                  spsErr = s"sps parse failed: ${e.getClass.getSimpleName}" }
            }
            if (sps != null)
              Row.fromSeq(r.toSeq ++ Seq(sps.profile, sps.level, sps.width,
                sps.height, nals.length, idr, null))
            else
              Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, nals.length,
                idr, if (spsErr != null) spsErr else "no SPS in stream"))
          }
        }
      }
    }(enc)
  }

  /** MSB-first bit writer with Exp-Golomb, for the synthetic fixture
    * generator (and any test that needs a valid SPS). Emulation
    * prevention applied at [[toAnnexB]] payload emission.
    */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def ue(k: Int): Unit = {
      val zeros = 31 - Integer.numberOfLeadingZeros(k + 1)
      u(0, zeros)
      u(k + 1, zeros + 1)
    }
    def rbspTrailing(): Unit = {
      u(1, 1)
      if (nbits != 0) u(0, 8 - nbits)
    }
    def bytes: Array[Byte] = buf.toArray
  }

  /** Baseline-profile SPS RBSP for the synthetic clips: fixed small
    * fields (poc_type 2, one ref frame, no cropping, no VUI), dims from
    * macroblock counts.
    */
  private def syntheticSpsRbsp(mbw: Int, mbh: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(66, 8) // profile_idc: Baseline
    w.u(0, 8) // constraint flags
    w.u(30, 8) // level_idc 3.0
    w.ue(0) // seq_parameter_set_id
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(2) // pic_order_cnt_type
    w.ue(1) // max_num_ref_frames
    w.u(1, 1) // gaps_in_frame_num_value_allowed_flag
    w.ue(mbw - 1)
    w.ue(mbh - 1)
    w.u(1, 1) // frame_mbs_only_flag
    w.u(1, 1) // direct_8x8_inference_flag
    w.u(0, 1) // frame_cropping_flag
    w.u(0, 1) // vui_parameters_present_flag
    w.rbspTrailing()
    w.bytes
  }

  /** RBSP → NAL payload with emulation_prevention_three_byte insertion
    * (00 00 followed by a byte ≤ 3 gets 03 interposed).
    */
  private[ops] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    rbsp.foreach { b =>
      if (out.length >= 2 && out(out.length - 1) == 0 &&
          out(out.length - 2) == 0 && (b & 0xff) <= 3) out += 3
      out += b
    }
    out.toArray
  }

  /** Deterministic synthetic Annex-B H.264 stream: 4-byte start code +
    * SPS, then 3-byte start codes + PPS and `nFrames` slice NALs (IDR
    * every `idrPeriod`-th, non-IDR otherwise). Slice bodies are opaque
    * high-bit bytes (never 00, so no start-code aliasing and no
    * emulation bytes — the oracle's size arithmetic stays closed-form);
    * slice f's body length is 8 + (seed + f) % 16.
    */
  val syntheticAnnexB: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((mbw: Int, mbh: Int, nFrames: Int, idrPeriod: Int, seed: Int) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def startCode(four: Boolean): Unit = {
        if (four) out += 0
        out += 0; out += 0; out += 1
      }
      def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
        out += ((refIdc << 5) | tpe).toByte
        out ++= escapeRbsp(rbsp)
      }
      startCode(four = true)
      nal(3, 7, syntheticSpsRbsp(mbw, mbh))
      startCode(four = false)
      nal(3, 8, Array[Byte](0x68, 0x70, 0x71, 0x72).map(b => (b | 0x40).toByte))
      var f = 0
      while (f < nFrames) {
        startCode(four = false)
        val len = 8 + (seed + f) % 16
        val body = Array.tabulate(len)(j => (0x80 | ((seed * 31 + f * 7 + j) & 0x7f)).toByte)
        if (f % idrPeriod == 0) nal(3, 5, body) else nal(2, 1, body)
        f += 1
      }
      out.toArray
    })
}
