package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** HEVC / H.265 STRUCTURE census (ITU-T H.265 §7.3) — the third leg of
  * the crawled-video gate family next to the H.264 walk and the WebM
  * census: NAL-unit walk over Annex-B framing (same start-code scan and
  * emulation-prevention unescape as H.264 — [[VideoBitstream]] is
  * reused) plus a REAL SPS parse for the columns a curation pass gates
  * on decode-free: picture dimensions, profile/tier/level, bit depth,
  * chroma format, and the IRAP keyframe census (nal_unit_type 16..23 —
  * BLA/IDR/CRA — is what "fetch only keyframes" keys on for HEVC).
  *
  * Everything here is the spec's own algorithmic syntax (ue(v)/u(n)
  * walks and the fixed 12-byte general profile_tier_level block) — no
  * number tables, so the repo's table policy has nothing to refuse;
  * streams whose SPS needs sub-layer PTL entries or extension parsing
  * beyond the census columns degrade per clip with a named error.
  *
  * Reference scope note: SDM-RDFizer has no media handling; beyond-
  * parity multimodal surface (COVERAGE.md).
  */
object Hevc {

  private[ops] final case class HevcSps(width: Int, height: Int,
      profileIdc: Int, tierFlag: Int, levelIdc: Int, chromaFormatIdc: Int,
      bitDepthLuma: Int, bitDepthChroma: Int)

  /** §7.3.2.2.1 down through bit_depth_chroma_minus8 — the census
    * columns. Returns Left(named) on truncated/extension shapes. */
  private[ops] def parseSps(rbsp: Array[Byte]): Either[String, HevcSps] =
    try {
      val rd = new VideoBitstream.BitReader(rbsp)
      rd.u(4) // sps_video_parameter_set_id
      val maxSubLayersMinus1 = rd.u(3)
      rd.u1() // sps_temporal_id_nesting_flag
      // general profile_tier_level: 2+1+5 bits, 32 compat bits, 4
      // constraint flags, 44 reserved bits, then general_level_idc
      val profileSpace = rd.u(2)
      val tier = rd.u1()
      val profileIdc = rd.u(5)
      rd.u(32) // general_profile_compatibility_flag[0..31]
      rd.u(4) // progressive/interlaced/non_packed/frame_only
      rd.u(22); rd.u(22) // general_reserved_zero_43bits + 1 reserved bit
      val levelIdc = rd.u(8)
      if (profileSpace != 0) return Left("profile space != 0 not supported")
      if (maxSubLayersMinus1 != 0)
        // sub-layer PTL entries would follow; a mis-walk desyncs every
        // field after them — refuse by name instead
        return Left(s"sub-layer PTL (sps_max_sub_layers_minus1 = " +
          s"$maxSubLayersMinus1) not supported")
      rd.ue() // sps_seq_parameter_set_id
      val chromaFormatIdc = rd.ue()
      if (chromaFormatIdc == 3) rd.u1() // separate_colour_plane_flag
      var w = rd.ue()
      var h = rd.ue()
      if (rd.u1() == 1) {
        // conformance window (§7.4.3.2.1): offsets are in CHROMA units —
        // SubWidthC/SubHeightC per chroma_format_idc — and must be
        // APPLIED, or every clip whose dims aren't multiples of the
        // coding block (854x480, 1366x768...) reports the padded coded
        // size while the H.264 leg reports the cropped one
        val subW = if (chromaFormatIdc == 1 || chromaFormatIdc == 2) 2 else 1
        val subH = if (chromaFormatIdc == 1) 2 else 1
        val (l, rr, t, b) = (rd.ue(), rd.ue(), rd.ue(), rd.ue())
        w -= (l + rr) * subW
        h -= (t + b) * subH
      }
      val bdLuma = 8 + rd.ue()
      val bdChroma = 8 + rd.ue()
      if (w <= 0 || h <= 0 || w > 16888 || h > 16888)
        Left(s"implausible SPS dimensions ${w}x$h")
      else Right(HevcSps(w, h, profileIdc, tier, levelIdc,
        chromaFormatIdc, bdLuma, bdChroma))
    } catch {
      case _: Exception => Left("truncated SPS")
    }

  private val cols = Seq(
    StructField("nal_count", IntegerType),
    StructField("irap_count", IntegerType),
    StructField("idr_count", IntegerType),
    StructField("cra_count", IntegerType),
    StructField("has_vps", BooleanType),
    StructField("has_pps", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("profile_idc", IntegerType),
    StructField("tier_flag", IntegerType),
    StructField("level_idc", IntegerType),
    StructField("chroma_format_idc", IntegerType),
    StructField("bit_depth_luma", IntegerType),
    StructField("bit_depth_chroma", IntegerType),
    StructField("parse_error", StringType))

  /** One census row per clip: NAL-type counts (IRAP = types 16..23,
    * IDR = 19/20, CRA = 21) + the first SPS's census fields. Narrow
    * mapPartitions, per-clip degradation, no decode.
    */
  def hevcMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    Multimodal.requireFreshColumns(df, "hevcMeta", cols.map(_.name))
    val schema = StructType(df.schema.fields ++ cols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        def errRow(msg: String) = Row.fromSeq(r.toSeq ++
          (Seq.fill[Any](cols.length - 1)(null) :+ msg))
        if (r.isNullAt(idx)) errRow("null payload")
        else try {
          val bytes = r.getAs[Array[Byte]](idx)
          val nals = VideoBitstream.findNals(bytes)
          if (nals == null || nals.isEmpty) errRow("no Annex-B start code")
          else {
            var irap = 0
            var idr = 0
            var cra = 0
            var hasVps = false
            var hasPps = false
            var sps: Either[String, HevcSps] = Left("no SPS in stream")
            var sawSps = false
            var badHeader = false
            nals.foreach { case (off, len) =>
              // H.265 NAL header is TWO bytes: f(1) type(6) layer(6) tid(3)
              if (len < 2 || (bytes(off) & 0x80) != 0) badHeader = true
              else {
                val t = (bytes(off) & 0x7e) >> 1
                if (t >= 16 && t <= 23) irap += 1
                if (t == 19 || t == 20) idr += 1
                if (t == 21) cra += 1
                if (t == 32) hasVps = true
                if (t == 34) hasPps = true
                if (t == 33 && !sawSps) {
                  sawSps = true
                  sps = parseSps(VideoBitstream.rbspBytes(bytes, off + 2, len - 2))
                }
              }
            }
            if (badHeader) errRow("malformed NAL header (forbidden bit)")
            else sps match {
              case Left(msg) => Row.fromSeq(r.toSeq ++ Seq(
                nals.length, irap, idr, cra, hasVps, hasPps,
                null, null, null, null, null, null, null, null, msg))
              case Right(s) => Row.fromSeq(r.toSeq ++ Seq(
                nals.length, irap, idr, cra, hasVps, hasPps,
                s.width, s.height, s.profileIdc, s.tierFlag, s.levelIdc,
                s.chromaFormatIdc, s.bitDepthLuma, s.bitDepthChroma, null))
            }
          }
        } catch { case e: Exception =>
          errRow(s"census failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  /** Deterministic HEVC Annex-B clip: VPS + a REAL SPS (dims/profile/
    * tier/level/bit-depth from the law, Main profile shape) + PPS +
    * `nIdr` IDR_W_RADL, `nCra` CRA and `nTrail` TRAIL_R NALs with
    * opaque payloads. Emulation prevention is applied, so the unescape
    * path is real.
    */
  val syntheticHevcAnnexB: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (width: Int, height: Int, profileIdc: Int, levelIdc: Int,
          bitDepthMinus8: Int, nIdr: Int, nCra: Int, nTrail: Int) => {
        val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
        def nal(tpe: Int, rbsp: Array[Byte]): Unit = {
          out += 0; out += 0; out += 0; out += 1
          out += ((tpe << 1) & 0x7e).toByte // layer 0 (high 5 bits here)
          out += 1 // layer 0 low bit + temporal_id_plus1 = 1
          out ++= VideoBitstream.escapeRbsp(rbsp)
        }
        val sps = {
          val w = new VideoBitstream.BitWriter
          w.u(0, 4) // vps id
          w.u(0, 3) // max_sub_layers_minus1
          w.u(1, 1) // temporal_id_nesting
          w.u(0, 2); w.u(0, 1); w.u(profileIdc, 5) // space/tier/profile
          w.u(0, 32) // compat flags
          w.u(0xA, 4) // progressive=1, interlaced=0, non_packed=1, frame_only=0
          w.u(0, 22); w.u(0, 22) // reserved 44 bits
          w.u(levelIdc, 8)
          w.ue(0) // sps id
          w.ue(1) // chroma_format_idc 4:2:0
          w.ue(width); w.ue(height)
          w.u(0, 1) // no conformance window
          w.ue(bitDepthMinus8); w.ue(bitDepthMinus8)
          w.ue(4) // log2_max_pic_order_cnt_lsb_minus4
          w.rbspTrailing()
          w.bytes
        }
        nal(32, Array.tabulate(6)(i => (0x40 + i).toByte)) // VPS (opaque)
        nal(33, sps)
        nal(34, Array.tabulate(4)(i => (0x10 + i).toByte)) // PPS (opaque)
        var i = 0
        while (i < nIdr) { nal(19, Array.tabulate(9)(j => (i * 7 + j).toByte)); i += 1 }
        i = 0
        while (i < nCra) { nal(21, Array.tabulate(9)(j => (i * 5 + j).toByte)); i += 1 }
        i = 0
        while (i < nTrail) { nal(1, Array.tabulate(9)(j => (i * 3 + j).toByte)); i += 1 }
        out.toArray
      }).asNondeterministic()
      // ^ optimizer pin, NOT real nondeterminism — the generator is a pure
      // function of its args (values stable; pinned by OptimizationR19Spec).
      // Declared nondeterministic so filter pushdown cannot duplicate the
      // heavy payload expression into every sniffer reference (guide section 4.4).
      // Cost: the payload column is rejected wherever nondeterministic
      // expressions are disallowed (join/group/sort keys) — callers key on
      // doc_id, never on payload bytes.
}
