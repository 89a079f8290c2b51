package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** REAL H.264 pixel decode for the I_PCM subset — the first crack in the
  * [[Multimodal.decodeStub]] codec seam (reference: SDM-RDFizer has zero
  * video handling; this is beyond-reference plumbing). I_PCM macroblocks
  * (ITU-T H.264 §7.3.5 / §8.3.5) carry RAW luma+chroma samples — no
  * entropy decoding, no prediction, no transform — and every conformant
  * stream may contain them, so a decoder for them is true spec surface,
  * not a toy: this op parses the SPS, the PPS, the IDR slice header, and
  * the slice_data() macroblock walk for real (Exp-Golomb throughout,
  * emulation-prevention un-escaping, pcm alignment), and reconstructs
  * the full luma plane. The moment a macroblock is entropy-coded
  * (anything but mb_type 25 in an I slice) the clip degrades with an
  * explicit pointer at the remaining seam — CAVLC/CABAC residual decode
  * stays behind `decodeStub`.
  *
  * Scale shape: narrow per-partition map like every parser in this
  * family — one clip's bytes plus one decoded luma plane in memory per
  * task, no shuffle, per-clip error degradation.
  */
object H264Decode {

  /** The PPS fields an I_PCM IDR decode needs (H.264 §7.3.2.2). */
  private[ops] final case class PpsInfo(entropyCabac: Boolean,
      numSliceGroups: Int, deblockControlPresent: Boolean,
      redundantPicCntPresent: Boolean, bottomFieldPocPresent: Boolean)

  private[ops] def parsePps(rbsp: Array[Byte]): PpsInfo = {
    val r = new VideoBitstream.BitReader(rbsp)
    r.ue() // pic_parameter_set_id
    r.ue() // seq_parameter_set_id
    val cabac = r.u1() == 1
    val bottomPoc = r.u1() == 1
    val sliceGroups = r.ue() + 1
    if (sliceGroups > 1)
      // slice_group_map parsing skipped: the decoder refuses FMO outright,
      // so the remaining fields are never consulted
      PpsInfo(cabac, sliceGroups, deblockControlPresent = false,
        redundantPicCntPresent = false, bottomFieldPocPresent = bottomPoc)
    else {
      r.ue(); r.ue() // num_ref_idx_l0/l1_default_active_minus1
      r.u1() // weighted_pred_flag
      r.u(2) // weighted_bipred_idc
      r.se() // pic_init_qp_minus26
      r.se() // pic_init_qs_minus26
      r.se() // chroma_qp_index_offset
      val deblock = r.u1() == 1
      r.u1() // constrained_intra_pred_flag
      val redundant = r.u1() == 1
      PpsInfo(cabac, sliceGroups, deblock, redundant, bottomPoc)
    }
  }

  private val cols = Seq(
    StructField("frame_width", IntegerType),
    StructField("frame_height", IntegerType),
    StructField("mb_count", IntegerType),
    StructField("y_mean", DoubleType),
    StructField("luma_plane", BinaryType),
    StructField("decode_error", StringType))

  /** Decode the FIRST IDR frame of an Annex-B H.264 payload, supported
    * subset: baseline-style CAVLC streams whose IDR slice is entirely
    * I_PCM macroblocks, frame_mbs_only, 4:2:0 or monochrome, no FMO.
    * Emits the reconstructed luma plane (row-major bytes, uncropped
    * SPS dims), its exact mean, and the macroblock count. Everything
    * else degrades per clip with a message naming WHY (the message for
    * entropy-coded macroblocks names the remaining `decodeStub` seam).
    * Chroma samples are parsed (the bit walk must consume them) but only
    * luma is reconstructed — gates and perceptual hashes read luma.
    */
  def decodeIPcmIdr(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    Multimodal.requireFreshColumns(df, "decodeIPcmIdr", cols.map(_.name))
    val schema = StructType(df.schema.fields ++ cols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        def errRow(msg: String) = Row.fromSeq(r.toSeq ++
          Seq(null, null, null, null, null, msg))
        if (r.isNullAt(idx)) errRow("null payload")
        else try {
          val bytes = r.getAs[Array[Byte]](idx)
          val nals = VideoBitstream.findNals(bytes)
          if (nals == null) errRow("no Annex-B start code")
          else {
            var sps: VideoBitstream.SpsInfo = null
            var pps: PpsInfo = null
            var idr: Array[Byte] = null
            nals.foreach { case (off, len) =>
              (bytes(off) & 0x1f) match {
                case 7 if sps == null =>
                  sps = VideoBitstream.parseSps(
                    VideoBitstream.rbspBytes(bytes, off + 1, len - 1))
                case 8 if pps == null =>
                  pps = parsePps(
                    VideoBitstream.rbspBytes(bytes, off + 1, len - 1))
                case 5 if idr == null =>
                  idr = VideoBitstream.rbspBytes(bytes, off + 1, len - 1)
                case _ => ()
              }
            }
            if (sps == null) errRow("no SPS in stream")
            else if (pps == null) errRow("no PPS in stream")
            else if (idr == null) errRow("no IDR slice in stream")
            else if (pps.entropyCabac)
              errRow("CABAC stream (decodeStub seam: entropy decode)")
            else if (pps.numSliceGroups > 1) errRow("FMO not supported")
            else if (sps.frameMbsOnly != 1)
              errRow("interlaced stream not supported")
            else if (sps.chromaFormatIdc > 1)
              errRow("chroma format beyond 4:2:0 not supported")
            else if (sps.pocType == 1)
              // §7.3.3 puts delta_pic_order_cnt se(v) fields in the slice
              // header when delta_pic_order_always_zero_flag is 0 — a flag
              // this parse does not retain, so a silent bit-shift would
              // corrupt everything after it: refuse by name instead
              errRow("pic_order_cnt_type 1 not supported")
            else {
              val mbw = sps.widthMbs
              val mbh = sps.heightMbs
              val w = mbw * 16
              val h = mbh * 16
              val luma = new Array[Byte](w * h)
              val rd = new VideoBitstream.BitReader(idr)
              // slice_header (§7.3.3), IDR/I, no FMO, frame_mbs_only
              val firstMb = rd.ue()
              val sliceType = rd.ue()
              if (firstMb != 0) errRow("multi-slice IDR not supported")
              else if (sliceType % 5 != 2)
                errRow(s"not an I slice (slice_type $sliceType)")
              else {
                rd.ue() // pic_parameter_set_id
                rd.u(sps.log2MaxFrameNum) // frame_num
                rd.ue() // idr_pic_id
                if (sps.pocType == 0) rd.u(sps.log2MaxPocLsb)
                if (pps.bottomFieldPocPresent && sps.pocType == 0) rd.se()
                if (pps.redundantPicCntPresent) rd.ue()
                // I slice: no ref-idx / pred-weight tables
                // nal_ref_idc != 0 on IDR ⇒ dec_ref_pic_marking (§7.3.3.3)
                rd.u1(); rd.u1() // no_output_of_prior_pics, long_term_ref
                rd.se() // slice_qp_delta
                if (pps.deblockControlPresent) {
                  if (rd.ue() != 1) { rd.se(); rd.se() } // deblock offsets
                }
                // slice_data (§7.3.4), CAVLC I slice: macroblock_layer per MB
                var mb = 0
                val nMbs = mbw * mbh
                var bad: String = null
                while (mb < nMbs && bad == null) {
                  val mbType = rd.ue()
                  if (mbType != 25) // I_PCM
                    bad = s"entropy-coded macroblock (mb_type $mbType) — " +
                      "decodeStub seam: CAVLC residual decode"
                  else {
                    rd.alignByte() // pcm_alignment_zero_bit
                    val mbx = (mb % mbw) * 16
                    val mby = (mb / mbw) * 16
                    var i = 0
                    while (i < 256) {
                      luma((mby + i / 16) * w + mbx + i % 16) = rd.u(8).toByte
                      i += 1
                    }
                    if (sps.chromaFormatIdc == 1) {
                      var c = 0
                      while (c < 128) { rd.u(8); c += 1 } // Cb, Cr consumed
                    }
                    mb += 1
                  }
                }
                if (bad != null) errRow(bad)
                else {
                  var sum = 0L
                  var i = 0
                  while (i < luma.length) { sum += luma(i) & 0xff; i += 1 }
                  Row.fromSeq(r.toSeq ++ Seq(w, h, nMbs,
                    sum.toDouble / (w.toLong * h), luma, null))
                }
              }
            }
          }
        } catch { case e: Exception =>
          errRow(s"decode failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  /** Deterministic I_PCM IDR clip: SPS (the shared synthetic baseline
    * SPS) + a REAL PPS (CAVLC, no FMO, no deblock fields) + one IDR
    * slice made entirely of I_PCM macroblocks whose luma is a HORIZONTAL
    * GRADIENT — pixel (x, y) = (base + slope·x) mod 256, constant down
    * each column, the same closed form as the PNG-gradient fixtures, so
    * decoded planes feed the perceptual-hash oracles directly. Chroma is
    * the constant 128. Emulation prevention is REAL here (gradients hit
    * 00 00 runs), so the escape/unescape round-trip is exercised.
    */
  val syntheticIPcmAnnexB: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (mbw: Int, mbh: Int, base: Int, slope: Int) => {
        val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
        def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
          out += 0; out += 0; out += 0; out += 1
          out += ((refIdc << 5) | tpe).toByte
          out ++= VideoBitstream.escapeRbsp(rbsp)
        }
        nal(3, 7, VideoBitstream.syntheticSpsRbsp(mbw, mbh))
        val pps = {
          val w = new VideoBitstream.BitWriter
          w.ue(0); w.ue(0) // pps id, sps id
          w.u(0, 1) // entropy_coding_mode_flag: CAVLC
          w.u(0, 1) // bottom_field_pic_order_in_frame_present_flag
          w.ue(0) // num_slice_groups_minus1
          w.ue(0); w.ue(0) // num_ref_idx_l0/l1_default_active_minus1
          w.u(0, 1) // weighted_pred_flag
          w.u(0, 2) // weighted_bipred_idc
          w.se(0); w.se(0); w.se(0) // init_qp, init_qs, chroma_qp_offset
          w.u(0, 1) // deblocking_filter_control_present_flag
          w.u(0, 1) // constrained_intra_pred_flag
          w.u(0, 1) // redundant_pic_cnt_present_flag
          w.rbspTrailing()
          w.bytes
        }
        nal(3, 8, pps)
        val slice = {
          val w = new VideoBitstream.BitWriter
          w.ue(0) // first_mb_in_slice
          w.ue(7) // slice_type: I (all slices of the picture are I)
          w.ue(0) // pic_parameter_set_id
          w.u(0, 4) // frame_num (log2_max_frame_num = 4)
          w.ue(0) // idr_pic_id
          w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking for IDR
          w.se(0) // slice_qp_delta
          var mb = 0
          while (mb < mbw * mbh) {
            w.ue(25) // I_PCM
            w.alignByte()
            val mbx = (mb % mbw) * 16
            var i = 0
            while (i < 256) {
              w.u((base + slope * (mbx + i % 16)) % 256, 8)
              i += 1
            }
            var c = 0
            while (c < 128) { w.u(128, 8); c += 1 }
            mb += 1
          }
          w.rbspTrailing()
          w.bytes
        }
        nal(3, 5, slice)
        out.toArray
      })
}
