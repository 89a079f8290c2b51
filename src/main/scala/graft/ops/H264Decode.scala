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
  * Two entry points, both narrow per-partition maps (one clip's bytes
  * plus one decoded plane in memory per task, no shuffle, per-clip/
  * per-sample error degradation):
  *   - [[decodeIPcmIdr]]: Annex-B streams (start-code delimited) —
  *     decode the first IDR.
  *   - [[decodeMp4KeyframesIPcm]]: MP4 clips — SPS/PPS from the avcC
  *     decoder record, keyframes located by the stss/stsc/stco/stsz
  *     tables, each sync sample's length-prefixed NALs decoded. This is
  *     the promised 100 TB shape end-to-end: the byte-range table says
  *     where the keyframes are, and ONLY those bytes are decoded.
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

  /** The slice-level decode core both entry points share: refuse
    * unsupported shapes BY NAME, parse the IDR slice header (§7.3.3,
    * incl. dec_ref_pic_marking) and the slice_data() macroblock walk,
    * and reconstruct the luma plane from I_PCM raw samples. Chroma
    * samples are consumed (the bit walk must advance past them) but only
    * luma is reconstructed — gates and perceptual hashes read luma.
    */
  private[ops] def decodeIPcmSlice(sliceRbsp: Array[Byte],
      sps: VideoBitstream.SpsInfo, pps: PpsInfo,
      maxPlaneBytes: Long = Archives.MaxInflatedBytes): Either[String, Array[Byte]] = {
    // every refusal below happens BEFORE the plane allocation: the SPS
    // dims and the slice payload are UNTRUSTED crawl bytes, and an OOM
    // from a crafted 46000×46000 claim kills the executor JVM — the one
    // failure per-clip degradation cannot catch (same decompression-bomb
    // class Archives caps before allocating)
    val mbw = sps.widthMbs
    val mbh = sps.heightMbs
    val nMbs = mbw.toLong * mbh
    // an I_PCM macroblock carries >= 256 raw luma bytes (+128 chroma for
    // 4:2:0) — a slice too short to plausibly hold them can never decode,
    // so a tiny payload must not size an allocation off the SPS claim
    val minPcmPerMb = if (sps.chromaFormatIdc == 1) 384L else 256L
    if (pps.entropyCabac)
      Left("CABAC stream (decodeStub seam: entropy decode)")
    else if (pps.numSliceGroups > 1) Left("FMO not supported")
    else if (sps.frameMbsOnly != 1) Left("interlaced stream not supported")
    else if (sps.chromaFormatIdc > 1)
      Left("chroma format beyond 4:2:0 not supported")
    else if (sps.bitDepthLuma != 8 || sps.bitDepthChroma != 8)
      // I_PCM samples are BitDepth bits wide (§7.3.5): a fixed-8-bit walk
      // over a 10-bit stream mis-aligns and can return a WRONG plane with
      // decode_error null — refuse by name like the other shapes
      Left(s"bit depth ${sps.bitDepthLuma}/${sps.bitDepthChroma} " +
        "not supported (only 8-bit)")
    else if (sps.pocType == 1)
      // §7.3.3 puts delta_pic_order_cnt se(v) fields in the slice header
      // when delta_pic_order_always_zero_flag is 0 — a flag this parse
      // does not retain, so a silent bit-shift would corrupt everything
      // after it: refuse by name instead
      Left("pic_order_cnt_type 1 not supported")
    else if (nMbs * 256L > maxPlaneBytes)
      Left(s"luma plane too large (${mbw * 16}x${mbh * 16} = " +
        s"${nMbs * 256L} bytes > $maxPlaneBytes plane cap)")
    else if (nMbs * 256L > (1L << 20) && sliceRbsp.length < nMbs * minPcmPerMb)
      // gated to >1 MiB claims: small planes allocate harmlessly and keep
      // the precise per-macroblock refusals (an entropy-coded slice is
      // ALSO shorter than nMbs I_PCM macroblocks — it should still say
      // "entropy-coded", not "too small"); a big claim must be backed by
      // bytes before it sizes an allocation
      Left(s"slice payload too small (${sliceRbsp.length} bytes) to hold " +
        s"$nMbs I_PCM macroblocks (>= ${nMbs * minPcmPerMb} bytes)")
    else {
      val w = mbw * 16
      val h = mbh * 16
      val luma = new Array[Byte](w * h)
      val rd = new VideoBitstream.BitReader(sliceRbsp)
      // slice_header (§7.3.3), IDR/I, no FMO, frame_mbs_only
      val firstMb = rd.ue()
      val sliceType = rd.ue()
      if (firstMb != 0) Left("multi-slice IDR not supported")
      else if (sliceType % 5 != 2)
        Left(s"not an I slice (slice_type $sliceType)")
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
        if (bad != null) Left(bad) else Right(luma)
      }
    }
  }

  private def lumaRow(r: Row, luma: Array[Byte], w: Int, h: Int,
      prefix: Seq[Any] = Seq.empty): Row = {
    var sum = 0L
    var i = 0
    while (i < luma.length) { sum += luma(i) & 0xff; i += 1 }
    Row.fromSeq(r.toSeq ++ prefix ++ Seq(w, h, (w / 16) * (h / 16),
      sum.toDouble / (w.toLong * h), luma, null))
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
    */
  def decodeIPcmIdr(df: DataFrame, payloadCol: String = "payload",
      maxPlaneBytes: Long = Archives.MaxInflatedBytes): DataFrame = {
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
            else decodeIPcmSlice(idr, sps, pps, maxPlaneBytes) match {
              case Left(msg) => errRow(msg)
              case Right(luma) =>
                lumaRow(r, luma, sps.widthMbs * 16, sps.heightMbs * 16)
            }
          }
        } catch { case e: Exception =>
          errRow(s"decode failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  private val mp4Cols =
    StructField("sample_idx", IntegerType) +: cols

  /** Decode EVERY keyframe of an MP4 clip through the structure tables —
    * the "fetch and decode only keyframes" pipeline end-to-end: SPS/PPS
    * come from the avcC decoder record, sync samples are located by
    * stss×stsc×stco×stsz (the same walk as
    * [[VideoBitstream.mp4SyncSamples]]), and each sync sample's
    * length-prefixed NALs are walked for the IDR slice, decoded by the
    * shared I_PCM core. One row per sync sample (1-based `sample_idx`);
    * a sample that fails decodes to its own error row, siblings survive;
    * clip-level failures (no video track, no avcC) yield one error row.
    */
  def decodeMp4KeyframesIPcm(df: DataFrame, payloadCol: String = "payload",
      maxPlaneBytes: Long = Archives.MaxInflatedBytes): DataFrame = {
    Multimodal.requireFreshColumns(df, "decodeMp4KeyframesIPcm", mp4Cols.map(_.name))
    val schema = StructType(df.schema.fields ++ mp4Cols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        def errRow(msg: String) = Seq(Row.fromSeq(r.toSeq ++
          Seq(null, null, null, null, null, null, msg)))
        if (r.isNullAt(idx)) errRow("null payload")
        else try {
          val bytes = r.getAs[Array[Byte]](idx)
          val (sawMoov, video) = VideoBitstream.firstVideoTrack(bytes)
          video match {
            case None =>
              errRow(if (sawMoov) "no video track" else "not ISO-BMFF (no moov box)")
            case Some(t) if t.avcC.isEmpty =>
              errRow("no avcC decoder record (not AVC, or codec unsupported)")
            case Some(t) if t.sizes.isEmpty || t.chunkOffsets.isEmpty =>
              errRow("incomplete sample tables")
            case Some(t) =>
              val c = t.avcC.get
              if (c.length < 8) errRow("truncated avcC record")
              else {
                val lengthSize = (c(4) & 3) + 1
                // avcC: 0xE0|numSPS at [5], then (len16, sps)*, u8 numPPS,
                // then (len16, pps)* — stored sets INCLUDE the NAL header
                var p = 6
                var sps: VideoBitstream.SpsInfo = null
                var pps: PpsInfo = null
                val nSps = c(5) & 0x1f
                var i = 0
                while (i < nSps && p + 2 <= c.length) {
                  val len = ((c(p) & 0xff) << 8) | (c(p + 1) & 0xff)
                  // len > 0: a zero-length entry would hand rbspBytes a
                  // negative size (NegativeArraySizeException through the
                  // generic catch) instead of the named refusal below
                  if (sps == null && len > 0 && p + 2 + len <= c.length)
                    sps = VideoBitstream.parseSps(
                      VideoBitstream.rbspBytes(c, p + 3, len - 1))
                  p += 2 + len
                  i += 1
                }
                val nPps = if (p < c.length) c(p) & 0xff else 0
                p += 1
                i = 0
                while (i < nPps && p + 2 <= c.length) {
                  val len = ((c(p) & 0xff) << 8) | (c(p + 1) & 0xff)
                  if (pps == null && len > 0 && p + 2 + len <= c.length)
                    pps = parsePps(VideoBitstream.rbspBytes(c, p + 3, len - 1))
                  p += 2 + len
                  i += 1
                }
                if (sps == null) errRow("no SPS in avcC record")
                else {
                  // a clip whose stss matches NO sample (entry count 0, or
                  // listed numbers beyond stsz) must surface as a named
                  // row, not silently vanish from the output — every other
                  // failure mode here degrades by name
                  val syncIdxs = t.sizes.indices.filter(k =>
                    !t.hasStss || t.syncs.contains((k + 1).toLong))
                  if (pps == null) errRow("no PPS in avcC record")
                  else if (syncIdxs.isEmpty) errRow("no sync samples in clip")
                  else {
                  val (offs, covered) = VideoBitstream.sampleOffsets(t)
                  if (covered < t.sizes.length) errRow("incomplete sample tables")
                  else syncIdxs.flatMap { k =>
                    {
                      def sampleErr(msg: String) = Seq(Row.fromSeq(r.toSeq ++
                        Seq(k + 1, null, null, null, null, null, msg)))
                      try {
                        // walk the sample's length-prefixed NALs for the IDR
                        var o = offs(k)
                        val end = offs(k) + t.sizes(k)
                        var idr: Array[Byte] = null
                        while (idr == null && o + lengthSize <= end) {
                          var len = 0L
                          var j = 0
                          while (j < lengthSize) {
                            len = (len << 8) | (bytes(o.toInt + j) & 0xffL)
                            j += 1
                          }
                          val ns = o + lengthSize
                          if (len <= 0 || ns + len > end) o = end // corrupt: stop
                          else {
                            if ((bytes(ns.toInt) & 0x1f) == 5)
                              idr = VideoBitstream.rbspBytes(
                                bytes, ns.toInt + 1, len.toInt - 1)
                            o = ns + len
                          }
                        }
                        if (idr == null) sampleErr("no IDR NAL in sync sample")
                        else decodeIPcmSlice(idr, sps, pps, maxPlaneBytes) match {
                          case Left(msg) => sampleErr(msg)
                          case Right(luma) => Seq(lumaRow(r, luma,
                            sps.widthMbs * 16, sps.heightMbs * 16,
                            prefix = Seq(k + 1)))
                        }
                      } catch { case e: Exception =>
                        sampleErr(s"decode failed: ${e.getClass.getSimpleName}")
                      }
                    }
                  }
                  }
                }
              }
          }
        } catch { case e: Exception =>
          errRow(s"container parse failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  /** A REAL PPS RBSP (CAVLC, no FMO, no deblock fields) shared by the
    * synthetic generators. */
  private def realPpsRbsp: Array[Byte] = {
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

  /** An IDR slice RBSP made entirely of I_PCM macroblocks whose luma is
    * the horizontal gradient (base + slope·x) mod 256; chroma constant
    * 128. Shared by both synthetic generators.
    */
  private def ipcmSliceRbsp(mbw: Int, mbh: Int, base: Int, slope: Int): Array[Byte] = {
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

  /** Deterministic I_PCM IDR clip: SPS (the shared synthetic baseline
    * SPS) + a REAL PPS + one IDR slice made entirely of I_PCM
    * macroblocks whose luma is a HORIZONTAL GRADIENT — pixel (x, y) =
    * (base + slope·x) mod 256, constant down each column, the same
    * closed form as the PNG-gradient fixtures, so decoded planes feed
    * the perceptual-hash oracles directly. Chroma is the constant 128.
    * Emulation prevention is REAL here (gradients hit 00 00 runs), so
    * the escape/unescape round-trip is exercised.
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
        nal(3, 8, realPpsRbsp)
        nal(3, 5, ipcmSliceRbsp(mbw, mbh, base, slope))
        out.toArray
      })

  /** Deterministic I_PCM MP4: the [[VideoBitstream.syntheticMp4]] layout
    * (mdat first, one chunk, stss every `syncPeriod`-th sample,
    * timescale 512 / delta 128) but the avcC carries a REAL PPS next to
    * the real SPS, and mdat samples are 4-byte-length-prefixed NALs —
    * sync sample k holds a REAL I_PCM IDR whose gradient base is
    * `base + 11k` (each keyframe decodes to a different plane),
    * non-sync samples hold an opaque non-IDR NAL. stsz records the
    * actual NAL byte lengths, so the whole table is self-consistent and
    * [[decodeMp4KeyframesIPcm]]'s output is closed-form in
    * (mbw, mbh, base, slope, k).
    */
  val syntheticIPcmMp4: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (mbw: Int, mbh: Int, nSamples: Int, syncPeriod: Int, base: Int, slope: Int) => {
        // build each sample's bytes first: stsz needs the real lengths
        val samples = Array.tabulate(nSamples) { k =>
          val bos = new java.io.ByteArrayOutputStream()
          def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
            val payload = VideoBitstream.escapeRbsp(rbsp)
            val len = payload.length + 1
            bos.write((len >> 24) & 0xff); bos.write((len >> 16) & 0xff)
            bos.write((len >> 8) & 0xff); bos.write(len & 0xff)
            bos.write((refIdc << 5) | tpe)
            bos.write(payload, 0, payload.length)
          }
          if (k % syncPeriod == 0)
            nal(3, 5, ipcmSliceRbsp(mbw, mbh, (base + 11 * k) % 256, slope))
          else
            nal(2, 1, Array.tabulate(8 + k % 8)(j => (0x80 | (k + j)).toByte))
          bos.toByteArray
        }
        val w = new VideoBitstream.BoxWriter
        w.box("ftyp") { b => b.str("isom"); b.u32(0L); b.str("avc1") }
        w.box("mdat") { b => samples.foreach(b.bytes) }
        val mdatPayloadOff = 28L // ftyp 20 + mdat header 8
        w.box("moov") { m =>
          m.box("mvhd") { b =>
            b.u32(0L); b.u32(0L); b.u32(0L)
            b.u32(512L); b.u32(nSamples * 128L)
            b.u32(0x00010000L); b.u16(0x0100); b.u16(0)
            (0 until 2).foreach(_ => b.u32(0L))
            Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
              .foreach(b.u32)
            (0 until 6).foreach(_ => b.u32(0L))
            b.u32(2L)
          }
          m.box("trak") { t =>
            t.box("tkhd") { b =>
              b.u32(7L); b.u32(0L); b.u32(0L); b.u32(1L); b.u32(0L)
              b.u32(nSamples * 128L)
              (0 until 2).foreach(_ => b.u32(0L))
              b.u16(0); b.u16(0); b.u16(0); b.u16(0)
              Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
                .foreach(b.u32)
              b.u32((mbw * 16L) << 16); b.u32((mbh * 16L) << 16)
            }
            t.box("mdia") { md =>
              md.box("mdhd") { b =>
                b.u32(0L); b.u32(0L); b.u32(0L)
                b.u32(512L); b.u32(nSamples * 128L)
                b.u16(0x55c4); b.u16(0)
              }
              md.box("hdlr") { b =>
                b.u32(0L); b.u32(0L); b.str("vide")
                b.u32(0L); b.u32(0L); b.u32(0L); b.u8(0)
              }
              md.box("minf") { mi =>
                mi.box("stbl") { st =>
                  st.box("stsd") { b =>
                    b.u32(0L); b.u32(1L)
                    b.box("avc1") { e =>
                      (0 until 6).foreach(_ => e.u8(0)); e.u16(1)
                      (0 until 4).foreach(_ => e.u32(0L))
                      e.u16(mbw * 16); e.u16(mbh * 16)
                      e.u32(0x00480000L); e.u32(0x00480000L); e.u32(0L)
                      e.u16(1)
                      (0 until 32).foreach(_ => e.u8(0))
                      e.u16(24); e.u16(0xffff)
                      e.box("avcC") { c =>
                        val sps = Array[Byte](0x67) ++
                          VideoBitstream.escapeRbsp(
                            VideoBitstream.syntheticSpsRbsp(mbw, mbh))
                        val pps = Array[Byte](0x68) ++
                          VideoBitstream.escapeRbsp(realPpsRbsp)
                        c.u8(1); c.u8(66); c.u8(0); c.u8(30)
                        c.u8(0xff); c.u8(0xe1) // lengthSize 4, numSPS 1
                        c.u16(sps.length); c.bytes(sps)
                        c.u8(1); c.u16(pps.length); c.bytes(pps)
                      }
                    }
                  }
                  st.box("stts") { b =>
                    b.u32(0L); b.u32(1L); b.u32(nSamples.toLong); b.u32(128L)
                  }
                  st.box("stsc") { b =>
                    b.u32(0L); b.u32(1L); b.u32(1L); b.u32(nSamples.toLong); b.u32(1L)
                  }
                  st.box("stsz") { b =>
                    b.u32(0L); b.u32(0L); b.u32(nSamples.toLong)
                    samples.foreach(s => b.u32(s.length.toLong))
                  }
                  st.box("stco") { b => b.u32(0L); b.u32(1L); b.u32(mdatPayloadOff) }
                  st.box("stss") { b =>
                    val ks = (0 until nSamples).filter(_ % syncPeriod == 0)
                    b.u32(0L); b.u32(ks.length.toLong)
                    ks.foreach(k => b.u32(k + 1L))
                  }
                }
              }
            }
          }
        }
        w.out.toByteArray
      })
}
