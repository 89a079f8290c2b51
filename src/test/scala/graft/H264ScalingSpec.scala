package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-transmitted scaling lists (§7.3.2.1.1.1 / §8.5.9): lists that
  * arrive IN the stream decode (they are data, not recalled spec
  * numbers); every fall-back path that lands on the spec's
  * Default_4x4_Intra table refuses by name. Pixel anchors are
  * hand-derived: at QP 28 (m = 4, normAdjust class 0 = 16) a lone
  * Intra16x16 DC coefficient c dequants to (c·w00·16 + 2) >> 2 and the
  * DC-only IDCT adds ((dq + 32) >> 6) per pixel over a 128 DC
  * prediction — w00 = 16 gives 128 + c exactly (the fixture law),
  * w00 = 32 gives 128 + 2c exactly.
  */
class H264ScalingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val flat = Array.fill(16)(16)

  /** CAVLC PPS (QP 28, deblock control) + §7.3.2.2 extension carrying
    * pic_scaling_matrix: list 0 transmitted (`list0`), explicitly
    * use-default (`useDefault0`), or absent (both null/false).
    */
  private def ppsScalingRbsp(list0: Array[Int],
      useDefault0: Boolean = false): Array[Byte] = {
    val w = new VideoBitstream.BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.u(0, 1) // entropy_coding_mode_flag: CAVLC
    w.u(0, 1) // bottom_field_pic_order_in_frame_present_flag
    w.ue(0) // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx defaults
    w.u(0, 1); w.u(0, 2) // weighted_pred, weighted_bipred
    w.se(2) // pic_init_qp_minus26 → QP 28
    w.se(0); w.se(0) // init_qs, chroma_qp_offset
    w.u(1, 1) // deblocking_filter_control_present_flag
    w.u(0, 1); w.u(0, 1) // constrained_intra, redundant_pic_cnt
    w.u(0, 1) // transform_8x8_mode_flag
    w.u(1, 1) // pic_scaling_matrix_present_flag
    if (useDefault0) {
      w.u(1, 1)
      w.se(-8) // delta_scale: nextScale 0 at j=0 → UseDefaultScalingMatrix
    } else if (list0 != null) {
      w.u(1, 1)
      var last = 8
      for (v <- list0) { w.se(((v - last) + 256 + 128) % 256 - 128); last = v }
    } else w.u(0, 1) // list 0 absent → fall-back rule B
    for (_ <- 1 until 6) w.u(0, 1) // lists 1..5 absent
    w.se(0) // second_chroma_qp_index_offset
    w.rbspTrailing()
    w.bytes
  }

  /** 1×1-MB IDR I-slice: mb_type 3 (Intra_16x16, DC pred, cbp 0), one
    * DC coefficient `c` — every luma pixel lands at the hand-derived
    * 128 + ((((c·w00·16 + 2) >> 2) + 32) >> 6).
    */
  private def i16DcSlice(c: Int): Array[Byte] = {
    val w = new VideoBitstream.BitWriter
    w.ue(0); w.ue(7); w.ue(0) // first_mb, slice_type I, pps id
    w.u(0, 4) // frame_num
    w.ue(0) // idr_pic_id
    w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking
    w.se(0) // slice_qp_delta
    w.ue(1) // disable_deblocking_filter_idc = 1 (filter off)
    w.ue(3); w.ue(0); w.se(0) // mb_type 3, chroma pred DC, qp_delta 0
    val dc = new Array[Int](16); dc(0) = c
    Cavlc.encodeResidualBlock(w, dc, 0, 16)
    w.rbspTrailing()
    w.bytes
  }

  private def decode(spsList0: Array[Int], c: Int,
      ppsRbsp: Array[Byte] = H264Decode.cavlcPpsRbsp): Either[String, Array[Byte]] =
    H264Decode.decodeISlice(i16DcSlice(c),
      VideoBitstream.parseSps(
        VideoBitstream.syntheticHighSpsRbsp(1, 1, spsList0)),
      H264Decode.parsePps(ppsRbsp))

  test("parseSps retains the transmitted Sl_4x4_Intra_Y; absent list " +
      "flags the default-table demand; baseline SPS stays matrix-free") {
    val list = Array(16, 18, 20, 22, 24, 26, 28, 30, 17, 19, 21, 23, 25,
      27, 29, 31)
    val sps = VideoBitstream.parseSps(
      VideoBitstream.syntheticHighSpsRbsp(2, 2, list))
    assert(sps.profile == 100 && sps.scalingMatrixPresent)
    assert(sps.lumaIntra4x4List.sameElements(list))
    assert(!sps.lumaIntra4x4Default)
    assert(sps.width == 32 && sps.height == 32)
    val spsDef = VideoBitstream.parseSps(
      VideoBitstream.syntheticHighSpsRbsp(2, 2, null))
    assert(spsDef.scalingMatrixPresent && spsDef.lumaIntra4x4Default)
    val base = VideoBitstream.parseSps(VideoBitstream.syntheticSpsRbsp(2, 2))
    assert(!base.scalingMatrixPresent && base.lumaIntra4x4List == null)
  }

  test("resolveLumaIntraWeights: all fall-back rules, refusals name " +
      "Default_4x4_Intra") {
    def sps(l: Array[Int]) = VideoBitstream.parseSps(
      VideoBitstream.syntheticHighSpsRbsp(1, 1, l))
    val baseSps = VideoBitstream.parseSps(VideoBitstream.syntheticSpsRbsp(1, 1))
    def pps(r: Array[Byte]) = H264Decode.parsePps(r)
    val plain = pps(H264Decode.cavlcPpsRbsp)
    val zig = Array(20, 16, 16, 16, 16, 16, 16, 16, 16, 16, 16, 16, 16, 16,
      16, 16)
    // no matrices anywhere → flat
    assert(H264Decode.resolveLumaIntraWeights(baseSps, plain)
      .toOption.get.sameElements(flat))
    // SPS transmitted → zigzag→raster mapping (zig position k → raster
    // Zigzag4x4(k); position 0 is raster 0)
    val w1 = H264Decode.resolveLumaIntraWeights(sps(zig), plain).toOption.get
    assert(w1(0) == 20 && w1.count(_ == 16) == 15)
    // SPS demands the default → refusal names the table
    val r1 = H264Decode.resolveLumaIntraWeights(sps(null), plain)
    assert(r1.swap.toOption.get.contains("Default_4x4_Intra"))
    // PPS transmitted overrides the SPS
    val w2 = H264Decode.resolveLumaIntraWeights(sps(zig),
      pps(ppsScalingRbsp(Array.fill(16)(24)))).toOption.get
    assert(w2.forall(_ == 24))
    // PPS matrix present, list absent, SPS present → SPS list (rule B)
    val w3 = H264Decode.resolveLumaIntraWeights(sps(zig),
      pps(ppsScalingRbsp(null))).toOption.get
    assert(w3(0) == 20)
    // PPS absent + SPS matrix-free → default demanded → refusal
    assert(H264Decode.resolveLumaIntraWeights(baseSps,
      pps(ppsScalingRbsp(null))).isLeft)
    // PPS explicit use-default → refusal
    assert(H264Decode.resolveLumaIntraWeights(sps(zig),
      pps(ppsScalingRbsp(null, useDefault0 = true))).isLeft)
  }

  test("hand-derived pixels: w00 16 → 128 + c, w00 32 → 128 + 2c; AC " +
      "weights untouched by a DC-only block") {
    val c = 8
    val p16 = decode(flat, c).toOption.get
    assert(p16.forall(_ == (128 + c).toByte), "w00=16 must equal flat law")
    val list32 = flat.clone(); list32(0) = 32
    val p32 = decode(list32, c).toOption.get
    assert(p32.forall(_ == (128 + 2 * c).toByte),
      s"w00=32 must double the DC residual (got ${p32(0) & 0xff})")
    // all-32 list: same DC-only result (AC positions carry no coeffs)
    val pAll32 = decode(Array.fill(16)(32), c).toOption.get
    assert(pAll32.sameElements(p32))
  }

  test("e2e: swapping the fixture stream's SPS for a High-profile " +
      "all-16 list decodes byte-identically through decodeIdr") {
    val stream = Seq(Tuple1(0L)).toDF("doc_id").select(
      H264Decode.syntheticCavlcI16AnnexB(lit(7), lit(false), lit(4))
        .as("payload")).collect()(0).getAs[Array[Byte]]("payload")
    def swapSps(spsList0: Array[Int]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      VideoBitstream.findNals(stream).foreach { case (off, len) =>
        out ++= Array[Byte](0, 0, 1)
        if ((stream(off) & 0x1f) == 7) {
          out += stream(off)
          out ++= VideoBitstream.escapeRbsp(
            VideoBitstream.syntheticHighSpsRbsp(2, 2, spsList0))
        } else out ++= stream.slice(off, off + len)
      }
      out.toArray
    }
    val df = Seq((0L, stream), (1L, swapSps(flat))).toDF("doc_id", "payload")
    val rows = H264Decode.decodeIdr(df, "payload").collect()
      .sortBy(_.getAs[Long]("doc_id"))
    assert(rows.forall(_.getAs[String]("decode_error") == null))
    assert(java.util.Arrays.equals(
      rows(0).getAs[Array[Byte]]("luma_plane"),
      rows(1).getAs[Array[Byte]]("luma_plane")),
      "all-16 transmitted list must decode identically to flat")
    // and the default-demanding SPS refuses BY NAME through the op
    val err = H264Decode.decodeIdr(
      Seq(Tuple1(swapSps(null))).toDF("payload"), "payload")
      .collect()(0).getAs[String]("decode_error")
    assert(err != null && err.contains("Default_4x4_Intra"), s"got: $err")
  }
}
