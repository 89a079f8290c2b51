package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** High-profile Intra_8x8 / transform_8x8 decode: the generated zigzag,
  * the §8.5.9 8×8 dequant table's DERIVATION tripwires (basis-norm
  * ratios + the Qstep row law — the checks that caught a transcription
  * error during development), the §8.5.12.3 inverse transform on
  * closed-form inputs, §8.3.2 filtered-reference prediction, and the
  * end-to-end fixture with its DuckDB-shared quadrant closed form.
  */
class H264Transform8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zigzag generator reproduces the pinned 4x4 scan and yields a " +
      "valid 8x8 permutation with the documented prefix") {
    assert(H264Decode.zigzagScan(4).sameElements(H264Decode.Zigzag4x4))
    val z8 = H264Decode.Zigzag8x8
    assert(z8.sorted.sameElements(0 until 64))
    // Figure 8-9 frame scan prefix (classic diagonal)
    assert(z8.take(10).sameElements(Array(0, 1, 8, 16, 9, 2, 3, 10, 17, 24)))
    assert(z8.last == 63)
  }

  test("normAdjust8x8: the table satisfies the transform-norm laws it " +
      "derives from (Qstep row ratios; basis-norm class ratios)") {
    val qstep = Array(0.625, 0.6875, 0.8125, 0.875, 1.0, 1.125)
    // the m = 4 row is Qstep 1.0: check it against the EXACT 8x8
    // inverse-transform basis norms (A = 8 for rows 0/4, B = 578/64 for
    // odd rows, C = 5 for rows 2/6): V(class)/V(aa) = products of
    // norm ratios, base V(aa) = 32
    val A = 8.0; val B = 578.0 / 64.0; val C = 5.0
    val expect4 = Array(1.0, A / B, A / C, math.sqrt(A / B),
      math.sqrt(A / C), math.sqrt(A * A / (B * C))).map(_ * 32.0)
    for (k <- 0 until 6)
      assert(math.abs(H264Decode.normAdjust8At(4, k) - expect4(k)) <= 0.51,
        s"m=4 class $k: ${H264Decode.normAdjust8At(4, k)} vs ${expect4(k)}")
    // every other row is the m=4 row scaled by Qstep(m)
    for (m <- 0 until 6; k <- 0 until 6)
      assert(math.abs(H264Decode.normAdjust8At(m, k) -
        qstep(m) * H264Decode.normAdjust8At(4, k)) <= 0.75,
        s"m=$m class $k")
    // geometric-mean consistency across classes (ab² ≈ aa·bb etc.)
    for (m <- 0 until 6) {
      val v = (0 until 6).map(H264Decode.normAdjust8At(m, _)).map(_.toDouble)
      assert(math.abs(v(3) * v(3) / (v(0) * v(1)) - 1) < 0.06, s"m=$m ab")
      assert(math.abs(v(4) * v(4) / (v(0) * v(2)) - 1) < 0.06, s"m=$m ac")
      assert(math.abs(v(5) * v(5) / (v(1) * v(2)) - 1) < 0.06, s"m=$m bc")
    }
  }

  test("idct8x8: DC law ((128c+32)>>6 = 2c per pixel) and a single-basis " +
      "row reproduce closed forms") {
    val d = new Array[Int](64)
    d(0) = 128 * 3
    H264Decode.idct8x8(d)
    assert(d.forall(_ == 6), d.take(8).mkString(","))
    // raster position 4 (row 0, col 4) is the ±1 alternating basis:
    // out[y][x] = sign(x) after both passes and the >>6
    val d2 = new Array[Int](64)
    d2(4) = 64
    H264Decode.idct8x8(d2)
    val signs = Array(1, -1, -1, 1, 1, -1, -1, 1)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(d2(y * 8 + x) == signs(x), s"($x,$y)")
  }

  test("dequant8x8: QP-28 flat DC identity and the transmitted-weight " +
      "scale law") {
    // (c·16·32 + 2) >> 2 = 128c at QP 28 (m=4, class 0, weight 16)
    assert(H264Decode.dequant8x8(3, 0, 28, H264Decode.Flat8x8) == 384)
    // doubling w(0,0) doubles the scale exactly
    val w32 = H264Decode.Flat8x8.clone; w32(0) = 32
    assert(H264Decode.dequant8x8(3, 0, 28, w32) == 768)
    // qP ≥ 36 shifts left: qP 40 (m=4) → (c·16·32) << 0? 40/6=6 → <<0
    assert(H264Decode.dequant8x8(1, 0, 40, H264Decode.Flat8x8) == 512)
  }

  test("predictIntra8x8: DC with no neighbours is 128; filtered " +
      "horizontal/vertical reproduce hand-computed reference rows") {
    val w = 16
    val luma = new Array[Byte](16 * 16)
    val p8 = new Array[Int](64)
    // block (0,0): nothing available
    assert(H264Decode.predictIntra8x8(2, 0, 0, luma, w, 1, p8) == null)
    assert(p8.forall(_ == 128))
    // vertical for block (0,1): top refs = row 7; above-right = block
    // (1,0) pixels row 7 cols 8..15 (decoded earlier in raster block
    // order). Plant a step: cols 0..7 = 100, cols 8..15 = 140.
    for (x <- 0 until 8) luma(7 * w + x) = 100.toByte
    for (x <- 8 until 16) luma(7 * w + x) = 140.toByte
    assert(H264Decode.predictIntra8x8(0, 0, 1, luma, w, 1, p8) == null)
    // filtered top: tf(0) = (3·100+100+2)>>2 = 100 (no corner — left
    // unavailable); tf(1..5) = 100; tf(6) = (100+200+100+2)>>2 = 100;
    // tf(7) = (100+200+140+2)>>2 = 110
    for (y <- 0 until 8) {
      for (x <- 0 until 7) assert(p8(y * 8 + x) == 100, s"($x,$y)")
      assert(p8(y * 8 + 7) == 110, s"(7,$y)")
    }
    // horizontal for block (1,0): left refs = col 7 rows 0..7, corner
    // unavailable (top row) → lf(0) = (3·l0+l1+2)>>2
    for (y <- 0 until 8) luma(y * w + 7) = (60 + 8 * y).toByte
    assert(H264Decode.predictIntra8x8(1, 1, 0, luma, w, 1, p8) == null)
    // lf(0) = (180+68+2)>>2 = 62; lf(1) = (60+136+76+2)>>2 = 68 (the
    // 3-tap of the linear ramp is the ramp); lf(7) = (108+3·116+2)>>2=114
    assert(p8.slice(0, 8).forall(_ == 62))
    assert(p8.slice(8, 16).forall(_ == 68))
    assert(p8.slice(56, 64).forall(_ == 114))
  }

  test("predictIntra8x8: DDL on a constant top (with above-right) is " +
      "constant; refusals are named when references are missing") {
    val w = 16
    val luma = new Array[Byte](16 * 16)
    java.util.Arrays.fill(luma, 0, luma.length, 90.toByte)
    val p8 = new Array[Int](64)
    assert(H264Decode.predictIntra8x8(3, 0, 1, luma, w, 1, p8) == null)
    assert(p8.forall(_ == 90))
    // vertical with no top refs refuses by name
    val err = H264Decode.predictIntra8x8(0, 0, 0, luma, w, 1, p8)
    assert(err != null && err.contains("vertical"), err)
  }

  test("e2e: High-profile Intra_8x8 CAVLC fixture decodes the quadrant " +
      "closed form (flag parse, interleaved residual, dequant, idct8x8, " +
      "DC prediction chain)") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticI8x8AnnexB(lit(5), lit(2), lit(3), lit(1))
        .as("payload"))
    val out = H264Decode.decodeIdr(df).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("decode_error") == null, r.toString)
    assert(r.getAs[Int]("frame_width") == 16 &&
      r.getAs[Int]("frame_height") == 16)
    // b0 = 128+10 = 138; b1 = 138+4 = 142; b2 = 138+6 = 144;
    // b3 = (142+144+1)>>1 + 2 = 143 + 2 = 145
    val want = (138.0 + 142 + 144 + 145) / 4
    assert(math.abs(r.getAs[Double]("y_mean") - want) < 1e-9,
      s"${r.getAs[Double]("y_mean")} vs $want")
  }

  test("8x8 scaling fall-backs: Default_8x8 demands refuse by name; a " +
      "PPS-transmitted 8x8 list scales the decode exactly") {
    // SPS with matrices present, list 6 absent (fall-back rule A) + the
    // transform_8x8 PPS → refusal names the Default_8x8 table
    def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Array[Byte] =
      Array[Byte](0, 0, 0, 1, ((refIdc << 5) | tpe).toByte) ++
        VideoBitstream.escapeRbsp(rbsp)
    val flatList = Array.fill(16)(16)
    val refusing = nal(3, 7, VideoBitstream.syntheticHighSpsRbsp(1, 1, flatList)) ++
      nal(3, 8, H264Decode.cavlcT8PpsRbsp) ++
      nal(3, 5, H264Decode.i8x8SliceRbsp(5, 2, 3, 1))
    val out = H264Decode.decodeIdr(Seq((0L, refusing)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(out.getAs[String]("decode_error") != null &&
      out.getAs[String]("decode_error").contains("Default_8x8"),
      out.toString)
    // PPS-transmitted 8x8 intra list with w(0,0) = 32 (rest 16): the DC
    // residual law doubles → b0 = 128 + 4·c0, chain unchanged for the
    // other quadrants' DC positions (also w00-scaled)
    val w8 = Array.fill(64)(16); w8(0) = 32
    val pps = {
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1); w.ue(0); w.ue(0); w.ue(0)
      w.u(0, 1); w.u(0, 2); w.se(2); w.se(0); w.se(0)
      w.u(1, 1); w.u(0, 1); w.u(0, 1) // deblock ctl, constrained, redundant
      w.u(1, 1) // transform_8x8_mode_flag
      w.u(1, 1) // pic_scaling_matrix_present_flag
      // list 0 (Sl_4x4_Intra_Y) transmitted flat-16 — leaving it absent
      // under rule B with a matrix-less SPS would demand Default_4x4
      // and refuse the whole slice before the 8x8 path is reached
      w.u(1, 1)
      var last4 = 8
      var j4 = 0
      while (j4 < 16) {
        w.se(((16 - last4) + 256 + 128) % 256 - 128)
        last4 = 16
        j4 += 1
      }
      var i = 1
      while (i < 6) { w.u(0, 1); i += 1 } // lists 1..5 absent
      w.u(1, 1) // list 6 (Sl_8x8_Intra_Y) present
      var last = 8
      var j = 0
      while (j < 64) {
        w.se(((w8(j) - last) + 256 + 128) % 256 - 128)
        last = w8(j)
        j += 1
      }
      w.u(0, 1) // list 7 absent
      w.se(0) // second_chroma_qp_index_offset
      w.rbspTrailing()
      w.bytes
    }
    val scaled = nal(3, 7, VideoBitstream.syntheticHighFlatSpsRbsp(1, 1)) ++
      nal(3, 8, pps) ++
      nal(3, 5, H264Decode.i8x8SliceRbsp(5, 2, 3, 1))
    val r2 = H264Decode.decodeIdr(Seq((0L, scaled)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(r2.getAs[String]("decode_error") == null, r2.toString)
    // b0 = 128+20 = 148; b1 = 148+8 = 156; b2 = 148+12 = 160;
    // b3 = (156+160+1)>>1 + 4 = 158 + 4 = 162
    val want2 = (148.0 + 156 + 160 + 162) / 4
    assert(math.abs(r2.getAs[Double]("y_mean") - want2) < 1e-9,
      s"${r2.getAs[Double]("y_mean")} vs $want2")
  }
}
