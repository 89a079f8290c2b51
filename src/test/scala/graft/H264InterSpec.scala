package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** P-slice inter prediction ([[H264Inter]]): the §8.4.2.2.1 quarter-pel
  * kernel against hand-computed 6-tap values, the §8.4.1.3 / §8.4.1.1
  * motion-vector derivations case by case, and the encode∘decode GOP
  * round trip (motion-compensated frames pixel-exact in closed form).
  */
class H264InterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 6×1 plane: a slope-10 ramp — linear, so half/quarter positions are
  // exact midpoints (the 6-tap filter reproduces linear functions)
  private val ramp = Array[Byte](10, 20, 30, 40, 50, 60)

  test("luma kernel: half-pel 6-tap, hand-computed, including the edge clamp") {
    // interior: raw = 10-100+600+800-250+60 = 1120 → (1120+16)>>5 = 35
    assert(H264Inter.lumaSample(ramp, 6, 1, 2, 0, 2, 0) == 35)
    // left edge (x=0): clamped taps 10,10,10,20,30,40 → raw 450 → 14
    assert(H264Inter.lumaSample(ramp, 6, 1, 0, 0, 2, 0) == 14)
    // quarter a at x=2: (G + b + 1)>>1 = (30 + 35 + 1)>>1 = 33
    assert(H264Inter.lumaSample(ramp, 6, 1, 2, 0, 1, 0) == 33)
    // quarter c at x=2: (H + b + 1)>>1 = (40 + 35 + 1)>>1 = 38
    assert(H264Inter.lumaSample(ramp, 6, 1, 2, 0, 3, 0) == 38)
    // integer position is the sample itself
    assert(H264Inter.lumaSample(ramp, 6, 1, 3, 0, 0, 0) == 40)
  }

  test("luma kernel: center j is exact on an additive ramp (interior)") {
    // f(x, y) = 10 + 10x + 20y on an 8×8 plane: j at (x+1/2, y+1/2)
    // should be f + 15 exactly (the 2-D 6-tap reproduces bilinear)
    val w = 8
    val p = Array.tabulate[Byte](w * w)(i => (10 + 10 * (i % w) + 20 * (i / w)).toByte)
    assert(H264Inter.lumaSample(p, w, w, 3, 3, 2, 2) ==
      (10 + 30 + 60) + 15)
    // e / f / i quarter positions around the same point stay exact
    assert(H264Inter.lumaSample(p, w, w, 3, 3, 1, 1) ==
      ((10 + 30 + 60 + 5) + (10 + 30 + 60 + 10) + 1) / 2) // (b + h + 1)>>1
  }

  test("predict16x16 plane path equals per-sample lumaSample for every " +
      "fraction, including off-picture windows") {
    val rnd = new scala.util.Random(7)
    val w = 48; val h = 48
    val ref = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val dst = new Array[Byte](w * h)
    // MB at (16, 16); MVs chosen to hit every (xF, yF) phase and to
    // push the window over the picture edge (integer part ±20 px)
    for (xf <- 0 to 3; yf <- 0 to 3; base <- Seq(-80, 0, 80)) {
      val mvx = base + xf
      val mvy = base + yf
      H264Inter.predict16x16(ref, dst, w, h, 16, 16, mvx, mvy)
      val xI = 16 + (mvx >> 2); val yI = 16 + (mvy >> 2)
      for (yy <- 0 until 16; xx <- 0 until 16) {
        val want = H264Inter.lumaSample(ref, w, h, xI + xx, yI + yy,
          mvx & 3, mvy & 3)
        assert((dst((16 + yy) * w + 16 + xx) & 0xff) == want,
          s"frac ($xf,$yf) base $base pixel ($xx,$yy)")
      }
    }
  }

  test("mv prediction: A-only rule, exactly-one-match, median") {
    val g = new H264Inter.MvGrid(4, 4)
    // row 0, col 1: B/C/D unavailable, A available → mvA verbatim
    g.set(0, 0, 12, -8)
    assert(H264Inter.mvPred16x16(g, 1, 0) == (12, -8))
    // interior with exactly ONE inter neighbour (B intra, C intra) → mvA
    g.set(0, 1, 4, 4)
    // neighbours of (1,1): A=(0,1) inter, B=(1,0) INTRA, C=(2,0) intra
    // → exactly one match (decoded-intra neighbours are available but
    // never refIdx-match; the block grid distinguishes them from
    // not-yet-decoded, which would trigger the C→D substitution)
    g.markIntra(1, 0); g.markIntra(2, 0)
    assert(H264Inter.mvPred16x16(g, 1, 1) == (4, 4))
    // full median: make A, B, C all inter with distinct MVs
    val g2 = new H264Inter.MvGrid(4, 4)
    g2.set(0, 1, 10, 0) // A of (1,1)
    g2.set(1, 0, 20, 4) // B of (1,1)
    g2.set(2, 0, 30, 8) // C of (1,1)
    assert(H264Inter.mvPred16x16(g2, 1, 1) == (20, 4))
    // first MB of the picture: nothing available → (0,0)
    assert(H264Inter.mvPred16x16(new H264Inter.MvGrid(4, 4), 0, 0) == (0, 0))
  }

  test("P_Skip derivation: zero on the picture edge and next to " +
      "zero-motion neighbours, predicted otherwise") {
    val g = new H264Inter.MvGrid(4, 4)
    g.set(0, 1, 8, 8); g.set(1, 0, 8, 8); g.set(2, 0, 8, 8)
    // edge MBs always zero
    assert(H264Inter.skipMv(g, 0, 2) == (0, 0))
    assert(H264Inter.skipMv(g, 2, 0) == (0, 0))
    // interior with moving neighbours → the §8.4.1.3 prediction
    assert(H264Inter.skipMv(g, 1, 1) == (8, 8))
    // a zero-motion A neighbour forces zero
    val gz = new H264Inter.MvGrid(4, 4)
    gz.set(0, 1, 0, 0); gz.set(1, 0, 8, 8); gz.set(2, 0, 8, 8)
    assert(H264Inter.skipMv(gz, 1, 1) == (0, 0))
  }

  test("decodeGop: IDR + uniform-MV P + all-skip P round-trips " +
      "pixel-exact (closed-form translation with edge clamp)") {
    // quadrants c0=128+7=135, c1=134, c2=135+3=138, c3=(134+138+1)>>1=136
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticGopAnnexB(lit(7), lit(true), lit(3),
        lit(8), lit(4), lit(9)).as("payload")) // integer MV (2, 1) in pixels
    val out = H264Decode.decodeGop(df).orderBy("frame_idx").collect()
    assert(out.length == 4, out.mkString("\n"))
    assert(out.forall(_.getAs[String]("decode_error") == null),
      out.map(_.getAs[String]("decode_error")).mkString(";"))
    assert(out.map(_.getAs[String]("frame_type")).toSeq ==
      Seq("I", "P", "P", "P"))
    val w = 32
    val f0 = out(0).getAs[Array[Byte]]("luma_plane")
    val f1 = out(1).getAs[Array[Byte]]("luma_plane")
    val f2 = out(2).getAs[Array[Byte]]("luma_plane")
    // frame 0: the documented quadrants
    def q(x: Int, y: Int): Int = (if (y < 16) { if (x < 16) 135 else 134 }
      else { if (x < 16) 138 else 136 })
    for (y <- 0 until 32; x <- 0 until 32)
      assert((f0(y * w + x) & 0xff) == q(x, y), s"f0 ($x,$y)")
    // frame 1: frame 0 translated by the MV (positive MV reads
    // DOWN-RIGHT in the reference), clamped at the borders
    def clampI(v: Int): Int = if (v < 0) 0 else if (v > 31) 31 else v
    for (y <- 0 until 32; x <- 0 until 32)
      assert((f1(y * w + x) & 0xff) == q(clampI(x + 2), clampI(y + 1)),
        s"f1 ($x,$y)")
    // frame 2 (all P_Skip, zero motion everywhere): identical to frame 1
    assert(f2.toSeq == f1.toSeq)
    // frame 3 (I_16x16 intra refresh at MB0, skips elsewhere): MB0 is
    // the constant 128 + 9, the rest is frame 2
    val f3 = out(3).getAs[Array[Byte]]("luma_plane")
    for (y <- 0 until 32; x <- 0 until 32) {
      val want = if (x < 16 && y < 16) 137 else f2(y * w + x) & 0xff
      assert((f3(y * w + x) & 0xff) == want, s"f3 ($x,$y)")
    }
  }

  test("decodeGop: quarter-pel motion interpolates — a half-pel MV on " +
      "the quadrant frame averages across the vertical seam") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticGopAnnexB(lit(7), lit(true), lit(3),
        lit(2), lit(0), lit(9)).as("payload")) // MV (+1/2, 0)
    val out = H264Decode.decodeGop(df).orderBy("frame_idx").collect()
    assert(out.forall(_.getAs[String]("decode_error") == null),
      out.map(_.getAs[String]("decode_error")).mkString(";"))
    val f1 = out(1).getAs[Array[Byte]]("luma_plane")
    // deep inside the top-left quadrant the plane is constant 135 —
    // the 6-tap half-pel of a constant is the constant
    assert((f1(5 * 32 + 5) & 0xff) == 135)
    // at the seam column x=15 (half-pel between 135..135,134,134...):
    // taps 135,135,135,134,134,134 → raw = 135-675+2700+2680-670+134
    //    = 4304 → (4304+16)>>5 = 135
    assert((f1(5 * 32 + 15) & 0xff) == 135)
    // x=14: taps at 12..17 = 135,135,135,135,134,134 →
    // raw = 135-675+2700+2700-670+134 = 4324 → (4324+16)>>5 = 135
    assert((f1(5 * 32 + 14) & 0xff) == 135)
    // x=16: taps at 14..19 = 135,135,134,134,134,134 →
    // raw = 135-675+2680+2680-670+134 = 4284 → (4284+16)>>5 = 134
    assert((f1(5 * 32 + 16) & 0xff) == 134)
  }

  test("decodeGop: refusals are NAMED and stop the walk, decoded " +
      "frames survive") {
    // P sub-partition (mb_type 1) refuses by name
    val rbsp = {
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(0); w.ue(0) // first_mb, slice_type P, pps id
      w.u(1, 4) // frame_num
      w.u(0, 1); w.u(0, 1); w.u(0, 1) // overrides/modification/marking
      w.se(0); w.ue(1) // qp_delta, deblock off
      w.ue(0) // mb_skip_run 0
      w.ue(3); w.ue(4) // mb_type P_8x8, sub_mb_type 4 — malformed
      // (Table 7-18 tops out at 3; splits themselves decode since r18)
      w.rbspTrailing()
      w.bytes
    }
    val out0 = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticGopAnnexB(lit(7), lit(true), lit(3),
        lit(0), lit(0), lit(9)).as("payload")).collect()(0)
      .getAs[Array[Byte]]("payload")
    // splice: keep SPS/PPS/IDR, replace the P frames with the bad slice
    val idrEnd = {
      // find the 4th start code (SPS, PPS, IDR, first P)
      var count = 0; var i = 0; var pos = -1
      while (i + 3 < out0.length && pos < 0) {
        if (out0(i) == 0 && out0(i + 1) == 0 && out0(i + 2) == 0 &&
            out0(i + 3) == 1) { count += 1; if (count == 4) pos = i }
        i += 1
      }
      pos
    }
    val spliced = out0.take(idrEnd) ++
      Array[Byte](0, 0, 0, 1, (2 << 5 | 1).toByte) ++
      VideoBitstream.escapeRbsp(rbsp)
    val rows = H264Decode.decodeGop(Seq((0L, spliced)).toDF("doc_id", "payload"))
      .orderBy("frame_idx").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("decode_error") == null) // IDR kept
    assert(rows(1).getAs[String]("decode_error")
      .contains("sub_mb_type"), rows(1).toString)
  }

  // ---- round-17 envelope: recovery points, frame_num continuity, ----
  // ---- parsed frame_type, skip-to-intra resumption                ----

  private def annexB(units: (Int, Int, Array[Byte])*): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    units.foreach { case (refIdc, tpe, rbsp) =>
      out += 0; out += 0; out += 0; out += 1
      out += ((refIdc << 5) | tpe).toByte
      out ++= VideoBitstream.escapeRbsp(rbsp)
    }
    out.toArray
  }
  private def gopRows(payload: Array[Byte]) =
    H264Decode.decodeGop(Seq((0L, payload)).toDF("doc_id", "payload"))
      .orderBy("frame_idx").collect()

  test("decodeGop: a NON-IDR recovery-point I slice decodes an open GOP " +
      "whose IDR was cut (truncated-download shape)") {
    // SPS/PPS + non-IDR I (NAL type 1, frame_num 3) + all-skip P (4)
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (2, 1, H264Decode.i16SliceRbsp(7, true, 3, idr = false, frameNum = 3)),
      (2, 1, H264Inter.pSliceRbsp(4, 4, Seq.fill(4)(H264Inter.PMb.Skip))))
    val out = gopRows(payload)
    assert(out.length == 2, out.mkString("\n"))
    assert(out.forall(_.getAs[String]("decode_error") == null),
      out.map(_.getAs[String]("decode_error")).mkString(";"))
    assert(out.map(_.getAs[String]("frame_type")).toSeq == Seq("I", "P"))
    // the recovery I frame carries the documented quadrants; the
    // all-skip P (every derived MV is zero) reproduces it exactly
    val f0 = out(0).getAs[Array[Byte]]("luma_plane")
    val f1 = out(1).getAs[Array[Byte]]("luma_plane")
    assert((f0(0) & 0xff) == 135 && (f0(5 * 32 + 20) & 0xff) == 134)
    assert(f1.toSeq == f0.toSeq)
  }

  test("decodeGop: a frame_num gap refuses BY NAME (lost reference " +
      "frame must not be motion-compensated through)") {
    // IDR (frame_num 0) then a P claiming frame_num 2 — frame 1 was lost
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3)),
      (2, 1, H264Inter.pSliceRbsp(4, 2, Seq.fill(4)(H264Inter.PMb.Skip))))
    val out = gopRows(payload)
    assert(out.length == 2)
    assert(out(0).getAs[String]("decode_error") == null)
    val err = out(1).getAs[String]("decode_error")
    assert(err != null && err.contains("frame_num gap"), err)
    assert(out(1).getAs[String]("frame_type") == "P")
  }

  test("decodeGop: frame_type comes from the PARSED slice_type — a B " +
      "slice refuses labeled B, not P") {
    val bSlice = {
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(1) // first_mb, slice_type 1 = B
      w.ue(0); w.u(1, 4) // pps id, frame_num 1
      w.rbspTrailing()
      w.bytes
    }
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3)),
      (2, 1, bSlice))
    val out = gopRows(payload)
    assert(out.length == 2)
    assert(out(1).getAs[String]("frame_type") == "B", out(1).toString)
    // r18: B slices DECODE when bracketed; this one carries ref_idc 2
    // (a reference B) and refuses by the B-pyramid name
    assert(out(1).getAs[String]("decode_error")
      .contains("reference B frame"), out(1).toString)
  }

  test("decodeGop: after a refusal the walk skips inter frames and " +
      "RESUMES at the next intra frame (frame_idx keeps stream position)") {
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3)), // frame 0: IDR
      (2, 1, { // frame 1: P with a MALFORMED sub_mb_type (Table 7-18
        // tops out at 3 — split decode itself is supported since r18)
        val w = new VideoBitstream.BitWriter
        w.ue(0); w.ue(0); w.ue(0); w.u(1, 4)
        w.u(0, 1); w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
        w.ue(0); w.ue(3); w.ue(4) // skip_run 0, P_8x8, sub_mb_type 4
        w.rbspTrailing(); w.bytes
      }),
      // frame 2: P inside the broken chain — must be SKIPPED (no row)
      (2, 1, H264Inter.pSliceRbsp(4, 2, Seq.fill(4)(H264Inter.PMb.Skip))),
      // frame 3: recovery-point I — re-anchors the walk
      (2, 1, H264Decode.i16SliceRbsp(4, false, 6, idr = false, frameNum = 3)),
      // frame 4: P off the recovered reference — decodes again
      (2, 1, H264Inter.pSliceRbsp(4, 4, Seq.fill(4)(H264Inter.PMb.Skip))))
    val out = gopRows(payload)
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 3, 4),
      out.mkString("\n"))
    assert(out.map(_.getAs[String]("frame_type")).toSeq ==
      Seq("I", "P", "I", "P"))
    assert(out(1).getAs[String]("decode_error").contains("sub_mb_type"))
    assert(out(2).getAs[String]("decode_error") == null)
    assert(out(3).getAs[String]("decode_error") == null)
    // frame 4 reproduces the recovery frame (all-skip, zero motion)
    assert(out(3).getAs[Array[Byte]]("luma_plane").toSeq ==
      out(2).getAs[Array[Byte]]("luma_plane").toSeq)
  }

  // ---- round-17 partition widening: 16x8 / 8x16 / 8x8, multi-ref ----

  test("partition MV prediction: directional 16x8/8x16 shortcuts fire " +
      "on refIdx match, fall back to the general derivation otherwise") {
    val g = new H264Inter.MvGrid(4, 4)
    g.set(0, 0, 8, 4) // MB(0,0) inter, uniform
    g.set(1, 0, 20, -4)
    // 16x8 TOP partition of MB(0,1) (blocks (0,4) w4=4 h4=2): B matches
    // → mvB verbatim (B = bottom row of MB(0,0))
    assert(H264Inter.mvPredPart(g, 0, 4, 4, 2,
      0, H264Inter.Part16x8Top) == (8, 4))
    // 16x8 BOTTOM partition with A intra → directional miss → general:
    // exactly-one-match picks B (the top partition once decoded)
    g.setBlk(0, 4, 4, 2, 8, 4) // the decoded top partition
    assert(H264Inter.mvPredPart(g, 0, 6, 4, 2,
      0, H264Inter.Part16x8Bottom) == (8, 4)) // A outside → B matches
    // 8x16 LEFT of MB(1,1): A = right column of MB(0,1) area
    assert(H264Inter.mvPredPart(g, 4, 4, 2, 4,
      0, H264Inter.Part8x16Left) == (8, 4))
    // 8x16 RIGHT of MB(1,0) at blocks (6,0): C outside (above row 0)
    // → D outside → B,C,D unavailable... B=(6,-1) outside too; A will
    // be the left partition once set
    g.setBlk(4, 0, 2, 4, 3, 2)
    assert(H264Inter.mvPredPart(g, 6, 0, 2, 4,
      0, H264Inter.Part8x16Right) == (3, 2)) // A-only rule
  }

  test("decodeGop: mixed 16x8/8x16/8x8/16x16 partitions with a uniform " +
      "MV decode to the exact translated plane (block-granular §8.4.1.3)") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticPartitionGopAnnexB(lit(7), lit(true), lit(3),
        lit(9), lit(6)).as("payload")) // MV (2¼, 1½) px — fractional!
    val out = H264Decode.decodeGop(df).orderBy("frame_idx").collect()
    assert(out.length == 3, out.mkString("\n"))
    assert(out.forall(_.getAs[String]("decode_error") == null),
      out.map(_.getAs[String]("decode_error")).mkString(";"))
    val w = 32
    val f0 = out(0).getAs[Array[Byte]]("luma_plane")
    val f1 = out(1).getAs[Array[Byte]]("luma_plane")
    val f2 = out(2).getAs[Array[Byte]]("luma_plane")
    // every partition carries MV (9,6): frame 1 must equal per-sample
    // quarter-pel interpolation of frame 0 at (x+9/4, y+6/4) regardless
    // of which partition covered the pixel
    for (y <- 0 until 32; x <- 0 until 32) {
      val want = H264Inter.lumaSample(f0, w, w, x + 2, y + 1, 1, 2)
      assert((f1(y * w + x) & 0xff) == want, s"f1 ($x,$y)")
    }
    assert(f2.toSeq == f1.toSeq) // all-skip frame reproduces
  }

  test("partition census: per-frame skip/16x16/16x8/8x16/8x8/intra " +
      "counts, I frames all-intra") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticPartitionGopAnnexB(lit(7), lit(true), lit(3),
        lit(8), lit(4)).as("payload"))
    val out = H264Decode.h264PartitionCensus(df).orderBy("frame_idx")
      .collect()
    assert(out.length == 3)
    def counts(r: org.apache.spark.sql.Row) = (
      r.getAs[Int]("n_skip"), r.getAs[Int]("n_16x16"),
      r.getAs[Int]("n_16x8"), r.getAs[Int]("n_8x16"),
      r.getAs[Int]("n_8x8"), r.getAs[Int]("n_intra"))
    assert(out(0).getAs[String]("frame_type") == "I" &&
      counts(out(0)) == ((0, 0, 0, 0, 0, 4)))
    assert(counts(out(1)) == ((0, 1, 1, 1, 1, 0)))
    assert(counts(out(2)) == ((4, 0, 0, 0, 0, 0)))
  }

  test("multi-ref parse: num_ref_idx_l0_active 2 with ref_idx 0 decodes " +
      "identically; ref_idx 1 refuses by name") {
    // same uniform-MV P frame, but with two active references and te(v)
    // ref_idx bits written per partition (all zero)
    def clip(numRef: Int, refZero: Boolean): Array[Byte] = {
      val mvMb =
        if (refZero) H264Inter.pSliceRbsp(4, 1,
          H264Inter.PMb.Mv(8, 4) +: Seq.fill(3)(H264Inter.PMb.Mv(0, 0)),
          numRefL0 = numRef)
        else {
          // hand-write mb_type 0 with te(v) ref_idx = 1 (bit 0)
          val w = new VideoBitstream.BitWriter
          w.ue(0); w.ue(0); w.ue(0); w.u(1, 4)
          w.u(1, 1); w.ue(1) // override: num_ref_idx_l0_active = 2
          w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
          w.ue(0) // skip_run
          w.ue(0) // P_L0_16x16
          w.u(0, 1) // te(v) cMax 1: bit 0 → ref_idx 1
          w.se(8); w.se(4); w.ue(0)
          w.rbspTrailing(); w.bytes
        }
      annexB(
        (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
        (3, 8, H264Decode.cavlcPpsRbsp),
        (3, 5, H264Decode.i16SliceRbsp(7, true, 3)),
        (2, 1, mvMb))
    }
    val base = gopRows(clip(1, refZero = true))
    val two = gopRows(clip(2, refZero = true))
    assert(two.forall(_.getAs[String]("decode_error") == null),
      two.map(_.getAs[String]("decode_error")).mkString(";"))
    assert(two(1).getAs[Array[Byte]]("luma_plane").toSeq ==
      base(1).getAs[Array[Byte]]("luma_plane").toSeq)
    val refused = gopRows(clip(2, refZero = false))
    assert(refused(1).getAs[String]("decode_error")
      .contains("beyond the previous frame"), refused(1).toString)
  }

  test("decodeGop: a recovery-point I slice using adaptive ref-pic " +
      "marking refuses by name (header would mis-align)") {
    val adaptive = {
      // non-IDR I header with adaptive_ref_pic_marking_mode_flag = 1
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(7); w.ue(0); w.u(3, 4)
      w.u(1, 1) // adaptive marking — unsupported
      w.rbspTrailing(); w.bytes
    }
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (2, 1, adaptive))
    val out = gopRows(payload)
    assert(out.length == 1)
    assert(out(0).getAs[String]("decode_error")
      .contains("adaptive ref pic marking"), out(0).toString)
    assert(out(0).getAs[String]("frame_type") == "I")
  }

  // ---- round-18: sub-8×8 partition MC (P_L0_8x4 / 4x8 / 4x4) ----

  test("decodePSlice: sub-8×8 splits decode with §8.4.1.3 block-granular " +
      "prediction — byte-exact against the closed-form translation of " +
      "every sub-partition") {
    val sps = VideoBitstream.parseSps(VideoBitstream.syntheticSpsRbsp(2, 2))
    val pps = H264Decode.parsePps(H264Decode.cavlcPpsRbsp)
    val rnd = new scala.util.Random(42)
    val ref = Array.fill[Byte](32 * 32)(rnd.nextInt(256).toByte)
    // MB0 = P_8x8 with sub_mb_types (8×4, 4×8, 4×4, 8×8); each mvd is
    // chosen against the hand-derived §8.4.1.3 prediction so every
    // region's FINAL MV is a known integer-pel translation:
    //  mbPart0 8×4 top:    nothing available → pred 0; mvd (8,0) → (2,0)px
    //  mbPart0 8×4 bottom: B only match (8,0); mvd (-8,0) → 0
    //  mbPart1 4×8 left:   B/C unavail, A avail → (8,0); mvd (-4,0) → (1,0)px
    //  mbPart1 4×8 right:  A-only → (4,0); mvd 0 → (1,0)px
    //  mbPart2 4×4 (0,2):  median 0; mvd (0,8) → (0,2)px; the other
    //    three median back to 0 (the (0,8) outlier never wins) → mvd 0
    //  mbPart3 8×8: median((0,0) A, (4,0) B, (0,0) D-sub) = 0;
    //    mvd (12,4) → (3,1)px
    // MB1 16×16: A-only → (4,0); mvd (-4,0) → 0. MB2/MB3: median 0.
    val rbsp = H264Inter.pSliceRbsp(4, 1, Seq(
      H264Inter.PMb.Sub8x8(Seq(1, 2, 3, 0), Seq(
        (8, 0), (-8, 0), // 8×4 top / bottom
        (-4, 0), (0, 0), // 4×8 left / right
        (0, 8), (0, 0), (0, 0), (0, 0), // 4×4 ×4 raster
        (12, 4))), // 8×8
      H264Inter.PMb.Mv(-4, 0),
      H264Inter.PMb.Mv(0, 0),
      H264Inter.PMb.Mv(0, 0)))
    val out = H264Inter.decodePSlice(rbsp, sps, pps, ref)
      .fold(msg => fail(s"refused: $msg"), identity)
    val regions = Seq( // (x0, y0, w, h) → final MV (dx, dy) pixels
      ((0, 0, 8, 4), (2, 0)), ((0, 4, 8, 4), (0, 0)),
      ((8, 0, 8, 8), (1, 0)),
      ((0, 8, 4, 4), (0, 2)), ((4, 8, 4, 4), (0, 0)),
      ((0, 12, 8, 4), (0, 0)),
      ((8, 8, 8, 8), (3, 1)),
      ((16, 0, 16, 16), (0, 0)), ((0, 16, 32, 16), (0, 0)))
    for (((x0, y0, rw, rh), (dx, dy)) <- regions;
         yy <- 0 until rh; xx <- 0 until rw) {
      val x = x0 + xx; val y = y0 + yy
      assert((out(y * 32 + x) & 0xff) ==
        (ref((y + dy) * 32 + x + dx) & 0xff),
        s"region ($x0,$y0,${rw}x$rh) mv ($dx,$dy) pixel ($x,$y)")
    }
  }

  test("h264PartitionCensus: n_sub8x8 counts the MBs that split below " +
      "8×8, alongside their n_8x8 count") {
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3)),
      (2, 1, H264Inter.pSliceRbsp(4, 1, Seq(
        H264Inter.PMb.Sub8x8(Seq(1, 2, 3, 0),
          Seq((0, 0), (0, 0), (0, 0), (0, 0), (0, 0), (0, 0), (0, 0),
            (0, 0), (0, 0))),
        H264Inter.PMb.Mv8x8(Seq((0, 0), (0, 0), (0, 0), (0, 0))),
        H264Inter.PMb.Mv(0, 0),
        H264Inter.PMb.Skip))))
    val out = H264Decode.h264PartitionCensus(
      Seq((0L, payload)).toDF("doc_id", "payload"))
      .orderBy("frame_idx").collect()
    assert(out.length == 2, out.mkString("\n"))
    assert(out(1).getAs[String]("census_error") == null, out(1).toString)
    assert(out(1).getAs[Int]("n_8x8") == 2) // both P_8x8 MBs
    assert(out(1).getAs[Int]("n_sub8x8") == 1) // only the split one
    assert(out(1).getAs[Int]("n_16x16") == 1)
    assert(out(1).getAs[Int]("n_skip") == 1)
    assert(out(0).getAs[Int]("n_sub8x8") == 0)
    assert(out(0).getAs[Int]("n_intra") == 4)
  }

  // ---- round-18: §7.4.3 reference-picture discipline (nal_ref_idc 0) ----

  test("decodeGop: a disposable (nal_ref_idc 0) P frame never becomes " +
      "the prediction reference — the next reference P " +
      "motion-compensates against the LAST REFERENCE frame") {
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3)), // frame 0: IDR anchor
      // frame 1: DISPOSABLE P (ref_idc 0) whose MB0 moves by (2, 1) px —
      // its pixels differ from the anchor but must never be predicted
      // from
      (0, 1, H264Inter.pSliceRbsp(4, 1,
        H264Inter.PMb.Mv(8, 4) +: Seq.fill(3)(H264Inter.PMb.Skip),
        nalRefIdc = 0)),
      // frame 2: reference P, all-skip (derived MV zero) — a bit-exact
      // copy of whatever it predicts from; §8.4.2.1 list0[0] is the
      // last REFERENCE frame, i.e. the IDR, not the disposable frame
      (2, 1, H264Inter.pSliceRbsp(4, 1,
        Seq.fill(4)(H264Inter.PMb.Skip))))
    val out = gopRows(payload)
    assert(out.length == 3, out.mkString("\n"))
    assert(out.forall(_.getAs[String]("decode_error") == null),
      out.map(_.getAs[String]("decode_error")).mkString(";"))
    val f0 = out(0).getAs[Array[Byte]]("luma_plane").toSeq
    val f1 = out(1).getAs[Array[Byte]]("luma_plane").toSeq
    val f2 = out(2).getAs[Array[Byte]]("luma_plane").toSeq
    assert(f1 != f0, "disposable frame should actually have moved")
    assert(f2 == f0, "reference P must copy the IDR, not the disposable")
  }

  test("decodeGop: a non-reference I slice neither advances frame_num " +
      "nor becomes the anchor — the conforming reference P after it " +
      "is NOT refused as a frame_num gap") {
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3)), // frame 0: IDR, fn 0
      // frame 1: non-reference I (ref_idc 0) with different content —
      // decodes standalone but must not move prevRef or become ref
      (0, 1, H264Decode.i16SliceRbsp(4, false, 6, idr = false,
        frameNum = 1, nalRefIdc = 0)),
      // frame 2: reference P, fn 1 = prevRef+1 relative to the IDR —
      // conforming, and predicting from the IDR
      (2, 1, H264Inter.pSliceRbsp(4, 1,
        Seq.fill(4)(H264Inter.PMb.Skip))))
    val out = gopRows(payload)
    assert(out.length == 3, out.mkString("\n"))
    assert(out.forall(_.getAs[String]("decode_error") == null),
      out.map(_.getAs[String]("decode_error")).mkString(";"))
    val f0 = out(0).getAs[Array[Byte]]("luma_plane").toSeq
    val f1 = out(1).getAs[Array[Byte]]("luma_plane").toSeq
    val f2 = out(2).getAs[Array[Byte]]("luma_plane").toSeq
    assert(f1 != f0, "the non-ref I should carry different content")
    assert(f2 == f0, "reference P must copy the IDR, not the non-ref I")
  }

  test("decodeGop: a stream anchored ONLY by a non-reference intra " +
      "frame refuses the following P by name (no reference frame)") {
    val payload = annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (0, 1, H264Decode.i16SliceRbsp(7, true, 3, idr = false,
        frameNum = 0, nalRefIdc = 0)),
      (2, 1, H264Inter.pSliceRbsp(4, 1,
        Seq.fill(4)(H264Inter.PMb.Skip))))
    val out = gopRows(payload)
    assert(out.length == 2, out.mkString("\n"))
    assert(out(0).getAs[String]("decode_error") == null)
    val err = out(1).getAs[String]("decode_error")
    assert(err != null && err.contains("no reference frame"), err)
  }
}
