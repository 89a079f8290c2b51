package graft.ops

/** H.264 P-slice inter prediction — the motion-compensation side of the
  * keyframe decoder family: quarter-sample luma interpolation
  * (ITU-T H.264 §8.4.2.2.1–2), 16×16 motion-vector prediction
  * (§8.4.1.3) with the P_Skip derivation (§8.4.1.1), and a restricted
  * CAVLC P-slice macroblock walk ([[decodePSlice]]).
  *
  * Reference shape (SDM-RDFizer has no media decode; this extends the
  * repo's beyond-parity video family): the supported envelope is the
  * one a curation pipeline's self-coded probes exercise — a single
  * RETAINED reference frame, P_Skip + P_L0_16x16 + 16×8 + 8×16 + 8×8
  * partitions with block-granular MV prediction, residual-free inter
  * macroblocks — with everything outside it refused BY NAME (sub-8×8
  * splits, ref_idx beyond the previous frame, weighted prediction,
  * inter residual, CABAC P slices). The refusals follow the repo's table
  * policy: Table 9-4's INTER coded_block_pattern column is NOT carried
  * because it cannot be conformance-anchored in this environment —
  * decoding through a mis-recalled table would ship wrong pixels with
  * decode_error null, which is worse than the named refusal
  * (same reasoning as the CABAC probability tables, Cabac.scala).
  *
  * Everything that IS decoded is exact: the 6-tap half-sample filter
  * and quarter-sample averaging reproduce the spec arithmetic
  * bit-for-bit (pinned by hand-computed kernels and by the
  * encode∘decode round trip in H264InterSpec).
  */
object H264Inter {

  /** Edge-clamped reference sample (§8.4.2.2.1's Clip3 on coordinates —
    * motion vectors may point outside the picture; samples replicate
    * from the border).
    */
  @inline private def at(ref: Array[Byte], w: Int, h: Int,
      x: Int, y: Int): Int = {
    val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
    val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
    ref(cy * w + cx) & 0xff
  }

  @inline private def clip255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Raw (unshifted, unclipped) 6-tap horizontal intermediate at
    * integer row `y`, half-sample column `x + 1/2` — the spec's b1.
    */
  @inline private def rawH(ref: Array[Byte], w: Int, h: Int,
      x: Int, y: Int): Int =
    at(ref, w, h, x - 2, y) - 5 * at(ref, w, h, x - 1, y) +
      20 * at(ref, w, h, x, y) + 20 * at(ref, w, h, x + 1, y) -
      5 * at(ref, w, h, x + 2, y) + at(ref, w, h, x + 3, y)

  /** Raw 6-tap vertical intermediate at integer column `x`, half-sample
    * row `y + 1/2` — the spec's h1.
    */
  @inline private def rawV(ref: Array[Byte], w: Int, h: Int,
      x: Int, y: Int): Int =
    at(ref, w, h, x, y - 2) - 5 * at(ref, w, h, x, y - 1) +
      20 * at(ref, w, h, x, y) + 20 * at(ref, w, h, x, y + 1) -
      5 * at(ref, w, h, x, y + 2) + at(ref, w, h, x, y + 3)

  /** Half-sample value b (horizontal) / h (vertical): (raw + 16) >> 5,
    * clipped.
    */
  @inline private def halfH(ref: Array[Byte], w: Int, h: Int,
      x: Int, y: Int): Int = clip255((rawH(ref, w, h, x, y) + 16) >> 5)
  @inline private def halfV(ref: Array[Byte], w: Int, h: Int,
      x: Int, y: Int): Int = clip255((rawV(ref, w, h, x, y) + 16) >> 5)

  /** Center half-sample j: 6-tap over the raw VERTICAL intermediates
    * (equivalently over the horizontal ones — §8.4.2.2.1 requires the
    * intermediate to stay unshifted), then (… + 512) >> 10.
    */
  @inline private def halfC(ref: Array[Byte], w: Int, h: Int,
      x: Int, y: Int): Int = {
    val v = rawV(ref, w, h, x - 2, y) - 5 * rawV(ref, w, h, x - 1, y) +
      20 * rawV(ref, w, h, x, y) + 20 * rawV(ref, w, h, x + 1, y) -
      5 * rawV(ref, w, h, x + 2, y) + rawV(ref, w, h, x + 3, y)
    clip255((v + 512) >> 10)
  }

  /** One predicted luma sample at quarter-sample position
    * (xInt + xFrac/4, yInt + yFrac/4), §8.4.2.2.1 Table 8-12's full
    * a..s letter grid. xFrac/yFrac in 0..3.
    */
  private[ops] def lumaSample(ref: Array[Byte], w: Int, h: Int,
      xInt: Int, yInt: Int, xFrac: Int, yFrac: Int): Int = {
    def g = at(ref, w, h, xInt, yInt)
    def b = halfH(ref, w, h, xInt, yInt)
    def hh = halfV(ref, w, h, xInt, yInt)
    def j = halfC(ref, w, h, xInt, yInt)
    def m = halfV(ref, w, h, xInt + 1, yInt) // vertical half one column right
    def s = halfH(ref, w, h, xInt, yInt + 1) // horizontal half one row down
    (xFrac, yFrac) match {
      case (0, 0) => g
      case (1, 0) => (g + b + 1) >> 1 // a
      case (2, 0) => b
      case (3, 0) => (at(ref, w, h, xInt + 1, yInt) + b + 1) >> 1 // c
      case (0, 1) => (g + hh + 1) >> 1 // d
      case (1, 1) => (b + hh + 1) >> 1 // e
      case (2, 1) => (b + j + 1) >> 1 // f
      case (3, 1) => (b + m + 1) >> 1 // g
      case (0, 2) => hh
      case (1, 2) => (hh + j + 1) >> 1 // i
      case (2, 2) => j
      case (3, 2) => (j + m + 1) >> 1 // k
      case (0, 3) => (at(ref, w, h, xInt, yInt + 1) + hh + 1) >> 1 // n
      case (1, 3) => (hh + s + 1) >> 1 // p
      case (2, 3) => (j + s + 1) >> 1 // q
      case _      => (m + s + 1) >> 1 // r (3,3)
    }
  }

  /** Motion-compensate one 16×16 luma macroblock at picture position
    * (px, py) with quarter-sample motion vector (mvx, mvy) from `ref`
    * into `dst` (both w×h planes).
    *
    * The per-sample [[lumaSample]] recomputes shared 6-tap
    * intermediates for every pixel (adjacent windows overlap in 5 of 6
    * taps — up to ~36× redundant filter work at fraction (2,2)), so
    * this block path computes each needed intermediate plane ONCE per
    * macroblock: the G/b/h planes over the (16+1)² window and, when the
    * center j is involved, the unshifted rawV grid it is filtered from.
    * Per-sample equivalence with [[lumaSample]] is property-pinned in
    * H264InterSpec.
    */
  private[ops] def predict16x16(ref: Array[Byte], dst: Array[Byte],
      w: Int, h: Int, px: Int, py: Int, mvx: Int, mvy: Int): Unit =
    predictBlock(ref, dst, w, h, px, py, 16, 16, mvx, mvy)

  /** Motion-compensate one bw×bh luma partition (16×16 down to 8×8) at
    * picture position (px, py) — the same plane-at-a-time strategy,
    * windows sized to the partition.
    */
  private[ops] def predictBlock(ref: Array[Byte], dst: Array[Byte],
      w: Int, h: Int, px: Int, py: Int, bw: Int, bh: Int,
      mvx: Int, mvy: Int): Unit = {
    // >> 2 (arithmetic) keeps negative MVs on the integer grid the spec
    // expects; & 3 gives the fractional phase
    val xI = px + (mvx >> 2)
    val yI = py + (mvy >> 2)
    val xF = mvx & 3
    val yF = mvy & 3
    if (xF == 0 && yF == 0) { // integer MV (and every P_Skip copy)
      var yy = 0
      while (yy < bh) {
        var xx = 0
        while (xx < bw) {
          dst((py + yy) * w + px + xx) =
            at(ref, w, h, xI + xx, yI + yy).toByte
          xx += 1
        }
        yy += 1
      }
      return
    }
    // intermediate planes over the partition's (x, y) ∈ [0, bw+1]×[0, bh+1]
    // window, stride s, relative to (xI, yI); only the planes this
    // fraction reads are filled
    val s = bw + 2
    val rows = bh + 2
    val gP = new Array[Int](s * rows) // integer samples (G, H, M)
    val bP = new Array[Int](s * rows) // horizontal halves (b; s = b(y+1))
    val hP = new Array[Int](s * rows) // vertical halves (h; m = h(x+1))
    val jP = if (xF != 0 && yF != 0 && (xF == 2 || yF == 2))
      new Array[Int](s * rows) else null
    var y = 0
    while (y < rows) {
      var x = 0
      while (x < s) {
        if (xF == 0 || yF == 0) gP(y * s + x) = at(ref, w, h, xI + x, yI + y)
        if (xF != 0) bP(y * s + x) = halfH(ref, w, h, xI + x, yI + y)
        if (yF != 0) hP(y * s + x) = halfV(ref, w, h, xI + x, yI + y)
        x += 1
      }
      y += 1
    }
    if (jP != null) {
      // j = 6-tap horizontally over the UNSHIFTED vertical
      // intermediates: fill the rawV grid once (columns x −2..bw+2
      // relative to xI), then filter it — no per-cell recomputation
      val rs = s + 5
      val rv = new Array[Int](rs * rows)
      y = 0
      while (y < rows) {
        var x = 0
        while (x < rs) {
          rv(y * rs + x) = rawV(ref, w, h, xI + x - 2, yI + y)
          x += 1
        }
        y += 1
      }
      y = 0
      while (y < rows) {
        var x = 0
        while (x < s) {
          val o = y * rs + x // rv column x corresponds to sample x − 2
          val v = rv(o) - 5 * rv(o + 1) + 20 * rv(o + 2) +
            20 * rv(o + 3) - 5 * rv(o + 4) + rv(o + 5)
          jP(y * s + x) = clip255((v + 512) >> 10)
          x += 1
        }
        y += 1
      }
    }
    var yy = 0
    while (yy < bh) {
      var xx = 0
      while (xx < bw) {
        val i = yy * s + xx
        val v = (xF, yF) match {
          case (1, 0) => (gP(i) + bP(i) + 1) >> 1 // a
          case (2, 0) => bP(i)
          case (3, 0) => (gP(i + 1) + bP(i) + 1) >> 1 // c
          case (0, 1) => (gP(i) + hP(i) + 1) >> 1 // d
          case (1, 1) => (bP(i) + hP(i) + 1) >> 1 // e
          case (2, 1) => (bP(i) + jP(i) + 1) >> 1 // f
          case (3, 1) => (bP(i) + hP(i + 1) + 1) >> 1 // g
          case (0, 2) => hP(i)
          case (1, 2) => (hP(i) + jP(i) + 1) >> 1 // i
          case (2, 2) => jP(i)
          case (3, 2) => (jP(i) + hP(i + 1) + 1) >> 1 // k
          case (0, 3) => (gP(i + s) + hP(i) + 1) >> 1 // n
          case (1, 3) => (hP(i) + bP(i + s) + 1) >> 1 // p
          case (2, 3) => (jP(i) + bP(i + s) + 1) >> 1 // q
          case _      => (hP(i + 1) + bP(i + s) + 1) >> 1 // r (3,3)
        }
        dst((py + yy) * w + px + xx) = v.toByte
        xx += 1
      }
      yy += 1
    }
  }

  /** Per-4×4-BLOCK motion state for the neighbour derivations — §8.4.1.3
    * operates at sub-MB granularity once partitions smaller than 16×16
    * exist. `ref` per block: −2 = not yet decoded / outside picture,
    * −1 = decoded intra (available as a neighbour but never
    * refIdx-matching), ≥0 = decoded inter with that reference index.
    */
  private[ops] final class MvGrid(val mbw: Int, val mbh: Int) {
    val bw = mbw * 4
    val bh = mbh * 4
    val mvx = new Array[Int](bw * bh)
    val mvy = new Array[Int](bw * bh)
    val ref = Array.fill(bw * bh)(-2)
    /** Mark a w4×h4 block region (block coords) decoded-inter. */
    def setBlk(bx: Int, by: Int, w4: Int, h4: Int,
        x: Int, y: Int, r: Int = 0): Unit = {
      var j = 0
      while (j < h4) {
        var i = 0
        while (i < w4) {
          val o = (by + j) * bw + bx + i
          mvx(o) = x; mvy(o) = y; ref(o) = r
          i += 1
        }
        j += 1
      }
    }
    /** Whole-MB inter setter (MB coords) — the 16×16 / P_Skip shape. */
    def set(mbx: Int, mby: Int, x: Int, y: Int): Unit =
      setBlk(mbx * 4, mby * 4, 4, 4, x, y)
    /** Mark an intra MB decoded (neighbours see it, no refIdx match). */
    def markIntra(mbx: Int, mby: Int): Unit =
      setBlk(mbx * 4, mby * 4, 4, 4, 0, 0, r = -1)
    def refB(bx: Int, by: Int): Int =
      if (bx < 0 || by < 0 || bx >= bw || by >= bh) -2
      else ref(by * bw + bx)
    def mvB(bx: Int, by: Int): (Int, Int) =
      if (refB(bx, by) < 0) (0, 0)
      else (mvx(by * bw + bx), mvy(by * bw + bx))
    /** MB-granular accessors kept for the skip/16×16 derivations. */
    def refAt(mbx: Int, mby: Int): Int = refB(mbx * 4, mby * 4)
    def mvAt(mbx: Int, mby: Int): (Int, Int) = mvB(mbx * 4, mby * 4)
  }

  /** Partition kinds for the §8.4.1.3 directional shortcuts. */
  private[ops] final val PartGeneral = 0 // 16×16 and 8×8 sub-blocks
  private[ops] final val Part16x8Top = 1 // predicts from B on refIdx match
  private[ops] final val Part16x8Bottom = 2 // predicts from A
  private[ops] final val Part8x16Left = 3 // predicts from A
  private[ops] final val Part8x16Right = 4 // predicts from C

  /** §8.4.1.3 luma motion-vector prediction for a partition at block
    * coords (bx, by), size w4×h4 in 4×4 units, reference `refIdx`:
    * neighbours A (left of top-left), B (above top-left), C (above the
    * block right of the top-right corner; D above-left substitutes when
    * C is outside or not yet decoded). Directional 16×8/8×16 shortcuts
    * first (on refIdx match), then the exactly-one-matching-refIdx
    * shortcut, the A-only rule when B/C/D are all unavailable, else the
    * component-wise median.
    */
  private[ops] def mvPredPart(g: MvGrid, bx: Int, by: Int,
      w4: Int, h4: Int, refIdx: Int, kind: Int): (Int, Int) = {
    val aAvail = g.refB(bx - 1, by) >= -1
    val bAvail = g.refB(bx, by - 1) >= -1
    // C above-right; outside picture OR not yet decoded → D above-left
    val (cx, cy, cAvail) =
      if (g.refB(bx + w4, by - 1) >= -1) (bx + w4, by - 1, true)
      else (bx - 1, by - 1, g.refB(bx - 1, by - 1) >= -1)
    val refA = if (aAvail) g.refB(bx - 1, by) else -2
    val refBn = if (bAvail) g.refB(bx, by - 1) else -2
    val refC = if (cAvail) g.refB(cx, cy) else -2
    val mvA = g.mvB(bx - 1, by)
    val mvBn = g.mvB(bx, by - 1)
    val mvC = if (cAvail) g.mvB(cx, cy) else (0, 0)
    // §8.4.1.3 directional shortcuts (the refIdx-matching neighbour wins)
    kind match {
      case Part16x8Top if refBn == refIdx => return mvBn
      case Part16x8Bottom if refA == refIdx => return mvA
      case Part8x16Left if refA == refIdx => return mvA
      case Part8x16Right if refC == refIdx => return mvC
      case _ => ()
    }
    // §8.4.1.3.1: B, C (and D) all unavailable and A available → mvA
    if (!bAvail && !cAvail && aAvail) mvA
    else {
      val matches =
        (if (refA == refIdx) 1 else 0) + (if (refBn == refIdx) 1 else 0) +
          (if (refC == refIdx) 1 else 0)
      if (matches == 1) {
        if (refA == refIdx) mvA else if (refBn == refIdx) mvBn else mvC
      } else {
        def med(a: Int, b: Int, c: Int): Int =
          math.max(math.min(a, b), math.min(math.max(a, b), c))
        (med(mvA._1, mvBn._1, mvC._1), med(mvA._2, mvBn._2, mvC._2))
      }
    }
  }

  /** Whole-MB (16×16) §8.4.1.3 prediction (MB coords). */
  private[ops] def mvPred16x16(g: MvGrid, mbx: Int, mby: Int): (Int, Int) =
    mvPredPart(g, mbx * 4, mby * 4, 4, 4, 0, PartGeneral)

  /** §8.4.1.1 P_Skip motion derivation: zero when either edge neighbour
    * is unavailable or is a zero-motion reference-0 block, else the
    * §8.4.1.3 prediction.
    */
  private[ops] def skipMv(g: MvGrid, mbx: Int, mby: Int): (Int, Int) = {
    val bx = mbx * 4
    val by = mby * 4
    val aZero = g.refB(bx - 1, by) == 0 && g.mvB(bx - 1, by) == (0, 0)
    val bZero = g.refB(bx, by - 1) == 0 && g.mvB(bx, by - 1) == (0, 0)
    if (mbx == 0 || mby == 0 || aZero || bZero) (0, 0)
    else mvPred16x16(g, mbx, mby)
  }

  /** Encoder twin for the P-slice walk (fixtures + round-trip pins): one
    * CAVLC P slice over `mbs` in raster order — `None` = P_Skip,
    * `Some((mvdX, mvdY))` = P_L0_16x16 with that MOTION VECTOR
    * DIFFERENCE (the decoder adds its §8.4.1.3 prediction) and no
    * residual. frame_num is the §7.3.3 field (pocType-2 SPS: no POC
    * fields); deblocking written disabled, as the decoder requires.
    */
  /** Fixture macroblock spec for [[pSliceRbsp]]. */
  private[ops] sealed trait PMb
  private[ops] object PMb {
    case object Skip extends PMb
    /** P_L0_16x16 with this motion vector DIFFERENCE, no residual. */
    final case class Mv(mvdX: Int, mvdY: Int) extends PMb
    /** P_L0_L0_16x8: top/bottom partition MVDs, no residual. */
    final case class Mv16x8(top: (Int, Int), bottom: (Int, Int)) extends PMb
    /** P_L0_L0_8x16: left/right partition MVDs, no residual. */
    final case class Mv8x16(left: (Int, Int), right: (Int, Int)) extends PMb
    /** P_8x8, all four sub_mb_type P_L0_8x8: one MVD per 8×8, raster
      * order, no residual. */
    final case class Mv8x8(mvds: Seq[(Int, Int)]) extends PMb
    /** P_8x8 with per-8×8 sub_mb_type (Table 7-18: 0..3) and one MVD
      * per SUB-partition in §7.3.5.2 order (mbPartIdx-major, raster
      * within each 8×8), no residual. */
    final case class Sub8x8(subTypes: Seq[Int],
      mvds: Seq[(Int, Int)]) extends PMb
    /** P_L0_16x16 with residual: mvd, then coded_block_pattern codeNum
      * `cbpCode`, mb_qp_delta `qpDelta` (written only when cbpCode != 0
      * — caller aligns with its pack's mapping), then `blocks` as
      * (coeffs, nC) pairs in §6.4.3 scan order for the coded 8×8s. */
    final case class MvResid(mvd: (Int, Int), cbpCode: Int,
      qpDelta: Int, blocks: Seq[(Array[Int], Int)]) extends PMb
    /** I_16x16 intra-refresh block: DC-only luma coefficient `v` at the
      * slice QP, prediction mode `predMode`, cbp 0. `nC` must equal the
      * decoder's §9.2.1 context at the block's position (0 when the
      * MB's left/above neighbours are skips or residual-free inter MBs).
      */
    final case class I16Dc(v: Int, predMode: Int = 2, nC: Int = 0) extends PMb
  }

  private[ops] def pSliceRbsp(log2MaxFrameNum: Int, frameNum: Int,
      mbs: Seq[PMb], numRefL0: Int = 1,
      nalRefIdc: Int = 2, pocLsb: Int = -1): Array[Byte] = {
    val w = new VideoBitstream.BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(0) // slice_type: P
    w.ue(0) // pic_parameter_set_id
    w.u(frameNum, log2MaxFrameNum)
    if (pocLsb >= 0) w.u(pocLsb, 6) // pic_order_cnt_lsb (pocType-0 SPS)
    if (numRefL0 == 1) w.u(0, 1) // num_ref_idx_active_override_flag
    else { w.u(1, 1); w.ue(numRefL0 - 1) }
    w.u(0, 1) // ref_pic_list_modification_flag_l0
    // dec_ref_pic_marking (§7.3.3) is present only when nal_ref_idc != 0
    if (nalRefIdc != 0)
      w.u(0, 1) // adaptive_ref_pic_marking_mode_flag (sliding window)
    w.se(0) // slice_qp_delta
    w.ue(1) // disable_deblocking_filter_idc = 1
    // te(v) ref_idx_l0 = 0, once per partition, only when numRefL0 > 1
    // (§9.1.1: cMax 1 → single INVERTED bit; larger → ue)
    def refBits(n: Int): Unit = if (numRefL0 > 1) {
      var i = 0
      while (i < n) { if (numRefL0 == 2) w.u(1, 1) else w.ue(0); i += 1 }
    }
    var run = 0
    mbs.foreach {
      case PMb.Skip => run += 1
      case PMb.Mv(mx, my) =>
        w.ue(run); run = 0
        w.ue(0) // mb_type: P_L0_16x16
        refBits(1)
        w.se(mx); w.se(my) // mvd_l0[0][0]
        w.ue(0) // coded_block_pattern codeNum 0 → cbp 0 (no residual)
      case PMb.Mv16x8(t, b) =>
        w.ue(run); run = 0
        w.ue(1) // mb_type: P_L0_L0_16x8
        refBits(2)
        w.se(t._1); w.se(t._2); w.se(b._1); w.se(b._2)
        w.ue(0) // cbp 0
      case PMb.Mv8x16(l, r) =>
        w.ue(run); run = 0
        w.ue(2) // mb_type: P_L0_L0_8x16
        refBits(2)
        w.se(l._1); w.se(l._2); w.se(r._1); w.se(r._2)
        w.ue(0) // cbp 0
      case PMb.Mv8x8(mvds) =>
        w.ue(run); run = 0
        w.ue(3) // mb_type: P_8x8
        var b = 0
        while (b < 4) { w.ue(0); b += 1 } // sub_mb_type: P_L0_8x8 ×4
        refBits(4)
        mvds.foreach { case (x, y) => w.se(x); w.se(y) }
        w.ue(0) // cbp 0
      case PMb.Sub8x8(subTypes, mvds) =>
        w.ue(run); run = 0
        w.ue(3) // mb_type: P_8x8
        subTypes.foreach(w.ue) // Table 7-18 per-8×8 split
        refBits(4) // one ref_idx per 8×8 partition
        mvds.foreach { case (x, y) => w.se(x); w.se(y) } // §7.3.5.2 order
        w.ue(0) // cbp 0
      case PMb.MvResid(mvd, cbpCode, qpDelta, blocks) =>
        w.ue(run); run = 0
        w.ue(0) // mb_type: P_L0_16x16
        refBits(1)
        w.se(mvd._1); w.se(mvd._2)
        w.ue(cbpCode)
        if (cbpCode != 0) w.se(qpDelta) // mb_qp_delta (cbp codes data)
        blocks.foreach { case (coeffs, nC) =>
          Cavlc.encodeResidualBlock(w, coeffs, nC, 16) }
      case PMb.I16Dc(v, predMode, nC) =>
        w.ue(run); run = 0
        // P-slice intra mb_type = 5 + I-slice mb_type; I_16x16 with
        // predMode m, cbp_chroma 0, cbp_luma 0 is I type 1 + m
        w.ue(5 + 1 + predMode)
        w.ue(0) // intra_chroma_pred_mode: DC
        w.se(0) // mb_qp_delta
        val dc = new Array[Int](16); dc(0) = v
        Cavlc.encodeResidualBlock(w, dc, nC, 16)
    }
    if (run > 0) w.ue(run) // trailing skips close the slice
    w.rbspTrailing()
    w.bytes
  }

  /** Decode ONE CAVLC P slice against the previously decoded luma plane
    * `refLuma` (the single L0 reference). Returns the reconstructed
    * luma plane, or the named refusal. `tally`, when non-null, receives
    * the macroblock partition census (index 0 skip, 1 16×16, 2 16×8,
    * 3 8×16, 4 8×8, 5 intra). The envelope (everything else refuses by
    * name, never guesses pixels):
    *   - P_Skip, P_L0_16x16, P_L0_L0_16x8, P_L0_L0_8x16 and
    *     P_8x8/P_8x8ref0 (sub_mb_type P_L0_8x8) macroblocks with
    *     block-granular §8.4.1.3 MV prediction, residual-free (inter
    *     coded_block_pattern ≠ 0 refuses: Table 9-4's inter column is
    *     not conformance-anchored here — the scaladoc's table policy;
    *     sub-8×8 splits refuse by name)
    *   - any num_ref_idx_l0_active (te(v) ref_idx parsed per
    *     partition), but only the previous frame is RETAINED — a
    *     parsed ref_idx > 0 refuses by name
    *   - I_16x16 and I_PCM intra-REFRESH macroblocks decode fully
    *     (their cbp comes from mb_type / is absent — no inter table
    *     involved); Intra_NxN in P refuses by name, as does
    *     constrained_intra_pred (its neighbour-exclusion rules are
    *     not implemented and ignoring them fabricates pixels)
    *   - no reference list modification, no weighted prediction,
    *     sliding-window marking
    *   - deblocking explicitly disabled by the stream (as the I path)
    */
  private[ops] def decodePSlice(sliceRbsp: Array[Byte],
      sps: VideoBitstream.SpsInfo, pps: H264Decode.PpsInfo,
      refLuma: Array[Byte], nalRefIdc: Int = 2,
      tally: Array[Int] = null,
      // color GOP mode: reference chroma planes (Array(cb, cr)) and
      // caller-allocated OUTPUT planes — §8.4.2.2.2 eighth-sample
      // bilinear MC for inter blocks, §8.3.4/§8.5.11 reconstruction for
      // intra-refresh MBs, I_PCM passthrough
      refColor: Array[Array[Byte]] = null,
      outColor: Array[Array[Byte]] = null,
      // length-1 holder: receives this frame's motion field (the
      // colocated picture data a following B slice's direct modes read)
      gridSink: Array[MvGrid] = null,
      pack: Option[ConfPack.Pack] = None): Either[String, Array[Byte]] = {
    val mbw = sps.widthMbs
    val mbh = sps.heightMbs
    val nMbs = mbw.toLong * mbh
    val wlE = H264Decode.resolveLumaIntraWeights(sps, pps)
    if (pps.entropyCabac)
      Left("CABAC P slice not supported (inter binarizations not carried)")
    else if (pps.weightedPred)
      Left("weighted prediction not supported")
    else if (pps.numSliceGroups > 1) Left("FMO not supported")
    else if (sps.frameMbsOnly != 1) Left("interlaced stream not supported")
    else if (sps.bitDepthLuma != 8 || sps.bitDepthChroma != 8)
      Left(s"bit depth ${sps.bitDepthLuma}/${sps.bitDepthChroma} " +
        "not supported (only 8-bit)")
    else if (sps.pocType == 1) Left("pic_order_cnt_type 1 not supported")
    else if (sps.chromaFormatIdc > 1)
      Left("chroma format beyond 4:2:0 not supported")
    else if (outColor != null && sps.chromaFormatIdc != 1)
      Left("color GOP requires 4:2:0 (monochrome has no chroma)")
    else if (outColor != null &&
        (sps.scalingMatrixPresent || pps.scalingMatrix))
      Left("chroma reconstruction under scaling matrices not supported " +
        "(chroma weight lists are not retained; flat weights decode)")
    else if (outColor != null && (refColor == null ||
        refColor(0).length != mbw * 8 * mbh * 8))
      Left("no decoded reference chroma for color P slice")
    else if (wlE.isLeft) Left(wlE.swap.toOption.get)
    else if (pps.picInitQp < 0 || pps.picInitQp > 51)
      Left(s"pic_init_qp ${pps.picInitQp} out of range")
    else if (refLuma == null || refLuma.length != mbw * 16 * mbh * 16)
      Left("no decoded reference frame for P slice")
    else {
      val w = mbw * 16
      val h = mbh * 16
      val luma = new Array[Byte](w * h)
      val rd = new VideoBitstream.BitReader(sliceRbsp)
      val firstMb = rd.ue()
      val sliceType = rd.ue()
      if (firstMb != 0) Left("multi-slice P frame not supported")
      else if (sliceType > 9 || sliceType % 5 != 0)
        // §7.4.3 bounds slice_type to 0..9: an out-of-range value whose
        // %5 happens to be 0 is a corrupt header, and parsing on could
        // ship wrong pixels with decode_error null — refuse by name
        Left(s"not a P slice (slice_type $sliceType)")
      else {
        rd.ue() // pic_parameter_set_id
        rd.u(sps.log2MaxFrameNum) // frame_num
        if (sps.pocType == 0) rd.u(sps.log2MaxPocLsb)
        if (pps.bottomFieldPocPresent && sps.pocType == 0) rd.se()
        if (pps.redundantPicCntPresent) rd.ue()
        // num_ref_idx_active_override (§7.3.3): more than one active
        // reference makes ref_idx_l0 te(v) syntax appear per partition
        // — parsed below; only a parsed ref_idx pointing BEYOND the
        // retained previous frame refuses (per macroblock, by name)
        var numRefL0 = pps.numRefIdxL0Default
        if (rd.u1() == 1) numRefL0 = rd.ue() + 1
        if (numRefL0 < 1 || numRefL0 > 16)
          return Left(s"num_ref_idx_l0_active $numRefL0 out of range")
        // ref_pic_list_modification (§7.3.3.1)
        if (rd.u1() == 1)
          return Left("ref_pic_list_modification not supported")
        // dec_ref_pic_marking (§7.3.3.3), non-IDR: only when ref_idc != 0
        if (nalRefIdc != 0 && rd.u1() == 1)
          return Left("adaptive ref pic marking not supported " +
            "(sliding window only)")
        var qPY = pps.picInitQp + rd.se() // slice_qp_delta
        var deblockOff = false
        if (pps.deblockControlPresent) {
          val idc = rd.ue()
          deblockOff = idc == 1
          if (idc != 1) { rd.se(); rd.se() }
        }
        if (!deblockOff)
          return Left("in-loop deblocking not implemented " +
            "(stream does not disable it)")
        val wl = wlE.toOption.get
        val g = new MvGrid(mbw, mbh)
        if (gridSink != null) gridSink(0) = g
        // §9.2.1 nC grids — in a P slice EVERY decoded MB defines its
        // blocks' TotalCoeffs (0 for skips and residual-free inter MBs);
        // -1 marks outside-picture / not-yet-decoded, as in the I path
        val nCoef = Array.fill(mbw * 4 * mbh * 4)(-1)
        def nCFor(bx: Int, by: Int): Int = {
          val nA = if (bx > 0) nCoef(by * mbw * 4 + bx - 1) else -1
          val nB = if (by > 0) nCoef((by - 1) * mbw * 4 + bx) else -1
          if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
          else if (nA >= 0) nA else if (nB >= 0) nB else 0
        }
        val nCoefC = Array(Array.fill(mbw * 2 * mbh * 2)(-1),
          Array.fill(mbw * 2 * mbh * 2)(-1))
        def nCForC(comp: Int, cx: Int, cy: Int): Int = {
          val gr = nCoefC(comp)
          val nA = if (cx > 0) gr(cy * mbw * 2 + cx - 1) else -1
          val nB = if (cy > 0) gr((cy - 1) * mbw * 2 + cx) else -1
          if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
          else if (nA >= 0) nA else if (nB >= 0) nB else 0
        }
        val cBlkX = Array(0, 1, 0, 1)
        val cBlkY = Array(0, 0, 1, 1)
        def setMbNc(mbx: Int, mby: Int, v: Int): Unit = {
          var b = 0
          while (b < 16) {
            nCoef((mby * 4 + H264Decode.Blk4x4Y(b)) * mbw * 4 +
              mbx * 4 + H264Decode.Blk4x4X(b)) = v
            b += 1
          }
          b = 0
          while (b < 4) {
            nCoefC(0)((mby * 2 + cBlkY(b)) * mbw * 2 + mbx * 2 + cBlkX(b)) = v
            nCoefC(1)((mby * 2 + cBlkY(b)) * mbw * 2 + mbx * 2 + cBlkX(b)) = v
            b += 1
          }
        }
        // chroma stage shared with the I path ([[H264Decode.ChromaCtx]]):
        // parse-only without planes, full reconstruction with them
        val chromaCtx = new H264Decode.ChromaCtx(outColor, mbw,
          pps.chromaQpOffset, qpcBent = pack.flatMap(_.qpcBent).orNull)
        val chromaH = mbh * 8
        def consumeChroma(cbpChroma: Int, mbx: Int, mby: Int,
            chromaPred: Int = 0, qPYNow: Int = 0,
            interBase: Boolean = false): String =
          if (sps.chromaFormatIdc != 1) null
          else chromaCtx.stage(rd, cbpChroma, chromaPred, mbx, mby, qPYNow,
            nCForC,
            (comp, cx, cy, v) => nCoefC(comp)(cy * mbw * 2 + cx) = v,
            interBase = interBase)
        // inter chroma MC for one partition (luma block coords/sizes)
        def interChroma(bx: Int, by: Int, w4: Int, h4: Int,
            mvX: Int, mvY: Int): Unit =
          if (outColor != null) {
            var comp = 0
            while (comp < 2) {
              chromaCtx.predictInter(refColor(comp), outColor(comp),
                chromaH, bx * 2, by * 2, w4 * 2, h4 * 2, mvX, mvY)
              comp += 1
            }
          }
        val dc = new Array[Int](16)
        val d = new Array[Int](16)
        val pred = new Array[Int](256)
        var mb = 0
        var bad: String = null
        try {
          while (mb < nMbs && bad == null) {
            // §7.3.4 CAVLC P slice_data: mb_skip_run precedes each
            // coded macroblock (and may consume the slice tail)
            var skipRun = rd.ue()
            while (skipRun > 0 && mb < nMbs) {
              val mbx = (mb % mbw).toInt
              val mby = (mb / mbw).toInt
              val (mvX, mvY) = skipMv(g, mbx, mby)
              predict16x16(refLuma, luma, w, h, mbx * 16, mby * 16, mvX, mvY)
              interChroma(mbx * 4, mby * 4, 4, 4, mvX, mvY)
              g.set(mbx, mby, mvX, mvY)
              setMbNc(mbx, mby, 0)
              if (tally != null) tally(0) += 1
              mb += 1
              skipRun -= 1
            }
            if (skipRun > 0) bad = "mb_skip_run past the last macroblock"
            else if (mb < nMbs) {
              val mbx = (mb % mbw).toInt
              val mby = (mb / mbw).toInt
              val mbType = rd.ue()
              if (mbType <= 4) {
                // inter partitions (Table 7-13): P_L0_16x16 (0),
                // P_L0_L0_16x8 (1), P_L0_L0_8x16 (2), P_8x8 (3),
                // P_8x8ref0 (4). §7.3.5.1/§7.3.5.2 ordering: sub_mb_type
                // ×4 (P_8x8 family), then ALL ref_idx_l0 (one per 8×8
                // partition), then ALL mvds (one per SUB-partition,
                // mbPartIdx-major).
                val subTypes = new Array[Int](4)
                var anySplit = false
                if (mbType >= 3) {
                  var b = 0
                  while (b < 4 && bad == null) {
                    val st = rd.ue()
                    // Table 7-18: 0 = P_L0_8x8, 1 = P_L0_8x4,
                    // 2 = P_L0_4x8, 3 = P_L0_4x4
                    if (st > 3)
                      bad = s"malformed sub_mb_type $st " +
                        "(Table 7-18 defines 0..3)"
                    else {
                      subTypes(b) = st
                      if (st != 0) anySplit = true
                    }
                    b += 1
                  }
                }
                if (bad == null) {
                  // partition geometry in 4×4-block units
                  val (pxs, pys, pws, phs, kinds) = mbType match {
                    case 0 => (Array(0), Array(0), Array(4), Array(4),
                      Array(PartGeneral))
                    case 1 => (Array(0, 0), Array(0, 2), Array(4, 4),
                      Array(2, 2), Array(Part16x8Top, Part16x8Bottom))
                    case 2 => (Array(0, 2), Array(0, 0), Array(2, 2),
                      Array(4, 4), Array(Part8x16Left, Part8x16Right))
                    case _ =>
                      // P_8x8 family: Table 7-18 sub-partition geometry
                      // per 8×8, emitted in §7.3.5.2 decode order
                      // (mbPartIdx-major, raster within each 8×8) —
                      // the order BOTH the mvd syntax and the §8.4.1.3
                      // neighbour availability depend on
                      val xs = new scala.collection.mutable.ArrayBuffer[Int](16)
                      val ys = new scala.collection.mutable.ArrayBuffer[Int](16)
                      val ws = new scala.collection.mutable.ArrayBuffer[Int](16)
                      val hs = new scala.collection.mutable.ArrayBuffer[Int](16)
                      var b = 0
                      while (b < 4) {
                        val ox = (b & 1) * 2
                        val oy = (b >> 1) * 2
                        subTypes(b) match {
                          case 0 => // one 8×8
                            xs += ox; ys += oy; ws += 2; hs += 2
                          case 1 => // two 8×4 (top, bottom)
                            xs += ox; ys += oy; ws += 2; hs += 1
                            xs += ox; ys += oy + 1; ws += 2; hs += 1
                          case 2 => // two 4×8 (left, right)
                            xs += ox; ys += oy; ws += 1; hs += 2
                            xs += ox + 1; ys += oy; ws += 1; hs += 2
                          case _ => // four 4×4, raster
                            var s = 0
                            while (s < 4) {
                              xs += ox + (s & 1); ys += oy + (s >> 1)
                              ws += 1; hs += 1
                              s += 1
                            }
                        }
                        b += 1
                      }
                      (xs.toArray, ys.toArray, ws.toArray, hs.toArray,
                        Array.fill(xs.length)(PartGeneral))
                  }
                  val nPart = pxs.length
                  // ref_idx_l0 te(v) per 8×8 PARTITION (mbPartIdx — a
                  // sub-split shares its 8×8's reference) — absent when
                  // one reference is active or mb_type is P_8x8ref0
                  // (ref 0 implicit). A parsed index > 0 names the
                  // refusal: only the previous frame is retained.
                  if (numRefL0 > 1 && mbType != 4) {
                    val nRef = if (mbType >= 3) 4 else nPart
                    var p = 0
                    while (p < nRef && bad == null) {
                      val ri = if (numRefL0 == 2) 1 - rd.u1() else rd.ue()
                      if (ri >= numRefL0)
                        bad = s"ref_idx_l0 $ri out of range " +
                          s"($numRefL0 active)"
                      else if (ri != 0)
                        bad = s"ref_idx_l0 $ri refers beyond the previous " +
                          "frame (single decoded-reference window)"
                      p += 1
                    }
                  }
                  if (bad == null) {
                    val mvdX = new Array[Int](nPart)
                    val mvdY = new Array[Int](nPart)
                    var p = 0
                    while (p < nPart) {
                      mvdX(p) = rd.se(); mvdY(p) = rd.se(); p += 1
                    }
                    p = 0
                    while (p < nPart) {
                      val bx = mbx * 4 + pxs(p)
                      val by = mby * 4 + pys(p)
                      val (prx, pry) =
                        mvPredPart(g, bx, by, pws(p), phs(p), 0, kinds(p))
                      val mvX = prx + mvdX(p)
                      val mvY = pry + mvdY(p)
                      predictBlock(refLuma, luma, w, h, bx * 4, by * 4,
                        pws(p) * 4, phs(p) * 4, mvX, mvY)
                      interChroma(bx, by, pws(p), phs(p), mvX, mvY)
                      g.setBlk(bx, by, pws(p), phs(p), mvX, mvY)
                      p += 1
                    }
                    val cbpCode = rd.ue()
                    // codeNum 0 = cbp 0 in Table 9-4's inter column (the
                    // one anchored row); anything else needs the full
                    // column from the conformance pack
                    if (cbpCode == 0) setMbNc(mbx, mby, 0)
                    else pack.flatMap(_.interCbp) match {
                      case None =>
                        bad = "inter residual not supported (Table " +
                          "9-4's inter cbp column is data — provide it " +
                          "via the conformance pack " +
                          s"(${ConfPack.SparkConfKey} slot interCbp) " +
                          "to unlock; codeNum 0 = no residual decodes)"
                      case Some(map) =>
                        decodeInterResidual(rd, sps, pps, map, cbpCode,
                          mbx, mby, luma, w, qPY,
                          nCFor, (gx, gy, tc) =>
                            nCoef(gy * mbw * 4 + gx) = tc,
                          (cbpC, qp) => consumeChroma(cbpC, mbx, mby,
                            qPYNow = qp, interBase = true)) match {
                          case Left(msg) => bad = msg
                          case Right(qp) => qPY = qp
                        }
                    }
                    if (bad == null) {
                      if (tally != null) {
                        tally(1 + (if (mbType >= 3) 3 else mbType)) += 1
                        // census slot 6: 8×8 MBs that split further
                        // (any sub_mb_type != 0)
                        if (anySplit && tally.length > 6) tally(6) += 1
                      }
                      mb += 1
                    }
                  }
                }
              } else if (mbType == 5)
                bad = "Intra_NxN macroblock in P slice not supported " +
                  "(I_16x16 and I_PCM refresh blocks decode)"
              else if (mbType == 30) { // I_PCM (P mb_type 5 + 25)
                rd.alignByte()
                val px = mbx * 16
                val py = mby * 16
                var i = 0
                while (i < 256) {
                  luma((py + i / 16) * w + px + i % 16) = rd.u(8).toByte
                  i += 1
                }
                if (sps.chromaFormatIdc == 1) {
                  // pcm_sample_chroma: 64 Cb then 64 Cr, raster (§7.3.5)
                  var c = 0
                  while (c < 128) {
                    val v = rd.u(8)
                    if (outColor != null) {
                      val o = c & 63
                      outColor(c >> 6)((mby * 8 + o / 8) * (mbw * 8) +
                        mbx * 8 + o % 8) = v.toByte
                    }
                    c += 1
                  }
                }
                setMbNc(mbx, mby, 16)
                g.markIntra(mbx, mby)
                if (tally != null) tally(5) += 1
                mb += 1
              } else if (mbType >= 6 && mbType <= 29) {
                // I_16x16 intra-refresh block (P mb_type 5 + I type 1+k)
                if (pps.constrainedIntraPred)
                  bad = "constrained_intra_pred in a P slice not " +
                    "supported (intra prediction here reads inter " +
                    "neighbours; decoding would fabricate pixels)"
                else {
                  val k = mbType - 6
                  val predMode = k % 4
                  val cbpChroma = (k / 4) % 3
                  val cbpLuma = if (k >= 12) 15 else 0
                  val chromaPred =
                    if (sps.chromaFormatIdc == 1) rd.ue() else 0
                  if (chromaPred > 3) bad = "malformed intra_chroma_pred_mode"
                  else {
                    qPY = Math.floorMod(qPY + rd.se() + 52, 52)
                    val (dcScan, _) = Cavlc.decodeResidualBlock(rd,
                      nCFor(mbx * 4, mby * 4), 16)
                    var i = 0
                    while (i < 16) {
                      dc(H264Decode.Zigzag4x4(i)) = dcScan(i); i += 1
                    }
                    H264Decode.hadamard4x4(dc)
                    i = 0
                    while (i < 16) {
                      dc(i) = H264Decode.dequantDc(dc(i), qPY, wl); i += 1
                    }
                    val px = mbx * 16
                    val py = mby * 16
                    bad = H264Decode.predictIntra16(predMode, mbx, mby,
                      luma, w, pred)
                    if (bad == null) {
                      var b = 0
                      while (b < 16 && bad == null) {
                        val bx4 = H264Decode.Blk4x4X(b)
                        val by4 = H264Decode.Blk4x4Y(b)
                        java.util.Arrays.fill(d, 0)
                        var tc = 0
                        if (cbpLuma != 0) {
                          val (acScan, total) = Cavlc.decodeResidualBlock(rd,
                            nCFor(mbx * 4 + bx4, mby * 4 + by4), 15)
                          tc = total
                          var i2 = 0
                          while (i2 < 15) {
                            val raster = H264Decode.Zigzag4x4(i2 + 1)
                            d(raster) =
                              H264Decode.dequantAc(acScan(i2), raster, qPY, wl)
                            i2 += 1
                          }
                        }
                        nCoef((mby * 4 + by4) * mbw * 4 + mbx * 4 + bx4) = tc
                        d(0) = dc(by4 * 4 + bx4)
                        H264Decode.idct4x4(d)
                        var yy = 0
                        while (yy < 4) {
                          var xx = 0
                          while (xx < 4) {
                            luma((py + by4 * 4 + yy) * w + px + bx4 * 4 + xx) =
                              H264Decode.clip1(
                                pred((by4 * 4 + yy) * 16 + bx4 * 4 + xx) +
                                  d(yy * 4 + xx))
                            xx += 1
                          }
                          yy += 1
                        }
                        b += 1
                      }
                      if (bad == null) {
                        bad = consumeChroma(cbpChroma, mbx, mby,
                          chromaPred, qPY)
                      }
                      if (bad == null) {
                        // intra MB: neighbours see a decoded block that
                        // never refIdx-matches (ref −1 in the grid)
                        g.markIntra(mbx, mby)
                        if (tally != null) tally(5) += 1
                        mb += 1
                      }
                    }
                  }
                }
              } else bad = s"unsupported mb_type $mbType in P slice"
            }
          }
        } catch { case e: Cavlc.Unsupported => bad = e.getMessage }
        if (bad != null) Left(bad) else Right(luma)
      }
    }
  }

  /** One inter macroblock's CAVLC residual (§7.4.5.3) decoded ON TOP
    * of its already-motion-compensated prediction — the seam the
    * conformance pack's `interCbp` slot unlocks (Table 9-4's inter
    * coded_block_pattern column maps the parsed codeNum; everything
    * downstream is the same §8.5.12 dequant + inverse transform the
    * intra paths run, FLAT weights — scaling-matrix streams refuse by
    * name because the inter weight lists are not retained). Luma 4×4
    * blocks carry all 16 coefficients; chroma goes through the shared
    * [[H264Decode.ChromaCtx]] stage in inter-base mode (prediction =
    * the MC output already in the planes). Returns the updated QPY
    * (mb_qp_delta applies when the cbp codes anything) or a refusal.
    */
  private def decodeInterResidual(rd: VideoBitstream.BitReader,
      sps: VideoBitstream.SpsInfo, pps: H264Decode.PpsInfo,
      interCbp: Array[Int], cbpCode: Int,
      mbx: Int, mby: Int,
      luma: Array[Byte], w: Int, qPYIn: Int,
      nCFor: (Int, Int) => Int,
      setNc: (Int, Int, Int) => Unit,
      stageChroma: (Int, Int) => String): Either[String, Int] = {
    if (cbpCode > 47)
      Left(s"malformed coded_block_pattern (codeNum $cbpCode)")
    else if (sps.scalingMatrixPresent || pps.scalingMatrix)
      Left("inter residual under scaling matrices not supported " +
        "(inter weight lists are not retained; flat weights decode)")
    else {
      val cbp = interCbp(cbpCode)
      val cbpLuma = cbp & 15
      val cbpChroma = cbp >> 4
      var qPY = qPYIn
      if (cbp != 0) qPY = Math.floorMod(qPY + rd.se() + 52, 52)
      val d = new Array[Int](16)
      var b2 = 0
      while (b2 < 16) {
        val bx4 = H264Decode.Blk4x4X(b2)
        val by4 = H264Decode.Blk4x4Y(b2)
        val gx = mbx * 4 + bx4
        val gy = mby * 4 + by4
        var tc = 0
        if ((cbpLuma & (1 << (b2 >> 2))) != 0) {
          val (scan, total) =
            Cavlc.decodeResidualBlock(rd, nCFor(gx, gy), 16)
          tc = total
          java.util.Arrays.fill(d, 0)
          var i = 0
          while (i < 16) {
            val raster = H264Decode.Zigzag4x4(i)
            d(raster) = H264Decode.dequantAc(scan(i), raster, qPY,
              H264Decode.Flat4x4)
            i += 1
          }
          H264Decode.idct4x4(d)
          val px = mbx * 16 + bx4 * 4
          val py = mby * 16 + by4 * 4
          var yy = 0
          while (yy < 4) {
            var xx = 0
            while (xx < 4) {
              val o = (py + yy) * w + px + xx
              luma(o) = H264Decode.clip1((luma(o) & 0xff) + d(yy * 4 + xx))
              xx += 1
            }
            yy += 1
          }
        }
        setNc(gx, gy, tc)
        b2 += 1
      }
      val bad = stageChroma(cbpChroma, qPY)
      if (bad != null) Left(bad) else Right(qPY)
    }
  }

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** B-slice motion compensation WITHOUT residual — the last slice
    * class of the restricted inter envelope. Decodes B_Skip,
    * B_Direct_16x16 (spatial §8.4.1.2.2 AND temporal §8.4.1.2.3 direct,
    * colocated motion sampled per 8×8 corner under
    * direct_8x8_inference_flag = 1, per 4×4 under 0) and the explicit
    * 16×16 types B_L0/B_L1/B_Bi (Table 7-14 codes 1/2/3), with
    * bi-prediction as the §8.4.2.3.1 DEFAULT average — weighted
    * prediction (weighted_bipred_idc 1/2) refuses by name, as do
    * two-partition B types (Table 7-14 pair rows 4..21 are a printed
    * table kept under the no-unanchored-tables policy), B_8x8, intra
    * macroblocks in B slices, and any residual (inter cbp codeNum != 0,
    * the same Table 9-4 anchor refusal as the P path).
    *
    * References: `refL0` = the nearest PAST reference picture, `refL1`
    * = the nearest FUTURE reference (by POC — the caller brackets);
    * `colGrid` = the motion field of the list-1 picture (null = intra
    * picture → colocated blocks derive mvCol 0 / refIdxCol intra).
    * Requires pic_order_cnt_type 0 (display order is data, not decode
    * order). In-frame prediction keeps one [[MvGrid]] PER LIST: a
    * neighbour that does not use a list is decoded-but-never-matching
    * there (ref −1), exactly like intra neighbours in the P path.
    */
  private[ops] def decodeBSlice(sliceRbsp: Array[Byte],
      sps: VideoBitstream.SpsInfo, pps: H264Decode.PpsInfo,
      refL0: Array[Byte], refL1: Array[Byte],
      pocCur: Int, pocL0: Int, pocL1: Int,
      colGrid: MvGrid, nalRefIdc: Int = 0,
      tally: Array[Int] = null,
      refColorL0: Array[Array[Byte]] = null,
      refColorL1: Array[Array[Byte]] = null,
      outColor: Array[Array[Byte]] = null,
      pack: Option[ConfPack.Pack] = None): Either[String, Array[Byte]] = {
    val mbw = sps.widthMbs
    val mbh = sps.heightMbs
    val nMbs = mbw.toLong * mbh
    if (pps.entropyCabac)
      Left("CABAC B slice not supported (inter binarizations not carried)")
    else if (pps.weightedBipred != 0)
      Left(s"weighted bi-prediction not supported (weighted_bipred_idc " +
        s"${pps.weightedBipred}; only the default §8.4.2.3.1 average)")
    else if (pps.numSliceGroups > 1) Left("FMO not supported")
    else if (sps.frameMbsOnly != 1) Left("interlaced stream not supported")
    else if (sps.bitDepthLuma != 8 || sps.bitDepthChroma != 8)
      Left(s"bit depth ${sps.bitDepthLuma}/${sps.bitDepthChroma} " +
        "not supported (only 8-bit)")
    else if (sps.pocType != 0)
      Left(s"B decode requires pic_order_cnt_type 0 (type ${sps.pocType} " +
        "carries no display order to bracket references)")
    else if (sps.chromaFormatIdc > 1)
      Left("chroma format beyond 4:2:0 not supported")
    else if (outColor != null && sps.chromaFormatIdc != 1)
      Left("color GOP requires 4:2:0 (monochrome has no chroma)")
    else if (outColor != null && (refColorL0 == null || refColorL1 == null ||
        refColorL0(0).length != mbw * 8 * mbh * 8 ||
        refColorL1(0).length != mbw * 8 * mbh * 8))
      Left("no decoded reference chroma for color B slice")
    else if (pps.picInitQp < 0 || pps.picInitQp > 51)
      Left(s"pic_init_qp ${pps.picInitQp} out of range")
    else if (refL0 == null || refL1 == null ||
        refL0.length != mbw * 16 * mbh * 16 ||
        refL1.length != mbw * 16 * mbh * 16)
      Left("B slice without two decoded reference frames")
    else {
      val w = mbw * 16
      val h = mbh * 16
      val luma = new Array[Byte](w * h)
      val scratch = new Array[Byte](w * h) // list-1 side of bi-prediction
      val rd = new VideoBitstream.BitReader(sliceRbsp)
      val firstMb = rd.ue()
      val sliceType = rd.ue()
      if (firstMb != 0) Left("multi-slice B frame not supported")
      else if (sliceType > 9 || sliceType % 5 != 1)
        Left(s"not a B slice (slice_type $sliceType)")
      else {
        rd.ue() // pic_parameter_set_id
        rd.u(sps.log2MaxFrameNum) // frame_num
        rd.u(sps.log2MaxPocLsb) // pic_order_cnt_lsb (pocType 0 enforced)
        if (pps.bottomFieldPocPresent) rd.se()
        if (pps.redundantPicCntPresent) rd.ue()
        val spatialDirect = rd.u1() == 1 // direct_spatial_mv_pred_flag
        var numRefL0 = pps.numRefIdxL0Default
        var numRefL1 = pps.numRefIdxL1Default
        if (rd.u1() == 1) {
          numRefL0 = rd.ue() + 1
          numRefL1 = rd.ue() + 1
        }
        if (numRefL0 < 1 || numRefL0 > 16 || numRefL1 < 1 || numRefL1 > 16)
          return Left(s"num_ref_idx_active $numRefL0/$numRefL1 out of range")
        if (rd.u1() == 1) // ref_pic_list_modification_flag_l0
          return Left("ref_pic_list_modification not supported")
        if (rd.u1() == 1) // ref_pic_list_modification_flag_l1
          return Left("ref_pic_list_modification not supported")
        // dec_ref_pic_marking (§7.3.3), non-IDR: only when ref_idc != 0
        if (nalRefIdc != 0 && rd.u1() == 1)
          return Left("adaptive ref pic marking not supported " +
            "(sliding window only)")
        var qPY = pps.picInitQp + rd.se() // slice_qp_delta
        var deblockOff = false
        if (pps.deblockControlPresent) {
          val idc = rd.ue()
          deblockOff = idc == 1
          if (idc != 1) { rd.se(); rd.se() }
        }
        if (!deblockOff)
          return Left("in-loop deblocking not implemented " +
            "(stream does not disable it)")
        val gL0 = new MvGrid(mbw, mbh)
        val gL1 = new MvGrid(mbw, mbh)
        // §9.2.1 nC grids (as in the P path) — needed the moment any
        // B macroblock carries residual via the conformance pack
        val nCoef = Array.fill(mbw * 4 * mbh * 4)(-1)
        def nCFor(bx: Int, by: Int): Int = {
          val nA = if (bx > 0) nCoef(by * mbw * 4 + bx - 1) else -1
          val nB = if (by > 0) nCoef((by - 1) * mbw * 4 + bx) else -1
          if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
          else if (nA >= 0) nA else if (nB >= 0) nB else 0
        }
        val nCoefC = Array(Array.fill(mbw * 2 * mbh * 2)(-1),
          Array.fill(mbw * 2 * mbh * 2)(-1))
        def nCForC(comp: Int, cx: Int, cy: Int): Int = {
          val gr = nCoefC(comp)
          val nA = if (cx > 0) gr(cy * mbw * 2 + cx - 1) else -1
          val nB = if (cy > 0) gr((cy - 1) * mbw * 2 + cx) else -1
          if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
          else if (nA >= 0) nA else if (nB >= 0) nB else 0
        }
        val cBlkX = Array(0, 1, 0, 1)
        val cBlkY = Array(0, 0, 1, 1)
        def setMbNc(mbx: Int, mby: Int, v: Int): Unit = {
          var b = 0
          while (b < 16) {
            nCoef((mby * 4 + H264Decode.Blk4x4Y(b)) * mbw * 4 +
              mbx * 4 + H264Decode.Blk4x4X(b)) = v
            b += 1
          }
          b = 0
          while (b < 4) {
            nCoefC(0)((mby * 2 + cBlkY(b)) * mbw * 2 + mbx * 2 + cBlkX(b)) = v
            nCoefC(1)((mby * 2 + cBlkY(b)) * mbw * 2 + mbx * 2 + cBlkX(b)) = v
            b += 1
          }
        }
        // §8.4.1.2.3 temporal scaling factors (POCs are data here)
        val tb = clip3(-128, 127, pocCur - pocL0)
        val td = clip3(-128, 127, pocL1 - pocL0)
        val dsf = if (td == 0) 256 else {
          val tx = (16384 + math.abs(td / 2)) / td
          clip3(-1024, 1023, (tb * tx + 32) >> 6)
        }
        val chromaH = mbh * 8
        val chromaCtx = new H264Decode.ChromaCtx(outColor, mbw,
          pps.chromaQpOffset, qpcBent = pack.flatMap(_.qpcBent).orNull)
        def consumeChroma(cbpChroma: Int, mbx: Int, mby: Int,
            qPYNow: Int): String =
          if (sps.chromaFormatIdc != 1) null
          else chromaCtx.stage(rd, cbpChroma, 0, mbx, mby, qPYNow,
            nCForC,
            (comp, cx, cy, v) => nCoefC(comp)(cy * mbw * 2 + cx) = v,
            interBase = true)
        val cScratch: Array[Array[Byte]] =
          if (outColor == null) null
          else Array(new Array[Byte](outColor(0).length),
            new Array[Byte](outColor(0).length))
        // MC for one partition (luma 4×4-block coords/sizes) from the
        // used list(s); bi = §8.4.2.3.1 default average of both
        def predict(bx: Int, by: Int, w4: Int, h4: Int,
            use0: Boolean, mv0: (Int, Int),
            use1: Boolean, mv1: (Int, Int)): Unit = {
          val px = bx * 4; val py = by * 4
          val pw = w4 * 4; val ph = h4 * 4
          if (use0) predictBlock(refL0, luma, w, h, px, py, pw, ph,
            mv0._1, mv0._2)
          if (use1) predictBlock(refL1, if (use0) scratch else luma,
            w, h, px, py, pw, ph, mv1._1, mv1._2)
          if (use0 && use1) {
            var yy = 0
            while (yy < ph) {
              var xx = 0
              while (xx < pw) {
                val o = (py + yy) * w + px + xx
                luma(o) = (((luma(o) & 0xff) + (scratch(o) & 0xff) + 1)
                  >> 1).toByte
                xx += 1
              }
              yy += 1
            }
          }
          if (outColor != null) {
            var comp = 0
            while (comp < 2) {
              if (use0) chromaCtx.predictInter(refColorL0(comp),
                outColor(comp), chromaH, bx * 2, by * 2, w4 * 2, h4 * 2,
                mv0._1, mv0._2)
              if (use1) chromaCtx.predictInter(refColorL1(comp),
                if (use0) cScratch(comp) else outColor(comp),
                chromaH, bx * 2, by * 2, w4 * 2, h4 * 2, mv1._1, mv1._2)
              if (use0 && use1) {
                val cw = mbw * 8
                var yy = 0
                while (yy < h4 * 2) {
                  var xx = 0
                  while (xx < w4 * 2) {
                    val o = (by * 2 + yy) * cw + bx * 2 + xx
                    outColor(comp)(o) = (((outColor(comp)(o) & 0xff) +
                      (cScratch(comp)(o) & 0xff) + 1) >> 1).toByte
                    xx += 1
                  }
                  yy += 1
                }
              }
              comp += 1
            }
          }
          gL0.setBlk(bx, by, w4, h4, mv0._1, mv0._2,
            if (use0) 0 else -1)
          gL1.setBlk(bx, by, w4, h4, mv1._1, mv1._2,
            if (use1) 0 else -1)
        }
        // colocated motion at a 4×4 block of the list-1 picture
        // (§8.4.1.2.1): intra / no grid → refIdxCol −1, mvCol 0
        def colAt(bx4: Int, by4: Int): (Int, Int, Int) =
          if (colGrid == null) (-1, 0, 0)
          else {
            val r = colGrid.refB(bx4, by4)
            if (r < 0) (-1, 0, 0)
            else (r, colGrid.mvx(by4 * colGrid.bw + bx4),
              colGrid.mvy(by4 * colGrid.bw + bx4))
          }
        // §8.4.1.2.2 spatial direct MB-level derivation: list refs are
        // the min positive over neighbours A/B/C (C→D substitution),
        // mv predictions the §8.4.1.3 medians; both lists refless →
        // direct zero prediction (refs 0, zero vectors, no colZero)
        def spatialMb(mbx: Int, mby: Int): (Boolean, Int, (Int, Int),
            Int, (Int, Int)) = {
          val bx = mbx * 4; val by = mby * 4
          def minPos(g: MvGrid): Int = {
            val rA = g.refB(bx - 1, by)
            val rB = g.refB(bx, by - 1)
            val rC = {
              val c = g.refB(bx + 4, by - 1)
              if (c >= -1) c else g.refB(bx - 1, by - 1)
            }
            var m = -1
            if (rA >= 0) m = rA
            if (rB >= 0 && (m < 0 || rB < m)) m = rB
            if (rC >= 0 && (m < 0 || rC < m)) m = rC
            m
          }
          val r0 = minPos(gL0)
          val r1 = minPos(gL1)
          if (r0 < 0 && r1 < 0) (true, 0, (0, 0), 0, (0, 0))
          else (false, r0,
            if (r0 >= 0) mvPredPart(gL0, bx, by, 4, 4, r0, PartGeneral)
            else (0, 0),
            r1,
            if (r1 >= 0) mvPredPart(gL1, bx, by, 4, 4, r1, PartGeneral)
            else (0, 0))
        }
        // direct prediction for one MB (B_Skip and B_Direct_16x16):
        // per-8×8 colocated corner sampling under inference = 1,
        // per-4×4 under 0. Returns a refusal or null.
        def directMb(mbx: Int, mby: Int): String = {
          val inf8 = sps.direct8x8Inference == 1
          val step = if (inf8) 2 else 1
          if (spatialDirect) {
            val (zero, r0, mvp0, r1, mvp1) = spatialMb(mbx, mby)
            if (r0 > 0 || r1 > 0)
              return s"spatial direct ref_idx ${math.max(r0, r1)} beyond " +
                "the retained reference window"
            var qy = 0
            while (qy < 4) {
              var qx = 0
              while (qx < 4) {
                val bx = mbx * 4 + qx
                val by = mby * 4 + qy
                // inference = 1 samples the MB's corner 4×4s
                val (cx, cy) =
                  if (inf8) (mbx * 4 + (if (qx >= 2) 3 else 0),
                    mby * 4 + (if (qy >= 2) 3 else 0))
                  else (bx, by)
                val (rc, mcx, mcy) = colAt(cx, cy)
                val colZero = rc == 0 && mcx >= -1 && mcx <= 1 &&
                  mcy >= -1 && mcy <= 1
                val (use0, mv0) =
                  if (zero) (true, (0, 0))
                  else if (r0 < 0) (false, (0, 0))
                  else (true, if (colZero) (0, 0) else mvp0)
                val (use1, mv1) =
                  if (zero) (true, (0, 0))
                  else if (r1 < 0) (false, (0, 0))
                  else (true, if (colZero) (0, 0) else mvp1)
                predict(bx, by, step, step, use0, mv0, use1, mv1)
                qx += step
              }
              qy += step
            }
            null
          } else {
            // temporal direct: scale the colocated vector by the POC
            // distances; intra colocated → zero vector, ref 0
            var qy = 0
            while (qy < 4) {
              var qx = 0
              while (qx < 4) {
                val bx = mbx * 4 + qx
                val by = mby * 4 + qy
                val (cx, cy) =
                  if (inf8) (mbx * 4 + (if (qx >= 2) 3 else 0),
                    mby * 4 + (if (qy >= 2) 3 else 0))
                  else (bx, by)
                val (rc, mcx0, mcy0) = colAt(cx, cy)
                val (mcx, mcy) = if (rc < 0) (0, 0) else (mcx0, mcy0)
                val l0x = (dsf * mcx + 128) >> 8
                val l0y = (dsf * mcy + 128) >> 8
                predict(bx, by, step, step,
                  use0 = true, (l0x, l0y),
                  use1 = true, (l0x - mcx, l0y - mcy))
                qx += step
              }
              qy += step
            }
            null
          }
        }
        var mb = 0
        var bad: String = null
        // the coded_block_pattern step shared by B_Direct and the
        // explicit 16×16 types: codeNum 0 (the one anchored Table 9-4
        // row) = no residual; anything else decodes through the
        // conformance pack's interCbp slot or refuses naming it
        def interCbpStep(mbx: Int, mby: Int): String = {
          val cbpCode = rd.ue()
          if (cbpCode == 0) { setMbNc(mbx, mby, 0); null }
          else pack.flatMap(_.interCbp) match {
            case None =>
              "inter residual not supported (Table 9-4's inter cbp " +
                "column is data — provide it via the conformance pack " +
                s"(${ConfPack.SparkConfKey} slot interCbp) to unlock; " +
                "codeNum 0 = no residual decodes)"
            case Some(map) =>
              decodeInterResidual(rd, sps, pps, map, cbpCode, mbx, mby,
                luma, w, qPY, nCFor,
                (gx, gy, tc) => nCoef(gy * mbw * 4 + gx) = tc,
                (cbpC, qp) => consumeChroma(cbpC, mbx, mby, qp)) match {
                case Left(msg) => msg
                case Right(qp) => qPY = qp; null
              }
          }
        }
        try {
          while (mb < nMbs && bad == null) {
            var skipRun = rd.ue() // mb_skip_run (§7.3.4)
            while (skipRun > 0 && mb < nMbs && bad == null) {
              // B_Skip = the direct prediction, no residual (§8.4.1.2)
              val sx = (mb % mbw).toInt
              val sy = (mb / mbw).toInt
              bad = directMb(sx, sy)
              if (bad == null) {
                setMbNc(sx, sy, 0)
                if (tally != null) tally(0) += 1
                mb += 1
                skipRun -= 1
              }
            }
            if (bad != null) ()
            else if (skipRun > 0) bad = "mb_skip_run past the last macroblock"
            else if (mb < nMbs) {
              val mbx = (mb % mbw).toInt
              val mby = (mb / mbw).toInt
              val mbType = rd.ue()
              // Table 7-14 head: 0 B_Direct_16x16, 1 B_L0_16x16,
              // 2 B_L1_16x16, 3 B_Bi_16x16
              if (mbType == 0) {
                bad = directMb(mbx, mby)
                if (bad == null) {
                  bad = interCbpStep(mbx, mby)
                  if (bad == null) {
                    if (tally != null) tally(1) += 1
                    mb += 1
                  }
                }
              } else if (mbType <= 3) {
                val use0 = mbType == 1 || mbType == 3
                val use1 = mbType == 2 || mbType == 3
                // §7.3.5.1 ordering: ref_idx_l0, ref_idx_l1, mvd_l0,
                // mvd_l1 — each present only for its used list
                def refIdx(n: Int): Int =
                  if (n == 1) 0 else if (n == 2) 1 - rd.u1() else rd.ue()
                if (use0 && numRefL0 > 1) {
                  val ri = refIdx(numRefL0)
                  if (ri != 0)
                    bad = s"ref_idx_l0 $ri refers beyond the retained " +
                      "reference window"
                }
                if (bad == null && use1 && numRefL1 > 1) {
                  val ri = refIdx(numRefL1)
                  if (ri != 0)
                    bad = s"ref_idx_l1 $ri refers beyond the retained " +
                      "reference window"
                }
                if (bad == null) {
                  var mv0 = (0, 0)
                  var mv1 = (0, 0)
                  if (use0) {
                    val (px0, py0) =
                      mvPredPart(gL0, mbx * 4, mby * 4, 4, 4, 0, PartGeneral)
                    mv0 = (px0 + rd.se(), py0 + rd.se())
                  }
                  if (use1) {
                    val (px1, py1) =
                      mvPredPart(gL1, mbx * 4, mby * 4, 4, 4, 0, PartGeneral)
                    mv1 = (px1 + rd.se(), py1 + rd.se())
                  }
                  predict(mbx * 4, mby * 4, 4, 4, use0, mv0, use1, mv1)
                  bad = interCbpStep(mbx, mby)
                  if (bad == null) {
                    if (tally != null) tally(1) += 1
                    mb += 1
                  }
                }
              } else if (mbType <= 21)
                bad = s"two-partition B macroblock (mb_type $mbType) not " +
                  "supported (Table 7-14 pair rows not " +
                  "conformance-anchored)"
              else if (mbType == 22)
                bad = "B_8x8 macroblock not supported"
              else
                bad = s"intra macroblock in B slice (mb_type $mbType) " +
                  "not supported (no B-slice residual path)"
            }
          }
        } catch { case e: Cavlc.Unsupported => bad = e.getMessage }
        if (bad != null) Left(bad) else Right(luma)
      }
    }
  }

  /** Fixture macroblock spec for [[bSliceRbsp]]. */
  private[ops] sealed trait BMb
  private[ops] object BMb {
    case object Skip extends BMb
    case object Direct extends BMb
    /** B_L0_16x16 with this mvd_l0, no residual. */
    final case class L0(mvdX: Int, mvdY: Int) extends BMb
    /** B_L1_16x16 with this mvd_l1, no residual. */
    final case class L1(mvdX: Int, mvdY: Int) extends BMb
    /** B_Bi_16x16 with these mvd_l0 / mvd_l1, no residual. */
    final case class Bi(mvd0: (Int, Int), mvd1: (Int, Int)) extends BMb
    /** B_Direct_16x16 WITH residual: cbp codeNum, mb_qp_delta, then
      * (coeffs, nC) luma blocks — the pack-gated B residual fixture. */
    final case class DirectResid(cbpCode: Int, qpDelta: Int,
      blocks: Seq[(Array[Int], Int)]) extends BMb
  }

  /** Encoder twin for the B-slice walk: one CAVLC B slice over `mbs` in
    * raster order, pic_order_cnt_lsb `poc` (6 bits — the pocType-0
    * synthetic SPS), direct mode per `spatialDirect`, deblocking
    * disabled, single reference per list, no residual.
    */
  private[ops] def bSliceRbsp(log2MaxFrameNum: Int, frameNum: Int,
      poc: Int, spatialDirect: Boolean, mbs: Seq[BMb],
      nalRefIdc: Int = 0): Array[Byte] = {
    val w = new VideoBitstream.BitWriter
    w.ue(0) // first_mb_in_slice
    w.ue(1) // slice_type: B
    w.ue(0) // pic_parameter_set_id
    w.u(frameNum, log2MaxFrameNum)
    w.u(poc, 6) // pic_order_cnt_lsb
    w.u(if (spatialDirect) 1 else 0, 1) // direct_spatial_mv_pred_flag
    w.u(0, 1) // num_ref_idx_active_override_flag
    w.u(0, 1) // ref_pic_list_modification_flag_l0
    w.u(0, 1) // ref_pic_list_modification_flag_l1
    if (nalRefIdc != 0)
      w.u(0, 1) // adaptive_ref_pic_marking_mode_flag
    w.se(0) // slice_qp_delta
    w.ue(1) // disable_deblocking_filter_idc = 1
    var run = 0
    mbs.foreach {
      case BMb.Skip => run += 1
      case BMb.Direct =>
        w.ue(run); run = 0
        w.ue(0) // B_Direct_16x16
        w.ue(0) // cbp codeNum 0 → no residual
      case BMb.DirectResid(cbpCode, qpDelta, blocks) =>
        w.ue(run); run = 0
        w.ue(0) // B_Direct_16x16
        w.ue(cbpCode)
        if (cbpCode != 0) w.se(qpDelta)
        blocks.foreach { case (coeffs, nC) =>
          Cavlc.encodeResidualBlock(w, coeffs, nC, 16) }
      case BMb.L0(mx, my) =>
        w.ue(run); run = 0
        w.ue(1) // B_L0_16x16
        w.se(mx); w.se(my)
        w.ue(0)
      case BMb.L1(mx, my) =>
        w.ue(run); run = 0
        w.ue(2) // B_L1_16x16
        w.se(mx); w.se(my)
        w.ue(0)
      case BMb.Bi(mvd0, mvd1) =>
        w.ue(run); run = 0
        w.ue(3) // B_Bi_16x16
        w.se(mvd0._1); w.se(mvd0._2)
        w.se(mvd1._1); w.se(mvd1._2)
        w.ue(0)
    }
    if (run > 0) w.ue(run)
    w.rbspTrailing()
    w.bytes
  }
}
