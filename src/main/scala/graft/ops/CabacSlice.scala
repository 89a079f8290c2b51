package graft.ops

/** H.264 CABAC I-slice MACROBLOCK-LAYER syntax (ITU-T H.264 §7.3.5 under
  * entropy_coding_mode_flag = 1): mb_type, Intra_4x4 prediction modes,
  * intra_chroma_pred_mode, coded_block_pattern, mb_qp_delta,
  * residual_block_cabac (§7.3.5.3.3) and end_of_slice_flag, with the
  * §9.3.3.1 context-index derivations and the §9.3.2 binarizations over
  * the [[Cabac]] arithmetic engine. Covers the I-slice macroblock
  * classes the repo reconstructs (Intra_16x16, Intra_4x4, I_PCM with
  * mid-stream engine re-init) for 4:2:0 frame-coded streams without the
  * 8×8 transform — the same surface as the CAVLC path in [[H264Decode]].
  *
  * ENCODER/DECODER SYMMETRY BY CONSTRUCTION: there is ONE walker
  * ([[walkMb]]) written against the dual [[Bins]] interface. In decode
  * mode each `io.decision(ctx, v)` returns the decoded bin and the
  * by-name `v` is never evaluated; in encode mode `v` (derived from the
  * caller's macroblock plan) is coded and returned. Every context
  * derivation, scan order and state-grid update is therefore shared —
  * the twin cannot drift from the decoder, which is exactly the
  * round-trip property CabacSliceSpec pins.
  *
  * WHAT IS AND IS NOT CONFORMANT — the repo's table policy (refuse
  * uncertain tables by name) applied to this layer:
  *
  *   - The BINARIZATIONS (Table 9-36's I mb_type tree, TU/FL/UEG0,
  *     the mapped-unary mb_qp_delta), the residual_block_cabac syntax
  *     ORDER (coded_block_flag → significance map → levels from the
  *     last coefficient backward, sign bypass after each level) and the
  *     context-derivation FLOWCHARTS (§9.3.3.1.1.3–.9: condTermFlag
  *     neighbour rules, numDecodAbsLevelEq1/Gt1 level contexts,
  *     levelListIdx significance contexts) are transcribed from the
  *     spec's own algorithmic text.
  *   - STRUCTURAL TRIPWIRES pin the context map: the per-category
  *     significance offsets {0,15,29,44,47} must tile ctxIdx 105..165
  *     exactly (61 = 15+14+15+3+14 contexts, matching the per-category
  *     sig-flag counts 15/14/15/3/14 — checked in this object's
  *     initializer), and the level offsets {0,10,20,30,39} must tile
  *     227..275 (49 = 10+10+10+9+10 — the 9 CONFIRMS the recalled
  *     chroma-DC cap of Min(3, numDecodAbsLevelGt1) on bins > 0, since
  *     9 contexts only fit ctxIdxInc 0..8).
  *   - Cells that have NO such tripwire and rest on recall are named
  *     here rather than silently assumed: the FL bin order (LSB-first,
  *     from Table 9-36's cbp-prefix/blkIdx association), the I-16x16
  *     predMode pair coded MSB-first, the mb_type suffix ctxIdxInc
  *     schedule (chroma bin 2 → 5, predMode bins → 6, 7), and the
  *     unavailable-neighbour defaults per element. A mis-recalled cell
  *     here CANNOT corrupt a self-coded stream (both twins share it);
  *     it would only matter for real-world streams, which refuse
  *     upstream until the probability/context-init tables are
  *     conformance-anchored (see [[Cabac]]'s scaladoc).
  *
  * Reference behavior note: the reference engine (SDM-RDFizer) has no
  * media decode at all — this layer serves the repo's crawl-curation
  * operators (keyframe gates, perceptual hashes) beyond parity.
  */
object CabacSlice {

  // ---- context map (Table 9-34 offsets for the I-slice elements) ----
  private[ops] val MbTypeCtx = 3 // ..10 (ctxIdxInc 0..7)
  private[ops] val QpDeltaCtx = 60 // ..63
  private[ops] val ChromaPredCtx = 64 // ..67
  private[ops] val PrevI4Ctx = 68
  private[ops] val RemI4Ctx = 69
  private[ops] val CbpLumaCtx = 73 // ..76
  private[ops] val CbpChromaCtx = 77 // ..84 (bin 0: +0..3, bin 1: +4..7)
  private[ops] val CbfCtx = 85 // ..104: 85 + 4*cat + inc
  private[ops] val SigCtx = 105 // ..165 (frame-coded)
  private[ops] val LastCtx = 166 // ..226 (frame-coded)
  private[ops] val LevCtx = 227 // ..275
  private[ops] val TerminateCtx = 276

  /** Per-ctxBlockCat offsets inside the significance/last ranges
    * (cat 0 I16DC, 1 I16AC, 2 Luma4x4, 3 ChromaDC, 4 ChromaAC). */
  private[ops] val SigCatOff = Array(0, 15, 29, 44, 47)

  /** Per-ctxBlockCat offsets inside the level range. */
  private[ops] val LevCatOff = Array(0, 10, 20, 30, 39)

  /** Significance-map length (maxNumCoeff − 1) per category. */
  private val SigCount = Array(15, 14, 15, 3, 14)

  // structural tripwires: the offset tables must tile their spec ranges
  // exactly — a single mis-recalled offset breaks the partition
  require((0 until 4).forall(i => SigCatOff(i) + SigCount(i) == SigCatOff(i + 1)) &&
    SigCatOff(4) + SigCount(4) == LastCtx - SigCtx,
    "significance context offsets must tile 105..165")
  require(LevCatOff.sameElements(Array(10, 10, 10, 9, 10)
    .scanLeft(0)(_ + _).init) && LevCatOff.last + 10 == 276 - LevCtx,
    "level context offsets must tile 227..275 (chroma DC gets 9)")

  /** One macroblock's syntax, the unit the walker reads or writes.
    * Decode mode fills it; encode mode supplies it as the plan.
    * Coefficient arrays are in SCAN order (zigzag), matching
    * [[Cavlc.encodeResidualBlock]]'s convention: `lumaAc` rows carry 16
    * coefficients for Intra_4x4 blocks and 15 (AC-only) for Intra_16x16.
    */
  final class MbData {
    var mbType = 0
    val i4Modes = new Array[Int](16)
    var chromaPredMode = 0
    var cbp = 0 // luma | chroma << 4 (for I16, derived from mbType)
    var qpDelta = 0
    val pcmLuma = new Array[Int](256)
    val pcmChroma = new Array[Int](128)
    val lumaDc = new Array[Int](16)
    val lumaAc = Array.ofDim[Int](16, 16)
    val chromaDc = Array.ofDim[Int](2, 4)
    val chromaAc = Array.ofDim[Int](2, 4, 15)

    def clear(): Unit = {
      mbType = 0; chromaPredMode = 0; cbp = 0; qpDelta = 0
      java.util.Arrays.fill(i4Modes, 0)
      java.util.Arrays.fill(lumaDc, 0)
      var i = 0
      while (i < 16) { java.util.Arrays.fill(lumaAc(i), 0); i += 1 }
      var c = 0
      while (c < 2) {
        java.util.Arrays.fill(chromaDc(c), 0)
        var b = 0
        while (b < 4) { java.util.Arrays.fill(chromaAc(c)(b), 0); b += 1 }
        c += 1
      }
    }
  }

  /** Raised on malformed CABAC slice data (named, caught per-clip). */
  final class Malformed(msg: String) extends RuntimeException(msg)

  /** The dual bin interface: decode mode ignores the by-name plan
    * values; encode mode codes them and echoes them back. */
  sealed trait Bins {
    def decision(ctxIdx: Int, v: => Int): Int
    def bypass(v: => Int): Int
    def terminate(v: => Int): Int
    def pcmAlign(): Unit
    def pcmByte(v: => Int): Int
    def pcmReinit(): Unit
  }

  final class DecodeBins(d: Cabac.Decoder, ctx: Array[Cabac.Ctx])
      extends Bins {
    def decision(ctxIdx: Int, v: => Int): Int = d.decodeDecision(ctx(ctxIdx))
    def bypass(v: => Int): Int = d.decodeBypass()
    def terminate(v: => Int): Int = d.decodeTerminate()
    def pcmAlign(): Unit = d.alignByte()
    def pcmByte(v: => Int): Int = d.rawByte()
    def pcmReinit(): Unit = d.reinit()
  }

  final class EncodeBins(e: Cabac.Encoder, ctx: Array[Cabac.Ctx])
      extends Bins {
    def decision(ctxIdx: Int, v: => Int): Int = {
      val b = v; e.encodeDecision(ctx(ctxIdx), b); b
    }
    def bypass(v: => Int): Int = { val b = v; e.encodeBypass(b); b }
    def terminate(v: => Int): Int = { val b = v; e.encodeTerminate(b); b }
    def pcmAlign(): Unit = e.alignByteZero()
    def pcmByte(v: => Int): Int = { val b = v; e.rawByte(b); b }
    def pcmReinit(): Unit = e.reinit()
  }

  /** Slice-lifetime CABAC state: the §9.3.1.1-initialized context
    * variables plus the decoded-neighbour grids every §9.3.3.1 context
    * derivation reads. Both twins hold one and update it identically
    * (inside [[walkMb]]), so the derivations can never diverge.
    */
  final class State(val mbw: Int, val mbh: Int, sliceQp: Int,
      ctxInit: Array[Array[Int]], val chromaFormat: Int = 1) {
    val ctx: Array[Cabac.Ctx] = Array.tabulate(TerminateCtx)(i =>
      Cabac.initCtx(ctxInit(i)(0), ctxInit(i)(1), sliceQp))
    // mb classes: 0 = unavailable/undecoded, 1 = I_NxN, 2 = I16, 3 = PCM
    val mbClass = new Array[Byte](mbw * mbh)
    val cbpLuma = new Array[Byte](mbw * mbh)
    val cbpChroma = new Array[Byte](mbw * mbh)
    val chromaPred = new Array[Byte](mbw * mbh)
    val cbfLumaDc = new Array[Byte](mbw * mbh)
    val cbfLumaAc = new Array[Byte](mbw * 4 * mbh * 4)
    val cbfChromaDc = Array.ofDim[Byte](2, mbw * mbh)
    val cbfChromaAc = Array.ofDim[Byte](2, mbw * 2 * mbh * 2)
    // Intra_4x4 mode grid for §8.3.1.1 mode prediction (parse-side:
    // the prev-flag/rem coding depends on it); -1 = not Intra_4x4
    val i4Mode = Array.fill(mbw * 4 * mbh * 4)(-1)
    var prevQpDeltaNz = false
  }

  /** §8.3.1.1 predicted Intra_4x4 mode (same rule as the CAVLC path). */
  private def predI4Mode(st: State, gx: Int, gy: Int): Int = {
    val w4 = st.mbw * 4
    val a = if (gx > 0 && st.i4Mode(gy * w4 + gx - 1) >= 0)
      st.i4Mode(gy * w4 + gx - 1) else 2
    val b = if (gy > 0 && st.i4Mode((gy - 1) * w4 + gx) >= 0)
      st.i4Mode((gy - 1) * w4 + gx) else 2
    math.min(a, b)
  }

  // ---- §9.3.3.1.1 condTermFlag neighbour rules ----
  // All-I-slice simplifications apply: every decoded MB is intra, so
  // the spec's "coded in Inter mode" branches never fire.

  /** mb_type bin 0 (§9.3.3.1.1.3): 1 iff available and not I_NxN. */
  private def mbTypeCond(st: State, mbIdx: Int, avail: Boolean): Int =
    if (avail && st.mbClass(mbIdx) >= 2) 1 else 0

  /** intra_chroma_pred_mode bin 0 (§9.3.3.1.1.8): 0 when unavailable,
    * I_PCM, or the neighbour's mode is 0 (DC). */
  private def chromaPredCond(st: State, mbIdx: Int, avail: Boolean): Int =
    if (avail && st.mbClass(mbIdx) != 3 && st.mbClass(mbIdx) != 0 &&
      st.chromaPred(mbIdx) != 0) 1 else 0

  /** coded_block_pattern luma bins (§9.3.3.1.1.4), INVERTED sense:
    * 1 iff the neighbouring 8×8 block is available and NOT coded.
    * `bit` is that block's cbp bit (PCM counts as coded). */
  private def cbpLumaCond(avail: Boolean, bit: Int): Int =
    if (avail && bit == 0) 1 else 0

  /** coded_block_flag (§9.3.3.1.1.9) with the intra defaults: an
    * out-of-picture neighbour reads 1 (current MB is intra), an I_PCM
    * neighbour reads 1, a not-coded block reads its inferred 0. */
  private def cbfCond(avail: Boolean, mbCls: Int, flag: Int): Int =
    if (!avail) 1
    else if (mbCls == 3) 1
    else flag

  /** residual_block_cabac (§7.3.5.3.3) for one block, dual-mode.
    * `coeffs` carries the plan in encode mode and receives the decoded
    * scan-order coefficients in decode mode; returns the nonzero count.
    * `cbfInc` is the precomputed coded_block_flag ctxIdxInc.
    */
  private def residual(io: Bins, cat: Int, cbfInc: Int,
      coeffs: Array[Int], maxN: Int): Int = {
    var any = false
    var j = 0
    while (j < maxN && !any) { any = coeffs(j) != 0; j += 1 }
    val cbf = io.decision(CbfCtx + 4 * cat + cbfInc, if (any) 1 else 0)
    if (cbf == 0) {
      java.util.Arrays.fill(coeffs, 0, maxN, 0)
      0
    } else {
      val sigOff = SigCtx + SigCatOff(cat)
      val lastOff = LastCtx + SigCatOff(cat)
      val sig = new Array[Boolean](maxN)
      var lastIdx = maxN - 1
      var done = false
      var i = 0
      while (i < maxN - 1 && !done) {
        val s = io.decision(sigOff + i, if (coeffs(i) != 0) 1 else 0)
        if (s == 1) {
          sig(i) = true
          var anyAfter = false
          var k = i + 1
          while (k < maxN && !anyAfter) { anyAfter = coeffs(k) != 0; k += 1 }
          val last = io.decision(lastOff + i, if (anyAfter) 0 else 1)
          if (last == 1) { lastIdx = i; done = true }
        }
        i += 1
      }
      if (!done) sig(maxN - 1) = true // reached the end: implicit last
      // levels from the last significant coefficient backward
      var numEq1 = 0
      var numGt1 = 0
      var total = 0
      var k = lastIdx
      while (k >= 0) {
        if (sig(k)) {
          val bin0Ctx = LevCtx + LevCatOff(cat) +
            (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
          val binNCtx = LevCtx + LevCatOff(cat) + 5 +
            math.min(if (cat == 3) 3 else 4, numGt1)
          val planLm1 = math.abs(coeffs(k)) - 1
          // TU prefix, cMax = 14 (UEG0 with uCoff 14, §9.3.2.3)
          var v = 0
          if (io.decision(bin0Ctx, if (planLm1 > 0) 1 else 0) == 1) {
            v = 1
            while (v < 14 &&
              io.decision(binNCtx, if (planLm1 > v) 1 else 0) == 1) v += 1
          }
          val lm1 =
            if (v < 14) v
            else {
              // bypass-coded 0th-order Exp-Golomb suffix
              val planS = planLm1 - 14
              var kk = 0
              var base = 0
              while (io.bypass(if (planS >= base + (1 << kk)) 1 else 0) == 1) {
                base += 1 << kk
                kk += 1
                if (kk > 16) throw new Malformed("UEG0 level escape overflow")
              }
              var r = 0
              var b = kk - 1
              while (b >= 0) {
                r = (r << 1) | io.bypass(((planS - base) >> b) & 1)
                b -= 1
              }
              14 + base + r
            }
          val abs = lm1 + 1
          val sgn = io.bypass(if (coeffs(k) < 0) 1 else 0)
          coeffs(k) = if (sgn == 1) -abs else abs
          if (abs > 1) numGt1 += 1 else numEq1 += 1
          total += 1
        } else coeffs(k) = 0
        k -= 1
      }
      var t = lastIdx + 1
      while (t < maxN) { coeffs(t) = 0; t += 1 }
      total
    }
  }

  /** Walk one macroblock's syntax (both twins). Returns null or a named
    * malformation. Decode mode fills `md`; encode mode reads it as the
    * plan (whose values it echoes back unchanged). The State grids are
    * updated for the next macroblock's context derivations.
    */
  def walkMb(st: State, io: Bins, mbx: Int, mby: Int,
      md: MbData): String = {
    val mbw = st.mbw
    val mbIdx = mby * mbw + mbx
    val w4 = mbw * 4
    val w2 = mbw * 2

    // ---- mb_type (Table 9-36 tree over ctxIdxOffset 3) ----
    val incA = mbTypeCond(st, mbIdx - 1, mbx > 0)
    val incB = mbTypeCond(st, mbIdx - mbw, mby > 0)
    val b0 = io.decision(MbTypeCtx + incA + incB,
      if (md.mbType == 0) 0 else 1)
    var qpDeltaCoded = false
    if (b0 == 0) {
      md.mbType = 0
    } else if (io.terminate(if (md.mbType == 25) 1 else 0) == 1) {
      md.mbType = 25
    } else {
      // Intra_16x16: cbp-luma bin, chroma (TU-ish pair), predMode pair
      def plan = md.mbType - 1 // only forced in encode mode
      val bL = io.decision(MbTypeCtx + 3, if (plan >= 12) 1 else 0)
      val bC0 = io.decision(MbTypeCtx + 4, if ((plan / 4) % 3 != 0) 1 else 0)
      val chroma =
        if (bC0 == 0) 0
        else 1 + io.decision(MbTypeCtx + 5, if ((plan / 4) % 3 == 2) 1 else 0)
      val p1 = io.decision(MbTypeCtx + 6, (plan % 4) >> 1)
      val p0 = io.decision(MbTypeCtx + 7, plan % 4 & 1)
      md.mbType = 1 + ((p1 << 1) | p0) + 4 * chroma + 12 * bL
    }

    if (md.mbType == 25) {
      // ---- I_PCM: flush-align, raw samples, engine re-init ----
      io.pcmAlign()
      var i = 0
      while (i < 256) { md.pcmLuma(i) = io.pcmByte(md.pcmLuma(i)); i += 1 }
      if (st.chromaFormat != 0) { // §7.3.5: no chroma samples when mono
        i = 0
        while (i < 128) { md.pcmChroma(i) = io.pcmByte(md.pcmChroma(i)); i += 1 }
      }
      io.pcmReinit()
      st.mbClass(mbIdx) = 3
      st.cbpLuma(mbIdx) = 15
      st.cbpChroma(mbIdx) = 2
      st.cbfLumaDc(mbIdx) = 1
      var b = 0
      while (b < 16) {
        st.cbfLumaAc((mby * 4 + H264Decode.Blk4x4Y(b)) * w4 +
          mbx * 4 + H264Decode.Blk4x4X(b)) = 1
        b += 1
      }
      var c = 0
      while (c < 2) {
        st.cbfChromaDc(c)(mbIdx) = 1
        var cb = 0
        while (cb < 4) {
          st.cbfChromaAc(c)((mby * 2 + (cb >> 1)) * w2 + mbx * 2 + (cb & 1)) = 1
          cb += 1
        }
        c += 1
      }
      st.prevQpDeltaNz = false // inferred 0 for I_PCM
      return null
    }

    val isI16 = md.mbType >= 1
    if (isI16) {
      val k = md.mbType - 1
      md.cbp = (if (k >= 12) 15 else 0) | (((k / 4) % 3) << 4)
      if (st.chromaFormat == 0 && (md.cbp >> 4) != 0)
        // monochrome has no chroma arrays for the type's cbp to describe
        throw new Malformed("monochrome I_16x16 mb_type carries chroma cbp")
    } else {
      // ---- Intra_4x4 prediction modes (prev flag + 3-bit FL rem) ----
      var b = 0
      while (b < 16) {
        val gx = mbx * 4 + H264Decode.Blk4x4X(b)
        val gy = mby * 4 + H264Decode.Blk4x4Y(b)
        val pm = predI4Mode(st, gx, gy)
        val prev = io.decision(PrevI4Ctx,
          if (md.i4Modes(b) == pm) 1 else 0)
        val mode =
          if (prev == 1) pm
          else {
            def planRem =
              md.i4Modes(b) - (if (md.i4Modes(b) > pm) 1 else 0)
            // FL cMax 7: LSB-first (Table 9-36's blkIdx/bit association)
            val r0 = io.decision(RemI4Ctx, planRem & 1)
            val r1 = io.decision(RemI4Ctx, (planRem >> 1) & 1)
            val r2 = io.decision(RemI4Ctx, (planRem >> 2) & 1)
            val rem = r0 | (r1 << 1) | (r2 << 2)
            if (rem < pm) rem else rem + 1
          }
        md.i4Modes(b) = mode
        st.i4Mode(gy * w4 + gx) = mode
        b += 1
      }
    }

    // ---- intra_chroma_pred_mode (TU cMax 3 over ctxIdxOffset 64) ----
    // ABSENT for monochrome (§7.3.5.1 gates on ChromaArrayType != 0)
    if (st.chromaFormat == 0) md.chromaPredMode = 0
    else {
      val cA = chromaPredCond(st, mbIdx - 1, mbx > 0)
      val cB = chromaPredCond(st, mbIdx - mbw, mby > 0)
      val c0 = io.decision(ChromaPredCtx + cA + cB,
        if (md.chromaPredMode != 0) 1 else 0)
      md.chromaPredMode =
        if (c0 == 0) 0
        else if (io.decision(ChromaPredCtx + 3,
          if (md.chromaPredMode > 1) 1 else 0) == 0) 1
        else 2 + io.decision(ChromaPredCtx + 3,
          if (md.chromaPredMode == 3) 1 else 0)
    }

    if (!isI16) {
      // ---- coded_block_pattern (4 luma bins + 2 chroma bins) ----
      var cbpL = 0
      var b = 0
      while (b < 4) {
        val bx = b & 1
        val by = b >> 1
        // left 8×8 neighbour
        val (aAvail, aBit) =
          if (bx == 1) (true, (cbpL >> (by * 2)) & 1)
          else if (mbx > 0) (true, (st.cbpLuma(mbIdx - 1) >> (by * 2 + 1)) & 1)
          else (false, 0)
        val (bAvail, bBit) =
          if (by == 1) (true, (cbpL >> bx) & 1)
          else if (mby > 0) (true, (st.cbpLuma(mbIdx - mbw) >> (2 + bx)) & 1)
          else (false, 0)
        val inc = cbpLumaCond(aAvail, aBit) + 2 * cbpLumaCond(bAvail, bBit)
        val bit = io.decision(CbpLumaCtx + inc, (md.cbp >> b) & 1)
        cbpL |= bit << b
        b += 1
      }
      // chroma TU suffix only when ChromaArrayType in {1, 2} (§9.3.2.6)
      def chromaCond(mbI: Int, avail: Boolean, two: Boolean): Int =
        if (!avail) 0
        else if (st.mbClass(mbI) == 3) 1
        else if (two) { if (st.cbpChroma(mbI) == 2) 1 else 0 }
        else { if (st.cbpChroma(mbI) != 0) 1 else 0 }
      val cbpC =
        if (st.chromaFormat == 0) 0
        else {
          val inc0 = chromaCond(mbIdx - 1, mbx > 0, two = false) +
            2 * chromaCond(mbIdx - mbw, mby > 0, two = false)
          val cc0 = io.decision(CbpChromaCtx + inc0,
            if ((md.cbp >> 4) != 0) 1 else 0)
          if (cc0 == 0) 0
          else {
            val inc1 = chromaCond(mbIdx - 1, mbx > 0, two = true) +
              2 * chromaCond(mbIdx - mbw, mby > 0, two = true)
            1 + io.decision(CbpChromaCtx + 4 + inc1,
              if ((md.cbp >> 4) == 2) 1 else 0)
          }
        }
      md.cbp = cbpL | (cbpC << 4)
    }

    // ---- mb_qp_delta (mapped unary, §9.3.2.7) ----
    if (isI16 || md.cbp != 0) {
      qpDeltaCoded = true
      def planMapped =
        if (md.qpDelta > 0) 2 * md.qpDelta - 1 else -2 * md.qpDelta
      val q0 = io.decision(QpDeltaCtx + (if (st.prevQpDeltaNz) 1 else 0),
        if (planMapped > 0) 1 else 0)
      var mapped = 0
      if (q0 == 1) {
        mapped = 1
        if (io.decision(QpDeltaCtx + 2, if (planMapped > 1) 1 else 0) == 1) {
          mapped = 2
          while (mapped < 104 && io.decision(QpDeltaCtx + 3,
            if (planMapped > mapped) 1 else 0) == 1) mapped += 1
          if (mapped >= 104) throw new Malformed("mb_qp_delta overflow")
        }
      }
      md.qpDelta =
        if (mapped == 0) 0
        else if ((mapped & 1) == 1) (mapped + 1) / 2
        else -mapped / 2
    } else md.qpDelta = 0

    // ---- residuals (§7.3.5.3 under CABAC) ----
    val cbpLuma = md.cbp & 15
    val cbpChroma = md.cbp >> 4
    if (isI16) {
      // Intra16x16DCLevel (cat 0): neighbours are the DC blocks of
      // I16-coded neighbour MBs; other decoded MBs have no DC block → 0
      def dcCond(mbI: Int, avail: Boolean): Int =
        if (!avail) 1
        else if (st.mbClass(mbI) == 3) 1
        else if (st.mbClass(mbI) == 2) st.cbfLumaDc(mbI)
        else 0
      val inc = dcCond(mbIdx - 1, mbx > 0) + 2 * dcCond(mbIdx - mbw, mby > 0)
      val n = residual(io, 0, inc, md.lumaDc, 16)
      st.cbfLumaDc(mbIdx) = if (n > 0) 1 else 0
    }
    // luma 4×4 blocks in Z order: cat 1 (I16 AC, 15 coeffs) or
    // cat 2 (Intra_4x4, 16 coeffs)
    var b = 0
    while (b < 16) {
      val gx = mbx * 4 + H264Decode.Blk4x4X(b)
      val gy = mby * 4 + H264Decode.Blk4x4Y(b)
      val coded = (cbpLuma & (1 << (b >> 2))) != 0
      if (coded) {
        def lumaCbf(x: Int, y: Int): Int =
          if (x < 0 || y < 0) cbfCond(avail = false, 0, 0)
          else cbfCond(avail = true, st.mbClass((y >> 2) * mbw + (x >> 2)),
            st.cbfLumaAc(y * w4 + x))
        val inc = lumaCbf(gx - 1, gy) + 2 * lumaCbf(gx, gy - 1)
        val n =
          if (isI16) residual(io, 1, inc, md.lumaAc(b), 15)
          else residual(io, 2, inc, md.lumaAc(b), 16)
        st.cbfLumaAc(gy * w4 + gx) = if (n > 0) 1 else 0
      } else {
        java.util.Arrays.fill(md.lumaAc(b), 0)
        st.cbfLumaAc(gy * w4 + gx) = 0
      }
      b += 1
    }
    // chroma DC (cat 3) then chroma AC (cat 4), per component —
    // no chroma arrays at all for monochrome
    var c = 0
    while (st.chromaFormat != 0 && c < 2) {
      if (cbpChroma >= 1) {
        def dcCond(mbI: Int, avail: Boolean): Int =
          if (!avail) 1
          else if (st.mbClass(mbI) == 3) 1
          else st.cbfChromaDc(c)(mbI)
        val inc = dcCond(mbIdx - 1, mbx > 0) +
          2 * dcCond(mbIdx - mbw, mby > 0)
        val n = residual(io, 3, inc, md.chromaDc(c), 4)
        st.cbfChromaDc(c)(mbIdx) = if (n > 0) 1 else 0
      } else {
        java.util.Arrays.fill(md.chromaDc(c), 0)
        st.cbfChromaDc(c)(mbIdx) = 0
      }
      c += 1
    }
    c = 0
    while (st.chromaFormat != 0 && c < 2) {
      var cb = 0
      while (cb < 4) {
        val cx = mbx * 2 + (cb & 1)
        val cy = mby * 2 + (cb >> 1)
        if (cbpChroma == 2) {
          def acCbf(x: Int, y: Int): Int =
            if (x < 0 || y < 0) cbfCond(avail = false, 0, 0)
            else cbfCond(avail = true, st.mbClass((y >> 1) * mbw + (x >> 1)),
              st.cbfChromaAc(c)(y * w2 + x))
          val inc = acCbf(cx - 1, cy) + 2 * acCbf(cx, cy - 1)
          val n = residual(io, 4, inc, md.chromaAc(c)(cb), 15)
          st.cbfChromaAc(c)(cy * w2 + cx) = if (n > 0) 1 else 0
        } else {
          java.util.Arrays.fill(md.chromaAc(c)(cb), 0)
          st.cbfChromaAc(c)(cy * w2 + cx) = 0
        }
        cb += 1
      }
      c += 1
    }

    // ---- grid updates for later neighbours ----
    st.mbClass(mbIdx) = if (isI16) 2 else 1
    st.cbpLuma(mbIdx) = (md.cbp & 15).toByte
    st.cbpChroma(mbIdx) = (md.cbp >> 4).toByte
    st.chromaPred(mbIdx) = md.chromaPredMode.toByte
    st.prevQpDeltaNz = qpDeltaCoded && md.qpDelta != 0
    null
  }

  /** end_of_slice_flag (ctxIdx 276 → the terminate decision). */
  def endOfSlice(io: Bins, last: Boolean): Int =
    io.terminate(if (last) 1 else 0)
}
