package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** B-slice motion compensation ([[H264Inter.decodeBSlice]] through the
  * [[H264Decode.decodeGop]] walk): temporal direct (§8.4.1.2.3 POC
  * scaling), spatial direct (§8.4.1.2.2 zero/median derivations),
  * explicit B_L0/B_L1/B_Bi 16×16 with per-list prediction grids and
  * the §8.4.2.3.1 default bi average — every expectation computed in
  * the test from the decoded I/P planes with independent clamp-aware
  * sampling, plus the named refusal envelope and the
  * disposable-failure-stays-local contract.
  */
class H264BSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

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

  // pocType-0 SPS (2×2 MBs, 6-bit poc lsb) — B decode needs display order
  private def poc0Sps = VideoBitstream.syntheticSpsRbsp(2, 2, pocType = 0)

  // clamp-aware integer-pel sample of a 32×32 plane
  private def at(p: Array[Byte], x: Int, y: Int): Int = {
    val cx = if (x < 0) 0 else if (x > 31) 31 else x
    val cy = if (y < 0) 0 else if (y > 31) 31 else y
    p(cy * 32 + cx) & 0xff
  }

  /** I(poc 0) + P(poc 4, uniform MV (8,8) quarter = 2 px) + B(poc 2). */
  private def ibpPayload(bSlice: Array[Byte]): Array[Byte] = annexB(
    (3, 7, poc0Sps),
    (3, 8, H264Decode.cavlcPpsRbsp),
    (3, 5, H264Decode.i16SliceRbsp(7, true, 3, pocLsb = 0)),
    (2, 1, H264Inter.pSliceRbsp(4, 1,
      H264Inter.PMb.Mv(8, 8) +: Seq.fill(3)(H264Inter.PMb.Mv(0, 0)),
      pocLsb = 4)),
    (0, 1, bSlice))

  test("decodeGop: temporal direct B halves the colocated motion — the " +
      "B frame is the I frame translated by half the P frame's shift") {
    // mvCol (8,8); tb/td = 2/4 → DistScaleFactor 128 → mvL0 (4,4) =
    // 1 px, mvL1 = mvL0 − mvCol = (−4,−4); predL0 = I(x+1, y+1),
    // predL1 = P(x−1, y−1) = I(x+1, y+1) interior — the average is the
    // exact half-way translation
    val out = gopRows(ibpPayload(H264Inter.bSliceRbsp(4, 2, poc = 2,
      spatialDirect = false, Seq.fill(4)(H264Inter.BMb.Direct))))
    assert(out.length == 3, out.mkString("\n"))
    assert(out.forall(_.getAs[String]("decode_error") == null),
      out.map(_.getAs[String]("decode_error")).mkString(";"))
    assert(out.map(_.getAs[String]("frame_type")).toSeq == Seq("I", "P", "B"))
    val fI = out(0).getAs[Array[Byte]]("luma_plane")
    val fP = out(1).getAs[Array[Byte]]("luma_plane")
    val fB = out(2).getAs[Array[Byte]]("luma_plane")
    for (y <- 0 until 32; x <- 0 until 32) {
      val want = (at(fI, x + 1, y + 1) + at(fP, x - 1, y - 1) + 1) >> 1
      assert((fB(y * 32 + x) & 0xff) == want, s"pixel ($x,$y)")
    }
    // interior strict translation (the closed form, no clamp involved)
    for (y <- 1 until 29; x <- 1 until 29)
      assert((fB(y * 32 + x) & 0xff) == (fI((y + 1) * 32 + x + 1) & 0xff),
        s"interior ($x,$y)")
  }

  test("decodeGop: B_Skip derives the same direct prediction as " +
      "B_Direct_16x16 (skip run covers the whole frame)") {
    val direct = gopRows(ibpPayload(H264Inter.bSliceRbsp(4, 2, poc = 2,
      spatialDirect = false, Seq.fill(4)(H264Inter.BMb.Direct))))
    val skipped = gopRows(ibpPayload(H264Inter.bSliceRbsp(4, 2, poc = 2,
      spatialDirect = false, Seq.fill(4)(H264Inter.BMb.Skip))))
    assert(skipped(2).getAs[String]("decode_error") == null,
      skipped(2).toString)
    assert(skipped(2).getAs[Array[Byte]]("luma_plane").toSeq ==
      direct(2).getAs[Array[Byte]]("luma_plane").toSeq)
  }

  test("decodeGop: spatial direct with fast colocated motion derives " +
      "zero vectors — the B frame is the per-pixel average of its two " +
      "anchors") {
    // MB0: no neighbours → direct zero prediction (refs 0, mv 0);
    // later MBs: min-positive ref 0 with zero-motion medians; colZero
    // never fires (|mvCol| = 8 > 1) but the predictions are zero anyway
    val out = gopRows(ibpPayload(H264Inter.bSliceRbsp(4, 2, poc = 2,
      spatialDirect = true, Seq.fill(4)(H264Inter.BMb.Direct))))
    assert(out(2).getAs[String]("decode_error") == null, out(2).toString)
    val fI = out(0).getAs[Array[Byte]]("luma_plane")
    val fP = out(1).getAs[Array[Byte]]("luma_plane")
    val fB = out(2).getAs[Array[Byte]]("luma_plane")
    for (y <- 0 until 32; x <- 0 until 32)
      assert((fB(y * 32 + x) & 0xff) ==
        (((fI(y * 32 + x) & 0xff) + (fP(y * 32 + x) & 0xff) + 1) >> 1),
        s"pixel ($x,$y)")
  }

  test("decodeGop: explicit B_L0 / B_L1 / B_Bi 16×16 predict from their " +
      "own list grids; bi averages both anchors") {
    // MB0 Bi: mvd_l0 (4,0) → (1,0) px off I; mvd_l1 (8,4) → (2,1) px
    //   off P (both predictions zero: first MB of the frame)
    // MB1 L0(0,0): gL0 A-only → (4,0) → I shifted (1,0)
    // MB2 L1(0,0): gL1 exactly-one-match B → (8,4) → P shifted (2,1)
    // MB3 Skip: temporal direct off colocated (8,8) → avg of the
    //   half-way translations, as in the direct test
    val out = gopRows(ibpPayload(H264Inter.bSliceRbsp(4, 2, poc = 2,
      spatialDirect = false, Seq(
        H264Inter.BMb.Bi((4, 0), (8, 4)),
        H264Inter.BMb.L0(0, 0),
        H264Inter.BMb.L1(0, 0),
        H264Inter.BMb.Skip))))
    assert(out(2).getAs[String]("decode_error") == null, out(2).toString)
    val fI = out(0).getAs[Array[Byte]]("luma_plane")
    val fP = out(1).getAs[Array[Byte]]("luma_plane")
    val fB = out(2).getAs[Array[Byte]]("luma_plane")
    def b(x: Int, y: Int) = fB(y * 32 + x) & 0xff
    for (y <- 0 until 16; x <- 0 until 16)
      assert(b(x, y) ==
        ((at(fI, x + 1, y) + at(fP, x + 2, y + 1) + 1) >> 1),
        s"MB0 ($x,$y)")
    for (y <- 0 until 16; x <- 16 until 32)
      assert(b(x, y) == at(fI, x + 1, y), s"MB1 ($x,$y)")
    for (y <- 16 until 32; x <- 0 until 16)
      assert(b(x, y) == at(fP, x + 2, y + 1), s"MB2 ($x,$y)")
    for (y <- 16 until 32; x <- 16 until 32)
      assert(b(x, y) ==
        ((at(fI, x + 1, y + 1) + at(fP, x - 1, y - 1) + 1) >> 1),
        s"MB3 ($x,$y)")
  }

  test("decodeGop: B refusal envelope is NAMED — pyramid, bracket, " +
      "pocType, partitions, B_8x8, intra") {
    def bErr(payload: Array[Byte]): String = {
      val rows = gopRows(payload)
      rows.map(_.getAs[String]("decode_error")).filter(_ != null)
        .headOption.orNull
    }
    // reference B (pyramid)
    val pyramid = bErr(annexB(
      (3, 7, poc0Sps), (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3, pocLsb = 0)),
      (2, 1, H264Inter.pSliceRbsp(4, 1,
        Seq.fill(4)(H264Inter.PMb.Mv(0, 0)), pocLsb = 4)),
      (2, 1, H264Inter.bSliceRbsp(4, 2, poc = 2, spatialDirect = false,
        Seq.fill(4)(H264Inter.BMb.Direct), nalRefIdc = 2))))
    assert(pyramid != null && pyramid.contains("reference B frame"), pyramid)
    // only one anchor decoded yet
    val lead = bErr(annexB(
      (3, 7, poc0Sps), (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3, pocLsb = 4)),
      (0, 1, H264Inter.bSliceRbsp(4, 1, poc = 2, spatialDirect = false,
        Seq.fill(4)(H264Inter.BMb.Direct)))))
    assert(lead != null && lead.contains("two decoded reference"), lead)
    // poc outside the bracket
    val outside = bErr(ibpPayload(H264Inter.bSliceRbsp(4, 2, poc = 9,
      spatialDirect = false, Seq.fill(4)(H264Inter.BMb.Direct))))
    assert(outside != null && outside.contains("reference bracket"), outside)
    // pocType-2 stream (no display order)
    val noPoc = bErr(annexB(
      (3, 7, VideoBitstream.syntheticSpsRbsp(2, 2)),
      (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3)),
      (2, 1, H264Inter.pSliceRbsp(4, 1,
        Seq.fill(4)(H264Inter.PMb.Mv(0, 0)))),
      (0, 1, H264Inter.bSliceRbsp(4, 2, poc = 2, spatialDirect = false,
        Seq.fill(4)(H264Inter.BMb.Direct)))))
    assert(noPoc != null && noPoc.contains("pic_order_cnt_type"), noPoc)
    // unsupported macroblock classes: partition pair / B_8x8 / intra
    def bType(t: Int): Array[Byte] = {
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(1); w.ue(0); w.u(2, 4); w.u(2, 6)
      w.u(0, 1) // temporal direct
      w.u(0, 1); w.u(0, 1); w.u(0, 1) // override/mod l0/mod l1
      w.se(0); w.ue(1) // qp delta, deblock off
      w.ue(0); w.ue(t) // skip_run 0, mb_type t
      w.rbspTrailing(); w.bytes
    }
    val pair = bErr(ibpPayload(bType(4)))
    assert(pair != null && pair.contains("two-partition B"), pair)
    val b8 = bErr(ibpPayload(bType(22)))
    assert(b8 != null && b8.contains("B_8x8"), b8)
    val intra = bErr(ibpPayload(bType(23)))
    assert(intra != null && intra.contains("intra macroblock in B"), intra)
  }

  test("decodeGop: a disposable B's refusal stays LOCAL — the chain " +
      "keeps its anchors and the next P still decodes") {
    val payload = annexB(
      (3, 7, poc0Sps), (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, H264Decode.i16SliceRbsp(7, true, 3, pocLsb = 0)),
      (2, 1, H264Inter.pSliceRbsp(4, 1,
        Seq.fill(4)(H264Inter.PMb.Mv(0, 0)), pocLsb = 8)),
      // B with an unsupported partition type — refuses, but disposably
      (0, 1, {
        val w = new VideoBitstream.BitWriter
        w.ue(0); w.ue(1); w.ue(0); w.u(2, 4); w.u(4, 6)
        w.u(0, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
        w.se(0); w.ue(1)
        w.ue(0); w.ue(4)
        w.rbspTrailing(); w.bytes
      }),
      // the next reference P predicts from the LAST REFERENCE (the
      // all-zero-MV P), not from the failed B
      (2, 1, H264Inter.pSliceRbsp(4, 2,
        Seq.fill(4)(H264Inter.PMb.Skip), pocLsb = 12)))
    val out = gopRows(payload)
    assert(out.length == 4, out.mkString("\n"))
    assert(out(2).getAs[String]("frame_type") == "B")
    assert(out(2).getAs[String]("decode_error") != null)
    assert(out(3).getAs[String]("decode_error") == null, out(3).toString)
    assert(out(3).getAs[Array[Byte]]("luma_plane").toSeq ==
      out(1).getAs[Array[Byte]]("luma_plane").toSeq)
  }

  test("h264PartitionCensus: B frames census skips and 16×16 MBs") {
    val payload = ibpPayload(H264Inter.bSliceRbsp(4, 2, poc = 2,
      spatialDirect = false, Seq(
        H264Inter.BMb.Direct, H264Inter.BMb.L0(0, 0),
        H264Inter.BMb.Skip, H264Inter.BMb.Skip)))
    val out = H264Decode.h264PartitionCensus(
      Seq((0L, payload)).toDF("doc_id", "payload"))
      .orderBy("frame_idx").collect()
    assert(out.length == 3)
    val b = out(2)
    assert(b.getAs[String]("frame_type") == "B")
    assert(b.getAs[String]("census_error") == null, b.toString)
    assert(b.getAs[Int]("n_skip") == 2)
    assert(b.getAs[Int]("n_16x16") == 2)
  }
}
