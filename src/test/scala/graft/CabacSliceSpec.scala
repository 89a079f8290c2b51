package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CABAC I-slice macroblock layer ([[CabacSlice]]): engine segment
  * identity (the PCM align/raw/reinit bit accounting), walker
  * encode/decode round-trips over randomized plans, the fixture's
  * closed-form pixels, and the strongest internal check — the SAME
  * logical macroblock plan coded through CAVLC and through CABAC must
  * reconstruct byte-identical luma planes (the entropy layer swaps,
  * the pixels cannot).
  */
class CabacSliceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = Cabac.Config.derived

  test("engine: terminate(1) → align → raw bytes → reinit round-trips " +
      "(decoder bit position equals encoder emitted bits)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 40) {
      val enc = new Cabac.Encoder(cfg.tables)
      val nBins = 1 + rnd.nextInt(60)
      val bins = Array.fill(nBins)(rnd.nextInt(2))
      val ectx = Array.tabulate(8)(i =>
        Cabac.initCtx(cfg.ctxInit(i)(0), cfg.ctxInit(i)(1), 28))
      bins.zipWithIndex.foreach { case (b, i) =>
        enc.encodeDecision(ectx(i % 8), b) }
      enc.encodeTerminate(1)
      assert(enc.bitLength % 1 == 0)
      enc.alignByteZero()
      val raw = Array.fill(3 + rnd.nextInt(5))(rnd.nextInt(256))
      raw.foreach(enc.rawByte)
      enc.reinit()
      val bins2 = Array.fill(nBins)(rnd.nextInt(2))
      bins2.zipWithIndex.foreach { case (b, i) =>
        enc.encodeDecision(ectx(i % 8), b) }
      enc.encodeTerminate(1)
      val bytes = enc.finish()

      val dec = new Cabac.Decoder(bytes, cfg.tables)
      val dctx = Array.tabulate(8)(i =>
        Cabac.initCtx(cfg.ctxInit(i)(0), cfg.ctxInit(i)(1), 28))
      bins.zipWithIndex.foreach { case (b, i) =>
        assert(dec.decodeDecision(dctx(i % 8)) == b, s"trial $trial bin $i") }
      assert(dec.decodeTerminate() == 1)
      dec.alignByte()
      raw.foreach(v => assert(dec.rawByte() == v, s"trial $trial raw"))
      dec.reinit()
      bins2.zipWithIndex.foreach { case (b, i) =>
        assert(dec.decodeDecision(dctx(i % 8)) == b, s"trial $trial bin2 $i") }
      assert(dec.decodeTerminate() == 1)
    }
  }

  /** Random but CONSISTENT macroblock plan (coefficients agree with the
    * cbp bits, qp_delta only where coded). */
  private def randomPlan(rnd: scala.util.Random, nMbs: Int): Seq[CabacSlice.MbData] =
    (0 until nMbs).map { _ =>
      val md = new CabacSlice.MbData
      md.clear()
      def coeff(): Int = {
        val v = rnd.nextInt(40) - 20
        if (v == 0) 1 else v
      }
      def fillBlock(a: Array[Int], maxN: Int): Unit = {
        val n = 1 + rnd.nextInt(4)
        var i = 0
        while (i < n) { a(rnd.nextInt(maxN)) = coeff(); i += 1 }
        if (rnd.nextInt(5) == 0) a(maxN - 1) = 17 + rnd.nextInt(10) // UEG0
      }
      rnd.nextInt(3) match {
        case 0 => // I_PCM
          md.mbType = 25
          var i = 0
          while (i < 256) { md.pcmLuma(i) = rnd.nextInt(256); i += 1 }
          i = 0
          while (i < 128) { md.pcmChroma(i) = rnd.nextInt(256); i += 1 }
        case 1 => // I16
          md.mbType = 1 + rnd.nextInt(24)
          val k = md.mbType - 1
          md.chromaPredMode = rnd.nextInt(4)
          md.qpDelta = rnd.nextInt(7) - 3
          if (rnd.nextInt(3) != 0) fillBlock(md.lumaDc, 16)
          if (k >= 12) {
            var b = 0
            while (b < 16) {
              if (rnd.nextInt(3) != 0) fillBlock(md.lumaAc(b), 15)
              b += 1
            }
          }
          val cbpC = (k / 4) % 3
          if (cbpC >= 1) {
            var c = 0
            while (c < 2) {
              if (rnd.nextInt(3) != 0) fillBlock(md.chromaDc(c), 4)
              c += 1
            }
          }
          if (cbpC == 2) {
            var c = 0
            while (c < 2) {
              var b = 0
              while (b < 4) {
                if (rnd.nextInt(3) != 0) fillBlock(md.chromaAc(c)(b), 15)
                b += 1
              }
              c += 1
            }
          }
        case _ => // Intra_4x4
          md.mbType = 0
          md.chromaPredMode = rnd.nextInt(4)
          md.cbp = rnd.nextInt(48)
          if (md.cbp != 0) md.qpDelta = rnd.nextInt(7) - 3
          var b = 0
          while (b < 16) {
            md.i4Modes(b) = rnd.nextInt(9)
            if ((md.cbp & (1 << (b >> 2))) != 0 && rnd.nextInt(3) != 0)
              fillBlock(md.lumaAc(b), 16)
            b += 1
          }
          val cbpC = md.cbp >> 4
          if (cbpC >= 1) fillBlock(md.chromaDc(rnd.nextInt(2)), 4)
          if (cbpC == 2) fillBlock(md.chromaAc(rnd.nextInt(2))(rnd.nextInt(4)), 15)
      }
      md
    }

  private def copyOf(md: CabacSlice.MbData): CabacSlice.MbData = {
    val c = new CabacSlice.MbData
    c.mbType = md.mbType
    md.i4Modes.copyToArray(c.i4Modes)
    c.chromaPredMode = md.chromaPredMode
    c.cbp = md.cbp
    c.qpDelta = md.qpDelta
    md.pcmLuma.copyToArray(c.pcmLuma)
    md.pcmChroma.copyToArray(c.pcmChroma)
    md.lumaDc.copyToArray(c.lumaDc)
    for (b <- 0 until 16) md.lumaAc(b).copyToArray(c.lumaAc(b))
    for (i <- 0 until 2) {
      md.chromaDc(i).copyToArray(c.chromaDc(i))
      for (b <- 0 until 4) md.chromaAc(i)(b).copyToArray(c.chromaAc(i)(b))
    }
    c
  }

  test("walker: 60-seed random-plan encode/decode round-trip " +
      "(all macroblock classes, coefficients, modes, qp deltas)") {
    for (seed <- 0 until 60) {
      val rnd = new scala.util.Random(seed)
      val mbw = 1 + rnd.nextInt(4)
      val mbh = 1 + rnd.nextInt(3)
      val qp = 10 + rnd.nextInt(35)
      val plans = randomPlan(rnd, mbw * mbh)
      val bytes = H264Decode.encodeCabacSlice(mbw, mbh, qp, plans.map(copyOf))
      val dec = new Cabac.Decoder(bytes, cfg.tables)
      val st = new CabacSlice.State(mbw, mbh, qp, cfg.ctxInit)
      val io = new CabacSlice.DecodeBins(dec, st.ctx)
      plans.zipWithIndex.foreach { case (plan, i) =>
        val md = new CabacSlice.MbData
        assert(CabacSlice.walkMb(st, io, i % mbw, i / mbw, md) == null)
        assert(md.mbType == plan.mbType, s"seed $seed mb $i mbType")
        if (plan.mbType == 25) {
          assert(md.pcmLuma.sameElements(plan.pcmLuma), s"seed $seed mb $i pcm")
          assert(md.pcmChroma.sameElements(plan.pcmChroma))
        } else {
          assert(md.chromaPredMode == plan.chromaPredMode, s"seed $seed mb $i cpm")
          if (plan.mbType == 0) {
            assert(md.cbp == plan.cbp, s"seed $seed mb $i cbp")
            assert(md.i4Modes.sameElements(plan.i4Modes), s"seed $seed mb $i modes")
          }
          val coded = plan.mbType >= 1 || plan.cbp != 0
          assert(md.qpDelta == (if (coded) plan.qpDelta else 0),
            s"seed $seed mb $i qpDelta")
          assert(md.lumaDc.sameElements(plan.lumaDc), s"seed $seed mb $i dc")
          for (b <- 0 until 16)
            assert(md.lumaAc(b).sameElements(plan.lumaAc(b)),
              s"seed $seed mb $i ac $b")
          for (c <- 0 until 2) {
            assert(md.chromaDc(c).sameElements(plan.chromaDc(c)))
            for (b <- 0 until 4)
              assert(md.chromaAc(c)(b).sameElements(plan.chromaAc(c)(b)))
          }
        }
        val eos = CabacSlice.endOfSlice(io, i == plans.size - 1)
        assert(eos == (if (i == plans.size - 1) 1 else 0), s"seed $seed eos $i")
      }
    }
  }

  test("fixture: syntheticCabacAnnexB decodes pixel-exact " +
      "(all six closed-form macroblocks, PCM re-init mid-stream)") {
    val df = Seq((0L, 3, false, 2, 2, 150), (1L, 5, true, 4, 3, 200))
      .toDF("doc_id", "v0", "s1", "v2", "k", "p")
      .select(col("doc_id"), col("v0"), col("s1"), col("v2"), col("k"), col("p"),
        H264Decode.syntheticCabacAnnexB(col("v0"), col("s1"), col("v2"),
          col("k"), col("p")).as("payload"))
    val out = H264Decode.decodeIdr(df, "payload",
        cabac = Some(Cabac.Config.derived))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, (v0, s1, v2, k, p)) <- Map(0L -> ((3, false, 2, 2, 150)),
        1L -> ((5, true, 4, 3, 200)))) {
      val r = out(id)
      assert(r.getAs[String]("decode_error") == null, s"doc $id")
      assert(r.getAs[Int]("frame_width") == 48)
      assert(r.getAs[Int]("frame_height") == 32)
      assert(r.getAs[Int]("mb_count") == 6)
      val luma = r.getAs[Array[Byte]]("luma_plane")
      val c0 = 128 + v0
      val c1 = c0 + (if (s1) -1 else 1)
      val c2 = c0 + v2
      val c3 = (c1 + c2 + 1) >> 1
      def px(x: Int, y: Int): Int = luma(y * 48 + x) & 0xff
      for (y <- 0 until 16; x <- 0 until 16) {
        assert(px(x, y) == c0, s"doc $id MB0 ($x,$y)")
        assert(px(16 + x, y) == c1, s"doc $id MB1 ($x,$y)")
        assert(px(32 + x, y) == p, s"doc $id MB2/PCM ($x,$y)")
        assert(px(x, 16 + y) == c2, s"doc $id MB3 ($x,$y)")
        assert(px(16 + x, 16 + y) == c3, s"doc $id MB4 ($x,$y)")
        assert(px(32 + x, 16 + y) == c3 + 4 * k * (x / 4 + 1),
          s"doc $id MB5 ($x,$y)")
      }
      val expMean = (c0 + c1 + p + c2 + 2 * c3 + 10 * k).toDouble / 6
      assert(r.getAs[Double]("y_mean") == expMean)
    }
  }

  test("entropy swap: the SAME quadrant plan through CAVLC and CABAC " +
      "reconstructs byte-identical luma planes") {
    for ((v0, s1, v2) <- Seq((1, false, 2), (4, true, 3))) {
      // CAVLC side: the existing i16 fixture
      val cavlc = Seq(Tuple1(0L)).toDF("doc_id")
        .select(H264Decode.syntheticCavlcI16AnnexB(lit(v0), lit(s1),
          lit(v2)).as("payload"))
      val a = H264Decode.decodeIdr(cavlc, "payload").collect()(0)
      assert(a.getAs[String]("decode_error") == null)
      // CABAC side: the equivalent 2×2 plan (same mb types, same
      // coefficients — i16SliceRbsp's documented layout)
      def mb(tpe: Int)(f: CabacSlice.MbData => Unit): CabacSlice.MbData = {
        val m = new CabacSlice.MbData
        m.clear(); m.mbType = tpe; f(m); m
      }
      val cbAc = { val x = new Array[Int](15); x(0) = 1; x(3) = 1; x }
      val crAc = { val x = new Array[Int](15)
        x(0) = 1; x(1) = -1; x(2) = 2; x(4) = 2; x(5) = -1; x(8) = 1; x }
      val plans = Seq(
        mb(11) { m =>
          m.lumaDc(0) = v0
          Array(2, 1, -1, 0).copyToArray(m.chromaDc(0))
          Array(1, -1, 1, -1).copyToArray(m.chromaDc(1))
          for (b <- 0 until 4) {
            cbAc.copyToArray(m.chromaAc(0)(b))
            crAc.copyToArray(m.chromaAc(1)(b))
          }
        },
        mb(2)(m => m.lumaDc(0) = if (s1) -1 else 1),
        mb(1)(m => m.lumaDc(0) = v2),
        mb(3)(_ => ()))
      val w = new VideoBitstream.BitWriter
      // same IDR header the CAVLC fixture writes (via the shared writer)
      w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
      w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
      w.alignByteOnes()
      val slice = w.bytes ++ H264Decode.encodeCabacSlice(2, 2, 28, plans)
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
        out += 0; out += 0; out += 0; out += 1
        out += ((refIdc << 5) | tpe).toByte
        out ++= VideoBitstream.escapeRbsp(rbsp)
      }
      nal(3, 7, VideoBitstream.syntheticSpsRbsp(2, 2))
      nal(3, 8, H264Decode.cabacPpsRbsp)
      nal(3, 5, slice)
      val cabacDf = Seq(Tuple1(out.toArray)).toDF("payload")
      val b = H264Decode.decodeIdr(cabacDf, "payload",
        cabac = Some(Cabac.Config.derived)).collect()(0)
      assert(b.getAs[String]("decode_error") == null)
      assert(b.getAs[Array[Byte]]("luma_plane")
        .sameElements(a.getAs[Array[Byte]]("luma_plane")),
        s"entropy swap changed pixels for ($v0,$s1,$v2)")
    }
  }

  test("MP4 keyframe route over CABAC sync samples: avcC carries the " +
      "CABAC PPS, every keyframe decodes closed-form, non-IDR samples skip") {
    val df = Seq(Tuple1(0L)).toDF("doc_id")
      .select(H264Decode.syntheticCabacMp4(lit(5), lit(2), lit(1),
        lit(false), lit(2), lit(2), lit(160)).as("payload"))
    val rows = H264Decode.decodeMp4Keyframes(df, "payload",
        cabac = Some(Cabac.Config.derived))
      .collect().sortBy(_.getAs[Int]("sample_idx"))
    assert(rows.length == 3) // sync samples 0, 2, 4 (1-based idx 1, 3, 5)
    for (r <- rows) {
      assert(r.getAs[String]("decode_error") == null)
      assert(r.getAs[Int]("mb_count") == 6)
      val k = r.getAs[Int]("sample_idx") - 1
      val c0 = 128 + 1 + (1 + 3 * k) % 5
      val c1 = c0 + 1
      val c2 = c0 + 2
      val c3 = (c1 + c2 + 1) >> 1
      val expMean = (c0 + c1 + 160 + c2 + 2 * c3 + 10 * 2).toDouble / 6
      assert(r.getAs[Double]("y_mean") == expMean, s"sample $k")
    }
    // without the config the sync samples refuse by name, per sample
    val ref = H264Decode.decodeMp4Keyframes(df, "payload").collect()
    assert(ref.forall(_.getAs[String]("decode_error") != null))
    assert(ref.head.getAs[String]("decode_error").contains("CABAC"))
  }

  test("real CABAC streams still refuse by name without injected tables; " +
      "garbage slice bytes degrade per-clip, never throw") {
    val df = Seq(Tuple1(0L)).toDF("doc_id")
      .select(H264Decode.syntheticCabacAnnexB(lit(1), lit(false), lit(2),
        lit(1), lit(150)).as("payload"))
    val refused = H264Decode.decodeIdr(df, "payload").collect()(0)
    assert(refused.getAs[String]("decode_error") != null)
    assert(refused.getAs[String]("decode_error").contains("CABAC"))
    // garbage: CABAC PPS + random slice payload → per-clip error or a
    // decoded plane, never an exception
    val rnd = new scala.util.Random(11)
    val rows = (0 until 30).map { i =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
        out += 0; out += 0; out += 0; out += 1
        out += ((refIdc << 5) | tpe).toByte
        out ++= VideoBitstream.escapeRbsp(rbsp)
      }
      nal(3, 7, VideoBitstream.syntheticSpsRbsp(2, 2))
      nal(3, 8, H264Decode.cabacPpsRbsp)
      nal(3, 5, Array.fill(20 + rnd.nextInt(60))(rnd.nextInt(256).toByte))
      (i.toLong, out.toArray)
    }
    val garbage = rows.toDF("doc_id", "payload")
    val decoded = H264Decode.decodeIdr(garbage, "payload",
      cabac = Some(Cabac.Config.derived)).collect()
    assert(decoded.length == 30) // every row survived (error or plane)
  }
  // High-profile monochrome SPS (chroma_format_idc 0), mbw x 1 MBs
  private def monoSpsRbsp(mbw: Int): Array[Byte] = {
    val w = new VideoBitstream.BitWriter
    w.u(100, 8); w.u(0, 8); w.u(30, 8)
    w.ue(0) // sps id
    w.ue(0) // chroma_format_idc 0: monochrome
    w.ue(0); w.ue(0) // bit depths 8
    w.u(0, 1) // qpprime
    w.u(0, 1) // no scaling matrix
    w.ue(0); w.ue(2); w.ue(1); w.u(1, 1)
    w.ue(mbw - 1); w.ue(0) // mbw x 1 MBs
    w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
    w.rbspTrailing(); w.bytes
  }

  private def annexbOf(nals: (Int, Int, Array[Byte])*): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    nals.foreach { case (refIdc, tpe, rbsp) =>
      out += 0; out += 0; out += 0; out += 1
      out += ((refIdc << 5) | tpe).toByte
      out ++= VideoBitstream.escapeRbsp(rbsp)
    }
    out.toArray
  }

  test("monochrome CABAC I-slice: chroma pred / cbp suffix / chroma " +
      "residuals / PCM chroma bytes all ABSENT; pixels hit the " +
      "hand-derived laws (I16 DC 128+c, PCM passthrough, I4x4 " +
      "horizontal cascade +4k per block column)") {
    def mb(tpe: Int)(f: CabacSlice.MbData => Unit): CabacSlice.MbData = {
      val m = new CabacSlice.MbData
      m.clear(); m.mbType = tpe; f(m); m
    }
    val c = 5
    val pcm = 77
    val k = 2
    val plans = Seq(
      mb(3)(m => m.lumaDc(0) = c), // I16 DC pred, cbp 0
      mb(25)(m => java.util.Arrays.fill(m.pcmLuma, pcm)),
      mb(0) { m => // I4x4 all-Horizontal, DC residual k per block
        m.cbp = 15
        var b = 0
        while (b < 16) { m.i4Modes(b) = 1; m.lumaAc(b)(0) = k; b += 1 }
      })
    val w = new VideoBitstream.BitWriter
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
    w.alignByteOnes()
    val slice = w.bytes ++ H264Decode.encodeCabacSlice(3, 1, 28, plans,
      chromaFormat = 0)
    val stream = annexbOf((3, 7, monoSpsRbsp(3)), (3, 8, H264Decode.cabacPpsRbsp),
      (3, 5, slice))
    val out = H264Decode.decodeIdr(Seq(Tuple1(stream)).toDF("payload"),
      "payload", cabac = Some(cfg)).collect()(0)
    assert(out.getAs[String]("decode_error") == null,
      s"decode_error: ${out.getAs[String]("decode_error")}")
    val luma = out.getAs[Array[Byte]]("luma_plane")
    val wpx = 48
    for (y <- 0 until 16; x <- 0 until 48) {
      val v = luma(y * wpx + x) & 0xff
      val want =
        if (x < 16) 128 + c // I16 DC over no-neighbour 128 prediction
        else if (x < 32) pcm // I_PCM passthrough
        else pcm + 4 * k * ((x - 32) / 4 + 1) // horizontal cascade
      assert(v == want, s"($x,$y): got $v want $want")
    }
  }

  test("monochrome entropy swap: the same I16+PCM plan through CAVLC " +
      "and CABAC decodes byte-identical planes; CAVLC monochrome I_NxN " +
      "refuses by the Table 9-4 column name") {
    // CAVLC side: monochrome I16 DC (c) then I_PCM (no chroma bytes)
    val c = 9
    val pcm = 200
    val cavlcSlice = {
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
      w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
      w.ue(3) // mb_type 3: I16 DC, cbp 0 — NO intra_chroma_pred_mode
      w.se(0)
      Cavlc.encodeResidualBlock(w, { val a = new Array[Int](16); a(0) = c; a }, 0, 16)
      w.ue(25) // I_PCM
      w.alignByte()
      var i = 0
      while (i < 256) { w.u(pcm, 8); i += 1 } // luma ONLY for monochrome
      w.rbspTrailing(); w.bytes
    }
    val cavlcStream = annexbOf((3, 7, monoSpsRbsp(2)),
      (3, 8, H264Decode.cavlcPpsRbsp), (3, 5, cavlcSlice))
    def mb(tpe: Int)(f: CabacSlice.MbData => Unit): CabacSlice.MbData = {
      val m = new CabacSlice.MbData
      m.clear(); m.mbType = tpe; f(m); m
    }
    val cabacSlice = {
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
      w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
      w.alignByteOnes()
      w.bytes ++ H264Decode.encodeCabacSlice(2, 1, 28, Seq(
        mb(3)(m => m.lumaDc(0) = c),
        mb(25)(m => java.util.Arrays.fill(m.pcmLuma, pcm))),
        chromaFormat = 0)
    }
    val cabacStream = annexbOf((3, 7, monoSpsRbsp(2)),
      (3, 8, H264Decode.cabacPpsRbsp), (3, 5, cabacSlice))
    val rows = H264Decode.decodeIdr(
      Seq((0L, cavlcStream), (1L, cabacStream)).toDF("doc_id", "payload"),
      "payload", cabac = Some(cfg)).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(rows.forall(_.getAs[String]("decode_error") == null),
      rows.map(_.getAs[String]("decode_error")).mkString("; "))
    assert(java.util.Arrays.equals(rows(0).getAs[Array[Byte]]("luma_plane"),
      rows(1).getAs[Array[Byte]]("luma_plane")),
      "monochrome entropy swap changed pixels")
    // CAVLC monochrome I_NxN: the Table 9-4 mono column is NOT carried
    val i4Slice = {
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
      w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
      w.ue(0) // I_NxN
      var b = 0
      while (b < 16) { w.u(1, 1); b += 1 } // all prev-flag modes
      w.ue(0) // would-be cbp codeNum — mapping differs for mono
      w.rbspTrailing(); w.bytes
    }
    val err = H264Decode.decodeIdr(Seq(Tuple1(annexbOf(
      (3, 7, monoSpsRbsp(1)), (3, 8, H264Decode.cavlcPpsRbsp),
      (3, 5, i4Slice)))).toDF("payload"), "payload")
      .collect()(0).getAs[String]("decode_error")
    assert(err != null && err.contains("Table 9-4 ChromaArrayType-0"),
      s"got: $err")
  }

  test("the engine is genuinely TABLE-PARAMETERIZED: a different valid " +
      "probability table (distinct decay law, tripwire-clean) round-trips " +
      "the same plan to the same pixels; decoding with the WRONG table " +
      "does not silently yield the right plane") {
    // alternate tables from a different design law (steeper decay,
    // shifted quartiles) — valid by the same construction as Derived
    val altTables = {
      val alpha = math.pow(0.03 / 0.5, 1.0 / 63)
      val q = Array(300.0, 360.0, 420.0, 470.0)
      val pr = Array.tabulate(64)(st => 0.5 * math.pow(alpha, st))
      val range = Array.tabulate(64, 4) { (st, j) =>
        if (st == 63) 2
        else math.max(2, math.min(if (j == 0) 128 else 240,
          math.floor(q(j) * pr(st)).toInt))
      }
      val lps = Array.tabulate(64) { st =>
        if (st == 63) 63
        else {
          val pNew = alpha * pr(st) + (1 - alpha)
          math.min((0 until 64).minBy(x => math.abs(pr(x) - pNew)), st)
        }
      }
      val mps = Array.tabulate(64)(st => if (st >= 62) st else st + 1)
      new Cabac.Tables(range, lps, mps)
    }
    val altCtx = Array.tabulate(277)(i => Array(1, 30 + (i * 7) % 80))
    val altCfg = Cabac.Config(altTables, altCtx)
    def mb(tpe: Int)(f: CabacSlice.MbData => Unit): CabacSlice.MbData = {
      val m = new CabacSlice.MbData
      m.clear(); m.mbType = tpe; f(m); m
    }
    def plans() = Seq(
      mb(11) { m =>
        m.lumaDc(0) = 6
        Array(2, 1, -1, 0).copyToArray(m.chromaDc(0))
        Array(1, -1, 1, -1).copyToArray(m.chromaDc(1))
        var b = 0
        while (b < 4) { m.chromaAc(0)(b)(0) = 1; m.chromaAc(1)(b)(2) = 2; b += 1 }
      },
      mb(2)(m => m.lumaDc(0) = -1),
      mb(25)(m => { java.util.Arrays.fill(m.pcmLuma, 99)
        java.util.Arrays.fill(m.pcmChroma, 128) }),
      mb(0) { m =>
        m.cbp = 15
        var b = 0
        while (b < 16) { m.i4Modes(b) = 1; m.lumaAc(b)(0) = 2; b += 1 }
      })
    def stream(cfg: Cabac.Config): Array[Byte] = {
      val w = new VideoBitstream.BitWriter
      w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
      w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
      w.alignByteOnes()
      val slice = w.bytes ++ H264Decode.encodeCabacSlice(2, 2, 28, plans(), cfg)
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
        out += 0; out += 0; out += 0; out += 1
        out += ((refIdc << 5) | tpe).toByte
        out ++= VideoBitstream.escapeRbsp(rbsp)
      }
      nal(3, 7, VideoBitstream.syntheticSpsRbsp(2, 2))
      nal(3, 8, H264Decode.cabacPpsRbsp)
      nal(3, 5, slice)
      out.toArray
    }
    def decode(bytes: Array[Byte], cfg: Cabac.Config) =
      H264Decode.decodeIdr(Seq(Tuple1(bytes)).toDF("payload"), "payload",
        cabac = Some(cfg)).collect()(0)
    val viaAlt = decode(stream(altCfg), altCfg)
    val viaDerived = decode(stream(cfg), cfg)
    assert(viaAlt.getAs[String]("decode_error") == null,
      s"alt-table round-trip failed: ${viaAlt.getAs[String]("decode_error")}")
    // the PLAN is the ground truth: both configs must reconstruct the
    // same pixels from their own encodes
    assert(java.util.Arrays.equals(viaAlt.getAs[Array[Byte]]("luma_plane"),
      viaDerived.getAs[Array[Byte]]("luma_plane")),
      "alt tables round-trip to different pixels")
    // wrong-table decode must NOT silently produce the right plane:
    // either a named per-clip error or different pixels
    val cross = decode(stream(altCfg), cfg)
    val crossOk = cross.getAs[String]("decode_error") != null ||
      !java.util.Arrays.equals(cross.getAs[Array[Byte]]("luma_plane"),
        viaAlt.getAs[Array[Byte]]("luma_plane"))
    assert(crossOk, "decoding with the wrong tables reproduced the plane")
  }
}
