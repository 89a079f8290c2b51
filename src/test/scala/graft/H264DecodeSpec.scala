package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class H264DecodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decodeIdr: gradient round-trips pixel-exact through the real " +
      "SPS/PPS/slice-header/slice-data walk (emulation bytes included)") {
    // base 0, slope 1: luma hits long 00 00 runs, so emulation-prevention
    // escaping REALLY fires in the generator and unescaping in the decoder
    val df = Seq((0L, 2, 1, 0, 1), (1L, 3, 2, 37, 5))
      .toDF("doc_id", "mbw", "mbh", "base", "slope")
      .select(col("doc_id"), col("mbw"), col("mbh"), col("base"), col("slope"),
        H264Decode.syntheticIPcmAnnexB(col("mbw"), col("mbh"),
          col("base"), col("slope")).as("payload"))
    val out = H264Decode.decodeIdr(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r0 = out(0L)
    assert(r0.getAs[String]("decode_error") == null)
    assert(r0.getAs[Int]("frame_width") == 32)
    assert(r0.getAs[Int]("frame_height") == 16)
    assert(r0.getAs[Int]("mb_count") == 2)
    val luma0 = r0.getAs[Array[Byte]]("luma_plane")
    assert(luma0.length == 32 * 16)
    // pixel (x, y) = (0 + 1·x) mod 256, constant down each column
    for (y <- 0 until 16; x <- 0 until 32)
      assert((luma0(y * 32 + x) & 0xff) == x % 256, s"pixel ($x,$y)")
    // exact mean of the gradient: sum(x)/32 = 15.5
    assert(r0.getAs[Double]("y_mean") == 15.5)
    val r1 = out(1L)
    assert(r1.getAs[String]("decode_error") == null)
    val luma1 = r1.getAs[Array[Byte]]("luma_plane")
    for (y <- 0 until 32; x <- 0 until 48)
      assert((luma1(y * 48 + x) & 0xff) == (37 + 5 * x) % 256, s"pixel ($x,$y)")
  }

  test("decodeIdr: degradation names the exact refusal — entropy-coded " +
      "slices point at the decodeStub seam, structural gaps name themselves") {
    // the existing syntheticAnnexB emits OPAQUE slice bodies (not valid
    // slice_data): the decoder must refuse it cleanly, not crash. Its
    // first ue() reads from high-bit garbage, so any error row is
    // acceptable as long as it names something (never a crash).
    val opaque = Seq((0L, 1)).toDF("doc_id", "x")
      .select(col("doc_id"), VideoBitstream.syntheticAnnexB(
        lit(2), lit(1), lit(1), lit(1), lit(3)).as("payload"))
    val e0 = H264Decode.decodeIdr(opaque).collect().head
    assert(e0.getAs[String]("decode_error") != null)
    // a REAL entropy-coded mb_type (e.g. 0 = I_4x4) hits the named seam
    val handBuilt = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
        out += 0; out += 0; out += 0; out += 1
        out += ((refIdc << 5) | tpe).toByte
        out ++= VideoBitstream.escapeRbsp(rbsp)
      }
      nal(3, 7, VideoBitstream.syntheticSpsRbsp(1, 1))
      val pps = {
        val w = new VideoBitstream.BitWriter
        // entropy_coding_mode_flag = 1: CABAC — the remaining entropy
        // seam now that I_4x4 decodes for real
        w.ue(0); w.ue(0); w.u(1, 1); w.u(0, 1); w.ue(0)
        w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
        w.se(0); w.se(0); w.se(0); w.u(0, 1); w.u(0, 1); w.u(0, 1)
        w.rbspTrailing(); w.bytes
      }
      nal(3, 8, pps)
      val slice = {
        val w = new VideoBitstream.BitWriter
        w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
        w.u(0, 1); w.u(0, 1); w.se(0)
        w.rbspTrailing(); w.bytes
      }
      nal(3, 5, slice)
      out.toArray
    }
    val e1 = H264Decode.decodeIdr(
      Seq((0L, handBuilt)).toDF("doc_id", "payload")).collect().head
    // the refusal names the NARROWED gap: the §9.3 engine exists
    // (Cabac.scala); the probability/context-init tables do not
    assert(e1.getAs[String]("decode_error").contains("CABAC stream") &&
      e1.getAs[String]("decode_error").contains("not conformance-anchored"))
    // structural gaps
    val more = Seq(
      (1L, "not a stream".getBytes("UTF-8")),
      (2L, null: Array[Byte])).toDF("doc_id", "payload")
    val errs = H264Decode.decodeIdr(more).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decode_error")).toMap
    assert(errs(1L) == "no Annex-B start code")
    assert(errs(2L) == "null payload")
  }

  test("decodeIdr: pic_order_cnt_type 1 is a NAMED refusal, never a " +
      "silent bit-shift") {
    // poc_type-1 SPS: the slice header may carry delta_pic_order_cnt
    // fields this parse does not model — the clip must refuse by name
    val sps = {
      val w = new VideoBitstream.BitWriter
      w.u(66, 8); w.u(0, 8); w.u(30, 8)
      w.ue(0) // sps id
      w.ue(0) // log2_max_frame_num_minus4
      w.ue(1) // pic_order_cnt_type 1
      w.u(0, 1) // delta_pic_order_always_zero_flag = 0
      w.se(0); w.se(0) // offsets
      w.ue(0) // num_ref_frames_in_pic_order_cnt_cycle
      w.ue(1) // max_num_ref_frames
      w.u(1, 1)
      w.ue(0); w.ue(0) // 1×1 MBs
      w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
      w.rbspTrailing(); w.bytes
    }
    val stream = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
        out += 0; out += 0; out += 0; out += 1
        out += ((refIdc << 5) | tpe).toByte
        out ++= VideoBitstream.escapeRbsp(rbsp)
      }
      nal(3, 7, sps)
      val pps = {
        val w = new VideoBitstream.BitWriter
        w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1); w.ue(0)
        w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
        w.se(0); w.se(0); w.se(0); w.u(0, 1); w.u(0, 1); w.u(0, 1)
        w.rbspTrailing(); w.bytes
      }
      nal(3, 8, pps)
      nal(3, 5, Array[Byte](0x88.toByte)) // any slice bytes: refused before parse
      out.toArray
    }
    val out = H264Decode.decodeIdr(
      Seq((0L, stream)).toDF("doc_id", "payload")).collect().head
    assert(out.getAs[String]("decode_error") == "pic_order_cnt_type 1 not supported")
  }

  test("decodeMp4Keyframes: every sync sample decodes to its own " +
      "gradient plane through avcC + the sample tables; non-sync skipped") {
    // 5 samples, sync period 2 → keyframes at k = 0, 2, 4 with gradient
    // bases 10, 32, 54; non-sync samples carry opaque non-IDR NALs
    val df = Seq((0L, 1)).toDF("doc_id", "x")
      .select(col("doc_id"), H264Decode.syntheticIPcmMp4(
        lit(2), lit(1), lit(5), lit(2), lit(10), lit(3)).as("payload"))
    val out = H264Decode.decodeMp4Keyframes(df)
      .orderBy("sample_idx").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Int]("sample_idx")).toSeq == Seq(1, 3, 5))
    assert(out.forall(_.getAs[String]("decode_error") == null))
    assert(out.forall(_.getAs[Int]("frame_width") == 32))
    out.zip(Seq(0, 2, 4)).foreach { case (row, k) =>
      val luma = row.getAs[Array[Byte]]("luma_plane")
      for (y <- 0 until 16; x <- 0 until 32)
        assert((luma(y * 32 + x) & 0xff) == (10 + 11 * k + 3 * x) % 256,
          s"sample $k pixel ($x,$y)")
    }
    // the metadata-grade syntheticMp4 (fake PPS bytes, opaque samples)
    // must DEGRADE, never crash — one clip-level error row
    val meta = Seq((1L, 1)).toDF("doc_id", "x")
      .select(col("doc_id"), VideoBitstream.syntheticMp4(
        lit(2), lit(1), lit(3), lit(1), lit(4)).as("payload"))
    val err = H264Decode.decodeMp4Keyframes(meta).collect()
    assert(err.forall(_.getAs[String]("decode_error") != null))
    // structural gaps — non-BMFF bytes are NOT "no video track" (the two
    // failure classes bucket separately in a curation pipeline)
    val more = Seq((2L, "no box here".getBytes("UTF-8")),
      (3L, null: Array[Byte])).toDF("doc_id", "payload")
    val errs = H264Decode.decodeMp4Keyframes(more).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decode_error")).toMap
    assert(errs(2L) == "not ISO-BMFF (no moov box)")
    assert(errs(3L) == "null payload")
  }

  test("decodeMp4Keyframes: a clip whose stss matches no sample " +
      "surfaces as a named row, never silently vanishes; zero-length " +
      "avcC parameter sets refuse by name") {
    val full = Seq((0L, 1)).toDF("a", "b")
      .select(H264Decode.syntheticIPcmMp4(
        lit(1), lit(1), lit(3), lit(1), lit(7), lit(2)).as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    def findBox(b: Array[Byte], tpe: String): Int = {
      val t = tpe.getBytes("US-ASCII")
      var i = 0
      while (i + 4 <= b.length &&
        !(b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3))) i += 1
      i
    }
    // stss entry_count := 0 (count u32 sits after fourcc + version/flags)
    val noSync = full.clone()
    val st = findBox(noSync, "stss")
    (0 until 4).foreach(k => noSync(st + 8 + k) = 0)
    val out1 = H264Decode.decodeMp4Keyframes(
      Seq((0L, noSync)).toDF("doc_id", "payload")).collect()
    assert(out1.length == 1)
    assert(out1.head.getAs[String]("decode_error") == "no sync samples in clip")
    // avcC SPS length := 0 — must be the NAMED refusal, not a
    // NegativeArraySizeException through the generic catch
    val zeroSps = full.clone()
    val av = findBox(zeroSps, "avcC")
    zeroSps(av + 4 + 6) = 0; zeroSps(av + 4 + 7) = 0
    val out2 = H264Decode.decodeMp4Keyframes(
      Seq((0L, zeroSps)).toDF("doc_id", "payload")).collect()
    assert(out2.length == 1)
    assert(out2.head.getAs[String]("decode_error") == "no SPS in avcC record")
  }

  test("decodeIdr: a crafted SPS claiming a giant frame refuses BY " +
      "NAME before any plane allocation — tiny payloads can never size a " +
      "multi-GB array off untrusted dims") {
    def annexB(spsRbsp: Array[Byte]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
        out += 0; out += 0; out += 0; out += 1
        out += ((refIdc << 5) | tpe).toByte
        out ++= VideoBitstream.escapeRbsp(rbsp)
      }
      nal(3, 7, spsRbsp)
      val pps = {
        val w = new VideoBitstream.BitWriter
        w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1); w.ue(0)
        w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
        w.se(0); w.se(0); w.se(0); w.u(0, 1); w.u(0, 1); w.u(0, 1)
        w.rbspTrailing(); w.bytes
      }
      nal(3, 8, pps)
      nal(3, 5, Array[Byte](0x88.toByte)) // tiny slice: refused before parse
      out.toArray
    }
    // ~46000×46000 luma: the ADVICE bomb shape — refused at the plane cap
    val bomb = H264Decode.decodeIdr(Seq(
      (0L, annexB(VideoBitstream.syntheticSpsRbsp(2875, 2875))))
      .toDF("doc_id", "payload")).collect().head
    assert(bomb.getAs[String]("decode_error") != null)
    assert(bomb.getAs[String]("decode_error").contains("plane cap"))
    // a 4096×4096 claim fits the cap but the 1-byte slice cannot possibly
    // hold 65536 I_PCM macroblocks — refused by the plausibility check
    val thin = H264Decode.decodeIdr(Seq(
      (0L, annexB(VideoBitstream.syntheticSpsRbsp(256, 256))))
      .toDF("doc_id", "payload")).collect().head
    assert(thin.getAs[String]("decode_error") != null)
    assert(thin.getAs[String]("decode_error").contains("too small"))
    // the override buys headroom back explicitly, same as maxInflatedBytes
    val eased = H264Decode.decodeIdr(Seq(
      (0L, annexB(VideoBitstream.syntheticSpsRbsp(256, 256))))
      .toDF("doc_id", "payload"), maxPlaneBytes = 8L << 20).collect().head
    assert(eased.getAs[String]("decode_error").contains("plane cap"))
  }

  test("decodeIdr: >8-bit High-profile streams refuse BY NAME — a " +
      "fixed-8-bit PCM walk over 10-bit samples would mis-align and could " +
      "ship a WRONG plane with decode_error null") {
    val sps10bit = {
      val w = new VideoBitstream.BitWriter
      w.u(100, 8) // profile_idc: High
      w.u(0, 8); w.u(30, 8)
      w.ue(0) // sps id
      w.ue(1) // chroma_format_idc 4:2:0
      w.ue(2) // bit_depth_luma_minus8 = 2 → 10-bit
      w.ue(0) // bit_depth_chroma_minus8
      w.u(0, 1) // qpprime_y_zero_transform_bypass_flag
      w.u(0, 1) // seq_scaling_matrix_present_flag
      w.ue(0) // log2_max_frame_num_minus4
      w.ue(2) // pic_order_cnt_type
      w.ue(1) // max_num_ref_frames
      w.u(1, 1)
      w.ue(0); w.ue(0) // 1×1 MBs
      w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
      w.rbspTrailing(); w.bytes
    }
    val stream = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      def nal(refIdc: Int, tpe: Int, rbsp: Array[Byte]): Unit = {
        out += 0; out += 0; out += 0; out += 1
        out += ((refIdc << 5) | tpe).toByte
        out ++= VideoBitstream.escapeRbsp(rbsp)
      }
      nal(3, 7, sps10bit)
      val pps = {
        val w = new VideoBitstream.BitWriter
        w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1); w.ue(0)
        w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
        w.se(0); w.se(0); w.se(0); w.u(0, 1); w.u(0, 1); w.u(0, 1)
        w.rbspTrailing(); w.bytes
      }
      nal(3, 8, pps)
      nal(3, 5, Array[Byte](0x88.toByte))
      out.toArray
    }
    val out = H264Decode.decodeIdr(
      Seq((0L, stream)).toDF("doc_id", "payload")).collect().head
    assert(out.getAs[String]("decode_error") ==
      "bit depth 10/8 not supported (only 8-bit)")
  }

  test("decodeIdr: truncation mid-slice degrades per clip") {
    val full = Seq((0L, 1)).toDF("a", "b")
      .select(H264Decode.syntheticIPcmAnnexB(lit(2), lit(2), lit(10), lit(3)).as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    val cut = java.util.Arrays.copyOf(full, full.length / 2)
    val out = H264Decode.decodeIdr(
      Seq((0L, cut)).toDF("doc_id", "payload")).collect().head
    assert(out.getAs[String]("decode_error") != null)
  }
}
