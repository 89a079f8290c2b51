package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HEVC structure census ([[Hevc]]): the two-byte NAL header walk, the
  * real SPS parse, IRAP counting, named refusals and fuzz degradation.
  */
class HevcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hevcMeta: synthetic clip census is exact (dims, PTL, IRAP counts)") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      Hevc.syntheticHevcAnnexB(lit(1920), lit(1080), lit(2), lit(120),
        lit(2), lit(2), lit(1), lit(3)).as("payload"))
    val r = Hevc.hevcMeta(df, "payload").collect()(0)
    assert(r.getAs[String]("parse_error") == null)
    assert(r.getAs[Int]("nal_count") == 9) // vps+sps+pps + 2 idr + 1 cra + 3 trail
    assert(r.getAs[Int]("irap_count") == 3)
    assert(r.getAs[Int]("idr_count") == 2)
    assert(r.getAs[Int]("cra_count") == 1)
    assert(r.getAs[Boolean]("has_vps") && r.getAs[Boolean]("has_pps"))
    assert(r.getAs[Int]("width") == 1920)
    assert(r.getAs[Int]("height") == 1080)
    assert(r.getAs[Int]("profile_idc") == 2)
    assert(r.getAs[Int]("tier_flag") == 0)
    assert(r.getAs[Int]("level_idc") == 120)
    assert(r.getAs[Int]("chroma_format_idc") == 1)
    assert(r.getAs[Int]("bit_depth_luma") == 10)
    assert(r.getAs[Int]("bit_depth_chroma") == 10)
  }

  test("named refusals: sub-layer PTL; counts survive a bad SPS") {
    // hand-build an SPS with sps_max_sub_layers_minus1 = 2
    val w = new VideoBitstream.BitWriter
    w.u(0, 4); w.u(2, 3); w.u(1, 1)
    w.u(0, 2); w.u(0, 1); w.u(1, 5); w.u(0, 32); w.u(0, 4)
    w.u(0, 22); w.u(0, 22); w.u(93, 8)
    w.rbspTrailing()
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def nal(tpe: Int, rbsp: Array[Byte]): Unit = {
      out += 0; out += 0; out += 0; out += 1
      out += ((tpe << 1) & 0x7e).toByte; out += 1
      out ++= VideoBitstream.escapeRbsp(rbsp)
    }
    nal(33, w.bytes)
    nal(19, Array[Byte](1, 2, 3))
    val r = Hevc.hevcMeta(Seq(Tuple1(out.toArray)).toDF("payload")).collect()(0)
    assert(r.getAs[String]("parse_error").contains("sub-layer PTL"))
    assert(r.getAs[Int]("irap_count") == 1) // the walk still counted NALs
    assert(r.isNullAt(r.fieldIndex("width")))
  }

  test("degradation: no start code, forbidden bit, fuzz — never throws") {
    val noStart = Hevc.hevcMeta(Seq(Tuple1(Array[Byte](1, 2, 3, 4)))
      .toDF("payload")).collect()(0)
    assert(noStart.getAs[String]("parse_error") != null)
    val rnd = new scala.util.Random(5)
    val fuzz = (0 until 40).map { _ =>
      val b = Array.fill(20 + rnd.nextInt(60))(rnd.nextInt(256).toByte)
      b(0) = 0; b(1) = 0; b(2) = 1 // force a start code so the walk runs
      Tuple1(b)
    }
    assert(Hevc.hevcMeta(fuzz.toDF("payload")).collect().length == 40)
  }
  test("conformance window offsets are APPLIED in chroma units: an " +
      "854x480-class SPS reports the cropped dims, like the H.264 leg") {
    // hand-built SPS: 856x480 coded, conf_win_right_offset = 1 (x2 for
    // 4:2:0 SubWidthC) -> 854 wide
    val w = new VideoBitstream.BitWriter
    w.u(0, 4) // vps id
    w.u(0, 3) // max_sub_layers_minus1
    w.u(1, 1) // nesting
    w.u(0, 2); w.u(0, 1); w.u(1, 5) // profile space/tier/idc
    w.u(0, 32); w.u(0, 4); w.u(0, 22); w.u(0, 22)
    w.u(93, 8) // level
    w.ue(0) // sps id
    w.ue(1) // chroma 4:2:0
    w.ue(856); w.ue(480)
    w.u(1, 1) // conformance_window_flag
    w.ue(0); w.ue(1); w.ue(0); w.ue(0) // right offset 1 chroma unit
    w.ue(0); w.ue(0) // bit depths 8
    w.rbspTrailing()
    val sps = Hevc.parseSps(w.bytes)
    assert(sps.isRight, sps)
    assert(sps.toOption.get.width == 854, s"got ${sps.toOption.get.width}")
    assert(sps.toOption.get.height == 480)
  }

}
