package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MP4 sample route's GOP decode ([[H264Decode.decodeMp4Gop]] /
  * [[H264Decode.decodeMp4GopColor]]): every frame of the container —
  * sync AND non-sync samples — through the SAME state machine as the
  * Annex-B route. The load-bearing assertions are route equivalences:
  * byte-identical planes frame-for-frame against decodeGop on the
  * equivalent Annex-B stream, including the I-B-P bracket.
  */
class Mp4GopSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decodeMp4Gop: all three samples decode (the keyframe route " +
      "sees only the sync one) and the planes match the Annex-B GOP " +
      "route byte-for-byte") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticGopMp4(lit(7), lit(true), lit(3),
        lit(8), lit(4)).as("payload"))
    val mp4 = H264Decode.decodeMp4Gop(df).orderBy("frame_idx").collect()
    assert(mp4.length == 3, mp4.mkString("\n"))
    assert(mp4.forall(_.getAs[String]("decode_error") == null),
      mp4.map(_.getAs[String]("decode_error")).mkString(";"))
    assert(mp4.map(_.getAs[String]("frame_type")).toSeq ==
      Seq("I", "P", "P"))
    // keyframe route: ONE decoded frame from the same clip
    val kf = H264Decode.decodeMp4Keyframes(df).collect()
    assert(kf.count(_.getAs[String]("decode_error") == null) == 1)
    // route equivalence against the Annex-B twin (frames 0..2 of the
    // 4-frame Annex-B fixture — the MP4 clip carries no refresh frame)
    val annexDf = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticGopAnnexB(lit(7), lit(true), lit(3),
        lit(8), lit(4), lit(9)).as("payload"))
    val annex = H264Decode.decodeGop(annexDf).orderBy("frame_idx").collect()
    for (i <- 0 until 3)
      assert(mp4(i).getAs[Array[Byte]]("luma_plane").toSeq ==
        annex(i).getAs[Array[Byte]]("luma_plane").toSeq, s"frame $i")
  }

  test("decodeMp4GopColor: chroma rides through non-sync samples; all " +
      "three planes match the Annex-B color route frame-for-frame") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticGopMp4(lit(5), lit(false), lit(2),
        lit(8), lit(8)).as("payload"))
    val mp4 = H264Decode.decodeMp4GopColor(df).orderBy("frame_idx").collect()
    assert(mp4.length == 3, mp4.mkString("\n"))
    assert(mp4.forall(_.getAs[String]("decode_error") == null),
      mp4.map(_.getAs[String]("decode_error")).mkString(";"))
    val annexDf = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticGopAnnexB(lit(5), lit(false), lit(2),
        lit(8), lit(8), lit(9)).as("payload"))
    val annex = H264Decode.decodeGopColor(annexDf)
      .orderBy("frame_idx").collect()
    for (i <- 0 until 3; c <- Seq("luma_plane", "cb_plane", "cr_plane"))
      assert(mp4(i).getAs[Array[Byte]](c).toSeq ==
        annex(i).getAs[Array[Byte]](c).toSeq, s"frame $i $c")
  }

  test("decodeMp4Gop: the I-B-P bracket decodes through the container " +
      "route — disposable temporal-direct B between its avcC-fed " +
      "anchors, equal to the Annex-B twin") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticBGopMp4(lit(7), lit(true), lit(3),
        lit(2), lit(1)).as("payload"))
    val mp4 = H264Decode.decodeMp4Gop(df).orderBy("frame_idx").collect()
    assert(mp4.length == 3, mp4.mkString("\n"))
    assert(mp4.forall(_.getAs[String]("decode_error") == null),
      mp4.map(_.getAs[String]("decode_error")).mkString(";"))
    assert(mp4.map(_.getAs[String]("frame_type")).toSeq ==
      Seq("I", "P", "B"))
    val annexDf = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticBGopAnnexB(lit(7), lit(true), lit(3),
        lit(2), lit(1)).as("payload"))
    val annex = H264Decode.decodeGop(annexDf).orderBy("frame_idx").collect()
    for (i <- 0 until 3)
      assert(mp4(i).getAs[Array[Byte]]("luma_plane").toSeq ==
        annex(i).getAs[Array[Byte]]("luma_plane").toSeq, s"frame $i")
  }

  test("decodeMp4Gop: container refusals are NAMED (not ISO-BMFF, no " +
      "avcC, no coded slice)") {
    val junk = H264Decode.decodeMp4Gop(
      Seq((0L, Array.fill[Byte](64)(7))).toDF("doc_id", "payload"))
      .collect()(0)
    assert(junk.getAs[String]("decode_error").contains("moov"),
      junk.toString)
  }
}
