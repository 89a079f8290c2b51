package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF census ([[Ivf]]): the DKIF walk, the AV1 sequence-header parse
  * (incl. the tier bit for levels > 7), VP9/VP8 keyframe tags, leb128,
  * and degradation.
  */
class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("leb128 round-trip widths") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L)) {
      val bos = new java.io.ByteArrayOutputStream()
      var x = v
      do { val b = (x & 0x7f).toInt; x >>= 7
        bos.write(if (x != 0) b | 0x80 else b) } while (x != 0)
      val arr = bos.toByteArray
      assert(Ivf.leb128(arr, 0) == ((v, arr.length)), s"v=$v")
    }
    assert(Ivf.leb128(Array(0x80.toByte), 0) == null) // truncated
  }

  test("AV1: sequence header parses profile/level/tier/dims exactly") {
    for ((fc, prof, lvl) <- Seq((0, 0, 8), (0, 2, 5))) {
      val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
        Ivf.syntheticIvf(lit(fc), lit(1280), lit(720), lit(6), lit(3),
          lit(prof), lit(lvl)).as("payload"))
      val r = Ivf.ivfMeta(df, "payload").collect()(0)
      assert(r.getAs[String]("parse_error") == null)
      assert(r.getAs[String]("fourcc") == "AV01")
      assert(r.getAs[Int]("hdr_frames") == 6)
      assert(r.getAs[Int]("walked_frames") == 6)
      assert(r.getAs[Int]("keyframes") == 2) // frames 0, 3
      assert(r.getAs[Int]("av1_profile") == prof)
      assert(r.getAs[Int]("av1_level") == lvl)
      assert(r.getAs[Int]("av1_width") == 1280)
      assert(r.getAs[Int]("av1_height") == 720)
    }
  }

  test("VP9 and VP8: keyframe tag bits counted") {
    for ((fc, cc) <- Seq((1, "VP90"), (2, "VP80"))) {
      val df = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
        Ivf.syntheticIvf(lit(fc), lit(320), lit(240), lit(7), lit(2),
          lit(0), lit(8)).as("payload"))
      val r = Ivf.ivfMeta(df, "payload").collect()(0)
      assert(r.getAs[String]("parse_error") == null)
      assert(r.getAs[String]("fourcc") == cc)
      assert(r.getAs[Int]("walked_frames") == 7)
      assert(r.getAs[Int]("keyframes") == 4) // frames 0,2,4,6
      assert(r.isNullAt(r.fieldIndex("av1_profile")))
    }
  }

  test("degradation: bad magic, truncated frame table, fuzz") {
    val bad = Ivf.ivfMeta(Seq(Tuple1(Array[Byte](1, 2, 3, 4, 5)))
      .toDF("payload")).collect()(0)
    assert(bad.getAs[String]("parse_error").contains("DKIF"))
    val clip = Seq(Tuple1(0L)).toDF("doc_id").select(
      Ivf.syntheticIvf(lit(0), lit(320), lit(240), lit(4), lit(2),
        lit(0), lit(9)).as("payload")).collect()(0).getAs[Array[Byte]]("payload")
    // cut inside the third frame: two full frames stay walkable
    val cut = clip.take(clip.length - 10)
    val r = Ivf.ivfMeta(Seq(Tuple1(cut)).toDF("payload")).collect()(0)
    assert(r.getAs[Int]("walked_frames") >= 2)
    assert(r.getAs[Int]("hdr_frames") == 4)
    val rnd = new scala.util.Random(13)
    val fuzz = (0 until 30).map { _ =>
      val b = Array.fill(40 + rnd.nextInt(60))(rnd.nextInt(256).toByte)
      b(0) = 'D'; b(1) = 'K'; b(2) = 'I'; b(3) = 'F'
      Tuple1(b)
    }
    assert(Ivf.ivfMeta(fuzz.toDF("payload")).collect().length == 30)
  }
}
