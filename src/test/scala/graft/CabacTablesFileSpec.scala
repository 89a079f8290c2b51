package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The CABAC tables-FILE injection path ([[Cabac.Config.fromText]] /
  * `fromFile` / `resolve`): the operational no-rebuild route for a user
  * who has the spec's conformance tables. Round-trips the render/parse
  * pair, drives the `spark.graft.cabacTables` conf end-to-end through
  * [[H264Decode.decodeIdr]], and pins the loader's rejections (missing
  * sections, wrong counts, tripwire violations, ctxInit coverage).
  */
class CabacTablesFileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("renderTablesFile -> fromText round-trips the derived config") {
    val txt = Cabac.Config.renderTablesFile(Cabac.Config.derived)
    val cfg = Cabac.Config.fromText(txt)
    assert(cfg.tables.rangeLps.map(_.toSeq).toSeq ==
      Cabac.Derived.rangeLps.map(_.toSeq).toSeq)
    assert(cfg.tables.transLps.sameElements(Cabac.Derived.transLps))
    assert(cfg.tables.transMps.sameElements(Cabac.Derived.transMps))
    assert(cfg.ctxInit.length == 277)
    assert(cfg.ctxInit.map(_.toSeq).toSeq ==
      Cabac.derivedCtxInit.map(_.toSeq).toSeq)
  }

  test("spark.graft.cabacTables conf decodes a CABAC clip through " +
      "decodeIdr with NO explicit Config — and matches explicit pixels") {
    val dir = java.nio.file.Files.createTempDirectory("cabactab")
    val path = dir.resolve("tables.txt")
    java.nio.file.Files.write(path,
      Cabac.Config.renderTablesFile(Cabac.Config.derived)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val clip = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
      H264Decode.syntheticCabacAnnexB(lit(2), lit(true), lit(1), lit(4),
        lit(1)).as("payload"))
    // without the conf: refusal that NAMES the file format and conf key
    val refusal = H264Decode.decodeIdr(clip, "payload")
      .collect()(0).getAs[String]("decode_error")
    assert(refusal != null && refusal.contains("spark.graft.cabacTables")
      && refusal.contains("[rangeTabLPS]"))
    spark.conf.set(Cabac.Config.SparkConfKey, path.toString)
    try {
      val viaConf = H264Decode.decodeIdr(clip, "payload").collect()(0)
      assert(viaConf.getAs[String]("decode_error") == null)
      val explicit = H264Decode.decodeIdr(clip, "payload",
        cabac = Some(Cabac.Config.derived)).collect()(0)
      assert(viaConf.getAs[Double]("y_mean") ==
        explicit.getAs[Double]("y_mean"))
      assert(java.util.Arrays.equals(
        viaConf.getAs[Array[Byte]]("luma_plane"),
        explicit.getAs[Array[Byte]]("luma_plane")))
    } finally spark.conf.unset(Cabac.Config.SparkConfKey)
  }

  test("a configured path that fails to load THROWS (driver-side), " +
      "never silently refuses") {
    spark.conf.set(Cabac.Config.SparkConfKey, "/nonexistent/tables.txt")
    try {
      val clip = Seq(Tuple1(0L)).toDF("doc_id").select(col("doc_id"),
        H264Decode.syntheticCabacAnnexB(lit(1), lit(false), lit(2), lit(3),
          lit(0)).as("payload"))
      intercept[Exception](H264Decode.decodeIdr(clip, "payload"))
    } finally spark.conf.unset(Cabac.Config.SparkConfKey)
  }

  test("loader rejections name the failing property") {
    val good = Cabac.Config.renderTablesFile(Cabac.Config.derived)
    def splitSections(txt: String): Map[String, String] = {
      // crude: section header line -> its block, for surgical corruption
      val parts = txt.split("(?m)^(?=\\[)").filter(_.nonEmpty)
      parts.map(p => p.takeWhile(_ != ']').drop(1) -> p).toMap
    }
    val secs = splitSections(good)
    // missing section
    val noCtx = secs("rangeTabLPS") + secs("transIdxLPS")
    val e1 = intercept[IllegalArgumentException](Cabac.Config.fromText(noCtx))
    assert(e1.getMessage.contains("ctxinit"))
    // wrong count in rangeTabLPS
    val shortRange = good.replaceFirst("(?m)^128 .*$", "128 176 208")
    val e2 = intercept[IllegalArgumentException](Cabac.Config.fromText(shortRange))
    assert(e2.getMessage.contains("256"))
    // tripwire violation: state-63 row must be {2,2,2,2}
    val bad63 = good.replaceFirst("(?m)^2 2 2 2$", "3 2 2 2")
    val e3 = intercept[IllegalArgumentException](Cabac.Config.fromText(bad63))
    assert(e3.getMessage.toLowerCase.contains("state 63") ||
      e3.getMessage.contains("non-decreasing"))
    // ctxInit coverage: drop ctxIdx 100
    val dropped = good.replaceFirst("(?m)^100 \\S+ \\S+$", "")
    val e4 = intercept[IllegalArgumentException](Cabac.Config.fromText(dropped))
    assert(e4.getMessage.contains("missing 100"))
    // non-integer token
    val garbage = good.replace("[transIdxLPS]", "[transIdxLPS]\nxyz")
    intercept[IllegalArgumentException](Cabac.Config.fromText(garbage))
    // duplicate ctxIdx (a transcription typo) must FAIL, not last-win
    val dup = good + "\n50 3 60\n"
    val e5 = intercept[IllegalArgumentException](Cabac.Config.fromText(dup))
    assert(e5.getMessage.contains("duplicate") && e5.getMessage.contains("50"))
    // stray out-of-range ctxIdx must FAIL, not be ignored
    val stray = good + "\n300 1 2\n"
    val e6 = intercept[IllegalArgumentException](Cabac.Config.fromText(stray))
    assert(e6.getMessage.contains("out of range"))
  }
}
