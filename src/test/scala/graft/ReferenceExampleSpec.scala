package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Parity smoke test: the reference repo's own end-to-end example
  * (reference: example/config.ini + example/mapping.ttl — CSV→CSV join via
  * rr:joinCondition over example/files/sampleSource{1,2}.csv) runs
  * UNMODIFIED through this engine.
  */
class ReferenceExampleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val refDir = new java.io.File("/root/reference/example")

  test("the reference's example mapping materializes the expected graph") {
    assume(refDir.isDirectory, "reference example not present")
    val ttl = java.nio.file.Files.readString(
      new java.io.File(refDir, "mapping.ttl").toPath)
    val ts = Engine.materialize(spark, ttl, refDir.getAbsolutePath).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    val rdfType = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    val related = "<http://project-iasis.eu/vocab/isRelatedTo>"
    // 5 distinct biotypes in sampleSource1 (duplicated rows collapse), all
    // related to chr1; one chromosome subject
    val biotypes = Set("processed_transcript", "unprocessed_pseudogene",
      "transcribed_unprocessed_pseudogene", "miRNA", "lincRNA")
    biotypes.foreach { b =>
      assert(ts.contains((s"<http://project-iasis.eu/BioType/$b>", rdfType,
        "<http://project-iasis.eu/vocab/BioType>")))
      assert(ts.contains((s"<http://project-iasis.eu/BioType/$b>", related,
        "<http://project-iasis.eu/Chromosome/chr1>")))
    }
    assert(ts.contains(("<http://project-iasis.eu/Chromosome/chr1>", rdfType,
      "<http://project-iasis.eu/vocab/chr>")))
    assert(ts.size == 11) // 5×2 + 1, fully deduplicated
  }
}
