package graft

import graft.catalog.Catalog
import graft.exec.MappingCompiler
import graft.functions.rml
import graft.mapping.MappingParser
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-18 optimizations: TM-merge, the type-aware null
  * lattice / escape / encode fast paths, the compile-time absolute-IRI
  * fold, and wordNgrams' canonicalization-stable UDFs. Each test pins the
  * behavior the optimization must NOT change (values) or the plan shape
  * it bought (structure).
  */
class OptimizationR18Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = Catalog.byName(name).run(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  private def csvMapping(tms: String): String =
    s"""@prefix rr: <http://www.w3.org/ns/r2rml#> .
       |@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
       |@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
       |$tms
       |""".stripMargin

  private def tmOver(id: String, subjTemplate: String, pred: String,
      ref: String, src: String): String =
    s"""<$id> a rr:TriplesMap;
       |  rml:logicalSource [ rml:source "$src"; rml:referenceFormulation ql:CSV ];
       |  rr:subjectMap [ rr:template "$subjTemplate" ];
       |  rr:predicateObjectMap [ rr:predicate <$pred>;
       |    rr:objectMap [ rml:reference "$ref" ] ] .""".stripMargin

  private lazy val scratchCsv: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_opt18").toFile
    val f = new java.io.File(d, "s.csv")
    java.nio.file.Files.write(f.toPath,
      "id,a,b\n1,x,y\n2,x2,y2\n".getBytes("UTF-8"))
    f.getAbsolutePath
  }

  test("TM-merge: sibling TMs over one source+subject collapse to one TM") {
    val doc = MappingParser.parse(csvMapping(
      tmOver("T1", "http://ex/p/{id}", "http://ex/v/a", "a", scratchCsv) + "\n" +
      tmOver("T2", "http://ex/p/{id}", "http://ex/v/b", "b", scratchCsv)))
    val merged = MappingCompiler.rewrite(doc).triplesMaps
    assert(merged.size == 1, merged.map(_.id))
    assert(merged.head.poms.size == 2)
  }

  test("TM-merge: a TM referenced as a RefObjectMap parent does not merge") {
    val doc = MappingParser.parse(csvMapping(
      tmOver("T1", "http://ex/p/{id}", "http://ex/v/a", "a", scratchCsv) + "\n" +
      tmOver("T2", "http://ex/p/{id}", "http://ex/v/b", "b", scratchCsv) + "\n" +
      s"""<T3> a rr:TriplesMap;
         |  rml:logicalSource [ rml:source "$scratchCsv"; rml:referenceFormulation ql:CSV ];
         |  rr:subjectMap [ rr:template "http://ex/q/{id}" ];
         |  rr:predicateObjectMap [ rr:predicate <http://ex/v/ref>;
         |    rr:objectMap [ rr:parentTriplesMap <T2>;
         |      rr:joinCondition [ rr:child "a"; rr:parent "id" ] ] ] .""".stripMargin))
    val merged = MappingCompiler.rewrite(doc).triplesMaps
    // T2 is a join parent: it must survive unmerged so the join resolves
    assert(merged.exists(_.id.contains("T2")), merged.map(_.id))
    assert(merged.size == 3, merged.map(_.id))
  }

  test("TM-merge keeps dedup-off duplicate multiplicity (no cross-TM POM dedup)") {
    val mapping = csvMapping(
      tmOver("T1", "http://ex/p/{id}", "http://ex/v/a", "a", scratchCsv) + "\n" +
      tmOver("T2", "http://ex/p/{id}", "http://ex/v/a", "a", scratchCsv))
    val doc = MappingParser.parse(mapping)
    val quads = MappingCompiler.compile(spark, doc,
      MappingCompiler.Options(removeDuplicates = false))
    // 2 rows x identical POM in both TMs = each quad TWICE
    assert(quads.count() == 4L, quads.collect().mkString("\n"))
  }

  test("rml_multi_tm compiles to ONE scan and one construction stage") {
    val p = plan("rml_multi_tm")
    // count numbered detail headers: each operator appears once there
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 scan, got $scans:\n${p.take(2000)}")
  }

  test("type-aware lattice: numeric/timestamp guards reduce to isNotNull, strings keep the full lattice") {
    val df = spark.range(1).select(
      lit(1.5).as("d"), lit("nan").as("s"),
      lit(null).cast("double").as("dn"),
      current_timestamp().as("ts"))
    def eval1(c: org.apache.spark.sql.Column): Boolean =
      df.select(c.as("v")).collect()(0).getBoolean(0)
    assert(eval1(rml.notRmlNull(df("d"))))
    assert(eval1(rml.notRmlNull(df("ts"))))
    assert(!eval1(rml.notRmlNull(df("dn"))))
    assert(!eval1(rml.notRmlNull(df("s"))), "string 'nan' must still die")
    // the numeric fast path must not appear as a trim in the plan
    val p = df.select(rml.notRmlNull(df("d")).as("g"))
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("trim"), p)
  }

  test("type-aware escape/encode: identity for numerics, NOT for timestamps (space encodes)") {
    val df = spark.range(1).select(
      lit(12345L).as("n"),
      to_timestamp(lit("2026-01-02 03:04:05")).as("ts"),
      lit("a b\"c").as("s"))
    val row = df.select(
      rml.encodeIri(df("n")).as("en"), rml.encodeIri(df("ts")).as("ets"),
      rml.ntEscape(df("s")).as("es"), rml.ntEscape(df("ts")).as("escts"))
      .collect()(0)
    assert(row.getString(0) == "12345")
    assert(row.getString(1).contains("%20"), row.getString(1)) // timestamp space still encodes
    assert(row.getString(2) == "a b\\\"c")
    assert(!row.getString(3).contains("\\"), row.getString(3)) // timestamp render escape-free
  }

  test("absolute-template subjects carry no per-row RLIKE; relative ones keep the base check") {
    val pWide = plan("rml_wide_mapping")
    assert(!pWide.contains("RLIKE"), "absolute-IRI check not folded:\n" +
      pWide.take(1500))
    // relative template: the runtime check must SURVIVE
    val doc = MappingParser.parse(csvMapping(
      tmOver("TR", "rel/{id}", "http://ex/v/a", "a", scratchCsv)))
    val out = MappingCompiler.compile(spark, doc).collect().map(_.getString(0))
    assert(out.forall(_.startsWith("<http://example.com/base/rel/")), out.mkString(","))
  }

  test("wordNgrams subtrees hit ReuseExchange (memoized per-k UDFs)") {
    import graft.ops.TextAnalysis.wordNgrams
    val df = spark.range(100).select(
      concat(lit("w"), (col("id") % 7).cast("string"),
        lit(" a b c d")).as("t"))
    def counts() = df.select(explode(wordNgrams(col("t"), 3)).as("g"))
      .groupBy("g").count()
    val u = counts().unionByName(counts())
    // execute THIS DataFrame's QueryExecution (a write would run its own)
    u.collect()
    val executed = u.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange") ||
      executed.contains("ReusedQueryStage"),
      "identical gram subtrees did not reuse the exchange:\n" +
        executed.take(3000))
  }
}
