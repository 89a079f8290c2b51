package graft

import graft.exec.{MappingCompiler, Sinks}
import graft.mapping.MappingParser
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Top-level API: RML mapping (Turtle) → Spark quad DataFrame / RDF files.
  *
  * Mirrors the reference's `semantify(config)` entry point (reference:
  * semantify.py:9908) with the config knobs that affect semantics:
  * `remove_duplicate`, `all_in_one_file`, `output_format`
  * (reference: example/config.ini:7-19).
  */
object Engine {

  final case class Config(
      removeDuplicates: Boolean = true,
      dedupSourceRows: Boolean = false,
      outputFormat: String = "n-triples", // n-triples | turtle
      baseIri: Option[String] = None)

  /** Compile a mapping document into the quad DataFrame (s, p, o, g). */
  def materialize(spark: SparkSession, mappingTurtle: String,
      sourceDir: String = "", config: Config = Config()): DataFrame = {
    val doc = MappingParser.parse(mappingTurtle, sourceDir)
    MappingCompiler.compile(spark, doc,
      MappingCompiler.Options(config.removeDuplicates, config.dedupSourceRows, config.baseIri))
  }

  /** Full run: mapping → RDF files at outputPath. Returns the triple count
    * (the reference logs `number_triple`, semantify.py:15037-15040).
    */
  def run(spark: SparkSession, mappingTurtle: String, sourceDir: String,
      outputPath: String, config: Config = Config()): Long = {
    val doc = MappingParser.parse(mappingTurtle, sourceDir)
    val quads = MappingCompiler.compile(spark, doc,
      MappingCompiler.Options(config.removeDuplicates, config.dedupSourceRows, config.baseIri))
    val persisted = quads.persist()
    try {
      val n = persisted.count()
      config.outputFormat match {
        case "turtle" => Sinks.writeTurtle(persisted, doc.prefixes, outputPath)
        case _ => Sinks.writeNt(persisted, outputPath)
      }
      n
    } finally { persisted.unpersist(); () }
  }
}
