package graft

import graft.catalog.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full RML engine end-to-end (parse → compile → quads) over the
    * sf0.001 star schema; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("rml_e2e_customer_nation").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline surface). Names carry the §2 operator ids.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  /** DuckDB-equivalent SQL per query (same column names — the driver
    * hash-compares values after sorting columns by name).
    */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
