package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declared-query catalog backing `SparkEntry.queries` / `oracleSql` —
  * the driver's correctness gate. Each entry exercises one operator from
  * SURVEY.md §2 (names carry the §2 ids) through the engine's own
  * components, paired with ANSI SQL DuckDB can run on the same parquet
  * tables. Column names are aliased identically on both sides (the driver
  * hash-compares after sorting columns by name).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Catalog {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Deterministic temp dir for source round-trip exports, keyed by sf dir. */
  def exportDir(sfDir: String, what: String): String = {
    val key = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    s"/tmp/graft_export/$key/$what"
  }

  lazy val all: Seq[Q] =
    CatalogCore.queries ++ CatalogOps.queries ++ CatalogPipeline.queries ++
      CatalogQuality.queries

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
