package graft.bench

import java.nio.file.{Files, Paths}

import graft.catalog.Catalog
import org.apache.spark.sql.SparkSession

/** Measurement aid (optimization guide §1.2/§7.2): dump
  * `.explain("formatted")` for catalog queries to files so plan claims
  * (Exchange count, join strategy, PushedFilters/ReadSchema) are
  * reviewable without running Spark.
  *
  * usage: runMain graft.bench.PlanDump <sfDir> <outDir> <suffix> [query ...]
  * (no query args = all bench-flagged rows).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <suffix> [query ...]")
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.util.ShuffleScaling.tuneFor(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    val rows = Catalog.all
      .filter(q => if (only.isEmpty) q.bench else only.contains(q.name))
    val nodeCounts = new StringBuilder("query\toperator\tnodes\n")
    rows.foreach { q =>
      val out = Paths.get(s"$outDir/${q.name}_$suffix.txt")
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(out, plan.getBytes("UTF-8"))
        // unique-node-id operator counts (VERDICT r18 #2/#8: ledger plan
        // claims must count unique node ids, not grep lines — the tree
        // header prints a reused node once PER REFERENCE; the details
        // section prints each node id exactly once as "(id) Name")
        val detail = raw"^\((\d+)\)\s+(\S+)".r
        val seen = scala.collection.mutable.Set[String]()
        plan.linesIterator.foreach {
          case detail(id, name) if seen.add(id) =>
            nodeCounts.append(s"${q.name}\t$name\t$id\n")
          case _ => ()
        }
        System.err.println(s"[plandump] ${q.name} -> $out")
      } catch {
        case e: Throwable =>
          Files.write(out, s"PLAN FAILED: ${e.getMessage}\n".getBytes("UTF-8"))
          System.err.println(s"[plandump] ${q.name} FAILED: ${e.getMessage}")
      }
    }
    // one row per unique plan node; aggregate with
    //   awk -F'\t' '{print $1, $2}' | sort | uniq -c
    Files.write(Paths.get(s"$outDir/NODES_$suffix.tsv"),
      nodeCounts.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
