package graft.bench

import org.apache.spark.sql.SparkSession

/** Materialize the crawl flagship's WARC segments to parquet — the
  * harness-debt fix from SCALE.md §18.6: the flagship fixture synthesized
  * every segment IN MEMORY per task, a cost a real ingest (which reads
  * crawl files from storage) never pays, and at sf100 × local[32] those
  * 32 concurrent synthesis buffers OOM'd the JVM. This main pays the
  * synthesis once, to disk; `web_crawl_flagship` then reads
  * `$dir/warc_segments.parquet` like a real ingest reads a crawl.
  *
  * The frame written is EXACTLY [[graft.catalog.CatalogOps.crawlSegsSynth]]
  * (shared code), so the disk and inline paths cannot drift.
  *
  * Usage: runMain graft.bench.WarcGen [sfDir] [cpus]
  */
object WarcGen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-warcgen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.catalog.CatalogOps.crawlSegsSynth(spark, dir)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dir/warc_segments.parquet")
    println(f"[warcgen] $dir/warc_segments.parquet written in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
