package graft

import graft.catalog.Catalog
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (bench=true in the catalog) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line (driver contract).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      // the sf0.1 tables are single ~1-10 MB parquet files; at the default
      // 128 MB split size every scan starts as ONE task and local[32] idles
      // (measured: dd_line_dedup ran FASTER at sf1 purely because the 10×
      // data was written 32-way). 4 MB splits restore scan parallelism at
      // the small end and are a no-op at real scale, where files span many
      // blocks anyway.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // exchange width tracks input volume (the sf10 dedup spill was a
    // partition-count problem, not a plan problem — SCALE.md §12)
    val initP = graft.util.ShuffleScaling.tuneFor(spark, sfDir)
    System.err.println(s"[bench] initialPartitionNum=$initP for $sfDir")

    // driver contract: default headline set = bench-flagged catalog entries.
    // SPARK_GRAFT_BENCH_QUERIES (comma-separated names) selects an explicit
    // set instead — used by the SCALE.md decade campaigns to time query
    // families (pipe_*, dd_cluster_priority, …) that aren't headline rows.
    val headline = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(list) =>
        list.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map(Catalog.byName)
      case None => Catalog.all.filter(_.bench)
    }
    // warm-up: run every headline query once at the smallest SF so the
    // measured numbers reflect steady-state throughput (codegen compiled,
    // JIT warm — what a long-running cluster actually sees) instead of
    // first-query JVM warmup landing on whichever query runs first
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) headline.foreach { q =>
      try q.run(spark, warmDir).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    else spark.read.parquet(s"$sfDir/region.parquet").count()

    // best of two timed runs per query: the box is multi-tenant and a
    // single run can land on a load spike (measured 3-5× swings on
    // identical work) — min-of-n measures the code, not the neighbor
    val results = headline.map { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { q.run(spark, sfDir).write.mode("overwrite").format("noop").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name}: ${e.getMessage}"); return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      val (a, b) = (once(), once())
      val sec = if (a < 0 || b < 0) -1.0 else math.min(a, b)
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // the driver scrapes the sbt log for this line and log interleaving has
    // made that flaky ("parsed": null in BENCH_r08.json) — ALSO write the
    // metric JSON to a clean file so rounds are machine-diffable without
    // log archaeology. SPARK_GRAFT_BENCH_OUT overrides the path (campaign
    // scripts point it at their own result dirs).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
    // last stdout line after Spark's shutdown chatter (which goes to
    // stderr) — gives log scrapers a clean final line too. Tagged, so a
    // scraper that sums or uniquely-matches the bare JSON pattern sees
    // exactly one untagged line; take-the-last scrapers strip the tag.
    println("graft-bench-final: " + json)
    System.out.flush()
  }
}
