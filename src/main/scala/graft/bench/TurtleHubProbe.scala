package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Rank-vs-hash Turtle chunking crossover probe (SCALE.md §16.11): plant
  * ONE celebrity subject with `hubPOs` predicate-objects (spread over 5
  * predicates, so each (s, p) rank window is a single ~hubPOs/5-row task
  * under the default strategy) on top of a uniform background, and time
  * [[graft.exec.Sinks.turtleBlocks]] both ways. The §16.11 question this
  * answers with a measurement instead of an extrapolation: at what hub
  * size does the rank strategy's one-task-per-key window lose to the
  * hash strategy's distributed chunking? Output is consumed via
  * sum(length(block)) — forces every chunk's string assembly without
  * writing terabytes to disk.
  *
  * Usage: runMain graft.bench.TurtleHubProbe [hubPOs] [bgRows] [maxGroup]
  * Prints one JSON line per strategy (best of two runs each).
  */
object TurtleHubProbe {
  def main(args: Array[String]): Unit = {
    val hubPOs = if (args.length > 0) args(0).toLong else 30000000L
    val bgRows = if (args.length > 1) args(1).toLong else 10000000L
    val maxGroup = if (args.length > 2) args(2).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-turtle-hub-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hub: one subject, 5 predicates, hubPOs distinct objects; background:
    // bgRows one-PO subjects. Objects are distinct by construction, so the
    // writer's internal DISTINCT does not shrink the hub.
    def quads = spark.range(hubPOs).select(
        lit("<http://ex/hub>").as("s"),
        concat(lit("<http://ex/vocab/p"), pmod(col("id"), lit(5)), lit(">")).as("p"),
        concat(lit("\"o"), col("id"), lit("\"")).as("o"),
        lit(null).cast("string").as("g"))
      .unionAll(spark.range(bgRows).select(
        concat(lit("<http://ex/s/"), col("id"), lit(">")).as("s"),
        lit("<http://ex/vocab/q>").as("p"),
        concat(lit("\"b"), col("id"), lit("\"")).as("o"),
        lit(null).cast("string").as("g")))

    for (hash <- Seq(false, true)) {
      def once(): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val r = graft.exec.Sinks.turtleBlocks(quads, maxGroup = maxGroup,
            hashChunks = hash)
          .agg(count(lit(1)), sum(length(col("block")))).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
      }
      val (a, b) = (once(), once())
      val best = if (a._1 <= b._1 ) a else b
      println(f"""{"probe":"turtle_hub","strategy":"${if (hash) "hash" else "rank"}","hub_pos":$hubPOs,"bg_rows":$bgRows,"max_group":$maxGroup,"sec":${best._1}%.1f,"blocks":${best._2},"bytes":${best._3}}""")
    }
    spark.stop()
  }
}
