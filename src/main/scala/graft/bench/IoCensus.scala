package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input-bytes census for the sig-store claim (SCALE.md §16): the
  * incremental rebuild's store path is supposed to win because it READS
  * LESS — the old corpus's content hashes and band signatures come from
  * a compact parquet state instead of re-reading and re-shingling the
  * full corpus text. At sf0.1–sf1 compute dominates (codegen shingles
  * are cheap) and wall-clock alone can't see the difference, so this
  * harness prices the claim in the currency it's actually made in:
  * `TaskMetrics.inputMetrics.bytesRead`, summed task-by-task per leg.
  *
  * Three legs, each a fresh cache-cleared run over the same snapshot
  * pair (old = documents, new = the catalog rows' rm/ch/ad mutation):
  *   - `state_build`: one-time construction of the store (NOT part of an
  *     ingest's cost — amortized across every later ingest; reported so
  *     the amortization argument has a number);
  *   - `direct`: [[graft.ops.Curation.incrementalRebuild]] — both
  *     snapshots from text;
  *   - `store`: [[graft.ops.Curation.incrementalRebuildFromState]] —
  *     old side from the store, new side from text (you must read what
  *     arrived).
  * Both ingest legs end in the same action (count of the verdict patch).
  *
  * Usage: runMain graft.bench.IoCensus [sfDir] [rm] [ch] [ad]
  * (defaults 1000/1000/1000 — the low-rate ingest where the store's
  * economics matter). Prints one JSON line per leg.
  */
object IoCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rm = if (args.length > 1) args(1).toInt else 1000
    val ch = if (args.length > 2) args(2).toInt else 1000
    val ad = if (args.length > 3) args(3).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-io-census")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val inBytes = new java.util.concurrent.atomic.AtomicLong
    val inRecords = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          inBytes.addAndGet(m.inputMetrics.bytesRead)
          inRecords.addAndGet(m.inputMetrics.recordsRead)
          ()
        }
      }
    })

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def newSnap: DataFrame = {
      val d = docs
      d.where(col("doc_id") % rm =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % ch === 1, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.where(col("doc_id") % ad === 4)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
    }

    val stateDir = java.nio.file.Files.createTempDirectory("graft_iocensus_").toString
    def leg(name: String)(body: => Long): Unit = {
      spark.catalog.clearCache()
      // drain straggling task-end events from the previous leg before
      // zeroing (the listener bus is async; 2 s dwarfs its latency)
      Thread.sleep(2000L)
      inBytes.set(0L); inRecords.set(0L)
      val t0 = System.nanoTime()
      val out = body
      Thread.sleep(2000L)
      val sec = (System.nanoTime() - t0) / 1e9 - 2.0
      println(f"""{"census":"sigstore_io","sf":"$sfDir","leg":"$name","input_gb":${inBytes.get / 1e9}%.3f,"input_records":${inRecords.get},"out_rows":$out,"wall_sec":$sec%.1f}""")
    }

    leg("state_build") {
      val (d0, s0) = graft.ops.Dedup.dedupState(docs, "text", "doc_id")
      d0.write.mode("overwrite").parquet(s"$stateDir/docs")
      s0.write.mode("overwrite").parquet(s"$stateDir/sigs")
      spark.read.parquet(s"$stateDir/docs").count() +
        spark.read.parquet(s"$stateDir/sigs").count()
    }
    leg("direct") {
      graft.ops.Curation.incrementalRebuild(docs, newSnap, "doc_id", "text")
        .count()
    }
    leg("store") {
      val state = graft.ops.Curation.RebuildState(
        spark.read.parquet(s"$stateDir/docs"),
        spark.read.parquet(s"$stateDir/sigs"))
      graft.ops.Curation.incrementalRebuildFromState(state, newSnap,
        "doc_id", "text").patch.count()
    }
    spark.stop()
  }
}
