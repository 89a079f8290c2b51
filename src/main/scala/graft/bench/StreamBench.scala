package graft.bench

import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming micro-batch throughput bench (SCALE.md evidence): drives each
  * StreamingOps entry point from the `rate-micro-batch` source — exactly
  * `rowsPerBatch` rows per trigger, back-to-back triggers — and reports
  * sustained rows/s from the query's own progress events. Fixed batch
  * sizes decouple the measurement from source backpressure: with the plain
  * `rate` source an op slower than the offered rate accretes an unbounded
  * backlog and the "throughput" number measures the backlog spiral, not
  * the operator (measured: the near-dup flag never finished batch 2 at an
  * offered 500 k rows/s).
  *
  * Each op runs at two batch sizes, because per-batch fixed costs —
  * state-store commit, shuffle setup, plan reuse — dominate small batches
  * and amortize in big ones; the two numbers bracket a deployment's real
  * cadence. Event time advances 1 s per batch (`advanceMillisPerBatch`),
  * so watermarked state expires exactly as it would live. For stateful ops
  * the last progress event's state-store rows/memory are recorded — state
  * size is what bounds a long-running ingest, and it must plateau once the
  * watermark horizon fills.
  *
  * Usage: runMain graft.bench.StreamBench [secondsPerRun] [batchSizes,csv]
  * [opFilter,csv] [keyDist] — opFilter selects a subset by name (campaigns
  * over one family without paying the full sweep); keyDist ∈
  * {uniform, zipf} shapes the stream: zipf draws `user_id` from the
  * truncated-Pareto law (α = 1.1 over 100 000 keys — ScaleGen's exact
  * inverse CDF, hottest key ≈ 11% of rows) and collapses `text` onto
  * 15 000 zipf document classes (the boilerplate-page law, so dedup state
  * and band buckets concentrate the way a real crawl's do). Prints one
  * JSON line per (op, rowsPerBatch) pair, tagged with the dist.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val seconds = if (args.length > 0) args(0).toInt else 30
    val batchSizes =
      if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toLong)
      else Seq(100000L, 500000L)
    val opFilter: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
      else Set.empty
    val keyDist = if (args.length > 3) args(3) else "uniform"
    require(keyDist == "uniform" || keyDist == "zipf",
      s"keyDist must be uniform|zipf, got $keyDist")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // default retention is 100 progress events; a 0.2 s/batch op logs
      // ~150 in a 30 s window and the evicted head silently shrinks the
      // reported rows/batches (and defeats the warm-up drop below)
      .config("spark.sql.streaming.numRecentProgressUpdates", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // standing corpus for the near-dup flag / membership filter snapshots
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val corpusN = corpus.count()

    // rate rows -> a document-shaped stream: ~128 chars of per-row-distinct
    // text (two md5 blocks + a shared tail so shingles overlap the way real
    // near-dup text does), a bounded user key and a value for aggregation.
    // zipf mode replays ScaleGen's truncated-Pareto inverse CDF (α = 1.1,
    // floor — rank 1 is the hot head) off a per-row hash, and keys text on
    // the zipf CLASS instead of the row — identical texts concentrate into
    // the r8 campaign's hot-cluster shape, user keys into hot state keys
    def zipfRank(u: org.apache.spark.sql.Column, m: Long) = {
      val q = 1.0 - math.pow(m.toDouble, 1.0 - 1.1)
      least(lit(m), greatest(lit(1L),
        floor(pow(lit(1.0) - u * q, lit(1.0 / (1.0 - 1.1)))).cast("long")))
    }
    def unif(seed: Int) =
      pmod(xxhash64(col("value"), lit(seed)), lit(1L << 30)).cast("double") /
        (1L << 30).toDouble
    def docs(src: DataFrame): DataFrame = {
      val (textKey, userKey) =
        if (keyDist == "zipf")
          (zipfRank(unif(1), 15000L), zipfRank(unif(2), 100000L) - 1L)
        else (col("value"), pmod(col("value"), lit(100000L)))
      src
        .withColumn("text", concat_ws(" ",
          md5(textKey.cast("string")),
          md5((textKey * 31).cast("string")),
          lit("the quick brown fox jumps over the lazy dog again and again")))
        .withColumn("user_id", userKey)
        .withColumn("event_value", (col("value") % 97).cast("double"))
    }

    def bench(name: String, rowsPerBatch: Long)(mk: DataFrame => DataFrame): Unit = {
      if (opFilter.nonEmpty && !opFilter.contains(name)) return
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_sb_${name}_").toString
      val src = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch)
        .option("numPartitions", cpus.toInt)
        .option("advanceMillisPerBatch", 1000)
        .load()
      val q = mk(docs(src)).writeStream
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
      val t0 = System.nanoTime()
      Thread.sleep(seconds * 1000L)
      // snapshot progress BEFORE stop: stop() can interrupt a state-store
      // commit mid-flight (observed on the stream-stream join, whose
      // per-batch commits are the slowest) and the abort then surfaces as
      // a StreamingQueryException from awaitTermination. The measurement
      // window is already over at that point, so an interrupt-shaped
      // failure here is benign — but a query that produced NO batches in
      // the window is a real failure and still dies loudly below.
      val progsAll = q.recentProgress.toSeq
      // a query that TERMINATED WITH AN EXCEPTION during the measurement
      // window (q.exception non-empty BEFORE we ever call stop()) is a
      // broken op, not an interrupt artifact — it must fail the bench row
      // even if it processed some rows first. Checked here, before stop(),
      // so the benign stop-interrupt failures below stay distinguishable.
      q.exception.foreach { e =>
        throw new IllegalStateException(
          s"$name died mid-window before stop(): ${e.getMessage}", e)
      }
      // NonFatal, not just StreamingQueryException: the commit the stop
      // interrupts can also surface as a bare SparkException
      // (CANNOT_WRITE_STATE_STORE.CANNOT_COMMIT) thrown from stop()
      // itself — observed killing the 500k watermark_dedup run and, with
      // it, every op queued after it in the same invocation. Any
      // interrupt-shaped failure here is benign (the window is over);
      // the no-rows require below still dies loudly on a truly broken op.
      try { q.stop(); q.awaitTermination() }
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[streambench] $name post-stop interrupt: " +
            Option(e.getMessage).getOrElse(e.toString).linesIterator.next())
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // skip the first batch: it pays stream start + codegen + JIT warmup
      val progs = progsAll.drop(1)
      require(progsAll.nonEmpty && progsAll.map(_.numInputRows).sum > 0,
        s"$name processed no rows in the $seconds s window — query failed, not slow")
      val rows = progs.map(_.numInputRows).sum
      val procMs = progs.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong).sum
      val stateRows = progs.lastOption
        .flatMap(p => Option(p.stateOperators).filter(_.nonEmpty))
        .map(_.map(_.numRowsTotal).sum).getOrElse(0L)
      val stateMem = progs.lastOption
        .flatMap(p => Option(p.stateOperators).filter(_.nonEmpty))
        .map(_.map(_.memoryUsedBytes).sum).getOrElse(0L)
      val rowsPerSec = if (procMs > 0) rows * 1000.0 / procMs else 0.0
      println(f"""{"op":"$name","dist":"$keyDist","rows_per_batch":$rowsPerBatch,"rows":$rows,"proc_sec":${procMs / 1000.0}%.1f,"wall_sec":$wall%.1f,"rows_per_sec":$rowsPerSec%.0f,"batches":${progs.size},"state_rows":$stateRows,"state_mb":${stateMem / 1e6}%.1f}""")
      // stateful ops leave real state-store bytes in the checkpoint dir;
      // 12 runs per campaign would otherwise accrete in /tmp forever.
      // State-store maintenance threads can still be flushing files for a
      // moment after stop() (observed on the stream-stream join), so the
      // delete retries instead of dying on DirectoryNotEmptyException.
      def rmTree(): Unit = {
        val tree = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        try tree.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => { java.nio.file.Files.deleteIfExists(q); () })
        finally tree.close()
      }
      var attempts = 0
      var cleaned = false
      while (!cleaned && attempts < 5) {
        attempts += 1
        // UncheckedIOException too: Files.walk's iterator wraps the
        // IOException when a maintenance thread deletes a file mid-walk
        // (observed NoSuchFileException under FileTreeWalker.visit — it
        // escaped the IOException-only catch and killed every op queued
        // after this one in the same invocation)
        try { rmTree(); cleaned = true }
        catch {
          case _: java.io.IOException | _: java.io.UncheckedIOException =>
            Thread.sleep(1000L)
        }
      }
      if (!cleaned) System.err.println(s"[streambench] checkpoint $ckpt not fully removed")
    }

    // standing IMAGE corpus for the perceptual-hash flag: one signature per
    // gradient class, snapshotted once (the production shape — the corpus
    // index is hashes, never pixels). lazy: localCheckpoint is eager, and
    // an op-filtered campaign that excludes the image flag must not pay
    // the 150-image synth+decode at startup
    lazy val imgCorpusSigs = graft.ops.Multimodal.imagePerceptualHash(
      spark.range(150).toDF("img_id").withColumn("payload",
        graft.ops.Multimodal.syntheticPngGradient(lit(16), lit(8),
          pmod(col("img_id") * 37, lit(256)).cast("int"),
          (lit(16) + pmod(col("img_id") * 13, lit(96))).cast("int"))),
      "payload").select(col("img_id"), col("img_ahash")).localCheckpoint()

    for (rpb <- batchSizes) {
      // stateless near-dup corpus flag: per-row band signatures + broadcast
      // bloom probe — no shuffle, no state store
      bench("near_corpus_flag", rpb) { d =>
        StreamingOps.streamNearCorpusFlag(d, "text", corpus, "text", "doc_id",
          expectedItems = corpusN)
      }
      // stateless IMAGE near-dup flag: per-row PNG decode + perceptual hash
      // + hamming-band bloom probe — decode-bound narrow map, no shuffle,
      // no state store. The measured pipeline INCLUDES synthesizing each
      // row's PNG (a real ingest receives bytes for free), so the number
      // is a conservative floor on decode+hash+probe throughput.
      bench("image_near_corpus_flag", rpb) { d =>
        StreamingOps.streamImageNearCorpusFlag(
          d.withColumn("payload",
            graft.ops.Multimodal.syntheticPngGradient(lit(16), lit(8),
              pmod(col("value") * 37, lit(256)).cast("int"),
              (lit(16) + pmod(col("value") * 13, lit(96))).cast("int"))),
          "payload", imgCorpusSigs, "img_ahash", expectedItems = 256L)
      }
      // exact corpus-membership filter: broadcast bloom + stream-static
      // left-anti verify for maybe-rows
      bench("not_in_corpus", rpb) { d =>
        StreamingOps.streamNotInCorpus(
          d.withColumnRenamed("text", "doc_text"),
          corpus.withColumnRenamed("text", "doc_text"), "doc_text", corpusN)
      }
      // stateful exact dedup within a watermark: one state row per distinct
      // key in the horizon — the state-store-bound baseline
      bench("watermark_dedup", rpb) { d =>
        StreamingOps.dedupWithinWatermark(d, Seq("user_id"), "timestamp", "10 seconds")
      }
      // watermarked tumbling-window aggregation (shared batch/stream logic)
      bench("window_agg", rpb) { d =>
        d.withWatermark("timestamp", "10 seconds")
          .groupBy(window(col("timestamp"), "10 seconds"), pmod(col("user_id"), lit(1000)).as("k"))
          .agg(count(lit(1)).as("n"), sum(col("event_value")).as("v"))
      }
      // stream-static broadcast enrichment join
      bench("stream_static_join", rpb) { d =>
        StreamingOps.streamStaticJoin(
          d.withColumn("doc_id", pmod(col("value"), lit(corpusN))),
          corpus.select(col("doc_id"), length(col("text")).as("doc_len")),
          Seq("doc_id"))
      }
      // stream-stream interval join (self-join of the stream on user_id,
      // right rows within [left.ts - 2s, left.ts]): BOTH sides buffer in
      // the state store, bounded by watermark delay + range width. Benched
      // at two watermark widths — state_rows must scale with the horizon
      // (≈ rows/s × (delay + range)), NOT with stream length; that
      // plateau is the evidence the join can run forever.
      for (delaySec <- Seq(5, 30)) {
        bench(s"interval_join_w${delaySec}s", rpb) { d =>
          val l = d.select(col("user_id"), col("timestamp"), col("event_value"))
          val r = d.select(col("user_id"), col("timestamp"),
            (col("event_value") * 2).as("right_value"))
          StreamingOps.streamStreamIntervalJoin(l, r, "user_id", "timestamp",
            delay = s"$delaySec seconds", before = "2 seconds", after = "0 seconds")
            .select(col("l.user_id"), col("l.event_value"), col("r.right_value"))
        }
      }
      // guarded interval join — §17.6's deployment rule, end-to-end: hot
      // keys measured from a one-horizon batch history drawn with the SAME
      // key law as the stream (docs() is deterministic in `value`, so
      // range(horizon) replays exactly the law the stream will carry),
      // excluded by broadcast anti-join before any state buffers. Under
      // zipf this is the op that must COMPLETE where the unguarded join
      // recorded 0 rows/s (batch 1 never finished); under uniform it
      // prices the guard's overhead against the plain interval join.
      for (delaySec <- Seq(5, 30)) {
        bench(s"guarded_interval_join_w${delaySec}s", rpb) { d =>
          val horizon = rpb * (delaySec + 2) // (delay + range) s × rpb rows/s
          // the join emits only pairs within the 2 s range of a
          // (delay + 2) s horizon — price that share instead of the
          // worst-case m² (which routed 100% of the dense uniform stream)
          val rangeFrac = 2.0 / (delaySec + 2)
          val history = docs(spark.range(horizon).toDF("value"))
            .select(col("user_id"))
          // side-channel audit line: how many keys the guard routes and
          // what share of the stream's mass they carry (the rows a caller
          // sends to the sampled/offline path). The SAME masses frame
          // feeds the join below — the deployment shape, one history
          // aggregation total.
          val hm = StreamingOps.hotKeyMasses(history, "user_id",
            rangeFraction = rangeFrac)
          val st = hm.agg(
            sum(when(col("is_hot"), 1L).otherwise(0L)).as("hot_keys"),
            sum(when(col("is_hot"), col("m")).otherwise(0L)).as("hot_mass"),
            sum(col("m")).as("mass")).head()
          val hotKeys = Option(st.get(0)).map(_.toString.toLong).getOrElse(0L)
          val hotMass = Option(st.get(1)).map(_.toString.toLong).getOrElse(0L)
          val mass = math.max(1L, st.getLong(2))
          println(f"""{"op":"guarded_interval_join_w${delaySec}s","dist":"$keyDist","rows_per_batch":$rpb,"hot_keys":$hotKeys,"hot_mass_share":${hotMass.toDouble / mass}%.4f}""")
          val l = d.select(col("user_id"), col("timestamp"), col("event_value"))
          val r = d.select(col("user_id"), col("timestamp"),
            (col("event_value") * 2).as("right_value"))
          StreamingOps.guardedStreamStreamIntervalJoinWithMasses(
            l, r, "user_id", "timestamp",
            delay = s"$delaySec seconds", before = "2 seconds", after = "0 seconds",
            masses = hm, massKeyCol = "user_id")
            .select(col("l.user_id"), col("l.event_value"), col("r.right_value"))
        }
      }
      // custom stateful sessionization via flatMapGroupsWithState
      bench("sessionize", rpb) { d =>
        StreamingOps.sessionize(
          d.select(col("user_id"), col("timestamp").as("ts"),
            lit("e").as("event_type"), col("event_value").as("value"))
            .as[StreamingOps.EventRow], gapMs = 5000L).toDF()
      }
    }
    spark.stop()
  }
}
