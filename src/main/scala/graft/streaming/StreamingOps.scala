package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming extensions (SURVEY §2.11 — the reference is pure
  * batch; streaming is parity-plus). The batch transforms are shared: the
  * same windowed-aggregation Column logic runs on a static DataFrame (bench
  * + oracle) and on a readStream source (tests), which is exactly the
  * streaming-compatibility design SURVEY calls for.
  */
object StreamingOps {

  /** Tumbling-window aggregation over the events table — batch form. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").cast("string").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** The same aggregation as a streaming query with a watermark; returns
    * the streaming DataFrame (caller starts the sink).
    */
  def streamingWindowedAgg(spark: SparkSession, path: String, schema: StructType): DataFrame =
    windowedAgg(
      spark.readStream.schema(schema).parquet(path)
        .withWatermark("ts", "2 hours"))

  /** Streaming duplicate elimination with bounded state: duplicates are
    * dropped as long as they arrive within the watermark delay (the
    * streaming form of the engine's D2 dropDuplicates — SURVEY §2.11).
    */
  def dedupWithinWatermark(stream: DataFrame, keyCols: Seq[String],
      tsCol: String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-static enrichment join: the static side is broadcast per
    * micro-batch (a parent-TM join where the parent is a static dim —
    * SURVEY §2.11 "joins against static parent sources are stream-static").
    */
  def streamStaticJoin(stream: DataFrame, static: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(static), keys, "inner")

  /** Streaming corpus-membership filter — [[graft.ops.Dedup.notInCorpus]]
    * for incremental ingest: keep only stream rows whose `valueCol` is NOT
    * already in the standing corpus. The Bloom filter is built ONCE at
    * stream definition (distributed build, fixed-size driver sketch,
    * broadcast) and every micro-batch tests against it as a narrow filter;
    * survivors verify with a stream-static left-anti join against the
    * corpus keys, so false positives cannot leak through. Per-batch work
    * is batch-proportional; the corpus is only rescanned by the verify
    * join for rows the bloom could not clear.
    *
    * The corpus snapshot is fixed for the query's lifetime (the reference
    * semantics of a standing training set); restart the query to pick up
    * a new snapshot. Both membership structures are pinned to the SAME
    * snapshot: the Bloom filter is built once here, and the verify-side
    * key set is eagerly localCheckpoint'ed at stream definition — without
    * that, the static side of the anti-join would re-read the corpus
    * source every micro-batch, and a corpus that gained rows mid-query
    * would be consulted inconsistently (stale bloom passing rows the
    * fresh key set would have caught).
    */
  def streamNotInCorpus(stream: DataFrame, corpus: DataFrame, valueCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = corpus.stat.bloomFilter(col(valueCol), expectedItems, fpp)
    val mightContain = graft.ops.Dedup.bloomProbe(stream, corpus, valueCol, bf)
    val keys = corpus.select(col(valueCol)).distinct().localCheckpoint()
    // maybe-rows verify against the corpus keys; definitely-new rows pass
    // the narrow filter only. union of the two disjoint branches keeps the
    // whole thing a streaming-compatible plan (filter + stream-static join)
    val definitelyNew = stream.where(!mightContain)
    val verified = stream.where(mightContain)
      .join(keys, Seq(valueCol), "left_anti")
    definitelyNew.unionByName(verified)
  }

  /** Streaming NEAR-duplicate corpus flag: mark incoming documents whose
    * MinHash banding collides with the standing corpus — the fuzzy
    * analogue of [[streamNotInCorpus]]'s exact-key filter, for "is this
    * crawl page a near-copy of something we already have". The corpus's
    * band signatures compress into a Bloom filter ONCE at stream
    * definition (snapshot semantics, like streamNotInCorpus); each
    * incoming document computes its own band signatures statelessly
    * ([[graft.ops.Dedup.bandSignaturesCol]] — no groupBy, no streaming
    * state) and probes the broadcast bloom. No shuffle, no state store:
    * the whole check rides the micro-batch projection.
    *
    * Flag semantics are recall-oriented like LSH banding itself: a
    * byte-identical copy ALWAYS flags (identical bands, bloom has no
    * false negatives); a true near-dup flags with the usual banding
    * probability; and bloom false positives add ≤ `fpp` per band probe —
    * route flagged docs to an exact verify stage if precision matters.
    */
  def streamNearCorpusFlag(stream: DataFrame, textCol: String,
      corpus: DataFrame, corpusTextCol: String, corpusIdCol: String,
      expectedItems: Long, fpp: Double = 0.01,
      numHashes: Int = Dedup.DefaultNumHashes,
      rowsPerBand: Int = Dedup.DefaultRowsPerBand,
      shingleLen: Int = Dedup.DefaultShingleLen): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val corpusSigs = graft.ops.Dedup
      .minhashBands(corpus, corpusTextCol, corpusIdCol, numHashes, rowsPerBand, shingleLen)
      .select(col("sig"))
    val bf = corpusSigs.stat.bloomFilter(col("sig"),
      math.max(1L, expectedItems * numBands), fpp)
    val bcast = stream.sparkSession.sparkContext.broadcast(bf)
    val anyBandHit = udf((sigs: Seq[String]) =>
      sigs != null && sigs.exists(s => s != null && bcast.value.mightContainString(s)))
    stream.withColumn("is_near_corpus",
      anyBandHit(graft.ops.Dedup.bandSignaturesCol(col(textCol),
        numHashes, rowsPerBand, shingleLen)))
  }

  /** Streaming image near-dup corpus flag — [[streamNearCorpusFlag]]'s
    * multimodal sibling: incoming payload rows are perceptual-hashed
    * ([[graft.ops.Multimodal.imagePerceptualHash]], a stateless per-row
    * decode — no state store, no shuffle) and each row's Hamming band keys
    * probe a broadcast Bloom filter of the corpus signatures' band keys,
    * EXPANDED build-side by the per-band Hamming ball (every corpus band
    * key XOR every ≤ ⌊maxHamming/bands⌋-bit mask — the multi-index probe
    * of [[graft.ops.Dedup.hammingPairs]], applied once at filter-build
    * time so each stream row still probes only `bands` exact keys). Any
    * stream image within Hamming ≤ `maxHamming` of a corpus image has
    * some band at per-band distance ≤ ⌊maxHamming/bands⌋ (generalized
    * pigeonhole), whose key was therefore inserted — and Bloom filters
    * have no false negatives — so a true near-dup is NEVER missed; fpp
    * only admits spurious flags, the safe direction for a keep/drop gate
    * (same contract as the text flag). Undecodable payloads flag false
    * and keep their `decode_error`.
    *
    * Dimensioning (SCALE.md §16.12, same rule as batch banding): the band
    * key UNIVERSE is bands × 2^(bits/bands) — at the old bands=16 default
    * that was 256 possible keys, which ANY diverse corpus covers
    * completely, flagging every stream row; bands=4 gives a 262 144-key
    * universe. Size `bands` so universe ≫ corpus distinct signatures ×
    * ballSize, or the flag degrades toward always-true (still never a
    * false negative).
    *
    * The corpus side is a static frame of precomputed signatures (e.g.
    * [[graft.ops.Multimodal.imagePerceptualHash]] output, snapshotted) —
    * one action builds the filter at query start; micro-batches touch
    * only their own rows.
    */
  def streamImageNearCorpusFlag(stream: DataFrame, payloadCol: String,
      corpusSigs: DataFrame, corpusHashCol: String,
      expectedItems: Long, fpp: Double = 0.01,
      bits: Int = Dedup.DefaultSigBits, bands: Int = Dedup.DefaultSigBands,
      maxHamming: Int = Dedup.DefaultSigMaxHamming): DataFrame = {
    val masks = graft.ops.Dedup.hammingBallMasks(bits / bands, maxHamming / bands)
    val keys0 = corpusSigs
      .select(explode(graft.ops.Dedup.hammingBandKeysCol(
        col(corpusHashCol), bits, bands)).as("k"))
    // mask < 2^bandBits, so the XOR moves only value bits and the probe
    // stays inside its band's offset-encoded key range
    val keys = if (masks.size <= 1) keys0
      else keys0.withColumn("__m", explode(array(masks.map(lit(_)): _*)))
        .select(col("k").bitwiseXOR(col("__m")).as("k"))
    val bf = keys.stat.bloomFilter(col("k"),
      math.max(1L, expectedItems * bands * masks.size), fpp)
    val bcast = stream.sparkSession.sparkContext.broadcast(bf)
    val anyBandHit = udf((ks: Seq[Long]) =>
      ks != null && ks.exists(bcast.value.mightContainLong))
    val hashed = graft.ops.Multimodal.imagePerceptualHash(stream, payloadCol)
    // when(), not &&: CaseWhen guarantees the UDF branch is skipped for
    // null hashes (And may evaluate both sides — a null-element array
    // would NPE inside the probe)
    hashed.withColumn("is_near_corpus",
      when(col("img_ahash").isNotNull,
        anyBandHit(graft.ops.Dedup.hammingBandKeysCol(col("img_ahash"), bits, bands)))
      .otherwise(lit(false)))
  }

  /** Stream-stream interval join with watermarks on BOTH sides: left events
    * joined to right events on a key within a bounded time range
    * (`right.ts ∈ [left.ts - before, left.ts + after]`). The range bound +
    * watermarks let Spark expire buffered state on both sides — unbounded
    * stream-stream joins otherwise hold every row forever. This is the
    * streaming form of [[graft.ops.Joins.pointInInterval]]: same semantics,
    * state bounded by (watermark delay + range width) per key.
    */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
      key: String, tsCol: String, delay: String,
      before: String, after: String): DataFrame = {
    val l = left.withWatermark(tsCol, delay).as("l")
    val r = right.withWatermark(tsCol, delay).as("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$tsCol") >= col(s"l.$tsCol") - expr(s"INTERVAL $before") &&
        col(s"r.$tsCol") <= col(s"l.$tsCol") + expr(s"INTERVAL $after"))
  }

  /** Per-key horizon masses with the hot-key verdict — the derivation
    * behind [[streamHotKeyGuard]], exposed so deployments can audit WHICH
    * keys the guard would route and at what cap. `history` is a batch
    * sample representative of one join horizon (watermark delay + range
    * width) of traffic; a key with mass m there emits Θ(m²) rows from a
    * self-interval-join, so the admissible per-key mass cap is derived
    * exactly like the batch dedup bucket caps ([[graft.ops.Dedup]]'s
    * dyadic sketch): the largest power-of-two `c` such that keys at mass
    * ≤ c together emit ≤ `pairBudget × historyRows` pairs, floored at 16.
    * Returns one row per distinct key: (keyCol, m, is_hot).
    *
    * Measured need (SCALE.md §17.6): an 11%-hot zipf key stream never
    * completed ONE micro-batch of a self-interval-join — ~1.2×10⁸ joined
    * rows from the hot key alone at 100 k-row batches, quadratic in batch
    * size — while every other streaming op was skew-immune. Output
    * volume, not state, is the wall; no join strategy removes it, so the
    * guard must live IN FRONT of the join.
    *
    * `rangeFraction`: the m² model assumes EVERY in-horizon pair joins —
    * exact when the join range covers the horizon, conservative when the
    * range is narrower (a key of mass m spread over the horizon actually
    * emits ≈ m² × range/horizon pairs). The §17.6-addendum campaign
    * measured the conservative default routing 100% of a DENSE UNIFORM
    * stream (mass 160/key/horizon, 2 s range in a 32 s horizon) whose
    * real join completes fine at 340 k rows/s. Pass
    * `(before + after) / (delay + before + after)` to price the actual
    * interval; default 1.0 keeps the worst-case bound.
    */
  def hotKeyMasses(history: DataFrame, keyCol: String,
      pairBudget: Long = 64, rangeFraction: Double = 1.0): DataFrame = {
    require(rangeFraction > 0.0 && rangeFraction <= 1.0,
      s"rangeFraction must be in (0, 1], got $rangeFraction")
    // eager checkpoint: one history scan feeds both the budget action and
    // the cap sketch; the frame is one row per distinct key (small)
    val masses = history.groupBy(col(keyCol)).agg(count(lit(1)).as("m"))
      .localCheckpoint(true)
    val rows = masses.agg(coalesce(sum(col("m")), lit(0L))).head().getLong(0)
    // admit while Σ m² × rangeFraction ≤ pairBudget × rows, i.e. compare
    // the unscaled dyadic weights against budget / rangeFraction
    // (saturating — a tiny fraction must not wrap the budget negative)
    val budget = pairBudget.toDouble * math.max(1L, rows) / rangeFraction
    val cap = Dedup.dyadicSizeCap(masses, "m",
      if (budget >= Long.MaxValue.toDouble) Long.MaxValue else budget.toLong)
    masses.withColumn("is_hot", col("m") > cap)
  }

  /** Hot-key guard for stream-stream self-joins — SCALE.md §17.6's
    * deployment rule as code. Tags each stream row with `flagCol` = true
    * when its key's measured per-horizon mass would blow the join-output
    * budget ([[hotKeyMasses]]); the caller routes flagged rows to a side
    * channel (sampled join, offline batch pass, or drop) and feeds the
    * rest to [[streamStreamIntervalJoin]]. The hot-key set is materialized
    * ONCE at stream definition (snapshot semantics, like the corpus
    * flags) and applied as a broadcast stream-static left join —
    * stateless, so it composes freely in front of the stateful join. The
    * set is bounded by historyRows / cap keys (cap ≥ 16); under real skew
    * it is a handful of celebrity keys — if most keys are hot the join
    * itself is over budget at ANY partitioning and the guard saying so
    * loudly is the correct behavior.
    */
  def streamHotKeyGuard(stream: DataFrame, keyCol: String,
      history: DataFrame, historyKeyCol: String,
      pairBudget: Long = 64, flagCol: String = "is_hot_key",
      rangeFraction: Double = 1.0): DataFrame = {
    val hot = hotKeyMasses(history, historyKeyCol, pairBudget, rangeFraction)
      .where(col("is_hot"))
      .select(col(historyKeyCol).as(keyCol), lit(true).as(flagCol))
      .localCheckpoint(true)
    stream.join(broadcast(hot), Seq(keyCol), "left")
      .na.fill(false, Seq(flagCol))
  }

  /** [[streamStreamIntervalJoin]] with the hot-key guard in front of BOTH
    * sides: rows whose key is hot ([[hotKeyMasses]] over `history`) are
    * excluded via a broadcast anti-join before any state is buffered, so
    * the joined output is the exact interval join over non-hot keys — the
    * production shape §17.6 prescribes for skewed key streams.
    */
  def guardedStreamStreamIntervalJoin(left: DataFrame, right: DataFrame,
      key: String, tsCol: String, delay: String,
      before: String, after: String,
      history: DataFrame, historyKeyCol: String,
      pairBudget: Long = 64, rangeFraction: Double = 1.0): DataFrame =
    guardedStreamStreamIntervalJoinWithMasses(left, right, key, tsCol,
      delay, before, after,
      hotKeyMasses(history, historyKeyCol, pairBudget, rangeFraction),
      historyKeyCol)

  /** [[guardedStreamStreamIntervalJoin]] from a PRECOMPUTED
    * [[hotKeyMasses]] frame — the shape a deployment actually runs:
    * compute the masses once, audit/export which keys the guard routes
    * and at what mass share, and feed the SAME frame to the join instead
    * of paying the history aggregation (groupBy + eager checkpoint + two
    * driver actions) a second time.
    */
  def guardedStreamStreamIntervalJoinWithMasses(left: DataFrame,
      right: DataFrame, key: String, tsCol: String, delay: String,
      before: String, after: String,
      masses: DataFrame, massKeyCol: String): DataFrame = {
    val hot = masses.where(col("is_hot"))
      .select(col(massKeyCol).as(key))
      .localCheckpoint(true)
    def guarded(side: DataFrame): DataFrame =
      side.join(broadcast(hot), Seq(key), "left_anti")
    streamStreamIntervalJoin(guarded(left), guarded(right),
      key, tsCol, delay, before, after)
  }

  final case class EventRow(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionState(nEvents: Long, totalValue: Double, lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long, total_value: Double)

  /** Custom stateful streaming: per-user session aggregation via
    * flatMapGroupsWithState with a processing-time timeout — the
    * KeyValueGroupedDataset state API the brief names.
    */
  def sessionize(events: Dataset[EventRow], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) => {
          var st = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            if (st.lastTs != Long.MinValue && e.ts.getTime - st.lastTs > gapMs) {
              out += SessionOut(userId, st.nEvents, st.totalValue)
              st = SessionState(0L, 0.0, Long.MinValue)
            }
            st = SessionState(st.nEvents + 1, st.totalValue + e.value, e.ts.getTime)
          }
          state.update(st)
          out.iterator
        })
  }
}
