package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard pretraining curation chain composed end-to-end: C4
  * document gates + repetition gate + exact dedup (canonical = min id per
  * content hash) + PII redaction, in ONE call producing per-document
  * signals, the final keep decision, and the redacted text.
  *
  * Plan shape: the quality/repetition/PII columns are scan-side codegen
  * projections (zero shuffle); exact dedup adds one groupBy on the
  * content hash (partial-agg, hash-uniform) and a join back on the hash.
  * Total cost at 100 TB: one scan + one dedup-shaped shuffle — the same
  * envelope as `Dedup.exact` alone; every additional gate rides the scan.
  */
object Curation {

  def curate(df: DataFrame, textCol: String, idCol: String,
      maxDupLineFrac: Double = 0.3): DataFrame = {
    // NULL text must not make rows vanish (md5(NULL) is NULL and an
    // equi-join drops it): hash a coalesced copy, and force the final
    // decision to a real boolean so null-text docs surface as rejected
    val safeText = coalesce(col(textCol), lit(""))
    val safe = df.withColumn(textCol, safeText)
    val sig = TextAnalysis.repetitionSignals(
      TextAnalysis.c4Signals(safe, textCol), textCol)
    // canonical selection IS exact dedup — share its plan
    val keeper = Dedup.exact(safe, textCol, idCol)
      .select(col("content_hash").as("__h"), col("keep_id").as("__keep_id"))
    sig.withColumn("__h", md5(col(textCol)))
      .join(keeper, "__h")
      .withColumn("is_canonical", col(idCol) === col("__keep_id"))
      .withColumn("redacted_text", TextAnalysis.redactPii(col(textCol)))
      .withColumn("curate_keep", coalesce(
        col("c4_keep") && col("dup_line_frac") <= maxDupLineFrac && col("is_canonical"),
        lit(false)))
      .drop("__h", "__keep_id")
  }

  /** [[curate]] with benchmark DECONTAMINATION in the chain: flagged probe
    * spans are excised from each document BEFORE dedup, so two documents
    * that differ only in the contaminated passage (e.g. both quote the
    * same benchmark question inside otherwise-duplicate boilerplate)
    * collapse to one canonical — exact dedup keys on the CLEANED text.
    * Quality gates still read the ORIGINAL text (excised output is
    * token-normalized, which would starve the sentence/punctuation
    * signals); the shipped `clean_text` is the decontaminated form.
    *
    * Plan shape: gates ride the scan; the decontamination adds the
    * span-contamination shape (probe grams broadcast, only matching
    * positions shuffle — output-proportional) plus the same one
    * dedup-shaped groupBy as [[curate]], now keyed on the clean hash.
    */
  def curateDecontaminated(df: DataFrame, textCol: String, idCol: String,
      probes: DataFrame, probeText: String, probeId: String,
      k: Int = 5, maxDupLineFrac: Double = 0.3): DataFrame = {
    Multimodal.requireFreshColumns(df, "curateDecontaminated",
      Seq("clean_text", "is_canonical", "redacted_text", "curate_keep"))
    val safe = df.withColumn(textCol, coalesce(col(textCol), lit("")))
    val spans = TextAnalysis.spanContamination(
      safe, textCol, idCol, probes, probeText, probeId, k)
    val cleaned = TextAnalysis.exciseSpans(safe, textCol, idCol, spans)
    val sig = TextAnalysis.repetitionSignals(
      TextAnalysis.c4Signals(cleaned, textCol), textCol)
    val keeper = Dedup.exact(cleaned, "clean_text", idCol)
      .select(col("content_hash").as("__h"), col("keep_id").as("__keep_id"))
    sig.withColumn("__h", md5(col("clean_text")))
      .join(keeper, "__h")
      .withColumn("is_canonical", col(idCol) === col("__keep_id"))
      // the sibling entry points all ship redacted_text; omitting it
      // here would ship PII whenever a pipeline swaps curate for the
      // decontaminated variant — redact the SHIPPED (clean) form
      .withColumn("redacted_text", TextAnalysis.redactPii(col("clean_text")))
      .withColumn("curate_keep", coalesce(
        col("c4_keep") && col("dup_line_frac") <= maxDupLineFrac && col("is_canonical"),
        lit(false)))
      .drop("__h", "__keep_id")
  }

  /** [[curate]] with NEAR-duplicate canonicalization: the canonical stage
    * is [[Dedup.dedupCorpus]]'s cluster verdict (auto-capped LSH banding →
    * connected components → min-id representative) instead of the exact
    * content-hash keeper, so boilerplate near-copies collapse to one
    * representative, not just byte-identical ones. Exact duplicates are a
    * strict subset — identical docs share every band signature, so they
    * always land in one cluster regardless of the cap (pigeonhole; pinned
    * in DedupCapSpec).
    *
    * Plan shape: the gates still ride the scan; dedup cost moves from one
    * hash groupBy to the capped band self-join + O(log² n) CC rounds —
    * candidate volume stays ≤ `pairBudget` pairs/doc by construction, and
    * every per-document output is linear in the corpus (SCALE.md §12's
    * required shape at 100 TB).
    */
  def curateNearDup(df: DataFrame, textCol: String, idCol: String,
      maxDupLineFrac: Double = 0.3,
      numHashes: Int = Dedup.DefaultNumHashes,
      rowsPerBand: Int = Dedup.DefaultRowsPerBand,
      shingleLen: Int = Dedup.DefaultShingleLen,
      maxBucketSize: Option[Long] = None, pairBudget: Long = 64): DataFrame = {
    Multimodal.requireFreshColumns(df, "curateNearDup",
      Seq("cluster", "is_canonical", "redacted_text", "curate_keep"))
    val safe = df.withColumn(textCol, coalesce(col(textCol), lit("")))
    val sig = TextAnalysis.repetitionSignals(
      TextAnalysis.c4Signals(safe, textCol), textCol)
    val verdicts = Dedup.dedupCorpus(safe, textCol, idCol,
        numHashes, rowsPerBand, shingleLen, maxBucketSize, pairBudget)
      .withColumnRenamed("id", "__vid")
    sig.join(verdicts, col(idCol) === col("__vid"))
      .withColumn("is_canonical", col("is_kept"))
      .withColumn("redacted_text", TextAnalysis.redactPii(col(textCol)))
      .withColumn("curate_keep", coalesce(
        col("c4_keep") && col("dup_line_frac") <= maxDupLineFrac && col("is_kept"),
        lit(false)))
      .drop("__vid", "is_kept")
  }

  /** The image-corpus curation chain — [[curate]]'s multimodal analogue,
    * in ONE decode pass: perceptual-hash every payload
    * ([[Multimodal.imagePerceptualHash]] also emits decoded dims), run
    * corpus-level near-dup verdicts over the signatures
    * ([[Dedup.hammingDedupCorpus]]: identical-sig collapse → banded
    * components), and gate on decode success + minimum dimensions +
    * canonicality. Output: per-image `img_width`/`img_height`/hashes/
    * `decode_error`, `cluster` (null when unhashed), `is_canonical`, and
    * the final `curate_keep`. Undecodable or sub-grid images are rejected
    * rows, never dropped rows — the 100 TB contract that poisoned inputs
    * stay observable.
    *
    * Plan shape: decode+hash rides the scan (narrow map); the dedup adds
    * the [[Dedup.hammingDedupCorpus]] envelope (one hash-agg on the
    * signature + banding over DISTINCT signatures only); the verdict join
    * is an equi-join on id. Pixels never shuffle.
    */
  def curateImages(df: DataFrame, payloadCol: String, idCol: String,
      minWidth: Int = 1, minHeight: Int = 1,
      bits: Int = Dedup.DefaultSigBits, bands: Int = Dedup.DefaultSigBands,
      maxHamming: Int = Dedup.DefaultSigMaxHamming): DataFrame = {
    // the chain's own outputs (the hash step guards its img_*/decode_error
    // names itself) — a pre-existing `cluster` would be silently shadowed
    Multimodal.requireFreshColumns(df, "curateImages",
      Seq("cluster", "is_kept", "is_canonical", "curate_keep", "__vid"))
    // persist the hashed frame: it fans out four ways (cluster-map build
    // inside hammingDedupCorpus, its null-sig branch, and the verdict
    // join's left side), and WITHOUT the cache each branch would re-run
    // the per-row ImageIO decode — the dominant cost at scale — once per
    // consumer instead of once total. hammingDedupCorpus runs an eager
    // action internally (the CC rounds), so the cache fills during this
    // call; Spark's ContextCleaner drops it when the frame is unreachable.
    val sig = Multimodal.imagePerceptualHash(df, payloadCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verdicts = Dedup.hammingDedupCorpus(
        sig.where(col("img_ahash").isNotNull), idCol, "img_ahash",
        bits, bands, maxHamming)
      .withColumnRenamed("id", "__vid")
    sig.join(verdicts, col(idCol) === col("__vid"), "left")
      .withColumn("is_canonical", coalesce(col("is_kept"), lit(false)))
      .withColumn("curate_keep", coalesce(
        col("decode_error").isNull &&
          col("img_width") >= minWidth && col("img_height") >= minHeight &&
          col("is_kept"),
        lit(false)))
      .drop("__vid", "is_kept")
  }

  /** Corpus snapshot diff — the incremental-rebuild primitive: compare two
    * corpus versions by id + content hash and emit ONLY the delta, one row
    * per difference: `added` (id only in the new snapshot), `removed` (id
    * only in the old), `changed` (both, different content). Unchanged
    * documents produce no output, so downstream incremental work
    * (re-dedup, re-index, re-embed) is proportional to the CHANGE RATE,
    * not the corpus — the same contract as [[Graphs.kgDiff]] for graphs.
    * Ids are assumed unique within each snapshot (run [[Dedup.exact]] or
    * [[curate]] first if they are not — duplicate ids would cross-product
    * through the full-outer join).
    *
    * Plan shape at 100 TB: both sides project to (id, md5) at the scan —
    * content bytes never shuffle — then one full-outer equi-join on id.
    * With both snapshots bucketed/partitioned by id (the layout
    * `Packing.shardLayout` produces), the join co-locates and the whole
    * diff is exchange-free.
    */
  /** Incremental corpus rebuild — [[corpusDiff]] composed with
    * [[Dedup.minhashIncrementalCandidates]] into a verdict PATCH: diff the
    * snapshots, near-dup-dedup ONLY the added/changed documents against
    * the standing corpus, and emit one row per delta id —
    * `(id, status, cluster, is_kept)` (`cluster`/`is_kept` null for
    * `removed`). Standing documents' verdicts are by contract untouched
    * ("standing wins", arrival-order semantics): a batch document whose
    * component touches ANY standing document is a duplicate of it
    * (cluster = the component's smallest standing id, is_kept = false);
    * a component containing only batch documents keeps its smallest id.
    *
    * Plan shape at 100 TB: the diff is a projected full-outer join on id
    * (content never shuffles); exact duplicates are collapsed before
    * banding ([[Dedup.textGroups]] — one representative per distinct
    * text, members rejoin through rep→member edges), then signature +
    * banding work runs per distinct text and the band join admits a pair
    * iff either side's group contains a delta document — exactly the raw
    * graph's "at least one side new" rule lifted to groups, so the
    * OUTPUT is component-identical to the uncollapsed plan (identical
    * texts share every band signature — pigeonhole) and the DuckDB
    * oracle's raw-graph replay stays valid. The collapse is the
    * difference between linear and quadratic on a zipf corpus: the hot
    * identical-text cluster (~11% of all docs under α=1.1) made the
    * uncollapsed standing×batch band join ~1e10 candidate rows — the
    * sf10 zipf run did not finish in 45 minutes; collapsed it is one
    * hash-agg (SCALE.md §16). The component resolution and anchor
    * aggregations run over the candidate-pair node set, delta-adjacent
    * by construction, so end-to-end cost tracks the CHANGE RATE at fixed
    * corpus size. (The standing side's signatures are recomputed from
    * text here; a deployed pipeline reads them back from the signature
    * store — the join shape is identical.)
    */
  def incrementalRebuild(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String, numHashes: Int = Dedup.DefaultNumHashes,
      rowsPerBand: Int = Dedup.DefaultRowsPerBand, shingleLen: Int = Dedup.DefaultShingleLen): DataFrame = {
    // eager checkpoint: delta is change-rate-sized (small), but its
    // lineage is the full two-sided hash diff — consumed from batchIds
    // (band flags, component labeling) and the final patch join, an
    // unchecked lineage replays the corpus-text scans once PER CONSUMER
    // (measured as the §17.4 byte multiple before this cut)
    val delta = corpusDiff(oldSnap, newSnap, idCol, textCol).localCheckpoint(true)
    val batchIds = delta.where(col("status") =!= "removed").select(col("id"))
    val repMap = Dedup.textGroups(newSnap, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-group delta flag: a rep stands for new work iff ANY member is
    // in the delta
    val grpNew = repMap
      .join(batchIds.withColumn("__n", lit(true)), Seq("id"), "left")
      .groupBy(col("rep")).agg(max(coalesce(col("__n"), lit(false))).as("has_new"))
    // banding computed per doc (narrow — text never reshuffles), kept for
    // representatives only; the join also attaches the group's delta flag
    val bands = Dedup.minhashBands(newSnap, textCol, idCol,
        numHashes, rowsPerBand, shingleLen)
      .join(grpNew.withColumnRenamed("rep", "id"), Seq("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandPairs = incrementalBandPairs(bands)
    val pairs = bandPairs.unionByName(repMap.where(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b")))
    // components over the delta-adjacent pair graph (standing–standing
    // edges never regenerate — those verdicts were settled at arrival;
    // all-standing text groups do surface as rep→member components, but
    // they carry no delta member so they never reach the labeled output)
    labelPatch(delta, batchIds, pairs,
      () => { repMap.unpersist(); bands.unpersist(); () })
  }

  /** Delta-adjacent candidate pairs from flagged rep bands — the band
    * join ONE-SIDED on the delta: the probe side is only the reps whose
    * group contains a delta document, the build side is every rep. A
    * pair is admitted iff at least one side is new, and every such pair
    * has a new side to be probed from, so `(new × all, id≠id) →
    * canonicalize → distinct` is exactly the symmetric
    * `(all × all, a<b, a.new ∨ b.new)` — measured on the uniform-sf10
    * ingest, hashing the corpus-sized side ONCE instead of twice is
    * most of the difference between the sig-store path and the direct
    * path (SCALE.md §16.8). `bands` must be persisted by the caller:
    * the two join sides are different filters of it, so unpersisted
    * lineage would execute twice.
    */
  private def incrementalBandPairs(bands: DataFrame): DataFrame =
    bands.where(col("has_new")).as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()

  /** The verdict-labeling tail shared by [[incrementalRebuild]] and
    * [[incrementalRebuildFromState]]: components over the pair graph,
    * then per component the anchor is the smallest STANDING id if any
    * (the duplicate-of target), else the smallest batch id (the one
    * kept). `release` runs right after [[Dedup.resolveClusters]] has
    * materialized the pair graph (collect or checkpointed rounds), the
    * point where the caller's caches become droppable.
    */
  private def labelPatch(delta: DataFrame, batchIds: DataFrame,
      pairs: DataFrame, release: () => Unit): DataFrame = {
    // eager checkpoint: comp is pair-graph-node-sized (delta-adjacent,
    // small) and consumed twice (canon + labeled) — uncheckpointed, each
    // consumer replays the batchIds join and, through it, the caller's
    // diff lineage
    val comp = Dedup.resolveClusters(pairs)
      .join(batchIds.withColumn("__new", lit(true)), Seq("id"), "left")
      .withColumn("is_new", coalesce(col("__new"), lit(false)))
      .drop("__new")
      .localCheckpoint(true)
    release()
    val canon = comp.groupBy(col("cluster")).agg(
      min(when(!col("is_new"), col("id"))).as("anchor"),
      min(when(col("is_new"), col("id"))).as("bmin"))
    val labeled = comp.where(col("is_new"))
      .join(canon, Seq("cluster"))
      .select(col("id"), coalesce(col("anchor"), col("bmin")).as("__label"))
    delta.join(labeled, Seq("id"), "left")
      .select(col("id"), col("status"),
        when(col("status") =!= "removed",
          coalesce(col("__label"), col("id"))).as("cluster"),
        when(col("status") =!= "removed",
          coalesce(col("__label"), col("id")) === col("id")).as("is_kept"))
  }

  /** A standing corpus's dedup state: `docs` = (id, th), `sigs` =
    * (th, band, sig) — the two frames [[graft.ops.Dedup.dedupState]]
    * builds and [[incrementalRebuildFromState]] consumes and re-emits.
    */
  final case class RebuildState(docs: DataFrame, sigs: DataFrame)

  /** `patch` is [[incrementalRebuild]]'s verdict patch; `state` is the
    * snapshot's own dedup state, ready for the NEXT ingest.
    */
  final case class RebuildResult(patch: DataFrame, state: RebuildState)

  /** [[incrementalRebuild]] against a SIGNATURE STORE — the deployed
    * shape both scaladocs promise: the old snapshot's content hashes and
    * band signatures come from `state` instead of being recomputed from
    * text, so the per-ingest cost drops the corpus-linear shingle floor.
    * Per ingest this pays: one content-hash pass over the new snapshot
    * (you must read what arrived — narrow, no shingles), (id, hash)
    * exchanges for the diff and the collapse map, shingle+minhash work
    * for DISTINCT NEVER-SEEN texts only, the rep-level band join, and
    * the delta-adjacent component resolution. Output is row-identical to
    * `incrementalRebuild(oldSnap, newSnap)` when `state` was built from
    * `oldSnap` with the same banding parameters (pinned in
    * PipelineOpsSpec, including a second ingest driven by the RETURNED
    * state). Signatures are keyed by content hash, so removals never
    * invalidate them; sigs whose text left the corpus are compacted out
    * of the returned state (and of the join) by one semi-join.
    */
  def incrementalRebuildFromState(state: RebuildState, newSnap: DataFrame,
      idCol: String, textCol: String, numHashes: Int = Dedup.DefaultNumHashes,
      rowsPerBand: Int = Dedup.DefaultRowsPerBand, shingleLen: Int = Dedup.DefaultShingleLen): RebuildResult = {
    // the arriving snapshot's TEXT is read exactly once (§17.4's honest
    // residual, closed r12): the hash pass and the never-seen-probe pass
    // are both consumers of this one persisted (id, text) frame — without
    // it each consumer re-scans the full arriving corpus, and the census
    // measured that re-scan as the store path's dominant byte cost. The
    // cache is snapshot-sized (the one thing this path MUST read anyway);
    // MEMORY_AND_DISK spills the overflow to local disk, which at
    // deployment scale still beats re-fetching the snapshot from object
    // storage per consumer.
    val arriving = newSnap.select(col(idCol).as("id"), col(textCol).as("__text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newDocs = arriving.select(col("id"),
        Dedup.contentHash(col("__text")).as("th"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one physical scan of the store's sig leg: knownTh and the liveSigs
    // union are different consumers of the SAME frame, and the whole
    // point of the store path is that it reads LESS than the corpus —
    // re-scanning the store per consumer quietly multiplies its
    // input-byte claim (§17.4's census is the regression gate)
    val storeSigs = state.sigs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the snapshot diff, old side read from the store (same status
    // semantics as corpusDiff — its hash IS this hash). Eagerly
    // checkpointed for the same replay reason as incrementalRebuild's
    // delta: its lineage holds the store-docs scan and the full-outer
    // exchange, and it has three downstream consumers.
    val delta = state.docs.withColumnRenamed("th", "__ho")
      .join(newDocs.withColumnRenamed("th", "__hn"), Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__ho").isNull, "added")
          .when(col("__hn").isNull, "removed")
          .when(col("__ho") =!= col("__hn"), "changed"))
      .where(col("status").isNotNull)
      .select(col("id"), col("status"))
      .localCheckpoint(true)
    val batchIds = delta.where(col("status") =!= "removed").select(col("id"))
    // collapse map over the new snapshot, from hashes alone
    val repMap = newDocs.join(
      newDocs.groupBy(col("th")).agg(min(col("id")).as("rep")), "th")
    val grpNew = repMap
      .join(batchIds.withColumn("__n", lit(true)), Seq("id"), "left")
      .groupBy(col("rep"), col("th"))
      .agg(max(coalesce(col("__n"), lit(false))).as("has_new"))
    // shingle work ONLY for texts the store has never seen: one probe
    // document per unseen hash
    val knownTh = storeSigs.select(col("th")).distinct()
    val probeIds = repMap.join(knownTh, Seq("th"), "left_anti")
      .groupBy(col("th")).agg(min(col("id")).as("id"))
      .select(col("id"))
    val probeDocs = arriving.join(probeIds, Seq("id"), "left_semi")
    val newSigs = Dedup.minhashBands(probeDocs, "__text", "id",
        numHashes, rowsPerBand, shingleLen)
      .join(newDocs, Seq("id"))
      .select(col("th"), col("band"), col("sig"))
    // compact: only texts alive in this snapshot stay in the store
    val liveSigs = storeSigs.unionByName(newSigs)
      .join(newDocs.select(col("th")).distinct(), Seq("th"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = liveSigs.join(grpNew.withColumnRenamed("rep", "id"), Seq("th"))
      .select(col("id"), col("band"), col("sig"), col("has_new"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandPairs = incrementalBandPairs(bands)
    val pairs = bandPairs.unionByName(repMap.where(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b")))
    val patch = labelPatch(delta, batchIds, pairs,
      () => { arriving.unpersist(); newDocs.unpersist(); storeSigs.unpersist();
        liveSigs.unpersist(); bands.unpersist(); () })
    RebuildResult(patch, RebuildState(newDocs, liveSigs))
  }

  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    // NULL content is a real state, DISTINCT from empty string: the hash
    // prepends an is-null discriminator before coalescing, so a doc
    // transitioning NULL↔'' reports `changed` (plain md5(coalesce(…,'')))
    // would call it unchanged) and NULL↔non-null never vanishes through
    // null propagation
    def sig(df: DataFrame, h: String) = df.select(col(idCol).as("id"),
      Dedup.contentHash(col(contentCol)).as(h))
    sig(oldSnap, "__ho").join(sig(newSnap, "__hn"), Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__ho").isNull, "added")
          .when(col("__hn").isNull, "removed")
          .when(col("__ho") =!= col("__hn"), "changed"))
      .where(col("status").isNotNull)
      .select(col("id"), col("status"))
  }
}
