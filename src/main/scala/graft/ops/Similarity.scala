package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exactness baseline; the IVF variant is
  * the 100 TB scale path: assign every vector to its nearest centroid once
  * (narrow map over a broadcast centroid set), then probe only the query's
  * cluster — candidate count drops by ~C× for C centroids, and the join is
  * a hash join on cluster id instead of a full cross product.
  *
  * Dot products and cosines are native codegen expressions
  * ([[graft.functions.VecDot]] / [[graft.functions.VecCosine]]) — one fused
  * primitive loop per candidate pair, no UDF, no interpreted higher-order
  * lambda in the hot path.
  */
object Similarity {

  /** A scored candidate flowing into the bounded top-k aggregate. */
  final case class ScoredId(score: Double, id: Long)

  private val byRank: Ordering[ScoredId] = Ordering.by(s => (-s.score, s.id))

  /** Bounded top-k aggregate: the buffer never exceeds 2k entries (compacts
    * to the best k by (score desc, id asc) when full), so map-side partial
    * aggregation ships k candidates per partition per query instead of the
    * full corpus-sized score list a window row_number() would sort. Tie
    * handling matches `row_number over (order by score desc, id asc)`
    * exactly.
    */
  final class TopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    private def compact(b: Seq[ScoredId]): Seq[ScoredId] =
      if (b.length <= k) b else b.sorted(byRank).take(k)
    def zero: Seq[ScoredId] = Vector.empty
    def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
      val nb = b :+ a
      if (nb.length >= 2 * k) compact(nb) else nb
    }
    def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] = compact(b1 ++ b2)
    def finish(b: Seq[ScoredId]): Seq[ScoredId] = b.sorted(byRank).take(k)
    def bufferEncoder: org.apache.spark.sql.Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  /** groupBy(query).agg(bounded top-k) → one row per (query, rank). */
  private[ops] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k))
    scored.groupBy(col("query_id"))
      .agg(topk(col("cos"), col("corpus_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("__pos", "__t")))
      .select(col("query_id"), col("__t.id").as("corpus_id"),
        col("__t.score").as("cos"), (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Codegen vector ops ([[graft.functions.VecDot]]/[[graft.functions.VecCosine]]):
    * one fused primitive loop per row instead of interpreted higher-order
    * `aggregate(zip_with(…))` — same summation order, so identical doubles.
    * Mismatched-length vector pairs yield NULL (matching the composed
    * `aggregate(zip_with(…))` form, where zip_with null-pads the shorter
    * array) — a malformed pair surfaces as a missing score, never a
    * plausible truncated one; NULL never passes a `>= threshold` filter.
    */
  def dot(a: Column, b: Column): Column = graft.functions.vec.dot(a, b)

  def norm(a: Column): Column = sqrt(graft.functions.vec.dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.vec.cosine(a, b)

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of ranked
    * retrieval lists — the standard dense+sparse hybrid: each list
    * contributes 1/(rrfK + rank) for every (query, doc) it ranks, the
    * fused score is the sum, and the top `k` per query survive. Rank-based
    * fusion needs no score calibration between rankers (BM25 scores and
    * cosines live on incomparable scales), which is exactly why RRF is the
    * production default for hybrid RAG retrieval.
    *
    * Input lists need (query_id, corpus_id, rank); use
    * [[graft.ops.TextAnalysis.bm25TopK]] for the sparse side and
    * [[bruteForceTopK]]/[[ivfTopKBudget]] for the dense side. Ties in the
    * fused score break by smallest corpus_id (deterministic, and — with
    * two lists — the double arithmetic is order-independent, so the DuckDB
    * oracle replays it exactly).
    *
    * Plan shape at 100 TB: inputs are already top-k-per-query (bounded:
    * |queries|·k rows each), so the union + sum + bounded-heap re-rank is
    * tiny however large the corpus that produced them — fusion cost never
    * scales with corpus size.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k > 0 && rrfK > 0, "k and rrfK must be positive")
    val unioned = lists
      .map(_.select(col("query_id"), col("corpus_id"), col("rank")))
      .reduce(_.unionByName(_))
    val fused = unioned
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(round(sum(lit(1.0) / (lit(rrfK) + col("rank"))), 9).as("cos"))
    topKPerQuery(fused, k).withColumnRenamed("cos", "rrf_score")
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Query set should be small relative to the
    * corpus (the corpus side streams through a broadcast of the queries).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Seed for [[centroidSample]]'s hash-mod id selection (md5-derived via
    * [[Dedup.h60]], so external engines reproduce the sample exactly).
    */
  val CentroidSeed = 11

  /** Seed for [[ivfAssignTwoLevel]]'s super-centroid sample — distinct from
    * [[CentroidSeed]] so the two sampling stages are independent.
    */
  val SuperSeed = 13

  /** Legacy centroid selection: ids ≡ 0 mod `stride`. |C| grows with the
    * corpus — N×C assignment work is quadratic in N. Kept for the
    * stride-based entry points; corpus-scale callers should prefer
    * [[centroidSample]] (fixed budget) so assignment stays linear.
    */
  private def strideCentroids(df: DataFrame, vecCol: String, idCol: String,
      stride: Int): DataFrame =
    df.where(col(idCol) % stride === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** Fixed-budget centroid sample: ≈`numCentroids` rows regardless of corpus
    * size, selected where `h60(id) mod (n / numCentroids) = 0` — the
    * divisor comes from one cheap count, the hash is the engine's
    * md5-derived [[Dedup.h60]], so the exact same centroid set is
    * reproducible by any engine (the DuckDB oracle replays it). This is the
    * index-parameter form of centroid choice: at 100× the corpus the
    * centroid count — and with it the N×C assignment work per row — stays
    * fixed, making assignment linear in N (the stride form's |C| ∝ N made
    * it quadratic, measured 101× time for 100× data in SCALE.md §12).
    */
  def centroidSample(df: DataFrame, vecCol: String, idCol: String,
      numCentroids: Int): DataFrame =
    centroidSample(df, vecCol, idCol, numCentroids, knownCount = None)

  /** `knownCount`: corpus size if the caller already knows it (pipeline
    * metadata, a frame it materialized anyway) — skips the one counting job
    * this call otherwise fires over `df`'s lineage. At 100 TB that job is a
    * full extra input pass when `df` is a derived frame (on a bare parquet
    * scan it collapses to a metadata count, but index builds rarely hang
    * off a bare scan).
    */
  def centroidSample(df: DataFrame, vecCol: String, idCol: String,
      numCentroids: Int, knownCount: Option[Long]): DataFrame = {
    require(numCentroids > 0, "numCentroids must be positive")
    val n = knownCount.getOrElse(df.count())
    val divisor = math.max(1L, n / numCentroids)
    df.where(pmod(Dedup.h60(col(idCol).cast("string"), CentroidSeed), lit(divisor)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
  }

  /** IVF (inverted-file) assignment against an explicit centroid frame
    * `(centroid_id, centroid_vec)` — nearest centroid per vector. Returns
    * (id, vec, cluster_id).
    */
  def ivfAssignTo(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame): DataFrame = {
    val scored = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .join(broadcast(centroids))
      .select(col("id"), col("vec"), col("centroid_id"),
        cosine(col("vec"), col("centroid_vec")).as("ccos"))
    // argmax via max_by partial aggregation: map-side combine collapses the
    // N×C candidate frame to ~one row per id per partition BEFORE the
    // exchange, so shuffle volume is ~N rows; a window row_number() here
    // would shuffle and sort all N×C rows (C=centroid count — at C≈1000
    // that is a 1000× exchange-volume difference). Tie-break (ccos desc,
    // centroid_id asc) is encoded in the lexicographic ordering struct.
    scored.groupBy(col("id"))
      .agg(
        any_value(col("vec")).as("vec"),
        max_by(col("centroid_id"), struct(col("ccos"), -col("centroid_id"))).as("cluster_id"))
      .select(col("id"), col("vec"), col("cluster_id"))
  }

  /** [[ivfAssignTo]] with the legacy stride centroid selection (ids ≡ 0 mod
    * `stride`) — |C| tracks the corpus; prefer [[centroidSample]] at scale.
    */
  def ivfAssign(df: DataFrame, vecCol: String, idCol: String, stride: Int): DataFrame =
    ivfAssignTo(df, vecCol, idCol, strideCentroids(df, vecCol, idCol, stride))

  /** Two-level IVF assignment: a fixed-budget sample of `superCount`
    * SUPER-centroids (drawn from the centroid frame with the same
    * deterministic hash-mod recipe) coarsens the search — each centroid is
    * assigned to its nearest super once (C×S), each point finds its nearest
    * super (N×S) and then its nearest centroid among that super's
    * centroids (N×C/S on average). Total ≈ N×(S + C/S) versus flat N×C:
    * when the algorithm REQUIRES the centroid count to track the corpus
    * (SemDeDup's cluster granularity — cluster size, not centroid count,
    * is the semantic dial), this is what keeps assignment from going
    * quadratic; S balances the two terms at S ≈ √C. Approximate by
    * construction (the globally-nearest centroid may live under a
    * different super) but fully deterministic, and it degenerates to the
    * exact flat assignment when `superCount ≥ |C|` (every centroid becomes
    * a super). Returns (id, vec, cluster_id).
    */
  def ivfAssignTwoLevel(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, superCount: Int): DataFrame = {
    require(superCount > 0, "superCount must be positive")
    // centroid-side structures are tiny relative to the corpus (≤C rows) —
    // materialize them eagerly ONCE (localCheckpoint) so the corpus-side
    // stages never re-derive the centroid frame, and the persist can be
    // released inside this call instead of leaking for the session
    val cent = centroids.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nC = cent.count()
    val superDiv = math.max(1L, nC / superCount)
    val supers = cent
      .where(pmod(Dedup.h60(col("centroid_id").cast("string"), SuperSeed), lit(superDiv)) === 0)
      .select(col("centroid_id").as("super_id"), col("centroid_vec").as("super_vec"))
      .localCheckpoint()
    def nearestSuper(in: DataFrame, idC: String, vecC: String): DataFrame =
      in.join(broadcast(supers))
        .select(col(idC), col(vecC), col("super_id"),
          cosine(col(vecC), col("super_vec")).as("scos"))
        .groupBy(col(idC))
        .agg(any_value(col(vecC)).as(vecC),
          max_by(col("super_id"), struct(col("scos"), -col("super_id"))).as("super_id"))
    val c2s = nearestSuper(cent, "centroid_id", "centroid_vec").localCheckpoint()
    cent.unpersist()
    val p2s = nearestSuper(
      df.select(col(idCol).as("id"), col(vecCol).as("vec")), "id", "vec")
    p2s.join(broadcast(c2s), "super_id")
      .select(col("id"), col("vec"), col("centroid_id"),
        cosine(col("vec"), col("centroid_vec")).as("ccos"))
      .groupBy(col("id"))
      .agg(any_value(col("vec")).as("vec"),
        max_by(col("centroid_id"), struct(col("ccos"), -col("centroid_id"))).as("cluster_id"))
      .select(col("id"), col("vec"), col("cluster_id"))
  }

  /** Product quantization: split each vector into `subspaces` equal-length
    * subvectors and encode each by its nearest codebook entry (squared-L2,
    * ties to the smallest centroid id). Codebooks are the subvectors of a
    * deterministic corpus sample (ids ≡ 0 mod `stride`), mirroring
    * [[ivfAssign]] so external engines reproduce the codes exactly.
    *
    * Plan shape at 100 TB: one broadcast join against the bounded codebook
    * set computes all `subspaces` distances per (vector, centroid) row in a
    * single codegen projection; one groupBy(id) with `subspaces` `min_by`
    * partial aggregates ships ~one row per vector per partition (the
    * struct ordering key makes the aggregate sort-based, but the partial
    * step still runs before the exchange — the N×C frame never shuffles).
    * No window, no driver-side codebook state. Returns
    * (idCol, pq_code) with the code as a comma-joined centroid-id string —
    * a D-dim float vector compresses to `subspaces` small ints.
    */
  def pqEncode(df: DataFrame, vecCol: String, idCol: String,
      subspaces: Int = 4, stride: Int = 100): DataFrame =
    pqCodes(df, vecCol, idCol, subspaces, stride)
      .select(col("id").as(idCol),
        concat_ws(",", (0 until subspaces).map(j => col(s"__c$j").cast("string")): _*).as("pq_code"))

  /** [[pqEncode]]'s core with the codes left as one column per subspace —
    * (id, __c0 … __c{subspaces-1}) — so ADC scoring ([[ivfPqTopK]]) can
    * equi-join each code against a distance table.
    */
  private[ops] def pqCodes(df: DataFrame, vecCol: String, idCol: String,
      subspaces: Int, stride: Int): DataFrame =
    pqCodes(df, vecCol, idCol, subspaces,
      df.where(col(idCol) % stride === 0)
        .select(col(idCol).as("cid"), col(vecCol).as("cv")))

  /** [[pqCodes]] against an explicit codebook frame `(cid, cv)` — pass a
    * fixed-budget sample for the deployment shape.
    */
  private[ops] def pqCodes(df: DataFrame, vecCol: String, idCol: String,
      subspaces: Int, codebook: DataFrame): DataFrame = {
    val scored = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(broadcast(codebook))
      .select(Seq(col("id"), col("cid")) ++
        subDists(col("v"), col("cv"), subspaces): _*)
    val codeAggs = (0 until subspaces).map(j =>
      min_by(col("cid"), struct(col(s"__d$j"), col("cid"))).as(s"__c$j"))
    scored.groupBy(col("id")).agg(codeAggs.head, codeAggs.tail: _*)
  }

  /** Per-subspace squared-L2 distances between two equal-length vectors,
    * as columns __d0 … __d{subspaces-1}. Codegen [[graft.functions.VecSqDist]]
    * — no slice materialization, one primitive loop per subspace; same
    * ascending summation as the slice+aggregate composition it replaced.
    */
  private def subDists(a: Column, b: Column, subspaces: Int): Seq[Column] = {
    val subLen = (size(a) / subspaces).cast("int")
    (0 until subspaces).map { j =>
      graft.functions.vec.sqDist(a, b, subLen * j, subLen).as(s"__d$j")
    }
  }

  /** IVF-PQ top-k with asymmetric distance computation (ADC) — the shape a
    * 100 TB ANN index actually runs: the corpus never ships vectors into the
    * scoring join, only `subspaces` small code ids per row (a 64-dim float
    * vector becomes 4 ints — 64× less exchange/state than raw vectors).
    *
    *   1. coarse quantizer: [[ivfAssign]] (broadcast centroids, `max_by`
    *      partial agg) — persisted, it feeds the query and corpus sides;
    *   2. PQ codes for the corpus: [[pqCodes]] (broadcast codebook,
    *      `min_by` partial aggs), plain-vector ADC (no residual encoding —
    *      documented simplification, determinism over recall);
    *   3. distance tables: queries × codebook — one row per (query,
    *      codebook entry) with per-subspace squared distances, bounded by
    *      |Q|·|codebook|, broadcast;
    *   4. scoring: candidates from the cluster-id equi-join, ADC distance
    *      as `subspaces` broadcast LUT lookups summed — per-candidate work
    *      is 4 hash probes, not a 64-dim dot product;
    *   5. bounded top-k aggregate ranks by (adc asc, id asc).
    *
    * Approximate by construction (coarse probe + quantized distances); the
    * oracle replays the identical arithmetic, so results are deterministic
    * and hash-checkable.
    */
  def ivfPqTopK(df: DataFrame, vecCol: String, idCol: String, stride: Int,
      queryPred: Column, k: Int, subspaces: Int = 4, pqStride: Int = 100): DataFrame =
    ivfPqTopK(df, vecCol, idCol,
      strideCentroids(df, vecCol, idCol, stride), queryPred, k, subspaces,
      df.where(col(idCol) % pqStride === 0)
        .select(col(idCol).as("cid"), col(vecCol).as("cv")))

  /** [[ivfPqTopK]] against explicit coarse-centroid and codebook frames —
    * pass [[centroidSample]]-style fixed-budget frames for the deployment
    * shape (both the coarse index and the codebook are index parameters;
    * neither should track the corpus).
    */
  def ivfPqTopK(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, queryPred: Column, k: Int, subspaces: Int,
      codebook: DataFrame): DataFrame = {
    val cb = codebook.localCheckpoint()
    val assigned = ivfAssignTo(df, vecCol, idCol, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val codes = pqCodes(df, vecCol, idCol, subspaces, cb)
    val queries = assigned.where(queryPred)
      .select(col("id").as("query_id"), col("vec").as("qv"), col("cluster_id"))
    val lut = queries.select(col("query_id"), col("qv"))
      .join(broadcast(cb))
      .select(Seq(col("query_id"), col("cid")) ++
        subDists(col("qv"), col("cv"), subspaces): _*)
    val candidates = assigned.as("c")
      .join(queries.as("q"), col("c.cluster_id") === col("q.cluster_id") &&
        col("c.id") =!= col("q.query_id"))
      .select(col("q.query_id").as("query_id"), col("c.id").as("corpus_id"))
      .join(codes.withColumnRenamed("id", "corpus_id"), Seq("corpus_id"))
    val adc = (0 until subspaces).foldLeft(candidates) { (acc, j) =>
      val l = lut.select(col("query_id"), col("cid").as(s"__c$j"), col(s"__d$j"))
      acc.join(broadcast(l), Seq("query_id", s"__c$j"))
    }.select(col("query_id"), col("corpus_id"),
      (0 until subspaces).map(j => col(s"__d$j")).reduce(_ + _).as("adc"))
    // TopKAgg ranks by (score desc, id asc): negate so smaller adc wins
    val out = topKPerQuery(
      adc.select(col("query_id"), col("corpus_id"), (-col("adc")).as("cos")), k)
      .select(col("query_id"), col("corpus_id"), col("rank"))
      .localCheckpoint()
    assigned.unpersist()
    out
  }

  /** Multiprobe IVF top-k: each query probes its `nprobe` nearest clusters
    * instead of one — the standard recall/cost dial (recall loss of
    * single-probe IVF comes from neighbors that straddle a cluster
    * boundary; probing 2–4 clusters recovers most of it for nprobe× the
    * candidate volume).
    *
    * Probe selection is a bounded per-query aggregate: collect the C
    * (centroid-count) scored centroids and keep the top `nprobe` by
    * sorting the collected array — state is C entries per query, bounded
    * by the centroid count, never corpus-sized; no window over the N×C
    * frame. The corpus side then hash-joins on cluster_id exactly as
    * single-probe does, with nprobe rows per query on the probe side.
    */
  def ivfTopKMultiprobe(df: DataFrame, vecCol: String, idCol: String,
      stride: Int, queryPred: Column, k: Int, nprobe: Int): DataFrame =
    ivfTopKMultiprobe(df, vecCol, idCol,
      strideCentroids(df, vecCol, idCol, stride), queryPred, k, nprobe)

  /** [[ivfTopKMultiprobe]] against an explicit centroid frame — pass
    * [[centroidSample]]'s output for the fixed-budget deployment shape.
    */
  def ivfTopKMultiprobe(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, queryPred: Column, k: Int, nprobe: Int): DataFrame = {
    // the assignment feeds BOTH the probe-selection (query) side and the
    // corpus side of the cluster join: persist it so the N×C broadcast-join
    // + max_by aggregation materializes ONCE (MEMORY_AND_DISK — spillable at
    // scale), then release the cache after the small top-k result is
    // eagerly checkpointed (mirrors Dedup.jaccardPairs hygiene).
    // the centroid frame is read twice (assignment + probe selection) —
    // localCheckpoint pins one materialization
    val cent = centroids.localCheckpoint()
    val assigned = ivfAssignTo(df, vecCol, idCol, cent)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probeCentroids = cent
    val queries = assigned.where(queryPred)
      .select(col("id").as("query_id"), col("vec").as("qv"))
    val probes = queries.join(broadcast(probeCentroids))
      .select(col("query_id"), col("qv"), col("centroid_id"),
        cosine(col("qv"), col("centroid_vec")).as("ccos"))
      .groupBy(col("query_id"))
      .agg(any_value(col("qv")).as("qv"),
        slice(array_sort(collect_list(struct((-col("ccos")).as("negc"),
          col("centroid_id").as("cid")))), 1, nprobe).as("top"))
      .select(col("query_id"), col("qv"),
        explode(transform(col("top"), s => s.getField("cid"))).as("cluster_id"))
    val scored = assigned.as("c")
      .join(probes.as("q"), col("c.cluster_id") === col("q.cluster_id") &&
        col("c.id") =!= col("q.query_id"))
      .select(col("q.query_id").as("query_id"), col("c.id").as("corpus_id"),
        cosine(col("q.qv"), col("c.vec")).as("cos"))
    // a corpus vector can appear in several probed clusters only if probes
    // overlap across queries, never within one query (clusters partition
    // the corpus) — no dedup needed before ranking
    val out = topKPerQuery(scored, k).localCheckpoint()
    assigned.unpersist()
    out
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    * recipe): cluster embeddings (IVF assignment against deterministic
    * sampled centroids), then inside each cluster drop every vector whose
    * cosine to a LOWER-id cluster member exceeds `threshold` — one
    * deterministic representative per semantic near-duplicate group
    * survives.
    *
    * Plan shape at 100 TB: the pairwise check is confined to clusters —
    * the self-join is an equi-join on cluster_id whose work is
    * Σ cluster_size², tuned by centroid count (more centroids → smaller
    * clusters), never the corpus-wide cross product. The exchange is keyed
    * on cluster_id (hash-uniform when centroids are well-spread; a
    * pathological mega-cluster is an AQE skew-join case). Returns every
    * input id with its cluster and the drop decision:
    * (id, cluster_id, is_dropped).
    */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
      stride: Int, threshold: Double): DataFrame = {
    // three consumers (both sides of the cluster-confined pairwise join +
    // the final verdict join) would re-derive the N×C assignment 3× —
    // persist once, eagerly checkpoint the narrow (id, cluster, bool)
    // verdict frame, release the (wide, vec-carrying) cache
    val assigned = ivfAssign(df, vecCol, idCol, stride)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = semanticDedupOnAssigned(assigned, threshold).localCheckpoint()
    assigned.unpersist()
    out
  }

  /** [[semanticDedup]] with two-level assignment — the corpus-scale shape.
    * SemDeDup's semantic dial is CLUSTER SIZE (pairwise work inside a
    * cluster is size², so the centroid count must track the corpus to keep
    * clusters bounded), which makes FLAT assignment N×C ∝ N² — the
    * measured 13×-at-10× / 101×-at-100× growth of SCALE.md §11-12. Here
    * assignment goes through [[ivfAssignTwoLevel]] with a fixed
    * `superCount` budget: N×(S + C/S) work, linear in N for the S-term and
    * N·C/S for the refine term — at S ≈ √C both terms meet at N√C. The
    * pairwise stage is unchanged (cluster-confined equi-join, Σ size²).
    */
  def semanticDedupTwoLevel(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, superCount: Int, threshold: Double): DataFrame = {
    val assigned = ivfAssignTwoLevel(df, vecCol, idCol, centroids, superCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = semanticDedupOnAssigned(assigned, threshold).localCheckpoint()
    assigned.unpersist()
    out
  }

  /** The pairwise stage of [[semanticDedup]] on a materialized assignment
    * frame (id, vec, cluster_id) — exposed so the mega-cluster skew path
    * can be exercised and its plan inspected directly. The cluster_id
    * equi-join is the skew surface: a pathological mega-cluster lands all
    * its rows in one shuffle partition, which AQE's skew-join splits at
    * runtime (asserted in SkewSpec; see SCALE.md).
    */
  def semanticDedupOnAssigned(assigned: DataFrame, threshold: Double): DataFrame = {
    val left = assigned.select(col("cluster_id"), col("id").as("id_a"), col("vec").as("va"))
    val right = assigned.select(col("cluster_id"), col("id").as("id_b"), col("vec").as("vb"))
    val dropped = left.join(right, "cluster_id")
      .where(col("id_a") < col("id_b") && cosine(col("va"), col("vb")) >= threshold)
      .select(col("id_b").as("id")).distinct()
    assigned.join(dropped.withColumn("is_dropped", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster_id"),
        coalesce(col("is_dropped"), lit(false)).as("is_dropped"))
  }

  /** IVF top-k: probe only the query's own cluster. Recall is partial by
    * construction (single-probe); the point is the candidate reduction — at
    * scale the cluster-id equi-join replaces the cross product.
    *
    * This is the explicit-centroid-frame form; [[ivfTopKBudget]] (fixed
    * centroid budget — the 100 TB shape: |C| is an index parameter, so
    * assignment work is linear in the corpus) and the legacy stride
    * overload both delegate here.
    */
  def ivfTopK(df: DataFrame, vecCol: String, idCol: String, centroids: DataFrame,
      queryPred: Column, k: Int): DataFrame = {
    // assigned feeds the query side AND the corpus side of the probe join:
    // persist so the N×C assignment materializes once; eagerly checkpoint
    // the (queries × k)-row result, then release the cache
    val assigned = ivfAssignTo(df, vecCol, idCol, centroids)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = assigned.where(queryPred)
      .select(col("id").as("query_id"), col("vec").as("qv"), col("cluster_id"))
    val scored = assigned.as("c")
      .join(queries.as("q"), col("c.cluster_id") === col("q.cluster_id") &&
        col("c.id") =!= col("q.query_id"))
      .select(col("q.query_id").as("query_id"), col("c.id").as("corpus_id"),
        cosine(col("q.qv"), col("c.vec")).as("cos"))
    val out = topKPerQuery(scored, k).localCheckpoint()
    assigned.unpersist()
    out
  }

  /** [[ivfTopK]] with the legacy stride centroid selection — |C| tracks the
    * corpus, so assignment is N×C ∝ N²/stride; prefer [[ivfTopKBudget]] at
    * corpus scale.
    */
  def ivfTopK(df: DataFrame, vecCol: String, idCol: String, stride: Int,
      queryPred: Column, k: Int): DataFrame =
    ivfTopK(df, vecCol, idCol, strideCentroids(df, vecCol, idCol, stride), queryPred, k)

  /** [[ivfTopK]] with a fixed centroid budget ([[centroidSample]]): the
    * deployment form — the centroid count is an index parameter, so
    * assignment work grows linearly with the corpus instead of
    * quadratically (SCALE.md §12's `sim_ivf_topk` finding).
    */
  def ivfTopKBudget(df: DataFrame, vecCol: String, idCol: String,
      numCentroids: Int, queryPred: Column, k: Int,
      knownCount: Option[Long] = None): DataFrame =
    ivfTopK(df, vecCol, idCol,
      centroidSample(df, vecCol, idCol, numCentroids, knownCount),
      queryPred, k)

  /** Element-wise vector sum + member count, as a typed Aggregator: the
    * map-side-combining reduction under [[kmeansCentroids]]'s update step.
    * Each partition ships ONE (sum, count) buffer per cluster — k×P rows
    * through the exchange instead of the N×d rows a posexplode +
    * per-dimension groupBy would shuffle. Mismatched vector widths throw
    * (a malformed embedding would otherwise silently corrupt every mean
    * in its cluster — the dedup/ANN family's null-on-mismatch convention
    * is for per-row scores, not cross-row aggregates).
    */
  final class VecSumCountAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        Array[Double], (Array[Double], Long), (Array[Double], Long)] {
    private def add(s: Array[Double], a: Array[Double]): Array[Double] = {
      require(s.length == a.length,
        s"vector width mismatch in k-means update: ${s.length} vs ${a.length}")
      var i = 0
      while (i < s.length) { s(i) += a(i); i += 1 }
      s
    }
    def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)
    def reduce(b: (Array[Double], Long), a: Array[Double]): (Array[Double], Long) =
      if (a == null) b
      else if (b._2 == 0L) (a.clone(), 1L)
      else (add(b._1, a), b._2 + 1)
    def merge(b1: (Array[Double], Long), b2: (Array[Double], Long)): (Array[Double], Long) =
      if (b1._2 == 0L) b2
      else if (b2._2 == 0L) b1
      else (add(b1._1, b2._1), b1._2 + b2._2)
    def finish(b: (Array[Double], Long)): (Array[Double], Long) = b
    def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    def outputEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  }

  /** Spherical k-means (Lloyd) centroid refinement: start from the
    * deterministic fixed-budget [[centroidSample]], then `iters` rounds of
    * assign-to-nearest (cosine, via [[ivfAssignTo]] — the exact assignment
    * the IVF family serves queries with) and mean-update. Refined
    * centroids drop straight into [[ivfTopK]] / [[semanticDedupTwoLevel]]
    * as the explicit centroid frame — better-centered cells mean higher
    * recall at the same nprobe (measured in SCALE.md).
    *
    * Determinism across engines: each update rounds centroid components
    * to 9 dp, so every engine re-deriving the iteration (the DuckDB
    * oracle included) feeds bit-identical centroids into the next
    * assignment — float accumulation order in the mean never leaks into
    * cluster membership. Clusters that lose every member die (standard
    * Lloyd) and are absent from the output.
    *
    * Plan shape at 100 TB: per iteration, one broadcast of k centroid
    * rows + one partial-agg shuffle whose exchange carries k×partitions
    * (sum, count) buffers ([[VecSumCountAgg]]) — assignment work is N×k×d
    * inside the scan, shuffle volume is O(k), and the tiny centroid frame
    * is localCheckpoint'ed each round so the plan stays iteration-depth-
    * free. Returns (centroid_id, centroid_vec, n_members).
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, knownCount: Option[Long] = None): DataFrame =
    kmeansCentroids(df, vecCol, idCol,
      centroidSample(df, vecCol, idCol, k, knownCount), iters)

  /** [[kmeansCentroids]] from an explicit initial centroid frame
    * `(centroid_id, centroid_vec)` — for warm restarts and externally
    * chosen seeds.
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, idCol: String,
      init: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val sumCount = udaf(new VecSumCountAgg)
    var centroids = init
    var out: DataFrame = null
    for (_ <- 0 until iters) {
      out = ivfAssignTo(df, vecCol, idCol, centroids)
        .groupBy(col("cluster_id"))
        .agg(sumCount(col("vec")).as("sc"))
        .select(col("cluster_id").as("centroid_id"),
          col("sc._1").as("__s"), col("sc._2").as("n_members"))
        .select(col("centroid_id"),
          transform(col("__s"), x => round(x / col("n_members"), 9)).as("centroid_vec"),
          col("n_members"))
        .localCheckpoint(true)
      centroids = out.select(col("centroid_id"), col("centroid_vec"))
    }
    out
  }

  /** Recall@k of an approximate top-k result against the exact one — the
    * ANN counterpart of [[Dedup.pairRecall]], and the same "measure, don't
    * guess" discipline: every IVF/PQ approximation should be priced with
    * this before its parameters (centroid budget, nprobe) are trusted at
    * corpus scale. Both inputs carry (query_id, corpus_id) rows (the shape
    * every top-k operator here returns); ranks are irrelevant — recall@k
    * asks set membership, not order. Returns one row
    * (n_reference, n_caught, recall) regardless of corpus size: one left
    * join + one global aggregate.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val caught = approx.select(col("query_id"), col("corpus_id")).distinct()
      .withColumn("__c", lit(1L))
    exact.select(col("query_id"), col("corpus_id"))
      .join(caught, Seq("query_id", "corpus_id"), "left")
      .agg(count(lit(1)).as("n_reference"),
        coalesce(sum(col("__c")), lit(0L)).as("n_caught"),
        round(coalesce(sum(col("__c")), lit(0L)).cast("double") /
          count(lit(1)), 6).as("recall"))
  }
}
