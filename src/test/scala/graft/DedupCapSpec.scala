package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mega-cluster probes for the bounded-dedup dials (the SkewSpec approach
  * applied to candidate generation): a boilerplate swarm — many documents
  * sharing a long common prefix — lands hundreds of docs in the same LSH
  * band buckets / behind the same high-df prefix tokens, which is exactly
  * the b²-pair blowup that killed the exact operators at the 100× bench
  * scale (SCALE.md §12). These tests pin that
  *
  *   1. the caps bound candidate VOLUME (≤ the dyadic budget, not b²), and
  *   2. capping composes with [[Dedup.resolveClusters]] without splitting
  *      true clusters whose buckets/anchor tokens are under the cap (the
  *      pigeonhole property: identical docs share every band and every
  *      rare token, and small-group buckets survive any cap ≥ group size).
  */
class DedupCapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // 60-word boilerplate prefix shared by the swarm (distinct tails), plus
  // 10 true-duplicate groups of 6 identical docs with disjoint vocabulary
  private val boiler = (0 until 60).map(i => s"boiler$i common legal footer").mkString(" ")
  private lazy val corpus = {
    val swarm = (0 until 300).map(i => (1000L + i, s"$boiler tailword$i extra$i"))
    // fully disjoint vocabulary per group (identical within, unrelated
    // across — no legitimate cross-group similarity)
    val groups = for (g <- 0 until 10; m <- 0 until 6)
      yield (g * 6L + m, (0 until 10).map(w => s"grp${g}word${w}x$g").mkString(" "))
    (swarm ++ groups).toDF("doc_id", "text")
  }
  private val nDocs = 360L

  test("maxBucketSize bounds minhash candidate volume; capped set is a subset") {
    val uncapped = Dedup.minhashCandidates(corpus, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    // the swarm shares most band signatures → near-quadratic pair count
    assert(uncapped.size > 20000, s"fixture not dense enough: ${uncapped.size}")
    val capped = Dedup.minhashCandidates(corpus, "text", "doc_id",
      numHashes = 12, rowsPerBand = 3, shingleLen = 8, maxBucketSize = Some(16L))
      .as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped), "cap must only remove pairs, never invent")
    // admitted volume ≤ Σ b² over kept buckets ≤ (#buckets ≤ 4·n) × 16²/2;
    // the sharp check: far below the uncapped blowup and below the dyadic
    // budget dedupCorpus would derive (64 pairs/doc)
    assert(capped.size <= 64 * nDocs, s"capped candidates not bounded: ${capped.size}")
    // every true-duplicate group pair survives (buckets of 6 ≤ cap 16)
    for (g <- 0 until 10; a <- 0 until 6; b <- a + 1 until 6)
      assert(capped.contains((g * 6L + a, g * 6L + b)),
        s"cap split true group $g pair ($a,$b)")
  }

  test("dedupCorpus: auto cap defuses the swarm, true clusters stay whole") {
    val out = Dedup.dedupCorpus(corpus, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == nDocs)
    // pigeonhole: each identical-6 group is one cluster labeled by its min
    // id, exactly one representative kept
    for (g <- 0 until 10) {
      val ids = (0 until 6).map(m => g * 6L + m)
      ids.foreach { id =>
        assert(out(id)._1 == g * 6L, s"group $g split: doc $id → cluster ${out(id)._1}")
        assert(out(id)._2 == (id == g * 6L), s"wrong verdict for $id")
      }
    }
    // the auto-derived cap must actually bite on this fixture: without it
    // the swarm's ~300-doc buckets emit ~45k pairs; with it, swarm docs
    // cannot all collapse into one resolved mega-component
    val swarmClusters = (0 until 300).map(i => out(1000L + i)._1).distinct
    assert(swarmClusters.size > 1,
      "swarm resolved to a single cluster — cap did not bound the bucket join")
  }

  test("bandSignaturesCol: row-level signatures identical to minhashBands") {
    val viaAgg = Dedup.minhashBands(corpus, "text", "doc_id")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("sig"))).as("sigs"))
    val viaRow = corpus.select(col("doc_id").as("id"),
      sort_array(Dedup.bandSignaturesCol(col("text"))).as("sigs"))
    // value-identical per doc — the stateless streaming form must produce
    // the same signatures the batch banding (and its oracles) produce
    assert(viaAgg.join(viaRow, "id").where(viaAgg("sigs") =!= viaRow("sigs")).count() == 0)
    assert(viaRow.count() == nDocs && viaAgg.count() == nDocs)
  }

  test("zipf hot cluster: exact-duplicate collapse finds the giant identical group the cap would drop") {
    // the boilerplate-page law (SCALE.md §16): one text owns a constant
    // fraction of the corpus. 2000 identical docs would put ~2000 docs in
    // every band bucket — far past any cap, so the UNCOLLAPSED capped join
    // silently missed the biggest duplicate cluster; collapsed, the group
    // is one rep + 1999 expansion edges and must resolve WHOLE.
    val hot = "boilerplate cookie banner accept all terms and conditions apply now"
    val near = hot + " ok" // a near-dup VARIANT: reps must still band-join
    val docs = ((0 until 2000).map(i => (i.toLong, hot)) :+ (5000L, near)) ++
      (0 until 60).map(i => (9000L + i,
        (0 until 8).map(w => s"u${i}w${w}q$i").mkString(" "))) // disjoint vocab per doc
    val out = Dedup.dedupCorpus(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size == 2061L)
    // every hot copy — and the near-dup variant, via rep-level banding —
    // lands in the min-id cluster with exactly one representative kept
    for (i <- 0 until 2000)
      assert(out(i.toLong) == (0L, i == 0), s"hot doc $i got ${out(i.toLong)}")
    assert(out(5000L) == (0L, false), "near-dup variant must join via the rep band join")
    for (i <- 0 until 60)
      assert(out(9000L + i) == (9000L + i, true), s"unique doc $i must stay a singleton")
  }

  test("textGroups: one rep per distinct text, nulls one group, '' distinct from null") {
    val df = Seq((1L, "a"), (5L, "a"), (3L, "b"), (7L, null), (9L, null), (2L, ""))
      .toDF("doc_id", "text")
    val m = Dedup.textGroups(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 5L -> 1L, 3L -> 3L, 7L -> 7L, 9L -> 7L, 2L -> 2L))
  }

  test("incremental rebuild survives a hot identical cluster and anchors on standing min") {
    import graft.ops.Curation
    val hot = "subscribe to our newsletter for updates delivered straight to your inbox"
    // standing corpus: 1500 identical hot docs + distinct filler
    val standing = (0 until 1500).map(i => (i.toLong, hot)) ++
      (0 until 30).map(i => (7000L + i, s"standing unique text $i alpha$i"))
    // new snapshot: standing unchanged, plus 40 ADDED copies of the hot text
    val added = (0 until 40).map(i => (100000L + i, hot))
    val oldSnap = standing.toDF("doc_id", "text")
    val newSnap = (standing ++ added).toDF("doc_id", "text")
    val out = Curation.incrementalRebuild(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // the patch covers exactly the 40 added docs, each a duplicate of the
    // SMALLEST STANDING hot id (standing wins) — not of each other
    assert(out.size == 40)
    for (i <- 0 until 40)
      assert(out(100000L + i) == ("added", 0L, false), s"added $i got ${out(100000L + i)}")
  }

  test("verifyPairsJaccard: true jaccard per proposed pair, zero-overlap pairs reported") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"), // J(1,2) = 3/5
      (3L, "zeta eta theta iota"))      // J(1,3) = 0
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = graft.ops.Dedup.verifyPairsJaccard(docs, "text", "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 0.6)
    assert(out((1L, 3L)) == 0.0, "verifier must report handed-in pairs even at zero overlap")
    assert(out.size == 2, "no pair outside the proposal set may appear")
  }

  test("winnowing: shared substring >= w+k-1 chars shares a fingerprint; disjoint text does not") {
    val shared = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = Seq(
      (1L, s"prefix one $shared suffix one"),
      (2L, s"completely different opening $shared another ending"),
      (3L, "unrelated content with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    val fp = graft.ops.Dedup.winnowFingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val by = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((by(1L) intersect by(2L)).nonEmpty,
      "docs sharing a long substring must share a fingerprint (winnowing guarantee)")
    assert((by(1L) intersect by(3L)).isEmpty && (by(2L) intersect by(3L)).isEmpty,
      "disjoint text sharing no 8-gram must not collide")
  }

  test("prefix-df cap: capped jaccard ⊆ exact, group pairs survive, composition clusters correctly") {
    val one = corpus.withColumn("lang", lit("en"))
    val exact = Dedup.jaccardPairs(one, "text", "doc_id", "lang", 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.jaccardPairsCapped(one, "text", "doc_id", "lang", 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(exact))
    // swarm pairs (J ≈ 1 via boilerplate, anchored ONLY by df≈300 tokens)
    // are the priced recall loss; group pairs (rare anchors, df = 6) keep
    val groupPairs = (for (g <- 0 until 10; a <- 0 until 6; b <- a + 1 until 6)
      yield (g * 6L + a, g * 6L + b)).toSet
    assert(groupPairs.subsetOf(capped), "cap must not drop rare-anchor group pairs")
    assert(capped.size < exact.size, "cap should bite on the boilerplate swarm")
    // composition: capped pairs → connected components → exactly the groups
    val clusters = Dedup.resolveClusters(Dedup.jaccardPairsCapped(
        one, "text", "doc_id", "lang", 0.6).select($"id_a", $"id_b"))
      .as[(Long, Long)].collect().toMap
    for (g <- 0 until 10; m <- 0 until 6)
      assert(clusters(g * 6L + m) == g * 6L, s"group $g split after resolution")
  }

  test("CapBindReport: the auto-cap self-announces when it binds (§17.2 " +
      "density) and stays silent when exact-dup collapse absorbs the mass") {
    // §17.2's uniform-bind regime in miniature: 3000 DISTINCT sigs whose
    // bands 0, 2, 3 are constant (correlated signature bits) — three
    // 3000-rep buckets the dyadic budget (64 × 3000) cannot admit. Every
    // count below is closed-form: 3003 buckets total, the 3 constant-band
    // buckets capped, 3 × 3000 of 4 × 3000 band rows inside them.
    var rep1: Option[Dedup.CapBindReport] = None
    val dense = (0 until 3000).map(i => (i.toLong, (i.toLong << 16) | 0x1234L))
      .toDF("doc_id", "sig")
    Dedup.hammingDedupCorpus(dense, "doc_id", "sig",
      onCapBind = r => rep1 = Some(r)).count()
    val r1 = rep1.get
    assert(r1.op == "hammingDedupCorpus" && r1.binds)
    assert(r1.cap == 16L)
    assert(r1.cappedBuckets == 3L && r1.totalBuckets == 3003L)
    assert(r1.cappedBandRows == 9000L && r1.totalBandRows == 12000L)
    assert(math.abs(r1.cappedBandRowShare - 0.75) < 1e-12)
    // zipf shape: 3000 docs over 20 distinct sigs — collapse runs FIRST,
    // buckets are rep-level (≤ 20 ≤ the derived cap 32), report is silent
    var rep2: Option[Dedup.CapBindReport] = None
    val zipf = (0 until 3000).map(i => (i.toLong, (i % 20).toLong))
      .toDF("doc_id", "sig")
    Dedup.hammingDedupCorpus(zipf, "doc_id", "sig",
      onCapBind = r => rep2 = Some(r)).count()
    assert(rep2.exists(r => !r.binds && r.cappedBuckets == 0L &&
      r.totalBandRows == 80L))
    // the text path announces through the same channel: the boilerplate
    // swarm (300 docs sharing most band sigs) binds and says so
    var rep3: Option[Dedup.CapBindReport] = None
    Dedup.dedupCorpus(corpus, "text", "doc_id",
      onCapBind = r => rep3 = Some(r)).count()
    assert(rep3.exists(r => r.op == "dedupCorpus" && r.binds &&
      r.cappedBandRows > 0L))
    // an EXPLICIT maxBucketSize is a conscious caller choice: no report
    var rep4: Option[Dedup.CapBindReport] = None
    Dedup.hammingDedupCorpus(zipf, "doc_id", "sig",
      maxBucketSize = Some(64L), onCapBind = r => rep4 = Some(r)).count()
    assert(rep4.isEmpty)
  }

  test("dyadicCap: classes above 2^30 and square-overflow weights stay safe") {
    // a degenerate bucket of 2^35 members (every empty-text doc sharing
    // md5("") band sigs at billions-of-docs scale): the class is beyond the
    // old 2^30 when-chain (→ null cap NPE) and its b² weight wraps long
    val sizes = Seq(1L << 35, 5L, 3L).toDF("b")
    val cap = Dedup.dyadicSizeCap(sizes, "b", budget = 100L)
    // small classes fit (4 then 8, cum 9+34), the monster is over budget
    assert(cap == 16L, s"got $cap")
    // and a budget big enough for everything admits the clamped monster
    assert(Dedup.dyadicSizeCap(sizes, "b", budget = Long.MaxValue) >= (1L << 35))
  }

  test("jaccardPairsCapped: no extra passes over the input lineage") {
    val acc = spark.sparkContext.longAccumulator("scans")
    val tick = udf((s: String) => { acc.add(1L); s }).asNondeterministic()
    val one = corpus.withColumn("text", tick($"text")).withColumn("lang", lit("en"))
    // the call runs end-to-end internally (localCheckpoint) — r6 ran the
    // tokenize lineage ~5× (sketch ×2 branches, df.count(), core ×2);
    // the shared persisted frames bound it to the ONE materialization job
    // (whose DAG reads the scan at most twice: dfreq branch + join probe)
    val out = Dedup.jaccardPairsCapped(one, "text", "doc_id", "lang", 0.6)
    out.count()
    assert(acc.value <= 2 * nDocs, s"input scanned ${acc.value}x for $nDocs docs")
    // knownDocCount skips even the counting job's pass accounting
    val acc2 = spark.sparkContext.longAccumulator("scans2")
    val tick2 = udf((s: String) => { acc2.add(1L); s }).asNondeterministic()
    val two = corpus.withColumn("text", tick2($"text")).withColumn("lang", lit("en"))
    Dedup.jaccardPairsCapped(two, "text", "doc_id", "lang", 0.6,
      knownDocCount = Some(nDocs)).count()
    assert(acc2.value <= 2 * nDocs, s"input scanned ${acc2.value}x with knownDocCount")
  }

  test("centroidSample with knownCount builds the frame without firing a job") {
    val emb = (0 until 100).map(i => (i.toLong, Seq(i.toDouble, 1.0))).toDF("vec_id", "v")
    val sc = spark.sparkContext
    sc.setJobGroup("centroid-nojob", "centroidSample knownCount", false)
    try {
      val cents = graft.ops.Similarity.centroidSample(emb, "v", "vec_id", 8,
        knownCount = Some(100L))
      assert(cents.columns.toSeq == Seq("centroid_id", "centroid_vec"))
      assert(sc.statusTracker.getJobIdsForGroup("centroid-nojob").isEmpty,
        "building the centroid frame must not run a counting job")
      // divisor honors the known count: same rows as the counting path
      val viaCount = graft.ops.Similarity.centroidSample(emb, "v", "vec_id", 8)
      assert(cents.select("centroid_id").collect().map(_.getLong(0)).toSet ==
        viaCount.select("centroid_id").collect().map(_.getLong(0)).toSet)
    } finally sc.clearJobGroup()
  }
}
