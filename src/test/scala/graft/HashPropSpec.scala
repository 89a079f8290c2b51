package graft

import graft.ops.{Dedup, Multimodal}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the fingerprint/banding family: Hamming banding and
  * corpus verdicts must agree with brute force on RANDOM signature sets
  * (the fixed OpsSpec cases pin behavior; these pin the guarantee), and
  * the audio envelope hash must be exactly gain-invariant.
  *
  * Spark-side properties run fewer samples than the string kernels' 300
  * (each sample is a whole distributed job); 25 seeded sets × up to 24
  * signatures still sweeps thousands of random pairs through the
  * pigeonhole claim.
  */
class HashPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val sigSet: Gen[List[Long]] = for {
    n <- Gen.choose(2, 24)
    // mix near-duplicates (small perturbations of a base) with arbitrary
    // longs so the ≤ maxHamming region is actually populated
    base <- Gen.long
    sigs <- Gen.listOfN(n, Gen.oneOf(
      Gen.long,
      Gen.choose(0, 63).map(b => base ^ (1L << b)),
      Gen.choose(0, 62).map(b => base ^ (3L << b))))
  } yield sigs

  test("hammingPairs equals brute force for random signature sets (pigeonhole recall)") {
    samples(sigSet, 25).foreach { sigs =>
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sig")
      val maxH = 7
      val got = Dedup.hammingPairs(df, "id", "sig", bits = 64, bands = 16, maxHamming = maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = (for {
        (sa, ia) <- sigs.zipWithIndex; (sb, ib) <- sigs.zipWithIndex if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (ia.toLong, ib.toLong) -> h.toLong).toMap
      assert(got == want, s"sigs=$sigs")
    }
  }

  test("hammingPairs multi-index probe (maxHamming >= bands) equals brute force") {
    // radius 8 over 4 16-bit bands: per-band radius 2, 137-mask ball —
    // the generalized-pigeonhole expansion path, vs the same oracle
    samples(sigSet, 25).foreach { sigs =>
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sig")
      val maxH = 8
      val got = Dedup.hammingPairs(df, "id", "sig", bits = 64, bands = 4, maxHamming = maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = (for {
        (sa, ia) <- sigs.zipWithIndex; (sb, ib) <- sigs.zipWithIndex if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (ia.toLong, ib.toLong) -> h.toLong).toMap
      assert(got == want, s"sigs=$sigs")
    }
  }

  test("hammingBallMasks enumerates exactly the ≤radius popcount masks, and guards blowup") {
    val m = Dedup.hammingBallMasks(16, 2)
    assert(m.size == 1 + 16 + 120 && m.distinct.size == m.size)
    assert(m.forall(x => x >= 0 && x < 65536 && java.lang.Long.bitCount(x) <= 2))
    val e = intercept[IllegalArgumentException](Dedup.hammingBallMasks(62, 8))
    assert(e.getMessage.contains("probe side"))
  }

  test("hammingPairs rejects band widths that overflow the 64-bit band-key encoding") {
    // bands = 1 → bandBits = 64 → (1L << 64) wraps to 1 and the mask
    // collapses every band key to one all-pairs bucket; must throw instead
    val df = Seq((1L, 1L), (2L, 2L)).toDF("id", "sig")
    val e = intercept[IllegalArgumentException](
      Dedup.hammingPairs(df, "id", "sig", bits = 64, bands = 1, maxHamming = 0)
        .collect())
    assert(e.getMessage.contains("band bits overflows"))
  }

  test("hammingDedupCorpus equals brute-force components for random signature sets") {
    samples(sigSet, 15).foreach { sigs =>
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sig")
      val maxH = 7
      // explicit no-cap: random dense clusters can overflow the auto cap's
      // 16-floor at 4-bit bands, and this property pins the EXACT surface
      val got = Dedup.hammingDedupCorpus(df, "id", "sig", bits = 64, bands = 16,
          maxHamming = maxH, maxBucketSize = Some(Long.MaxValue))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute-force union-find over the exact ≤ maxH pair graph
      val parent = Array.tabulate(sigs.size)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for {
        (sa, ia) <- sigs.zipWithIndex; (sb, ib) <- sigs.zipWithIndex if ia < ib
        if java.lang.Long.bitCount(sa ^ sb) <= maxH
      } { val (ra, rb) = (find(ia), find(ib)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val want = sigs.indices.map(i => i.toLong -> find(i).toLong).toMap
      assert(got == want, s"sigs=$sigs")
    }
  }

  test("hammingDedupCorpus bounds adversarial band-bucket mass (10^5 near-miss sigs, one hot band)") {
    // 100 000 DISTINCT signatures that all agree on band 0 (low 16 bits
    // = 0x1234) but carry random high bits: band 0 is one 100 000-row
    // bucket — uncapped, that single bucket alone is ~5×10⁹ candidate
    // pairs × the 137-mask probe fan-out, an hours-long all-pairs join.
    // The auto-derived dyadic cap drops it (its b² is orders over the
    // 64-pairs-per-sig budget) while the 16-bit bands 1–3 stay Poisson-
    // thin (λ ≈ 1.5) and keep carrying recall: planted exact dups (the
    // collapse path, cap-immune) and a planted 2-bit near-dup (found via
    // its intact bands) must still cluster. The test COMPLETING is the
    // bound; the planted assertions are the recall floor.
    val spark2 = spark
    import spark2.implicits._
    val n = 100000L
    val base = spark.range(n).select(col("id"),
      (xxhash64(col("id")).bitwiseAND(lit(0xffffffffffff0000L)))
        .bitwiseOR(lit(0x1234L)).as("sig"))
    val sigOf = base.where(col("id").isin(0L, 1L)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = Seq(
      (n, sigOf(0L)), (n + 1, sigOf(0L)), (n + 2, sigOf(0L)), // exact dups of 0
      (n + 3, sigOf(1L) ^ (3L << 20))).toDF("id", "sig")      // hamming 2 from 1
    val out = Dedup.hammingDedupCorpus(base.unionByName(planted), "id", "sig",
        bits = 64, bands = 4, maxHamming = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n + 4)                                  // one verdict per doc
    assert(Seq(n, n + 1, n + 2).forall(out(_) == out(0L)))     // collapse path intact
    assert(out(n + 3) == out(1L))                              // near-dup via thin bands
  }

  test("bucket cap BINDING is priced exactly by pairRecall (the degraded mode has a number)") {
    // The cap's contract (Dedup.scala maxBucketSize doc): a pair is missed
    // as soon as every qualifying band has EITHER endpoint's key in an
    // oversized bucket. This test PLANTS that situation deterministically
    // and pins the recall number pairRecall reports for it — the degraded
    // mode's loss is measured, not just bounded.
    //
    // Construction (bands = 4 × 16 bits, maxHamming = 3 ⇒ per-band radius
    // 0, classic intact-band join): 100 hot signatures share band-0 key
    // 0xABCD; high 48 bits replicate a distinct 12-bit id 4× so any two
    // hot rows are ≥ 4 apart (no unintended pairs; after the 3-bit flip
    // below, still ≥ 4·w − 3·2 + 3 ≥ 5 ∀ w ≥ 1 by overlap counting).
    //   - HOT pair: b = hot(7) ^ one bit in EACH of bands 1..3 (hamming 3,
    //     band 0 the only qualifying band, both endpoints in the oversized
    //     0xABCD bucket) — missed under any cap < 101.
    //   - THIN pair: band-0 key 0x000F, hamming 1 — every bucket tiny, found.
    val spark2 = spark
    import spark2.implicits._
    def hot(id: Long): Long =
      (id << 52) | (id << 40) | (id << 28) | (id << 16) | 0xABCDL
    val rows = (0L until 100L).map(i => (i, hot(i))) ++ Seq(
      (1000L, hot(7) ^ (1L << 20) ^ (1L << 36) ^ (1L << 52)), // hot pair w/ id 7
      (2000L, (0x321L << 16) | 0x000FL),                      // thin pair a
      (2001L, ((0x321L << 16) | 0x000FL) ^ (1L << 16)))       // thin pair b (h=1)
    val df = rows.toDF("id", "sig")
    val exact = Dedup.hammingPairs(df, "id", "sig", bits = 64, bands = 4,
      maxHamming = 3, maxBucketSize = None)
    val capped = Dedup.hammingPairs(df, "id", "sig", bits = 64, bands = 4,
      maxHamming = 3, maxBucketSize = Some(50L))
    val r = Dedup.pairRecall(exact, capped).head()
    assert(r.getLong(0) == 2L, "reference graph must be exactly the 2 planted pairs")
    assert(r.getLong(1) == 1L, "cap must drop the hot pair and keep the thin pair")
    assert(r.getDouble(2) == 0.5)
  }

  test("audio envelope hash is exactly gain-invariant (integer gain, no clipping)") {
    val stepsGen: Gen[(List[Int], Int)] = for {
      steps <- Gen.listOfN(65, Gen.choose(0, 4000))
      gain <- Gen.choose(2, 4)
    } yield (steps, gain)
    samples(stepsGen, 8).foreach { case (steps, gain) =>
      def wav(scale: Int) = {
        val amps = steps.map(_ * scale)
        // one window per step (framesPerStep=2): same construction as
        // syntheticWavEnvelope but with arbitrary per-step amplitudes
        val n = amps.size * 2
        val out = new Array[Byte](44 + n * 2)
        def ascii(o: Int, s: String): Unit = (0 until 4).foreach(i => out(o + i) = s.charAt(i).toByte)
        def le16(o: Int, v: Int): Unit = { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
        def le32(o: Int, v: Int): Unit = { le16(o, v & 0xffff); le16(o + 2, (v >>> 16) & 0xffff) }
        ascii(0, "RIFF"); le32(4, 36 + n * 2); ascii(8, "WAVE")
        ascii(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
        le32(24, 8000); le32(28, 16000); le16(32, 2); le16(34, 16)
        ascii(36, "data"); le32(40, n * 2)
        (0 until n).foreach { i =>
          val a = amps(i / 2); val v = if (i % 2 == 0) a else -a
          le16(44 + i * 2, v & 0xffff)
        }
        out
      }
      val df = Seq((1L, wav(1)), (2L, wav(gain))).toDF("id", "payload")
      val out = Multimodal.audioEnvelopeHash(df, "payload")
        .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("audio_envhash"))).toMap
      assert(out(1L) == out(2L), s"gain=$gain steps=${steps.take(8)}…")
    }
  }
}
