package graft.bench

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up data generator for the SCALE.md evidence run: replicates an
  * existing SF directory N× (default 10, sf0.1 → "sf1") with disjoint key
  * ranges per copy, so headline bench timings can be compared one decade
  * apart on the same box.
  *
  * Replication is shaped so each copy is internally identical to the source
  * but copies do not interact:
  *   - integer keys shift by `copy * 1e9` — joins stay within a copy;
  *   - document text gets a per-copy vowel permutation — token shingles
  *     differ almost everywhere, so MinHash/SimHash/Jaccard find no
  *     cross-copy near-duplicates (pair outputs scale ~linearly, as they
  *     would with genuinely new data, instead of quadratically as they
  *     would with verbatim copies);
  *   - embedding vectors get a per-copy cyclic dimension rotation — norms
  *     and per-dim distribution are preserved but cross-copy cosine drops
  *     to noise, so ANN/semantic-dedup cluster sizes scale linearly.
  * Copy 0 is the identity, so the source SF is a subset of the output.
  *
  * Usage: runMain graft.bench.ScaleGen [srcDir] [dstDir] [copies]
  */
object ScaleGen {
  private val Shift = 1000000000L // > any key in sf<=1 by orders of magnitude

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val mode = if (args.length > 3) args(3) else "uniform"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "uniform" => generate(spark, src, dst, copies)
      case "zipf" => generateZipf(spark, src, dst, copies)
      case other => throw new IllegalArgumentException(
        s"unknown ScaleGen mode '$other' (uniform | zipf)")
    }
    spark.stop()
  }

  /** The generator body, session-agnostic (ScaleGenSpec pins its
    * invariants on the shared test session).
    */
  def generate(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {

    // narrow fan-out: explode a 0..copies-1 sequence per row, no shuffle
    def fan(df: DataFrame): DataFrame =
      df.withColumn("__copy", explode(sequence(lit(0), lit(copies - 1))))

    def shifted(c: String): Column = col(c) + col("__copy") * Shift

    // 32-way layout: a genuinely 10×-bigger dataset would span many HDFS/
    // parquet blocks and scan with full parallelism; writing one part file
    // would instead serialize every downstream scan into a single task and
    // measure scheduler starvation, not the operators
    def write(name: String, df: DataFrame): Unit = {
      df.drop("__copy").repartition(32)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen] $name done")
    }

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // dimensions: copy through unchanged (scale-independent, like TPC-H)
    Seq("region", "nation").foreach(t => write(t, read(t)))

    write("customer", fan(read("customer")).withColumn("c_custkey", shifted("c_custkey")))
    write("orders", fan(read("orders"))
      .withColumn("o_orderkey", shifted("o_orderkey"))
      .withColumn("o_custkey", shifted("o_custkey")))
    write("lineitem", fan(read("lineitem"))
      .withColumn("l_orderkey", shifted("l_orderkey"))
      .withColumn("l_partkey", shifted("l_partkey"))
      .withColumn("l_suppkey", shifted("l_suppkey")))
    write("part", fan(read("part")).withColumn("p_partkey", shifted("p_partkey")))
    write("supplier", fan(read("supplier")).withColumn("s_suppkey", shifted("s_suppkey")))
    write("events", fan(read("events"))
      .withColumn("event_id", shifted("event_id"))
      .withColumn("user_id", shifted("user_id")))

    // per-copy vowel permutation (identity at copy 0 — "aeiou" is the first
    // permutation in lexicographic order); 120 distinct maps keep up to 120
    // copies pairwise-decorrelated (vowels are ~38% of English letters so
    // nearly every token differs between two copies with different maps).
    // Beyond 120 copies the vowel maps wrap, so each LAP (i / 120) adds a
    // consonant rotation on top — the text analogue of the embeddings'
    // second-lap sign flip — otherwise copy 120 would repeat copy 0's text
    // verbatim under new ids and silently reintroduce the quadratic
    // cross-copy near-duplicate blowup this generator exists to avoid.
    val vowelMaps = "aeiou".permutations.map(p => p + p.toUpperCase).toVector
    val cons = "bcdfghjklmnpqrstvwxyz"
    def textMap(i: Int): String = {
      val lap = (i / vowelMaps.size) % cons.length
      val rotated = cons.drop(lap) + cons.take(lap)
      vowelMaps(i % vowelMaps.size) + rotated + rotated.toUpperCase
    }
    val fromChars = "aeiouAEIOU" + cons + cons.toUpperCase
    val permText = (1 until copies).foldLeft(when(col("__copy") === 0, col("text"))) {
      (acc, i) => acc.when(col("__copy") === i,
        translate(col("text"), fromChars, textMap(i)))
    }
    write("documents", fan(read("documents"))
      .withColumn("doc_id", shifted("doc_id"))
      .withColumn("text", permText))

    write("embeddings", rotateEmbeddings(fan(read("embeddings"))
      .withColumn("vec_id", shifted("vec_id"))))
  }

  /** Per-copy cyclic dimension rotation on a fanned frame (has `__copy`):
    * identity at copy 0, cross-copy cosine ~0 for roughly-isotropic
    * embeddings. 13 is coprime with the 64-dim layout so the first 64
    * copies get distinct rotations; beyond that the second lap negates the
    * vector (cosine -1 against the same-rotation copy — still not a
    * near-duplicate). Shared by the uniform and zipf modes.
    */
  private def rotateEmbeddings(fanned: DataFrame): DataFrame = {
    val dim = size(col("embedding"))
    val rot = pmod(col("__copy") * lit(13), dim)
    val lapSign = when((col("__copy") / dim).cast("int") % 2 === 0, lit(1.0f))
      .otherwise(lit(-1.0f))
    val rotated = when(rot === 0, col("embedding")).otherwise(
      concat(slice(col("embedding"), rot + lit(1), dim - rot),
        slice(col("embedding"), lit(1), rot)))
    fanned.withColumn("embedding", transform(rotated, x => x * lapSign))
  }

  /** Zipfian-skew scale-up — the adversarial twin of [[generate]]: same
    * copy fan-out and disjoint primary-key shifts (totals match the
    * uniform mode decade for decade), but the skew-bearing columns are
    * REASSIGNED from a zipf-like law instead of kept uniform:
    *
    *   - `o_custkey` / `l_suppkey` / `events.user_id`: drawn over the full
    *     scaled key domain with rank-1 the hottest (a celebrity customer /
    *     supplier / user; joins and groupBys see one giant key group),
    *   - `c_nationkey`: drawn over the 25 nations (a hub vertex whose KG
    *     in-degree is a constant fraction of ALL customers),
    *   - `documents.text`/`lang`: drawn from the ORIGINAL document pool,
    *     so exact/near-duplicate cluster sizes follow the zipf law (the
    *     boilerplate-page shape of a real crawl; ~11% of all docs become
    *     ONE duplicate cluster).
    *
    * The law: rank = ⌈(1 − u·(1 − m^(1−α)))^(1/(1−α))⌉ with α = 1.1 — the
    * truncated-Pareto inverse CDF, density ∝ rank^(−1.1) on [1, m]
    * (rank-1 share ≈ 11% at m = 15 000). `u` is a deterministic per-row
    * hash, so the dataset is reproducible bit-for-bit and scales keep the
    * same distribution SHAPE — zipf decade factors compare like-for-like
    * against uniform ones (SCALE.md §16).
    */
  def generateZipf(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    def fan(df: DataFrame): DataFrame =
      df.withColumn("__copy", explode(sequence(lit(0), lit(copies - 1))))
    def shifted(c: String): Column = col(c) + col("__copy") * Shift
    def write(name: String, df: DataFrame): Unit = {
      df.drop("__copy").repartition(32)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen-zipf] $name done")
    }
    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // deterministic uniform in [0,1) from the row's (shifted) identity
    def unif(cols: Column*): Column =
      pmod(xxhash64(cols: _*), lit(1L << 30)).cast("double") / (1L << 30).toDouble
    // truncated-Pareto inverse CDF, alpha = 1.1: X ∈ [1, m] with density
    // ∝ x^-1.1; rank = floor(X) so P(rank = r) integrates the density over
    // [r, r+1) — floor, NOT ceil, or rank 1 would only occur at u = 0
    def zipfRank(u: Column, m: Long): Column = {
      val q = 1.0 - math.pow(m.toDouble, 1.0 - 1.1)
      least(lit(m), greatest(lit(1L),
        floor(pow(lit(1.0) - u * q, lit(1.0 / (1.0 - 1.1)))).cast("long")))
    }
    // key domains are contiguous [min, min+dom); bounded 3-value driver agg.
    // keyFromRank RELIES on contiguity — a key hole would make it emit
    // dangling foreign keys that silently drop rows from downstream inner
    // joins (changing generated table totals), so a non-contiguous source
    // fails loudly here instead of corrupting the dataset.
    def domain(df: DataFrame, k: String): (Long, Long) = {
      // distinct counted on the SAME cast domain as the span — a
      // non-integral key would otherwise compare apples to truncated
      // oranges and pass or fail the contiguity check spuriously
      val r = df.agg(min(col(k)).cast("long"), max(col(k)).cast("long"),
        countDistinct(col(k).cast("long")),
        count(when(col(k).cast("double") =!=
          col(k).cast("long").cast("double"), 1))).head()
      // integrality first: distinct FRACTIONAL keys can truncate onto the
      // same long and look contiguous, after which keyFromRank would emit
      // long keys that never reference the fractional rows — silently
      // changing generated totals instead of failing loudly
      require(r.getLong(3) == 0L,
        s"$k has ${r.getLong(3)} non-integral values — keyFromRank emits " +
          "long keys, so a fractional key domain cannot be replayed")
      val (kMin, dom) = (r.getLong(0), r.getLong(1) - r.getLong(0) + 1)
      require(r.getLong(2) == dom,
        s"$k domain has holes: ${r.getLong(2)} distinct keys over a " +
          s"[${r.getLong(0)}, ${r.getLong(1)}] span of $dom — keyFromRank " +
          "would fabricate dangling foreign keys")
      (kMin, dom)
    }
    // rank 1 = hottest; ranks walk the scaled key space copy-major, so the
    // head of the law lands on copy 0's smallest keys and every rank maps
    // to a key that EXISTS after the fan+shift
    def keyFromRank(r: Column, kMin: Long, dom: Long): Column =
      lit(kMin) + pmod(r - 1, lit(dom)) + ((r - 1) / lit(dom)).cast("long") * Shift

    Seq("region", "nation").foreach(t => write(t, read(t)))

    val (nMin, nDom) = domain(read("nation"), "n_nationkey")
    write("customer", fan(read("customer"))
      .withColumn("c_custkey", shifted("c_custkey"))
      .withColumn("c_nationkey",
        (lit(nMin) + zipfRank(unif(col("c_custkey")), nDom) - 1).cast("int")))

    write("supplier", fan(read("supplier")).withColumn("s_suppkey", shifted("s_suppkey")))
    write("part", fan(read("part")).withColumn("p_partkey", shifted("p_partkey")))

    val (cMin, cDom) = domain(read("customer"), "c_custkey")
    write("orders", fan(read("orders"))
      .withColumn("o_orderkey", shifted("o_orderkey"))
      .withColumn("o_custkey",
        keyFromRank(zipfRank(unif(col("o_orderkey")), cDom * copies), cMin, cDom)))

    val (sMin, sDom) = domain(read("supplier"), "s_suppkey")
    write("lineitem", fan(read("lineitem"))
      .withColumn("l_orderkey", shifted("l_orderkey"))
      .withColumn("l_partkey", shifted("l_partkey"))
      .withColumn("l_suppkey",
        keyFromRank(zipfRank(unif(col("l_orderkey"), col("l_linenumber")), sDom * copies),
          sMin, sDom)))

    val (uMin, uDom) = domain(read("events"), "user_id")
    write("events", fan(read("events"))
      .withColumn("event_id", shifted("event_id"))
      .withColumn("user_id",
        keyFromRank(zipfRank(unif(col("event_id")), uDom * copies), uMin, uDom)))

    // documents: ids stay unique (fan+shift) but text/lang come from the
    // zipf-rank source doc — duplicate clusters with zipf sizes; n_chars
    // recomputed so metadata stays consistent with the reassigned text
    val (dMin, dDom) = domain(read("documents"), "doc_id")
    val srcDocs = read("documents").select(
      col("doc_id").as("__rank_doc"),
      col("text").as("__ztext"), col("lang").as("__zlang"))
    write("documents", fan(read("documents"))
      .withColumn("doc_id", shifted("doc_id"))
      .withColumn("__rank_doc", lit(dMin) + zipfRank(unif(col("doc_id")), dDom) - 1)
      .drop("text", "lang")
      .join(broadcast(srcDocs), Seq("__rank_doc"))
      .select(col("doc_id"), col("__ztext").as("text"), col("__zlang").as("lang"),
        col("source"), length(col("__ztext")).cast("long").as("n_chars"), col("__copy")))

    write("embeddings", rotateEmbeddings(fan(read("embeddings"))
      .withColumn("vec_id", shifted("vec_id"))))
  }
}
