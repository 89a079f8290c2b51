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
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, dst, copies)
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

    // per-copy cyclic dimension rotation: identity at copy 0, cross-copy
    // cosine ~0 for roughly-isotropic embeddings. 13 is coprime with the
    // 64-dim layout so the first 64 copies get distinct rotations; beyond
    // that the second lap negates the vector (cosine -1 against the
    // same-rotation copy — still not a near-duplicate)
    val dim = size(col("embedding"))
    val rot = pmod(col("__copy") * lit(13), dim)
    val lapSign = when((col("__copy") / dim).cast("int") % 2 === 0, lit(1.0f))
      .otherwise(lit(-1.0f))
    val rotated = when(rot === 0, col("embedding")).otherwise(
      concat(slice(col("embedding"), rot + lit(1), dim - rot),
        slice(col("embedding"), lit(1), rot)))
    write("embeddings", fan(read("embeddings"))
      .withColumn("vec_id", shifted("vec_id"))
      .withColumn("embedding", transform(rotated, x => x * lapSign)))
  }
}
