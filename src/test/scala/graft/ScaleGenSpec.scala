package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The decade-scaling evidence (SCALE.md §11–§15) rests on ScaleGen's
  * invariants — pin them: disjoint key ranges per copy, copy-0 identity,
  * cross-copy text decorrelation (vowel permutation), embedding rotation.
  * A silent violation (e.g. verbatim text copies) would turn the measured
  * "linear growth" numbers into artifacts of cross-copy duplicate blowup.
  */
class ScaleGenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val Shift = 1000000000L

  lazy val dst: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_scalegen").toString
    graft.bench.ScaleGen.generate(spark, "/root/testdata/sf0.001", d, 3)
    d
  }

  private def src(name: String) = spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
  private def out(name: String) = spark.read.parquet(s"$dst/$name.parquet")

  test("fanned tables triple, dimensions copy through, key ranges are disjoint") {
    Seq("customer", "orders", "lineitem", "documents", "embeddings", "events")
      .foreach { t => assert(out(t).count() == 3 * src(t).count(), t) }
    Seq("region", "nation").foreach { t => assert(out(t).count() == src(t).count(), t) }
    val maxSrcId = src("documents").agg(max("doc_id")).head().getLong(0)
    val copies = out("documents")
      .select((col("doc_id") / Shift).cast("long").as("copy"),
        pmod(col("doc_id"), lit(Shift)).as("base"))
    assert(copies.agg(max("base")).head().getLong(0) == maxSrcId)
    assert(copies.select("copy").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L, 2L))
  }

  test("copy 0 is the identity; other copies decorrelate text and rotate embeddings") {
    val d0 = out("documents").where(col("doc_id") < Shift)
    assert(d0.as("a").join(src("documents").as("b"), "doc_id")
      .where(col("a.text") =!= col("b.text")).count() == 0)
    // copy 1's map is vowel permutation "aeiuo" (identity consonants):
    // only o<->u actually move, so the guarantee — and the filter — is
    // "text containing o or u differs", not "any vowel"
    val pairs = out("documents").where(col("doc_id") >= Shift && col("doc_id") < 2 * Shift)
      .select((col("doc_id") - Shift).as("doc_id"), col("text").as("t1"))
      .join(src("documents"), "doc_id")
      .where(col("text").rlike("[ouOU]"))
    assert(pairs.count() > 0)
    assert(pairs.where(col("t1") === col("text")).count() == 0)
    // embeddings: copy 1 is the source vector cyclically rotated by 13
    val e1 = out("embeddings").where(col("vec_id") >= Shift && col("vec_id") < 2 * Shift)
      .select((col("vec_id") - Shift).as("vec_id"), col("embedding").as("v1"))
      .join(src("embeddings"), "vec_id")
    val dim = size(col("embedding"))
    val expected = concat(slice(col("embedding"), lit(14), dim - 13),
      slice(col("embedding"), lit(1), lit(13)))
    assert(e1.where(col("v1") =!= expected).count() == 0)
    assert(e1.count() == src("embeddings").count())
  }

  test("joins stay within a copy: every order's customer key is in the same copy") {
    val o = out("orders").select((col("o_custkey") / Shift).cast("long").as("ck"),
      (col("o_orderkey") / Shift).cast("long").as("ok"))
    assert(o.where(col("ck") =!= col("ok")).count() == 0)
  }

  // ---------------------------------------------------------------- zipf mode

  lazy val zdst: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_zipfgen").toString
    graft.bench.ScaleGen.generateZipf(spark, "/root/testdata/sf0.001", d, 3)
    d
  }
  private def zout(name: String) = spark.read.parquet(s"$zdst/$name.parquet")

  test("zipf mode: totals match the uniform fan; primary keys stay unique and shifted") {
    Seq("customer", "orders", "lineitem", "documents", "embeddings", "events")
      .foreach { t => assert(zout(t).count() == 3 * src(t).count(), t) }
    Seq("region", "nation").foreach { t => assert(zout(t).count() == src(t).count(), t) }
    assert(zout("documents").select("doc_id").distinct().count()
      == 3 * src("documents").count())
    assert(zout("orders").select("o_orderkey").distinct().count()
      == 3 * src("orders").count())
  }

  test("zipf mode: foreign keys land on EXISTING scaled keys (no dangling joins)") {
    val dangling = zout("orders").join(
      zout("customer").select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
    assert(dangling.count() == 0)
    val danglingSupp = zout("lineitem").join(
      zout("supplier").select(col("s_suppkey").as("l_suppkey")), Seq("l_suppkey"), "left_anti")
    assert(danglingSupp.count() == 0)
    val danglingNation = zout("customer").join(
      zout("nation").select(col("n_nationkey").as("c_nationkey")), Seq("c_nationkey"), "left_anti")
    assert(danglingNation.count() == 0)
  }

  test("zipf mode: the head is heavy (α≈1.1) and rank 1 is the smallest copy-0 key") {
    // orders per customer: rank-1 share ≈ (1-2^-0.1)/(1-450^-0.1) ≈ 14.6%
    val byCust = zout("orders").groupBy("o_custkey").count()
      .orderBy(col("count").desc).limit(3).collect()
    val nOrders = 3.0 * src("orders").count()
    assert(byCust(0).getLong(1) / nOrders > 0.08,
      s"hottest customer only ${byCust(0).getLong(1)} of $nOrders orders")
    assert(byCust(0).getAs[Long]("o_custkey") == 0L) // rank 1 → key cMin = 0, copy 0
    assert(byCust(0).getLong(1) >= byCust(1).getLong(1) &&
      byCust(1).getLong(1) >= byCust(2).getLong(1))
    // documents: hottest duplicate-text cluster is a constant fraction of
    // the corpus, and every text comes from the ORIGINAL pool
    val byText = zout("documents").where(col("text").isNotNull)
      .groupBy("text").count().orderBy(col("count").desc).limit(1).collect()
    assert(byText(0).getLong(1) / (3.0 * src("documents").count()) > 0.08)
    val foreignTexts = zout("documents").select("text")
      .join(src("documents").select("text"), Seq("text"), "left_anti")
    assert(foreignTexts.count() == 0)
    // kg hub: one nation holds a constant fraction of all customers
    val byNation = zout("customer").groupBy("c_nationkey").count()
      .orderBy(col("count").desc).limit(1).collect()
    assert(byNation(0).getLong(1) / (3.0 * src("customer").count()) > 0.15)
    // deterministic: regenerating gives identical bytes of skew
    val again = java.nio.file.Files.createTempDirectory("graft_zipfgen2").toString
    graft.bench.ScaleGen.generateZipf(spark, "/root/testdata/sf0.001", again, 3)
    val a = spark.read.parquet(s"$again/orders.parquet")
      .groupBy("o_custkey").count()
    val z = zout("orders").groupBy("o_custkey").count()
    assert(z.exceptAll(a).count() == 0 && a.exceptAll(z).count() == 0)
  }
}
