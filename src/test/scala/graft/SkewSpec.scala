package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-path evidence (SCALE.md): a pathological mega-cluster in
  * semanticDedup funnels every row into ONE shuffle partition of the
  * cluster_id equi-join. The mitigation at scale is AQE's runtime
  * skew-join split — this spec synthesizes the hot key and asserts the
  * final adaptive plan actually split it (the `isSkew` marker), so the
  * mitigation is pinned by a test instead of argued from documentation.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null)
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("mega-cluster semantic dedup: AQE splits the skewed cluster join") {
    // 2000 vectors in 50 identical-copy groups (id % 50), stride larger
    // than the id range → a single centroid (id 0) wins every assignment:
    // one cluster holds the whole corpus. The copies guarantee real drops,
    // so AQE's empty-relation propagation cannot elide the pairwise join
    // from the final plan.
    val df = spark.range(0, 2000).toDF("id")
      .select(col("id"), transform(sequence(lit(0), lit(7)),
        i => (pmod((col("id") % 50) * (i + 3), lit(97)) + 1).cast("double")).as("v"))
    val assigned = Similarity.ivfAssign(df, "v", "id", 100000)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      assert(assigned.select(countDistinct(col("cluster_id"))).first().getLong(0) == 1L,
        "fixture must be a single mega-cluster")
      withConf(
        // force the sort-merge path (AQE skew split does not apply to
        // broadcast joins — at real scale the corpus side never broadcasts)
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
        // test-sized thresholds: the prod defaults (256 MB) scaled down so
        // a ~100 KB hot partition counts as skewed
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB") {
        val out = Similarity.semanticDedupOnAssigned(assigned, 0.999)
        // collect() drives THIS Dataset's QueryExecution so its adaptive
        // plan finalizes (count()/where() would build a different QE)
        val rows = out.collect()
        // every id ≥ 50 has an identical lower-id twin (id - 50) → must
        // drop; id 0 has no lower-id neighbor → must survive. (Cross-group
        // cosines can also clear the threshold — near-collinear fixture —
        // so only the twin-guaranteed subset is asserted exactly.)
        assert(rows.length == 2000)
        assert(rows.filter(_.getLong(0) >= 50).forall(_.getBoolean(2)))
        assert(rows.exists(r => r.getLong(0) == 0L && !r.getBoolean(2)))
        val p = out.queryExecution.executedPlan.toString()
        assert(p.toLowerCase.contains("skew=true"),
          s"mega-cluster join was not skew-split by AQE:\n$p")
      }
    } finally { assigned.unpersist(); () }
  }
}
