package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over the engine's own knowledge-graph
  * output — the "what do I do with the KG once it's built" surface.
  *
  * Everything here is join/aggregate-shaped (no driver-side adjacency, no
  * per-vertex loops): the plans are the same ones that run over a
  * 100 TB edge set, with the iteration count fixed up front so the oracle
  * can replay the identical arithmetic.
  */
object Graphs {

  /** Fixed-iteration PageRank (Brin & Page 1998; the damped simplified
    * variant where dangling mass is not redistributed — every iteration is
    * pure joins + aggregation, deterministic given the edge set).
    *
    *   pr_0(v)    = 1 / N
    *   pr_{t+1}(v) = (1 - d) / N + d · Σ_{u→v} pr_t(u) / outdeg(u)
    *
    * Plan shape at 100 TB: the edge frame joins the (narrow) rank frame on
    * the source vertex and aggregates contributions by destination — one
    * hash-join + one partial-agg shuffle per iteration, both keyed on
    * vertex ids (hash-uniform unless the graph has celebrity vertices,
    * which is an AQE skew-join case). The rank frame stays (vertex,
    * double) — never adjacency-sized. Iterations are unrolled into one
    * Catalyst plan (`iterations` is small and fixed); for long chains,
    * checkpoint every few rounds like `Dedup.resolveClusters` does.
    *
    * Vertices = every id appearing as src or dst. Returns
    * (vertex, pagerank) with the rank UNROUNDED — callers round for
    * cross-engine comparison.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val vertices = e.select(col("src").as("vertex"))
      .unionByName(e.select(col("dst").as("vertex"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // N is a 1-row aggregate: broadcast it through the iterations instead
    // of collecting to the driver
    val n = vertices.agg(count(lit(1)).cast("double").as("n"))
    var pr = vertices.crossJoin(broadcast(n))
      .select(col("vertex"), (lit(1.0) / col("n")).as("pr"))
    (1 to iterations).foreach { _ =>
      val contrib = e.join(outdeg, "src")
        .join(pr.withColumnRenamed("vertex", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("outdeg")).as("inflow"))
      pr = vertices.crossJoin(broadcast(n))
        .join(contrib.withColumnRenamed("dst", "vertex"), Seq("vertex"), "left")
        .select(col("vertex"),
          ((lit(1.0) - damping) / col("n") +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
    }
    pr.select(col("vertex"), col("pr").as("pagerank"))
  }

  /** Snapshot diff between two KG materializations: which triples were
    * added and which removed — the primitive behind incremental KG
    * rebuilds (publish only the delta instead of re-shipping the graph).
    * Two anti-joins on the full triple key; each is a hash join keyed on
    * (s,p,o), so the exchange is proportional to the snapshots, with the
    * usual AQE skew handling if one subject dominates. Returns
    * (s, p, o, change) with change ∈ 'added' | 'removed'.
    */
  def kgDiff(oldQuads: DataFrame, newQuads: DataFrame): DataFrame = {
    val key = Seq("s", "p", "o")
    val o = oldQuads.select(key.map(col): _*)
    val n = newQuads.select(key.map(col): _*)
    n.join(o, key, "left_anti").withColumn("change", lit("added"))
      .unionByName(o.join(n, key, "left_anti").withColumn("change", lit("removed")))
  }

  /** Connected components over an (undirected) edge frame — the
    * engine's large-star/small-star resolver ([[Dedup.resolveClusters]]:
    * O(log² n) rounds at scale, driver union-find below the size gate)
    * exposed as a first-class KG analytics op. Returns (id, cluster) with
    * cluster = the component's minimum vertex id; vertices that appear in
    * no edge are absent (join the vertex frame back with
    * `coalesce(cluster, id)` for singleton semantics, as
    * [[Dedup.dedupCorpus]] does).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      localThreshold: Long = 4000000L): DataFrame =
    Dedup.resolveClusters(
      edges.select(col(aCol).as("id_a"), col(bCol).as("id_b")),
      localThreshold = localThreshold)

  /** Per-vertex degree profile of an edge frame: out-degree, in-degree.
    * One partial-agg shuffle per direction + an outer merge join.
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
    val out = e.groupBy(col("src").as("vertex")).agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("vertex")).agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("vertex"), "full_outer")
      .select(col("vertex"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }
}
