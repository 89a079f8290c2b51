package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exactness baseline; the IVF variant is
  * the 100 TB scale path: assign every vector to its nearest centroid once
  * (narrow map over a broadcast centroid set), then probe only the query's
  * cluster — candidate count drops by ~C× for C centroids, and the join is
  * a hash join on cluster id instead of a full cross product.
  *
  * Dot products use the codegen'd higher-order functions `zip_with` +
  * `aggregate` — no UDF in the hot path.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }

  /** IVF (inverted-file) assignment: nearest centroid per vector. Centroids
    * are a deterministic sample of the corpus (ids ≡ 0 mod `stride`), so the
    * oracle can reproduce the clustering exactly. Returns
    * (id, vec, cluster_id).
    */
  def ivfAssign(df: DataFrame, vecCol: String, idCol: String, stride: Int): DataFrame = {
    val centroids = df.where(col(idCol) % stride === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
    val scored = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .join(broadcast(centroids))
      .select(col("id"), col("vec"), col("centroid_id"),
        cosine(col("vec"), col("centroid_vec")).as("ccos"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("ccos").desc, col("centroid_id").asc)
    scored.withColumn("r", row_number().over(w)).where(col("r") === 1)
      .select(col("id"), col("vec"), col("centroid_id").as("cluster_id"))
  }

  /** IVF top-k: probe only the query's own cluster. Recall is partial by
    * construction (single-probe); the point is the candidate reduction — at
    * scale the cluster-id equi-join replaces the cross product.
    */
  def ivfTopK(df: DataFrame, vecCol: String, idCol: String, stride: Int,
      queryPred: Column, k: Int): DataFrame = {
    val assigned = ivfAssign(df, vecCol, idCol, stride)
    val queries = assigned.where(queryPred)
      .select(col("id").as("query_id"), col("vec").as("qv"), col("cluster_id"))
    val scored = assigned.as("c")
      .join(queries.as("q"), col("c.cluster_id") === col("q.cluster_id") &&
        col("c.id") =!= col("q.query_id"))
      .select(col("q.query_id").as("query_id"), col("c.id").as("corpus_id"),
        cosine(col("q.qv"), col("c.vec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("cos"), col("rank"))
  }
}
