package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: token-budget
  * sequence packing and per-group caps. Both are single-window-pass plans
  * partitioned by a grouping column, so they parallelize across groups —
  * the 100 TB shape is "many independent groups", never a global sort.
  */
object Packing {

  /** Sequential token-budget packing: documents are laid out in
    * deterministic (`idCol`) order within each `groupCol` stream and
    * assigned to the fixed-`budget` context window their cumulative token
    * offset starts in (greedy stream chunking — a document that straddles
    * a boundary counts into the pack where it starts). Pack ids are local
    * to the group, so packing is embarrassingly parallel across groups:
    * one shuffle on `groupCol`, one in-partition sort, no global state.
    * A skewed group is a sort skew; pre-bucket the group key (e.g.
    * `source`, shard) if one group dominates the corpus.
    *
    * Returns (idCol, groupCol, n_tokens, pack_id).
    */
  def packSequences(df: DataFrame, idCol: String, groupCol: String,
      nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(groupCol), nTokens.cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before DIV ${budget}L"))
      .drop("cum_before")
  }

  /** Materialize the packed sequences: one row per (group, pack) with the
    * member documents' text joined in layout order by `sep` (the actual
    * context-window assembly step after [[packSequences]] decides the
    * layout). Per-pack state is bounded by `budget` tokens PLUS the one
    * document that straddles the pack boundary (greedy chunking assigns a
    * straddler to the pack it starts in, and a single document larger
    * than the budget owns its packs alone) — bounded by
    * budget + max document size, not corpus size. Returns
    * (groupCol, pack_id, n_docs, packed_text).
    */
  def concatPacked(df: DataFrame, textCol: String, idCol: String,
      groupCol: String, nTokens: Column, budget: Long,
      sep: String = "\n\n"): DataFrame = {
    val packed = packSequences(df, idCol, groupCol, nTokens, budget)
      .join(df.select(col(idCol), col(textCol)), idCol)
    packed.groupBy(col(groupCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col(idCol), col(textCol)))),
            s => s.getField(textCol))).as("packed_text"))
  }

  /** Per-group cap: keep at most `n` rows per `groupCol`, chosen in
    * `orderCol` order (the standard per-domain/per-source cap against a
    * handful of domains dominating the training mix). One window pass;
    * rows beyond the cap are dropped before anything downstream runs.
    * Returns the input columns plus the 1-based `slot` within the group.
    */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String, n: Int): DataFrame = {
    require(n > 0, "cap must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("slot", row_number().over(w)).where(col("slot") <= n)
  }

  /** Sharded-export layout: the final step of a training-data build —
    * assign every document a shard (portable md5-derived hash mod
    * `shards`, so sizes are balanced and the assignment is reproducible
    * anywhere) and a position within the shard (hash order = a
    * deterministic global shuffle, so each shard is an unbiased sample
    * read in "shuffled" order — no trainer-side shuffle buffer needed).
    *
    * Plan shape at 100 TB: ONE exchange keyed on the shard id + an
    * in-partition sort — exactly the physical layout of the export
    * (`repartition($"shard").sortWithinPartitions($"pos").write` streams
    * each shard file in order). Shard count is the parallelism dial;
    * per-task state is one spillable sort. The id tie-break after the
    * hash keeps positions total-ordered and engine-portable.
    *
    * Returns (idCol, shard, pos).
    */
  def shardLayout(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val h = Dedup.h60(col(idCol).cast("string"), seed = 7)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), (h % shards).cast("int").as("shard"), h.as("__h"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
