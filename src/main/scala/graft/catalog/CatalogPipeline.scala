package graft.catalog

import graft.ops.{Dedup, Embeddings, Joins, Packing, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 pipeline + OLAP breadth: temporal joins (as-of,
  * point-in-interval), corpus shaping (sequence packing, per-source caps,
  * corpus-level line dedup), unigram-LM scoring, embedding quantization,
  * and wider OLAP shapes (rollup, exact percentiles, per-group heavy
  * hitters). Same contract as the rest of the catalog: every query is
  * paired with DuckDB SQL over the identical parquet tables, aliased to
  * identical column names.
  */
object CatalogPipeline {
  import Catalog.t
  import CatalogOps.tokenizeSql

  /** 1 hour in the epoch-µs domain `Timestamps.epochUs` maps `events.ts`
    * into (schema-adaptive: the driver has shipped ts both as legacy
    * TIMESTAMP(NANOS)-as-long and as TIMESTAMP_NTZ µs across rounds).
    */
  private val HourUs = graft.util.Timestamps.HourUs

  // ---------------------------------------------------------- temporal joins

  private val asof = Q("asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      Joins.asofLastPrior(
        ev.select(col("event_id"), col("user_id"), col("ts")), "event_id", "ts",
        purchases, "event_id", "ts",
        keyCols = Seq("user_id"), matchCol = "last_purchase_id")
        .select(col("event_id"), col("last_purchase_id"))
    },
    Some("""WITH p AS (
        SELECT user_id, ts, event_id AS p_id FROM events WHERE event_type = 'purchase'),
      cand AS (
        SELECT e.event_id, p.p_id,
          row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.p_id DESC) AS r
        FROM events e JOIN p ON e.user_id = p.user_id AND p.ts <= e.ts)
      SELECT e.event_id, c.p_id AS last_purchase_id
      FROM events e LEFT JOIN (SELECT event_id, p_id FROM cand WHERE r = 1) c USING (event_id)"""),
    bench = true)

  private val rangeJoin = Q("range_join_hourly",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val tsUs = graft.util.Timestamps.epochUs(ev, "ts")
      val signups = ev.where(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"),
          tsUs.as("lo"), (tsUs + lit(HourUs)).as("hi"))
      val clicks = ev.where(col("event_type") === "click").select(tsUs.as("p"))
      val hits = Joins.pointInInterval(clicks, "p", signups, "lo", "hi", HourUs)
        .groupBy(col("signup_id")).agg(count(lit(1)).as("n_clicks"))
      signups.select(col("signup_id")).join(hits, Seq("signup_id"), "left")
        .select(col("signup_id"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
    },
    Some("""WITH s AS (SELECT event_id AS signup_id, ts FROM events WHERE event_type = 'signup'),
      c AS (SELECT ts FROM events WHERE event_type = 'click')
      SELECT s.signup_id, count(c.ts) AS n_clicks
      FROM s LEFT JOIN c ON c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
      GROUP BY s.signup_id"""),
    bench = true)

  // ---------------------------------------------------------- corpus shaping

  private val pack = Q("pipe_pack_sequences",
    (s, dir) => Packing.packSequences(t(s, dir, "documents"), "doc_id", "source",
      size(filter(split(col("text"), "\\s+"), x => x =!= "")), budget = 512L),
    Some("""WITH d AS (SELECT doc_id, source,
        len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS n_tokens
        FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
        coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM d)
      SELECT doc_id, source, n_tokens, (cum_before // 512)::BIGINT AS pack_id FROM c"""))

  /** TOKEN-exact packing: the same window plan as [[pack]] but budgeted on
    * a [[graft.ops.Bpe.tokenCount]] column instead of whitespace words —
    * the honesty gap VERDICT r12 #1 names (whitespace budgets mis-size
    * bins 1.3–2×). Text is the closed-form BPE fixture, so the oracle
    * replays the merged token count as arithmetic and the packing as the
    * standard cumulative window — BOTH the tokenizer and the budget math
    * are value-checked.
    */
  private val packBpe = Q("pipe_pack_bpe",
    (s, dir) => Packing.packSequences(
      t(s, dir, "documents").select(col("doc_id"), col("source"),
        CatalogOps.bpeSyntheticText.as("text")),
      "doc_id", "source",
      graft.ops.Bpe.tokenCount(CatalogOps.bpeMerges)(col("text")), budget = 40L),
    Some("""WITH d AS (SELECT doc_id, source,
        (4 + 2*(doc_id % 4) + 2*(doc_id % 3))::BIGINT AS n_tokens
        FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
        coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM d)
      SELECT doc_id, source, n_tokens, (cum_before // 40)::BIGINT AS pack_id FROM c"""))

  /** Sharded-export layout: balanced md5-hash shards + deterministic
    * in-shard shuffle order — the write layout of the final training set.
    */
  private val shardExport = Q("pipe_shard_export",
    (s, dir) => Packing.shardLayout(t(s, dir, "documents"), "doc_id", shards = 8),
    Some(s"""WITH h AS (SELECT doc_id,
        ${CatalogOps.h60Sql("doc_id::VARCHAR", 7)} AS hv FROM documents)
      SELECT doc_id, (hv % 8)::INT AS shard,
        row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)::BIGINT AS pos
      FROM h"""))

  private val sourceCap = Q("pipe_source_cap",
    (s, dir) => Packing.capPerGroup(
      t(s, dir, "documents").select(col("doc_id"), col("source")),
      "source", "doc_id", n = 20),
    Some("""SELECT doc_id, source, slot FROM (
        SELECT doc_id, source,
          row_number() OVER (PARTITION BY source ORDER BY doc_id) AS slot
        FROM documents)
      WHERE slot <= 20"""))

  /** Target-ratio corpus mix: largest corpus matching lang shares
    * en:de:fr = 0.5:0.3:0.2 exactly (floored), selection in hash order.
    */
  private val targetMix = Q("pipe_target_mix",
    (s, dir) => graft.ops.Sampling.targetMix(
      t(s, dir, "documents"), "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2), seed = 3)
      .select(col("doc_id"), col("lang"), col("mix_rank")),
    Some(s"""WITH m AS (SELECT doc_id, lang,
        CASE WHEN lang = 'en' THEN 0.5::DOUBLE WHEN lang = 'de' THEN 0.3::DOUBLE
             WHEN lang = 'fr' THEN 0.2::DOUBLE END AS share
        FROM documents),
      mm AS (SELECT * FROM m WHERE share IS NOT NULL),
      c AS (SELECT lang, count(*) AS cnt, any_value(share) AS share FROM mm GROUP BY lang),
      n AS (SELECT floor(min(cnt / share))::BIGINT AS n FROM c),
      ranked AS (SELECT doc_id, lang, share,
        row_number() OVER (PARTITION BY lang
          ORDER BY ${CatalogOps.h60Sql("doc_id::VARCHAR", 3)} % 1000000, doc_id) AS mix_rank
        FROM mm)
      SELECT doc_id, lang, mix_rank
      FROM ranked CROSS JOIN n
      WHERE mix_rank <= floor(share * n)"""))

  private val lineDedup = Q("dd_line_dedup",
    // the synthetic corpus is single-line and line-unique, so (like
    // p3_null_lattice does for the null lattice) the query synthesizes the
    // boilerplate scenario the operator exists for: every doc gains a
    // per-source footer line (25× repeated), a blank line, and a per-lang
    // line (~125× repeated); corpus-level line dedup must strip both
    // repeated lines from every doc, keep the unique body and the blank
    // line, and reassemble in order
    (s, dir) => Dedup.lineDedup(
      t(s, dir, "documents").withColumn("text",
        concat_ws("\n", col("text"),
          concat(lit("shared-footer "), col("source")),
          lit(""),
          concat(lit("lang: "), col("lang")))),
      "text", "doc_id", maxOccurrences = 3L),
    Some("""WITH docs AS (
        SELECT doc_id,
          text || chr(10) || 'shared-footer ' || source || chr(10) || chr(10) ||
            'lang: ' || lang AS text
        FROM documents),
      l AS (
        SELECT doc_id,
          unnest(string_split(text, chr(10))) AS line,
          unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
        FROM docs),
      f AS (SELECT line, count(*) AS cnt FROM l GROUP BY line),
      kept AS (SELECT doc_id, pos, l.line FROM l JOIN f USING (line)
        WHERE trim(l.line) = '' OR cnt <= 3),
      agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
          count(*) AS n_kept
        FROM kept GROUP BY doc_id)
      SELECT d.doc_id,
        coalesce(a.clean_text, '') AS clean_text,
        (len(string_split(d.text, chr(10))) - coalesce(a.n_kept, 0))::BIGINT AS n_removed
      FROM docs d LEFT JOIN agg a USING (doc_id)"""),
    bench = true)

  /** RAG-style context chunking: 200-char windows with 50-char overlap. */
  private val chunk = Q("txt_chunk_windows",
    (s, dir) => TextAnalysis.chunkText(t(s, dir, "documents"), "text", "doc_id",
      size = 200, overlap = 50),
    Some("""WITH d AS (SELECT doc_id, text,
        greatest(ceil((length(text) - 50)::DOUBLE / 150)::INT, 1) AS nc
        FROM documents),
      c AS (SELECT doc_id, unnest(generate_series(0, nc - 1)) AS chunk_idx, text FROM d)
      SELECT doc_id, chunk_idx, chunk_idx * 150 AS chunk_start,
        substring(text, (chunk_idx * 150 + 1)::INT, 200) AS chunk_text
      FROM c"""))

  /** Vocabulary coverage: top-1000 token vocab (count desc, token asc) +
    * per-doc OOV rate.
    */
  private val vocabOov = Q("txt_vocab_oov",
    (s, dir) => TextAnalysis.vocabOov(t(s, dir, "documents"), "text", "doc_id", 1000),
    Some(s"""WITH toks AS (SELECT doc_id, unnest($tokenizeSql) AS tok FROM documents),
      v AS (SELECT tok, 1 AS in_v FROM (
        SELECT tok, count(*) AS c FROM toks GROUP BY tok
        ORDER BY c DESC, tok LIMIT 1000)),
      j AS (SELECT doc_id, in_v FROM toks LEFT JOIN v USING (tok))
      SELECT doc_id, count(*) AS n_tokens,
        sum(CASE WHEN in_v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
        round(sum(CASE WHEN in_v IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS oov_rate
      FROM j GROUP BY doc_id"""))

  private val unigram = Q("txt_unigram_logprob",
    (s, dir) => TextAnalysis.unigramSurprisal(t(s, dir, "documents"), "text", "doc_id"),
    Some(s"""WITH toks AS (SELECT doc_id, unnest($tokenizeSql) AS tok FROM documents),
      freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      tot AS (SELECT count(*) AS n FROM toks)
      SELECT doc_id, count(*) AS n_tokens,
        round(avg(ln(n::DOUBLE / c)), 6) AS avg_surprisal
      FROM toks JOIN freq USING (tok) CROSS JOIN tot
      GROUP BY doc_id"""))

  /** Product-quantization codes: 64-dim vectors → 4 sub-codes from a
    * deterministic strided codebook (squared-L2 argmin, ties to smallest
    * centroid id) — the storage layer under IVF-PQ ANN indexes.
    */
  private val embPq = Q("emb_pq_codes",
    (s, dir) => graft.ops.Similarity.pqEncode(
      t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v")),
      "v", "vec_id", subspaces = 4, stride = 100),
    Some {
      val dists = (0 until 4).map { j =>
        val lo = j * 16 + 1
        s"list_sum(list_transform(generate_series($lo, ${lo + 15}), i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS d$j"
      }.mkString(",\n          ")
      val unions = (0 until 4).map(j =>
        s"SELECT id, cid, $j AS ss, d$j AS d FROM pairs").mkString("\n        UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 100 = 0),
        pairs AS (SELECT e.vec_id AS id, cid,
          $dists
          FROM e CROSS JOIN cent),
        expanded AS ($unions),
        best AS (SELECT id, ss, cid,
          row_number() OVER (PARTITION BY id, ss ORDER BY d, cid) AS rn FROM expanded)
        SELECT id AS vec_id, string_agg(cid, ',' ORDER BY ss) AS pq_code
        FROM best WHERE rn = 1 GROUP BY id"""
    })

  private val embQuant = Q("emb_quantize_int8",
    (s, dir) => Embeddings.quantizeInt8(
      t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v")),
      "v", "vec_id"),
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e)
      SELECT vec_id, round(norm, 6) AS l2_norm,
        array_to_string(list_transform(v, x -> (round(x / norm * 127)::INT)::VARCHAR), ',') AS q_csv
      FROM n"""))

  /** Chunk→document mean-pooling ([[graft.ops.Embeddings.meanPool]]):
    * element-wise mean of each group's embedding vectors, the aggregation
    * a RAG/embedding pipeline runs after chunk-level embedding to get one
    * vector per parent document. Exploded to the tall (key, pos, value)
    * layout for the compare; the oracle replays the quantize-sum-divide
    * arithmetic exactly (the identical `floor(x·1e6 + 0.5)` IEEE
    * expression, exact integer sum, the same two IEEE divisions), so
    * the row is byte-exact — no float-aggregation-order lottery and no
    * dependence on either engine's `round()` flavor.
    */
  private val embMeanPool = Q("emb_mean_pool",
    (s, dir) => Embeddings.meanPool(
      t(s, dir, "embeddings")
        .select((col("vec_id") % 97).as("doc_key"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
      "v", "doc_key")
      .select(col("doc_key"), col("n_vecs"),
        posexplode(col("mean_vec")).as(Seq("pos", "mean_val"))),
    Some("""WITH e AS (SELECT vec_id % 97 AS doc_key, embedding::DOUBLE[] AS v FROM embeddings),
      x AS (SELECT doc_key, unnest(v) AS val,
        unnest(generate_series(0, len(v) - 1)) AS pos FROM e),
      g AS (SELECT doc_key, pos,
        SUM(CAST(floor(val * 1000000.0 + 0.5) AS BIGINT)) AS s,
        COUNT(val) AS n FROM x GROUP BY 1, 2),
      k AS (SELECT doc_key, MAX(n) AS n_vecs FROM g GROUP BY 1)
      SELECT g.doc_key, k.n_vecs, g.pos::INT AS pos,
        CASE WHEN n > 0 THEN (s::DOUBLE / n) / 1000000.0 END AS mean_val
      FROM g JOIN k ON g.doc_key = k.doc_key
      WHERE k.n_vecs > 0"""))

  /** Weighted chunk→document pooling
    * ([[graft.ops.Embeddings.weightedMeanPool]]): the production shape —
    * chunks weighted by token count so a short tail chunk doesn't dilute
    * the document vector. Weight here is a closed-form function of
    * vec_id so the oracle regenerates it; q·w products and w sums are
    * exact longs on both sides (every SUM-derived oracle column cast
    * ::BIGINT — the r15 HUGEINT lesson).
    */
  private val embMeanPoolW = Q("emb_mean_pool_weighted",
    (s, dir) => Embeddings.weightedMeanPool(
      t(s, dir, "embeddings")
        .select((col("vec_id") % 97).as("doc_key"),
          (col("vec_id") % 7 + 1).as("w"),
          transform(col("embedding"), x => x.cast("double")).as("v")),
      "v", "w", "doc_key")
      .select(col("doc_key"), col("w_total"),
        posexplode(col("mean_vec")).as(Seq("pos", "mean_val"))),
    Some("""WITH e AS (SELECT vec_id % 97 AS doc_key,
        (vec_id % 7 + 1)::BIGINT AS w, embedding::DOUBLE[] AS v FROM embeddings),
      x AS (SELECT doc_key, w, unnest(v) AS val,
        unnest(generate_series(0, len(v) - 1)) AS pos FROM e),
      g AS (SELECT doc_key, pos,
        SUM(CAST(floor(val * 1000000.0 + 0.5) AS BIGINT) * w)::BIGINT AS s,
        SUM(CASE WHEN val IS NOT NULL THEN w END)::BIGINT AS n
        FROM x GROUP BY 1, 2),
      k AS (SELECT doc_key, MAX(n)::BIGINT AS w_total FROM g GROUP BY 1)
      SELECT g.doc_key, k.w_total, g.pos::INT AS pos,
        CASE WHEN n > 0 THEN (s::DOUBLE / n) / 1000000.0 END AS mean_val
      FROM g JOIN k ON g.doc_key = k.doc_key
      WHERE k.w_total > 0"""))

  // -------------------------------------------------------------------- OLAP

  private val rollup = Q("q_rollup",
    (s, dir) => t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_rows")),
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  private val pctile = Q("q_percentile",
    // exact percentiles with linear interpolation (matches quantile_cont);
    // the 100 TB path is approx_percentile (t-digest) — exact percentile
    // sorts per group, fine for bounded group counts, wrong for huge ones
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75))).as("pcts"))
      .select(col("l_returnflag"), posexplode(col("pcts")).as(Seq("p_idx", "raw")))
      .select(col("l_returnflag"), col("p_idx"), round(col("raw"), 4).as("pct_price")),
    Some("""WITH q AS (SELECT l_returnflag,
        quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS qs
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
        unnest(generate_series(0, 2)) AS p_idx,
        round(unnest(qs), 4) AS pct_price
      FROM q"""))

  private val cube = Q("q_cube",
    (s, dir) => t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("sum_price"), count(lit(1)).as("n_rows")),
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n_rows
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** TF-IDF top terms: corpus document frequencies joined back to per-doc
    * term counts, top-3 terms per doc by tf·idf (ties to the
    * lexicographically smaller term). The df table is vocab-sized (AQE
    * broadcasts when it fits); per-doc ranking partitions by doc.
    */
  private val tfidf = Q("txt_tfidf_topterms",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("doc_id"), explode(Dedup.tokenize(col("text"))).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df_, "tok").crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("tok"),
          (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
      scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
        .select(col("doc_id"), col("tok"), round(col("tfidf"), 6).as("tfidf"), col("rnk"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, unnest($tokenizeSql) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      n AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (SELECT doc_id, tok, tf * ln(n_docs::DOUBLE / df) AS tfidf
        FROM tf JOIN df USING (tok) CROSS JOIN n),
      r AS (SELECT doc_id, tok, tfidf,
        row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rnk FROM scored)
      SELECT doc_id, tok, round(tfidf, 6) AS tfidf, rnk FROM r WHERE rnk <= 3"""))

  private val heavyHitters = Q("q_heavy_hitters",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_suppkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("rev").desc, col("l_suppkey"))
      rev.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 3)
        .select(col("l_returnflag"), col("l_suppkey"),
          round(col("rev"), 2).as("revenue"), col("rnk"))
    },
    Some("""WITH rev AS (SELECT l_returnflag, l_suppkey,
        sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY 1, 2),
      r AS (SELECT l_returnflag, l_suppkey, rev,
        row_number() OVER (PARTITION BY l_returnflag ORDER BY rev DESC, l_suppkey) AS rnk
        FROM rev)
      SELECT l_returnflag, l_suppkey, round(rev, 2) AS revenue, rnk
      FROM r WHERE rnk <= 3"""))

  /** Dataset profiling (Deequ-style health check): nulls planted on every
    * 13th priority so the null counter has something to count; dates render
    * identically ('yyyy-MM-dd') in Spark's and DuckDB's string casts.
    */
  private val profileQ = Q("q_profile",
    (s, dir) => {
      val o = t(s, dir, "orders").withColumn("o_orderpriority",
        when(col("o_orderkey") % 13 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
      graft.ops.Profiling.profile(o,
        Seq("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority"))
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderstatus, o_orderdate,
        CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
        FROM orders)
      SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
        count(DISTINCT o_orderkey) AS n_distinct,
        min(o_orderkey)::VARCHAR AS min_value, max(o_orderkey)::VARCHAR AS max_value FROM o
      UNION ALL
      SELECT 'o_orderstatus', count(*),
        sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
        count(DISTINCT o_orderstatus),
        min(o_orderstatus), max(o_orderstatus) FROM o
      UNION ALL
      SELECT 'o_orderdate', count(*),
        sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT,
        count(DISTINCT o_orderdate),
        min(o_orderdate)::VARCHAR, max(o_orderdate)::VARCHAR FROM o
      UNION ALL
      SELECT 'o_orderpriority', count(*),
        sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
        count(DISTINCT o_orderpriority),
        min(o_orderpriority), max(o_orderpriority) FROM o"""))

  /** [[profileQ]]'s approximate twin: `approxDistinct = Some(rsd)` swaps
    * the exact count(distinct) — and its row×column Expand, the measured
    * 10×-at-100× exactness price (SCALE.md §15.2) — for HyperLogLog++.
    * The oracle pins everything that stays EXACT in approx mode
    * (n_rows/nulls/min/max per column); the HLL estimate itself is
    * engine-specific, so it is excluded here and pinned by a tolerance
    * test in PipelineOpsSpec instead.
    */
  private val profileApproxQ = Q("q_profile_approx",
    (s, dir) => {
      val o = t(s, dir, "orders").withColumn("o_orderpriority",
        when(col("o_orderkey") % 13 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
      graft.ops.Profiling.profile(o,
          Seq("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority"),
          approxDistinct = Some(0.05))
        .drop("n_distinct")
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderstatus, o_orderdate,
        CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
        FROM orders)
      SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
        min(o_orderkey)::VARCHAR AS min_value, max(o_orderkey)::VARCHAR AS max_value FROM o
      UNION ALL
      SELECT 'o_orderstatus', count(*),
        sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
        min(o_orderstatus), max(o_orderstatus) FROM o
      UNION ALL
      SELECT 'o_orderdate', count(*),
        sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT,
        min(o_orderdate)::VARCHAR, max(o_orderdate)::VARCHAR FROM o
      UNION ALL
      SELECT 'o_orderpriority', count(*),
        sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
        min(o_orderpriority), max(o_orderpriority) FROM o"""),
    bench = true)

  val queries: Seq[Q] = Seq(
    asof, rangeJoin,
    pack, packBpe, shardExport, sourceCap, targetMix, lineDedup, chunk, unigram, vocabOov, embQuant, embMeanPool, embMeanPoolW, embPq, tfidf,
    rollup, cube, pctile, heavyHitters, profileQ, profileApproxQ)
}
