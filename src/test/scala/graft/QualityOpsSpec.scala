package graft

import graft.ops.{Dedup, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operators: C4/Gopher corpus filters, substring-window dedup,
  * SemDeDup-style semantic dedup, BPE pair stats, temperature mixing.
  */
class QualityOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("c4Signals: sentence count, code/lorem markers, keep decision") {
    val docs = Seq(
      (0L, "First sentence here. Second one follows. And a third sentence."),
      (1L, "Code sample ahead {var x = 1;} with three. Sentences in. Total here."),
      (2L, "This text contains Lorem Ipsum filler. More words. Third sentence."),
      (3L, "Just one short sentence.")).toDF("doc_id", "text")
    val out = TextAnalysis.c4Signals(docs, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("c4_keep"))
    assert(out(1L).getAs[Boolean]("has_curly") && !out(1L).getAs[Boolean]("c4_keep"))
    assert(out(2L).getAs[Boolean]("has_lorem") && !out(2L).getAs[Boolean]("c4_keep"))
    assert(out(3L).getAs[Long]("n_sentences") == 1L && !out(3L).getAs[Boolean]("c4_keep"))
    assert(out(0L).getAs[Long]("n_sentences") == 3L)
  }

  test("ngramLmPerplexity: add-1 bigram LM scores match hand-computed probabilities") {
    // train "a b a c": bigram counts (a,b)=1 (b,a)=1 (a,c)=1; ctx sums a=2,
    // b=1; vocab {a,b,c} → V=3
    val train = Seq((0L, "a b a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),  // seen gram:   P = (1+1)/(2+3) = 0.4
      (2L, "z z"),  // unseen all:  P = (0+1)/(0+3) = 1/3
      (3L, "a")     // < n tokens → no grams → nulls
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmPerplexity(docs, "text", "doc_id", train, "text", n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // (doc_id, n_grams, logprob_sum_e6, avg_logprob, perplexity)
    assert(out(1L).getLong(1) == 1L)
    assert(out(1L).getLong(2) == math.round(math.log(0.4) * 1e6))
    assert(math.abs(out(1L).getDouble(3) - math.log(0.4)) < 1e-6)
    assert(math.abs(out(1L).getDouble(4) - 2.5) < 1e-5)
    assert(out(2L).getLong(2) == math.round(math.log(1.0 / 3) * 1e6))
    assert(math.abs(out(2L).getDouble(4) - 3.0) < 1e-5)
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(2) && out(3L).isNullAt(4))
  }

  test("ngramLmStupidBackoff: longest attested suffix wins, backoff " +
      "multiplies alpha per step, unigram floor is add-1") {
    // train "a b c" ×2 + "b c d": trigrams (a b c)=2, (b c d)=1;
    // bigrams (a b)=2, (b c)=3, (c d)=1; unigrams a=2 b=3 c=3 d=1;
    // N=9 tokens, V=4
    val train = Seq((0L, "a b c"), (3L, "a b c"), (6L, "b c d"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // full trigram attested: P = c3(a b c)/c2(a b) = 1
      (2L, "z b c"), // backoff 1: α · c2(b c)/c1(b) = 0.4 · 3/3
      (3L, "z z c"), // backoff 2: α² · (c1(c)+1)/(N+V) = 0.16 · 4/13
      (4L, "z z q")  // OOV floor: α² · (0+1)/13
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmStupidBackoff(docs, "text", "doc_id",
      train, "text", n = 3).collect().map(r => r.getLong(0) -> r).toMap
    def lp6(p: Double): Long = math.round(math.log(p) * 1e6)
    assert(out(1L).getLong(2) == lp6(2.0 / 2.0))
    assert(out(2L).getLong(2) ==
      math.round((math.log(0.4) + math.log(3.0 / 3.0)) * 1e6))
    assert(out(3L).getLong(2) ==
      math.round((2 * math.log(0.4) + math.log(4.0 / 13.0)) * 1e6))
    assert(out(4L).getLong(2) ==
      math.round((2 * math.log(0.4) + math.log(1.0 / 13.0)) * 1e6))
    // perplexity column follows the quantized mean
    assert(math.abs(out(1L).getDouble(4) - 1.0) < 1e-5)
  }

  test("ngramLmStupidBackoff: minCount prunes high orders but never the " +
      "unigram floor; pruned grams back off instead of scoring") {
    val train = Seq((0L, "a b c"), (3L, "a b c"), (6L, "b c d"))
      .toDF("doc_id", "text")
    val docs = Seq((1L, "b c d")).toDF("doc_id", "text")
    // minCount 2 prunes trigram (b c d)=1 and bigram (c d)=1 → the doc
    // gram backs off to the unigram floor: α²·(c1(d)+1)/(N+V) = 0.16·2/13
    val out = TextAnalysis.ngramLmStupidBackoff(docs, "text", "doc_id",
      train, "text", n = 3, minCount = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) ==
      math.round((2 * math.log(0.4) + math.log(2.0 / 13.0)) * 1e6))
  }

  test("ngramLmStupidBackoff: a document shorter than n scores at its " +
      "longest available order instead of null perplexity") {
    // same train corpus: bigram (b c)=3, c1(b)=3, c1(c)=3, N=9, V=4
    val train = Seq((0L, "a b c"), (3L, "a b c"), (6L, "b c d"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "b c"),  // 2 words < n=3: single bigram, attested → c2/c1,
                    // NO α charge for the order it doesn't have
      (2L, "z q"),  // 2 words, nothing attested → ONE backoff step to
                    // the unigram floor: α · (0+1)/13
      (3L, "c"),    // 1 word: straight add-1 unigram, zero backoff
      (4L, "")      // 0 words: still unscorable (n_grams 0, null ppl)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmStupidBackoff(docs, "text", "doc_id",
      train, "text", n = 3).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1L)
    assert(out(1L).getLong(2) == math.round(math.log(3.0 / 3.0) * 1e6))
    assert(out(2L).getLong(2) ==
      math.round((math.log(0.4) + math.log(1.0 / 13.0)) * 1e6))
    assert(out(3L).getLong(2) == math.round(math.log(4.0 / 13.0) * 1e6))
    assert(out(3L).getDouble(4) > 0)
    assert(out(4L).getLong(1) == 0L && out(4L).isNullAt(4))
  }

  test("ngramLmKneserNey: interpolated KN with hand-computed raw-top, " +
      "continuation-lower probabilities; unseen contexts pass through; " +
      "short docs enter at their own order") {
    // train "a b c" ×2 + "b c d" (n = 3, D = 0.75):
    //  c3: (a b c)=2, (b c d)=1; c2: (a b)=2 (b c)=3 (c d)=1
    //  N1+(ctx·): (a b)→1, (b c)→1
    //  cc2 (distinct preceding types): (b c)=1, (c d)=1;
    //    ccden2/tcc2: b→(1,1), c→(1,1)
    //  cc1: b=1 c=1 d=1; bigramTypes=3; V=4
    val train = Seq((0L, "a b c"), (3L, "a b c"), (6L, "b c d"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"), // full: 0.625 + 0.375·(0.25 + 0.75·(2/7))
      (2L, "z b c"), // unseen top ctx → pure lower: 0.25 + 0.75·(2/7)
      (3L, "z z q"), // everything unseen → unigram floor 1/7
      (4L, "b c"),   // short (2 < n): enters at order 2 — same as doc 2
      (5L, "c"),     // 1 word: P₁(c) = 2/7
      (6L, "")       // unscorable
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmKneserNey(docs, "text", "doc_id",
      train, "text", n = 3).collect().map(r => r.getLong(0) -> r).toMap
    def lp6(p: Double): Long = math.round(math.log(p) * 1e6)
    val lower = 0.25 + 0.75 * (2.0 / 7)
    assert(out(1L).getLong(2) == lp6(0.625 + 0.375 * lower))
    assert(out(2L).getLong(2) == lp6(lower))
    assert(out(3L).getLong(2) == lp6(1.0 / 7))
    assert(out(4L).getLong(1) == 1L && out(4L).getLong(2) == lp6(lower))
    assert(out(5L).getLong(2) == lp6(2.0 / 7))
    assert(out(6L).getLong(1) == 0L && out(6L).isNullAt(4))
    // perplexity follows the quantized mean
    assert(math.abs(out(3L).getDouble(4) - 7.0) < 1e-4)
  }

  test("ngramLmKneserNey: n = 2 (the documented minimum) works — the top " +
      "level's denominator is the order-1 RAW count table (ADVICE r18: the " +
      "shared raw-count map built over 2..n threw key-not-found: 1 here)") {
    // train "a b c" ×2 + "b c d": c1: a=2 b=3 c=3 d=1; c2: (a b)=2 (b c)=3
    // (c d)=1; N1+(ctx·): a→1 b→1 c→1; cc1: b=1 c=1 d=1 → bt=3, V=4
    val train = Seq((0L, "a b c"), (3L, "a b c"), (6L, "b c d"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"), // top: (2−0.75)/2 + 0.75·1/2 · P₁(b)=2/7
      (2L, "z q"), // unseen everywhere → unigram floor 1/7
      (3L, "c")    // short (1 word): P₁(c) = 2/7
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmKneserNey(docs, "text", "doc_id",
      train, "text", n = 2).collect().map(r => r.getLong(0) -> r).toMap
    def lp6(p: Double): Long = math.round(math.log(p) * 1e6)
    assert(out(1L).getLong(2) == lp6(0.625 + 0.375 * (2.0 / 7)))
    assert(out(2L).getLong(2) == lp6(1.0 / 7))
    assert(out(3L).getLong(2) == lp6(2.0 / 7))
  }

  test("scriptSignals: per-script codepoint counts, dominant with " +
      "declaration-order tie-break, none/empty handling") {
    val docs = Seq(
      (1L, "hello мир"), // 5 latin + 3 cyrillic + space
      (2L, "你好世界"), // 4 han
      (3L, "123 .,!"),                  // no script chars
      (4L, null.asInstanceOf[String]),
      (5L, "abбв")            // 2 latin vs 2 cyrillic: tie → latin
    ).toDF("doc_id", "text")
    val out = TextAnalysis.scriptSignals(docs, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_latin") == 5 &&
      out(1L).getAs[Int]("n_cyrillic") == 3)
    assert(out(1L).getAs[String]("dominant_script") == "latin")
    assert(math.abs(out(1L).getAs[Double]("script_frac") - 5.0 / 9) < 1e-12)
    assert(out(2L).getAs[Int]("n_han") == 4 &&
      out(2L).getAs[String]("dominant_script") == "han" &&
      out(2L).getAs[Double]("script_frac") == 1.0)
    assert(out(3L).getAs[String]("dominant_script") == "none" &&
      out(3L).getAs[Double]("script_frac") == 0.0)
    assert(out(4L).getAs[Int]("n_cp") == 0 &&
      out(4L).getAs[String]("dominant_script") == "none")
    assert(out(5L).getAs[String]("dominant_script") == "latin")
  }

  test("chunkDocuments: overlap windows cover the text exactly; short and " +
      "empty docs emit one chunk") {
    val docs = Seq(
      (1L, "a" * 10),       // len 10, max 8, ov 4 → chunks at 0..8, 4..10
      (2L, "b" * 4),        // at budget → one chunk
      (3L, ""),             // empty → one empty chunk
      (4L, null.asInstanceOf[String]),
      (5L, "0123456789abc") // len 13 → 3 chunks: 0-8, 4-12, 8-13
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "text", "doc_id", 8, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getString(3), r.getInt(4))).toMap
    assert(out((1L, 0)) == ((1, "a" * 8, 2)) && out((1L, 1)) == ((5, "a" * 6, 2)))
    assert(out((2L, 0)) == ((1, "bbbb", 1)))
    assert(out((3L, 0)) == ((1, "", 1)) && out((4L, 0)) == ((1, "", 1)))
    assert(out((5L, 0))._2 == "01234567" && out((5L, 1))._2 == "456789ab" &&
      out((5L, 2))._2 == "89abc")
    // coverage: concatenating each chunk's NON-overlapped prefix + the last
    // chunk reproduces the text
    val doc5 = Seq(out((5L, 0))._2.take(4), out((5L, 1))._2.take(4),
      out((5L, 2))._2).mkString
    assert(doc5 == "0123456789abc")
  }

  test("perplexityBuckets: per-group ntile thirds, nulls land in the tail") {
    val scored = Seq(
      (1L, "en", Some(2.0)), (2L, "en", Some(4.0)), (3L, "en", Some(8.0)),
      (4L, "en", Some(1.0)), (5L, "en", None), (6L, "en", Some(3.0)),
      (7L, "de", Some(9.0)), (8L, "de", Some(1.0))
    ).toDF("doc_id", "lang", "perplexity")
    val out = TextAnalysis.perplexityBuckets(scored, "perplexity", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // en order: 4(1.0) 1(2.0) | 6(3.0) 2(4.0) | 3(8.0) null(5) — 6 rows → 2/2/2
    assert(out(4L) == 1 && out(1L) == 1)
    assert(out(6L) == 2 && out(2L) == 2)
    assert(out(3L) == 3 && out(5L) == 3) // unscored doc lands in the tail
    // de: 2 rows over 3 buckets → leading buckets take them (ANSI ntile)
    assert(out(8L) == 1 && out(7L) == 2)
  }

  test("gopherSignals: word-count bounds and stopword evidence gate the keep flag") {
    val good = ("word " * 30 + "the cat sat on the mat with a hat and that was " +
      "quite enough of everything for one day indeed truly").trim
    val docs = Seq(
      (0L, good),                       // ~50 words, stopwords present
      (1L, "too few words here"),       // under the word floor
      (2L, ("xx " * 60).trim))          // 60 words but mean len 2, no stopwords
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherSignals(docs, "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("gopher_keep"))
    assert(!out(1L).getAs[Boolean]("gopher_keep"))
    assert(!out(2L).getAs[Boolean]("gopher_keep"))
    assert(out(2L).getAs[Double]("mean_word_len") == 2.0)
    assert(out(0L).getAs[Long]("req_stop_hits") >= 2L)
  }

  test("charPairStats: counts adjacent in-token character pairs") {
    val docs = Seq((0L, "abab abab"), (1L, "abc")).toDF("doc_id", "text")
    val out = TextAnalysis.charPairStats(docs, "text", topN = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abab" ×2 → pairs ab,ba,ab each; "abc" → ab,bc
    assert(out("ab") == 5L)
    assert(out("ba") == 2L)
    assert(out("bc") == 1L)
  }

  test("duplicateWindows: shared token spans across docs are caught, short docs yield none") {
    val span = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, s"unique preamble for zero $span trailing zero"),
      (1L, s"other document intro words $span different ending"),
      (2L, "short text without enough tokens"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateWindows(docs, "text", "doc_id", windowLen = 20, stride = 10)
      .collect()
    assert(out.nonEmpty, "30-token shared span must produce at least one shared window")
    assert(out.forall(_.getAs[Long]("n_docs") == 2L))
    assert(out.forall(_.getAs[Long]("first_doc") == 0L))
    // a window-less doc contributes nothing: only docs 0 and 1 appear
    val tiny = Dedup.duplicateWindows(
      Seq((9L, "short")).toDF("doc_id", "text"), "text", "doc_id")
    assert(tiny.collect().isEmpty)
  }

  test("semanticDedup: near-identical vectors in a cluster drop the higher id") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)),     // centroid A (id % 2 == 0)
      (1L, Seq(0.999, 0.01)),  // near-dup of 0 → dropped
      (2L, Seq(0.0, 1.0)),     // centroid B
      (3L, Seq(0.01, 0.999)),  // near-dup of 2 → dropped
      (5L, Seq(0.7, 0.714)))   // between clusters, far from both members
      .toDF("vec_id", "v")
    val out = Similarity.semanticDedup(vecs, "v", "vec_id", stride = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(0L).getAs[Boolean]("is_dropped"))
    assert(out(1L).getAs[Boolean]("is_dropped"))
    assert(!out(2L).getAs[Boolean]("is_dropped"))
    assert(out(3L).getAs[Boolean]("is_dropped"))
    assert(!out(5L).getAs[Boolean]("is_dropped"))
    assert(out(1L).getAs[Long]("cluster_id") == 0L)
    assert(out(3L).getAs[Long]("cluster_id") == 2L)
  }

  test("centroidSample: fixed budget, deterministic, reproducible selection") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val n = emb.count()
    val cent = Similarity.centroidSample(emb, "v", "vec_id", numCentroids = 32)
    val ids = cent.select("centroid_id").as[Long].collect().toSet
    // hash-mod with divisor n/32: expected ≈32 centroids, never corpus-sized
    assert(ids.nonEmpty && ids.size < n / 4, s"got ${ids.size} of $n")
    // deterministic: the same call selects the same set
    val ids2 = Similarity.centroidSample(emb, "v", "vec_id", 32)
      .select("centroid_id").as[Long].collect().toSet
    assert(ids == ids2)
    // budget larger than the corpus degenerates to every row (divisor 1)
    val all = Similarity.centroidSample(emb, "v", "vec_id", n.toInt * 2)
    assert(all.count() == n)
  }

  test("ivfAssignTwoLevel with superCount >= |C| equals the flat assignment") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val cent = emb.where(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("centroid_id"), col("v").as("centroid_vec"))
    val flat = Similarity.ivfAssignTo(emb, "v", "vec_id", cent)
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    val two = Similarity.ivfAssignTwoLevel(emb, "v", "vec_id", cent, superCount = 10000)
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(two == flat)
    // with a genuinely coarse super budget the result is still total and
    // deterministic: every vector assigned to exactly one real centroid
    val centIds = cent.select("centroid_id").as[Long].collect().toSet
    val coarse = Similarity.ivfAssignTwoLevel(emb, "v", "vec_id", cent, superCount = 2)
      .select("id", "cluster_id").as[(Long, Long)].collect()
    assert(coarse.length == emb.count())
    assert(coarse.map(_._2).forall(centIds.contains))
  }

  test("ivfTopKBudget: fixed-budget index returns ranked neighbors per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val out = Similarity.ivfTopKBudget(emb, "v", "vec_id", numCentroids = 16,
      col("id") % 100 === 0, k = 3).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rows =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.head == 1 && ranks.length <= 3)
      // no self-match
      rows.foreach(r => assert(r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))
    }
  }

  test("saltedJoin: result equals the plain join, hot key spreads over salts") {
    val big = (1L to 200L).map(i => (i, if (i <= 150) "hot" else s"k${i % 7}"))
      .toDF("row_id", "k")
    val small = Seq(("hot", 1), ("k1", 2), ("k2", 3), ("k3", 4)).toDF("k", "v")
    val salted = graft.ops.Joins.saltedJoin(big, small, "k", "row_id", salts = 4)
      .select("row_id", "k", "v")
    val plain = big.join(small, "k").select("row_id", "k", "v")
    assert(salted.collect().toSet == plain.collect().toSet)
    // the physical join keys include the salt column
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "join must key on the salt")
  }

  test("ivfTopKMultiprobe: probing more clusters never loses single-probe neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val single = Similarity.ivfTopK(emb, "v", "vec_id", 10, col("id") % 13 === 0, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.ivfTopKMultiprobe(emb, "v", "vec_id", 10, col("id") % 13 === 0,
      k = 3, nprobe = 3).collect()
    val multiPairs = multi.map(r => (r.getLong(0), r.getLong(1))).toSet
    // multiprobe ranks over a superset of candidates: its top-3 cosine per
    // query is >= single-probe's (compare via rank-1 score)
    val s1 = Similarity.ivfTopK(emb, "v", "vec_id", 10, col("id") % 13 === 0, k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val m1 = multi.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m1.keySet == s1.keySet)
    m1.foreach { case (q, c) => assert(c >= s1(q) - 1e-12, s"query $q lost recall") }
    assert(multiPairs.nonEmpty && single.nonEmpty)
  }

  test("minhashIncrementalCandidates: corpus-only pairs are not regenerated") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),  // corpus-internal dup
      (4L, "completely unrelated corpus content here")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),  // dup of corpus
      (3L, "fresh new batch document with novel text")).toDF("doc_id", "text")
    val out = Dedup.minhashIncrementalCandidates(corpus, batch, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // the corpus-internal (0,2) pair must NOT reappear
    assert(!out.exists(p => p._1 == 0L && p._2 == 2L))
    // the batch doc's duplicates against the corpus are found
    assert(out.contains((0L, 1L, true)) && out.contains((1L, 2L, false)))
  }

  test("simhashPairs: banding has exact recall for hamming < bands (pigeonhole)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val banded = graft.ops.Dedup.simhashPairs(docs, "text", "doc_id",
      bits = 64, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference: hamming over ALL signature pairs
    val sigs = graft.ops.Dedup.simhash(docs, "text", "doc_id", bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(banded == brute, s"banding lost ${brute.diff(banded).size} pairs / gained ${banded.diff(brute).size}")
    assert(brute.nonEmpty, "test corpus must contain near-identical docs")
  }

  test("lshPlan: picks the factorization whose inflection is nearest the threshold") {
    // 12 hashes: inflections are b12r1≈0.083, b6r2≈0.408, b4r3≈0.630,
    // b3r4≈0.760, b2r6≈0.891, b1r12=1.0
    val loose = Dedup.lshPlan(0.45, 12)
    assert(loose.bands == 6 && loose.rowsPerBand == 2)
    val default = Dedup.lshPlan(0.6, 12)
    assert(default.bands == 4 && default.rowsPerBand == 3) // the repo default
    val strict = Dedup.lshPlan(0.9, 12)
    assert(strict.bands == 2 && strict.rowsPerBand == 6)
    // S-curve sanity: monotone in s, ~0.5 at the inflection, steep around it
    val p = default
    assert(p.collisionProb(0.2) < 0.1)
    assert(math.abs(p.collisionProb(p.inflection) - 0.5) < 0.2)
    assert(p.collisionProb(0.95) > 0.97)
    assert(p.collisionProb(0.3) < p.collisionProb(0.7))
    intercept[IllegalArgumentException](Dedup.lshPlan(1.0))
  }

  test("pairRecall: fraction of reference pairs present in the candidate set") {
    val ref = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val cand = Seq((1L, 2L), (5L, 6L), (9L, 10L)).toDF("id_a", "id_b")
    val r = Dedup.pairRecall(ref, cand).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getDouble(2) == 0.5)
    val empty = Dedup.pairRecall(ref, cand.where(lit(false))).collect().head
    assert(empty.getLong(1) == 0L && empty.getDouble(2) == 0.0)
  }

  test("curate: gates, canonical selection, and redaction compose in one pass") {
    val docs = Seq(
      (1L, "Good document one. With several sentences. And an email a@b.co here."),
      (2L, "Good document one. With several sentences. And an email a@b.co here."), // dup
      (3L, "Code fragment {x} here. Two sentences. Three total ones."),             // curly
      (4L, "Repeat me\nRepeat me\nRepeat me\nOk line. Two. Three."))                // repetition
      .toDF("doc_id", "text")
    val out = graft.ops.Curation.curate(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("curate_keep"))
    assert(!out(2L).getAs[Boolean]("is_canonical") && !out(2L).getAs[Boolean]("curate_keep"))
    assert(!out(3L).getAs[Boolean]("curate_keep"))
    assert(out(4L).getAs[Double]("dup_line_frac") > 0.3 && !out(4L).getAs[Boolean]("curate_keep"))
    assert(out(1L).getAs[String]("redacted_text").contains("<EMAIL>"))
  }

  test("curateNearDup: near-copies collapse to one canonical, gates still apply") {
    // docs 1-3 are near-duplicates (one word varies in a long shared text);
    // doc 4 is unrelated and keepable; doc 5 is a near-dup of 1-3 but gated
    // out by a curly brace — verdicts and gates are independent axes
    val base = (1 to 30).map(i => s"shared sentence number $i.").mkString(" ")
    val docs = Seq(
      (1L, s"$base Tail alpha."),
      (2L, s"$base Tail beta."),
      (3L, s"$base Tail gamma."),
      (4L, "A fully different document. With several sentences. And a third one."),
      (5L, s"$base Tail delta {x}."))
      .toDF("doc_id", "text")
    val out = graft.ops.Curation.curateNearDup(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 5)
    // 1,2,3,5 share nearly all shingles → one cluster labeled by min id 1
    Seq(1L, 2L, 3L, 5L).foreach { id =>
      assert(out(id).getAs[Long]("cluster") == 1L, s"doc $id not in cluster 1") }
    assert(out(4L).getAs[Long]("cluster") == 4L)
    assert(out(1L).getAs[Boolean]("is_canonical") && out(1L).getAs[Boolean]("curate_keep"))
    Seq(2L, 3L, 5L).foreach { id => assert(!out(id).getAs[Boolean]("curate_keep")) }
    assert(out(4L).getAs[Boolean]("curate_keep"))
    // gate failure is reported independently of dedup verdicts
    assert(!out(5L).getAs[Boolean]("c4_keep"))
  }

  test("curateDecontaminated: docs differing only in the contaminated span collapse") {
    // docs 10/11 share identical boilerplate but quote DIFFERENT parts of
    // the probe; once the quoted spans are excised their cleaned text is
    // identical → exact dedup collapses them (min id canonical). Doc 12 is
    // distinct and keepable; gates read the ORIGINAL punctuation.
    val body = (1 to 12).map(i => s"boilerplate sentence number $i.").mkString(" ")
    val probes = Seq((1L, "secret question one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (10L, s"$body secret question one two three four five"),
      (11L, s"$body four five six seven eight"),
      (12L, "A fully different document. With several sentences. And a third one."))
      .toDF("doc_id", "text")
    val out = graft.ops.Curation.curateDecontaminated(
      docs, "text", "doc_id", probes, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 3)
    assert(out(10L).getAs[Long]("n_removed") == 7L) // quoted 7 probe tokens
    assert(out(11L).getAs[Long]("n_removed") == 5L) // quoted 5 probe tokens
    assert(out(12L).getAs[Long]("n_removed") == 0L)
    // cleaned 10 and 11 are byte-identical → 10 is canonical, 11 is not
    assert(out(10L).getAs[String]("clean_text") == out(11L).getAs[String]("clean_text"))
    assert(out(10L).getAs[Boolean]("is_canonical") && out(10L).getAs[Boolean]("curate_keep"))
    assert(!out(11L).getAs[Boolean]("is_canonical") && !out(11L).getAs[Boolean]("curate_keep"))
    assert(out(12L).getAs[Boolean]("curate_keep"))
  }

  test("dedupCorpusBy: highest-priority member kept, cluster label stays min id") {
    val base = (1 to 30).map(i => s"shared sentence number $i.").mkString(" ")
    val docs = Seq(
      (1L, s"$base Tail alpha.", 10.0),
      (2L, s"$base Tail beta.", 99.0),   // highest priority in the cluster
      (3L, s"$base Tail gamma.", 99.0),  // tie → smaller id (2) wins
      (4L, "A different document entirely. Second sentence. Third.", 1.0))
      .toDF("doc_id", "text", "score")
    val out = graft.ops.Dedup.dedupCorpusBy(docs, "text", "doc_id", "score")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    Seq(1L, 2L, 3L).foreach { id => assert(out(id)._1 == 1L) } // label = min id
    assert(!out(1L)._2 && out(2L)._2 && !out(3L)._2, s"got $out")
    assert(out(4L) == (4L, true))

    // all-null priorities: the cluster must still keep exactly one
    // representative (nulls rank lowest, not excluded) — min id wins
    val nulls = docs.withColumn("score", lit(null).cast("double"))
    val out2 = graft.ops.Dedup.dedupCorpusBy(nulls, "text", "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out2 == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true), s"got $out2")
  }

  test("canonicalizeUrl: the crawl dedup key — case, default ports, dot " +
      "segments, escape spelling, fragments, bare '?', malformed escapes") {
    import spark.implicits._
    val cases = Seq(
      // case + default port + dot segments + escape normalization + fragment
      (1L, "HTTP://ExAmPle.CoM:80/a/./b/../c%2fd%41?z=1&a=2#frag",
        "http://example.com/a/c%2FdA?z=1&a=2"),
      // duplicate slashes collapse, trailing slash preserved, 443 dropped
      (2L, "https://Host.Org:443//x//y/", "https://host.org/x/y/"),
      // non-default port kept
      (3L, "https://host.org:8443/p", "https://host.org:8443/p"),
      // empty path becomes '/'
      (4L, "http://h.io", "http://h.io/"),
      // '..' above root ignored per RFC
      (5L, "http://h.io/../..", "http://h.io/"),
      // bare '?' dropped
      (6L, "http://h.io/p?", "http://h.io/p"),
      // unreserved escapes decode (%7E → ~, %4A → J); malformed %zz literal;
      // userinfo case preserved while host lowers
      (7L, "http://User@H.Io/%7e%4a%zz", "http://User@h.io/~J%zz"),
      // an escaped dot-dot resolves like the '..' it decodes to
      (8L, "http://h.io/x/%2e%2e/b", "http://h.io/b"),
      (9L, "not a url", null),
      // ports compare NUMERICALLY: ':080' IS the default port; a bare ':'
      // (empty port) is stripped; non-default ports lose leading zeros
      (10L, "http://h.io:080/p", "http://h.io/p"),
      (11L, "http://h.io:/p", "http://h.io/p"),
      (12L, "https://h.io:08443/p", "https://h.io:8443/p"))
    val out = graft.ops.TextAnalysis.canonicalizeUrl(
      cases.map(c => (c._1, c._2)).toDF("id", "url"), "url")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("url_canonical")).toMap
    cases.foreach { case (id, url, want) =>
      assert(out(id) == want, s"url $id: $url → ${out(id)}, want $want")
    }
    // sortQuery: parameter order stops mattering for the dedup key
    val sorted = graft.ops.TextAnalysis.canonicalizeUrl(
      Seq((1L, "http://h.io/p?z=1&a=%7e")).toDF("id", "url"), "url",
      sortQuery = true).collect().head.getAs[String]("url_canonical")
    assert(sorted == "http://h.io/p?a=~&z=1")
  }

  test("urlSignals: host/domain/tld/path-depth/query extraction edge cases") {
    val rows = Seq(
      (1L, "https://Sub.News.Example.org/a/b/c?x=1"),
      (2L, "http://example.com"),           // no path
      (3L, "https://localhost/x"),          // single-label host: no domain/tld
      (4L, "ftp://files.example.net/d/"))
      .toDF("id", "url")
    val out = graft.ops.TextAnalysis.urlSignals(rows, "url")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("url_host") == "sub.news.example.org")
    assert(out(1L).getAs[String]("url_domain") == "example.org")
    assert(out(1L).getAs[String]("url_tld") == "org")
    assert(out(1L).getAs[Int]("url_path_depth") == 3)
    assert(out(1L).getAs[Boolean]("url_has_query"))
    assert(out(2L).getAs[Int]("url_path_depth") == 0 && !out(2L).getAs[Boolean]("url_has_query"))
    assert(out(3L).getAs[String]("url_domain") == "" && out(3L).getAs[String]("url_tld") == "")
    assert(out(4L).getAs[String]("url_domain") == "example.net")
    assert(out(4L).getAs[Int]("url_path_depth") == 1)
  }

  test("filterBlockedDomains: case-insensitive, preserves input columns only") {
    val rows = Seq(
      (1L, "https://spam.BadSite.com/x"),
      (2L, "https://news.example.org/y"),
      (3L, "https://badsite.com/z"))
      .toDF("id", "url")
    val kept = graft.ops.TextAnalysis.filterBlockedDomains(rows, "url", Seq("BADSITE.COM"))
    assert(kept.columns.toSeq == Seq("id", "url"))
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("urlSignals public-suffix overload: ccSLD, bare suffix, fallback, fragment '?'") {
    val rows = Seq(
      (1L, "https://www.example.co.uk/p#sec?a"), // ccSLD + '?' only in fragment
      (2L, "https://sub.example.com/p?q=1"),
      (3L, "https://co.uk/"),                    // host IS a public suffix
      (4L, "https://foo.internal/x"))            // no suffix match → approximation
      .toDF("id", "url")
    val out = graft.ops.TextAnalysis.urlSignals(rows, "url", Seq("uk", "co.uk", "com"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // longest suffix wins: co.uk beats uk
    assert(out(1L).getAs[String]("url_domain") == "example.co.uk")
    assert(out(2L).getAs[String]("url_domain") == "example.com")
    assert(out(3L).getAs[String]("url_domain") == "co.uk")
    assert(out(4L).getAs[String]("url_domain") == "foo.internal")
    // '?' inside the fragment is NOT a query string
    assert(!out(1L).getAs[Boolean]("url_has_query"))
    assert(out(2L).getAs[Boolean]("url_has_query"))
  }

  test("filterBlockedDomains with public suffixes blocks the registered domain, not the ccSLD") {
    val rows = Seq(
      (1L, "https://www.spam.co.uk/x"),
      (2L, "https://www.fine.co.uk/y"),
      (3L, "https://spam.com/z"))
      .toDF("id", "url")
    val kept = graft.ops.TextAnalysis.filterBlockedDomains(rows, "url",
      Seq("spam.co.uk"), publicSuffixes = Seq("co.uk", "com", "uk"))
    // with the two-label approximation both .co.uk rows would report
    // domain co.uk and neither (or both) could be blocked correctly
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("dedupCorpusBy: tie-break stays exact for ids above 2^53") {
    // two identical docs whose huge adjacent ids collapse to the SAME
    // double (Long.MaxValue-1 and -2 both round to 2^63) — a double-cast
    // tie-break cannot tell them apart; the contract (equal priority →
    // smallest id kept) must still hold
    val a = Long.MaxValue - 1
    val b = Long.MaxValue - 2
    assert(a.toDouble == b.toDouble) // the collapse this test pins
    val docs = Seq(
      (a, "shared duplicate body text words here", 10),
      (b, "shared duplicate body text words here", 10),
      (7L, "completely different vocabulary elsewhere", 1))
      .toDF("doc_id", "text", "pr")
    val out = graft.ops.Dedup.dedupCorpusBy(docs, "text", "doc_id", "pr")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(b) && !out(a), s"smallest id must win the tie: $out")
    assert(out(7L))
  }

  test("fuzzyContamination: exact and near copies of probes flag, unrelated do not") {
    val bench = (1 to 30).map(i => s"benchmark question number $i?").mkString(" ")
    val corpus = Seq(
      (1L, bench),                       // verbatim benchmark leak
      (2L, s"$bench Prefixed by a tiny edit."), // near-copy leak
      (3L, "A fully unrelated training document about something else."))
      .toDF("doc_id", "text")
    val probes = Seq((100L, bench)).toDF("pid", "ptext")
    val out = graft.ops.Dedup.fuzzyContamination(
        corpus, "text", "doc_id", probes, "ptext", "pid")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false), s"got $out")
  }

  test("weightedSample: clamped per-row probability, deterministic") {
    val rows = (1L to 200L).map(i => (i, i.toDouble / 100.0)).toDF("id", "p")
    val none = graft.ops.Sampling.weightedSample(rows, "id", lit(0.0))
    assert(none.count() == 0)
    val all = graft.ops.Sampling.weightedSample(rows, "id", lit(5.0)) // clamps to 1
    assert(all.count() == 200)
    val some = graft.ops.Sampling.weightedSample(rows, "id", col("p"))
    val ids = some.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < 200)
    // rows with p >= 1 always kept; repeat run returns the identical set
    assert((100L to 200L).forall(ids.contains))
    val again = graft.ops.Sampling.weightedSample(rows, "id", col("p"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("temperatureWeights: alpha<1 upsamples the low-resource group") {
    val docs = (1 to 40).map(i => (i.toLong, if (i <= 36) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureWeights(docs, "lang", alpha = 0.5, budget = 100L)
      .collect().map(r => r.getString(0) -> r).toMap
    // counts 36 vs 4 (9:1); sqrt → 6 vs 2 (3:1): de's share triples
    assert(out("en").getAs[Double]("weight") == 0.75)
    assert(out("de").getAs[Double]("weight") == 0.25)
    assert(out("en").getAs[Long]("target_docs") == 75L)
    assert(out("de").getAs[Long]("target_docs") == 25L)
  }

  test("spanContamination: contiguous matching grams collapse to maximal spans") {
    // probe 1: "one two three four five six" → doc 10 contains it verbatim
    // (two gram starts → ONE span of 6 tokens), plus a separate single-gram
    // match later in the doc (its own span)
    val probes = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "zz one two three four five six yy aa bb one two three four five qq"),
      (11L, "no overlap with anything here at all today")).toDF("doc_id", "text")
    val out = TextAnalysis.spanContamination(docs, "text", "doc_id",
      probes, "text", "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // doc 10 tokens: zz one two three four five six yy aa bb one two three four five qq
    //               1   2   3    4    5    6   7   8  9  10  11  12  13   14   15  16
    // probe grams: "one two three four five" (start 2 and 11), "two three four five six" (start 3)
    // islands: starts {2,3} → span_start 2, span_tokens 3-2+5=6, n_grams 2
    //          start {11}  → span_start 11, span_tokens 5, n_grams 1
    assert(out == Set((10L, 1L, 2L, 6L, 2L), (10L, 1L, 11L, 5L, 1L)))
  }

  test("spanContamination: doc shorter than k or with scattered matches") {
    val probes = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "tiny doc"),                                    // < k tokens: no grams
      (11L, "alpha beta gamma delta epsilon"))              // exact probe copy
      .toDF("doc_id", "text")
    val out = TextAnalysis.spanContamination(docs, "text", "doc_id",
      probes, "text", "doc_id", k = 5).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 11L && r.getLong(2) == 1L && r.getLong(3) == 5L
      && r.getLong(4) == 1L)
  }

  test("exciseSpans: flagged token spans are cut, untouched docs pass through") {
    val probes = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "zz one two three four five six yy aa bb one two three four five qq"),
      (11L, "Nothing shared HERE at all today with anyone involved")).toDF("doc_id", "text")
    val spans = TextAnalysis.spanContamination(docs, "text", "doc_id",
      probes, "text", "doc_id", k = 5)
    val out = TextAnalysis.exciseSpans(docs, "text", "doc_id", spans)
      .select("doc_id", "clean_text", "n_removed").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 10: span tokens 2-7 (6 toks) and 11-15 (5 toks) removed → 5 left
    assert(out(10L) == (("zz yy aa bb qq", 11L)))
    // doc 11 untouched; output is the token-normalized (lowercased) image
    assert(out(11L) == (("nothing shared here at all today with anyone involved", 0L)))
  }

  test("exciseSpans: overlapping spans from different probes union; full excision empties") {
    val probes = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val docs = Seq((10L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val spans = TextAnalysis.spanContamination(docs, "text", "doc_id",
      probes, "text", "doc_id", k = 5)
    val out = TextAnalysis.exciseSpans(docs, "text", "doc_id", spans)
      .select("doc_id", "clean_text", "n_removed").collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "" && out.head.getLong(2) == 7L)
  }

  test("boilerplateSpans + removeBoilerplate: the shared footer is cut from " +
      "every carrier, unique text survives, df at the threshold stays") {
    // footer "visit our cookie policy page" repeats in 3 docs (df 3 > 2);
    // "shared pair phrase" sits in exactly 2 docs (df 2 = threshold, stays)
    val docs = Seq(
      (0L, "unique alpha words visit our cookie policy page tail zero"),
      (1L, "different beta content visit our cookie policy page shared pair phrase"),
      (2L, "visit our cookie policy page gamma middle shared pair phrase ending"),
      (3L, "entirely fresh document nothing repeated here at all")).toDF("doc_id", "text")
    val spans = TextAnalysis.boilerplateSpans(docs, "text", "doc_id",
      k = 3, maxDocFreq = 2)
    val byDoc = spans.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "visit our cookie policy page" = 5 tokens: 3 grams starting at the
    // phrase start, span_tokens = 5
    assert(byDoc(0L) == (4L, 5L))
    assert(byDoc(1L) == (4L, 5L))
    assert(byDoc(2L) == (1L, 5L))
    assert(!byDoc.contains(3L))
    val out = TextAnalysis.removeBoilerplate(docs, "text", "doc_id",
      k = 3, maxDocFreq = 2)
      .select("doc_id", "clean_text", "n_removed").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) == ("unique alpha words tail zero", 5L))
    assert(out(1L) == ("different beta content shared pair phrase", 5L))
    assert(out(2L) == ("gamma middle shared pair phrase ending", 5L))
    assert(out(3L) == ("entirely fresh document nothing repeated here at all", 0L))
  }

  test("repairMojibakeLatin1: UTF-8-as-Latin-1 double-decode reverses; " +
      "clean, non-Latin-1 and false-positive texts stand") {
    val docs = Seq(
      (0L, "cafÃ© au lait"), // "café" mis-decoded: Ã©
      (1L, "perfectly clean ascii text"),
      (2L, "Ã without a continuation byte"), // marker but invalid UTF-8 bytes
      (3L, "日本語 text with Ã marker"), // > 0xFF: not Latin-1-expressible
      (4L, null: String)).toDF("doc_id", "text")
    val out = TextAnalysis.repairMojibakeLatin1(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[String]("repaired_text") == "café au lait")
    assert(out(0L).getAs[Boolean]("was_repaired"))
    assert(out(0L).getAs[Long]("mojibake_marks") == 1L)
    assert(out(1L).getAs[String]("repaired_text") == "perfectly clean ascii text")
    assert(!out(1L).getAs[Boolean]("was_repaired"))
    assert(out(2L).getAs[String]("repaired_text") == "Ã without a continuation byte")
    assert(!out(2L).getAs[Boolean]("was_repaired"))
    assert(out(3L).getAs[String]("repaired_text") == "日本語 text with Ã marker")
    assert(!out(3L).getAs[Boolean]("was_repaired"))
    assert(out(4L).isNullAt(out(4L).fieldIndex("repaired_text")))
    assert(!out(4L).getAs[Boolean]("was_repaired"))
  }

  test("repairMojibakeCp1252: the smart-quote family needs the cp1252 " +
      "table and the kernel fixes it") {
    // "it’s “quoted”" mis-decoded as cp1252: ’ = â€™, “ = â€œ, ” = â€
    val docs = Seq(
      (0L, "itâ€™s â€œquotedâ€"),
      (1L, "nothing wrong here")).toDF("doc_id", "text")
    val out = TextAnalysis.repairMojibakeCp1252(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[String]("repaired_text") == "it’s “quoted”")
    assert(out(0L).getAs[Boolean]("was_repaired"))
    assert(out(1L).getAs[String]("repaired_text") == "nothing wrong here")
    assert(!out(1L).getAs[Boolean]("was_repaired"))
  }

  test("normalizeText: NFC composes, control chars strip, whitespace collapses") {
    val docs = Seq(
      (0L, "café time"),                      // e + combining acute → é
      (1L, "a\u0000b\u0007c\tkeep\ttabs?"),         // C0 strip, tab collapses
      (2L, "  spaced   out\t \twords  "),
      (3L, "p1\n\n\n\n\np2\n\np3"),                 // 5 newlines → one break
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeText(docs, "text")
      .select("doc_id", "norm_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "café time" && out(0L).length == 9)
    assert(out(1L) == "abc keep tabs?")
    assert(out(2L) == "spaced out words")
    assert(out(3L) == "p1\n\np2\n\np3")
    assert(out(4L) == "")
  }

  test("hashedLinearScore: empty text scores the bias; kernel twin is value-identical") {
    val w = TextAnalysis.hashedWeights(32, seed = 7)
    assert(w.forall(x => x >= -1.0 && x <= 1.0))
    assert(w == TextAnalysis.hashedWeights(32, seed = 7)) // deterministic
    assert(w != TextAnalysis.hashedWeights(32, seed = 8))
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, ""),
      (2L, "   "),
      (3L, "Mixed CASE text, with punct!!! and numbers 123 456"),
      (4L, "the the the the")).toDF("doc_id", "text")
    val declared = TextAnalysis.hashedLinearScore(docs, "text", w, bias = 0.25)
      .select("doc_id", "quality_logit", "quality_prob").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // empty / whitespace-only text has zero tokens → logit == bias
    assert(declared(1L)._1 == 0.25 && declared(2L)._1 == 0.25)
    // sigmoid output stays in (0, 1) and respects the rounded logit
    assert(declared.values.forall { case (_, p) => p > 0.0 && p < 1.0 })
    // a doc repeating one token scores exactly bias + w[h(tok) % d] —
    // expectation computed with raw MessageDigest, independent of BOTH
    // implementations under test
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"s${TextAnalysis.FeatureSeed}:the".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val tokW = w((java.lang.Long.parseLong(hex, 16) % 32).toInt)
    assert(math.abs(declared(4L)._1 - BigDecimal(0.25 + tokW)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val kernel = TextAnalysis.hashedLinearScoreKernel(docs, "text", w, bias = 0.25)
      .select("doc_id", "quality_logit", "quality_prob").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(kernel == declared)
  }

  test("trainHashedLinear: full-batch GD separates the classes, matches " +
      "the hand-derived scalar recurrence, and the trained vector " +
      "round-trips into BOTH inference twins") {
    // class-pure two-token docs: within a class every row shares one
    // logit, so the three full-batch updates collapse to the scalar
    // recurrences wg += lr·g·(1−σ(wg))/(2n), wb −= lr·b·σ(wb)/(2n) —
    // computed HERE independently of the trainer
    val train = (0 until 40).map(i =>
      (if (i % 2 == 0) "good great" else "bad awful",
        if (i % 2 == 0) 1.0 else 0.0)) ++
      Seq((null.asInstanceOf[String], 1.0), ("   ", 0.0)) // skipped rows
    val df = train.toDF("text", "label")
    val dim = 1 << 18
    val w = TextAnalysis.trainHashedLinear(df, "text", "label",
      dim = dim, epochs = 3, lr = 1.0)
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    var (wg, wb) = (0.0, 0.0)
    for (_ <- 0 until 3) {
      val ng = wg + 20.0 * (1 - sig(wg)) / (2 * 40.0)
      val nb = wb - 20.0 * sig(wb) / (2 * 40.0)
      wg = ng; wb = nb
    }
    def h(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s${TextAnalysis.FeatureSeed}:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % dim).toInt
    }
    for (tok <- Seq("good", "great"))
      assert(math.abs(w(h(tok)) - wg) < 1e-12, tok)
    for (tok <- Seq("bad", "awful"))
      assert(math.abs(w(h(tok)) - wb) < 1e-12, tok)
    assert(wg > 0 && wb < 0) // the gate separates
    // every untouched weight stays exactly zero
    assert(w.count(_ != 0.0) == 4)
    // round-trip through both inference twins
    val probes = Seq((0L, "good great"), (1L, "bad awful")).toDF("doc_id", "text")
    val viaDecl = TextAnalysis.hashedLinearScore(probes, "text", w.toIndexedSeq)
      .select("doc_id", "quality_prob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaKern = TextAnalysis.hashedLinearScoreKernel(probes, "text", w.toIndexedSeq)
      .select("doc_id", "quality_prob").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaDecl == viaKern)
    assert(viaDecl(0L) > 0.5 && viaDecl(1L) < 0.5)
  }

  test("evalBinaryClassifier: hand-computed confusion metrics and " +
      "tie-aware AUC; degenerate inputs go null, never divide-by-zero") {
    // scores: 0.9 (2 pos), 0.7 (1 pos, 1 neg — a TIE), 0.2 (2 neg)
    // ranks (avg on ties): 0.2 → 1.5, 0.7 → 3.5, 0.9 → 5.5
    // posrank = 5.5 + 5.5 + 3.5 = 14.5; g = 3, b = 3
    // AUC = (14.5 − 3·4/2) / 9 = 8.5/9 = 0.944444…
    // at 0.5: tp = 3, fp = 1 → acc 5/6, prec 3/4, rec 1, f1 6/7
    val df = Seq(
      (0.9, 1.0), (0.9, 1.0), (0.7, 1.0), (0.7, 0.0), (0.2, 0.0), (0.2, 0.0))
      .toDF("p", "y")
    val m = TextAnalysis.evalBinaryClassifier(df, "p", "y").collect().head
    assert(m.getAs[Long]("n") == 6 && m.getAs[Long]("n_pos") == 3)
    assert(m.getAs[Double]("accuracy") == 0.833333)
    assert(m.getAs[Double]("precision") == 0.75)
    assert(m.getAs[Double]("recall") == 1.0)
    assert(m.getAs[Double]("f1") == 0.857143)
    assert(m.getAs[Double]("auc") == 0.944444)
    // nothing predicted positive → precision/f1 null, auc still defined
    val low = TextAnalysis.evalBinaryClassifier(
      Seq((0.1, 1.0), (0.2, 0.0)).toDF("p", "y"), "p", "y").collect().head
    assert(low.isNullAt(low.fieldIndex("precision")))
    assert(low.isNullAt(low.fieldIndex("f1")))
    assert(low.getAs[Double]("auc") == 0.0) // the positive ranks BELOW the negative
    // one-class input → auc null
    val oneClass = TextAnalysis.evalBinaryClassifier(
      Seq((0.9, 1.0), (0.1, 1.0)).toDF("p", "y"), "p", "y").collect().head
    assert(oneClass.isNullAt(oneClass.fieldIndex("auc")))
    assert(oneClass.getAs[Double]("recall") == 0.5)
  }

  test("bigramLogProb: seen bigrams use MLE, unseen back off, short docs drop") {
    val train = Seq((100L, "the cat sat"), (101L, "the cat ran")).toDF("doc_id", "text")
    val score = Seq(
      (0L, "the cat sat"),  // both bigrams seen: avg(ln 1, ln 1/2)
      (1L, "the dog sat"),  // both unseen: backoff on dog (c=0) and sat (c=1)
      (2L, "zz qq"),        // fully out-of-vocabulary: pure smoothed backoff
      (3L, "solo")          // one token: no bigram, absent from output
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(score, "text", "doc_id", train, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // expectations hand-computed from the stupid-backoff formula
    // (N=6 train tokens, V=4 vocab, alpha=0.4), through the micro-nat
    // quantization: per-bigram round(ln(p)*1e6) summed, / (n*1e6)
    def q(ps: Double*): Double =
      ps.map(p => math.round(math.log(p) * 1e6)).sum.toDouble / (ps.length * 1e6)
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out(0L) == ((2L, q(1.0, 0.5))))        // avg(ln 2/2, ln 1/2)
    assert(out(1L) == ((2L, q(0.04, 0.08))))      // avg(ln .4*1/10, ln .4*2/10)
    assert(out(2L) == ((1L, q(0.04))))            // ln .4*1/10
  }

  test("importanceWeights: target-like docs outweigh off-domain; features = uni+bi") {
    val target = Seq((100L, "the cat sat on the mat"),
      (101L, "a cat and a dog")).toDF("doc_id", "text")
    val raw = Seq(
      (0L, "the cat sat"),              // target-like
      (1L, "quantum flux capacitor"),   // off-domain
      (2L, ""),                         // zero tokens: absent from output
      (3L, "the cat sat")               // identical text ⇒ identical weight
    ).toDF("doc_id", "text")
    val out = Sampling.importanceWeights(raw, "text", "doc_id", target, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(0L, 1L, 3L))
    // 3 unigrams + 2 bigrams
    assert(out(0L)._1 == 5L && out(1L)._1 == 5L)
    assert(out(0L)._2 > out(1L)._2)
    assert(out(0L) == out(3L)) // deterministic: same text, same weight
  }

  test("bm25TopK: term-match retrieval, self excluded, rare terms outweigh common") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana banana banana"),
      (4L, "durian elderberry fig"),
      (5L, "apple apple apple apple")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "text", "doc_id",
      docs.where(col("doc_id") === 1), "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // query "apple banana apple": self (1) excluded; 4 shares no term
    assert(out.map(_._2).toSet == Set(2L, 3L, 5L))
    assert(out.forall(_._1 == 1L) && out.forall(_._3 > 0.0))
    // ranks are 1..3 and ordered by score desc
    assert(out.sortBy(_._4).map(_._4).toSeq == Seq(1, 2, 3))
    val byRank = out.sortBy(_._4).map(_._3)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }
}
