package graft

import graft.ops.{Dedup, Embeddings, Joins, Packing, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 pipeline operators: as-of join, point-in-interval range join,
  * sequence packing, per-group caps, corpus-level line dedup, unigram
  * surprisal, embedding quantization.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------ as-of join

  test("asof join: last prior match per key, inclusive ties, null when none") {
    val left = Seq(
      (1L, 10L, 100L), // key 10, ts 100
      (2L, 10L, 205L),
      (3L, 10L, 300L),
      (4L, 20L, 150L), // key 20: no right rows at all
      (5L, 10L, 50L)   // before every right row
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, 100L), // ties left row 1's ts exactly → inclusive match
      (102L, 10L, 100L), // same ts: greatest id wins
      (103L, 10L, 210L)
    ).toDF("event_id", "user_id", "ts")

    val out = Joins.asofLastPrior(left, "event_id", "ts", right, "event_id", "ts",
        Seq("user_id"), "m")
      .select("event_id", "m").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

    assert(out(1L) == Some(102L)) // inclusive tie, max right id
    assert(out(2L) == Some(102L)) // 103 at ts 210 is later than 205
    assert(out(3L) == Some(103L))
    assert(out(4L) == None)       // key with no right rows
    assert(out(5L) == None)       // left ts before all right ts
  }

  // ------------------------------------------------- point-in-interval join

  test("range join: lo inclusive, hi exclusive, multi-bucket spans, empty intervals") {
    val intervals = Seq(
      (1L, 10L, 30L),  // spans buckets 1,2 at width 10
      (2L, 25L, 26L),  // single-point-wide
      (3L, 40L, 40L)   // empty: matches nothing
    ).toDF("iv_id", "lo", "hi")
    val points = Seq(9L, 10L, 25L, 29L, 30L, 40L).toDF("p")

    val out = Joins.pointInInterval(points, "p", intervals, "lo", "hi", 10L)
      .select("iv_id", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(out == Set((1L, 10L), (1L, 25L), (1L, 29L), (2L, 25L)))
    // specifically: 9 < lo, 30 = hi excluded, empty interval 3 matches nothing
  }

  test("range join: no duplicate pairs when an interval spans many buckets") {
    val intervals = Seq((1L, 0L, 100L)).toDF("iv_id", "lo", "hi")
    val points = Seq(5L, 50L, 99L).toDF("p")
    val rows = Joins.pointInInterval(points, "p", intervals, "lo", "hi", 10L).count()
    assert(rows == 3) // each point matches exactly once despite 10 buckets
  }

  // -------------------------------------------------------- sequence packing

  test("pack sequences: budget boundaries, straddlers count where they start") {
    val d = Seq(
      (1L, "a", 60L), // cum_before 0   → pack 0
      (2L, "a", 50L), // cum_before 60  → pack 0 (straddles into 100s)
      (3L, "a", 10L), // cum_before 110 → pack 1
      (4L, "b", 10L)  // independent group
    ).toDF("id", "grp", "n")
    val out = Packing.packSequences(d, "id", "grp", col("n"), budget = 100L)
      .select("id", "pack_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("cap per group keeps first n in order with slot numbers") {
    val d = (1L to 10L).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "grp")
    val out = Packing.capPerGroup(d, "grp", "id", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set((1L, "odd", 1), (3L, "odd", 2), (5L, "odd", 3),
      (2L, "even", 1), (4L, "even", 2), (6L, "even", 3)))
  }

  // -------------------------------------------------------------- line dedup

  test("line dedup: removes corpus-frequent lines, keeps blanks and order") {
    val docs = (1L to 5L).map { i =>
      (i, s"unique body $i\nCOMMON FOOTER\n\nunique tail $i")
    }.toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "text", "doc_id", maxOccurrences = 3L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // footer appears 5× > 3 → removed everywhere; blank line (also 5×) kept
    (1L to 5L).foreach { i =>
      val (text, removed) = out(i)
      assert(text == s"unique body $i\n\nunique tail $i", s"doc $i: $text")
      assert(removed == 1L)
    }
  }

  test("line dedup: doc whose every line is boilerplate comes back empty") {
    val docs = ((1L to 4L).map(i => (i, "SPAM\nSPAM")) :+ (9L, "real content"))
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "text", "doc_id", maxOccurrences = 3L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("", 2L))
    assert(out(9L) == ("real content", 0L))
  }

  // ------------------------------------------------------- unigram surprisal

  test("unigram surprisal: rare tokens score higher than common ones") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common rareword")
    ).toDF("doc_id", "text")
    // corpus: common×5, rareword×1, N=6
    // doc 1: avg ln(6/5) ≈ 0.182; doc 2: (ln(6/5) + ln(6/1))/2 ≈ 0.987
    val out = TextAnalysis.unigramSurprisal(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4L)
    assert(math.abs(out(1L)._2 - math.log(6.0 / 5.0)) < 1e-6)
    assert(math.abs(out(2L)._2 - (math.log(6.0 / 5.0) + math.log(6.0)) / 2) < 1e-6)
    assert(out(2L)._2 > out(1L)._2)
  }

  // ---------------------------------------------------------- embedding ops

  test("int8 quantization: unit-norm scaling to [-127, 127]") {
    val df = Seq((1L, Seq(3.0, 4.0)), (2L, Seq(-1.0, 0.0))).toDF("id", "v")
    val out = Embeddings.quantizeInt8(df, "v", "id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(out(1L)._1 == 5.0) // ||(3,4)|| = 5
    assert(out(1L)._2 == "76,102") // round(3/5*127)=76, round(4/5*127)=102
    assert(out(2L)._2 == "-127,0")
  }

  test("mean pool: element-wise mean per key, ragged + null handling") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)),
      (1L, Seq[java.lang.Double](3.0, 6.0)),
      (2L, Seq[java.lang.Double](5.0, null)), // null component drops from pos 1
      (2L, Seq[java.lang.Double](7.0, 9.0, 11.0)), // ragged: pos 2 has n=1
      (3L, null), // all-null key vanishes
      (4L, Seq[java.lang.Double](1.0, null)),
      (4L, Seq[java.lang.Double](3.0, null)) // pos 1 carried by NO vector
    ).toDF("k", "v")
    val out = Embeddings.meanPool(df, "v", "k")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L) == (2L, Seq(2.0, 4.0)))
    assert(out(2L)._1 == 2L)
    assert(out(2L)._2 == Seq(6.0, 9.0, 11.0)) // pos1 mean over the one non-null
    // an all-null POSITION stays in place as null — never compacted out,
    // which would shift later dimensions to wrong indices
    assert(out(4L) == (2L, Seq(2.0, null)))
    // determinism: re-run bitwise identical
    val again = Embeddings.meanPool(df, "v", "k")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(again == out)
  }

  test("weighted mean pool: token-count weighting, zero/null weights drop") {
    val df = Seq(
      (1L, 3L, Seq[java.lang.Double](1.0, 10.0)),
      (1L, 1L, Seq[java.lang.Double](5.0, 2.0)),
      (2L, 0L, Seq[java.lang.Double](9.0, 9.0)), // zero weight contributes nothing
      (2L, 2L, Seq[java.lang.Double](4.0, 6.0))
    ).toDF("k", "w", "v")
    val out = Embeddings.weightedMeanPool(df, "v", "w", "k")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    // key 1: (3*1 + 1*5)/4 = 2.0, (3*10 + 1*2)/4 = 8.0
    assert(out(1L) == (4L, Seq(2.0, 8.0)))
    // key 2: only the w=2 row — the weighted mean IS that vector
    assert(out(2L) == (2L, Seq(4.0, 6.0)))
    // agreement with the unweighted op at w = 1 everywhere
    val uni = Embeddings.meanPool(df.select(col("k"), col("v")), "v", "k")
    val wOne = Embeddings.weightedMeanPool(df.withColumn("w", lit(1L)), "v", "w", "k")
      .withColumnRenamed("w_total", "n_vecs")
    assert(wOne.except(uni).isEmpty && uni.except(wOne).isEmpty)
  }

  test("weighted mean pool: an over-bound weight SURFACES as an error " +
      "instead of silently wrapping the long sums into corrupt means") {
    // q = floor(0.9·1e6 + 0.5) = 900000; 900000 · (Long.MaxValue/1e5)
    // overflows a long — multiplyExact must throw through the job
    val df = Seq(
      (1L, Long.MaxValue / 100000L, Seq[java.lang.Double](0.9, 0.9)),
      (1L, Long.MaxValue / 100000L, Seq[java.lang.Double](0.9, 0.9))
    ).toDF("k", "w", "v")
    val e = intercept[Exception] {
      Embeddings.weightedMeanPool(df, "v", "w", "k").collect()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      e.toString)
  }

  test("target mix: composition matches shares, binding group limits size") {
    // 100 en, 10 de → with shares 0.8/0.2 the binding group is de:
    // N = min(100/0.8, 10/0.2) = 50 → keep 40 en + 10 de
    val docs = ((1L to 100L).map(i => (i, "en")) ++ (101L to 110L).map(i => (i, "de")) ++
      Seq((200L, "xx"))).toDF("doc_id", "lang")
    val out = graft.ops.Sampling.targetMix(docs, "doc_id", "lang",
      Map("en" -> 0.8, "de" -> 0.2)).select("doc_id", "lang").collect()
    val byLang = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang == Map("en" -> 40, "de" -> 10))
    assert(!out.exists(_.getString(1) == "xx")) // absent from shares → dropped
  }

  test("chunking: overlap, full coverage, short tail, empty text") {
    val docs = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkText(docs, "text", "doc_id", size = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._4).toSeq == Seq("abcd", "defg", "ghij")) // step 3, overlap 1
    assert(d1.map(_._3).toSeq == Seq(0, 3, 6))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0, ""))) // empty → one empty chunk
  }

  test("pq codes: vector nearest its own codebook entry gets that code") {
    // ids 0 and 100 are codebook entries (stride 100); id 1 sits next to
    // id 0's subvectors, id 101 next to id 100's
    val base0 = Seq.fill(8)(0.0)
    val base1 = Seq.fill(8)(10.0)
    val df = Seq(
      (0L, base0 ++ base0), (100L, base1 ++ base1),
      (1L, base0.map(_ + 0.1) ++ base0.map(_ + 0.1)),
      (101L, base1.map(_ - 0.1) ++ base1.map(_ - 0.1)),
      (7L, base0 ++ base1) // first half near 0's, second near 100's
    ).toDF("id", "v")
    val out = graft.ops.Similarity.pqEncode(df, "v", "id", subspaces = 2, stride = 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "0,0")
    assert(out(101L) == "100,100")
    assert(out(7L) == "0,100")
    assert(out(0L) == "0,0") // codebook entries encode to themselves
  }

  test("tfidf: corpus-frequent terms rank below distinctive ones") {
    val docs = Seq(
      (1L, "common shared spark unique1"),
      (2L, "common shared spark unique2"),
      (3L, "common shared spark unique3")
    ).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), explode(Dedup.tokenize(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // distinctive term (df=1) must outrank corpus-wide terms (df=3, idf=0)
    val top = tf.join(dfreq, "tok")
      .select(col("doc_id"), col("tok"), (col("tf") * log(lit(3.0) / col("df"))).as("s"))
      .where(col("doc_id") === 1L).orderBy(col("s").desc).limit(1)
      .collect().head.getString(1)
    assert(top == "unique1")
  }

  // --------------------------------------------------------- plan properties

  test("asof join plan: no cartesian, no per-key loop — window over union") {
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((2L, 10L, 90L)).toDF("event_id", "user_id", "ts")
    val plan = Joins.asofLastPrior(left, "event_id", "ts", right, "event_id", "ts",
      Seq("user_id")).queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("range join plan: bucketed equi-join, not a nested-loop inequality join") {
    val intervals = Seq((1L, 10L, 30L)).toDF("iv_id", "lo", "hi")
    val points = Seq(15L).toDF("p")
    val plan = Joins.pointInInterval(points, "p", intervals, "lo", "hi", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("shard layout: total coverage, dense in-shard positions, deterministic") {
    val docs = (0L until 400L).toDF("id")
    val out = Packing.shardLayout(docs, "id", shards = 8).collect()
    assert(out.length == 400)
    val byShard = out.groupBy(_.getAs[Int]("shard"))
    assert(byShard.keySet.subsetOf((0 until 8).toSet))
    // hash-balanced: no shard is empty or dominant for 400 uniform ids
    assert(byShard.values.map(_.length).min > 10)
    byShard.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val again = Packing.shardLayout(docs, "id", shards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("corpus diff: delta only, null content is a real state") {
    import graft.ops.Curation
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, null: String))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d"), (5L, null: String))
      .toDF("doc_id", "text")
    val got = Curation.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 2 (identical) and 5 (null→null) produce NO row; the delta is exact
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    // null → non-null must surface as changed, not vanish
    val got2 = Curation.corpusDiff(oldSnap,
        Seq((5L, "now present")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2(5L) == "changed")
    // NULL and empty string are DISTINCT states: the signature carries an
    // is-null discriminator, so null→'' is changed, ''→'' is unchanged
    val got3 = Curation.corpusDiff(oldSnap,
        Seq((5L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got3(5L) == "changed")
    val got4 = Curation.corpusDiff(
        Seq((9L, "")).toDF("doc_id", "text"),
        Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(got4.isEmpty)
  }

  test("incremental rebuild: verdict patch covers only the delta; standing wins") {
    import graft.ops.Curation
    val tA = "the quick brown fox jumps over the lazy dog again and again"
    val tB = "entirely different content about spark catalyst plans and shuffles"
    val tC = "a third unique document mentioning broadcast joins and skew salting"
    val tNew = "fresh pair of identical documents arriving in the same batch window"
    val oldSnap = Seq(1L -> tA, 2L -> tB, 3L -> tC).toDF("doc_id", "text")
    val newSnap = Seq(
      1L -> tA,              // unchanged standing
      2L -> (tB + " rev2"),  // changed, still unique → kept singleton
      100L -> tA,            // added, exact dup of standing 1 → dup of 1
      200L -> tNew,          // added twins: smaller id kept,
      201L -> tNew           //   larger one a dup of 200
    ).toDF("doc_id", "text") // 3 removed
    val out = Curation.incrementalRebuild(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3)))).toMap
    // the patch is exactly the delta — standing doc 1 gets NO row
    assert(out.keySet == Set(2L, 3L, 100L, 200L, 201L))
    assert(out(3L) == ("removed", None, None))
    assert(out(2L) == ("changed", Some(2L), Some(true)))
    // standing wins: the added copy is the duplicate, anchored on 1
    assert(out(100L) == ("added", Some(1L), Some(false)))
    // all-new component: min batch id kept
    assert(out(200L) == ("added", Some(200L), Some(true)))
    assert(out(201L) == ("added", Some(200L), Some(false)))
  }

  test("sig-store incremental rebuild: row-identical to the direct path across two ingests; state compacts and re-learns") {
    import graft.ops.{Curation, Dedup}
    import org.apache.spark.sql.DataFrame
    val hot = "repeated boilerplate text shared by many standing documents exactly"
    val uniqA = "alpha unique standing document all about broadcast joins"
    val uniqB = "beta unique standing document all about shuffle partitions"
    val snap0 = ((0 until 40).map(i => (i.toLong, hot)) ++
      Seq((100L, uniqA), (101L, uniqB), (102L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    // ingest 1: 101 removed, 100 changed, 200 added (dup of hot),
    // 201 added (never-seen text); null doc unchanged
    val snap1 = ((0 until 40).map(i => (i.toLong, hot)) ++
      Seq((100L, uniqA + " changed"), (102L, null.asInstanceOf[String]),
        (200L, hot), (201L, "gamma fresh text mentioning adaptive execution")))
      .toDF("doc_id", "text")
    // ingest 2: hot cluster shrinks, 300 re-adds uniqB — whose signature
    // was COMPACTED out after ingest 1 (its text left the corpus) and
    // must be re-learned as unseen
    val snap2 = ((10 until 40).map(i => (i.toLong, hot)) ++
      Seq((100L, uniqA + " changed"), (102L, null.asInstanceOf[String]),
        (200L, hot), (201L, "gamma fresh text mentioning adaptive execution"),
        (300L, uniqB)))
      .toDF("doc_id", "text")
    def pat(df: DataFrame) = df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) "-" else r.getBoolean(3).toString)).toSet

    val (d0, g0) = Dedup.dedupState(snap0, "text", "doc_id")
    // state sigs: one entry per distinct text (incl. the null group) per band
    assert(g0.select("th").distinct().count() == 4)
    val r1 = Curation.incrementalRebuildFromState(
      Curation.RebuildState(d0, g0), snap1, "doc_id", "text")
    assert(pat(r1.patch) ==
      pat(Curation.incrementalRebuild(snap0, snap1, "doc_id", "text")))
    // compaction: uniqB left the corpus, gamma arrived → still 4 texts
    assert(r1.state.sigs.select("th").distinct().count() == 4)
    assert(r1.state.docs.count() == snap1.count())

    val r2 = Curation.incrementalRebuildFromState(r1.state, snap2, "doc_id", "text")
    assert(pat(r2.patch) ==
      pat(Curation.incrementalRebuild(snap1, snap2, "doc_id", "text")))
    // the re-added text was re-learned; 300 is its own keeper
    assert(pat(r2.patch).contains((300L, "added", 300L, "true")))
    assert(r2.state.sigs.select("th").distinct().count() == 5)
  }

  test("incremental paths agree on randomized snapshots: direct == sig-store, seeded sweep") {
    import graft.ops.{Curation, Dedup}
    import org.apache.spark.sql.DataFrame
    // a small text pool forces duplicate groups AND near-dup band
    // collisions; nulls included. Deterministic java.util.Random seeds.
    val pool = Vector(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy dog again and again!",
      "completely different content about catalyst plans and shuffles",
      "a third unique document mentioning broadcast joins and salting",
      "boilerplate cookie banner accept all terms and conditions apply",
      null)
    def pat(df: DataFrame) = df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2),
      if (r.isNullAt(3)) "-" else r.getBoolean(3).toString)).toSet
    for (seed <- Seq(7, 19, 43)) {
      val rnd = new java.util.Random(seed)
      def snap(ids: Seq[Long]) =
        ids.map(i => (i, pool(rnd.nextInt(pool.size)))).toDF("doc_id", "text")
      val ids0 = (0L until 60L).filter(_ => rnd.nextDouble() < 0.9)
      val ids1 = (0L until 70L).filter(_ => rnd.nextDouble() < 0.85)
      val s0 = snap(ids0)
      val s1 = snap(ids1) // overlapping ids get re-rolled texts → changed
      val direct = Curation.incrementalRebuild(s0, s1, "doc_id", "text")
      val (d0, g0) = Dedup.dedupState(s0, "text", "doc_id")
      val viaState = Curation.incrementalRebuildFromState(
        Curation.RebuildState(d0, g0), s1, "doc_id", "text")
      assert(pat(viaState.patch) == pat(direct), s"seed $seed diverged")
    }
  }

  test("profile approx mode: HLL estimate within tolerance, exact stats unchanged, no Expand") {
    import graft.ops.Profiling
    val df = spark.range(20000).toDF("id")
      .withColumn("bucket", (col("id") % 37).cast("string"))
      .withColumn("maybe", when(col("id") % 5 === 0, lit(null).cast("long")).otherwise(col("id")))
    val rsd = 0.05
    val approx = Profiling.profile(df, Seq("id", "bucket", "maybe"), approxDistinct = Some(rsd))
    // the exactness price is the Expand (rows × columns through the first
    // partial agg); approx mode must plan WITHOUT it
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "approx profile must not plan an Expand")
    // (single-column exact profiles rewrite Expand-free; the price kicks
    // in at ≥2 distinct columns, the normal profiling shape)
    assert(Profiling.profile(df, Seq("id", "bucket", "maybe"))
      .queryExecution.executedPlan.toString.contains("Expand"),
      "exact multi-column profile is the Expand-priced baseline this test contrasts")
    val rows = approx.collect().map(r => r.getAs[String]("col_name") -> r).toMap
    // everything except n_distinct stays exact
    assert(rows("id").getAs[Long]("n_rows") == 20000L)
    assert(rows("id").getAs[Long]("n_nulls") == 0L)
    assert(rows("maybe").getAs[Long]("n_nulls") == 4000L)
    assert(rows("id").getAs[String]("min_value") == "0")
    assert(rows("id").getAs[String]("max_value") == "19999")
    // HLL++ estimate lands within a generous 4×rsd of the truth
    def within(est: Long, truth: Long): Boolean =
      math.abs(est - truth) <= math.max(1L, (4 * rsd * truth).toLong)
    assert(within(rows("id").getAs[Long]("n_distinct"), 20000L),
      s"id estimate ${rows("id").getAs[Long]("n_distinct")}")
    assert(within(rows("bucket").getAs[Long]("n_distinct"), 37L))
    assert(within(rows("maybe").getAs[Long]("n_distinct"), 16000L))
    // rsd outside (0,1) fails loudly
    intercept[IllegalArgumentException](
      Profiling.profile(df, Seq("id"), approxDistinct = Some(1.5)))
  }
}
