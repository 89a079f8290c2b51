package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("encode: merges apply in RANK order anywhere in the piece — greedy " +
      "left-to-right would give a different (wrong) token count") {
    // ranks: (b,c)=0 < (a,b)=1 < (a,bc)=2. Correct BPE on "abc":
    //   bc merges FIRST (rank 0) -> [a, bc], then (a,bc) rank 2 -> [abc]
    //   = 1 token, id 256+2.
    // Greedy left-to-right would take (a,b) at rank 1 -> [ab, c], (ab,c)
    // is not in the table -> 2 tokens. The count DISTINGUISHES the bugs.
    val merges = Seq(("b", "c"), ("a", "b"), ("a", "bc"))
    assert(Bpe.encode("abc", merges).toSeq == Seq(258))
    // and "ab" alone still uses rank 1
    assert(Bpe.encode("ab", merges).toSeq == Seq(257))
    // untouched bytes keep byte ids
    assert(Bpe.encode("d", merges).toSeq == Seq('d'.toInt))
  }

  test("encode: GPT-2 pre-tokenizer shapes — contractions split, the space " +
      "prefixes the following word, letters and digits split, trailing " +
      "whitespace stays whole") {
    val none = Seq.empty[(String, String)]
    def ids(s: String) = Bpe.encode(s, none).toSeq
    // every byte keeps its own id under empty merges -> ids are the UTF-8
    // bytes, and the PARTITION property makes them the exact byte string
    assert(ids("don't go") == "don't go".getBytes("UTF-8").map(_ & 0xff).toSeq)
    // contraction boundary: "'t" is its own pre-token — a merge across the
    // boundary (n + ') must NOT fire because they sit in different pieces
    val crossing = Seq(("n", "'"))
    assert(Bpe.encode("don't", crossing).toSeq ==
      "don't".getBytes("UTF-8").map(_ & 0xff).toSeq)
    // a space attaches to the FOLLOWING word: merge (" ", "a") can fire
    // inside " ab" but plain "ab" has no space to merge
    val spaceMerge = Seq((" ", "a"))
    assert(Bpe.encode("b ab", spaceMerge).toSeq ==
      Seq('b'.toInt, 256, 'b'.toInt))
    // letter|digit boundary: (c,1) in different pieces, never merges
    val ld = Seq(("c", "1"))
    assert(Bpe.encode("abc123", ld).toSeq ==
      "abc123".getBytes("UTF-8").map(_ & 0xff).toSeq)
  }

  test("encode: UTF-8 multi-byte chars are BYTE-level — é is two tokens " +
      "until a merge over its bytes fires") {
    val none = Seq.empty[(String, String)]
    assert(Bpe.encode("é", none).toSeq == Seq(0xC3, 0xA9))
    val eMerge = Seq((Bpe.bytesOf("é").substring(0, 1), Bpe.bytesOf("é").substring(1)))
    assert(Bpe.encode("é", eMerge).toSeq == Seq(256))
    assert(Bpe.encode("", none).isEmpty)
    assert(Bpe.encode(null, none).isEmpty)
  }

  test("tokenCount Column: empty merges == UTF-8 byte count (the " +
      "pre-tokenizer PARTITIONS the text — nothing dropped, nothing " +
      "doubled) and real merges shrink counts exactly") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("x", "y"), ("1", "2"))
    val df = Seq(
      (0L, "abc xy 12."), // [abc][ ][xy]... see below
      (1L, "mixed é bytes\n\nwith space runs  tail"),
      (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      Bpe.tokenCount(Seq.empty)(col("text")).as("n0"),
      Bpe.tokenCount(merges)(col("text")).as("nm"),
      octet_length(col("text")).as("bytes")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the partition invariant, on text with multi-byte chars and
    // whitespace runs: zero-merge count == byte count
    assert(out(1L).getAs[Long]("n0") == out(1L).getAs[Int]("bytes").toLong)
    assert(out(0L).getAs[Long]("n0") == out(0L).getAs[Int]("bytes").toLong)
    // "abc xy 12." under the table: [abc]=1, [" xy"]=[sp][xy]=2,
    // [" 12"]=[sp][12]=2, ["."]=1 -> 6
    assert(out(0L).getAs[Long]("nm") == 6L)
    assert(out(2L).getAs[Long]("n0") == 0L)
    assert(out(2L).getAs[Long]("nm") == 0L)
  }

  test("pre-tokenizer \\s is UNICODE: NBSP is whitespace (as in Python/" +
      "tiktoken), so it forms its own pre-token instead of gluing onto a " +
      "symbol run — merges cannot fire across the boundary") {
    // merge (" ", 0xC2): if "  " were ONE pre-token (Java's ASCII \s
    // default), the space would sit next to NBSP's first UTF-8 byte and
    // the merge would fire; under Unicode \s they are separate pieces and
    // the ids are the raw bytes
    val merges = Seq((" ", "Â"))
    assert(Bpe.encode("a \u00A0b", merges).toSeq ==
      Seq('a'.toInt, ' '.toInt, 0xC2, 0xA0, 'b'.toInt))
    // and the partition invariant still holds on Unicode whitespace
    assert(Bpe.encode("a \u00A0 \u00A0b", Seq.empty).length ==
      "a \u00A0 \u00A0b".getBytes("UTF-8").length)
  }

  test("oversized pre-tokens merge in bounded windows: counts stay exact " +
      "under the empty table and bounded-above with merges") {
    // a single 40k-digit run is ONE pre-token; unbounded it would be an
    // O(n^2) stall per row. Empty table: count == byte count regardless
    // of windowing (nothing merges across seams anyway).
    val run = "7" * 40000
    assert(Bpe.encode(run, Seq.empty).length == 40000)
    // with a digit-pair merge, each window halves independently; the true
    // un-windowed count would be 20000, windowing can only ADD at most
    // one token per seam (40000/16384 = 2 seams, and 16384 is even so
    // here the seams align and the count is exact)
    val merged = Bpe.encode(run, Seq(("7", "7"))).length
    assert(merged == 20000, s"got $merged")
  }

  test("tokenIds Column matches the driver-side encode, id convention " +
      "256+rank for merged tokens") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val out = Seq((0L, "low lo")).toDF("doc_id", "text")
      .select(Bpe.tokenIds(merges)(col("text")).as("ids"))
      .collect().head.getSeq[Int](0).toSeq
    // "low" -> lo(256) +w -> low(257); " lo" -> [sp][lo(256)]
    assert(out == Seq(257, ' '.toInt, 256))
    assert(out == Bpe.encode("low lo", merges).toSeq)
  }

  test("learnMerges: the dictionary algorithm learns the HAND-DERIVED " +
      "merge sequence (max pair count, ties to smallest ids) and the " +
      "learned table round-trips through the encoder") {
    // every doc: "roro rora roro" → pieces {roro, ' rora', ' roro'}.
    // Pair counts: (r,o)=5N, (o,r)=3N, (sp,r)=2N, (r,a)=N →
    //   merge0 (r,o). Then (ro,ro)=2N ties (sp,ro)=2N → smaller left
    //   (space=32) wins → merge1 (' ',ro). Then all pairs tie at N →
    //   smallest (left,right): merge2 (r,a), merge3 (ro,ro),
    //   merge4 (' ro',ro) [left 257 ties, right 256 < 258].
    val docs = (0L until 50L).map(i => (i, "roro rora roro"))
      .toDF("doc_id", "text")
    val learned = Bpe.learnMerges(docs, "text", nMerges = 5)
    assert(learned == Seq(("r", "o"), (" ", "ro"), ("r", "a"),
      ("ro", "ro"), (" ro", "ro")))
    // encoder consistency: "roro rora" under the learned table =
    // [roro] + [' ro'][ra] = 3 tokens
    assert(Bpe.encode("roro rora", learned).length == 3)
    // a corpus with nothing left to merge stops early instead of looping
    assert(Bpe.learnMerges(
      Seq((0L, "a b")).toDF("doc_id", "text"), "text", 50).size < 50)
  }

  test("token-exact packing: packSequences on a Bpe.tokenCount column " +
      "packs by tokens, not whitespace words — the budgets DIVERGE on " +
      "merge-heavy text") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    // each doc: "abc abc abc abc" = 4 words; BPE: [abc] + 3*[sp,abc]... no:
    // " abc" = [sp][abc] ... wait [sp] merges nothing -> 2 tokens, so
    // 1 + 3*2 = 7 tokens vs 4 words. Budget 14: 2 docs per pack by
    // tokens, but by words (budget 14) 3 docs would fit the first pack.
    val docs = (0L to 5L).map(i => (i, 0L, "abc abc abc abc")).toDF("doc_id", "grp", "text")
    val byTokens = Packing.packSequences(docs, "doc_id", "grp",
      Bpe.tokenCount(merges)(col("text")), budget = 14L)
      .orderBy("doc_id").collect()
    assert(byTokens.map(_.getAs[Long]("n_tokens")).toSeq == Seq.fill(6)(7L))
    assert(byTokens.map(_.getAs[Long]("pack_id")).toSeq ==
      Seq(0L, 0L, 1L, 1L, 2L, 2L))
    val byWords = Packing.packSequences(docs, "doc_id", "grp",
      size(split(col("text"), "\\s+")), budget = 14L)
      .orderBy("doc_id").collect()
    assert(byWords.map(_.getAs[Long]("pack_id")).toSeq ==
      Seq(0L, 0L, 0L, 0L, 1L, 1L))
  }
}
