package graft.ops

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-merge tokenization — the PUBLIC GPT-2/tiktoken algorithm
  * (Sennrich et al. 2016 BPE applied byte-level, as published with GPT-2):
  * text is pre-tokenized with the GPT-2 regex, each pre-token is UTF-8
  * encoded, and adjacent byte-sequence pairs are merged iteratively in
  * RANK order (lowest-rank pair anywhere in the piece merges first) until
  * no adjacent pair remains in the supplied merges table. Token ids follow
  * the byte-level convention: base vocabulary = the 256 bytes (id = byte
  * value), merge `i` mints id `256 + i`.
  *
  * This exists because packing budgets counted in whitespace words mis-size
  * context windows by 1.3–2× vs the tokenizer the model actually trains
  * with — [[Packing.packSequences]] takes any token-count Column, and
  * [[tokenCount]] makes that column TOKEN-exact for whatever merges table
  * the deployment ships.
  *
  * Spark shape: both entry points are Column-returning kernels, NOT
  * opaque `mapPartitions` — the plan stays a projection, column pruning
  * and predicate pushdown keep working, and the op composes anywhere a
  * Column does. The iterative rank-ordered merge loop is the justified-UDF
  * class (same contract as [[TextAnalysis.wordNgrams]]'s sliding kernel):
  * no Catalyst expression can express a data-dependent fixpoint loop. The
  * merges table rides the closure (a full 50k-merge table is ~1 MB — task
  * broadcast, not a shuffle) and compiles ONCE PER EXECUTOR into an
  * open-addressed (leftId, rightId) → rank table; the per-row merge loop
  * is integer-only — no string concatenation, no boxing, no hashing of
  * byte strings in the hot path.
  *
  * Merges tables are written as ISO-8859-1 byte strings (one char = one
  * byte, human-readable for ASCII); [[bytesOf]] converts a readable UTF-8
  * string into that form.
  */
object Bpe {

  /** The GPT-2 pre-tokenizer regex (public, shipped with the GPT-2 code):
    * contractions, optionally-space-prefixed letter runs, digit runs,
    * symbol runs, then whitespace (trailing run kept whole). Its matches
    * PARTITION the text — every char lands in exactly one pre-token — so
    * token counts cover the full input. Compiled with
    * UNICODE_CHARACTER_CLASS: Python's `\s`/`\S` (what GPT-2's own
    * tokenizer uses) are Unicode-aware, and Java's default ASCII `\s`
    * would glue NBSP and other Unicode whitespace onto symbol runs —
    * different pre-token boundaries, hence different token counts than
    * the model's tokenizer, on ordinary crawled HTML.
    */
  val Gpt2PretokenRe: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  private val pretokPattern = java.util.regex.Pattern.compile(
    Gpt2PretokenRe, java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** UTF-8 bytes of `s` as a latin-1 string (one char = one byte) — the
    * form merges tables are written in.
    */
  def bytesOf(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Window cap for pathological pre-tokens. Natural-language pieces are
    * word-sized; a single multi-hundred-KB whitespace/digit/symbol run
    * (minified junk, boilerplate padding) is ONE pre-token, and the merge
    * loop is quadratic in the piece — unbounded, that is hours on one
    * row. Pieces beyond this cap merge in independent windows: counts
    * stay EXACT for every piece ≤ the cap, and an oversized piece can
    * overcount by at most one token per window seam (a merge that would
    * have spanned the boundary), i.e. ≤ len/16384 tokens — bounded and
    * negligible against a budget, never an undercount.
    */
  val MaxPieceBytes: Int = 16384

  /** Minimal open-addressed (long → int) map: power-of-two linear
    * probing, no boxing, for the per-pair rank probe in the merge loop.
    * Keys are non-negative (two 31-bit token ids packed); -1 is the
    * empty slot sentinel.
    */
  private final class LongIntMap(capacityHint: Int) extends Serializable {
    private val cap = {
      var c = 16
      while (c < capacityHint * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = Array.fill[Long](cap)(-1L)
    private val vals = new Array[Int](cap)
    def put(k: Long, v: Int): Unit = {
      var i = (java.lang.Long.hashCode(k) & Int.MaxValue) & mask
      while (keys(i) != -1L && keys(i) != k) i = (i + 1) & mask
      if (keys(i) != k) { keys(i) = k; vals(i) = v }
      // first write wins (putIfAbsent semantics — merges earlier in the
      // table take priority, matching the GPT-2 file format)
    }
    def get(k: Long): Int = {
      var i = (java.lang.Long.hashCode(k) & Int.MaxValue) & mask
      while (keys(i) != -1L) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & mask
      }
      -1
    }
  }

  /** A merges table compiled for encoding: (leftId, rightId) → rank, and
    * rank → the canonical merged token id. Ids: byte b → b, merge i →
    * 256 + i (a duplicate concatenation resolves to the FIRST mint). A
    * merge whose side string names a token no earlier merge produces can
    * never fire and is skipped (its id is still minted, so the
    * convention stays positional).
    */
  final class RankTable(merges: IndexedSeq[(String, String)]) extends Serializable {
    private[Bpe] val pairRank = new LongIntMap(math.max(16, merges.size))
    private[Bpe] val mergedId = new Array[Int](merges.size)
    locally {
      val idOf = new java.util.HashMap[String, Integer](merges.size * 2)
      def resolve(s: String): Int =
        if (s.length == 1) s.charAt(0).toInt
        else {
          val v = idOf.get(s)
          if (v == null) -1 else v.intValue
        }
      var i = 0
      while (i < merges.size) {
        val (a, b) = merges(i)
        val aId = resolve(a)
        val bId = resolve(b)
        val concat = a + b
        val existing = idOf.get(concat)
        val mId = if (existing != null) existing.intValue else {
          idOf.put(concat, Integer.valueOf(256 + i))
          256 + i
        }
        mergedId(i) = mId
        if (aId >= 0 && bId >= 0)
          pairRank.put((aId.toLong << 32) | bId.toLong, i)
        i += 1
      }
    }
  }

  /** Merge one pre-token window (latin-1 byte string slice) into token
    * ids, appended to `out`; returns the number of tokens emitted.
    * tiktoken's algorithm shape: repeatedly merge the LOWEST-RANK
    * adjacent pair present in the table, anywhere in the piece — greedy
    * left-to-right is WRONG (it can pick a higher-rank pair whose merge
    * destroys the lower-rank one; the spec tests pin this). Quadratic in
    * the window length, integer-only (ids in a reused buffer, packed
    * long pair probes — zero allocation per iteration).
    */
  private def mergeWindow(piece: CharSequence, from: Int, until: Int,
      t: RankTable, parts: ArrayBuffer[Int], out: ArrayBuffer[Int]): Int = {
    parts.clear()
    var i = from
    while (i < until) { parts += piece.charAt(i).toInt; i += 1 }
    var done = parts.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < parts.length - 1) {
        val r = t.pairRank.get((parts(j).toLong << 32) | parts(j + 1).toLong)
        if (r >= 0 && r < bestRank) { bestRank = r; best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        parts(best) = t.mergedId(bestRank)
        parts.remove(best + 1)
        done = parts.length < 2
      }
    }
    out ++= parts
    parts.length
  }

  /** Serializable kernel: ships the raw merges list in the task closure,
    * compiles the rank table LAZILY ONCE per executor (transient — never
    * serialized, rebuilt on first row after deserialization), so the
    * per-row path pays a resolved-lazy read, not a table hash.
    */
  private final class Kernel(ms: IndexedSeq[(String, String)]) extends Serializable {
    @transient lazy val table: RankTable = new RankTable(ms)
    @transient private lazy val local =
      new ThreadLocal[(ArrayBuffer[Int], ArrayBuffer[Int])] {
        override def initialValue() = (new ArrayBuffer[Int](64), new ArrayBuffer[Int](256))
      }
    private def eachPiece(text: String)(f: (String, Int, Int) => Unit): Unit = {
      val m = pretokPattern.matcher(text)
      while (m.find()) {
        val piece = bytesOf(m.group())
        var o = 0
        while (o < piece.length) {
          val end = math.min(piece.length, o + MaxPieceBytes)
          f(piece, o, end)
          o = end
        }
        if (piece.isEmpty) () // regex never yields empty matches; guard anyway
      }
    }
    def ids(text: String): Array[Int] = {
      if (text == null || text.isEmpty) return Array.emptyIntArray
      val t = table
      val (parts, out) = local.get()
      out.clear()
      eachPiece(text)((p, a, b) => { mergeWindow(p, a, b, t, parts, out); () })
      out.toArray
    }
    def count(text: String): Long = {
      if (text == null) return 0L
      val t = table
      val (parts, out) = local.get()
      var n = 0L
      eachPiece(text) { (p, a, b) =>
        out.clear()
        n += mergeWindow(p, a, b, t, parts, out)
      }
      n
    }
  }

  /** Encode `text` to byte-level BPE token ids under `merges` (driver-side
    * kernel — the Column ops below wrap it). Null-safe: null → empty.
    */
  def encode(text: String, merges: Seq[(String, String)]): Array[Int] =
    new Kernel(merges.toIndexedSeq).ids(text)

  /** Decode byte-level BPE ids back to text: byte ids (< 256) are their
    * byte, merge id 256+i expands to its pair's concatenated byte
    * strings (merge pairs are already fully-expanded byte strings — see
    * [[bytesOf]]), and the byte stream re-reads as UTF-8. Total inverse
    * of [[encode]]: `decode(encode(t, ms), ms) == t` for any valid
    * UTF-8 `t` (encode is byte-exhaustive, nothing is dropped). Ids
    * outside [0, 256 + merges.size) throw — a corrupt id must not
    * silently decode to wrong text.
    */
  def decode(ids: Seq[Int], merges: Seq[(String, String)]): String = {
    val ms = merges.toIndexedSeq
    val sb = new StringBuilder
    ids.foreach { id =>
      if (id < 0 || id >= 256 + ms.length)
        throw new IllegalArgumentException(
          s"token id $id outside vocab [0, ${256 + ms.length})")
      if (id < 256) sb += id.toChar
      else { val (a, b) = ms(id - 256); sb ++= a; sb ++= b }
    }
    new String(sb.result().getBytes(
      java.nio.charset.StandardCharsets.ISO_8859_1),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Token COUNT under `merges` as a long Column — the packing-budget
    * input. `Packing.packSequences(df, id, group, Bpe.tokenCount(merges)(
    * col("text")), budget)` is token-exact packing. With an EMPTY merges
    * table this is exactly the UTF-8 byte count of the text (the
    * pre-tokenizer partitions the input; nothing merges) — the invariant
    * the flagship oracle pins.
    */
  def tokenCount(merges: Seq[(String, String)]): UserDefinedFunction = {
    val k = new Kernel(merges.toIndexedSeq)
    udf((text: String) => k.count(text))
  }

  /** Serializable per-executor encode kernel — for sibling ops
    * ([[SftData.tokenizeWithMasks]]) that tokenize SEGMENTS inside one
    * UDF row and can't pay a Column-level UDF per segment. Same lazy
    * rank-table compile as the public Column wrappers.
    */
  private[ops] def encoderKernel(
      merges: Seq[(String, String)]): String => Array[Int] = {
    val k = new Kernel(merges.toIndexedSeq)
    (s: String) => k.ids(s)
  }

  /** Token IDS under `merges` as an array<int> Column (byte-level ids:
    * byte b → b, merge i → 256 + i) — the trainer-facing form when the
    * export needs ids, not just budget counts.
    */
  def tokenIds(merges: Seq[(String, String)]): UserDefinedFunction = {
    val k = new Kernel(merges.toIndexedSeq)
    udf((text: String) => k.ids(text))
  }

  /** Pre-token pieces of a text as latin-1 byte strings, WINDOWED at
    * [[MaxPieceBytes]] like the encoder's merge loop — the corpus side of
    * [[learnMerges]]'s dictionary aggregation. Windowing here does two
    * jobs: the learner sees exactly the piece stream the encoder will
    * merge (stats and encoding agree on pathological runs), and no
    * single piece can blow the collected dictionary past
    * dictSize × MaxPieceBytes bytes on the driver.
    */
  private[ops] val prePieces: UserDefinedFunction = udf((text: String) =>
    if (text == null) Array.empty[String]
    else {
      val out = ArrayBuffer.empty[String]
      val m = pretokPattern.matcher(text)
      while (m.find()) {
        val piece = bytesOf(m.group())
        var o = 0
        while (o < piece.length) {
          out += piece.substring(o, math.min(piece.length, o + MaxPieceBytes))
          o += MaxPieceBytes
        }
      }
      out.toArray
    })

  /** LEARN a byte-level merges table from a corpus — the published
    * Sennrich dictionary algorithm, Spark-shaped: ONE aggregation pass
    * collapses the corpus to a (pre-token piece → count) dictionary
    * capped at `dictSize` by frequency (standard practice — the tail
    * carries negligible pair mass), and the merge loop then runs
    * DRIVER-side over that bounded dictionary, never touching the corpus
    * again (this is also how the original implementation works: BPE
    * learning is a word-frequency-dict algorithm, not a corpus
    * algorithm). Each round merges the most frequent adjacent id pair;
    * ties break deterministically to the smallest (leftId, rightId), so
    * the learned table is reproducible bit-for-bit anywhere. Returns the
    * merges as [[tokenCount]]/[[tokenIds]]-ready byte-string pairs, in
    * rank order.
    *
    * Scale shape: the one corpus-wide exchange is the piece groupBy
    * (map-side combined); pieces arrive windowed at [[MaxPieceBytes]]
    * (matching the encoder, so stats and encoding agree on pathological
    * runs), so the driver holds ≤ dictSize × MaxPieceBytes bytes and the
    * loop is O(nMerges × dict bytes), both bounded by the two explicit
    * dials. A 100 TB corpus learns its vocabulary from the same capped
    * dict a 100 GB one does.
    */
  def learnMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int, dictSize: Int = 65536): Seq[(String, String)] = {
    import org.apache.spark.sql.functions.{col, count => fcount, explode, lit}
    require(nMerges >= 0 && nMerges < (1 << 16), "nMerges out of range")
    val dictRows = df
      .select(explode(prePieces(col(textCol))).as("piece"))
      .groupBy(col("piece")).agg(fcount(lit(1)).as("n"))
      .orderBy(col("n").desc, col("piece"))
      .limit(dictSize)
      .collect()
    // driver-side dict: piece as an id array + its corpus count
    val words: Array[Array[Int]] =
      dictRows.map(r => r.getString(0).toCharArray.map(_.toInt))
    val counts: Array[Long] = dictRows.map(_.getLong(1))
    val idStr = scala.collection.mutable.HashMap.empty[Int, String]
    def strOf(id: Int): String =
      if (id < 256) Character.toString(id.toChar) else idStr(id)
    val merges = ArrayBuffer.empty[(String, String)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // pair frequencies over the dict (weighted by word counts)
      val pairN = new java.util.HashMap[Long, java.lang.Long]()
      var w = 0
      while (w < words.length) {
        val parts = words(w)
        val c = counts(w)
        var j = 0
        while (j < parts.length - 1) {
          val k = (parts(j).toLong << 32) | parts(j + 1).toLong
          val prev = pairN.get(k)
          pairN.put(k, java.lang.Long.valueOf(if (prev == null) c else prev.longValue + c))
          j += 1
        }
        w += 1
      }
      if (pairN.isEmpty) exhausted = true
      else {
        // argmax count, ties to the smallest (leftId, rightId) — i.e. the
        // smallest packed key, making the learned table total-order
        // deterministic
        var bestKey = -1L
        var bestN = -1L
        val it = pairN.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val n = e.getValue.longValue
          if (n > bestN || (n == bestN &&
              java.lang.Long.compareUnsigned(e.getKey, bestKey) < 0)) {
            bestN = n; bestKey = e.getKey
          }
        }
        val l = (bestKey >>> 32).toInt
        val r = (bestKey & 0xffffffffL).toInt
        val newId = 256 + rank
        idStr(newId) = strOf(l) + strOf(r)
        merges += ((strOf(l), strOf(r)))
        // apply the merge to every dict word in place
        w = 0
        while (w < words.length) {
          val parts = words(w)
          var has = false
          var j = 0
          while (!has && j < parts.length - 1) {
            has = parts(j) == l && parts(j + 1) == r
            j += 1
          }
          if (has) {
            val nw = new ArrayBuffer[Int](parts.length)
            j = 0
            while (j < parts.length) {
              if (j < parts.length - 1 && parts(j) == l && parts(j + 1) == r) {
                nw += newId; j += 2
              } else { nw += parts(j); j += 1 }
            }
            words(w) = nw.toArray
          }
          w += 1
        }
        rank += 1
      }
    }
    merges.toSeq
  }
}
