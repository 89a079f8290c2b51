package graft.ops

import org.apache.spark.sql.Column
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
  * broadcast, not a shuffle) and is compiled to a pair→rank hash map ONCE
  * PER EXECUTOR via [[RankTable.cached]], not per row.
  *
  * Bytes are represented as ISO-8859-1 strings (one char per byte, cheap
  * hashing, human-readable for ASCII); [[bytesOf]] converts a readable
  * UTF-8 string into that form for writing merges tables by hand.
  */
object Bpe {

  /** The GPT-2 pre-tokenizer regex (public, shipped with the GPT-2 code):
    * contractions, optionally-space-prefixed letter runs, digit runs,
    * symbol runs, then whitespace (trailing run kept whole). Its matches
    * PARTITION the text — every char lands in exactly one pre-token — so
    * token counts cover the full input.
    */
  val Gpt2PretokenRe: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** UTF-8 bytes of `s` as a latin-1 string (one char = one byte) — the
    * form merges tables and [[encode]] operate in.
    */
  def bytesOf(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  /** A merges table compiled for encoding: pair → rank (merge priority,
    * lower merges first) and token-bytes → id (byte-level convention).
    */
  final class RankTable(merges: IndexedSeq[(String, String)]) extends Serializable {
    val pairRank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      var i = 0
      while (i < merges.size) {
        val (a, b) = merges(i)
        m.putIfAbsent(pairKey(a, b), Integer.valueOf(i))
        i += 1
      }
      m
    }
    val tokenId: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2 + 512)
      var b = 0
      while (b < 256) {
        m.put(Character.toString(b.toChar), Integer.valueOf(b))
        b += 1
      }
      var i = 0
      while (i < merges.size) {
        val (a, bb) = merges(i)
        m.putIfAbsent(a + bb, Integer.valueOf(256 + i))
        i += 1
      }
      m
    }
  }

  // length-prefixed pair key: unambiguous even when token bytes include
  // any separator char we could pick
  private def pairKey(a: String, b: String): String =
    a.length.toString + ":" + a + b

  private val pretokPattern = java.util.regex.Pattern.compile(Gpt2PretokenRe)

  /** Serializable kernel: ships the raw merges list in the task closure,
    * compiles the rank table LAZILY ONCE per executor (transient — never
    * serialized, rebuilt on first row after deserialization), so the
    * per-row path pays a resolved-lazy read, not a table hash.
    */
  private final class Kernel(ms: IndexedSeq[(String, String)]) extends Serializable {
    @transient lazy val table: RankTable = new RankTable(ms)
    def count(text: String): Long = {
      if (text == null) return 0L
      val t = table
      var n = 0L
      val m = pretokPattern.matcher(text)
      while (m.find()) n += mergePiece(bytesOf(m.group()), t).length
      n
    }
    def ids(text: String): Array[Int] = {
      if (text == null || text.isEmpty) return Array.emptyIntArray
      val t = table
      val out = new ArrayBuffer[Int](text.length / 3 + 4)
      val m = pretokPattern.matcher(text)
      while (m.find()) {
        val parts = mergePiece(bytesOf(m.group()), t)
        var i = 0
        while (i < parts.length) { out += t.tokenId.get(parts(i)).intValue; i += 1 }
      }
      out.toArray
    }
  }

  /** Merge one pre-token (latin-1 byte string) to its final token list.
    * tiktoken's algorithm shape: repeatedly merge the LOWEST-RANK adjacent
    * pair present in the table, anywhere in the piece — greedy
    * left-to-right is WRONG (it can pick a higher-rank pair whose merge
    * destroys the lower-rank one; the spec tests pin this). Quadratic in
    * the piece length, which the pre-tokenizer bounds to word-ish runs.
    */
  private[ops] def mergePiece(piece: String, t: RankTable): ArrayBuffer[String] = {
    val parts = new ArrayBuffer[String](piece.length)
    var i = 0
    while (i < piece.length) { parts += piece.substring(i, i + 1); i += 1 }
    var done = parts.length < 2
    while (!done) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < parts.length - 1) {
        val r = t.pairRank.get(pairKey(parts(j), parts(j + 1)))
        if (r != null && r.intValue < bestRank) { bestRank = r.intValue; best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        parts(best) = parts(best) + parts(best + 1)
        parts.remove(best + 1)
        done = parts.length < 2
      }
    }
    parts
  }

  /** Encode `text` to byte-level BPE token ids under `merges` (driver-side
    * kernel — the Column ops below wrap it). Null-safe: null → empty.
    */
  def encode(text: String, merges: Seq[(String, String)]): Array[Int] =
    new Kernel(merges.toIndexedSeq).ids(text)

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

  /** Token IDS under `merges` as an array<int> Column (byte-level ids:
    * byte b → b, merge i → 256 + i) — the trainer-facing form when the
    * export needs ids, not just budget counts.
    */
  def tokenIds(merges: Seq[(String, String)]): UserDefinedFunction = {
    val k = new Kernel(merges.toIndexedSeq)
    udf((text: String) => k.ids(text))
  }
}
