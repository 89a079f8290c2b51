package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Web-crawl ingest ops: WARC record parsing (ISO 28500 — the format
  * web corpora actually arrive in) and HTML→text extraction (the
  * WET-style conversion a pretraining pipeline runs first). Both are
  * narrow per-partition walks over opaque byte/string columns — the
  * same decode-free structure-parser family as the MP4/H.264/MP3 ops,
  * with per-record degradation so one truncated crawl segment cannot
  * kill the job.
  */
object WebIngest {

  private val warcCols = Seq(
    StructField("record_idx", IntegerType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("record_id", StringType),
    StructField("warc_refers_to", StringType),
    StructField("payload_digest", StringType),
    StructField("content_text", StringType),
    StructField("parse_error", StringType))

  /** One row per WARC record of a segment payload: type, target URI,
    * declared content type/length, and the body decoded as UTF-8 text.
    * Gzipped segments (Common Crawl ships one gzip MEMBER per record,
    * concatenated) are inflated first — `GZIPInputStream` consumes
    * multi-member streams. Record framing is the spec's: version line,
    * CRLF-terminated headers, blank line, Content-Length body bytes,
    * CRLF CRLF. A malformed record ends the walk (records already
    * parsed are kept; the tail is reported).
    */
  def warcRecords(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    warcWalk(df, payloadCol, emitBytes = false)

  /** [[warcRecords]] with the body as RAW BYTES (`content_bytes`) — the
    * input [[httpResponses]] needs: a `response` record's body is an HTTP
    * message whose charset is declared INSIDE it, so decoding it as UTF-8
    * up front (the text variant's contract, right for WET conversion
    * records) would mangle latin-1/cp1252 pages before the charset is
    * even known. Same framing walk, same degradation.
    */
  def warcRecordBytes(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    warcWalk(df, payloadCol, emitBytes = true)

  /** One parsed WARC record frame: header fields, body span, and the
    * offset where the NEXT record starts (after the inter-record CRLFs).
    * `ok=false` carries the failure shape instead: `truncated` for a
    * record that starts right but cannot complete; otherwise the version
    * line was missing (`verMissing` — clean EOF for a walk past record 0)
    * or present-but-not-WARC (`verNonEmpty` — a malformed tail).
    */
  private final case class WarcFrame(ok: Boolean, verMissing: Boolean,
      verNonEmpty: Boolean, truncated: Boolean,
      wtype: String, uri: String, ctype: String, clen: Long,
      bodyStart: Int, nextOff: Int,
      recordId: String = null, refersTo: String = null,
      payloadDigest: String = null)

  /** Parse ONE record's framing at `start` — the kernel [[warcWalk]] loops
    * over and [[warcRecordAt]] applies to a CDX-selected slice, so the
    * framing rules cannot diverge between the whole-segment and
    * range-selected paths (ISO 28500: version line, CRLF headers, blank
    * line, Content-Length body, CRLF CRLF).
    */
  private def warcFrameAt(bytes: Array[Byte], start: Int): WarcFrame = {
    def line(from: Int): (String, Int) = {
      var e = from
      while (e + 1 < bytes.length &&
        !(bytes(e) == '\r' && bytes(e + 1) == '\n')) e += 1
      if (e + 1 >= bytes.length) (null, bytes.length)
      else (new String(bytes, from, e - from, "UTF-8"), e + 2)
    }
    val bad = WarcFrame(ok = false, verMissing = false, verNonEmpty = false,
      truncated = false, null, null, null, -1L, -1, -1)
    val (ver, p0) = line(start)
    if (ver == null || !ver.startsWith("WARC/"))
      bad.copy(verMissing = ver == null,
        verNonEmpty = ver != null && ver.nonEmpty)
    else {
      var p = p0
      var wtype: String = null
      var uri: String = null
      var ctype: String = null
      var clen = -1L
      var recId: String = null
      var refersTo: String = null
      var digest: String = null
      var headersOk = true
      var blank = false
      while (!blank && headersOk) {
        val (h, np) = line(p)
        p = np
        if (h == null) headersOk = false
        else if (h.isEmpty) blank = true
        else {
          val ci = h.indexOf(':')
          if (ci > 0) {
            val k = h.substring(0, ci).trim.toLowerCase
            val v = h.substring(ci + 1).trim
            k match {
              case "warc-type" => wtype = v
              case "warc-target-uri" => uri = v
              case "content-type" => ctype = v
              case "content-length" =>
                clen = try v.toLong catch { case _: NumberFormatException => -1L }
              // revisit identity (ISO 28500 §5.11/§6.7.2): a revisit
              // record names the capture it duplicates by record id
              // and/or payload digest — the crawl-side dedup key
              case "warc-record-id" => recId = v
              case "warc-refers-to" => refersTo = v
              case "warc-payload-digest" => digest = v
              case _ => ()
            }
          }
        }
      }
      if (!headersOk || clen < 0 || p + clen > bytes.length) bad.copy(truncated = true)
      else {
        var o = p + clen.toInt
        // trailing CRLF CRLF between records (spec); tolerate EOF
        var skip = 0
        while (skip < 4 && o < bytes.length &&
          (bytes(o) == '\r' || bytes(o) == '\n')) { o += 1; skip += 1 }
        WarcFrame(ok = true, verMissing = false, verNonEmpty = false,
          truncated = false, wtype, uri, ctype, clen, p, o,
          recId, refersTo, digest)
      }
    }
  }

  private def warcWalk(df: DataFrame, payloadCol: String,
      emitBytes: Boolean): DataFrame = {
    val cols =
      if (emitBytes) warcCols.map(f =>
        if (f.name == "content_text") StructField("content_bytes", BinaryType) else f)
      else warcCols
    val opName = if (emitBytes) "warcRecordBytes" else "warcRecords"
    Multimodal.requireFreshColumns(df, opName, cols.map(_.name))
    val schema = StructType(df.schema.fields ++ cols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val errRow = (msg: String) =>
          Seq(Row.fromSeq(r.toSeq ++
            Seq(null, null, null, null, null, null, null, null, null, msg)))
        if (r.isNullAt(idx)) errRow("null payload")
        else try {
          val bytes = Archives.inflateIfCompressed(r.getAs[Array[Byte]](idx))
          val recs = scala.collection.mutable.ArrayBuffer.empty[Row]
          var o = 0
          var recIdx = 0
          var tailErr: String = null
          var done = false
          while (!done && o < bytes.length) {
            val f = warcFrameAt(bytes, o)
            if (!f.ok) {
              if (f.truncated) tailErr = "truncated or malformed record"
              else if (recIdx == 0) tailErr = "not a WARC stream (no version line)"
              else if (f.verNonEmpty) tailErr = "malformed record tail"
              else if (f.verMissing && o < bytes.length)
                // bytes remain but no CRLF-terminated version line could
                // be read: the NEXT record's version line was cut at EOF
                // — a vanishing record would be indistinguishable from a
                // clean segment end ("the tail is reported" contract)
                tailErr = "truncated record tail"
              done = true
            } else {
              val body: Any =
                if (emitBytes) java.util.Arrays.copyOfRange(
                  bytes, f.bodyStart, f.bodyStart + f.clen.toInt)
                else new String(bytes, f.bodyStart, f.clen.toInt, "UTF-8")
              recs += Row.fromSeq(r.toSeq ++
                Seq(recIdx, f.wtype, f.uri, f.ctype, f.clen,
                  f.recordId, f.refersTo, f.payloadDigest, body, null))
              recIdx += 1
              o = f.nextOff
            }
          }
          if (recs.isEmpty) errRow(if (tailErr != null) tailErr else "empty stream")
          else {
            if (tailErr != null)
              recs += Row.fromSeq(r.toSeq ++
                Seq(recIdx, null, null, null, null, null, null, null, null, tailErr))
            recs.toSeq
          }
        } catch { case e: Exception =>
          errRow(s"segment parse failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  private val BlockTags = Set("p", "div", "br", "li", "ul", "ol", "tr",
    "table", "h1", "h2", "h3", "h4", "h5", "h6", "title", "head", "body",
    "html", "blockquote", "pre", "section", "article", "header", "footer")

  private val NamedEntities = Map("amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> ' ')

  /** HTML → text, the WET-style extraction (imperative kernel — HTML is
    * not a regular language, so this is a character state machine, not
    * a regex chain): `<script>`/`<style>` blocks drop wholesale
    * (case-insensitive, to the matching close tag), comments drop,
    * block-level tags become newlines, inline tags vanish, named +
    * numeric entities decode, whitespace runs collapse (runs containing
    * a newline collapse to one '\n', others to one space), ends
    * trimmed. Null-safe (null → null).
    */
  /** Case-insensitive indexOf without lowercasing the whole document. */
  private def findIgnoreCaseIn(html: String, needle: String, from: Int): Int = {
    var p = from
    val last = html.length - needle.length
    while (p <= last && !html.regionMatches(true, p, needle, 0, needle.length)) p += 1
    if (p > last) -1 else p
  }

  /** QUOTE-AWARE index of the tag-closing '>' from `from` (just past
    * '<'): a '>' inside a quoted attribute value (onclick="if(a>b)…",
    * data-json='{"k":">"}') does not close the tag. -1 = unterminated.
    */
  private[ops] def tagEnd(html: String, from: Int): Int = {
    var p = from
    val n = html.length
    var quote: Char = 0
    while (p < n) {
      val c = html.charAt(p)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return p
      p += 1
    }
    -1
  }

  /** End of a script/style RAW-TEXT block: the index AFTER the closing
    * tag's '>'. Per HTML5 tokenization, "</name" only closes the block
    * when followed by whitespace, '/', '>' or EOF — "</scripts>" inside
    * JavaScript is script TEXT, and ending there would leak source code
    * into the extracted corpus text. html.length when unterminated.
    */
  private[ops] def rawTextEnd(html: String, from: Int, name: String): Int = {
    val close = "</" + name
    val n = html.length
    var p = from
    while (p <= n - close.length) {
      val e = findIgnoreCaseIn(html, close, p)
      if (e < 0) return n
      val after = e + close.length
      if (after >= n || { val d = html.charAt(after)
        d == '>' || d == '/' || d.isWhitespace }) {
        val g = html.indexOf('>', after)
        return if (g < 0) n else g + 1
      }
      p = e + 1
    }
    n
  }

  /** One entity at `s(i) == '&'`: appends the decoded char(s) to `sb`
    * and returns the index after the entity, or -1 when not a valid
    * entity (caller emits the literal '&'). ONE kernel for body text
    * and attribute values — the two must never disagree.
    */
  private def decodeEntityAt(s: String, i: Int,
      sb: java.lang.StringBuilder): Int = {
    val semi = s.indexOf(';', i + 1)
    if (semi <= i || semi - i > 10) return -1
    val ent = s.substring(i + 1, semi)
    // numeric entities: parseInt can SUCCEED on values appendCodePoint
    // rejects (negative, > U+10FFFF, surrogates) — validate instead of
    // relying on exceptions, or one crawled "&#x110000;" kills the job
    def appendNumeric(v: => Int): Boolean =
      try {
        val cp = v
        if (Character.isValidCodePoint(cp) &&
          !(cp >= 0xD800 && cp <= 0xDFFF)) { sb.appendCodePoint(cp); true }
        else false
      } catch { case _: NumberFormatException => false }
    val consumed =
      if (ent.startsWith("#x") || ent.startsWith("#X"))
        appendNumeric(Integer.parseInt(ent.substring(2), 16))
      else if (ent.startsWith("#"))
        appendNumeric(Integer.parseInt(ent.substring(1)))
      else NamedEntities.get(ent.toLowerCase) match {
        case Some(ch) => sb.append(ch); true
        case None => false
      }
    if (consumed) semi + 1 else -1
  }

  private[ops] def extractText(html: String): String = {
    if (html == null) return null
    val sb = new java.lang.StringBuilder(html.length)
    val n = html.length
    var i = 0
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    // HTML5 tag names end at '>', '/', or whitespace — without this
    // boundary check, custom elements like <style-guide> would match the
    // <style> raw-text rule and their content would be dropped
    def tagNameEndsAt(p: Int): Boolean =
      p >= n || { val d = html.charAt(p); d == '>' || d == '/' || d.isWhitespace }
    while (i < n) {
      val c = html.charAt(i)
      // HTML5 tokenization: '<' opens a tag only before an ASCII alpha,
      // '/', '!' or '?' (NOT any Unicode letter — a CJK/Cyrillic char
      // after '<' in prose is literal text); a bare '<' in prose
      // ("1 < 2") is literal too — swallowing to the next '>' would
      // silently delete content
      if (c == '<' && i + 1 < n && {
        val d = html.charAt(i + 1)
        (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') ||
          d == '/' || d == '!' || d == '?'
      }) {
        if (lowerAt(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (lowerAt(i, "<script") && tagNameEndsAt(i + 7)) {
          i = rawTextEnd(html, i + 7, "script")
        } else if (lowerAt(i, "<style") && tagNameEndsAt(i + 6)) {
          i = rawTextEnd(html, i + 6, "style")
        } else {
          val e = tagEnd(html, i + 1)
          if (e < 0) i = n
          else {
            var ts = i + 1
            if (ts < n && html.charAt(ts) == '/') ts += 1
            var te = ts
            while (te < e && html.charAt(te).isLetterOrDigit) te += 1
            val tag = html.substring(ts, te).toLowerCase
            if (BlockTags.contains(tag)) sb.append('\n')
            i = e + 1
          }
        }
      } else if (c == '&') {
        val next = decodeEntityAt(html, i, sb)
        if (next > 0) i = next else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    // whitespace collapse: runs with '\n' → one newline, others → one space
    val raw = sb.toString
    val out = new java.lang.StringBuilder(raw.length)
    var j = 0
    val m = raw.length
    while (j < m) {
      val ch = raw.charAt(j)
      if (Character.isWhitespace(ch)) {
        var k = j
        var hasNl = false
        while (k < m && Character.isWhitespace(raw.charAt(k))) {
          if (raw.charAt(k) == '\n') hasNl = true
          k += 1
        }
        if (out.length > 0 && k < m) out.append(if (hasNl) '\n' else ' ')
        j = k
      } else { out.append(ch); j += 1 }
    }
    out.toString
  }

  /** Column form of [[extractText]]: adds `html_text` (and
    * `html_text_chars`). UDF cost is the honest price — HTML needs a
    * state machine; the kernel is one pass per row inside the scan,
    * no shuffle.
    */
  def htmlText(df: DataFrame, htmlCol: String): DataFrame = {
    Multimodal.requireFreshColumns(df, "htmlText",
      Seq("html_text", "html_text_chars"))
    val f = udf((s: String) => extractText(s))
    df.withColumn("html_text", f(col(htmlCol)))
      .withColumn("html_text_chars",
        coalesce(length(col("html_text")).cast("long"), lit(0L)))
  }

  /** Entity decode for attribute values (`&amp;` inside hrefs is the
    * overwhelmingly common case). Same named set + numeric validation
    * as [[extractText]].
    */
  private def decodeAttrEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val next = decodeEntityAt(s, i, sb)
        if (next > 0) i = next else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over a path. */
  private[ops] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val e = in.indexOf('/', from)
        val seg = if (e < 0) in else in.substring(0, e)
        out += seg
        in = if (e < 0) "" else in.substring(e)
      }
    }
    out.mkString
  }

  /** RFC 3986 §5.2 reference resolution, specialized to the crawl
    * frontier: returns the absolute http(s) URL a reference reaches from
    * `base`, or null for references a fetcher cannot follow — pure
    * fragments and empty hrefs (same-document by definition) and
    * non-http(s) schemes (`javascript:`, `mailto:`, `data:`, …).
    * Fragments never survive (they name a position, not a resource —
    * the same rule [[graft.ops.TextAnalysis.surtKey]] applies).
    */
  private[ops] def resolveRef(base: String, ref0: String): String = {
    if (base == null || ref0 == null) return null
    var ref = ref0.trim
    val hash = ref.indexOf('#')
    if (hash >= 0) ref = ref.substring(0, hash).trim
    if (ref.isEmpty) return null // pure fragment / empty href: same doc
    // absolute reference: scheme-gated
    var k = 0
    val c0 = if (ref.nonEmpty) ref.charAt(0) else ' '
    if ((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')) {
      k = 1
      while (k < ref.length && {
        val ch = ref.charAt(k)
        (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z') ||
          (ch >= '0' && ch <= '9') || ch == '+' || ch == '-' || ch == '.'
      }) k += 1
      if (k < ref.length && ref.charAt(k) == ':') {
        val scheme = ref.substring(0, k).toLowerCase
        if (scheme != "http" && scheme != "https") return null
        // §5.2.2 applies remove_dot_segments to ABSOLUTE references too:
        // "http://h/a/../b" must equal the resolution of "/a/../b"
        val si = ref.indexOf("://")
        val rrest = ref.substring(si + 3)
        var sl = 0
        while (sl < rrest.length && rrest.charAt(sl) != '/' &&
          rrest.charAt(sl) != '?') sl += 1
        if (sl >= rrest.length) return ref // no path, nothing to remove
        val rq = rrest.indexOf('?', sl)
        val rpath = if (rq >= 0) rrest.substring(sl, rq) else rrest.substring(sl)
        val rquery = if (rq >= 0) rrest.substring(rq) else ""
        return ref.substring(0, si + 3) + rrest.substring(0, sl) +
          removeDotSegments(rpath) + rquery
      }
    }
    val sIdx = base.indexOf("://")
    if (sIdx <= 0) return null // relative link under an unusable base
    val scheme = base.substring(0, sIdx).toLowerCase
    if (scheme != "http" && scheme != "https") return null
    val rest = base.substring(sIdx + 3)
    var slash = 0
    while (slash < rest.length && rest.charAt(slash) != '/' &&
      rest.charAt(slash) != '?') slash += 1
    val auth = rest.substring(0, slash)
    if (auth.isEmpty) return null
    val pathAndQ = rest.substring(slash)
    val qIdx = pathAndQ.indexOf('?')
    val basePath = if (qIdx >= 0) pathAndQ.substring(0, qIdx) else pathAndQ
    // dot-segment removal applies to the PATH only (RFC 3986 §5.3) — a
    // query carrying '/../' (common in redirect-target params) must
    // survive verbatim, so split the reference's query off first
    val rq = ref.indexOf('?')
    val (refPath, refQuery) =
      if (rq < 0) (ref, "") else (ref.substring(0, rq), ref.substring(rq))
    if (ref.startsWith("//")) {
      var pStart = 2
      while (pStart < refPath.length && refPath.charAt(pStart) != '/') pStart += 1
      if (pStart >= refPath.length) scheme + ":" + ref
      else scheme + ":" + refPath.substring(0, pStart) +
        removeDotSegments(refPath.substring(pStart)) + refQuery
    }
    else if (ref.startsWith("/"))
      scheme + "://" + auth + removeDotSegments(refPath) + refQuery
    else if (ref.startsWith("?"))
      scheme + "://" + auth + (if (basePath.isEmpty) "/" else basePath) + ref
    else {
      val cut = basePath.lastIndexOf('/')
      val dir = if (cut < 0) "/" else basePath.substring(0, cut + 1)
      scheme + "://" + auth + removeDotSegments(dir + refPath) + refQuery
    }
  }

  /** One-pass `<a href>` extraction (same HTML5 tokenization rules as
    * [[extractText]]: comments and `<script>`/`<style>` raw-text blocks
    * are skipped wholesale, a tag opens only before alpha/'/'/'!'/'?'),
    * then every href resolves through [[resolveRef]] against the
    * effective base — the FIRST `<base href>` (itself resolved against
    * the document URL, and applied to every SUBSEQUENT link per HTML5
    * scoping; links before it resolve against the document URL) or the
    * document URL when absent. Entity-decoded hrefs (`&amp;` is routine
    * in real query strings). Document order, duplicates kept — dedup is
    * the frontier's next stage, not the extractor's job.
    */
  private[ops] def extractLinksFrom(html: String, docUrl: String): Seq[String] = {
    if (html == null) return null
    val n = html.length
    var i = 0
    def lowerAt(p: Int, s: String): Boolean =
      p + s.length <= n && html.regionMatches(true, p, s, 0, s.length)
    def tagNameEndsAt(p: Int): Boolean =
      p >= n || { val d = html.charAt(p); d == '>' || d == '/' || d.isWhitespace }
    // attribute scan inside [from, to): returns href value or null
    def hrefIn(from: Int, to: Int): String = {
      var p = from
      while (p < to) {
        while (p < to && (html.charAt(p).isWhitespace || html.charAt(p) == '/')) p += 1
        val ns = p
        while (p < to && { val d = html.charAt(p)
          d.isLetterOrDigit || d == '-' || d == '_' || d == ':' }) p += 1
        if (p == ns) { p += 1 } // stray char: step over
        else {
          val name = html.substring(ns, p)
          var q = p
          while (q < to && html.charAt(q).isWhitespace) q += 1
          if (q < to && html.charAt(q) == '=') {
            q += 1
            while (q < to && html.charAt(q).isWhitespace) q += 1
            val (vs, ve, next) =
              if (q < to && (html.charAt(q) == '"' || html.charAt(q) == '\'')) {
                val quote = html.charAt(q)
                val e = html.indexOf(quote, q + 1)
                if (e < 0 || e > to) (q + 1, to, to) else (q + 1, e, e + 1)
              } else {
                var e = q
                while (e < to && !html.charAt(e).isWhitespace) e += 1
                (q, e, e)
              }
            if (name.equalsIgnoreCase("href"))
              return decodeAttrEntities(html.substring(vs, ve))
            p = next
          }
          // valueless attribute: p already past the name
        }
      }
      null
    }
    // (href, seenAfterBase): HTML5 scopes <base href> to URLs of
    // SUBSEQUENT elements only — links before the first <base> resolve
    // against the document URL (body-positioned base tags exist in
    // crawled garbage; retroactive application would rewrite them).
    val raw = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    var baseHref: String = null
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n && {
        val d = html.charAt(i + 1)
        (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') ||
          d == '/' || d == '!' || d == '?'
      }) {
        if (lowerAt(i, "<!--")) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (lowerAt(i, "<script") && tagNameEndsAt(i + 7)) {
          i = rawTextEnd(html, i + 7, "script")
        } else if (lowerAt(i, "<style") && tagNameEndsAt(i + 6)) {
          i = rawTextEnd(html, i + 6, "style")
        } else {
          val e = tagEnd(html, i + 1)
          if (e < 0) i = n
          else {
            if (lowerAt(i, "<a") && tagNameEndsAt(i + 2)) {
              val h = hrefIn(i + 2, e)
              if (h != null) raw += ((h, baseHref != null))
            } else if (lowerAt(i, "<base") && tagNameEndsAt(i + 5) &&
              baseHref == null) {
              val h = hrefIn(i + 5, e)
              if (h != null) baseHref = h
            }
            i = e + 1
          }
        }
      } else i += 1
    }
    val effBase =
      if (baseHref == null) docUrl
      else resolveRef(docUrl, baseHref) match {
        case null => docUrl // unusable base href: fall back to the doc URL
        case b => b
      }
    raw.map { case (h, afterBase) =>
      resolveRef(if (afterBase) effBase else docUrl, h)
    }.filter(_ != null).toSeq
  }

  /** Column form of [[extractLinksFrom]] — the missing edge that closes
    * the crawl frontier loop (fetch → parse → EXTRACT LINKS →
    * canonicalize → dedup vs visited → robots gate → politeness
    * schedule). Appends `link_urls: array<string>` (absolute fetchable
    * http(s) URLs, document order, duplicates kept). UDF cost is the
    * honest price — HTML needs a state machine; one pass per row inside
    * the scan, zero shuffle at any corpus size.
    */
  def extractLinks(df: DataFrame, htmlCol: String, urlCol: String): DataFrame = {
    Multimodal.requireFreshColumns(df, "extractLinks", Seq("link_urls"))
    val f = udf((html: String, u: String) => extractLinksFrom(html, u))
    df.withColumn("link_urls", f(col(htmlCol), col(urlCol)))
  }

  /** Deterministic synthetic WARC segment: a `warcinfo` record plus a
    * `conversion` record carrying `body` for `uriKey`; `gzipped = true`
    * wraps the whole segment in one gzip member (the inflate path —
    * byte content identical after inflation, so one oracle covers
    * both). CRLF framing exactly per ISO 28500.
    */
  /** One framed WARC record (ISO 28500: version line, headers +
    * Content-Length, blank line, content, CRLF CRLF) — the layout kernel
    * both synthetic generators share, so framing rules cannot diverge.
    */
  private def warcFrameRecord(out: java.io.ByteArrayOutputStream,
      headers: Seq[(String, String)], content: Array[Byte]): Unit = {
    val sb = new StringBuilder("WARC/1.0\r\n")
    (headers :+ ("Content-Length" -> content.length.toString)).foreach {
      case (k, v) => sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("\r\n")
    out.write(sb.toString.getBytes("UTF-8"))
    out.write(content)
    out.write("\r\n\r\n".getBytes("UTF-8"))
  }

  val syntheticWarc: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((uriKey: Long, body: String, gzipped: Boolean) => {
      val out = new java.io.ByteArrayOutputStream()
      warcFrameRecord(out,
        Seq("WARC-Type" -> "warcinfo", "Content-Type" -> "application/warc-fields"),
        "software: graft-synthetic\r\n".getBytes("UTF-8"))
      warcFrameRecord(out,
        Seq("WARC-Type" -> "conversion",
          "WARC-Target-URI" -> s"http://example.com/doc/$uriKey",
          "Content-Type" -> "text/html"),
        (if (body == null) "" else body).getBytes("UTF-8"))
      Archives.gzipWrap(out.toByteArray, gzipped)
    })

  /** Synthetic raw-crawl page: one `response` record at an ARBITRARY
    * target URI whose body is an HTTP 200 text/html message carrying
    * `html` — the frontier-loop fixture shape, where the page URL must
    * drive relative-link resolution downstream. `gzipped` wraps the
    * segment (the inflate path).
    */
  val syntheticWarcPage: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((pageUrl: String, html: String, gzipped: Boolean) => {
      val out = new java.io.ByteArrayOutputStream()
      val http = new java.io.ByteArrayOutputStream()
      http.write(("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n\r\n").getBytes("ISO-8859-1"))
      http.write((if (html == null) "" else html).getBytes("UTF-8"))
      warcFrameRecord(out,
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> pageUrl,
          "Content-Type" -> "application/http;msgtype=response"),
        http.toByteArray)
      Archives.gzipWrap(out.toByteArray, gzipped)
    })

  private val httpCols = Seq(
    StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("http_charset", StringType),
    StructField("http_location", StringType),
    StructField("http_body", StringType),
    StructField("parse_error", StringType))

  // hoisted: a fresh Pattern.compile per record would run millions of
  // times on the flagship's per-record hot path. Single-quoted charset
  // values are common in the wild; both quote kinds tolerated.
  private val CharsetRe = "charset=[\"']?([^\"';\\s]+)".r

  /** RFC 9112 §7.1 chunked decoding: hex size line (extensions after ';'
    * ignored), chunk bytes, CRLF, …, 0-chunk ends. Throws on malformed
    * framing — the caller degrades the record by name.
    */
  private def dechunk(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var o = from
    var done = false
    while (!done) {
      var e = o
      while (e < to && b(e) != '\r' && b(e) != '\n') e += 1
      val line = new String(b, o, e - o, "ISO-8859-1")
      val hex = line.takeWhile(c => Character.digit(c, 16) >= 0)
      if (hex.isEmpty || e >= to)
        throw new java.io.IOException("malformed chunk size line")
      val sz = java.lang.Integer.parseInt(hex, 16)
      o = e + (if (b(e) == '\r' && e + 1 < to && b(e + 1) == '\n') 2 else 1)
      if (sz == 0) done = true
      else if (o + sz > to) throw new java.io.IOException("truncated chunk")
      else {
        out.write(b, o, sz)
        o += sz
        if (o + 1 < to && b(o) == '\r' && b(o + 1) == '\n') o += 2
        else if (o < to && b(o) == '\n') o += 1
      }
    }
    out.toByteArray
  }

  /** HTTP response parse — the piece between [[warcRecordBytes]] and
    * [[htmlText]] for RAW (non-WET) crawls, where each `response`
    * record's body is an HTTP message (RFC 9112): status line, headers,
    * blank line, entity body. Status code, media type, and the
    * `charset=` parameter are parsed from the head (ASCII by spec), and
    * the BODY IS DECODED WITH ITS DECLARED CHARSET through the JDK's
    * codec registry (UTF-8 when absent or unsupported) — the reason this
    * op needs bytes, not pre-decoded text: a latin-1/cp1252 page decoded
    * as UTF-8 up front is mangled before the charset is even known.
    * Per-record degradation; non-HTTP payloads report themselves.
    */
  def httpResponses(df: DataFrame,
      bytesCol: String = "content_bytes"): DataFrame = {
    Multimodal.requireFreshColumns(df, "httpResponses", httpCols.map(_.name))
    val schema = StructType(df.schema.fields ++ httpCols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        def errRow(msg: String) =
          Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, msg))
        if (r.isNullAt(idx)) errRow("null body")
        else try {
          val b = r.getAs[Array[Byte]](idx)
          // head/body split at the first EMPTY LINE, where each line may
          // end in CRLF or bare LF INDEPENDENTLY (mixed delimiters like
          // "\n\r\n" occur in the wild; a strict CRLFCRLF-or-LFLF pair
          // scan rejects them)
          var split = -1
          var bodyAt = -1
          var i = 0
          while (split < 0 && i < b.length) {
            val t1 =
              if (b(i) == '\r' && i + 1 < b.length && b(i + 1) == '\n') 2
              else if (b(i) == '\n') 1 else 0
            if (t1 > 0) {
              val j = i + t1
              val t2 =
                if (j < b.length && b(j) == '\r' && j + 1 < b.length && b(j + 1) == '\n') 2
                else if (j < b.length && b(j) == '\n') 1 else 0
              if (t2 > 0) { split = i; bodyAt = j + t2 }
            }
            i += 1
          }
          if (split < 0) errRow("no HTTP head/body delimiter")
          else {
            val head = new String(b, 0, split, "ISO-8859-1")
            val lines = head.split("\r\n|\n").map(_.stripSuffix("\r"))
            if (lines.isEmpty || !lines(0).startsWith("HTTP/"))
              errRow("not an HTTP response (no status line)")
            else {
              val parts = lines(0).split(" ", 3)
              val status =
                try parts(1).trim.toInt
                catch { case _: Exception => -1 }
              if (status < 0) errRow("malformed status line")
              else {
                var ctype: String = null
                var tenc: String = null
                var cenc: String = null
                var location: String = null
                lines.drop(1).foreach { h =>
                  val ci = h.indexOf(':')
                  if (ci > 0) {
                    val k = h.substring(0, ci).trim.toLowerCase
                    val v = h.substring(ci + 1).trim
                    k match {
                      case "content-type" => ctype = v
                      case "transfer-encoding" => tenc = v.toLowerCase
                      case "content-encoding" => cenc = v.toLowerCase
                      // the 3xx hop target — a crawl-audit user needs the
                      // redirect CHAIN, not just the status
                      case "location" => location = v
                      case _ => ()
                    }
                  }
                }
                // the record holds the payload AS TRANSMITTED: dechunk
                // first (transfer happens outermost), then content-decode
                // — decoding gzip bytes "as charset text" would ship
                // silent mojibake into the corpus with parse_error null
                val raw0: Array[Byte] =
                  if (tenc != null && tenc.contains("chunked"))
                    dechunk(b, bodyAt, b.length)
                  else java.util.Arrays.copyOfRange(b, bodyAt, b.length)
                val unsupportedEnc =
                  cenc != null && cenc != "identity" &&
                    cenc != "gzip" && cenc != "x-gzip"
                if (unsupportedEnc)
                  errRow(s"unsupported content-encoding: $cenc")
                else if (tenc != null && tenc.split(",").map(_.trim)
                    .exists(t => t.nonEmpty && t != "chunked" &&
                      t != "identity"))
                  // "gzip, chunked" is legal HTTP (chunked applied last)
                  // but after de-chunking the gzip TRANSFER coding would
                  // remain and charset-decode into silent mojibake — ANY
                  // coding beyond chunked/identity refuses by name
                  errRow(s"unsupported transfer-encoding: $tenc")
                else if ((cenc == "gzip" || cenc == "x-gzip") &&
                    !(raw0.length >= 2 && raw0(0) == 0x1f.toByte &&
                      raw0(1) == 0x8b.toByte))
                  // gunzipIfNeeded only acts on the 1f 8b magic — a body
                  // DECLARED gzip but corrupt/truncated at byte 0 would
                  // fall through it and charset-decode raw deflate bytes
                  // into silent mojibake with parse_error null; refuse by
                  // name instead
                  errRow("declared gzip but no gzip magic")
                else {
                  val raw =
                    if (cenc == "gzip" || cenc == "x-gzip")
                      Archives.gunzipIfNeeded(raw0)
                    else raw0
                  val media =
                    if (ctype == null) null
                    else ctype.takeWhile(_ != ';').trim.toLowerCase
                  val declared =
                    if (ctype == null) null
                    else CharsetRe.findFirstMatchIn(ctype.toLowerCase)
                      .map(_.group(1)).orNull
                  // http_charset reports the charset the body was ACTUALLY
                  // decoded with; an unsupported declared value falls back
                  // to UTF-8 and reports null rather than lying
                  val (cs, csOut) =
                    try {
                      val c = java.nio.charset.Charset.forName(
                        if (declared == null) "UTF-8" else declared)
                      (c, declared)
                    } catch { case _: Exception =>
                      (java.nio.charset.StandardCharsets.UTF_8, null)
                    }
                  val body = new String(raw, cs)
                  Row.fromSeq(r.toSeq ++
                    Seq(status, media, csOut, location, body, null))
                }
              }
            }
          }
        } catch { case e: Exception =>
          errRow(s"http parse failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  /** cdxj index-line parse — the SELECTION side of a raw crawl: a real
    * Common Crawl consumer never scans whole WARC segments, they pick
    * records from the CDX(J) index (`urlkey timestamp {json}` per line,
    * the JSON block carrying filename/offset/length as STRINGS plus
    * status/mime/digest/url) and range-fetch exactly those byte spans.
    * Entirely declarative — split + `from_json` + `try_cast`, zero UDF,
    * fully codegen'd — because a cdxj line IS structured text, not a
    * byte format. Appends urlkey, cdx_timestamp, cdx_url, cdx_filename,
    * cdx_offset, cdx_length (longs via try_cast: a malformed number
    * degrades the LINE, never the pass), cdx_status (int), cdx_mime,
    * cdx_digest, parse_error. Per-line degradation: no JSON block,
    * missing urlkey/timestamp head fields, unparseable JSON, and missing
    * offset/length each name themselves — a malformed head never yields
    * a silent-null urlkey that downstream joins would drop traceless.
    */
  def cdxjEntries(df: DataFrame, lineCol: String): DataFrame = {
    Multimodal.requireFreshColumns(df, "cdxjEntries", Seq("urlkey",
      "cdx_timestamp", "cdx_url", "cdx_filename", "cdx_offset",
      "cdx_length", "cdx_status", "cdx_mime", "cdx_digest", "parse_error"))
    val l = col(lineCol)
    val jAt = instr(l, "{") // 1-based; 0 when absent
    val head = split(trim(l.substr(lit(1), jAt - 1)), "\\s+")
    val js = from_json(l.substr(jAt, length(l) - jAt + 1), StructType(Seq(
      StructField("url", StringType), StructField("filename", StringType),
      StructField("offset", StringType), StructField("length", StringType),
      StructField("status", StringType), StructField("mime", StringType),
      StructField("digest", StringType))))
    df.withColumn("__j", when(jAt > 0, js))
      .withColumn("urlkey", when(jAt > 0 && size(head) >= 1, element_at(head, 1)))
      .withColumn("cdx_timestamp", when(size(head) >= 2, element_at(head, 2)))
      .withColumn("cdx_url", col("__j.url"))
      .withColumn("cdx_filename", col("__j.filename"))
      .withColumn("cdx_offset", expr("try_cast(__j.offset AS BIGINT)"))
      .withColumn("cdx_length", expr("try_cast(__j.length AS BIGINT)"))
      .withColumn("cdx_status", expr("try_cast(__j.status AS INT)"))
      .withColumn("cdx_mime", col("__j.mime"))
      .withColumn("cdx_digest", col("__j.digest"))
      .withColumn("parse_error",
        when(l.isNull, "null cdxj line")
          .when(jAt === 0, "no JSON block")
          .when(size(head) < 2, "missing urlkey/timestamp")
          .when(col("__j").isNull, "malformed JSON block")
          .when(col("cdx_offset").isNull || col("cdx_length").isNull,
            "missing or non-numeric offset/length"))
      .drop("__j")
  }

  private val recordAtCols = Seq(
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("record_id", StringType),
    StructField("warc_refers_to", StringType),
    StructField("payload_digest", StringType),
    StructField("content_bytes", BinaryType),
    StructField("parse_error", StringType))

  /** The FETCH side of CDX selection: parse the single WARC record at
    * `[offsetCol, offsetCol+lengthCol)` of the segment payload — the
    * Common Crawl layout stores each record as its own gzip member, so a
    * CDX (offset, length) span IS one complete record; a plain
    * (uncompressed) span parses identically. Same column contract as
    * [[warcRecordBytes]] (minus record_idx — selection names one record),
    * so [[httpResponses]] composes downstream unchanged. Narrow
    * per-record map, per-row degradation by name: at 100 TB the
    * (filename, offset, length) triple drives a storage range-read and
    * THIS op is everything that runs after it — only the selected spans
    * are ever decompressed or parsed, never the segment.
    */
  def warcRecordAt(df: DataFrame, payloadCol: String = "payload",
      offsetCol: String = "cdx_offset", lengthCol: String = "cdx_length"): DataFrame = {
    Multimodal.requireFreshColumns(df, "warcRecordAt", recordAtCols.map(_.name))
    val schema = StructType(df.schema.fields ++ recordAtCols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val pIdx = df.schema.fieldIndex(payloadCol)
    val oIdx = df.schema.fieldIndex(offsetCol)
    val lIdx = df.schema.fieldIndex(lengthCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        def errRow(msg: String) =
          Row.fromSeq(r.toSeq ++
            Seq(null, null, null, null, null, null, null, null, msg))
        if (r.isNullAt(pIdx)) errRow("null payload")
        else if (r.isNullAt(oIdx) || r.isNullAt(lIdx)) errRow("null offset/length")
        else try {
          val payload = r.getAs[Array[Byte]](pIdx)
          val off = r.getLong(oIdx)
          val len = r.getLong(lIdx)
          if (off < 0 || len <= 0 || off + len > payload.length)
            errRow(s"record span out of bounds ($off+$len of ${payload.length})")
          else {
            val slice = Archives.inflateIfCompressed(java.util.Arrays.copyOfRange(
              payload, off.toInt, (off + len).toInt))
            val f = warcFrameAt(slice, 0)
            if (!f.ok)
              errRow(if (f.truncated) "truncated or malformed record"
                else "no WARC record at offset")
            else Row.fromSeq(r.toSeq ++ Seq(f.wtype, f.uri, f.ctype, f.clen,
              f.recordId, f.refersTo, f.payloadDigest,
              java.util.Arrays.copyOfRange(slice, f.bodyStart,
                f.bodyStart + f.clen.toInt), null))
          }
        } catch { case e: Exception =>
          errRow(s"record parse failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  /** Synthetic Common-Crawl-layout segment WITH its CDX index: three
    * records (warcinfo, a 200 text/html response carrying `html`, a 404),
    * EACH gzip-wrapped as its own member and concatenated — the layout
    * that makes CDX (offset, length) spans independently fetchable — plus
    * one cdxj line per response record with the REAL member offsets and
    * lengths, filename `seg-<key>.warc.gz`, status/mime from the record.
    * Returns struct(payload binary, cdx array<string>).
    */
  val syntheticWarcCdx: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((uriKey: Long, html: String) => {
      def member(headers: Seq[(String, String)], content: Array[Byte]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        warcFrameRecord(b, headers, content)
        Archives.gzipWrap(b.toByteArray, gzipped = true)
      }
      def httpMsg(status: Int, reason: String, body: String): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        b.write((s"HTTP/1.1 $status $reason\r\n" +
          "Content-Type: text/html; charset=utf-8\r\n\r\n").getBytes("ISO-8859-1"))
        b.write(body.getBytes("UTF-8"))
        b.toByteArray
      }
      val info = member(
        Seq("WARC-Type" -> "warcinfo", "Content-Type" -> "application/warc-fields"),
        "software: graft-synthetic\r\n".getBytes("UTF-8"))
      val ok = member(
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"http://example.com/doc/$uriKey",
          "Content-Type" -> "application/http; msgtype=response"),
        httpMsg(200, "OK", if (html == null) "" else html))
      val gone = member(
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"http://example.com/gone/$uriKey",
          "Content-Type" -> "application/http; msgtype=response"),
        httpMsg(404, "Not Found", "<p>gone</p>"))
      val segment = info ++ ok ++ gone
      val fn = s"seg-$uriKey.warc.gz"
      def cdxLine(urlkeyPath: String, status: Int, off: Long, len: Int): String =
        s"com,example)/$urlkeyPath/$uriKey 20240101000000 " +
          s"""{"url": "http://example.com/$urlkeyPath/$uriKey", """ +
          s""""mime": "text/html", "status": "$status", """ +
          s""""digest": "sha1:NONE", "length": "$len", """ +
          s""""offset": "$off", "filename": "$fn"}"""
      (segment, Seq(
        cdxLine("doc", 200, info.length.toLong, ok.length),
        cdxLine("gone", 404, (info.length + ok.length).toLong, gone.length)))
    })

  /** WET-style EXPORT — the writer side of [[warcRecords]]: pack each
    * group's documents into one WARC segment (a `warcinfo` record, then
    * one `conversion` record per document in `idCol` order, framed by the
    * same [[warcFrameRecord]] kernel the synthetic generators use, so
    * reader and writer framing cannot diverge). `gzipped` wraps the
    * segment whole. This is the interchange shape a curation pipeline
    * exports filtered text in — what this writer produces, [[warcRecords]]
    * (or any WET consumer) reads back record-for-record.
    *
    * Scale shape: one groupBy on the segment key — per-task state is ONE
    * segment's documents (the caller picks granularity: shard ids from
    * [[Packing.shardLayout]], doc_id ranges, …), never the corpus.
    * Returns (groupCol, n_records, payload).
    */
  def wetSegments(df: DataFrame, groupCol: String, idCol: String,
      uriCol: String, textCol: String, gzipped: Boolean = false,
      warcDate: String = "2024-01-01T00:00:00Z"): DataFrame = {
    Multimodal.requireFreshColumns(df, "wetSegments",
      Seq("n_records", "payload", "__recs"))
    val pack = udf((groupKey: String, recs: Seq[Row], gz: Boolean) => {
      // deterministic WARC-Record-IDs (name-based UUIDs over group+index)
      // keep the export reproducible bit-for-bit; WARC-Record-ID and
      // WARC-Date are MANDATORY per ISO 28500 — a validating external
      // consumer rejects records without them
      def rid(tag: String): String = "<urn:uuid:" +
        java.util.UUID.nameUUIDFromBytes(
          s"graft-wet:$groupKey:$tag".getBytes("UTF-8")) + ">"
      val base = Seq("WARC-Date" -> warcDate)
      val out = new java.io.ByteArrayOutputStream()
      warcFrameRecord(out,
        Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> rid("info"),
          "Content-Type" -> "application/warc-fields") ++ base,
        "software: graft-wet-export\r\n".getBytes("UTF-8"))
      recs.zipWithIndex.foreach { case (r, i) =>
        // header values are CR/LF-sanitized (percent-encoded): a URI
        // carrying a raw CRLF would otherwise TRUNCATE its own header and
        // inject the remainder as a forged header line — silent
        // corruption on read-back with parse_error null. A null URI omits
        // the header entirely (and reads back null, not "null").
        val uriHdr =
          if (r.isNullAt(1)) Seq.empty
          else Seq("WARC-Target-URI" ->
            r.getString(1).replace("\r", "%0D").replace("\n", "%0A"))
        warcFrameRecord(out,
          Seq("WARC-Type" -> "conversion", "WARC-Record-ID" -> rid(i.toString)) ++
            uriHdr ++ Seq("Content-Type" -> "text/plain") ++ base,
          (if (r.isNullAt(2)) "" else r.getString(2)).getBytes("UTF-8"))
      }
      Archives.gzipWrap(out.toByteArray, gz)
    })
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_records"),
        array_sort(collect_list(struct(col(idCol), col(uriCol), col(textCol))))
          .as("__recs"))
      .withColumn("payload",
        pack(col(groupCol).cast("string"), col("__recs"), lit(gzipped)))
      .drop("__recs")
  }

  /** Full-WARC EXPORT — the writer side of [[warcRecordAt]]: pack each
    * group's documents into one Common-Crawl-layout segment (a `warcinfo`
    * member, then one `response` record per document in `idCol` order,
    * EACH gzip-wrapped as its own member and concatenated — the layout
    * that makes CDX (offset, length) spans independently range-fetchable)
    * PLUS the segment's own cdxj index lines with the REAL member offsets
    * and lengths, so export produces the index its consumers select by.
    * Framing rides the same [[warcFrameRecord]] kernel as every reader
    * fixture (writer and reader cannot diverge); response bodies are
    * HTTP/1.1 messages (`status`, `mime; charset=utf-8`, entity body);
    * WARC-Record-ID is a deterministic name-based UUID and
    * WARC-Payload-Digest the sha1 of the entity body — reproducible
    * bit-for-bit. Header values CR/LF-sanitized like [[wetSegments]]
    * (a URI carrying a raw CRLF would forge header lines on read-back).
    *
    * Scale shape: one groupBy on the segment key — per-task state is one
    * segment's documents, never the corpus; the cdx lines travel WITH
    * their segment row, so `explode` + [[cdxjEntries]] + [[warcRecordAt]]
    * round-trips without a join. Returns (groupCol, n_records, payload,
    * cdx array<string>, warc_filename).
    */
  def warcSegments(df: DataFrame, groupCol: String, idCol: String,
      uriCol: String, bodyCol: String, urlkeyCol: String,
      status: Int = 200, mime: String = "text/html",
      gzipped: Boolean = true,
      warcDate: String = "2024-01-01T00:00:00Z"): DataFrame = {
    Multimodal.requireFreshColumns(df, "warcSegments",
      Seq("n_records", "payload", "cdx", "warc_filename", "__recs", "__p"))
    val reason = status match {
      case 200 => "OK"
      case 301 => "Moved Permanently"
      case 404 => "Not Found"
      case _ => "Status"
    }
    val ts = warcDate.filter(_.isDigit).padTo(14, '0').take(14)
    val pack = udf((groupKey: String, recs: Seq[Row], gz: Boolean) => {
      def rid(tag: String): String = "<urn:uuid:" +
        java.util.UUID.nameUUIDFromBytes(
          s"graft-warc:$groupKey:$tag".getBytes("UTF-8")) + ">"
      def sanitize(s: String): String =
        s.replace("\r", "%0D").replace("\n", "%0A")
      val fn = s"graft-seg-$groupKey.warc.gz"
      val out = new java.io.ByteArrayOutputStream()
      def member(headers: Seq[(String, String)], content: Array[Byte]): Int = {
        val b = new java.io.ByteArrayOutputStream()
        warcFrameRecord(b, headers, content)
        val m = Archives.gzipWrap(b.toByteArray, gz)
        out.write(m)
        m.length
      }
      val base = Seq("WARC-Date" -> warcDate)
      member(
        Seq("WARC-Type" -> "warcinfo", "WARC-Record-ID" -> rid("info"),
          "Content-Type" -> "application/warc-fields") ++ base,
        s"software: graft-warc-export\r\nisPartOf: $fn\r\n".getBytes("UTF-8"))
      val cdx = scala.collection.mutable.ArrayBuffer.empty[String]
      recs.zipWithIndex.foreach { case (r, i) =>
        val body = (if (r.isNullAt(3)) "" else r.getString(3)).getBytes("UTF-8")
        val sha = java.security.MessageDigest.getInstance("SHA-1")
        val digest = "sha1:" + sha.digest(body).map("%02x".format(_)).mkString
        val http = new java.io.ByteArrayOutputStream()
        http.write((s"HTTP/1.1 $status $reason\r\n" +
          s"Content-Type: $mime; charset=utf-8\r\n\r\n").getBytes("ISO-8859-1"))
        http.write(body)
        val uriHdr =
          if (r.isNullAt(1)) Seq.empty
          else Seq("WARC-Target-URI" -> sanitize(r.getString(1)))
        val off = out.size().toLong
        val len = member(
          Seq("WARC-Type" -> "response",
            "WARC-Record-ID" -> rid(i.toString)) ++ uriHdr ++
            Seq("WARC-Payload-Digest" -> digest,
              "Content-Type" -> "application/http; msgtype=response") ++ base,
          http.toByteArray)
        // index line only when the record has a key to look it up by
        if (!r.isNullAt(2)) {
          // JSON-escape the url (a quote or backslash in a crawled URI
          // would otherwise corrupt the line) and keep the urlkey
          // single-field (cdxj head fields are space-delimited — a
          // space inside the key would shift the timestamp on parse)
          def jsonEsc(s: String): String =
            s.replace("\\", "\\\\").replace("\"", "\\\"")
          val url = if (r.isNullAt(1)) "" else jsonEsc(sanitize(r.getString(1)))
          // CR/LF in the key would split the cdx LINE itself — the same
          // injection class the uri/url sanitizers already close
          val key = sanitize(r.getString(2)).replace(" ", "%20")
          cdx += s"$key $ts " +
            s"""{"url": "$url", "mime": "$mime", "status": "$status", """ +
            s""""digest": "$digest", "length": "$len", """ +
            s""""offset": "$off", "filename": "$fn"}"""
        }
      }
      (out.toByteArray, cdx.toSeq, fn)
    })
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_records"),
        array_sort(collect_list(struct(col(idCol), col(uriCol),
          col(urlkeyCol), col(bodyCol)))).as("__recs"))
      .withColumn("__p",
        pack(col(groupCol).cast("string"), col("__recs"), lit(gzipped)))
      .select(col(groupCol), col("n_records"), col("__p._1").as("payload"),
        col("__p._2").as("cdx"), col("__p._3").as("warc_filename"))
  }

  /** Synthetic crawl segment exercising the two shapes a crawl-audit user
    * hits on file one: a 301 HOP (response at /start/<key> whose HTTP head
    * carries `Location: …/final/<key>`), the 200 landing at /final/<key>
    * (with a WARC-Record-ID and payload digest), and a REVISIT record at
    * /dup/<key> naming that capture via WARC-Refers-To + the same digest
    * (ISO 28500 §6.7.2 — the crawl-side dedup marker in every real crawl;
    * its body is the truncated HTTP head, per the identical-payload
    * profile). `gzipped` wraps the segment like [[syntheticWarc]].
    */
  val syntheticWarcRedirect: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((uriKey: Long, gzipped: Boolean) => {
      val out = new java.io.ByteArrayOutputStream()
      def http(head: String, body: Array[Byte]): Array[Byte] = {
        val b = new java.io.ByteArrayOutputStream()
        b.write(head.getBytes("ISO-8859-1")); b.write(body); b.toByteArray
      }
      val finalUri = s"http://example.com/final/$uriKey"
      val finalId = s"<urn:uuid:rec-$uriKey-final>"
      val startId = s"<urn:uuid:rec-$uriKey-start>"
      val digest = s"sha1:D$uriKey"
      warcFrameRecord(out,
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"http://example.com/start/$uriKey",
          "WARC-Record-ID" -> startId,
          "Content-Type" -> "application/http; msgtype=response"),
        http("HTTP/1.1 301 Moved Permanently\r\n" +
          s"Location: $finalUri\r\n\r\n", Array.emptyByteArray))
      warcFrameRecord(out,
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> finalUri,
          "WARC-Record-ID" -> finalId,
          "WARC-Payload-Digest" -> digest,
          "Content-Type" -> "application/http; msgtype=response"),
        http("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n",
          s"<p>landed $uriKey</p>".getBytes("UTF-8")))
      // every 5th revisit refers to the 301 capture, not the 200 final —
      // a revisit may point at ANY prior response record (soft-404 /
      // redirect recrawls); consumers must match all captures by
      // record_id, not just status-200 finals
      warcFrameRecord(out,
        Seq("WARC-Type" -> "revisit",
          "WARC-Target-URI" -> s"http://example.com/dup/$uriKey",
          "WARC-Record-ID" -> s"<urn:uuid:rec-$uriKey-dup>",
          "WARC-Refers-To" -> (if (uriKey % 5 == 4) startId else finalId),
          "WARC-Payload-Digest" -> digest,
          "WARC-Profile" -> "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
          "Content-Type" -> "application/http; msgtype=response"),
        http("HTTP/1.1 200 OK\r\n\r\n", Array.emptyByteArray))
      Archives.gzipWrap(out.toByteArray, gzipped)
    })

  /** Synthetic WARC segment with a `response` record whose body is a
    * REAL HTTP message: status from `status`, `Content-Type: text/html;
    * charset=<cs>`, and `html` ENCODED in that charset — so the
    * [[warcRecordBytes]] → [[httpResponses]] → [[htmlText]] raw-crawl
    * chain exercises genuine non-UTF-8 decoding end-to-end. `gzipped`
    * wraps the segment like [[syntheticWarc]].
    */
  val syntheticWarcResponse: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((uriKey: Long, html: String, status: Int, cs: String, gzipped: Boolean) => {
      val out = new java.io.ByteArrayOutputStream()
      val bodyBytes = (if (html == null) "" else html)
        .getBytes(java.nio.charset.Charset.forName(cs))
      val reason = if (status == 200) "OK" else "Not Found"
      val http = new java.io.ByteArrayOutputStream()
      http.write((s"HTTP/1.1 $status $reason\r\n" +
        s"Content-Type: text/html; charset=$cs\r\n" +
        s"X-Crawler: graft\r\n\r\n").getBytes("ISO-8859-1"))
      http.write(bodyBytes)
      warcFrameRecord(out,
        Seq("WARC-Type" -> "response",
          "WARC-Target-URI" -> s"http://example.com/doc/$uriKey",
          "Content-Type" -> "application/http; msgtype=response"),
        http.toByteArray)
      Archives.gzipWrap(out.toByteArray, gzipped)
    })
}
