package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF STRUCTURE census (ISO 32000 / the classic Adobe spec): the
  * filter gates a document-corpus pipeline runs before committing to
  * full text extraction — version, object/page census, the page tree's
  * declared /Count, and the /Encrypt gate — from one byte scan, no
  * rendering, no font machinery. Token scanning SKIPS stream bodies
  * (`stream`…`endstream`), because compressed content bytes can and do
  * contain accidental token look-alikes; the synthetic fixture plants a
  * decoy "/Type /Page" inside a stream to pin the skip.
  *
  * Same family contract as the other structure parsers: narrow
  * per-partition map, one clip's bytes in memory, per-document error
  * degradation, truncation keeps what was walked.
  */
object PdfStructure {

  // census regexes hoisted out of the per-record path (repo convention);
  // name-boundary lookaheads keep /PageLabel, /EncryptedAttachment and
  // friends from matching the bare names
  private val ObjRe = "\\d+\\s+\\d+\\s+obj\\b".r
  private val PageRe = "/Type\\s*/Page(?![A-Za-z])".r
  private val PagesRe = "/Type\\s*/Pages(?![A-Za-z])".r
  private val CountRe = "/Count\\s+(\\d+)".r
  private val EncryptRe = "/Encrypt(?![A-Za-z])".r
  private val XrefRe = "/Type\\s*/XRef\\b".r

  private val pdfCols = Seq(
    StructField("pdf_version", StringType),
    StructField("object_count", IntegerType),
    StructField("page_objects", IntegerType),
    StructField("declared_pages", IntegerType),
    StructField("is_encrypted", BooleanType),
    StructField("has_xref_stream", BooleanType),
    StructField("parse_error", StringType))

  /** One census row per document. `page_objects` counts `/Type /Page`
    * dictionaries outside streams (the physical page objects);
    * `declared_pages` reads the first page-tree node's `/Count`
    * (null when no `/Type /Pages` node is found — e.g. truncated or
    * xref-stream-only files whose tree sits inside an object stream).
    */
  def pdfCensus(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    Multimodal.requireFreshColumns(df, "pdfCensus", pdfCols.map(_.name))
    val schema = StructType(df.schema.fields ++ pdfCols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        def errRow(msg: String) = Row.fromSeq(r.toSeq ++
          Seq(null, null, null, null, null, null, msg))
        if (r.isNullAt(idx)) errRow("null payload")
        else try {
          val bytes = r.getAs[Array[Byte]](idx)
          // PDF is byte-oriented with ASCII structure tokens: scan the
          // bytes as Latin-1 so char == byte and regexes see raw bytes
          val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
          if (!s.startsWith("%PDF-")) errRow("not a PDF (no %PDF- header)")
          else {
            val verEnd = math.min(s.length, 8)
            val version = s.substring(5, verEnd).takeWhile(c => c.isDigit || c == '.')
            // walk non-stream segments. A body starts only at the spec's
            // keyword position — after the dict's ">>" (whitespace
            // between) and followed by an EOL: the bare substring
            // "stream" also occurs inside literals ("(Downstream
            // Analysis)") and inside "endstream", neither of which may
            // swallow the document body.
            def isBodyStart(st: Int): Boolean = {
              val after = st + 6
              val eolOk = after < s.length &&
                (s.charAt(after) == '\n' || s.charAt(after) == '\r')
              if (!eolOk) false
              else {
                var j = st - 1
                while (j >= 0 && Character.isWhitespace(s.charAt(j))) j -= 1
                j >= 1 && s.charAt(j) == '>' && s.charAt(j - 1) == '>'
              }
            }
            val sb = new java.lang.StringBuilder(s.length)
            var cur = 0
            var done = false
            while (!done) {
              val st = s.indexOf("stream", cur)
              if (st < 0) { sb.append(s, cur, s.length); done = true }
              else if (!isBodyStart(st)) {
                sb.append(s, cur, st + 6); cur = st + 6
              } else {
                sb.append(s, cur, st)
                val en = s.indexOf("endstream", st)
                if (en < 0) done = true // truncated inside a stream body
                else cur = en // keep "endstream" token out of scanned text
              }
            }
            val scan = sb.toString
            val objCount = ObjRe.findAllIn(scan).length
            val pageObjects = PageRe.findAllIn(scan).length
            // PDF dict keys are UNORDERED: /Count may precede /Type in
            // the same dict, and an unbounded forward search would bind
            // some other object's /Count — search the ENCLOSING dict
            // ... and dicts NEST (real Pages nodes carry /Resources etc.):
            // a naive lastIndexOf("<<")/indexOf(">>") around the match
            // would bound a nested child dict, not the Pages dict itself —
            // track << / >> depth in both directions from the match
            val declared = PagesRe.findFirstMatchIn(scan).flatMap { m =>
                var dictStart = -1
                var i = m.start - 2
                var depth = 0
                while (dictStart < 0 && i >= 0) {
                  if (scan.charAt(i) == '>' && scan.charAt(i + 1) == '>') { depth += 1; i -= 2 }
                  else if (scan.charAt(i) == '<' && scan.charAt(i + 1) == '<') {
                    if (depth == 0) dictStart = i else { depth -= 1; i -= 2 }
                  } else i -= 1
                }
                var dictEnd = -1
                i = m.start
                depth = 0
                while (dictEnd < 0 && i + 1 < scan.length) {
                  if (scan.charAt(i) == '<' && scan.charAt(i + 1) == '<') { depth += 1; i += 2 }
                  else if (scan.charAt(i) == '>' && scan.charAt(i + 1) == '>') {
                    if (depth == 0) dictEnd = i else { depth -= 1; i += 2 }
                  } else i += 1
                }
                if (dictStart < 0 || dictEnd < 0) None
                else {
                  // ...and /Count must be read at the Pages dict's OWN
                  // depth: the enclosing-dict substring still CONTAINS
                  // nested child dicts (/PieceInfo etc.) whose own /Count
                  // would shadow the page-tree count — strip every
                  // nested << … >> range before matching
                  val inner = scan.substring(dictStart + 2, dictEnd)
                  val top = new java.lang.StringBuilder(inner.length)
                  var j = 0
                  var d = 0
                  while (j < inner.length) {
                    if (j + 1 < inner.length && inner.charAt(j) == '<' &&
                        inner.charAt(j + 1) == '<') { d += 1; j += 2 }
                    else if (j + 1 < inner.length && inner.charAt(j) == '>' &&
                        inner.charAt(j + 1) == '>') { d = math.max(0, d - 1); j += 2 }
                    else {
                      if (d == 0) top.append(inner.charAt(j))
                      j += 1
                    }
                  }
                  CountRe.findFirstMatchIn(top.toString)
                    .map(_.group(1).toInt)
                }
              }
            // name boundary like PageRe: '/EncryptedAttachment' or a
            // literal '(see /Encrypt...)' string must not flag the doc
            // (this column gates text extraction — a false positive
            // silently drops the document from the corpus)
            val encrypted = EncryptRe.findFirstIn(scan).isDefined
            val xrefStream = XrefRe.findFirstIn(scan).isDefined
            Row.fromSeq(r.toSeq ++ Seq(version, objCount, pageObjects,
              declared.map(i => i: java.lang.Integer).orNull,
              encrypted, xrefStream, null))
          }
        } catch { case e: Exception =>
          errRow(s"pdf scan failed: ${e.getClass.getSimpleName}")
        }
      }
    }(enc)
  }

  /** Deterministic synthetic PDF: catalog + page tree (`/Count` =
    * nPages) + one page object per page + one content stream whose body
    * plants a DECOY "/Type /Page" (must not be counted) and binary-ish
    * filler; optional `/Encrypt` in the trailer; minimal xref/trailer
    * tail. Every census field is closed-form from the arguments.
    */
  val syntheticPdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((nPages: Int, minor: Int, encrypted: Boolean, seed: Int) => {
      val sb = new StringBuilder
      sb.append(s"%PDF-1.$minor\n")
      sb.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      val kids = (0 until nPages).map(k => s"${3 + k} 0 R").mkString(" ")
      sb.append(s"2 0 obj\n<< /Type /Pages /Kids [ $kids ] /Count $nPages >>\nendobj\n")
      var k = 0
      while (k < nPages) {
        sb.append(s"${3 + k} 0 obj\n<< /Type /Page /Parent 2 0 R " +
          s"/Contents ${3 + nPages} 0 R >>\nendobj\n")
        k += 1
      }
      val decoy = "/Type /Page (decoy) " +
        (0 until 16 + Math.floorMod(seed, 16)).map(j => ('a' + Math.floorMod(seed + j, 26)).toChar).mkString
      sb.append(s"${3 + nPages} 0 obj\n<< /Length ${decoy.length} >>\nstream\n")
      sb.append(decoy)
      sb.append("\nendstream\nendobj\n")
      sb.append("xref\n0 1\n0000000000 65535 f \n")
      sb.append(s"trailer\n<< /Size ${4 + nPages} /Root 1 0 R")
      if (encrypted) sb.append(s" /Encrypt ${4 + nPages} 0 R")
      sb.append(" >>\nstartxref\n0\n%%EOF\n")
      sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    })
}
