package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subtitle cue parsing (WebVTT — the W3C spec — and SubRip/SRT, the
  * two formats crawled video text actually arrives in): one row per
  * cue with millisecond timestamps and the cue text. Subtitles are the
  * TEXT side of video training data — alignment with
  * [[VideoBitstream.mp4SyncSamples]]' keyframe byte ranges is a plain
  * range join on the timestamps. Same family contract: narrow
  * per-partition flatMap, per-document degradation, truncation keeps
  * the cues already parsed.
  */
object Subtitles {

  private val cueCols = Seq(
    StructField("cue_idx", IntegerType),
    StructField("cue_start_ms", LongType),
    StructField("cue_end_ms", LongType),
    StructField("cue_text", StringType),
    StructField("parse_error", StringType))

  /** `HH:MM:SS.mmm` (VTT, hours optional) or `HH:MM:SS,mmm` (SRT) →
    * milliseconds; -1 on ANY malformed input — the catch is broad
    * (split(".") on a dots-only field returns an EMPTY array, so index
    * access can throw outside NumberFormatException, and this helper
    * sits inside mapPartitions where a throw kills the job).
    */
  private[ops] def parseTimestamp(ts: String): Long = {
    val t = ts.trim.replace(',', '.')
    val parts = t.split(':')
    try {
      val (h, m, rest) = parts.length match {
        case 3 => (parts(0).toLong, parts(1).toLong, parts(2))
        case 2 => (0L, parts(0).toLong, parts(1))
        case _ => return -1L
      }
      val secParts = rest.split('.')
      val sec = secParts(0).toLong
      val ms = if (secParts.length > 1)
        (secParts(1) + "000").substring(0, 3).toLong
      else 0L
      // negative fields must fail loudly, not fabricate a timeline
      if (h < 0 || m < 0 || m > 59 || sec < 0 || sec > 59 || ms < 0) -1L
      else ((h * 60 + m) * 60 + sec) * 1000 + ms
    } catch { case scala.util.control.NonFatal(_) => -1L }
  }

  /** One row per cue of a WebVTT or SRT document (auto-detected: a
    * `WEBVTT` header selects VTT, otherwise SRT). Cue text joins
    * multi-line payloads with '\n'; VTT cue settings after the arrow
    * (position/align/…) are dropped; SRT numeric counters are consumed
    * but the emitted `cue_idx` is positional (counters in crawled files
    * routinely repeat or skip). A malformed cue block is skipped to the
    * next blank line and recorded in a tail-error row — the walk keeps
    * every parseable cue before AND after it.
    */
  def parseCues(df: DataFrame, textCol: String = "subtitle"): DataFrame = {
    Multimodal.requireFreshColumns(df, "parseCues", cueCols.map(_.name))
    val schema = StructType(df.schema.fields ++ cueCols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val errRow = (msg: String) =>
          Seq(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, msg)))
        if (r.isNullAt(idx)) errRow("null subtitle")
        else {
          // the WebVTT spec permits a BOM before the signature, and
          // crawled files routinely carry one
          val raw = r.getString(idx).stripPrefix("\uFEFF")
          val lines = raw.split("\r\n|\r|\n", -1)
          var li = 0
          val isVtt = lines.nonEmpty && lines(0).startsWith("WEBVTT")
          if (isVtt) {
            // the W3C parser skips EVERYTHING up to the first blank line
            // after the signature — YouTube emits "Kind:"/"Language:"
            // header lines there
            li = 1
            while (li < lines.length && lines(li).trim.nonEmpty) li += 1
          }
          // a block keyword starts a comment/metadata block only as a
          // whole word (spec: NOTE + whitespace/EOL) — a cue IDENTIFIER
          // line may legitimately begin with the same letters
          def isBlockStart(l: String): Boolean =
            Seq("NOTE", "STYLE", "REGION").exists(kw =>
              l == kw || l.startsWith(kw + " ") || l.startsWith(kw + "\t"))
          val recs = scala.collection.mutable.ArrayBuffer.empty[Row]
          var cueIdx = 0
          var tailErr: String = null
          while (li < lines.length) {
            val line = lines(li).trim
            if (line.isEmpty || (isVtt && isBlockStart(line))) {
              // blank separators; VTT comment/metadata blocks skip to the
              // next blank line
              if (!line.isEmpty) {
                while (li < lines.length && lines(li).trim.nonEmpty) li += 1
              } else li += 1
            } else {
              // optional cue identifier / SRT counter line, then the arrow
              var arrowLi = li
              if (!lines(arrowLi).contains("-->") &&
                arrowLi + 1 < lines.length &&
                lines(arrowLi + 1).contains("-->")) arrowLi += 1
              if (!lines(arrowLi).contains("-->")) {
                // not a cue block (stray prose, a comment continuation
                // after a whitespace-only line, orphaned text): SKIP it
                // to the next blank and keep walking — one junk block
                // must not cost every cue after it. Stated, not silent:
                // the tail row records the skip.
                if (tailErr == null) tailErr = "skipped non-cue block"
                while (li < lines.length && lines(li).trim.nonEmpty) li += 1
              } else {
                val tsLine = lines(arrowLi)
                val arrow = tsLine.indexOf("-->")
                val start = parseTimestamp(tsLine.substring(0, arrow))
                // cue settings (VTT: "align:start position:10%") follow the
                // end timestamp — the grammar allows space OR TAB separators
                val endRaw = tsLine.substring(arrow + 3).trim
                val sp = endRaw.indexWhere(c => c == ' ' || c == '\t')
                val end = parseTimestamp(
                  if (sp < 0) endRaw else endRaw.substring(0, sp))
                if (start < 0 || end < 0 || end < start) {
                  // a timing line that doesn't parse — or cue TEXT that
                  // contains '-->' (the W3C grammar forbids it, so the
                  // payload stop above lands us here): skip THIS block to
                  // the next blank and keep walking, same resilience
                  // contract as the non-cue-block path — one junk block
                  // must not cost every cue after it
                  if (tailErr == null) tailErr = "malformed cue timestamps"
                  li = arrowLi
                  while (li < lines.length && lines(li).trim.nonEmpty) li += 1
                } else {
                  var ti = arrowLi + 1
                  val parts = scala.collection.mutable.ArrayBuffer.empty[String]
                  // payload ends at a truly EMPTY line (spec: a
                  // whitespace-only line BELONGS to the cue text) OR at a
                  // line containing "-->" — the W3C rule that cue text
                  // cannot contain the arrow. The arrow stop is what keeps
                  // a whitespace-only SEPARATOR (crawled-SRT reality) from
                  // merging every following cue into this one: the next
                  // cue's timing line ends the payload regardless.
                  while (ti < lines.length && lines(ti).nonEmpty &&
                      !lines(ti).contains("-->")) {
                    parts += lines(ti)
                    ti += 1
                  }
                  // stopped at the next cue's timing line: a trailing
                  // digits-only payload line was that cue's SRT counter,
                  // not our text — un-append it
                  if (ti < lines.length && lines(ti).contains("-->") &&
                      parts.nonEmpty &&
                      parts.last.trim.matches("\\d+"))
                    parts.remove(parts.length - 1)
                  val text = new StringBuilder(parts.mkString("\n"))
                  recs += Row.fromSeq(r.toSeq ++
                    Seq(cueIdx, start, end, text.toString, null))
                  cueIdx += 1
                  li = ti
                }
              }
            }
          }
          if (recs.isEmpty)
            errRow(if (tailErr == null) "no cues"
              else if (tailErr == "skipped non-cue block")
                "no cue timing line found" // nothing BUT junk blocks
              else tailErr)
          else {
            if (tailErr != null)
              recs += Row.fromSeq(r.toSeq ++ Seq(cueIdx, null, null, null, tailErr))
            recs.toSeq
          }
        }
      }
    }(enc)
  }

  /** Deterministic synthetic subtitle document: `nCues` cues of 2 s
    * each starting at `k × 2500 ms`, text from a fixed phrase + indices;
    * `vtt = true` emits WebVTT (header + a NOTE block + settings after
    * the end timestamp), false emits SRT (counter lines + comma
    * timestamps) — the parsed rows are IDENTICAL by construction, so
    * one oracle covers both formats.
    */
  val syntheticSubtitle: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((nCues: Int, seed: Int, vtt: Boolean) => {
      def ts(ms: Long, sep: Char): String = {
        val h = ms / 3600000; val m = ms / 60000 % 60
        val s = ms / 1000 % 60; val r = ms % 1000
        f"$h%02d:$m%02d:$s%02d$sep$r%03d"
      }
      val sb = new StringBuilder
      if (vtt) sb.append("WEBVTT\n\nNOTE synthetic fixture\nsecond note line\n\n")
      var k = 0
      while (k < nCues) {
        val start = k * 2500L
        val end = start + 2000L
        if (!vtt) sb.append(k + 1).append('\n')
        if (vtt)
          sb.append(ts(start, '.')).append(" --> ").append(ts(end, '.'))
            .append(" align:start\n")
        else
          sb.append(ts(start, ',')).append(" --> ").append(ts(end, ',')).append('\n')
        sb.append(s"spoken line $k of clip $seed\n")
        if (k % 2 == 1) sb.append(s"second line $k\n")
        sb.append('\n')
        k += 1
      }
      sb.toString
    })
}
