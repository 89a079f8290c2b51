package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** WebM / Matroska STRUCTURE census — the decode-free container gate
  * for the second-most-common crawled video format (VP8/VP9/AV1 in
  * Matroska). EBML parsing per RFC 8794 (the varint ID/size coding and
  * master-element nesting are the spec's own algorithms); the Matroska
  * element IDs used here (Segment/Info/Tracks/Cluster and their
  * children) are the public registry constants reproduced across every
  * open Matroska implementation. ID-recall policy note: unlike the
  * H.264 probability tables (where a wrong cell silently corrupts
  * pixels), a mis-recalled element ID here FAILS VISIBLY — the walk
  * simply never matches the element on a real file and the census
  * column comes back null — so the fail-loud criterion the repo's
  * table policy requires is met by construction.
  *
  * What the census answers without touching a codec: which tracks
  * exist (video/audio/subtitle), what codec each declares, pixel
  * dimensions and audio sampling/channels, the clip duration, and the
  * cluster/keyframe shape (SimpleBlock keyframe flags) — the
  * per-clip signals a 100 TB curation pass gates on before deciding
  * whether to fetch/decode anything.
  *
  * Reference scope note: SDM-RDFizer has no media handling; this is
  * part of the repo's beyond-parity multimodal surface
  * (SURVEY.md §2.11-adjacent, COVERAGE.md).
  */
object Ebml {

  // Matroska/EBML element IDs (stored form, marker bit included)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L
  private val IdSimpleBlock = 0xA3L

  /** RFC 8794 variable-length integer at `off`: returns (value, width)
    * or null when truncated/invalid. `keepMarker` = true for element
    * IDs (the marker bit is part of the stored ID), false for sizes.
    * A size with all value bits set means "unknown size" → -1.
    */
  private[ops] def readVint(b: Array[Byte], off: Int,
      keepMarker: Boolean): (Long, Int) = {
    if (off >= b.length) return null
    val first = b(off) & 0xff
    if (first == 0) return null // > 8-byte vint: not valid EBML here
    val width = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    if (off + width > b.length) return null
    var v: Long = if (keepMarker) first else first & ((1 << (8 - width)) - 1)
    var i = 1
    while (i < width) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    if (!keepMarker) {
      // all-ones payload = unknown size
      val allOnes = (1L << (7 * width)) - 1
      if (v == allOnes) return (-1L, width)
    }
    (v, width)
  }

  /** Unsigned big-endian integer element payload. */
  private def uintAt(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len && i < 8) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    v
  }

  /** EBML float payload (4 or 8 bytes big-endian). */
  private def floatAt(b: Array[Byte], off: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(uintAt(b, off, 4).toInt).toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(b, off, 8))
    else Double.NaN

  private[ops] final case class Track(number: Long, trackType: Long,
      codecId: String, pixelWidth: Long, pixelHeight: Long,
      samplingHz: Double, channels: Long)

  private[ops] final case class WebmInfo(docType: String,
      timestampScaleNs: Long, durationS: Double, tracks: List[Track],
      clusterCount: Int, blockCount: Int, keyframeCount: Int)

  /** Walk one Matroska payload. Returns Left(named error) on files that
    * are not EBML/Matroska or are truncated before any census element;
    * truncation PAST that point keeps what was walked (per-clip
    * degradation like the MP4/JPEG walks). Child iteration is strictly
    * bounded by the parent's declared extent, unknown-size masters
    * extend to the parent end (the streaming-mux convention), and every
    * step advances the cursor — crafted sizes cannot loop.
    */
  private[ops] def parseWebm(bytes: Array[Byte]): Either[String, WebmInfo] = {
    val idHdr = readVint(bytes, 0, keepMarker = true)
    if (idHdr == null || idHdr._1 != IdEbml) return Left("not EBML (no 1A45DFA3 header)")
    val szHdr = readVint(bytes, idHdr._2, keepMarker = false)
    if (szHdr == null || szHdr._1 < 0) return Left("EBML header has no definite size")
    var docType: String = null
    // header children: only DocType matters for the census
    var o = idHdr._2 + szHdr._2
    val hdrEnd = math.min(bytes.length.toLong, o + szHdr._1).toInt
    while (o < hdrEnd) {
      val id = readVint(bytes, o, keepMarker = true)
      if (id == null) return Left("truncated EBML header")
      val sz = readVint(bytes, o + id._2, keepMarker = false)
      if (sz == null || sz._1 < 0) return Left("truncated EBML header")
      val payloadOff = o + id._2 + sz._2
      if (payloadOff + sz._1 > hdrEnd) return Left("EBML header child overruns")
      if (id._1 == IdDocType)
        docType = new String(bytes, payloadOff, sz._1.toInt,
          java.nio.charset.StandardCharsets.ISO_8859_1).takeWhile(_ != '\u0000')
      o = (payloadOff + sz._1).toInt
    }
    if (docType == null) return Left("EBML header has no DocType")
    // Segment
    val idSeg = readVint(bytes, hdrEnd, keepMarker = true)
    if (idSeg == null || idSeg._1 != IdSegment) return Left("no Segment element")
    val szSeg = readVint(bytes, hdrEnd + idSeg._2, keepMarker = false)
    if (szSeg == null) return Left("truncated Segment size")
    val segStart = hdrEnd + idSeg._2 + szSeg._2
    val segEnd =
      if (szSeg._1 < 0) bytes.length
      else math.min(bytes.length.toLong, segStart + szSeg._1).toInt

    var tsScale = 1000000L // Matroska default: 1 ms
    var durationTicks = Double.NaN
    val tracks = scala.collection.mutable.ListBuffer.empty[Track]
    var clusters = 0
    var blocks = 0
    var keyframes = 0

    def walkTrackEntry(start: Int, end: Int): Unit = {
      var number = -1L
      var ttype = -1L
      var codec: String = null
      var pw = -1L
      var ph = -1L
      var hz = Double.NaN
      var ch = -1L
      var p = start
      var ok = true
      while (ok && p < end) {
        val id = readVint(bytes, p, keepMarker = true)
        val sz = if (id == null) null
          else readVint(bytes, p + id._2, keepMarker = false)
        if (id == null || sz == null || sz._1 < 0) { ok = false }
        else {
          val po = p + id._2 + sz._2
          val pl = sz._1.toInt
          if (po + sz._1 > end) { ok = false }
          else {
            id._1 match {
              case IdTrackNumber => number = uintAt(bytes, po, pl)
              case IdTrackType => ttype = uintAt(bytes, po, pl)
              case IdCodecId => codec = new String(bytes, po, pl,
                java.nio.charset.StandardCharsets.ISO_8859_1)
              case IdVideo | IdAudio =>
                var q = po
                while (q < po + pl) {
                  val cid = readVint(bytes, q, keepMarker = true)
                  val csz = if (cid == null) null
                    else readVint(bytes, q + cid._2, keepMarker = false)
                  if (cid == null || csz == null || csz._1 < 0) { q = po + pl }
                  else {
                    val co = q + cid._2 + csz._2
                    if (co + csz._1 > po + pl) q = po + pl
                    else {
                      cid._1 match {
                        case IdPixelWidth => pw = uintAt(bytes, co, csz._1.toInt)
                        case IdPixelHeight => ph = uintAt(bytes, co, csz._1.toInt)
                        case IdSamplingFrequency => hz = floatAt(bytes, co, csz._1.toInt)
                        case IdChannels => ch = uintAt(bytes, co, csz._1.toInt)
                        case _ => ()
                      }
                      q = (co + csz._1).toInt
                    }
                  }
                }
              case _ => ()
            }
            p = (po + sz._1).toInt
          }
        }
      }
      if (number >= 0 && ttype >= 0)
        tracks += Track(number, ttype, codec, pw, ph, hz, ch)
    }

    def walkMaster(start: Int, end: Int, handler: (Long, Int, Int) => Unit): Unit = {
      var p = start
      var ok = true
      while (ok && p < end) {
        val id = readVint(bytes, p, keepMarker = true)
        val sz = if (id == null) null
          else readVint(bytes, p + id._2, keepMarker = false)
        if (id == null || sz == null) { ok = false }
        else {
          val po = p + id._2 + sz._2
          // bound on the Long BEFORE narrowing: a declared size in
          // [2^31, 2^56) would wrap under toInt and pass the check with
          // the wrapped value, silently mis-walking the segment
          if (sz._1 >= 0 && po + sz._1 > end) { ok = false }
          else {
            val pl = if (sz._1 < 0) end - po else sz._1.toInt // unknown → to end
            if (pl < 0) { ok = false }
            else {
              handler(id._1, po, po + pl)
              p = po + pl
            }
          }
        }
      }
    }

    walkMaster(segStart, segEnd, { (id, po, pe) =>
      id match {
        case IdInfo =>
          walkMaster(po, pe, { (cid, co, ce) =>
            cid match {
              case IdTimestampScale => tsScale = uintAt(bytes, co, ce - co)
              case IdDuration => durationTicks = floatAt(bytes, co, ce - co)
              case _ => ()
            }
          })
        case IdTracks =>
          walkMaster(po, pe, { (cid, co, ce) =>
            if (cid == IdTrackEntry) walkTrackEntry(co, ce)
          })
        case IdCluster =>
          clusters += 1
          // keyframe census reads SimpleBlock flags; BlockGroup'd Blocks
          // (rare in WebM — lacing/duration cases) carry keyness as the
          // ABSENCE of ReferenceBlock and are not counted here: the
          // census stays a decode-free lower bound, stated not silent
          walkMaster(po, pe, { (cid, co, ce) =>
            if (cid == IdSimpleBlock && ce - co >= 4) {
              blocks += 1
              // SimpleBlock: track vint, s16 rel-timestamp, flags.
              // The flags byte sits at co + vint-width + 2; a wide track
              // vint in a minimal block can place it past the block end,
              // so bound against ce (which walkMaster already bounds by
              // the buffer) before reading.
              val tn = readVint(bytes, co, keepMarker = false)
              if (tn != null && co + tn._2 + 3 <= ce) {
                val flags = bytes(co + tn._2 + 2) & 0xff
                if ((flags & 0x80) != 0) keyframes += 1
              }
            }
          })
        case _ => ()
      }
    })
    val durationS =
      if (durationTicks.isNaN) Double.NaN
      else durationTicks * tsScale / 1e9
    Right(WebmInfo(docType, tsScale, durationS, tracks.toList,
      clusters, blocks, keyframes))
  }

  private val cols = Seq(
    StructField("doc_type", StringType),
    StructField("track_number", LongType),
    StructField("track_type", StringType),
    StructField("codec_id", StringType),
    StructField("pixel_width", LongType),
    StructField("pixel_height", LongType),
    StructField("sampling_hz", DoubleType),
    StructField("channels", LongType),
    StructField("duration_s", DoubleType),
    StructField("cluster_count", IntegerType),
    StructField("block_count", IntegerType),
    StructField("keyframe_count", IntegerType),
    StructField("parse_error", StringType))

  /** One row per TRACK (clip-level columns repeated per track, like the
    * MP4 sample rows); clip-level failures yield one error row. Narrow
    * flatMap — the 100 TB shape is per-clip independent, no shuffle.
    */
  def webmTracks(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    Multimodal.requireFreshColumns(df, "webmTracks", cols.map(_.name))
    val schema = StructType(df.schema.fields ++ cols)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        def errRow(msg: String) = Seq(Row.fromSeq(r.toSeq ++
          Seq(null, null, null, null, null, null, null, null, null,
            null, null, null, msg)))
        if (r.isNullAt(idx)) errRow("null payload")
        else (try parseWebm(r.getAs[Array[Byte]](idx)) catch {
          // per-clip degradation: a malformed/truncated clip becomes an
          // error row, never a job failure (same contract as hevcMeta /
          // audioContainerMeta / ivfMeta)
          case e: Exception => Left(s"webm parse error: ${e.getClass.getSimpleName}")
        }) match {
          case Left(msg) => errRow(msg)
          case Right(w) =>
            val tname = Map(1L -> "video", 2L -> "audio", 17L -> "subtitle")
            if (w.tracks.isEmpty) Seq(Row.fromSeq(r.toSeq ++
              Seq(w.docType, null, null, null, null, null, null, null,
                if (w.durationS.isNaN) null else w.durationS,
                w.clusterCount, w.blockCount, w.keyframeCount,
                "no tracks")))
            else w.tracks.map { t =>
              Row.fromSeq(r.toSeq ++ Seq(w.docType, t.number,
                tname.getOrElse(t.trackType, t.trackType.toString),
                t.codecId,
                if (t.pixelWidth < 0) null else t.pixelWidth,
                if (t.pixelHeight < 0) null else t.pixelHeight,
                if (t.samplingHz.isNaN) null else t.samplingHz,
                if (t.channels < 0) null else t.channels,
                if (w.durationS.isNaN) null else w.durationS,
                w.clusterCount, w.blockCount, w.keyframeCount, null))
            }
        }
      }
    }(enc)
  }

  // ---- synthetic fixture: a real EBML writer ----

  private final class W {
    val out = new java.io.ByteArrayOutputStream()
    def vint(v: Long): Unit = { // definite size, minimal width
      var width = 1
      while (width < 8 && v >= (1L << (7 * width)) - 1) width += 1
      var i = width - 1
      val marked = v | (1L << (7 * width))
      while (i >= 0) { out.write(((marked >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    def id(v: Long): Unit = {
      var width = 1
      while ((v >> (8 * width)) != 0) width += 1
      var i = width - 1
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    def elem(eid: Long)(body: W => Unit): Unit = {
      val w2 = new W
      body(w2)
      val b = w2.out.toByteArray
      id(eid); vint(b.length.toLong); out.write(b, 0, b.length)
    }
    def uintElem(eid: Long, v: Long): Unit = elem(eid) { w =>
      var width = 1
      while ((v >> (8 * width)) != 0 && width < 8) width += 1
      var i = width - 1
      while (i >= 0) { w.out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    def floatElem(eid: Long, v: Double): Unit = elem(eid) { w =>
      val bits = java.lang.Double.doubleToLongBits(v)
      var i = 7
      while (i >= 0) { w.out.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    def strElem(eid: Long, s: String): Unit = elem(eid) { w =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      w.out.write(b, 0, b.length)
    }
  }

  /** Deterministic WebM clip: one video track (codec cycles
    * V_VP8/V_VP9/V_AV1, dims from the law) + one audio track
    * (A_OPUS/A_VORBIS), `nClusters` clusters of `blocksPer` SimpleBlocks
    * each with every `kfPeriod`-th block keyframed, Duration =
    * `durMs` ms at the default 1 ms timestamp scale. Structure is REAL
    * EBML (vint sizes, nested masters) so the parser walks the same
    * coding real muxers emit.
    */
  val syntheticWebm: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (codecSel: Int, width: Int, height: Int, audioSel: Int, hz: Int,
          nClusters: Int, blocksPer: Int, kfPeriod: Int, durMs: Int) => {
        val w = new W
        w.elem(IdEbml) { h =>
          h.strElem(IdDocType, "webm")
        }
        w.elem(IdSegment) { s =>
          s.elem(IdInfo) { i =>
            i.uintElem(IdTimestampScale, 1000000L)
            i.floatElem(IdDuration, durMs.toDouble)
          }
          s.elem(IdTracks) { ts =>
            ts.elem(IdTrackEntry) { te =>
              te.uintElem(IdTrackNumber, 1L)
              te.uintElem(IdTrackType, 1L)
              te.strElem(IdCodecId,
                Seq("V_VP8", "V_VP9", "V_AV1")(codecSel % 3))
              te.elem(IdVideo) { v =>
                v.uintElem(IdPixelWidth, width.toLong)
                v.uintElem(IdPixelHeight, height.toLong)
              }
            }
            ts.elem(IdTrackEntry) { te =>
              te.uintElem(IdTrackNumber, 2L)
              te.uintElem(IdTrackType, 2L)
              te.strElem(IdCodecId, Seq("A_OPUS", "A_VORBIS")(audioSel % 2))
              te.elem(IdAudio) { a =>
                a.floatElem(IdSamplingFrequency, hz.toDouble)
                a.uintElem(IdChannels, 2L)
              }
            }
          }
          var c = 0
          while (c < nClusters) {
            s.elem(IdCluster) { cl =>
              cl.uintElem(0xE7L, c * 1000L) // Cluster Timestamp
              var b = 0
              while (b < blocksPer) {
                cl.elem(IdSimpleBlock) { sb =>
                  sb.vint(1L) // track number
                  sb.out.write(0); sb.out.write(b * 10) // s16 rel ts
                  sb.out.write(if (b % kfPeriod == 0) 0x80 else 0x00)
                  sb.out.write(0xAB) // one opaque payload byte
                }
                b += 1
              }
            }
            c += 1
          }
        }
        w.out.toByteArray
      }).asNondeterministic()
      // ^ optimizer pin, NOT real nondeterminism — the generator is a pure
      // function of its args (values stable; pinned by OptimizationR19Spec).
      // Declared nondeterministic so filter pushdown cannot duplicate the
      // heavy payload expression into every sniffer reference (guide section 4.4).
      // Cost: the payload column is rejected wherever nondeterministic
      // expressions are disallowed (join/group/sort keys) — callers key on
      // doc_id, never on payload bytes.
}
