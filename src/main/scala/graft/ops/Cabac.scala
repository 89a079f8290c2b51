package graft.ops

/** H.264 CABAC arithmetic-coding ENGINE (ITU-T H.264 §9.3) — decoder,
  * encoder twin, context initialization and the §9.3.2 binarizations,
  * parameterized on the probability tables.
  *
  * WHAT IS AND IS NOT CONFORMANT — the repo's table policy
  * (SCALE.md §19/§20: refuse uncertain tables by name) applied to CABAC:
  *
  *   - The PROCEDURES here are the spec's own flowcharts and are fully
  *     algorithmic: DecodeDecision / DecodeBypass / DecodeTerminate with
  *     RenormD (§9.3.3.2), EncodeDecision / EncodeBypass /
  *     EncodeTerminate with RenormE + PutBit carry propagation and
  *     EncodeFlush (§9.3.4), context init (§9.3.1.1: preCtxState =
  *     Clip3(1,126, ((m·Clip3(0,51,QP))>>4)+n)), and the unary /
  *     truncated-unary / UEGk / fixed-length binarizations (§9.3.2).
  *     The BYPASS and TERMINATE paths touch no probability table at all
  *     and are conformant as written.
  *   - The PROBABILITY TABLES (Table 9-44 rangeTabLPS, Table 9-45
  *     state transitions) could not be conformance-anchored on this
  *     machine: the published design law (pLPS(σ) = 0.5·α^σ with
  *     α = (0.01875/0.5)^(1/63), quartile representatives
  *     {288,352,416,480} — Marpe/Schwarz/Wiegand, IEEE TCSVT 2003) was
  *     derived both under floor- and round-quantization and CROSS-CHECKED
  *     against independently recalled rows; the two sources disagree in
  *     single cells either way (e.g. σ=3 col2: floor→177 vs recalled 178;
  *     σ=5 matches round in col0 but floor in col1), and unlike CAVLC's
  *     VLC tables there is no Kraft-style structural tripwire that pins a
  *     cell — ANY positive 64×4 table yields a working arithmetic coder.
  *     [[Tables.Derived]] therefore ships as a clearly-labeled
  *     DERIVED-NOT-CONFORMANT default: exact for self-coded streams
  *     (encoder and decoder share it), wrong for real-world streams,
  *     which is why [[H264Decode]] still refuses
  *     `entropy_coding_mode_flag=1` clips by name UNLESS a [[Config]]
  *     is injected. The full I-slice macroblock layer over this engine
  *     lives in [[CabacSlice]] (syntax, binarizations, §9.3.3.1 context
  *     derivations, I_PCM re-init) — anchoring needs a conformance
  *     vector or the spec text; inject verified tables via [[Config]]
  *     and the whole decode path runs.
  *   - The context-init constants (Tables 9-12..9-23, ~1k (m,n) pairs)
  *     are in the same category; [[initCtx]] takes (m,n) as parameters.
  *
  * Engine invariants enforced/tested: codIRange ∈ [256, 510] after every
  * renormalization, codIOffset < codIRange after every decode, the
  * encoder's bitsOutstanding carry chain settles on every PutBit, and
  * decode ∘ encode = identity over random context/bin sequences (the
  * round-trip property suite).
  */
object Cabac {

  /** Probability tables, injected. `rangeLps` is 64 states × 4 range
    * quartiles; `transLps`/`transMps` are the 64-entry state transitions.
    * The constructor enforces every STRUCTURAL property the spec's
    * tables satisfy — the tripwires that CAN be checked locally.
    */
  final class Tables(val rangeLps: Array[Array[Int]],
      val transLps: Array[Int], val transMps: Array[Int])
      extends Serializable {
    require(rangeLps.length == 64 && rangeLps.forall(_.length == 4),
      "rangeLps must be 64x4")
    require(transLps.length == 64 && transMps.length == 64,
      "state transitions must have 64 entries")
    // bounds: LPS range fits a 9-bit coder with min renorm headroom
    require(rangeLps.forall(_.forall(v => v >= 2 && v <= 240)),
      "rangeLps values must lie in [2, 240]")
    // monotone: LPS range grows with the range quartile...
    require(rangeLps.take(63).forall(r => (0 until 3)
      .forall(q => r(q) <= r(q + 1))),
      "rangeLps rows must be non-decreasing across quartiles")
    // ...and shrinks as the state (MPS confidence) grows
    require((0 until 4).forall(q => (0 until 62)
      .forall(s => rangeLps(s)(q) >= rangeLps(s + 1)(q))),
      "rangeLps columns must be non-increasing across states")
    require(rangeLps(63).forall(_ == 2), "state 63 must be {2,2,2,2}")
    // MPS transitions walk up and saturate at 62; 63 is terminal
    require((0 until 62).forall(s => transMps(s) == s + 1) &&
      transMps(62) == 62 && transMps(63) == 63,
      "transMps must be min(s+1, 62) with 63 fixed")
    // LPS transitions never increase the state and never leave [0, 63]
    require((0 until 63).forall(s =>
      transLps(s) >= 0 && transLps(s) <= s), "transLps must not increase s")
  }

  /** Tables derived from the published design law — labeled
    * NOT-CONFORMANCE-ANCHORED (see the object scaladoc). Floor
    * quantization with the col-0 cap at 128 (the lowest quartile's LPS
    * range may not exceed half of 256); LPS transition = nearest state
    * to α·p + (1−α), clamped to not increase.
    */
  lazy val Derived: Tables = {
    val alpha = math.pow(0.01875 / 0.5, 1.0 / 63)
    val q = Array(288.0, 352.0, 416.0, 480.0)
    val p = Array.tabulate(64)(s => 0.5 * math.pow(alpha, s))
    val range = Array.tabulate(64, 4) { (s, j) =>
      if (s == 63) 2
      else math.max(2, math.min(if (j == 0) 128 else 240,
        math.floor(q(j) * p(s)).toInt))
    }
    val lps = Array.tabulate(64) { s =>
      if (s == 63) 63
      else {
        val pNew = alpha * p(s) + (1 - alpha)
        math.min((0 until 64).minBy(k => math.abs(p(k) - pNew)), s)
      }
    }
    val mps = Array.tabulate(64)(s => if (s >= 62) s else s + 1)
    new Tables(range, lps, mps)
  }

  /** One context variable: probability state 0..63 and the MPS value. */
  final class Ctx(var state: Int, var mps: Int)

  /** Derived (m, n) context-init pairs for ctxIdx 0..276 — the same
    * table policy as [[Tables.Derived]]: the spec's Tables 9-12..9-23
    * (~1k conformance (m,n) pairs) could not be anchored locally, so
    * this DERIVED-NOT-CONFORMANT default spreads initial states
    * deterministically across ctxIdx (m = 0 keeps init QP-independent;
    * n walks 40..103 so contexts start in genuinely different
    * §9.3.1.1 states and the self-coded round-trip exercises both MPS
    * polarities and a range of probability states). Self-coded streams
    * (encoder twin sharing this init) are exact; real streams refuse
    * upstream. Inject conformance pairs per slice type / cabac_init_idc
    * here and [[CabacSlice]] decodes them unchanged.
    */
  lazy val derivedCtxInit: Array[Array[Int]] =
    Array.tabulate(277)(i => Array(0, 40 + (i * 13) % 64))

  /** Everything the slice-layer CABAC path needs injected: probability
    * tables + per-ctxIdx (m, n) init pairs. [[Config.derived]] is the
    * self-coded default (encoder twin and decoder share it — exact for
    * streams this repo generates, NOT conformance-anchored for
    * real-world streams, which keep refusing upstream).
    */
  final case class Config(tables: Tables, ctxInit: Array[Array[Int]])
  object Config {
    lazy val derived: Config = Config(Derived, derivedCtxInit)

    /** Spark conf key naming a CABAC tables file (see [[fromText]] for
      * the format). Set it with `--conf spark.graft.cabacTables=/path`
      * (or `spark.conf.set`) and every decode entry that was not handed
      * an explicit [[Config]] loads, validates and uses the file — the
      * no-rebuild path for a user who HAS the spec's conformance tables.
      */
    val SparkConfKey = "spark.graft.cabacTables"
    /** Environment fallback for the same path (spark-less callers). */
    val EnvKey = "SPARK_GRAFT_CABAC_TABLES"

    /** The operational resolution the DataFrame decode entries use:
      * explicit Config if passed, else the [[SparkConfKey]] Spark conf,
      * else the [[EnvKey]] env var, else None (CABAC clips refuse by
      * name). Loading happens once on the driver; the parsed Config is
      * serialized to executors with the task closure. A path that fails
      * to load THROWS (driver-side, with the parse error) rather than
      * silently falling back to refusal — a user who configured tables
      * must not get derived-or-refused behavior without noticing.
      */
    def resolve(explicit: Option[Config],
        spark: org.apache.spark.sql.SparkSession): Option[Config] =
      explicit.orElse {
        spark.conf.getOption(SparkConfKey).orElse(sys.env.get(EnvKey))
          .map(fromFile)
      }

    /** Load a tables file (format: [[fromText]]). */
    def fromFile(path: String): Config = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try fromText(src.mkString)
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(s"$path: ${e.getMessage}", e)
      } finally src.close()
    }

    /** Parse the graft CABAC tables format — the spec's number tables AS
      * DATA, so conformance-anchored values never need a rebuild:
      *
      * {{{
      * # comments with '#'; blank lines ignored; sections in any order
      * [rangeTabLPS]   # ITU-T H.264 Table 9-44: 64 rows x 4 ints
      * 128 176 208 240
      * ...             # (63 more rows; row = pStateIdx, cols = qCodIRangeIdx)
      * [transIdxLPS]   # Table 9-45 LPS column: 64 ints (whitespace/newline split)
      * 0 0 1 2 ...
      * [ctxInit]       # Tables 9-12..9-23 I-slice (m, n): rows "ctxIdx m n"
      * 0 20 -15
      * ...             # every ctxIdx 0..276 must be covered
      * }}}
      *
      * transIdxMPS is NOT in the file: the spec's MPS column is exactly
      * min(pStateIdx+1, 62) with 63 fixed, which [[Tables]] enforces, so
      * it is constructed rather than transcribed. All structural
      * tripwires in the [[Tables]] constructor run on the parsed values;
      * a table that violates any spec invariant is rejected with the
      * failing property named.
      */
    def fromText(text: String): Config = {
      val sections = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ListBuffer[String]]
      var current: String = null
      text.linesIterator.foreach { raw =>
        val line = raw.takeWhile(_ != '#').trim
        if (line.nonEmpty) {
          if (line.startsWith("[") && line.endsWith("]")) {
            current = line.substring(1, line.length - 1).trim.toLowerCase
            sections.getOrElseUpdate(current, scala.collection.mutable.ListBuffer.empty)
          } else {
            require(current != null, s"data before any [section]: '$line'")
            sections(current) += line
          }
        }
      }
      def ints(section: String): Array[Int] = {
        val lines = sections.getOrElse(section,
          throw new IllegalArgumentException(s"missing [$section] section"))
        lines.flatMap(_.split("\\s+")).map { t =>
          try t.toInt catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(s"[$section]: not an integer: '$t'")
          }
        }.toArray
      }
      val rangeFlat = ints("rangetablps")
      require(rangeFlat.length == 256,
        s"[rangeTabLPS] must hold 64x4 = 256 ints, got ${rangeFlat.length}")
      val range = Array.tabulate(64, 4)((s, q) => rangeFlat(s * 4 + q))
      val lps = ints("transidxlps")
      require(lps.length == 64,
        s"[transIdxLPS] must hold 64 ints, got ${lps.length}")
      val mps = Array.tabulate(64)(s => if (s >= 62) s else s + 1)
      val tables = new Tables(range, lps, mps) // structural tripwires run here
      val ctxRows = ints("ctxinit")
      require(ctxRows.length % 3 == 0,
        s"[ctxInit] rows must be 'ctxIdx m n' triples, got ${ctxRows.length} ints")
      val triples = ctxRows.grouped(3).toSeq
      // strict: a hand-transcribed file with a duplicated or stray
      // ctxIdx must FAIL, not silently last-win / drop — a wrong (m, n)
      // init decodes real streams to corrupt planes with no error
      val outOfRange = triples.map(_(0)).filter(i => i < 0 || i > 276)
      require(outOfRange.isEmpty,
        s"[ctxInit] ctxIdx out of range 0..276: ${outOfRange.take(8).mkString(",")}")
      val dups = triples.map(_(0)).groupBy(identity).collect {
        case (i, g) if g.size > 1 => i
      }
      require(dups.isEmpty,
        s"[ctxInit] duplicate ctxIdx rows: ${dups.toSeq.sorted.take(8).mkString(",")}")
      val byIdx = triples.map(t => t(0) -> Array(t(1), t(2))).toMap
      val missing = (0 to 276).filterNot(byIdx.contains)
      require(missing.isEmpty,
        s"[ctxInit] must cover ctxIdx 0..276; missing ${missing.take(8).mkString(",")}" +
          (if (missing.length > 8) s" (+${missing.length - 8} more)" else ""))
      Config(tables, Array.tabulate(277)(byIdx))
    }

    /** Render a [[Config]] in the [[fromText]] format — the template a
      * user fills with conformance values, and the round-trip half of
      * the loader's test.
      */
    def renderTablesFile(cfg: Config): String = {
      val sb = new StringBuilder
      sb ++= "# graft CABAC tables file (ITU-T H.264 number tables as data)\n"
      sb ++= "[rangeTabLPS]  # Table 9-44: 64 rows x 4 qCodIRangeIdx cols\n"
      cfg.tables.rangeLps.foreach(r => sb ++= r.mkString(" ") += '\n')
      sb ++= "[transIdxLPS]  # Table 9-45 LPS column: 64 values\n"
      sb ++= cfg.tables.transLps.mkString(" ") += '\n'
      sb ++= "[ctxInit]      # Tables 9-12..9-23 I-slice rows: ctxIdx m n\n"
      cfg.ctxInit.zipWithIndex.foreach { case (mn, i) =>
        sb ++= s"$i ${mn(0)} ${mn(1)}\n"
      }
      sb.result()
    }
  }

  /** §9.3.1.1 context initialization from (m, n) at slice QP. */
  def initCtx(m: Int, n: Int, sliceQp: Int): Ctx = {
    val qp = math.max(0, math.min(51, sliceQp))
    val pre = math.max(1, math.min(126, ((m * qp) >> 4) + n))
    if (pre <= 63) new Ctx(63 - pre, 0) else new Ctx(pre - 64, 1)
  }

  /** §9.3.3.2 arithmetic DECODER over a byte array. Reads MSB-first;
    * reads past the end return 0 bits (the spec's rbsp trailing
    * behavior — a well-formed stream never depends on them).
    */
  final class Decoder(bytes: Array[Byte], tables: Tables = Derived,
      startByte: Int = 0) {
    private var bitPos = startByte * 8
    private def readBit(): Int = {
      val b =
        if ((bitPos >> 3) >= bytes.length) 0
        else (bytes(bitPos >> 3) >> (7 - (bitPos & 7))) & 1
      bitPos += 1
      b
    }
    private var codIRange = 510
    private var codIOffset = {
      var v = 0
      var i = 0
      while (i < 9) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def decodeDecision(ctx: Ctx): Int = {
      val qIdx = (codIRange >> 6) & 3
      val rLps = tables.rangeLps(ctx.state)(qIdx)
      codIRange -= rLps
      val bin =
        if (codIOffset >= codIRange) {
          val b = 1 - ctx.mps
          codIOffset -= codIRange
          codIRange = rLps
          if (ctx.state == 0) ctx.mps = 1 - ctx.mps
          ctx.state = tables.transLps(ctx.state)
          b
        } else {
          ctx.state = tables.transMps(ctx.state)
          ctx.mps
        }
      while (codIRange < 256) {
        codIRange <<= 1
        codIOffset = (codIOffset << 1) | readBit()
      }
      bin
    }

    def decodeBypass(): Int = {
      codIOffset = (codIOffset << 1) | readBit()
      if (codIOffset >= codIRange) { codIOffset -= codIRange; 1 } else 0
    }

    def decodeTerminate(): Int = {
      codIRange -= 2
      if (codIOffset >= codIRange) 1
      else {
        while (codIRange < 256) {
          codIRange <<= 1
          codIOffset = (codIOffset << 1) | readBit()
        }
        0
      }
    }

    /** Engine invariants, exposed for the property suite. */
    def rangeOk: Boolean = codIRange >= 2 && codIRange <= 510 &&
      codIOffset >= 0 && codIOffset < (1 << 10)

    // ---- mid-stream raw segments (I_PCM, §9.3.1.2) ----
    // After decodeTerminate() returns 1 the decoder has consumed EXACTLY
    // as many bits as the encoder twin emitted through its
    // EncodeTerminate(1) flush (the 9-bit init compensates the encoder's
    // suppressed first PutBit; every renorm/bypass reads one bit per bit
    // emitted; the flush's putBit+2 trailing bits are covered by the
    // init lookahead — the identity is pinned by CabacSliceSpec's
    // segment round-trip). So byte alignment here lands on the same
    // boundary the encoder padded to, raw bytes read back verbatim, and
    // [[reinit]] mirrors the encoder's fresh §9.3.4.1 segment.

    /** Skip pcm_alignment bits to the next byte boundary. */
    def alignByte(): Unit = { bitPos = (bitPos + 7) & ~7 }

    /** One raw (byte-aligned) PCM byte; past-the-end reads 0 like bits. */
    def rawByte(): Int = {
      val i = bitPos >> 3
      bitPos += 8
      if (i >= bytes.length) 0 else bytes(i) & 0xff
    }

    /** §9.3.1.2: re-initialize the arithmetic engine after a raw
      * segment (reads a fresh 9-bit codIOffset). */
    def reinit(): Unit = {
      codIRange = 510
      var v = 0
      var i = 0
      while (i < 9) { v = (v << 1) | readBit(); i += 1 }
      codIOffset = v
    }
  }

  /** §9.3.4 arithmetic ENCODER twin — low/range with outstanding-bit
    * carry propagation; `finish()` runs EncodeTerminate(1)'s flush and
    * returns the byte stream [[Decoder]] consumes.
    */
  final class Encoder(tables: Tables = Derived) {
    private var codILow = 0
    private var codIRange = 510
    private var firstBit = true
    private var outstanding = 0
    private val out = new java.lang.StringBuilder() // bits as '0'/'1'

    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false
      else out.append(if (b == 1) '1' else '0')
      while (outstanding > 0) {
        out.append(if (b == 1) '0' else '1')
        outstanding -= 1
      }
    }

    private def renorm(): Unit = {
      while (codIRange < 256) {
        if (codILow < 256) putBit(0)
        else if (codILow >= 512) { codILow -= 512; putBit(1) }
        else { codILow -= 256; outstanding += 1 }
        codIRange <<= 1
        codILow <<= 1
      }
    }

    def encodeDecision(ctx: Ctx, bin: Int): Unit = {
      val qIdx = (codIRange >> 6) & 3
      val rLps = tables.rangeLps(ctx.state)(qIdx)
      codIRange -= rLps
      if (bin != ctx.mps) {
        codILow += codIRange
        codIRange = rLps
        if (ctx.state == 0) ctx.mps = 1 - ctx.mps
        ctx.state = tables.transLps(ctx.state)
      } else ctx.state = tables.transMps(ctx.state)
      renorm()
    }

    def encodeBypass(bin: Int): Unit = {
      codILow <<= 1
      if (bin == 1) codILow += codIRange
      if (codILow >= 1024) { putBit(1); codILow -= 1024 }
      else if (codILow < 512) putBit(0)
      else { codILow -= 512; outstanding += 1 }
    }

    def encodeTerminate(bin: Int): Unit = {
      codIRange -= 2
      if (bin == 1) {
        codILow += codIRange
        // EncodeFlush (§9.3.4.6)
        codIRange = 2
        renorm()
        putBit((codILow >> 9) & 1)
        out.append(if (((codILow >> 8) & 1) == 1) '1' else '0')
        out.append('1') // rbsp stop bit rides the flush per the spec
      } else renorm()
    }

    // ---- mid-stream raw segments (I_PCM) — twins of the Decoder's ----

    /** pcm_alignment_zero_bit padding to the next byte boundary; call
      * right after encodeTerminate(1)'s flush. */
    def alignByteZero(): Unit =
      while ((out.length & 7) != 0) out.append('0')

    /** One raw byte-aligned PCM byte. */
    def rawByte(v: Int): Unit = {
      var i = 7
      while (i >= 0) { out.append(if (((v >> i) & 1) == 1) '1' else '0'); i -= 1 }
    }

    /** Fresh §9.3.4.1 coding segment after a raw run (first-bit
      * suppression included — the Decoder's reinit reads 9 bits). */
    def reinit(): Unit = {
      codILow = 0
      codIRange = 510
      firstBit = true
      outstanding = 0
    }

    /** Bits emitted so far (diagnostic for the segment identity test). */
    def bitLength: Int = out.length

    /** Bytes after EncodeTerminate(1); zero-padded to a byte boundary. */
    def finish(): Array[Byte] = {
      val bits = out.toString
      val n = (bits.length + 7) / 8
      val bs = new Array[Byte](n)
      var i = 0
      while (i < bits.length) {
        if (bits.charAt(i) == '1')
          bs(i >> 3) = (bs(i >> 3) | (1 << (7 - (i & 7)))).toByte
        i += 1
      }
      bs
    }
  }

  // ---- §9.3.2 binarizations, encode/decode over the engine ----

  /** Truncated-unary: `v` ones then a 0, the 0 omitted at `cMax`. */
  def encodeTU(e: Encoder, ctxs: Int => Ctx, v: Int, cMax: Int): Unit = {
    var i = 0
    while (i < v) { e.encodeDecision(ctxs(i), 1); i += 1 }
    if (v < cMax) e.encodeDecision(ctxs(v), 0)
  }

  def decodeTU(d: Decoder, ctxs: Int => Ctx, cMax: Int): Int = {
    var v = 0
    while (v < cMax && d.decodeDecision(ctxs(v)) == 1) v += 1
    v
  }

  /** UEGk suffix (bypass-coded, §9.3.2.3): call when the TU prefix hit
    * `uCoff`; codes `v − uCoff` in k-th order Exp-Golomb bypass bins.
    */
  def encodeUEGkSuffix(e: Encoder, v: Int, uCoff: Int, k0: Int): Unit = {
    var suf = v - uCoff
    var k = k0
    while (suf >= (1 << k)) {
      e.encodeBypass(1)
      suf -= 1 << k
      k += 1
    }
    e.encodeBypass(0)
    var i = k - 1
    while (i >= 0) { e.encodeBypass((suf >> i) & 1); i -= 1 }
  }

  def decodeUEGkSuffix(d: Decoder, uCoff: Int, k0: Int): Int = {
    var v = uCoff
    var k = k0
    while (d.decodeBypass() == 1) { v += 1 << k; k += 1 }
    var i = k - 1
    while (i >= 0) { v += d.decodeBypass() << i; i -= 1 }
    v
  }

  /** Fixed-length binarization: `n` bypass bins, MSB first. */
  def encodeFLBypass(e: Encoder, v: Int, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { e.encodeBypass((v >> i) & 1); i -= 1 }
  }

  def decodeFLBypass(d: Decoder, n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) { v = (v << 1) | d.decodeBypass(); i += 1 }
    v
  }
}
