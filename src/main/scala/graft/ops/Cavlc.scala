package graft.ops

/** CAVLC residual-block entropy coding (ITU-T H.264 §9.2, public spec) —
  * the entropy layer under [[H264Decode]]'s Intra_16x16 path. Implements
  * the full §9.2.2–9.2.4 machinery: coeff_token, trailing-one signs,
  * level_prefix/level_suffix with suffix-length adaptation, total_zeros,
  * run_before, and the reverse-scan coefficient placement.
  *
  * TABLE POLICY (the family's no-silent-wrong contract): a wrong VLC
  * table entry decodes real streams to WRONG pixels with decode_error
  * null — the exact silent-data class this repo forbids — so every
  * transcribed column must clear the structural tripwires in CavlcSpec:
  * prefix-freeness, an EXACT Kraft sum (complete, or complete minus the
  * single all-zeros hole the spec reserves so the code never dead-ends
  * on a zero run), and the shared-table encoder round-trip. ALL of Table
  * 9-5's CAVLC columns are now carried: 0 ≤ nC < 2, 2 ≤ nC < 4,
  * 4 ≤ nC < 8 (each Kraft-pinned: the first two leave exactly the
  * all-zeros word unused — 2⁻¹⁵ and 2⁻¹³ — and the third leaves the
  * lone 2⁻¹⁰ slot its len-10 near-FLC tail cannot fill), nC ≥ 8 (6-bit
  * FLC, algorithmic), and chroma DC (nC = −1); total_zeros carries all
  * 4×4 columns TotalCoeff 1–15 plus the chroma-DC table (every column
  * exactly complete); run_before carries all rows (zerosLeft 1–6 and
  * the >6 unary extension). What still refuses by name is outside these
  * tables entirely: CABAC, I_4x4 prediction-mode me(v), High-profile
  * deep level escapes.
  *
  * The encoder half ([[encodeResidualBlock]]) exists for the synthetic
  * fixtures only and shares the SAME table data, so the two directions
  * cannot drift; decoder correctness is anchored by closed-form pixel
  * expectations computed independently in the specs and oracles.
  */
private[ops] object Cavlc {

  /** Named refusal: the stream needs a table column or escape form this
    * decoder does not carry. Caught at the slice level → per-clip
    * degradation with the message verbatim.
    */
  final class Unsupported(msg: String) extends RuntimeException(msg)

  /** A prefix-free VLC table: entries (code-bits-as-string, a, b). Decode
    * probes an int-keyed per-length table — one accumulator shift and one
    * unboxed array probe per bit, no String building in the hot loop
    * (this sits under every coefficient of every macroblock).
    */
  private[ops] final class Vlc(val entries: Seq[(String, Int, Int)]) {
    val maxLen: Int = entries.map(_._1.length).max
    // byLen(len) maps the accumulated code value (as an int) of a
    // `len`-bit code to its packed (a << 16 | b); -1 = no code. Dense
    // arrays: codes are ≤ 16 bits so the largest table is 64Ki ints.
    private val byLen: Array[Array[Int]] = {
      val t = Array.tabulate(maxLen + 1)(len =>
        if (entries.exists(_._1.length == len)) Array.fill(1 << len)(-1)
        else null)
      entries.foreach { case (c, a, b) =>
        t(c.length)(Integer.parseInt(c, 2)) = (a << 16) | b
      }
      t
    }
    private val codeOf: Map[(Int, Int), String] =
      entries.map { case (c, a, b) => ((a, b)) -> c }.toMap
    def decode(r: VideoBitstream.BitReader, what: String): (Int, Int) = {
      var acc = 0
      var len = 0
      while (len < maxLen) {
        acc = (acc << 1) | r.u1()
        len += 1
        val row = byLen(len)
        if (row != null) {
          val v = row(acc)
          if (v >= 0) return (v >> 16, v & 0xffff)
        }
      }
      throw new Unsupported(s"malformed $what code")
    }
    def encode(w: VideoBitstream.BitWriter, a: Int, b: Int, what: String): Unit = {
      val c = codeOf.getOrElse((a, b),
        throw new Unsupported(s"no $what code for ($a, $b)"))
      c.foreach(ch => w.u(if (ch == '1') 1 else 0, 1))
    }
  }

  /** coeff_token, 0 ≤ nC < 2 (Table 9-5 first column): code →
    * (TrailingOnes, TotalCoeff). Anchored by the published worked
    * examples ((0,0)=1, (1,1)=01, (2,2)=001, (3,3)=00011, (3,5)=0000100).
    */
  private[ops] val CoeffTokenNc0 = new Vlc(Seq(
    ("1", 0, 0),
    ("000101", 0, 1), ("01", 1, 1),
    ("00000111", 0, 2), ("000100", 1, 2), ("001", 2, 2),
    ("000000111", 0, 3), ("00000110", 1, 3), ("0000101", 2, 3), ("00011", 3, 3),
    ("0000000111", 0, 4), ("000000110", 1, 4), ("00000101", 2, 4), ("000011", 3, 4),
    ("00000000111", 0, 5), ("0000000110", 1, 5), ("000000101", 2, 5), ("0000100", 3, 5),
    ("0000000001111", 0, 6), ("00000000110", 1, 6), ("0000000101", 2, 6), ("00000100", 3, 6),
    ("0000000001011", 0, 7), ("0000000001110", 1, 7), ("00000000101", 2, 7), ("000000100", 3, 7),
    ("0000000001000", 0, 8), ("0000000001010", 1, 8), ("0000000001101", 2, 8), ("0000000100", 3, 8),
    ("00000000001111", 0, 9), ("00000000001110", 1, 9), ("0000000001001", 2, 9), ("00000000100", 3, 9),
    ("00000000001011", 0, 10), ("00000000001010", 1, 10), ("00000000001101", 2, 10), ("0000000001100", 3, 10),
    ("000000000001111", 0, 11), ("000000000001110", 1, 11), ("00000000001001", 2, 11), ("00000000001000", 3, 11),
    ("000000000001011", 0, 12), ("000000000001010", 1, 12), ("000000000001101", 2, 12), ("00000000001100", 3, 12),
    ("0000000000001111", 0, 13), ("000000000000001", 1, 13), ("000000000001001", 2, 13), ("000000000001100", 3, 13),
    ("0000000000001011", 0, 14), ("0000000000001110", 1, 14), ("0000000000001101", 2, 14), ("000000000001000", 3, 14),
    ("0000000000000111", 0, 15), ("0000000000001010", 1, 15), ("0000000000001001", 2, 15), ("0000000000001100", 3, 15),
    ("0000000000000100", 0, 16), ("0000000000000110", 1, 16), ("0000000000000101", 2, 16), ("0000000000001000", 3, 16)))

  /** coeff_token, 2 ≤ nC < 4 (Table 9-5 second VLC column). Same tree
    * shape as the nC<2 column one level shallower: max length 14, and
    * the all-zeros 13-bit word is the column's single reserved hole
    * (Kraft sum 1 − 2⁻¹³, pinned by CavlcSpec).
    */
  private[ops] val CoeffTokenNc2 = new Vlc(Seq(
    ("11", 0, 0),
    ("001011", 0, 1), ("10", 1, 1),
    ("000111", 0, 2), ("00111", 1, 2), ("011", 2, 2),
    ("0000111", 0, 3), ("001010", 1, 3), ("001001", 2, 3), ("0101", 3, 3),
    ("00000111", 0, 4), ("000110", 1, 4), ("000101", 2, 4), ("0100", 3, 4),
    ("00000100", 0, 5), ("0000110", 1, 5), ("0000101", 2, 5), ("00110", 3, 5),
    ("000000111", 0, 6), ("00000110", 1, 6), ("00000101", 2, 6), ("001000", 3, 6),
    ("00000001111", 0, 7), ("000000110", 1, 7), ("000000101", 2, 7), ("000100", 3, 7),
    ("00000001011", 0, 8), ("00000001110", 1, 8), ("00000001101", 2, 8), ("0000100", 3, 8),
    ("000000001111", 0, 9), ("00000001010", 1, 9), ("00000001001", 2, 9), ("000000100", 3, 9),
    ("000000001011", 0, 10), ("000000001110", 1, 10), ("000000001101", 2, 10), ("00000001100", 3, 10),
    ("000000001000", 0, 11), ("000000001010", 1, 11), ("000000001001", 2, 11), ("00000001000", 3, 11),
    ("0000000001111", 0, 12), ("0000000001110", 1, 12), ("0000000001101", 2, 12), ("000000001100", 3, 12),
    ("0000000001011", 0, 13), ("0000000001010", 1, 13), ("0000000001001", 2, 13), ("0000000001100", 3, 13),
    ("0000000000111", 0, 14), ("00000000001011", 1, 14), ("0000000000110", 2, 14), ("0000000001000", 3, 14),
    ("00000000001001", 0, 15), ("00000000001000", 1, 15), ("00000000001010", 2, 15), ("0000000000001", 3, 15),
    ("00000000000111", 0, 16), ("00000000000110", 1, 16), ("00000000000101", 2, 16), ("00000000000100", 3, 16)))

  /** coeff_token, 4 ≤ nC < 8 (Table 9-5 third VLC column) — the
    * near-FLC design: max length 10, each length owns one subtree, and
    * the all-zeros 10-bit word IS a code here ((1,16)); the column's
    * single hole is the lone 10-bit slot `0000000111` (Kraft sum
    * 1 − 2⁻¹⁰, pinned by CavlcSpec).
    */
  private[ops] val CoeffTokenNc4 = new Vlc(Seq(
    ("1111", 0, 0),
    ("001111", 0, 1), ("1110", 1, 1),
    ("001011", 0, 2), ("01111", 1, 2), ("1101", 2, 2),
    ("001000", 0, 3), ("01100", 1, 3), ("01110", 2, 3), ("1100", 3, 3),
    ("0001111", 0, 4), ("01010", 1, 4), ("01011", 2, 4), ("1011", 3, 4),
    ("0001011", 0, 5), ("01000", 1, 5), ("01001", 2, 5), ("1010", 3, 5),
    ("0001001", 0, 6), ("001110", 1, 6), ("001101", 2, 6), ("1001", 3, 6),
    ("0001000", 0, 7), ("001010", 1, 7), ("001001", 2, 7), ("1000", 3, 7),
    ("00001111", 0, 8), ("0001110", 1, 8), ("0001101", 2, 8), ("01101", 3, 8),
    ("00001011", 0, 9), ("00001110", 1, 9), ("0001010", 2, 9), ("001100", 3, 9),
    ("000001111", 0, 10), ("00001010", 1, 10), ("00001101", 2, 10), ("0001100", 3, 10),
    ("000001011", 0, 11), ("000001110", 1, 11), ("00001001", 2, 11), ("00001100", 3, 11),
    ("000001000", 0, 12), ("000001010", 1, 12), ("000001101", 2, 12), ("00001000", 3, 12),
    ("0000001101", 0, 13), ("000000111", 1, 13), ("000001001", 2, 13), ("000001100", 3, 13),
    ("0000001001", 0, 14), ("0000001100", 1, 14), ("0000001011", 2, 14), ("0000001010", 3, 14),
    ("0000000101", 0, 15), ("0000000100", 1, 15), ("0000000110", 2, 15), ("0000001000", 3, 15),
    ("0000000001", 0, 16), ("0000000000", 1, 16), ("0000000010", 2, 16), ("0000000011", 3, 16)))

  /** coeff_token for chroma DC, 4:2:0 (nC == −1 column of Table 9-5). */
  private[ops] val CoeffTokenChromaDc = new Vlc(Seq(
    ("01", 0, 0),
    ("000111", 0, 1), ("1", 1, 1),
    ("000100", 0, 2), ("000110", 1, 2), ("001", 2, 2),
    ("000011", 0, 3), ("0000011", 1, 3), ("0000010", 2, 3), ("000101", 3, 3),
    ("000010", 0, 4), ("00000011", 1, 4), ("00000010", 2, 4), ("0000000", 3, 4)))

  /** total_zeros for 4×4 blocks (Table 9-7), all columns TotalCoeff
    * 1–15: code → total_zeros. Every column is an exactly-complete
    * prefix code except column 1 (the spec's single 9-bit hole) —
    * CavlcSpec pins each sum.
    */
  private[ops] val TotalZeros4x4: Map[Int, Vlc] = Map(
    1 -> new Vlc(Seq(("1", 0, 0), ("011", 1, 0), ("010", 2, 0), ("0011", 3, 0),
      ("0010", 4, 0), ("00011", 5, 0), ("00010", 6, 0), ("000011", 7, 0),
      ("000010", 8, 0), ("0000011", 9, 0), ("0000010", 10, 0),
      ("00000011", 11, 0), ("00000010", 12, 0), ("000000011", 13, 0),
      ("000000010", 14, 0), ("000000001", 15, 0))),
    2 -> new Vlc(Seq(("111", 0, 0), ("110", 1, 0), ("101", 2, 0), ("100", 3, 0),
      ("011", 4, 0), ("0101", 5, 0), ("0100", 6, 0), ("0011", 7, 0),
      ("0010", 8, 0), ("00011", 9, 0), ("00010", 10, 0), ("000011", 11, 0),
      ("000010", 12, 0), ("000001", 13, 0), ("000000", 14, 0))),
    3 -> new Vlc(Seq(("0101", 0, 0), ("111", 1, 0), ("110", 2, 0), ("101", 3, 0),
      ("0100", 4, 0), ("0011", 5, 0), ("100", 6, 0), ("011", 7, 0),
      ("0010", 8, 0), ("00011", 9, 0), ("00010", 10, 0), ("000001", 11, 0),
      ("00001", 12, 0), ("000000", 13, 0))),
    4 -> new Vlc(Seq(("00011", 0, 0), ("111", 1, 0), ("0101", 2, 0), ("0100", 3, 0),
      ("110", 4, 0), ("101", 5, 0), ("100", 6, 0), ("0011", 7, 0),
      ("011", 8, 0), ("0010", 9, 0), ("00010", 10, 0), ("00001", 11, 0),
      ("00000", 12, 0))),
    5 -> new Vlc(Seq(("0101", 0, 0), ("0100", 1, 0), ("0011", 2, 0),
      ("111", 3, 0), ("110", 4, 0), ("101", 5, 0), ("100", 6, 0),
      ("011", 7, 0), ("0010", 8, 0), ("00001", 9, 0), ("0001", 10, 0),
      ("00000", 11, 0))),
    6 -> new Vlc(Seq(("000001", 0, 0), ("00001", 1, 0), ("111", 2, 0),
      ("110", 3, 0), ("101", 4, 0), ("100", 5, 0), ("011", 6, 0),
      ("010", 7, 0), ("0001", 8, 0), ("001", 9, 0), ("000000", 10, 0))),
    7 -> new Vlc(Seq(("000001", 0, 0), ("00001", 1, 0), ("101", 2, 0),
      ("100", 3, 0), ("011", 4, 0), ("11", 5, 0), ("010", 6, 0),
      ("0001", 7, 0), ("001", 8, 0), ("000000", 9, 0))),
    8 -> new Vlc(Seq(("000001", 0, 0), ("0001", 1, 0), ("00001", 2, 0),
      ("011", 3, 0), ("11", 4, 0), ("10", 5, 0), ("010", 6, 0),
      ("001", 7, 0), ("000000", 8, 0))),
    9 -> new Vlc(Seq(("000001", 0, 0), ("000000", 1, 0), ("0001", 2, 0),
      ("11", 3, 0), ("10", 4, 0), ("001", 5, 0), ("01", 6, 0),
      ("00001", 7, 0))),
    10 -> new Vlc(Seq(("00001", 0, 0), ("00000", 1, 0), ("001", 2, 0),
      ("11", 3, 0), ("10", 4, 0), ("01", 5, 0), ("0001", 6, 0))),
    11 -> new Vlc(Seq(("0000", 0, 0), ("0001", 1, 0), ("001", 2, 0),
      ("010", 3, 0), ("1", 4, 0), ("011", 5, 0))),
    12 -> new Vlc(Seq(("0000", 0, 0), ("0001", 1, 0), ("01", 2, 0),
      ("1", 3, 0), ("001", 4, 0))),
    13 -> new Vlc(Seq(("000", 0, 0), ("001", 1, 0), ("1", 2, 0),
      ("01", 3, 0))),
    14 -> new Vlc(Seq(("00", 0, 0), ("01", 1, 0), ("1", 2, 0))),
    15 -> new Vlc(Seq(("0", 0, 0), ("1", 1, 0))))

  /** total_zeros for chroma DC 2×2 blocks (Table 9-9(a)), by TotalCoeff. */
  private[ops] val TotalZerosChromaDc: Map[Int, Vlc] = Map(
    1 -> new Vlc(Seq(("1", 0, 0), ("01", 1, 0), ("001", 2, 0), ("000", 3, 0))),
    2 -> new Vlc(Seq(("1", 0, 0), ("01", 1, 0), ("00", 2, 0))),
    3 -> new Vlc(Seq(("1", 0, 0), ("0", 1, 0))))

  /** run_before (Table 9-10), by min(zerosLeft, 7): code → run. The >6
    * column is 3-bit FLC for runs 0–6 then unary-extended.
    */
  private[ops] val RunBefore: Map[Int, Vlc] = Map(
    1 -> new Vlc(Seq(("1", 0, 0), ("0", 1, 0))),
    2 -> new Vlc(Seq(("1", 0, 0), ("01", 1, 0), ("00", 2, 0))),
    3 -> new Vlc(Seq(("11", 0, 0), ("10", 1, 0), ("01", 2, 0), ("00", 3, 0))),
    4 -> new Vlc(Seq(("11", 0, 0), ("10", 1, 0), ("01", 2, 0), ("001", 3, 0),
      ("000", 4, 0))),
    5 -> new Vlc(Seq(("11", 0, 0), ("10", 1, 0), ("011", 2, 0), ("010", 3, 0),
      ("001", 4, 0), ("000", 5, 0))),
    6 -> new Vlc(Seq(("11", 0, 0), ("000", 1, 0), ("001", 2, 0), ("011", 3, 0),
      ("010", 4, 0), ("101", 5, 0), ("100", 6, 0))),
    7 -> new Vlc(Seq(("111", 0, 0), ("110", 1, 0), ("101", 2, 0), ("100", 3, 0),
      ("011", 4, 0), ("010", 5, 0), ("001", 6, 0), ("0001", 7, 0),
      ("00001", 8, 0), ("000001", 9, 0), ("0000001", 10, 0),
      ("00000001", 11, 0), ("000000001", 12, 0), ("0000000001", 13, 0),
      ("00000000001", 14, 0))))

  private def coeffTokenTable(nC: Int): Vlc =
    if (nC == -1) CoeffTokenChromaDc
    else if (nC >= 0 && nC < 2) CoeffTokenNc0
    else if (nC < 4) CoeffTokenNc2
    else if (nC < 8) CoeffTokenNc4
    else null // nC >= 8: 6-bit FLC, handled inline

  /** Decode one residual block (§9.2): returns the coefficients in SCAN
    * order (length `maxNumCoeff`) and the TotalCoeff (the nC contribution
    * this block makes to its right/below neighbours).
    */
  private[ops] def decodeResidualBlock(r: VideoBitstream.BitReader,
      nC: Int, maxNumCoeff: Int): (Array[Int], Int) = {
    val table = coeffTokenTable(nC)
    val (t1s, total) =
      if (table != null) table.decode(r, "coeff_token")
      else {
        val code = r.u(6) // nC >= 8: FLC, value = 4*(TotalCoeff-1) + T1s
        if (code == 3) (0, 0)
        else ((code & 3), (code >> 2) + 1)
      }
    val out = new Array[Int](maxNumCoeff)
    if (total == 0) return (out, 0)
    if (total > maxNumCoeff) throw new Unsupported("malformed coeff_token")
    // the nC >= 8 FLC admits any 6-bit value, including encodings with
    // TrailingOnes > TotalCoeff — refuse by name, don't overrun below
    if (t1s > total) throw new Unsupported("malformed coeff_token")
    // levels, highest scan position first
    val level = new Array[Int](total)
    var suffixLength = if (total > 10 && t1s < 3) 1 else 0
    var i = 0
    while (i < t1s) {
      level(i) = if (r.u1() == 1) -1 else 1
      i += 1
    }
    while (i < total) {
      var prefix = 0
      while (r.u1() == 0) {
        prefix += 1
        if (prefix > 32) throw new Unsupported("malformed level_prefix")
      }
      var levelCode =
        if (prefix < 15) (prefix << suffixLength) +
          (if (suffixLength > 0) r.u(suffixLength)
           else if (prefix == 14) r.u(4) + 0 else 0)
        else {
          // escape: 12-bit suffix (baseline); longer prefixes are the
          // High-profile deep-escape form — refuse by name
          if (prefix > 15)
            throw new Unsupported("level_prefix > 15 escape not implemented")
          var lc = (15 << suffixLength) + r.u(12)
          if (suffixLength == 0) lc += 15
          lc
        }
      if (i == t1s && t1s < 3) levelCode += 2
      level(i) =
        if (levelCode % 2 == 0) (levelCode + 2) >> 1
        else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // total_zeros
    val zerosTotal =
      if (total == maxNumCoeff) 0
      else if (nC == -1)
        TotalZerosChromaDc.getOrElse(total,
          throw new Unsupported(s"chroma total_zeros column $total")).
          decode(r, "total_zeros")._1
      else
        TotalZeros4x4.getOrElse(total, throw new Unsupported(
          s"total_zeros column out of range ($total)")).
          decode(r, "total_zeros")._1
    if (total + zerosTotal > maxNumCoeff)
      throw new Unsupported("malformed total_zeros")
    // run_before per coefficient (except the lowest, which absorbs the rest)
    val run = new Array[Int](total)
    var zerosLeft = zerosTotal
    i = 0
    while (i < total - 1 && zerosLeft > 0) {
      run(i) = RunBefore(math.min(zerosLeft, 7)).decode(r, "run_before")._1
      if (run(i) > zerosLeft) throw new Unsupported("malformed run_before")
      zerosLeft -= run(i)
      i += 1
    }
    run(total - 1) = zerosLeft
    // place from the lowest scan position upward
    var coeffNum = -1
    i = total - 1
    while (i >= 0) {
      coeffNum += run(i) + 1
      out(coeffNum) = level(i)
      i -= 1
    }
    (out, total)
  }

  /** Encode one residual block — the fixture-side inverse of
    * [[decodeResidualBlock]] over the SAME tables. `coeffs` is in scan
    * order, length = maxNumCoeff. Supports the level ranges the fixtures
    * use (|level| small); throws for escape forms.
    */
  private[ops] def encodeResidualBlock(w: VideoBitstream.BitWriter,
      coeffs: Array[Int], nC: Int, maxNumCoeff: Int): Int = {
    require(coeffs.length == maxNumCoeff, "coeffs must be scan-order, full length")
    val nz = coeffs.zipWithIndex.filter(_._1 != 0)
    val total = nz.length
    // trailing ones: up to 3 |1| coefficients at the HIGHEST scan positions
    var t1s = 0
    while (t1s < 3 && t1s < total && math.abs(nz(total - 1 - t1s)._1) == 1) t1s += 1
    val table = coeffTokenTable(nC)
    if (table != null) table.encode(w, t1s, total, "coeff_token")
    else {
      val code = if (total == 0) 3 else 4 * (total - 1) + t1s
      w.u(code, 6)
    }
    if (total == 0) return 0
    var i = 0
    while (i < t1s) { // signs, highest first
      w.u(if (nz(total - 1 - i)._1 < 0) 1 else 0, 1)
      i += 1
    }
    var suffixLength = if (total > 10 && t1s < 3) 1 else 0
    while (i < total) {
      val v = nz(total - 1 - i)._1
      var levelCode = if (v > 0) 2 * v - 2 else -2 * v - 1
      if (i == t1s && t1s < 3) levelCode -= 2
      if (suffixLength == 0) {
        if (levelCode < 14) w.u(1, levelCode + 1) // levelCode zeros then 1
        else if (levelCode < 30) { w.u(1, 15); w.u(levelCode - 14, 4) }
        else if (levelCode < 30 + 4096) { w.u(1, 16); w.u(levelCode - 30, 12) }
        else throw new Unsupported("fixture level too large for suffixLength 0")
      } else {
        val prefix = levelCode >> suffixLength
        if (prefix < 15) { w.u(1, prefix + 1); w.u(levelCode & ((1 << suffixLength) - 1), suffixLength) }
        else if (levelCode - (15 << suffixLength) < 4096) {
          w.u(1, 16); w.u(levelCode - (15 << suffixLength), 12)
        }
        else throw new Unsupported("fixture level too large")
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(v) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    if (total < maxNumCoeff) {
      val zerosTotal = nz.last._2 + 1 - total
      if (nC == -1) TotalZerosChromaDc(total).encode(w, zerosTotal, 0, "total_zeros")
      else TotalZeros4x4.getOrElse(total, throw new Unsupported(
        s"fixture total_zeros column out of range ($total)")).
        encode(w, zerosTotal, 0, "total_zeros")
      // runs, highest coefficient first
      val scans = nz.map(_._2)
      var zerosLeft = zerosTotal
      i = 0
      while (i < total - 1 && zerosLeft > 0) {
        val run = scans(total - 1 - i) - scans(total - 2 - i) - 1
        RunBefore(math.min(zerosLeft, 7)).encode(w, run, 0, "run_before")
        zerosLeft -= run
        i += 1
      }
    }
    total
  }

  /** All tables, for the spec's mechanical prefix-freeness check. */
  private[ops] def allTables: Seq[(String, Vlc)] =
    Seq("coeff_token[0<=nC<2]" -> CoeffTokenNc0,
      "coeff_token[2<=nC<4]" -> CoeffTokenNc2,
      "coeff_token[4<=nC<8]" -> CoeffTokenNc4,
      "coeff_token[chromaDC]" -> CoeffTokenChromaDc) ++
      TotalZeros4x4.map { case (k, v) => s"total_zeros[$k]" -> v } ++
      TotalZerosChromaDc.map { case (k, v) => s"total_zeros_chroma[$k]" -> v } ++
      RunBefore.map { case (k, v) => s"run_before[$k]" -> v }
}
