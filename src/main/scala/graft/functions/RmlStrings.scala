package graft.functions

/** Pure string helpers implementing the reference engine's term-construction
  * semantics (see SURVEY.md §2.4). Behavior derived from the reference:
  *   - percent-encoding compatible with Python `urllib.parse.quote` with the
  *     reference's safe set (reference: functions.py:580-582)
  *   - N-Triples literal escaping (reference: semantify.py:6775-6786)
  *   - blank-node label encoding (reference: semantify.py:6354-6367)
  *   - base36 id encoding (reference: functions.py:1009-1027)
  *   - null lattice: None/""/whitespace/"nan"/"N/A"/"NULL" kill the triple
  *     (reference: functions.py:1882-1918)
  *
  * All methods are static and deterministic so Catalyst expressions can call
  * them from generated code.
  */
object RmlStrings {

  /** Characters Python's urllib.parse.quote never encodes (ALWAYS_SAFE)
    * plus the reference's safe set "_-.~:@=+%" (alnum and _.-~ are already
    * always-safe; the extras are : @ = + %).
    */
  private def isSafe(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
    c == '_' || c == '.' || c == '-' || c == '~' ||
    c == ':' || c == '@' || c == '=' || c == '+' || c == '%'

  private val HEX = "0123456789ABCDEF"

  /** Percent-encode exactly like Python `quote(s, safe="_-.~:@=+%")`:
    * UTF-8 bytes of unsafe chars become %XX with uppercase hex.
    */
  def encode(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isSafe(c)) sb.append(c)
      else {
        val cp = s.codePointAt(i)
        val bytes = new String(Character.toChars(cp)).getBytes("UTF-8")
        var j = 0
        while (j < bytes.length) {
          val b = bytes(j) & 0xff
          sb.append('%').append(HEX.charAt(b >> 4)).append(HEX.charAt(b & 0xf))
          j += 1
        }
        if (Character.isSupplementaryCodePoint(cp)) i += 1
      }
      i += 1
    }
    sb.toString
  }

  /** Escape a literal for N-Triples output: backslash, double quote,
    * newline, carriage return, tab.
    */
  def ntEscape(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Blank-node label encoding: percent-encode then replace '/'→"2F" and
    * '.'→"2E" so the label stays in the bnode charset.
    */
  def blankNodeEncode(s: String): String = {
    if (s == null) return null
    encode(s).replace("/", "2F").replace(".", "2E")
  }

  /** base36 encoding of a non-negative long (dictionary-compression ids). */
  def base36(n: Long): String = {
    require(n >= 0, "base36 of negative")
    if (n == 0) return "0"
    val digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    val sb = new java.lang.StringBuilder
    var v = n
    while (v > 0) { sb.append(digits.charAt((v % 36).toInt)); v /= 36 }
    sb.reverse.toString
  }

  /** The reference's null lattice: these values kill the triple. */
  def isRmlNull(s: String): Boolean =
    s == null || s.trim.isEmpty || s == "nan" || s == "N/A" || s == "NULL"

  /** Minimal slugify compatible with python-slugify defaults on ASCII-ish
    * input: lowercase, non-alnum runs collapse to single '-', trimmed.
    */
  def slugify(s: String): String = {
    if (s == null) return null
    val lowered = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFKD)
      .replaceAll("[\\p{M}]", "")
      .toLowerCase
    lowered.replaceAll("[^a-z0-9]+", "-").replaceAll("^-+|-+$", "")
  }

  /** xsd:dateTime normalization: a single space separator becomes 'T'
    * (reference: semantify.py:6796-6801).
    */
  def normalizeDateTime(s: String): String = {
    if (s == null) return null
    if (s.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}.*")) s.replaceFirst(" ", "T")
    else s
  }

  /** Deterministic 64-bit FNV-1a hash (used for simhash/fingerprints). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
