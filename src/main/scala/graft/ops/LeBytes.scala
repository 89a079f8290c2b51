package graft.ops

/** Shared little-endian / bit-field readers for the byte-walk census
  * parsers (IVF's DKIF header, Ogg page headers, FLAC STREAMINFO...).
  * One home so the next LE container parser doesn't grow a third copy.
  * All bounds-checking is the CALLER's (per-clip try/catch contract).
  */
private[ops] object LeBytes {
  def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  def u64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(o + i) & 0xffL); i -= 1 }
    v
  }
  /** MSB-first bit field at an absolute bit offset (FLAC STREAMINFO). */
  def bits(b: Array[Byte], bitOff: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) {
      val p = bitOff + i
      v = (v << 1) | ((b(p >> 3) >> (7 - (p & 7))) & 1)
      i += 1
    }
    v
  }
}
