package graft.ops

class ZstdSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("zunstdIfNeeded: round-trips zstd frames, passes non-zstd through, " +
      "caps decompression bombs, frees the native context on every path") {
    val raw = ("zstd payload " * 100).getBytes("UTF-8")
    val z = Archives.zstdWrap(raw)
    assert(z(0) == 0x28.toByte && z(1) == 0xb5.toByte)
    assert(Archives.zunstdIfNeeded(z).toSeq == raw.toSeq)
    assert(Archives.zunstdIfNeeded(raw) eq raw) // passthrough, no copy
    // bomb cap: a highly-compressible frame refuses beyond maxBytes
    val bomb = Archives.zstdWrap(new Array[Byte](1 << 20))
    val e = intercept[java.io.IOException] {
      Archives.zunstdIfNeeded(bomb, maxBytes = 1024L)
    }
    assert(e.getMessage.contains("decompression bomb"))
    // magic dispatch: gzip goes to the gzip kernel, zstd to zstd
    assert(Archives.inflateIfCompressed(
      Archives.gzipWrap(raw, gzipped = true)).toSeq == raw.toSeq)
    assert(Archives.inflateIfCompressed(z).toSeq == raw.toSeq)
  }

  test("gunzipIfNeeded: corrupt headers after a valid magic refuse " +
      "cleanly (no native allocation), CRC/ISIZE trailers verified, " +
      "multi-member streams concatenate") {
    val a = Archives.gzipWrap("first ".getBytes("UTF-8"), gzipped = true)
    val b = Archives.gzipWrap("second".getBytes("UTF-8"), gzipped = true)
    assert(new String(Archives.gunzipIfNeeded(a ++ b), "UTF-8") == "first second")
    // corrupt CM byte after the magic
    val badCm = a.clone(); badCm(2) = 9
    val e1 = intercept[java.io.IOException](Archives.gunzipIfNeeded(badCm))
    assert(e1.getMessage == "corrupt gzip header")
    // flipped data bit → CRC mismatch (or a deflate error), never silence
    val flipped = a.clone(); flipped(12) = (flipped(12) ^ 0x40).toByte
    intercept[java.io.IOException](Archives.gunzipIfNeeded(flipped))
    // truncated trailer
    val cut = java.util.Arrays.copyOf(a, a.length - 3)
    intercept[java.io.IOException](Archives.gunzipIfNeeded(cut))
  }
}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArchivesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tarMembers: plain and .tar.gz round-trip names, sizes, offsets, text") {
    val df = Seq((0L, false), (1L, true)).toDF("doc_id", "gz")
      .select(col("doc_id"),
        Archives.syntheticTar(lit(3), lit(4), col("gz")).as("payload"))
    val out = Archives.tarMembers(df).orderBy("doc_id", "member_idx").collect()
    assert(out.length == 6)
    out.grouped(3).foreach { g =>
      assert(g.map(_.getAs[String]("member_name")).toSeq ==
        Seq("dir/file0.txt", "dir/file1.txt", "dir/file2.txt"))
      // len(k) = 20 + (4 + 7k) % 40 → 24, 31, 38
      assert(g.map(_.getAs[Long]("member_size")).toSeq == Seq(24L, 31L, 38L))
      assert(g.map(_.getAs[Long]("data_offset")).toSeq == Seq(512L, 1536L, 2560L))
      assert(g(0).getAs[String]("member_text") == "the quick brown fox jump")
      assert(g.forall(_.getAs[String]("parse_error") == null))
    }
  }

  test("tarMembers: truncation keeps walked members; garbage and null degrade") {
    val full = Seq((0L, 1)).toDF("doc_id", "x")
      .select(col("doc_id"), Archives.syntheticTar(lit(2), lit(0), lit(false)).as("payload"))
      .collect().head.getAs[Array[Byte]]("payload")
    // member 1 (len 27) has its header at 1024 and data at 1536; cut 10
    // bytes into the data so the header is intact but the body is not
    val cut = java.util.Arrays.copyOf(full, 1536 + 10)
    val df = Seq((0L, cut), (1L, "not a tarball either".getBytes("UTF-8")),
      (2L, null: Array[Byte])).toDF("doc_id", "payload")
    val out = Archives.tarMembers(df).collect().groupBy(_.getAs[Long]("doc_id"))
    val d0 = out(0L).sortBy(_.getAs[Int]("member_idx"))
    assert(d0.head.getAs[String]("member_name") == "dir/file0.txt")
    assert(d0.last.getAs[String]("parse_error") == "truncated member")
    assert(out(1L).head.getAs[String]("parse_error") ==
      "not a tar stream (shorter than one header block)")
    val block = new Array[Byte](1536); block(0) = 'x'
    val bm = Seq((9L, block)).toDF("doc_id", "payload")
    assert(Archives.tarMembers(bm).collect().head
      .getAs[String]("parse_error") == "not a tar stream (bad magic)")
    assert(out(2L).head.getAs[String]("parse_error") == "null payload")
  }

  test("tarMemberBytes → zipMembers: nested tar-of-zips composition " +
      "round-trips every inner member; gz outer wrap covered") {
    val df = Seq((0L, false), (1L, true)).toDF("doc_id", "gz")
      .select(col("doc_id"), Archives.syntheticTarOfZips(
        lit(2), lit(3), lit(4), col("gz")).as("payload"))
    val zips = Archives.tarMemberBytes(df)
      .where(col("type_flag") === "0" && col("parse_error").isNull)
      .select(col("doc_id"), col("member_idx").as("zip_idx"),
        col("member_name").as("zip_name"), col("member_bytes").as("payload"))
    val out = Archives.zipMembers(zips)
      .orderBy("doc_id", "zip_idx", "member_idx").collect()
    assert(out.length == 2 * 2 * 3) // 2 docs × 2 zips × 3 members
    val first = out.head
    assert(first.getAs[String]("zip_name") == "zips/part0.zip")
    assert(first.getAs[String]("member_name") == "dir/file0.zip.txt")
    // len(z=0, k=0) = 20 + 4 % 40 = 24
    assert(first.getAs[Long]("uncompressed_size") == 24L)
    assert(first.getAs[String]("member_text") == "the quick brown fox jump")
    assert(out.forall(_.getAs[String]("parse_error") == null))
    // gz and plain outer tars yield identical inner tables
    val (d0, d1) = out.partition(_.getAs[Long]("doc_id") == 0L)
    assert(d0.map(r => (r.getAs[Int]("zip_idx"), r.getAs[Int]("member_idx"),
        r.getAs[String]("member_text"))).toSeq ==
      d1.map(r => (r.getAs[Int]("zip_idx"), r.getAs[Int]("member_idx"),
        r.getAs[String]("member_text"))).toSeq)
  }

  test("zipMembers: STORED archive round-trips census and text") {
    val df = Seq((0L, 1)).toDF("doc_id", "x")
      .select(col("doc_id"), Archives.syntheticZip(lit(2), lit(9)).as("payload"))
    val out = Archives.zipMembers(df).orderBy("member_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("member_name") == "dir/file0.zip.txt")
    assert(out(0).getAs[Int]("method") == 0)
    // len(0) = 20 + 9 % 40 = 29
    assert(out(0).getAs[Long]("uncompressed_size") == 29L)
    assert(out(0).getAs[String]("member_text") == "the quick brown fox jumps ove")
    assert(out.forall(_.getAs[String]("parse_error") == null))
  }

  test("zipMembers: DEFLATED members inflate through the raw Inflater path") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val text = "repetitive content " * 50 // compresses well → csize < usize
    z.putNextEntry(new java.util.zip.ZipEntry("deep/nested/doc.md"))
    z.write(text.getBytes("UTF-8"))
    z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("empty/"))
    z.closeEntry()
    z.close()
    val df = Seq((0L, bos.toByteArray)).toDF("doc_id", "payload")
    val out = Archives.zipMembers(df).orderBy("member_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Int]("method") == 8)
    assert(out(0).getAs[Long]("compressed_size") <
      out(0).getAs[Long]("uncompressed_size"))
    assert(out(0).getAs[String]("member_text") == text)
    assert(out(1).getAs[String]("member_name") == "empty/")
    assert(out(1).getAs[String]("member_text") == null) // directory entry
    val garbage = Seq((1L, "zip? no.".getBytes("UTF-8"))).toDF("doc_id", "payload")
    assert(Archives.zipMembers(garbage).collect().head
      .getAs[String]("parse_error").startsWith("not a zip archive"))
  }

  test("decompression bombs degrade to error rows, never allocate: " +
      "oversized zip usize and unbounded gzip expansion are both capped") {
    // a central-directory usize above MaxInflatedBytes must produce a
    // 'member too large' row WITHOUT allocating the claimed buffer, and
    // the sibling member must survive untouched
    val full = Seq((0L, 1)).toDF("doc_id", "x")
      .select(Archives.syntheticZip(lit(2), lit(9)).as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    def findCentral(b: Array[Byte], nth: Int): Int = {
      var found = -1; var seen = 0; var i = 0
      while (found < 0 && i + 4 <= b.length) {
        if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 1 && b(i + 3) == 2) {
          seen += 1
          if (seen == nth) found = i
        }
        i += 1
      }
      found
    }
    val bomb = full.clone()
    val c2 = findCentral(bomb, 2)
    // usize (le32 at central+24) := 0xF0000000 (~3.75 GiB claimed)
    bomb(c2 + 24) = 0; bomb(c2 + 25) = 0; bomb(c2 + 26) = 0; bomb(c2 + 27) = 0xf0.toByte
    val out = Archives.zipMembers(Seq((0L, bomb)).toDF("doc_id", "payload"))
      .orderBy("member_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("parse_error") == null)
    assert(out(1).getAs[String]("parse_error").startsWith("member too large"))
    assert(out(1).getAs[String]("member_name") == "dir/file1.zip.txt")
    assert(out(1).getAs[Long]("uncompressed_size") == 0xf0000000L)
    // gunzip kernel: expansion past the ceiling throws (callers' per-row
    // try degrades it); a normal stream under the default cap is untouched
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(new Array[Byte](100000)) // 100 KB of zeros, ~100 B compressed
      g.close()
      bos.toByteArray
    }
    intercept[java.io.IOException] { Archives.gunzipIfNeeded(gz, maxBytes = 1000L) }
    assert(Archives.gunzipIfNeeded(gz).length == 100000)
  }

  test("zipMembers: one corrupt member cannot kill its siblings — " +
      "bad central entry keeps walked members, truncated deflate degrades per member") {
    // 3-member STORED archive; corrupt the SECOND central header's signature
    val full = Seq((0L, 1)).toDF("doc_id", "x")
      .select(Archives.syntheticZip(lit(3), lit(2)).as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    def findCentral(b: Array[Byte], nth: Int): Int = {
      var found = -1
      var seen = 0
      var i = 0
      while (found < 0 && i + 4 <= b.length) {
        if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 1 && b(i + 3) == 2) {
          seen += 1
          if (seen == nth) found = i
        }
        i += 1
      }
      found
    }
    val badSig = full.clone()
    badSig(findCentral(badSig, 2) + 3) = 99
    val out1 = Archives.zipMembers(Seq((0L, badSig)).toDF("doc_id", "payload"))
      .orderBy("member_idx").collect()
    assert(out1.length == 2)
    assert(out1(0).getAs[String]("member_name") == "dir/file0.zip.txt")
    assert(out1(0).getAs[String]("parse_error") == null)
    assert(out1(1).getAs[String]("parse_error") == "malformed central directory entry")
    // DEFLATED member whose central csize is patched short: the raw
    // Inflater stalls on exhausted input — must degrade, not hang
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("a.txt"))
    z.write(("deflate me " * 40).getBytes("UTF-8"))
    z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("b.txt"))
    z.write("sibling survives".getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    val cut = bos.toByteArray.clone()
    val c1 = findCentral(cut, 1)
    cut(c1 + 20) = 3; cut(c1 + 21) = 0 // csize := 3 (little-endian)
    val out2 = Archives.zipMembers(Seq((0L, cut)).toDF("doc_id", "payload"))
      .orderBy("member_idx").collect()
    assert(out2.length == 2)
    assert(out2(0).getAs[String]("parse_error") != null)
    assert(out2(1).getAs[String]("member_text") == "sibling survives")
    assert(out2(1).getAs[String]("parse_error") == null)
    // zip64 cd-offset sentinel 0xFFFFFFFF wraps negative through .toInt:
    // must hit the malformed-entry row, not an ArrayIndexOutOfBounds
    def findEocd(b: Array[Byte]): Int = {
      var i = b.length - 22
      while (!(b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6)) i -= 1
      i
    }
    val z64 = full.clone()
    val eo = findEocd(z64)
    (16 to 19).foreach(k => z64(eo + k) = 0xff.toByte)
    val out3 = Archives.zipMembers(Seq((0L, z64)).toDF("doc_id", "payload")).collect()
    assert(out3.length == 1)
    assert(out3.head.getAs[String]("parse_error") == "malformed central directory entry")
  }
  test("zip member integrity: an over-inflating member and a corrupt CRC " +
      "both become NAMED per-member errors, never silently truncated text") {
    // build a normal deflate zip, then corrupt the central directory
    val base = java.io.File.createTempFile("graft", ".zip")
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(base))
    val content = ("payload line. " * 40).getBytes("UTF-8")
    val e = new java.util.zip.ZipEntry("a.txt")
    zos.putNextEntry(e); zos.write(content); zos.closeEntry(); zos.close()
    val bytes = java.nio.file.Files.readAllBytes(base.toPath)
    def cdOff(b: Array[Byte]): Int = {
      // EOCD: scan back for PK\x05\x06, central dir offset at +16 LE
      var i = b.length - 22
      while (!(b(i) == 0x50 && b(i + 1) == 0x4b && b(i + 2) == 5 && b(i + 3) == 6)) i -= 1
      ((b(i + 16) & 0xff) | ((b(i + 17) & 0xff) << 8) |
        ((b(i + 18) & 0xff) << 16) | ((b(i + 19) & 0xff) << 24))
    }
    def census(b: Array[Byte]) = Archives.zipMembers(
      Seq(Tuple1(b)).toDF("payload")).collect()(0)
    assert(census(bytes).getAs[String]("parse_error") == null)
    // (a) declared usize smaller than the true inflated size
    val small = bytes.clone()
    val cd = cdOff(small)
    val trueUsize = content.length
    small(cd + 24) = 10; small(cd + 25) = 0; small(cd + 26) = 0; small(cd + 27) = 0
    val r1 = census(small)
    assert(r1.getAs[String]("parse_error") != null &&
      r1.getAs[String]("parse_error").contains("extract failed"),
      s"got: ${r1.getAs[String]("parse_error")} text=${r1.getAs[String]("member_text")}")
    // (b) corrupt CRC with correct sizes
    val badCrc = bytes.clone()
    badCrc(cdOff(badCrc) + 16) = (badCrc(cdOff(badCrc) + 16) ^ 0x5a).toByte
    val r2 = census(badCrc)
    assert(r2.getAs[String]("parse_error") != null)
    assert(trueUsize == content.length) // silence unused warning
  }

  test("negative fixture seeds cannot throw (floorMod lengths)") {
    val df = Seq(Tuple1(0L)).toDF("doc_id").select(
      Archives.syntheticTar(lit(3), lit(-30), lit(false)).as("payload"))
    assert(Archives.tarMembers(df).collect().nonEmpty)
  }

}
