package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PdfStructureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pdfCensus: version, object/page census, /Count, encryption flag; " +
      "the in-stream decoy /Type /Page is NOT counted") {
    val df = Seq((0L, 3, 7, false, 5), (1L, 1, 4, true, 2))
      .toDF("doc_id", "np", "minor", "enc", "seed")
      .select(col("doc_id"), PdfStructure.syntheticPdf(col("np"), col("minor"),
        col("enc"), col("seed")).as("payload"))
    val out = PdfStructure.pdfCensus(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[String]("pdf_version") == "1.7")
    assert(out(0L).getAs[Int]("object_count") == 6) // catalog+pages+3+stream
    assert(out(0L).getAs[Int]("page_objects") == 3) // decoy excluded
    assert(out(0L).getAs[Int]("declared_pages") == 3)
    assert(!out(0L).getAs[Boolean]("is_encrypted"))
    assert(!out(0L).getAs[Boolean]("has_xref_stream"))
    assert(out(0L).getAs[String]("parse_error") == null)
    assert(out(1L).getAs[String]("pdf_version") == "1.4")
    assert(out(1L).getAs[Boolean]("is_encrypted"))
    assert(out(1L).getAs[Int]("page_objects") == 1)
  }

  test("pdfCensus: degradation — garbage, null, truncation inside a stream") {
    val full = Seq((0L, 1)).toDF("a", "b")
      .select(PdfStructure.syntheticPdf(lit(2), lit(6), lit(false), lit(3)).as("p"))
      .collect().head.getAs[Array[Byte]]("p")
    val s = new String(full, java.nio.charset.StandardCharsets.ISO_8859_1)
    // cut inside the stream body: the decoy must STILL not count (an
    // unterminated stream is skipped to EOF, not scanned)
    val cutAt = s.indexOf("(decoy)") + 3
    val df = Seq(
      (0L, java.util.Arrays.copyOf(full, cutAt)),
      (1L, "%PDF-1.5\njust a header".getBytes("UTF-8")),
      (2L, "not a pdf at all".getBytes("UTF-8")),
      (3L, null: Array[Byte])).toDF("doc_id", "payload")
    val out = PdfStructure.pdfCensus(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Int]("page_objects") == 2)
    assert(out(0L).getAs[Int]("declared_pages") == 2)
    assert(out(0L).getAs[String]("parse_error") == null)
    assert(out(1L).getAs[Int]("object_count") == 0)
    assert(out(1L).isNullAt(out(1L).fieldIndex("declared_pages")))
    assert(out(2L).getAs[String]("parse_error") == "not a PDF (no %PDF- header)")
    assert(out(3L).getAs[String]("parse_error") == "null payload")
  }

  test("pdfCensus: real-data robustness — unordered dict keys, 'stream' " +
      "inside a literal, /PageLabel dicts") {
    // /Count BEFORE /Type in the same dict (legal: dict keys are
    // unordered), a literal containing the word 'stream' before the
    // body, and a /Type /PageLabel dict that must not count as a page
    val pdf = ("%PDF-1.6\n" +
      "1 0 obj\n<< /Title (Downstream Analysis) /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Count 2 /Kids [ 3 0 R 4 0 R ] /Type /Pages >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n" +
      "5 0 obj\n<< /Type /PageLabel /S /D >>\nendobj\n" +
      "6 0 obj\n<< /Length 9 >>\nstream\nXXXXXXXXX\nendstream\nendobj\n" +
      "trailer\n<< /Size 7 /Root 1 0 R /Count 99 >>\n%%EOF").getBytes("UTF-8")
    val out = PdfStructure.pdfCensus(
      Seq((0L, pdf)).toDF("doc_id", "payload")).collect().head
    assert(out.getAs[String]("parse_error") == null)
    assert(out.getAs[Int]("object_count") == 6) // literal didn't eat the body
    assert(out.getAs[Int]("page_objects") == 2) // PageLabel excluded
    assert(out.getAs[Int]("declared_pages") == 2) // own dict's /Count, not 99
  }

  test("pdfCensus: nested dicts inside the Pages node (real trees carry " +
      "/Resources) do not derail the /Count search in either direction") {
    // forward nesting: /Type first, then a nested (doubly-nested) dict,
    // then /Count — a naive indexOf(">>") binds the nested close and
    // loses /Count
    val fwd = ("%PDF-1.7\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Resources << /Font << /F1 5 0 R >> " +
      "/XObject << /X 6 0 R >> >> /Kids [ 3 0 R ] /Count 4 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n" +
      "trailer\n<< /Size 4 /Root 1 0 R /Count 77 >>\n%%EOF").getBytes("UTF-8")
    val o1 = PdfStructure.pdfCensus(
      Seq((0L, fwd)).toDF("doc_id", "payload")).collect().head
    assert(o1.getAs[String]("parse_error") == null)
    assert(o1.getAs[Int]("declared_pages") == 4) // not null, not 77
    // backward nesting: /Count first, then a nested dict, then /Type — a
    // naive lastIndexOf("<<") binds the nested open and loses /Count
    val bwd = ("%PDF-1.5\n" +
      "2 0 obj\n<< /Count 5 /Resources << /F 1 >> /Type /Pages /Kids [ ] >>\nendobj\n" +
      "%%EOF").getBytes("UTF-8")
    val o2 = PdfStructure.pdfCensus(
      Seq((0L, bwd)).toDF("doc_id", "payload")).collect().head
    assert(o2.getAs[String]("parse_error") == null)
    assert(o2.getAs[Int]("declared_pages") == 5)
    // a NESTED dict carrying its OWN /Count (PieceInfo etc.) must not
    // shadow the Pages node's count — /Count binds at the Pages dict's
    // own depth only
    val shadow = ("%PDF-1.6\n" +
      "2 0 obj\n<< /Type /Pages /PieceInfo << /Count 99 /App << /Count 77 >> >> " +
      "/Kids [ 3 0 R ] /Count 4 >>\nendobj\n%%EOF").getBytes("UTF-8")
    val o3 = PdfStructure.pdfCensus(
      Seq((0L, shadow)).toDF("doc_id", "payload")).collect().head
    assert(o3.getAs[String]("parse_error") == null)
    assert(o3.getAs[Int]("declared_pages") == 4,
      s"nested /Count shadowed the Pages count: got ${o3.getAs[Int]("declared_pages")}")
  }

  test("pdfCensus: xref-stream marker detected outside streams") {
    val modern = ("%PDF-1.6\n1 0 obj\n<< /Type /XRef /W [1 2 2] >>\n" +
      "stream\nBINARYBYTES\nendstream\nendobj\n%%EOF").getBytes("UTF-8")
    val out = PdfStructure.pdfCensus(
      Seq((0L, modern)).toDF("doc_id", "payload")).collect().head
    assert(out.getAs[Boolean]("has_xref_stream"))
    assert(out.getAs[Int]("object_count") == 1)
  }
  test("/Encrypt detection has a name boundary: /EncryptedAttachment " +
      "and prose mentions do not flag the document") {
    val pdf = ("%PDF-1.6\n1 0 obj\n<< /Type /Catalog " +
      "/EncryptedAttachment 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Note (see the /EncryptNothing entry) >>\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val r = PdfStructure.pdfCensus(
      Seq(Tuple1(pdf)).toDF("payload")).collect()(0)
    assert(!r.getAs[Boolean]("is_encrypted"))
    // the real name still flags
    val enc = ("%PDF-1.6\ntrailer\n<< /Encrypt 5 0 R /Root 1 0 R >>\n%%EOF\n")
      .getBytes("ISO-8859-1")
    val r2 = PdfStructure.pdfCensus(
      Seq(Tuple1(enc)).toDF("payload")).collect()(0)
    assert(r2.getAs[Boolean]("is_encrypted"))
  }

}
