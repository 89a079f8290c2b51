package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SubtitlesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parseCues: VTT and SRT renderings of the same cues parse identically") {
    val df = Seq((0L, true), (1L, false)).toDF("doc_id", "vtt")
      .select(col("doc_id"),
        Subtitles.syntheticSubtitle(lit(3), lit(7), col("vtt")).as("subtitle"))
    val out = Subtitles.parseCues(df).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    def cues(d: Long) = out(d).sortBy(_.getAs[Int]("cue_idx"))
      .map(r => (r.getAs[Int]("cue_idx"), r.getAs[Long]("cue_start_ms"),
        r.getAs[Long]("cue_end_ms"), r.getAs[String]("cue_text"))).toSeq
    assert(cues(0L) == cues(1L)) // format equivalence
    assert(cues(0L).length == 3)
    assert(cues(0L)(1) == (1, 2500L, 4500L, "spoken line 1 of clip 7\nsecond line 1"))
    assert(out.values.flatten.forall(_.getAs[String]("parse_error") == null))
  }

  test("parseTimestamp: hour-optional VTT form, SRT commas, rejects garbage") {
    assert(Subtitles.parseTimestamp("01:02:03.456") == 3723456L)
    assert(Subtitles.parseTimestamp("02:03,456") == 123456L) // MM:SS,mmm
    assert(Subtitles.parseTimestamp("00:00:05") == 5000L) // no millis
    assert(Subtitles.parseTimestamp("99:00:00.000") == 356400000L) // big hours ok
    assert(Subtitles.parseTimestamp("00:77:00.000") == -1L) // minutes > 59
    assert(Subtitles.parseTimestamp("nonsense") == -1L)
  }

  test("parseCues: real-world VTT shapes — BOM, header metadata lines, " +
      "tab cue settings, whitespace-only payload lines, NOTE-prefixed ids") {
    val vtt = "﻿WEBVTT\nKind: captions\nLanguage: en\n\n" +
      "NOTES ON SCENE 3\n00:00:00.000 --> 00:00:02.000\tposition:10%\n" +
      "line one\n \nline two\n\n" +
      "00:00:03.000 --> 00:00:04.000\nsecond cue\n"
    val out = Subtitles.parseCues(Seq((0L, vtt)).toDF("doc_id", "subtitle"))
      .orderBy("cue_idx").collect()
    assert(out.length == 2, out.mkString("\n"))
    assert(out(0).getAs[String]("parse_error") == null)
    // the NOTE-prefixed line is a cue IDENTIFIER (no trailing space
    // boundary), not a comment block — the cue survives
    assert(out(0).getAs[Long]("cue_start_ms") == 0L)
    assert(out(0).getAs[Long]("cue_end_ms") == 2000L) // tab settings cut
    // the whitespace-only line belongs to the payload (spec: cues end at
    // EMPTY lines), so line two is not orphaned
    assert(out(0).getAs[String]("cue_text") == "line one\n \nline two")
    assert(out(1).getAs[String]("cue_text") == "second cue")
  }

  test("parseTimestamp: adversarial fields degrade to -1, never throw") {
    assert(Subtitles.parseTimestamp("00:00:.") == -1L) // dots-only seconds
    assert(Subtitles.parseTimestamp("01:-5:00.000") == -1L) // negative minutes
    assert(Subtitles.parseTimestamp("00:-5.000") == -1L) // negative seconds
    assert(Subtitles.parseTimestamp(":::") == -1L)
    assert(Subtitles.parseTimestamp("") == -1L)
  }

  test("parseCues: degradation — malformed cue ends walk with tail row, " +
      "garbage and null degrade per document") {
    val broken = "WEBVTT\n\n00:00:00.000 --> 00:00:02.000\nfirst cue ok\n\n" +
      "00:00:05.000 --> not a timestamp\nlost cue\n"
    val df = Seq((0L, broken), (1L, "no cues at all, just prose"),
      (2L, null: String)).toDF("doc_id", "subtitle")
    val out = Subtitles.parseCues(df).collect().groupBy(_.getAs[Long]("doc_id"))
    val d0 = out(0L).sortBy(_.getAs[Int]("cue_idx"))
    assert(d0.head.getAs[String]("cue_text") == "first cue ok")
    assert(d0.last.getAs[String]("parse_error") == "malformed cue timestamps")
    assert(out(1L).head.getAs[String]("parse_error") == "no cue timing line found")
    assert(out(2L).head.getAs[String]("parse_error") == "null subtitle")
  }
  test("whitespace-only SEPARATOR between SRT cues: the arrow stop keeps " +
      "cue 2 alive and un-appends its counter from cue 1's text") {
    val srt = "1\n00:00:00,000 --> 00:00:02,000\nhello\n \n" +
      "2\n00:00:02,500 --> 00:00:04,500\nworld\n"
    val out = Subtitles.parseCues(Seq((0L, srt)).toDF("doc_id", "subtitle"))
      .orderBy("cue_idx").collect()
    val cues = out.filter(_.getAs[String]("parse_error") == null)
    assert(cues.length == 2, out.mkString("\n"))
    assert(cues(0).getAs[String]("cue_text") == "hello\n ")
    assert(cues(1).getAs[String]("cue_text") == "world")
    assert(cues(1).getAs[Long]("cue_start_ms") == 2500L)
  }

  test("a junk block mid-document is SKIPPED (stated in the tail row), " +
      "not fatal to every cue after it") {
    val vtt = "WEBVTT\n\nNOTE first\n \nstill note\n\n" +
      "00:00:00.000 --> 00:00:02.000\nhi\n"
    val out = Subtitles.parseCues(Seq((0L, vtt)).toDF("doc_id", "subtitle"))
      .orderBy("cue_idx").collect()
    // the NOTE block's whitespace line orphans 'still note' into a junk
    // block; the walk skips it and the REAL cue survives
    val cues = out.filter(_.getAs[String]("parse_error") == null)
    assert(cues.length == 1, out.mkString("\n"))
    assert(cues(0).getAs[String]("cue_text") == "hi")
    assert(out.exists(r => r.getAs[String]("parse_error") != null &&
      r.getAs[String]("parse_error").contains("skipped")))
  }


  test("cue TEXT containing '-->' mid-document: the junk block is " +
      "skipped (stated in the tail row), cues after it survive") {
    // 'go --> left' ends cue 1's payload (W3C: cue text cannot contain
    // the arrow) and then fails to parse as a timing line — the walk
    // must skip THAT block and keep parsing, not drop every later cue
    val srt = "1\n00:00:00,000 --> 00:00:02,000\nhello\ngo --> left\n\n" +
      "2\n00:00:03,000 --> 00:00:04,000\nworld\n"
    val out = Subtitles.parseCues(Seq((0L, srt)).toDF("doc_id", "subtitle"))
      .orderBy("cue_idx").collect()
    val cues = out.filter(_.getAs[String]("parse_error") == null)
    assert(cues.map(_.getAs[String]("cue_text")).toSeq == Seq("hello", "world"))
    assert(cues(1).getAs[Long]("cue_start_ms") == 3000L)
    assert(out.last.getAs[String]("parse_error") == "malformed cue timestamps")
  }
}
