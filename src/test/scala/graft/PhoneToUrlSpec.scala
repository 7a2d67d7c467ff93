package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PhoneToUrl

/** Unit semantics for the phone_to_url whole-file workload — the parse
  * and standardize pieces the SQL oracle can't see (it re-derives the
  * records relationally; these specs pin that the byte-level WARC
  * round-trip really implements the reference contract,
  * mr_phone_to_url.py:47-125). */
class PhoneToUrlSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("standardizePhone matches the reference normalization") {
    assert(PhoneToUrl.standardizePhone("415-555-0123") == "+14155550123")
    assert(PhoneToUrl.standardizePhone("(415) 555-0123") == "+14155550123")
    // 11 digits (leading country 1) → "+" + digits, not "+1" + digits
    assert(PhoneToUrl.standardizePhone("1415.555.0123") == "+14155550123")
  }

  test("parseWet extracts phones from conversion records only") {
    val wet =
      ("WARC/1.0\nWARC-Type: warcinfo\nContent-Type: application/warc-fields\n\n" +
        "robots: classic\n" +
        "WARC/1.0\nWARC-Type: conversion\n" +
        "WARC-Target-URI: http://a.example.com/p/1\n" +
        "Content-Type: text/plain\n\n" +
        "Call us at (415) 555-0123 today. Or (415) 555-0123 again.\n" +
        "WARC/1.0\nWARC-Type: metadata\n" +
        "WARC-Target-URI: http://noise.example.com/x\n" +
        "Content-Type: text/plain\n\nCall (212) 555-9999 now.\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val recs = PhoneToUrl.parseWet("f.wet", wet).toList
    assert(recs == List(
      ("a.example.com", "+14155550123", "http://a.example.com/p/1"),
      ("a.example.com", "+14155550123", "http://a.example.com/p/1")))
  }

  test("parseWet tolerates malformed records without crashing") {
    val junk = ("not a warc at all\nWARC/1.0\nHeaderWithoutColon\n\n" +
      "(415) 555-0123\nWARC/1.0\nWARC-Type: conversion\n" +
      "Content-Type: text/plain\n\nno target uri here (415) 555-0123\n")
      .getBytes("UTF-8")
    // no conversion record has a complete header set → nothing yielded
    assert(PhoneToUrl.parseWet("junk.wet", junk).isEmpty)
    assert(PhoneToUrl.parseWet("empty.wet", Array.emptyByteArray).isEmpty)
  }

  test("phone_to_url end-to-end returns one best url per phone") {
    val out = PhoneToUrl.phoneToUrl(spark, SparkFixture.Sf0001).collect()
    assert(out.nonEmpty)
    val phones = out.map(_.getString(0))
    assert(phones.distinct.length == phones.length, "one row per phone")
    assert(phones.forall(_.startsWith("+1")))
    assert(out.map(_.getString(1)).forall(_.startsWith("http://")))
  }
}
