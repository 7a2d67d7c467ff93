package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** PII detection + redaction over the document corpus — the scrub
  * pass every training-data pipeline runs before anything else
  * touches the text (emails, phone numbers, IP addresses, national-ID
  * shapes; the taxonomy and regex-sweep approach follow the public
  * data-cleaning literature, e.g. Subramani et al. 2023 "Detecting
  * Personal Information in Training Corpora" and the BigScience ROOTS
  * PII pipeline, arXiv:2303.03915).
  *
  * The synthetic corpus carries no PII, so the fixture MINTS a
  * deterministic contact block per selected doc — selector and
  * payload are pure functions of `doc_id` (md5 hex digit → class,
  * arithmetic → digits), expressed identically in the Spark plan and
  * the DuckDB oracle, so the whole path (mint → match → count →
  * redact → digest) is hash-checked end to end. Hosts are minted
  * under the RFC 2606 `example.com` reserved domain and phone numbers
  * in the NANP fictional 555-01xx range — nothing real is ever
  * emitted.
  *
  * Regex portability (Java regex in Spark, RE2 in DuckDB): patterns
  * use only character classes, bounded repetition, alternation-free
  * bodies and ASCII `\b` boundaries — constructs with identical
  * semantics in both engines (no backreferences, no lookaround, which
  * RE2 lacks). Counting is leftmost non-overlapping in both.
  *
  * 100 TB posture: both rows are ONE corpus scan with per-row
  * codegen'd regexp expressions (RegExpCount / RegExpReplace compile
  * once per task via Spark's pattern cache) followed by either a
  * 20-group aggregate (detect) or a narrow per-doc projection
  * (redact) — no joins, no wide shuffle; the scan parallelizes by
  * file split and the agg is partial+final. A real deployment swaps
  * the minted column for the raw text column and keeps the plan. */
object PiiOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Email, NANP phone, IPv4, and SSN-shaped patterns — Java/RE2
    * common subset (see scaladoc). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** md5-hex-digit class selector (doc_id is striped by source in the
    * fixture, so any `doc_id % k` selector collapses per-source; the
    * md5 digit decorrelates — the ArtifactStore/LSH md5-derivation
    * trick). Classes overlap on '3' so some docs carry BOTH an email
    * and a phone. */
  private def hx: Column =
    substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)

  private def minted: Column = {
    val id = col("doc_id")
    val s = id.cast("string")
    concat(
      col("text"),
      when(hx.isin("0", "1", "2", "3"),
        concat(lit(" contact user"), s, lit("@mail"),
          (id % 7).cast("string"), lit(".example.com"))).otherwise(""),
      when(hx.isin("3", "4", "5"),
        concat(lit(" call 202-555-01"),
          lpad((id % 100).cast("string"), 2, "0"))).otherwise(""),
      when(hx.isin("6", "7", "8"),
        concat(lit(" host 10."), (id % 256).cast("string"), lit("."),
          ((id * 7) % 256).cast("string"), lit("."),
          (id % 250 + 1).cast("string"))).otherwise(""),
      when(hx.isin("9", "a"),
        concat(lit(" id 000-12-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise(""))
  }

  /** The same mint as a DuckDB SQL fragment (shared by both oracle
    * queries so the two sides can never drift apart). Assembled by
    * plain concatenation — NEVER stripMargin over SQL whose lines
    * begin with the `||` concat operator (the r7 first-pipe trap). */
  private val mintedSql: String = {
    val hx = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
    "text" +
      s" || CASE WHEN $hx IN ('0','1','2','3')" +
      " THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'" +
      " || CAST(doc_id % 7 AS VARCHAR) || '.example.com'" +
      " ELSE '' END" +
      s" || CASE WHEN $hx IN ('3','4','5')" +
      " THEN ' call 202-555-01'" +
      " || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')" +
      " ELSE '' END" +
      s" || CASE WHEN $hx IN ('6','7','8')" +
      " THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.'" +
      " || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'" +
      " || CAST(doc_id % 250 + 1 AS VARCHAR)" +
      " ELSE '' END" +
      s" || CASE WHEN $hx IN ('9','a')" +
      " THEN ' id 000-12-'" +
      " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')" +
      " ELSE '' END"
  }

  /** Per-source PII census: doc counts, docs carrying any PII, and
    * per-class match totals — the triage report that decides whether
    * a source needs redaction before training. One scan, one small
    * agg. */
  def piiDetect(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("source"),
      minted.as("text2"))
    val counted = d.select(col("source"),
      regexp_count(col("text2"), lit(EmailRe)).as("e"),
      regexp_count(col("text2"), lit(PhoneRe)).as("p"),
      regexp_count(col("text2"), lit(Ipv4Re)).as("i"),
      regexp_count(col("text2"), lit(SsnRe)).as("s"))
    counted.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("e") + col("p") + col("i") + col("s") > 0, 1L)
          .otherwise(0L)).as("docs_with_pii"),
        sum(col("e").cast("long")).as("emails"),
        sum(col("p").cast("long")).as("phones"),
        sum(col("i").cast("long")).as("ips"),
        sum(col("s").cast("long")).as("ssns"))
      .orderBy(col("source"))
  }

  lazy val piiDetectSql: String =
    s"""WITH minted AS (
       |  SELECT doc_id, source, $mintedSql AS text2 FROM documents),
       |counted AS (
       |  SELECT source,
       |    len(regexp_extract_all(text2, '$EmailRe')) AS e,
       |    len(regexp_extract_all(text2, '$PhoneRe')) AS p,
       |    len(regexp_extract_all(text2, '$Ipv4Re')) AS i,
       |    len(regexp_extract_all(text2, '$SsnRe')) AS s
       |  FROM minted)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN e + p + i + s > 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS docs_with_pii,
       |  CAST(SUM(e) AS BIGINT) AS emails,
       |  CAST(SUM(p) AS BIGINT) AS phones,
       |  CAST(SUM(i) AS BIGINT) AS ips,
       |  CAST(SUM(s) AS BIGINT) AS ssns
       |FROM counted GROUP BY source ORDER BY source""".stripMargin

  /** Redaction classes, applied in a fixed documented order (the
    * patterns are mutually non-overlapping — 3-3-4 phones and 3-2-4
    * SSNs cannot match the same span — so order only matters for
    * determinism of the output text, not correctness). */
  val RedactionOrder: Seq[(String, String)] = Seq(
    EmailRe -> "<EMAIL>", Ipv4Re -> "<IP>",
    SsnRe -> "<ID>", PhoneRe -> "<PHONE>")

  /** Apply every redaction to one column. */
  def redact(c: Column): Column =
    RedactionOrder.foldLeft(c) { case (acc, (re, tag)) =>
      regexp_replace(acc, re, tag)
    }

  /** The scrub projection — (doc_id, n_pii, redacted_md5) over a
    * (doc_id, text) frame — shared VERBATIM by the batch row and the
    * ingest stream ([[graft.streaming.IngestStreaming.piiScrubStream]])
    * so stream ≡ batch is an identity of code. Pure per-row
    * projection: no sort, no shuffle, no state. */
  def scrubFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (regexp_count(col("text"), lit(EmailRe)) +
        regexp_count(col("text"), lit(PhoneRe)) +
        regexp_count(col("text"), lit(Ipv4Re)) +
        regexp_count(col("text"), lit(SsnRe))).cast("long").as("n_pii"),
      md5(redact(col("text")).cast("binary")).as("redacted_md5"))

  /** Per-doc redaction: total matches removed plus an md5 digest of
    * the redacted text — the digest proves byte-identical redaction
    * against the oracle without hauling the text through the compare.
    * Narrow projection, no shuffle (orderBy only for the gate). */
  /** The minted-text projection (doc_id, text) over any (doc_id,
    * text, …) frame — shared VERBATIM by [[piiRedact]] and the ingest
    * door so the PII mint has one Spark spelling. */
  private[graft] def mintedDocs(d: DataFrame): DataFrame =
    d.select(col("doc_id"), minted.as("text"))

  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    scrubFrame(mintedDocs(docs(spark, dir)))
      .orderBy(col("doc_id"))

  lazy val piiRedactSql: String = {
    val redacted = RedactionOrder.foldLeft("text2") {
      case (acc, (re, tag)) => s"regexp_replace($acc, '$re', '$tag', 'g')"
    }
    s"""WITH minted AS (
       |  SELECT doc_id, $mintedSql AS text2 FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text2, '$EmailRe'))
       |    + len(regexp_extract_all(text2, '$PhoneRe'))
       |    + len(regexp_extract_all(text2, '$Ipv4Re'))
       |    + len(regexp_extract_all(text2, '$SsnRe')) AS BIGINT) AS n_pii,
       |  md5($redacted) AS redacted_md5
       |FROM minted ORDER BY doc_id""".stripMargin
  }
}
