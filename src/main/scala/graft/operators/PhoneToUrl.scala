package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.{Tables, WholeFileSource}

/** The mr_phone_to_url workload end-to-end (SURVEY §2.3;
  * examples/mr_phone_to_url.py:71-125): parse WARC-style WET archives
  * whole-file (mapper_raw), extract (host, phone, url) with the
  * reference's phone regex + standardization
  * (mr_phone_to_url.py:47-68), drop directory-like hosts over a phone
  * cap (count_by_host_reducer, :107-116), then per phone pick the URL
  * from the host with the fewest phones, tie-broken by longest URL
  * then lexicographic (pick_best_url_reducer, :118-125 — the CODE
  * sorts by -len(url), i.e. longest wins, though its docstring says
  * "shortest"; we follow the code).
  *
  * Fixture: WET files are DERIVED DETERMINISTICALLY from the
  * `documents` table (host/url/phone/occurrence-count are pure
  * functions of doc_id and source) and written once per sf dir via a
  * Spark text write — so the file-parse half exercises the real
  * binaryFile → flatMap machinery while the END result stays fully
  * SQL-oracle-able from `documents` alone.
  *
  * Scale: parsing is one row per (archive file, record, phone hit) —
  * embarrassingly parallel; the cap and argmin are one groupBy and one
  * window over `phone`, and the host-count join is unhinted (hosts are
  * unbounded at 100 TB; AQE broadcasts only if small).
  */
object PhoneToUrl {

  /** Scaled-down analog of MAX_PHONES_PER_HOST = 1000
    * (mr_phone_to_url.py:52): hosts with more phone occurrences than
    * this are assumed to be directories and dropped. */
  val MaxPhonesPerHost = 40

  private val Files = 8

  /** The reference's PHONE_RE (mr_phone_to_url.py:47-48), with a
    * lookahead trailing boundary so consecutive matches don't eat each
    * other's separator. */
  private val PhoneRe =
    """(?:\A|\D)(1?[2-9]\d{2}[-. ()+]+\d{3}[-. ()+]+\d{4})(?=\D|\z)""".r

  /** standardize_phone_number (mr_phone_to_url.py:55-68). */
  def standardizePhone(raw: String): String = {
    var n = raw.filterNot("-. ()+".contains(_))
    if (n.length > 7) {
      if (!n.last.isDigit) n = n.init
      if (!n.head.isDigit) n = n.tail
    }
    if (n.length <= 10) "+1" + n else "+" + n
  }

  /** Parse one WET archive: conversion/text-plain records only, yield
    * (host, standardized phone, url) per phone occurrence — the
    * extract_phone_and_url_mapper contract
    * (mr_phone_to_url.py:82-105). */
  def parseWet(path: String, bytes: Array[Byte]): Iterator[(String, String, String)] = {
    val content = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    content.split("WARC/1\\.0\n").iterator.filter(_.trim.nonEmpty).flatMap { seg =>
      val (headerPart, payload) = seg.indexOf("\n\n") match {
        case -1 => (seg, "")
        case i => (seg.substring(0, i), seg.substring(i + 2))
      }
      val headers = headerPart.linesIterator.flatMap { l =>
        l.split(": ", 2) match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }
      }.toMap
      if (headers.get("WARC-Type").contains("conversion") &&
          headers.get("Content-Type").contains("text/plain") &&
          headers.contains("WARC-Target-URI")) {
        val url = headers("WARC-Target-URI")
        val host = new java.net.URI(url).getHost
        PhoneRe.findAllMatchIn(payload)
          .map(m => (host, standardizePhone(m.group(1)), url))
      } else Iterator.empty
    }
  }

  /** Deterministic WET fixture derived from `documents`: every doc
    * becomes one conversion record whose host, url, phone and phone
    * occurrence count are pure functions of (doc_id, source); docs on
    * the shared "directory" host carry 5 occurrences so the host cap
    * actually fires at the sf0.01 gate. Docs with doc_id % 17 == 3
    * also emit a metadata record with a decoy phone — the record-type
    * filter must drop it. Written once per sf dir (marker-checked). */
  def ensureWetFixture(spark: SparkSession, dir: String): String = {
    // version-tag the scratch dir: a format change in a later build
    // must never reuse a stale cached fixture. GraftFs-resolved so the
    // fixture lands on a cluster-shared scheme when
    // spark.graft.scratch.dir is set (local tmp is local-mode-only).
    val out = graft.sources.GraftFs.scratchDir(spark,
      "graft_wet_v1_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))
    val fs = graft.sources.GraftFs(spark)
    if (!fs.exists(s"$out/_SUCCESS")) {
      val d = Tables.load(spark, dir, "documents")
      val h = col("doc_id") % 50
      val host = when(h === 7, lit("directory.example.com"))
        .otherwise(concat(col("source"), lit("-"), h.cast("string"),
          lit(".example.com")))
      val url = concat(lit("http://"), host, lit("/page/"),
        col("doc_id").cast("string"))
      val k = col("doc_id") % 200
      val area = (lit(200) + (k * 7) % 700).cast("string")
      val mid = (lit(100) + (k * 13) % 900).cast("string")
      val last = (lit(1000) + (k * 31) % 9000).cast("string")
      val nOcc = when(h === 7, lit(5)).otherwise(lit(1) + col("doc_id") % 3)
      val phoneText = concat(lit("Call us at ("), area, lit(") "), mid,
        lit("-"), last, lit(" today. "))
      val decoy = lit("WARC/1.0\nWARC-Type: metadata\nWARC-Target-URI: " +
        "http://noise.example.com/x\nContent-Type: text/plain\n\n" +
        "Call (415) 555-0123 now.\n")
      d.select(col("doc_id"), phoneText.as("phone_text"), nOcc.as("n_occ"),
          url.as("url"))
        .select(concat(
          lit("WARC/1.0\nWARC-Type: conversion\nWARC-Target-URI: "),
          col("url"), lit("\nContent-Type: text/plain\n\n"),
          expr("repeat(phone_text, n_occ)"), lit("\n"),
          when(col("doc_id") % 17 === 3, decoy).otherwise(lit("")))
          .as("value"))
        .repartition(Files)
        .write.mode("overwrite").text(out)
    }
    out
  }

  /** phone_to_url end-to-end: mapper_raw parse → host cap → per-phone
    * argmin. */
  def phoneToUrl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wetDir = ensureWetFixture(spark, dir)
    val parsed = WholeFileSource
      .mapRaw(spark, s"$wetDir/part-*", parseWet _)
      .toDF("host", "phone", "url")
    // host cap via a window count, NOT a groupBy + self-join: the
    // self-join's two branches each re-run the whole-file WET parse
    // (binary read + regex scan of every record) — the dominant cost
    // at scale — while the window counts on ONE pass of it
    val kept = parsed
      .withColumn("host_phone_count",
        count(lit(1)).over(Window.partitionBy(col("host"))))
      .filter(col("host_phone_count") <= MaxPhonesPerHost)
    val w = Window.partitionBy(col("phone"))
      .orderBy(col("host_phone_count").asc, length(col("url")).desc,
        col("url").asc)
    kept.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("phone"), col("url"))
      .orderBy(col("phone"))
  }

  /** The same derivation straight from `documents` in SQL — possible
    * because the fixture is a pure function of the table; the Spark
    * side must round-trip through actual WARC bytes to match this. */
  val phoneToUrlSql: String =
    s"""WITH base AS (
       |  SELECT doc_id, source,
       |    doc_id % 50 AS h, doc_id % 200 AS k
       |  FROM documents),
       |recs AS (
       |  SELECT doc_id,
       |    CASE WHEN h = 7 THEN 'directory.example.com'
       |         ELSE source || '-' || CAST(h AS VARCHAR) || '.example.com'
       |    END AS host,
       |    CASE WHEN h = 7 THEN 5 ELSE 1 + doc_id % 3 END AS n_occ,
       |    '+1' || CAST(200 + (k*7) % 700 AS VARCHAR)
       |         || CAST(100 + (k*13) % 900 AS VARCHAR)
       |         || CAST(1000 + (k*31) % 9000 AS VARCHAR) AS phone
       |  FROM base),
       |recs2 AS (
       |  SELECT *,
       |    'http://' || host || '/page/' || CAST(doc_id AS VARCHAR) AS url
       |  FROM recs),
       |hostc AS (
       |  SELECT host, CAST(SUM(n_occ) AS BIGINT) AS host_phone_count
       |  FROM recs2 GROUP BY host),
       |kept AS (
       |  SELECT r.phone, r.url, c.host_phone_count
       |  FROM recs2 r JOIN hostc c USING (host)
       |  WHERE c.host_phone_count <= $MaxPhonesPerHost),
       |best AS (
       |  SELECT phone, url,
       |    ROW_NUMBER() OVER (PARTITION BY phone
       |      ORDER BY host_phone_count ASC, length(url) DESC, url ASC) AS rk
       |  FROM kept)
       |SELECT phone, url FROM best WHERE rk = 1
       |ORDER BY phone""".stripMargin
}
