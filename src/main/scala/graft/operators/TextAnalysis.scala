package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-analysis operators for a training-data pipeline (BASELINE.json
  * extension surface): language ID, quality scoring, token counting,
  * document fingerprinting. All pure column expressions (codegen'd),
  * all with DuckDB oracles — integer counts and deterministic double
  * ratios only.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Stopword-marker sets per language for the n-gram/marker heuristic
    * language ID. (On this synthetic corpus most docs hit the English
    * set; the operator itself is corpus-agnostic.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "un"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ein", "nicht", "ist"))

  /** Marker-hit count, widened to long (DuckDB len() is BIGINT — keep
    * parquet schemas identical on both sides of the oracle). */
  private def hits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*))).cast("long")

  /** Language ID: count marker-word hits per language, pick the argmax
    * with a fixed priority tie-break (en > es > fr > de), 'und' when
    * nothing hits. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val hitCols = Seq(col("doc_id"), col("lang").as("labeled_lang")) ++
      LangMarkers.map { case (l, ms) => hits(toks, ms).as(s"${l}_hits") }
    val withHits = docs(spark, dir).select(hitCols: _*)
    val best = LangMarkers.map(_._1).map(l => col(s"${l}_hits"))
      .reduce((a, b) => greatest(a, b))
    val predicted = when(best === 0, lit("und"))
      .otherwise(LangMarkers.map(_._1).foldRight(lit("und"): Column) {
        case (l, rest) => when(col(s"${l}_hits") === best, lit(l))
          .otherwise(rest)
      })
    withHits.withColumn("predicted_lang", predicted)
      .orderBy(col("doc_id"))
  }

  val langIdSql: String = {
    val hitExprs = LangMarkers.map { case (l, ms) =>
      val in = ms.map(m => s"'$m'").mkString("(", ", ", ")")
      s"len(list_filter(string_split(text, ' '), t -> t IN $in)) AS ${l}_hits"
    }.mkString(",\n  ")
    val best = "greatest(en_hits, es_hits, fr_hits, de_hits)"
    val cases = LangMarkers.map(_._1)
      .map(l => s"WHEN ${l}_hits = $best THEN '$l'").mkString(" ")
    s"""SELECT doc_id, labeled_lang, en_hits, es_hits, fr_hits, de_hits,
       |  CASE WHEN $best = 0 THEN 'und' $cases ELSE 'und' END AS predicted_lang
       |FROM (
       |  SELECT doc_id, lang AS labeled_lang,
       |  $hitExprs
       |  FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Quality score: length/stopword/type-token ratios combined into a
    * deterministic [0,1] score (integer counts → IEEE-stable ratios,
    * rounded at 6 dp on both sides). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nToks = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    val stopHits = hits(toks, TextQueries.StopWords)
    val tokChars = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val ttr = nDistinct.cast("double") / nToks.cast("double")
    val stopRatio = stopHits.cast("double") / nToks.cast("double")
    val avgLen = tokChars.cast("double") / nToks.cast("double")
    docs(spark, dir).select(
      col("doc_id"),
      nToks.as("n_tokens"),
      nDistinct.as("n_distinct"),
      stopHits.as("stop_hits"),
      round(ttr, 6).as("type_token_ratio"),
      round(stopRatio, 6).as("stop_ratio"),
      round(avgLen, 6).as("avg_token_len"),
      round(ttr * 0.5 + (lit(1d) - stopRatio) * 0.3 +
        least(avgLen / 10d, lit(1d)) * 0.2, 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  val qualityScoreSql: String = {
    val stopIn = TextQueries.StopWords.map(w => s"'$w'")
      .mkString("(", ", ", ")")
    s"""SELECT doc_id, n_tokens, n_distinct, stop_hits,
       |  ROUND(ttr, 6) AS type_token_ratio,
       |  ROUND(stop_ratio, 6) AS stop_ratio,
       |  ROUND(avg_len, 6) AS avg_token_len,
       |  ROUND(ttr * 0.5 + (1 - stop_ratio) * 0.3 +
       |        least(avg_len / 10, 1) * 0.2, 6) AS quality
       |FROM (
       |  SELECT doc_id,
       |    len(ts) AS n_tokens,
       |    len(list_distinct(ts)) AS n_distinct,
       |    len(list_filter(ts, t -> t IN $stopIn)) AS stop_hits,
       |    CAST(len(list_distinct(ts)) AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS ttr,
       |    CAST(len(list_filter(ts, t -> t IN $stopIn)) AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS stop_ratio,
       |    CAST(list_sum(list_transform(ts, t -> length(t))) AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS avg_len
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) x) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens vs a BPE-ish regex tokenizer
    * (letter runs | digit runs | single non-alnum), plus a chars/token
    * compression proxy. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val pattern = "[a-z']+|[0-9]+|[^a-z0-9 ]"
    val ws = size(split(col("text"), " ")).cast("long")
    val bpe = size(regexp_extract_all(col("text"), lit(pattern), lit(0)))
      .cast("long")
    docs(spark, dir).select(
      col("doc_id"),
      ws.as("ws_tokens"),
      bpe.as("re_tokens"),
      round(length(col("text")).cast("double") / bpe.cast("double"), 6)
        .as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z'']+|[0-9]+|[^a-z0-9 ]')) AS re_tokens,
      |  ROUND(CAST(length(text) AS DOUBLE) /
      |        CAST(len(regexp_extract_all(text, '[a-z'']+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE), 6) AS chars_per_token
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Document fingerprint: rolling polynomial hash over the token
    * stream (mod 1000003 to stay in exact integer range in both
    * engines) — order-sensitive, unlike the token-set fingerprint. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val tokVals = transform(split(col("text"), " "),
      t => (length(t) * 131 + ascii(t)).cast("long") % 1000003L)
    val fp = aggregate(tokVals, lit(7L),
      (h, t) => (h * 8191L + t) % 1000003L)
    docs(spark, dir).select(col("doc_id"), fp.as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  val docFingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(7 AS BIGINT),
      |      list_transform(string_split(text, ' '),
      |        t -> CAST(length(t) * 131 + ascii(t) AS BIGINT) % 1000003)),
      |    (h, t) -> (h * 8191 + t) % 1000003) AS fingerprint
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
