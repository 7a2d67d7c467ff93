package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Naive-Bayes text classification as joins + aggregations — the
  * mr_text_classifier workload (SURVEY §2.3;
  * examples/mr_text_classifier.py:140-551) re-expressed relationally.
  * The reference chains four reduces with key-tagged unions
  * ('doc'/'ngram'/'global' markers) to move counts around; here those
  * tag-unions are real joins (exactly as SURVEY predicted: "two joins
  * + aggs"), with `lang` as the label.
  *
  * Train and score over the same corpus (self-classification), Laplace
  * smoothing, per-(term,lang) log-probabilities.
  *
  * Oracle determinism: floating-point SUMs are order-dependent, so
  * each log-prob is quantized once to micro-nats
  * (`round(ln(p)*1e6)::bigint` — ~200 ln calls, not per-row) and doc
  * scores are INTEGER sums — order-independent and bit-identical in
  * DuckDB.
  *
  * Scale: lang-sized relations (totals, priors, unseen, labels) are a
  * handful of rows → broadcast. The (term, lang) probability table is
  * VOCAB-sized — unbounded at corpus scale — so it joins WITHOUT a
  * broadcast hint (shuffle join on (term, label); AQE may still
  * broadcast when it measures small). The big shuffles are the two
  * term-level aggregations and the final per-doc sum, all partial-agg
  * hash aggregates.
  */
object TextClassifier {

  def classify(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")

    // Spread the unsplittable single-file scan before the tokenize —
    // otherwise the explode + scoring joins run single-threaded, and
    // that serial stage was the whole 10x blow-up growth (r6). The
    // term stream stays a view: materializing it costs more at base
    // scale than the re-derivations it saves (measured +0.8 s).
    val terms = d.repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))

    // training counts
    val termLang = terms.groupBy(col("term"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val langTotals = terms.groupBy(col("lang"))
      .agg(count(lit(1)).as("total_terms"))
    val vocab = terms.select(countDistinct(col("term")).as("v"))
    val langDocs = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val nDocs = d.select(count(lit(1)).as("n"))

    // per-(term, lang) quantized log P(term|lang); smoothing handled
    // via the +1 / (total + V) form, with a per-lang "unseen" score
    val mu = 1000000d
    val probs = termLang
      .join(broadcast(langTotals), Seq("lang"))
      .crossJoin(broadcast(vocab))
      .select(col("term"), col("lang"),
        round(log((col("c") + 1).cast("double") /
          (col("total_terms") + col("v")).cast("double")) * mu)
          .cast("long").as("lp"))
    val unseen = langTotals.crossJoin(broadcast(vocab))
      .select(col("lang"),
        round(log(lit(1d) / (col("total_terms") + col("v")).cast("double"))
          * mu).cast("long").as("lp_unseen"))
    val priors = langDocs.crossJoin(broadcast(nDocs))
      .select(col("lang"),
        round(log(col("n_docs").cast("double") / col("n").cast("double"))
          * mu).cast("long").as("lp_prior"))

    // score every doc against every label: token contributions
    // (seen → lp, unseen → lp_unseen), integer-summed per (doc, label)
    val labels = langDocs.select(col("lang").as("label"))
    val scored = terms.select(col("doc_id"),
        col("lang").as("labeled_lang"), col("term"))
      .crossJoin(broadcast(labels))
      .join(probs.withColumnRenamed("lang", "label"),
        Seq("term", "label"), "left")
      .join(broadcast(unseen.withColumnRenamed("lang", "label")),
        Seq("label"))
      .groupBy(col("doc_id"), col("labeled_lang"), col("label"))
      .agg(sum(coalesce(col("lp"), col("lp_unseen"))).as("token_score"))
      .join(broadcast(priors.withColumnRenamed("lang", "label")),
        Seq("label"))
      .select(col("doc_id"), col("labeled_lang"), col("label"),
        (col("token_score") + col("lp_prior")).as("score_micro"))

    // argmax label per doc, deterministic tie-break on label
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("label").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("labeled_lang"),
        col("label").as("predicted_lang"), col("score_micro"))
      .orderBy(col("doc_id"))
  }

  val classifySql: String =
    """WITH terms AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |term_lang AS (
      |  SELECT term, lang, COUNT(*) AS c FROM terms GROUP BY 1, 2),
      |lang_totals AS (
      |  SELECT lang, COUNT(*) AS total_terms FROM terms GROUP BY 1),
      |vocab AS (SELECT COUNT(DISTINCT term) AS v FROM terms),
      |lang_docs AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |n_docs AS (SELECT COUNT(*) AS n FROM documents),
      |probs AS (
      |  SELECT term, term_lang.lang,
      |    CAST(round(ln(CAST(c + 1 AS DOUBLE) /
      |      CAST(total_terms + v AS DOUBLE)) * 1000000) AS BIGINT) AS lp
      |  FROM term_lang JOIN lang_totals ON term_lang.lang = lang_totals.lang
      |  CROSS JOIN vocab),
      |unseen AS (
      |  SELECT lang,
      |    CAST(round(ln(1.0 / CAST(total_terms + v AS DOUBLE)) * 1000000) AS BIGINT) AS lp_unseen
      |  FROM lang_totals CROSS JOIN vocab),
      |priors AS (
      |  SELECT lang,
      |    CAST(round(ln(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS lp_prior
      |  FROM lang_docs CROSS JOIN n_docs),
      |scored AS (
      |  SELECT t.doc_id, t.lang AS labeled_lang, l.lang AS label,
      |    CAST(SUM(COALESCE(p.lp, u.lp_unseen)) AS BIGINT) + ANY_VALUE(pr.lp_prior) AS score_micro
      |  FROM terms t
      |  CROSS JOIN (SELECT lang FROM lang_docs) l
      |  LEFT JOIN probs p ON p.term = t.term AND p.lang = l.lang
      |  JOIN unseen u ON u.lang = l.lang
      |  JOIN priors pr ON pr.lang = l.lang
      |  GROUP BY t.doc_id, t.lang, l.lang),
      |ranked AS (
      |  SELECT doc_id, labeled_lang, label, score_micro,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score_micro DESC, label ASC) AS rk
      |  FROM scored)
      |SELECT doc_id, labeled_lang, label AS predicted_lang, score_micro
      |FROM ranked WHERE rk = 1
      |ORDER BY doc_id""".stripMargin
}
