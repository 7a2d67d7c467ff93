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
  * broadcast hint (shuffle join on the term key; AQE may still
  * broadcast when it measures small). The big shuffles are the two
  * term-level aggregations and the final per-doc sum, all partial-agg
  * hash aggregates.
  *
  * Two r13 shuffle cuts (r12 verdict #2 — the 10× probe crept to
  * 3.8× vs the pinned 2.9–3.4× band):
  *
  *  1. the term identity on every shuffle/join is `xxhash64(term)` —
  *     an 8-byte long instead of a variable-length string (the
  *     boilerplate_ratio / source_diversity idiom; collision-free at
  *     corpus vocab cardinalities, P ≈ n²/2⁶⁵, so counts and scores
  *     equal the string-keyed DuckDB oracle exactly);
  *  2. the label fan-out moved from TOKEN level to DOC level. The old
  *     plan crossJoined every token occurrence with the label set
  *     (|labels|× the corpus token stream through the probs join);
  *     algebraically Σ_tokens coalesce(lp, lp_unseen) =
  *     n_terms·lp_unseen + Σ_seen (lp − lp_unseen), so the token
  *     stream now joins probs ONCE on the term key (only seen
  *     (token, label) pairs survive, ≤ the old inner-hit volume) and
  *     the |labels|× expansion happens on the doc-level aggregate —
  *     |docs|·|labels| rows instead of |tokens|·|labels|.
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
      .select(col("doc_id"), col("lang"), xxhash64(col("term")).as("tk"))

    // training counts, all keyed by the 8-byte term hash. The TOKEN
    // stream is aggregated exactly once into the (term, lang) count
    // table, which is MATERIALIZED (localCheckpoint — the trained
    // model table a production run writes once): per-lang totals, the
    // vocabulary size, the unseen scores and the delta table all read
    // the vocab-sized rows instead of re-exploding the corpus —
    // without the checkpoint Catalyst planned SIX independent
    // tokenize+shuffle subtrees (column-pruning differences defeat
    // exchange reuse), and the x10 probe leg was five of them
    val termLang = terms.groupBy(col("tk"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val langTotals = termLang.groupBy(col("lang"))
      .agg(sum(col("c")).as("total_terms"))
    val vocab = termLang.agg(countDistinct(col("tk")).as("v"))
    val langDocs = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val nDocs = d.select(count(lit(1)).as("n"))

    // per-(term, lang) quantized log P(term|lang); smoothing handled
    // via the +1 / (total + V) form, with a per-lang "unseen" score
    val mu = 1000000d
    val unseen = langTotals.crossJoin(broadcast(vocab))
      .select(col("lang"),
        round(log(lit(1d) / (col("total_terms") + col("v")).cast("double"))
          * mu).cast("long").as("lp_unseen"))
    // the vocab-sized table carries lp − lp_unseen directly: the score
    // recombination below only ever needs the seen-vs-unseen delta
    val deltas = termLang
      .join(broadcast(langTotals), Seq("lang"))
      .crossJoin(broadcast(vocab))
      .join(broadcast(unseen), Seq("lang"))
      .select(col("tk"), col("lang").as("label"),
        (round(log((col("c") + 1).cast("double") /
          (col("total_terms") + col("v")).cast("double")) * mu)
          .cast("long") - col("lp_unseen")).as("dlp"))
    val priors = langDocs.crossJoin(broadcast(nDocs))
      .select(col("lang"),
        round(log(col("n_docs").cast("double") / col("n").cast("double"))
          * mu).cast("long").as("lp_prior"))

    // seen-token contributions: ONE term-key join of the token stream
    // against the vocab-sized delta table — no label fan-out here.
    // SHUFFLE_HASH pins the vocab side as the build side: the token
    // stream's size estimate is inherited from the parquet scan
    // (explode multiplies rows, not stats), so left unhinted the
    // planner BROADCASTS the exploded corpus — a serial ~250 MB
    // single-task hashed-relation build at the 10× probe and a
    // collect-the-corpus-to-driver at 100 TB
    val seen = terms.select(col("doc_id"), col("tk"))
      .join(deltas.hint("SHUFFLE_HASH"), Seq("tk"))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("dlp")).as("seen_delta"))
    // doc-level recombination: n_terms·lp_unseen + prior + Σ deltas,
    // expanded to every label on |docs|·|labels| rows. n_terms is the
    // split-array SIZE straight off the documents scan — identical to
    // counting the exploded stream, with zero shuffle
    val labelInfo = unseen.select(col("lang").as("label"),
        col("lp_unseen"))
      .join(priors.withColumnRenamed("lang", "label"), Seq("label"))
    // isNotNull keeps the doc universe identical to the old
    // token-stream form and the oracle: a NULL text explodes to zero
    // tokens (the doc vanishes), while size(split(NULL)) is NULL —
    // without the filter a null-text doc would surface with a
    // null/garbage score the oracle never emits
    val scored = d.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        size(split(col("text"), " ")).cast("long").as("n_terms"))
      .crossJoin(broadcast(labelInfo))
      .join(seen, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("labeled_lang"), col("label"),
        (col("n_terms") * col("lp_unseen") + col("lp_prior") +
          coalesce(col("seen_delta"), lit(0L))).as("score_micro"))

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
