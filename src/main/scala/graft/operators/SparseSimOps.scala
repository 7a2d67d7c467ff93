package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sparse (tf-idf) document similarity via an inverted-index join —
  * the term-at-a-time counterpart to the dense-embedding paths in
  * [[SimilarityOps]]. Retrieval systems run exactly this shape when
  * no embedding exists: postings are joined term-by-term, partial
  * products aggregate into pair dot products, and each doc keeps its
  * top-k neighbors.
  *
  * Scale design:
  *  - the candidate cost of a raw posting self-join is Σ_term df²,
  *    which a corpus-wide term turns into N² (every doc shares
  *    "the"). The classic IR fix is CHAMPION LISTS (top-R docs per
  *    term by weight): candidates become Σ min(df, R)² ≤ R · corpus
  *    tokens — LINEAR in corpus size with constant R, at every df
  *    distribution. An absolute df stop-list cap would also be
  *    linear but returns an empty result the moment the vocabulary
  *    is small relative to the corpus (every term everywhere), and a
  *    relative (5 %-of-N) cap is N²-shaped — champion lists are the
  *    variant that survives both regimes, which is why they are the
  *    production structure;
  *  - the champion row_number gets map-side pruning from
  *    InferWindowGroupLimit (the q5_window machinery), so the full
  *    posting list never shuffles — only each term's top R;
  *  - one shuffle on term for the capped self-join, one on (i, j)
  *    for the dot aggregation, then a second WindowGroupLimit prunes
  *    the per-doc top-k;
  *  - all similarity math is integer: idf quantized once per (n, df)
  *    domain to milli-nats (the tf_idf trick), cos² as integer ppm
  *    through DECIMAL/HUGEINT 128-bit intermediates — bit-identical
  *    in DuckDB, so the row is fully oracled.
  *
  * The contract is champion-list cosine: similarity measured in the
  * champion posting space (norms included). Deterministic — ties in
  * the champion ranking break by doc_id, in the neighbor ranking by
  * neighbor id.
  */
object SparseSimOps {

  /** Terms in fewer than MinDf docs can't pair anything. */
  val MinDf = 2

  /** Champion-list size: top-R postings kept per term. */
  val ChampR = 10

  /** Neighbors reported per document. */
  val TopK = 5

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Per-doc top-[[TopK]] champion-list-cosine neighbors:
    * (i, j, rank, cos2_ppm) with cos²·10⁶ under tf·idf_milli weights
    * over the champion posting space. */
  def docSimSparse(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val n = d.select(count(lit(1)).as("n"))
    // NOT spread (r14, measured): the tokenize→tf chain is ~200 ms of
    // serial CPU at sf0.1 — a Tables.spread here cost more in exchange
    // + AQE stage overhead than it saved (2.31 s → 2.60 s A/B)
    val terms = d.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
      // consecutive spaces yield "" tokens — without this filter the
      // empty string becomes a real indexable term that manufactures
      // similarity between docs sharing zero vocabulary (the same
      // guard wordEdges and heavyHitters apply)
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= MinDf)
    // integer milli-nat idf — quantized once per (n, df), never per
    // row (oracle determinism); then champion-list cap per term
    val weighted = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("w", col("tf") *
        round(log(col("n").cast("double") / col("df").cast("double"))
          * 1000d).cast("long"))
    val postings = weighted
      // w = 0 ⟺ df == n (idf 0): such postings add nothing to any dot
      // product but would poison norms (a doc of only corpus-wide
      // terms gets n2 = 0 → 0 DIV 0 → NULL cos²) — drop them before
      // championing
      .filter(col("w") > 0)
      .withColumn("cr", row_number().over(Window.partitionBy(col("term"))
        .orderBy(col("w").desc, col("doc_id"))))
      .filter(col("cr") <= ChampR)
      .select(col("term"), col("doc_id"), col("w"))
    // widen BEFORE squaring/summing (the eventsAnomaly sx2 pattern):
    // w·w summed in LONG wraps silently at extreme tf·idf weights
    // while the DuckDB oracle sums into HUGEINT (errors, not wraps) —
    // DECIMAL(38,0) products agree with the oracle everywhere
    val norms = postings.groupBy(col("doc_id"))
      .agg(sum(col("w").cast("decimal(38,0)") * col("w")).as("n2"))
    // term-at-a-time pair stream: Σ min(df, R)² rows
    val dots = postings.as("x").join(postings.as("y"), Seq("term"))
      .filter(col("x.doc_id") =!= col("y.doc_id"))
      .groupBy(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .agg(sum(col("x.w").cast("decimal(38,0)") * col("y.w")).as("dot"))
    val scored = dots
      .join(norms.select(col("doc_id").as("i"), col("n2").as("n2i")), Seq("i"))
      .join(norms.select(col("doc_id").as("j"), col("n2").as("n2j")), Seq("j"))
      // cos²·10⁶ with integral DIV; dot² needs 128-bit headroom →
      // DECIMAL(38,0) intermediates on both engines
      .withColumn("cos2_ppm", expr(
        "CAST(CAST(dot AS DECIMAL(38,0)) * dot * 1000000 " +
          "DIV (CAST(n2i AS DECIMAL(38,0)) * n2j) AS BIGINT)"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("i"))
        .orderBy(col("cos2_ppm").desc, col("j"))))
      .filter(col("rank") <= TopK)
      .select(col("i"), col("j"), col("rank").cast("long").as("rank"),
        col("cos2_ppm"))
      .orderBy(col("i"), col("rank"))
  }

  val docSimSparseSql: String =
    s"""WITH terms AS (
       |  SELECT doc_id, term FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |    FROM documents) t
       |  WHERE len(term) > 0),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
       |df AS (
       |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1
       |  HAVING COUNT(DISTINCT doc_id) >= $MinDf),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |weighted AS (
       |  SELECT tf.term, tf.doc_id,
       |    tf.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE))
       |      * 1000) AS BIGINT) AS w
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |postings AS (
       |  SELECT term, doc_id, w FROM (
       |    SELECT term, doc_id, w, row_number() OVER (PARTITION BY term
       |      ORDER BY w DESC, doc_id) AS cr
       |    FROM weighted WHERE w > 0) c
       |  WHERE cr <= $ChampR),
       |norms AS (
       |  SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2
       |  FROM postings GROUP BY 1),
       |dots AS (
       |  SELECT x.doc_id AS i, y.doc_id AS j, CAST(SUM(x.w * y.w) AS BIGINT) AS dot
       |  FROM postings x JOIN postings y USING (term)
       |  WHERE x.doc_id <> y.doc_id GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.i, d.j,
       |    CAST((CAST(d.dot AS HUGEINT) * d.dot * 1000000)
       |      // (CAST(ni.n2 AS HUGEINT) * nj.n2) AS BIGINT) AS cos2_ppm
       |  FROM dots d
       |  JOIN norms ni ON ni.doc_id = d.i
       |  JOIN norms nj ON nj.doc_id = d.j),
       |ranked AS (
       |  SELECT i, j, CAST(row_number() OVER (PARTITION BY i
       |    ORDER BY cos2_ppm DESC, j) AS BIGINT) AS rank, cos2_ppm
       |  FROM scored)
       |SELECT i, j, rank, cos2_ppm FROM ranked
       |WHERE rank <= $TopK
       |ORDER BY i, rank""".stripMargin

  // ---------------- BM25 ranked retrieval ----------------

  /** Query terms for the registered bm25_topk row — a fixed small
    * keyword set (the keyword_tag pattern): in production the terms
    * arrive as a broadcast-sized query relation. */
  val Bm25Terms: Seq[String] =
    Seq("customer", "spark", "table", "vector", "window")

  /** Documents reported per query term. */
  val Bm25K = 10

  /** BM25 ranked retrieval: top-[[Bm25K]] documents per query term
    * under Okapi BM25 (Robertson et al., TREC-3) with k1 = 1.2,
    * b = 0.75, idf = ln((N − df + ½)/(df + ½) + 1).
    *
    * All scoring is integer-exact cross-engine: idf is quantized ONCE
    * per term to micro-nats (the tf_idf trick — transcendentals never
    * touch per-row math), and the tf normalization is RATIONAL, so
    * k1 = 6/5 and b = 3/4 clear through the common denominator
    * 20·Σdl to
    *   bm25_micro = idf_micro·44·tf·Σdl
    *                  DIV (20·tf·Σdl + 6·Σdl + 18·dl·N)
    * — integral products on both engines (DECIMAL(38,0) / HUGEINT
    * widening, the docSimSparse posture: Σdl is corpus-scale, so LONG
    * products would wrap at 100 TB).
    *
    * Scale shape: the term filter lands BEFORE the tf/df aggregations
    * (only query-term postings ever shuffle — |terms|·docs-matching
    * rows, not the corpus vocabulary); N/Σdl is a single-row broadcast
    * scalar; the per-term top-k rides InferWindowGroupLimit so only
    * each partition's top [[Bm25K]] reach the rank shuffle. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val d0 = docs(spark, dir)
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => length(t) > 0).as("ts"))
    val dl = d0.select(col("doc_id"), size(col("ts")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val terms = d0.select(col("doc_id"), explode(col("ts")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf already holds one row per (doc_id, term) with tf > 0, so df
    // is a plain count over it — not a second corpus-wide
    // explode + distinct pass over `terms`
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val idf = df.crossJoin(broadcast(stats))
      .select(col("term"), round(log(
        (col("n").cast("double") - col("df").cast("double") + lit(0.5d)) /
          (col("df").cast("double") + lit(0.5d)) + lit(1.0d)) * 1000000d)
        .cast("long").as("idf_micro"))
    val scored = tf
      .join(idf, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("bm25_micro", expr(
        "CAST(CAST(idf_micro AS DECIMAL(38,0)) * 44 * tf * sumdl " +
          "DIV (CAST(20 AS DECIMAL(38,0)) * tf * sumdl " +
          "+ CAST(6 AS DECIMAL(38,0)) * sumdl " +
          "+ CAST(18 AS DECIMAL(38,0)) * dl * n) AS BIGINT)"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("term"))
        .orderBy(col("bm25_micro").desc, col("doc_id"))))
      .filter(col("rank") <= Bm25K)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("bm25_micro"), col("rank").cast("long").as("rank"))
      .orderBy(col("term"), col("rank"))
  }

  val bm25TopKSql: String = {
    val termsIn = Bm25Terms.map(t => s"'$t'").mkString("(", ", ", ")")
    s"""WITH d0 AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> len(t) > 0) AS ts
       |  FROM documents),
       |dl AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM d0),
       |stats AS (
       |  SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM dl),
       |toks AS (SELECT doc_id, unnest(ts) AS term FROM d0),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
       |  WHERE term IN $termsIn GROUP BY 1, 2),
       |df AS (
       |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |idf AS (
       |  SELECT df.term,
       |    CAST(round(ln((CAST(s.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
       |      / (CAST(df.df AS DOUBLE) + 0.5) + 1.0) * 1000000) AS BIGINT)
       |      AS idf_micro
       |  FROM df CROSS JOIN stats s),
       |scored AS (
       |  SELECT tf.term, tf.doc_id, tf.tf, d.dl,
       |    CAST((CAST(i.idf_micro AS HUGEINT) * 44 * tf.tf * s.sumdl)
       |      // (CAST(20 AS HUGEINT) * tf.tf * s.sumdl
       |         + CAST(6 AS HUGEINT) * s.sumdl
       |         + CAST(18 AS HUGEINT) * d.dl * s.n) AS BIGINT) AS bm25_micro
       |  FROM tf
       |  JOIN idf i ON i.term = tf.term
       |  JOIN dl d ON d.doc_id = tf.doc_id
       |  CROSS JOIN stats s),
       |ranked AS (
       |  SELECT term, doc_id, tf, dl, bm25_micro,
       |    CAST(row_number() OVER (PARTITION BY term
       |      ORDER BY bm25_micro DESC, doc_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT term, doc_id, tf, dl, bm25_micro, rank FROM ranked
       |WHERE rank <= $Bm25K
       |ORDER BY term, rank""".stripMargin
  }
}
