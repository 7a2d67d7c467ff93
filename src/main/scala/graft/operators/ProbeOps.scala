package graft.operators

import java.math.BigInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.sources.Tables

/** Exact integer LINEAR PROBE over the embedding corpus: the
  * nearest-centroid (Rocchio 1971) one-vs-rest classifier that
  * embedding pipelines use as the standard "linear probe" baseline —
  * and that production quality filters bootstrap from (score every
  * document by its projection onto the direction separating a curated
  * positive set from the rest, then threshold; the FineWeb-Edu-style
  * classifier shape with the trained head reduced to its simplest
  * exact form).
  *
  * Everything is EXACT INTEGER arithmetic, the [[PcaOps]] discipline,
  * so the DuckDB oracle replays it to the last bit:
  *  - class-conditional component sums over the 10⁶-quantized
  *    components ([[VectorOps.quantize]]);
  *  - the mean-difference direction via the cross-multiplied identity
  *    d = n₀·S₁ − n₁·S₀ (∝ mean₁ − mean₀; no integer division inside
  *    the vector), reduced once by `max(1, max|d| DIV 2²⁰)` with
  *    sign-split truncation so the per-vector dot stays deep inside
  *    LONG at any corpus size;
  *  - the decision threshold is the exact integer midpoint of the two
  *    projected class means, computed once as a scalar:
  *    θ = trunc((trunc(S₁·d̂/n₁) + trunc(S₀·d̂/n₀)) / 2) — every
  *    division truncates toward zero on both engines (BigInteger
  *    .divide ↔ the sign-split `//` CASE).
  *
  * Scale shape: ONE partial-agg scan reduces the corpus to ≤ 2·Dim+2
  * exact cells (the bounded-collect family: PCA's 4 096 moments, MG's
  * P×k partials); the direction and threshold are derived on the
  * driver in exact BigInteger over those cells; the scoring pass is a
  * zero-shuffle codegen'd map with d̂ and θ inlined as literals. At
  * 100 TB both passes are single linear scans — training a centroid
  * probe is exactly as expensive as reading the corpus twice.
  *
  * Reference analog: none (mrjob has no vector data model) — part of
  * the training-data-pipeline extension surface (SURVEY §2.4).
  */
object ProbeOps {

  /** Embedding width the testdata contract pins. */
  val Dim = 64

  /** Fixed-point bound for the reduced direction (2²⁰) — after the
    * one-time reduction max|d̂| < 2²¹, so a worst-case component
    * product is ≤ 8·10⁶ · 2²¹ ≈ 1.7·10¹³ and the Dim-term dot ≤
    * ~1.1·10¹⁵: LONG-safe with ~8 000× headroom, independent of N. */
  val DScale = 1L << 20

  /** The probed class: one-vs-rest on label 0 (the standard linear-
    * probe protocol; any fixed class works — the contract is the
    * procedure, not the class). */
  val PosLabel = 0

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull && col("label").isNotNull)

  /** Driver-facing query: (vec_id, label, y, score, pred) — each
    * vector's integer projection onto the class-mean-difference
    * direction and its thresholded one-vs-rest prediction. */
  def embedProbe(spark: SparkSession, dir: String): DataFrame =
    embedProbeOn(emb(spark, dir))

  /** [[embedProbe]] over any (vec_id, embedding, label) frame — the
    * planted-corpus spec entry point. */
  def embedProbeOn(d: DataFrame): DataFrame = {
    val (ds, theta) = trainCentroidProbe(d)
    scoreWithProbe(d, ds, theta)
  }

  /** Score any (vec_id, embedding, label) frame against an
    * already-trained probe — shared VERBATIM by the batch row and the
    * streaming ingest scorer, so stream ≡ batch is an identity of
    * code (the contaminationHits precedent). Zero-shuffle codegen'd
    * map: direction and threshold ride along as literals. */
  def scoreWithProbe(d: DataFrame, ds: Array[Long],
      theta: Long): DataFrame =
    d.select(col("vec_id"),
        col("label").cast("long").as("label"),
        (col("label") === PosLabel).cast("int").as("y"),
        VectorOps.dotQ(VectorOps.quantize(col("embedding")),
          typedLit(ds.toSeq)).as("score"))
      .withColumn("pred", (col("score") >= theta).cast("int"))
      .orderBy(col("vec_id"))

  /** One partial-agg scan → ≤ 2·Dim+2 exact cells → exact BigInteger
    * reduction to (d̂, θ). Degenerate corpora (empty, or single-class
    * so one side has no vectors) yield the all-zero direction and
    * θ = 0 — total, deterministic, and never on the oracle path (the
    * fixture has both classes). */
  private[graft] def trainCentroidProbe(d: DataFrame): (Array[Long], Long) = {
    val cells = d
      .select((col("label") === PosLabel).cast("int").as("y"),
        posexplode(VectorOps.quantize(col("embedding")))
          .as(Seq("pos", "xq")))
      .groupBy(col("y"), col("pos"))
      .agg(sum(col("xq").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("cnt"))
      .collect()
    val s1 = Array.fill(Dim)(BigInteger.ZERO)
    val s0 = Array.fill(Dim)(BigInteger.ZERO)
    var n1 = 0L
    var n0 = 0L
    cells.foreach { r =>
      val (y, pos) = (r.getInt(0), r.getInt(1))
      val s = r.getDecimal(2).toBigInteger
      if (y == 1) { s1(pos) = s; n1 = r.getLong(3) }
      else { s0(pos) = s; n0 = r.getLong(3) }
    }
    if (n1 == 0L || n0 == 0L) return (Array.fill(Dim)(0L), 0L)
    val bn1 = BigInteger.valueOf(n1)
    val bn0 = BigInteger.valueOf(n0)
    // d = n0·S1 − n1·S0; BigInteger.divide truncates toward zero ==
    // the sign-split // the oracle replays
    val dRaw = Array.tabulate(Dim)(i =>
      bn0.multiply(s1(i)).subtract(bn1.multiply(s0(i))))
    val scale = dRaw.map(_.abs).max
      .divide(BigInteger.valueOf(DScale)).max(BigInteger.ONE)
    val ds = dRaw.map(_.divide(scale).longValueExact())
    val a1 = (0 until Dim).map(i =>
      s1(i).multiply(BigInteger.valueOf(ds(i)))).reduce(_ add _)
    val a0 = (0 until Dim).map(i =>
      s0(i).multiply(BigInteger.valueOf(ds(i)))).reduce(_ add _)
    val theta = a1.divide(bn1).add(a0.divide(bn0))
      .divide(BigInteger.TWO).longValueExact()
    (ds, theta)
  }

  /** Full bit-exact DuckDB replay: quantize → class-conditional sums →
    * cross-multiplied mean-difference direction → one sign-split
    * reduction → exact integer midpoint threshold → per-vector
    * projection and prediction. */
  private def signDiv(x: String, sc: String): String =
    s"CASE WHEN $x >= 0 THEN $x // $sc ELSE -((-($x)) // $sc) END"

  /** The probe-training CTE chain (quantize → sums → direction →
    * threshold), shared by [[embedProbeSql]] and [[marginSampleSql]]
    * so the two oracles cannot drift. */
  private val probeCtes: String = {
    s"""q AS MATERIALIZED (
       |  SELECT vec_id, label,
       |    CASE WHEN label = $PosLabel THEN 1 ELSE 0 END AS y,
       |    ${VectorOps.QuantizeSql} AS xq
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
       |el AS MATERIALIZED (
       |  SELECT vec_id, y, CAST(t.i AS INT) AS i,
       |    xq[CAST(t.i AS INT) + 1] AS xi
       |  FROM q, UNNEST(range($Dim)) AS t(i)),
       |cnt AS MATERIALIZED (
       |  SELECT CAST(SUM(y) AS HUGEINT) AS n1,
       |    CAST(COUNT(*) - SUM(y) AS HUGEINT) AS n0 FROM q),
       |s AS MATERIALIZED (
       |  SELECT i,
       |    SUM(CASE WHEN y = 1 THEN CAST(xi AS HUGEINT) ELSE 0 END) AS s1,
       |    SUM(CASE WHEN y = 0 THEN CAST(xi AS HUGEINT) ELSE 0 END) AS s0
       |  FROM el GROUP BY 1),
       |d0 AS MATERIALIZED (
       |  SELECT i, (SELECT n0 FROM cnt) * s1 - (SELECT n1 FROM cnt) * s0
       |    AS d
       |  FROM s),
       |mx AS MATERIALIZED (SELECT GREATEST(CAST(1 AS HUGEINT),
       |  MAX(ABS(d)) // $DScale) AS sc FROM d0),
       |d AS MATERIALIZED (SELECT i,
       |  CAST(${signDiv("d0.d", "(SELECT sc FROM mx)")} AS BIGINT) AS d
       |  FROM d0),
       |a AS MATERIALIZED (
       |  SELECT SUM(s.s1 * d.d) AS a1, SUM(s.s0 * d.d) AS a0
       |  FROM s JOIN d USING (i)),
       |th AS MATERIALIZED (
       |  SELECT CAST(${signDiv(
             "(" + signDiv("a1", "n1") + " + " + signDiv("a0", "n0") + ")",
             "2")}
       |    AS BIGINT) AS th
       |  FROM a, cnt),
       |scored AS MATERIALIZED (
       |  SELECT q.vec_id, CAST(q.label AS BIGINT) AS label,
       |    CAST(q.y AS INT) AS y, sc.score
       |  FROM (
       |    SELECT el.vec_id,
       |      CAST(SUM(CAST(el.xi AS HUGEINT) * d.d) AS BIGINT) AS score
       |    FROM el JOIN d USING (i) GROUP BY 1) sc
       |  JOIN q ON q.vec_id = sc.vec_id)""".stripMargin
  }

  /** Full bit-exact DuckDB replay: quantize → class-conditional sums →
    * cross-multiplied mean-difference direction → one sign-split
    * reduction → exact integer midpoint threshold → per-vector
    * projection and prediction. */
  val embedProbeSql: String =
    s"""WITH $probeCtes
       |SELECT vec_id, label, y, score,
       |  CAST(CASE WHEN score >= (SELECT th FROM th)
       |    THEN 1 ELSE 0 END AS INT) AS pred
       |FROM scored
       |ORDER BY vec_id""".stripMargin

  /** How many least-certain vectors [[marginSample]] selects. */
  val MarginSampleK = 25

  /** MARGIN (uncertainty) SAMPLING — the active-learning selection
    * rule (Lewis & Gale 1994; the margin variant of Settles' 2009
    * taxonomy) run on the linear probe's scores: the [[MarginSampleK]]
    * vectors with the SMALLEST |score − θ| are the ones the current
    * classifier is least sure about — exactly the items a labeling /
    * curation loop sends for human annotation next, and the selection
    * step every classifier-bootstrapping pipeline (the FineWeb-Edu
    * shape) iterates on.
    *
    * Scale shape: training is [[trainCentroidProbe]]'s one
    * partial-agg scan; scoring is the zero-shuffle literal-dot map;
    * the selection is top-k by (margin, vec_id) — TakeOrdered, never
    * a global sort. All integer: margin = |score − θ| on exact
    * longs. */
  def marginSample(spark: SparkSession, dir: String): DataFrame = {
    val d = emb(spark, dir)
    val (ds, theta) = trainCentroidProbe(d)
    scoreWithProbe(d, ds, theta)
      .withColumn("margin", abs(col("score") - lit(theta)))
      .orderBy(col("margin").asc, col("vec_id").asc)
      .limit(MarginSampleK)
      .select(col("vec_id"), col("label"), col("score"), col("margin"))
      .orderBy(col("vec_id"))
  }

  val marginSampleSql: String =
    s"""WITH $probeCtes,
       |m AS (
       |  SELECT vec_id, label, score,
       |    ABS(score - (SELECT th FROM th)) AS margin
       |  FROM scored
       |  ORDER BY margin ASC, vec_id ASC LIMIT $MarginSampleK)
       |SELECT vec_id, label, score, CAST(margin AS BIGINT) AS margin
       |FROM m
       |ORDER BY vec_id""".stripMargin
}
