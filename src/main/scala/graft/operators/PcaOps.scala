package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.sources.Tables

/** Exact fixed-point PCA over the embedding corpus: the dominant
  * principal component by integer power iteration over an
  * integer-exact covariance matrix, plus each vector's projection
  * onto it — the whitening/decorrelation primitive embedding
  * pipelines run before semantic dedup and ANN indexing (SemDeDup,
  * Abbas et al. 2023, clusters on normalized+whitened embeddings;
  * "PCA-everything" is the standard preprocessing for IVF/PQ
  * codebooks, Jégou et al. 2011 §V).
  *
  * Everything is EXACT INTEGER arithmetic, so the DuckDB oracle
  * replays it to the last bit:
  *  - second moments over the 10⁶-quantized components
  *    ([[VectorOps.quantize]]): centered covariance via the
  *    N·Σxy − Σx·Σy identity — no float mean subtraction;
  *  - the matrix is rescaled once by `max(1, max|C| DIV 2²⁰)`
  *    (integer DIV, sign split so truncation direction agrees across
  *    engines) to bound the power-iteration intermediates in LONG;
  *  - [[Rounds]] power-iteration steps normalize by the SAME
  *    max-norm DIV rule — any positive rescaling preserves the
  *    iteration's direction, and max-norm needs no square root (an
  *    L2 norm would put an engine-dependent sqrt rounding in the
  *    loop);
  *  - the final projection is one codegen'd integer dot per vector
  *    against the LITERAL iterated direction.
  *
  * Scale shape: the corpus is touched by exactly ONE self-join+agg
  * pass producing a DIMENSION²-bounded (64×64) moment table — never
  * corpus-bounded — with partial map-side aggregation; the power
  * iteration runs on the driver over those 4 096 entries (the
  * bounded-collect family: MG's ≤P×k partials, BPE's 1-row argmax);
  * the projection pass is a zero-shuffle codegen'd map with the
  * direction inlined as a literal. At 100 TB the moment agg IS the
  * whole cost: one linear scan.
  *
  * Reference analog: none (mrjob has no vector data model) — part of
  * the training-data-pipeline extension surface (SURVEY §2.4).
  */
object PcaOps {

  /** Embedding width the testdata contract pins. */
  val Dim = 64

  /** Power-iteration rounds — the output contract is "[[Rounds]]
    * steps of this exact integer procedure from the all-ones start",
    * which both engines replay identically; PcaSpec separately checks
    * the direction is USEFUL (Rayleigh quotient within 2% of a
    * 200-round double-precision reference). 32 because the synthetic
    * corpus' spectrum is tight (measured per-round deficit decay
    * ≈ 0.92, i.e. λ₂/λ₁ ≈ 0.92): 8 rounds left a 9.6% Rayleigh
    * deficit, 16 → 5.1%, 32 → ~1.4%. The unrolled oracle rounds are
    * 64-row CTEs — depth is free on both engines. */
  val Rounds = 32

  /** Fixed-point unit for the iterated direction (2²⁰). */
  val VScale = 1L << 20

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** The reduced integer covariance as a driver-side Dim×Dim array —
    * Cred_ij = sign(C_ij)·(|C_ij| DIV scale), scale = max(1,
    * max|C| DIV 2²⁰), C_ij = N·Σxᵢxⱼ − Σxᵢ·Σxⱼ over quantized
    * components. Dimension²-bounded collect. */
  private[graft] def reducedCovariance(spark: SparkSession,
      dir: String): Array[Array[Long]] = {
    val el = emb(spark, dir)
      .select(col("vec_id"), posexplode(VectorOps.quantize(col("embedding"))))
      .toDF("vec_id", "i", "xi")
      .localCheckpoint() // feeds the self-join twice + the sums once
    val nRows = el.select(countDistinct(col("vec_id"))).head().getLong(0)
    val t = el.groupBy(col("i"))
      .agg(sum(col("xi").cast("decimal(38,0)")).as("ti"))
    val s = el.as("a").join(el.as("b"), Seq("vec_id"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(col("a.xi").cast("decimal(38,0)") * col("b.xi")).as("sij"))
    val c0 = s
      .join(t.select(col("i"), col("ti").as("tia")), Seq("i"))
      .join(t.select(col("i").as("j"), col("ti").as("tib")), Seq("j"))
      .select(col("i"), col("j"),
        (col("sij") * lit(nRows) - col("tia") * col("tib")).as("c"))
      .localCheckpoint() // consumed by the max and the reduction
    val maxAbs = c0.select(max(abs(col("c")))).head()
      .getDecimal(0).toBigInteger
    val scale = (maxAbs.divide(java.math.BigInteger.valueOf(VScale)))
      .max(java.math.BigInteger.ONE)
    val rows = c0.select(col("i"), col("j"),
        expr(s"CAST(CASE WHEN c >= 0 THEN c DIV $scale " +
          s"ELSE -((-c) DIV $scale) END AS BIGINT)").as("cr"))
      .collect()
    val m = Array.ofDim[Long](Dim, Dim)
    rows.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    m
  }

  /** [[Rounds]] integer power-iteration steps from the all-ones×2²⁰
    * start; pure function of the reduced matrix (shared with PcaSpec's
    * independent replay). */
  private[graft] def powerIterate(c: Array[Array[Long]],
      rounds: Int = Rounds): Array[Long] = {
    var v = Array.fill(Dim)(VScale)
    (1 to rounds).foreach { _ =>
      val w = Array.tabulate(Dim) { i =>
        var acc = 0L
        var j = 0
        while (j < Dim) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
      val sc = math.max(1L, w.map(math.abs).max / VScale)
      v = w.map(x => if (x >= 0) x / sc else -((-x) / sc))
    }
    v
  }

  /** Driver-facing query: (vec_id, label, pc1_proj) — each vector's
    * integer projection onto the iterated dominant direction. */
  def embedPca(spark: SparkSession, dir: String): DataFrame = {
    val v = powerIterate(reducedCovariance(spark, dir))
    emb(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        VectorOps.dotQ(VectorOps.quantize(col("embedding")),
          typedLit(v.toSeq)).as("pc1_proj"))
      .orderBy(col("vec_id"))
  }

  /** Full bit-exact DuckDB replay: quantize → centered integer
    * moments → one matrix reduction → [[Rounds]] unrolled power
    * rounds with the same sign-split DIV normalization → projection. */
  val embedPcaSql: String = {
    def signDiv(x: String, sc: String): String =
      s"CASE WHEN $x >= 0 THEN $x // $sc ELSE -((-($x)) // $sc) END"
    val rounds = (1 to Rounds).map { r =>
      val pv = s"v${r - 1}"
      s"""w$r AS MATERIALIZED (
         |  SELECT c.i, SUM(c.c * $pv.v) AS w
         |  FROM c JOIN $pv ON $pv.i = c.j GROUP BY 1),
         |m$r AS MATERIALIZED (SELECT GREATEST(CAST(1 AS HUGEINT),
         |  MAX(ABS(w)) // $VScale) AS sc FROM w$r),
         |v$r AS MATERIALIZED (SELECT i,
         |  CAST(${signDiv("w", s"(SELECT sc FROM m$r)")} AS BIGINT) AS v
         |  FROM w$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id, ${VectorOps.QuantizeSql} AS xq FROM embeddings),
       |el AS MATERIALIZED (
       |  SELECT vec_id, CAST(t.i AS INT) AS i,
       |    xq[CAST(t.i AS INT) + 1] AS xi
       |  FROM q, UNNEST(range($Dim)) AS t(i)),
       |n AS MATERIALIZED (SELECT COUNT(*) AS n FROM q),
       |t AS MATERIALIZED (
       |  SELECT i, SUM(CAST(xi AS HUGEINT)) AS ti FROM el GROUP BY 1),
       |s AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j, SUM(CAST(a.xi AS HUGEINT) * b.xi) AS sij
       |  FROM el a JOIN el b USING (vec_id) GROUP BY 1, 2),
       |c0 AS MATERIALIZED (
       |  SELECT s.i, s.j,
       |    (SELECT n FROM n) * sij - ta.ti * tb.ti AS c
       |  FROM s JOIN t ta ON ta.i = s.i JOIN t tb ON tb.i = s.j),
       |mx AS MATERIALIZED (SELECT GREATEST(CAST(1 AS HUGEINT),
       |  MAX(ABS(c)) // $VScale) AS sc FROM c0),
       |c AS MATERIALIZED (SELECT i, j,
       |  CAST(${signDiv("c0.c", "(SELECT sc FROM mx)")} AS BIGINT) AS c
       |  FROM c0),
       |v0 AS MATERIALIZED (
       |  SELECT CAST(t.i AS INT) AS i, CAST($VScale AS BIGINT) AS v
       |  FROM UNNEST(range($Dim)) AS t(i)),
       |$rounds
       |SELECT el.vec_id,
       |  CAST(MAX(e.label) AS BIGINT) AS label,
       |  CAST(SUM(CAST(el.xi AS HUGEINT) * v$Rounds.v) AS BIGINT)
       |    AS pc1_proj
       |FROM el JOIN v$Rounds ON v$Rounds.i = el.i
       |JOIN embeddings e ON e.vec_id = el.vec_id
       |GROUP BY el.vec_id
       |ORDER BY el.vec_id""".stripMargin
  }
}
