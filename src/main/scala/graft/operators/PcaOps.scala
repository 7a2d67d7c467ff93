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
  * Scale shape: the corpus is touched by exactly ONE partition-local
  * mapPartitions pass that folds each vector into a triangular
  * Dim·(Dim+1)/2 Gram accumulator and emits only the ≤2 145 partial
  * moments per task — never a corpus-bounded intermediate (the
  * round-6 posexplode self-join built ~Dim²/2 rows PER VECTOR for
  * the same table); the power iteration runs on the driver over the
  * merged DIMENSION²-bounded entries (the bounded-collect family:
  * MG's ≤P×k partials, BPE's 1-row argmax);
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

  /** NULL embeddings carry no components: excluded from the moment
    * pass AND the projection — a vector that cannot be projected must
    * not appear in the output (null-robustness sweep, r7). */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)

  /** Vectors accumulated into the Long triangular Gram between
    * BigInteger spills. Bound: |quantized component| can reach ~8·10⁶
    * before the Long products risk anything, and 6.4·10¹³ (the
    * worst-case single product at that magnitude) × 2¹⁴ ≈ 10¹⁸ still
    * clears Long.MaxValue with ~9× headroom — the hot loop stays
    * all-primitive and the BigInteger adds amortize to noise. */
  private val GramSpillEvery = 1 << 14

  /** The reduced integer covariance as a driver-side Dim×Dim array —
    * Cred_ij = sign(C_ij)·(|C_ij| DIV scale), scale = max(1,
    * max|C| DIV 2²⁰), C_ij = N·Σxᵢxⱼ − Σxᵢ·Σxⱼ over quantized
    * components.
    *
    * ONE mapPartitions pass: each task folds its vectors into a
    * triangular Dim·(Dim+1)/2 Long Gram + Dim component sums + a
    * count (primitive per-element loop, BigInteger spill every
    * [[GramSpillEvery]] vectors so no partition size can overflow),
    * then emits ≤ 2 145 exact partial rows; a tiny groupBy-sum over
    * DECIMAL(38,0) merges the ≤ P partials and the centered
    * covariance, rescale, and sign-split reduction run on the driver
    * in exact BigInteger over those Dimension²-bounded entries (the
    * bounded-collect family). The round-6 shape built the same Gram
    * by a posexploded self-join — ~Dim²/2× the row traffic (8.2 M
    * intermediate join rows at sf0.1 for the same 4 096 moments);
    * this pass reads each vector once and shuffles only the partials.
    * Quantization stays IN Spark SQL ([[VectorOps.quantize]]) so the
    * HALF_UP rounding is bit-identical to the oracle's replay
    * (JVM math.round floors ties on negatives — not equivalent). */
  private[graft] def reducedCovariance(spark: SparkSession,
      dir: String): Array[Array[Long]] = {
    import spark.implicits._
    val tri = Dim * (Dim + 1) / 2
    val partials = emb(spark, dir)
      .select(VectorOps.quantize(col("embedding")).as("qx"))
      .as[Array[Long]]
      .mapPartitions { it =>
        var n = 0L
        var sinceSpill = 0
        val sumB = Array.fill(Dim)(java.math.BigInteger.ZERO)
        val gramB = Array.fill(tri)(java.math.BigInteger.ZERO)
        val sumL = new Array[Long](Dim)
        val gramL = new Array[Long](tri)
        def spill(): Unit = {
          var k = 0
          while (k < Dim) {
            if (sumL(k) != 0L) sumB(k) =
              sumB(k).add(java.math.BigInteger.valueOf(sumL(k)))
            sumL(k) = 0L; k += 1
          }
          k = 0
          while (k < tri) {
            if (gramL(k) != 0L) gramB(k) =
              gramB(k).add(java.math.BigInteger.valueOf(gramL(k)))
            gramL(k) = 0L; k += 1
          }
          sinceSpill = 0
        }
        it.foreach { qx =>
          n += 1L
          var i = 0
          var t = 0
          while (i < Dim) {
            val xi = qx(i)
            sumL(i) += xi
            var j = i
            while (j < Dim) { gramL(t) += xi * qx(j); j += 1; t += 1 }
            i += 1
          }
          sinceSpill += 1
          if (sinceSpill == GramSpillEvery) spill()
        }
        spill()
        if (n == 0L) Iterator.empty
        else {
          val buf = new scala.collection.mutable.ArrayBuffer[
            (Int, Int, String)](tri + Dim + 1)
          buf += (((-1, -1, n.toString)))
          var i = 0
          var t = 0
          while (i < Dim) {
            buf += (((i, -1, sumB(i).toString)))
            var j = i
            while (j < Dim) {
              buf += (((i, j, gramB(t).toString))); j += 1; t += 1
            }
            i += 1
          }
          buf.iterator
        }
      }
    val merged = partials.toDF("i", "j", "v")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("v").cast("decimal(38,0)")).as("v"))
      .collect()
    // exact BigInteger reduction over the ≤2145 merged moments;
    // cells default to ZERO (not null) so an EMPTY corpus — zero
    // partials — degrades to the all-zero covariance instead of an
    // NPE (caught by the empty-corpus totality sweep)
    import java.math.BigInteger
    var nRows = BigInteger.ZERO
    val ts = Array.fill(Dim)(BigInteger.ZERO)
    val ss = Array.fill(Dim, Dim)(BigInteger.ZERO)
    merged.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDecimal(2).toBigInteger)
      if (i < 0) nRows = v
      else if (j < 0) ts(i) = v
      else { ss(i)(j) = v; ss(j)(i) = v } // Gram is symmetric
    }
    val c = Array.tabulate(Dim, Dim)((i, j) =>
      nRows.multiply(ss(i)(j)).subtract(ts(i).multiply(ts(j))))
    val maxAbs = c.flatten.map(_.abs).max
    val scale = maxAbs.divide(BigInteger.valueOf(VScale)).max(BigInteger.ONE)
    // BigInteger.divide truncates toward zero == the sign-split DIV
    // both engines replay
    Array.tabulate(Dim, Dim)((i, j) => c(i)(j).divide(scale).longValueExact())
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
