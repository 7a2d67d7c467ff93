package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Frequent-items (heavy hitters) via a mergeable Misra-Gries summary
  * — the fixed-memory answer to "which keys exceed an N/(k+1) share"
  * that a 100 TB corpus scan can afford: each task keeps at most k
  * counters regardless of vocabulary size, partials union-sum to
  * ≤ partitions×k rows, and the candidate set is then EXACT-verified
  * with a semi-join-bounded count (no full-vocabulary shuffle ever
  * happens — the only grouped agg runs over candidate keys, a set of
  * at most k·P rows that map-side combine collapses per task).
  *
  * Guarantee chain (Misra-Gries 1982; mergeability per Agarwal et al.
  * 2012, "Mergeable Summaries"): a k-counter summary over N_i items
  * undercounts any key by at most N_i/(k+1); summing per-partition
  * summaries keeps the bound additive, Σ N_i/(k+1) ≤ N/(k+1). Hence
  * every key with true count > N/(k+1) has a positive merged estimate
  * and survives into the candidate set — the exact-verify filter
  * `cnt·(k+1) > N` therefore returns EXACTLY the true heavy-hitter
  * set, which is what makes the registered query SQL-oracle-able even
  * though the sketch itself is approximate.
  *
  * On this synthetic corpus the 31-word vocabulary never overflows
  * k = 32 counters (the summary happens to be exact); the spec plants
  * Zipf-skewed streams with vocab ≫ k to exercise eviction, the
  * undercount bound, and the no-false-negative guarantee.
  */
object SketchOps {

  /** Pure Misra-Gries kernel (spec-tested in isolation). `add` is the
    * classic decrement-all eviction; amortized O(1) — each decrement
    * round is paid for by k+1 arrivals. */
  final class MisraGries(val k: Int) {
    private val counters = mutable.HashMap.empty[String, Long]
    /** Restore a previously-emitted summary (≤ k entries) — the
      * streaming-state resume path. O(entries), not O(Σ counts). */
    def seed(prev: Iterable[(String, Long)]): Unit = {
      require(prev.size <= k, s"seed larger than $k counters")
      prev.foreach { case (w, c) => counters.update(w, c) }
    }
    def add(w: String): Unit = counters.get(w) match {
      case Some(c) => counters.update(w, c + 1)
      case None if counters.size < k => counters.update(w, 1L)
      case None =>
        counters.mapValuesInPlace((_, c) => c - 1)
        counters.filterInPlace((_, c) => c > 0)
    }
    def result: Iterator[(String, Long)] = counters.iterator
  }

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Heavy hitters over any single string column: MG candidates →
    * exact verify. Returns exactly {key | cnt·(k+1) > N}. Null items
    * are ignored (they could never survive the equi-join verify pass
    * anyway; stating it makes N's definition explicit).
    *
    * Exactly TWO passes over the data: the sketch pass emits each
    * task's MG summary AND its item count (previously the exact N was
    * a third full scan), and the verify pass counts only candidate
    * keys. The ≤ partitions×(k+1) summary rows come back to the
    * driver — the classic mergeable-summaries merge topology (Agarwal
    * et al. 2012), and no more data than `broadcast(cand)` was
    * already hauling through the driver to build the broadcast. */
  def heavyHittersOver(items: DataFrame, k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.select(col(items.columns.head).as("w")).as[String]
      .filter((w: String) => w != null)
    val partials = ds.mapPartitions { it =>
      val mg = new MisraGries(k)
      var n = 0L
      it.foreach { w => mg.add(w); n += 1 }
      // keys are non-null (filtered above), so None marks exactly the
      // one per-task count row
      mg.result.map { case (w, c) => (Option(w), c) } ++
        Iterator((Option.empty[String], n))
    }.collect()
    val n = partials.collect { case (None, c) => c }.sum
    val cand = partials.collect { case (Some(w), _) => w }.distinct.toSeq
    ds.toDF("w")
      .join(broadcast(cand.toDF("w")), Seq("w")) // semi-join bound
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > n)
      .select(col("w").as("word"), col("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
  }

  /** Registered query: word heavy hitters at k=32 on `documents`. */
  def heavyHitters(spark: SparkSession, dir: String,
      k: Int = 32): DataFrame =
    heavyHittersOver(
      docs(spark, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0),
      k)

  val heavyHittersSql: String =
    """WITH w AS (
      |  SELECT unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |wf AS (
      |  SELECT w, COUNT(*) AS cnt FROM w WHERE len(w) > 0 GROUP BY w),
      |n AS (SELECT COUNT(*) AS n FROM w WHERE len(w) > 0)
      |SELECT w AS word, cnt FROM wf, n
      |WHERE cnt * 33 > n
      |ORDER BY cnt DESC, word ASC""".stripMargin
}
