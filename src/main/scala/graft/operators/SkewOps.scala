package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skew-handling aggregation: the explicit two-phase salted groupBy
  * for keys whose cardinality is tiny but row share is huge (the
  * 100 TB failure mode: one reducer gets the "en" partition of a
  * 5-language corpus).
  *
  * Phase 1 groups on (key, salt) — salt spreads one hot key over
  * `salts` reducers; phase 2 merges the partials per key. Partial
  * map-side aggregation already smooths moderate skew (and AQE
  * rebalances shuffle reads); this is for the pathological tail where
  * a single post-combine key still exceeds one task.
  *
  * The salt must be data-derived and deterministic-per-row is NOT
  * required for algebraic aggregates (sum/count/min/max): any row →
  * salt assignment yields the same final merge. We hash a
  * caller-chosen spread column.
  */
object SkewOps {

  /** count + sum(valueCol) per key, salted. Result is identical to
    * `df.groupBy(key).agg(count, sum)` — only the shuffle shape
    * changes. */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column,
      spreadOn: Column, salts: Int = 16): DataFrame =
    df.groupBy(key.as("key"), pmod(hash(spreadOn), lit(salts)).as("salt"))
      .agg(count(lit(1)).as("pc"), sum(valueCol).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))

  /** Driver-facing salted aggregation, oracled: the value rides as
    * DECIMAL through both phases (exact, order-independent — the
    * float-sum rule), so the salted result is bit-identical to the
    * plain one-phase aggregation the oracle computes. */
  def skewSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    saltedSumCount(Tables.load(spark, dir, "lineitem"),
      col("l_returnflag"), col("l_quantity").cast("decimal(18,2)"),
      spreadOn = col("l_orderkey"))
      .select(col("key").as("l_returnflag"), col("n"),
        col("total").cast("double").as("total_qty"))
      .orderBy(col("l_returnflag"))

  val skewSaltedAggSql: String =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Salted equi-join: the fact side tags each row with
    * hash(spreadOn) mod R, the dim side replicates every row R times
    * (posexplode of 0..R-1), and the join runs on (key, salt) — a hot
    * fact key's rows now spread over R reducer partitions instead of
    * one. Result is row-identical to the plain join (every fact row
    * meets exactly ONE replica of its dim row).
    *
    * When to reach for it at 100 TB: a shuffle join whose build side
    * is too big to broadcast AND whose key histogram has hot keys —
    * the R× dim inflation buys removal of the straggler partition.
    * (AQE's skewedJoin covers the sort-merge case automatically;
    * explicit salting remains the portable form and the only one that
    * also spreads a hot key across a downstream keyed agg.) */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      spreadOn: Column, salts: Int = 16): DataFrame = {
    val f = fact.withColumn("_salt", pmod(hash(spreadOn), lit(salts)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    f.join(d, Seq(key, "_salt")).drop("_salt")
  }

  /** Driver-facing salted join, oracled: lineitem ⋈ part on partkey
    * (the dim replicated 16×), aggregated per brand with DECIMAL
    * sums so the result is bit-equal to the plain join+agg the
    * oracle computes. */
  def skewSaltedJoin(spark: SparkSession, dir: String): DataFrame =
    saltedJoin(
      Tables.load(spark, dir, "lineitem")
        .select(col("l_partkey").as("partkey"),
          col("l_quantity").cast("decimal(18,2)").as("qty"),
          col("l_orderkey")),
      Tables.load(spark, dir, "part")
        .select(col("p_partkey").as("partkey"), col("p_brand")),
      key = "partkey", spreadOn = col("l_orderkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).cast("double").as("total_qty"))
      .orderBy(col("p_brand"))

  val skewSaltedJoinSql: String =
    """SELECT p_brand, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin
}
