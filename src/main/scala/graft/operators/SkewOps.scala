package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
