package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column builders over Spark's own bloom-filter expressions.
  *
  * Spark ships `bloom_filter_agg` / `might_contain` as catalyst
  * expressions (they power the optimizer's runtime row-level bloom
  * pruning of shuffle joins) but does not register them as public SQL
  * functions, so the engine bridges them into `Column`s the same way
  * it does its own expressions. `might_contain` requires the filter
  * side to be foldable or a scalar subquery — pass the aggregate
  * through `Dataset.scalar()`; Spark then builds the filter in ONE
  * distributed partial+final aggregate over the reference corpus and
  * broadcasts only the finished bitset to the probe side's tasks.
  */
object BloomFilters {

  /** Aggregate: a serialized bloom filter over `child` (a LONG hash),
    * sized for `items` expected distinct values in `bits` bits. */
  def bloomAgg(child: Column, items: Long, bits: Long): Column =
    GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(child), Literal(items), Literal(bits))
        .toAggregateExpression())

  /** Predicate: may `value` (a LONG hash) be in `bloom` (a binary
    * filter column — a literal or scalar subquery)? False has NO
    * false negatives: a `false` row is PROVABLY absent from the set
    * the filter was built over. */
  def mightContain(bloom: Column, value: Column): Column =
    GraftSqlBridge.column(
      BloomFilterMightContain(
        GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(value)))
}
