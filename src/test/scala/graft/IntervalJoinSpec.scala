package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventQueries
import graft.sources.Tables

/** events_interval_join: the bucketized (range-as-equi-key) plan must
  * be EXACTLY the naive range-join formulation — an equivalence
  * theorem, not an approximation: with bucket width == window length,
  * a qualifying purchase's bucket is always the click's bucket or the
  * next one, so the two-key explode covers every candidate and each
  * true pair is found exactly once (a purchase owns one bucket). */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  test("bucketized interval join equals the naive range-join " +
    "formulation, row for row") {
    val winUs = 3600000000L
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val a = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("a_us"))
    val b = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts_us").as("b_us"))
    val naive = a.join(b, col("user_id") === col("b_user") &&
        col("b_us") >= col("a_us") &&
        col("b_us") - col("a_us") <= winUs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("b_us") - col("a_us")).as("sum_gap_us"),
        max(col("b_us") - col("a_us")).as("max_gap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val bucketized = EventQueries.eventsIntervalJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(bucketized == naive,
      s"bucketized != naive: only-bucketized=${bucketized -- naive}, " +
        s"only-naive=${naive -- bucketized}")
    assert(bucketized.nonEmpty, "fixture yields no pairs — vacuous test")
  }

  test("window boundaries: gap 0 and gap exactly the window length " +
    "are both included; one microsecond past is excluded") {
    import spark.implicits._
    val winUs = 3600000000L
    // synthetic corpus exercising the exact boundary cases, routed
    // through the same bucket arithmetic via a temp dir
    val out = java.nio.file.Files
      .createTempDirectory("graft-interval-edge").toString
    val base = 1700000000000000L
    Seq(
      (1L, base, "click", 7L),
      (2L, base, "purchase", 7L),            // gap 0: in
      (3L, base + winUs, "purchase", 7L),    // gap == window: in
      (4L, base + winUs + 1, "purchase", 7L),// one past: out
      (5L, base - 1, "purchase", 7L)         // before the click: out
    ).toDF("event_id", "us", "event_type", "user_id")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val r = EventQueries.eventsIntervalJoin(spark, out).collect()
    assert(r.length == 1 && r(0).getLong(0) == 7L)
    assert(r(0).getLong(1) == 2L, s"expected pairs {gap 0, gap Δ}: ${r(0)}")
    assert(r(0).getLong(3) == winUs, "max gap must be the full window")
  }
}
