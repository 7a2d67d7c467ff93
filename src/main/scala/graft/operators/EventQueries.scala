package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Event-stream (batch) workload over the `events` table: time-bucket
  * aggregation, JSON prop extraction, gap-based sessionization.
  *
  * Timestamp determinism with the oracle: the parquet column is
  * nanosecond-precision, which Spark 4 only reads as nanos-since-epoch
  * longs (`spark.sql.legacy.parquet.nanosAsLong`) while DuckDB keeps a
  * ns timestamp — so every comparison/grouping goes through either a
  * formatted string bucket or micros-since-epoch (`ns / 1000` here ==
  * `epoch_us(ts)` there, both floor for positive epochs), never raw
  * timestamps. Money-style sums go through DECIMAL as usual.
  *
  * The streaming (incremental) versions of these live in
  * graft.streaming — the reference has no incremental processing at
  * all (SURVEY §1.1), so those are additive and not oracle-gated.
  */
object EventQueries {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  /** ts (nanos long) → micros long. Integral DIV — `/` would go
    * through double and lose precision above 2^53 ns. */
  private def tsMicros = expr("ts DIV 1000")

  /** Attribution range join: for every click, how many purchases the
    * same user made within the following hour — the (t, t+Δ] range
    * join that goes quadratic if written naively (Spark plans a
    * non-equi join as BNLJ: every click × every purchase per user).
    *
    * Scale shape: BUCKETIZED range join. Purchases are exploded to
    * their hour bucket and the preceding one, so a click joins on the
    * EQUI key (user_id, its own bucket) — any qualifying purchase
    * (click.ts < p.ts ≤ click.ts + 1 h) lands in one of those two
    * buckets — then the exact range predicate filters residuals. Cost
    * is 2× the purchase rows through one hash join instead of a
    * per-user cross product; Δ tunes the bucket width. The left join
    * keeps zero-purchase clicks (count(p) counts only matches). */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val e = events(spark, dir).withColumn("us", tsMicros)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us").as("c_us"),
        expr(s"us DIV $HourUs").as("bkt"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("p_us"),
        explode(array(expr(s"us DIV $HourUs"),
          expr(s"us DIV $HourUs") - 1)).as("bkt"))
    clicks.join(purchases, Seq("user_id", "bkt"), "left")
      .groupBy(col("event_id"))
      .agg(count(when(col("p_us") > col("c_us") &&
        col("p_us") <= col("c_us") + HourUs, 1)).as("n_purchases"))
      .orderBy(col("event_id"))
  }

  val eventsAttributionSql: String =
    """SELECT c.event_id,
      |  COUNT(CASE WHEN epoch_us(p.ts) > epoch_us(c.ts)
      |    AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000 THEN 1 END)
      |    AS n_purchases
      |FROM events c
      |LEFT JOIN events p
      |  ON p.user_id = c.user_id AND p.event_type = 'purchase'
      |WHERE c.event_type = 'click'
      |GROUP BY c.event_id
      |ORDER BY c.event_id""".stripMargin

  /** Hourly tumbling-window counts/sums per event type. */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        date_format(timestamp_micros(tsMicros), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  val eventsHourlySql: String =
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY hour, event_type
      |ORDER BY hour, event_type""".stripMargin

  /** JSON prop extraction + aggregation (the protocol layer's
    * JSON-value dynamism, relationally). */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val eventsJsonSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Gap-based sessionization: a new session starts after a >30-min
    * silence per user. Two windows over one user-keyed shuffle:
    * lag → boundary flag → running sum = session id; then per-session
    * rollup. The classic pattern mrjob cannot express without
    * SORT_VALUES + stateful reducers (SURVEY §2.4). */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), tsMicros.as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("boundary",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("boundary")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** As-of join: for every 'error' event, the user's most recent
    * 'signup' at-or-before it. Spark has no ASOF JOIN operator; the
    * guide's preference (a) — compose built-ins — applies: tag-union
    * both sides, one user-keyed window, `last(_, ignoreNulls)` carries
    * the newest left-side timestamp forward. ONE shuffle on user_id,
    * no range-join explosion — this shape holds at 100 TB (an actual
    * range join would be quadratic per user without range bucketing).
    * Ties: a signup at the exact error micro sorts first (tag 0 <
    * tag 1) and therefore counts as "before". */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir).select(col("user_id"), col("event_id"),
      col("event_type"), tsMicros.as("us"))
    val tagged = e.filter(col("event_type").isin("signup", "error"))
      .withColumn("tag", when(col("event_type") === "signup", 0).otherwise(1))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_signup_us",
        last(when(col("tag") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id").as("error_event_id"), col("user_id"),
        col("us").as("error_us"), col("last_signup_us"),
        (col("us") - col("last_signup_us")).as("gap_us"))
      .orderBy(col("error_event_id"))
  }

  val eventsAsofSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |  FROM events WHERE event_type IN ('signup', 'error')),
      |tagged AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tag
      |  FROM e),
      |carried AS (
      |  SELECT user_id, event_id, us, tag,
      |    last_value(CASE WHEN tag = 0 THEN us END IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY us ASC, tag ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_us
      |  FROM tagged)
      |SELECT event_id AS error_event_id, user_id, us AS error_us,
      |  last_signup_us, us - last_signup_us AS gap_us
      |FROM carried WHERE tag = 1
      |ORDER BY error_event_id""".stripMargin

  /** Pivot: per-user event-type counts as columns. Spark `pivot` with
    * an explicit value list (never the implicit distinct-scan variant
    * at scale); the oracle is the equivalent conditional aggregation. */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
      .orderBy(col("user_id"))
  }

  val eventsPivotSql: String =
    """SELECT user_id,
      |  COUNT(*) FILTER (event_type = 'click') AS click,
      |  COUNT(*) FILTER (event_type = 'error') AS error,
      |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (event_type = 'view') AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Exact per-group median (lower element for even n — position
    * (n+1) div 2) via row_number: deterministic, one shuffle per group
    * key, no interpolation-formula drift between engines. */
  def eventsMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    events(spark, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("event_type"), col("value").as("median_value"),
        col("n").as("n_events"))
      .orderBy(col("event_type"))
  }

  val eventsMedianSql: String =
    """SELECT event_type, value AS median_value, n AS n_events FROM (
      |  SELECT event_type, value, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events) t
      |WHERE rn = (n + 1) // 2
      |ORDER BY event_type""".stripMargin

  /** Approximate per-group QUANTILES — the sketch companion to the
    * exact [[eventsMedian]]: p50/p95/p99 of `value` per event_type via
    * Spark's `percentile_approx` (the Greenwald-Khanna sketch).
    * Exact percentiles need the full per-group sort eventsMedian pays;
    * the GK sketch is fixed-size and MERGEABLE — partial sketches
    * combine map-side like any partial agg, so at 100 TB this is one
    * ordinary partial+final aggregation with no global sort anywhere
    * (the same scale argument as hll_distinct vs q6_distinct).
    * Sketch-defined output → registered rows-only; the spec pins the
    * GK rank-error contract (≤ n/accuracy) against the exact sorted
    * quantiles, mirroring the HLL 5%-error gate. */
  def eventsQuantiles(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    val qs = array(lit(0.5), lit(0.95), lit(0.99))
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        percentile_approx(col("value"), qs, lit(accuracy)).as("q"))
      .select(col("event_type"), col("n_events"),
        element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p95"),
        element_at(col("q"), 3).as("p99"))
      .orderBy(col("event_type"))
  }

  val eventsSessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |b AS (
      |  SELECT user_id, event_id, us,
      |    CASE WHEN lag(us) OVER w IS NULL
      |           OR us - lag(us) OVER w > 30 * 60 * 1000000
      |         THEN 1 ELSE 0 END AS boundary
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
      |s AS (
      |  SELECT user_id, us,
      |    CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM b)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(us) AS start_us, MAX(us) AS end_us
      |FROM s
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin
}
