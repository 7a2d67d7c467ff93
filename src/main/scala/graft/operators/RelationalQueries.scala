package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Relational workload over the star schema — the declarative core every
  * mrjob pattern in SURVEY §2.3 reduces to (agg, join, window, top-k,
  * semi/anti, set ops, rollup).
  *
  * Determinism contract with the DuckDB oracle: money arithmetic goes
  * through DECIMAL so sums are exact (double summation is
  * order-dependent and a 32-thread shuffle would hash-mismatch the
  * oracle); final values are cast back to DOUBLE, which is a unique
  * representation of the exact decimal in both engines.
  *
  * Scale posture: every query here keeps aggregation partial (map-side
  * combine is automatic for hash aggregates), broadcasts dimension
  * tables, and never collects to the driver. Top-k uses sort-limit,
  * which Spark executes as per-partition TakeOrdered + driver merge of
  * k rows — no global sort at 100 TB.
  */
object RelationalQueries {

  /** Exact money: cast to decimal before summing. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** revenue term l_extendedprice * (1 - l_discount), exact in decimal. */
  private def revenue: Column =
    (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
        col("l_discount").cast("decimal(18,2)")))

  /** q1: TPC-H Q1-style pricing summary — hash aggregation with partial
    * (map-side) agg; the combiner/reducer sum pattern of
    * mr_word_freq_count generalized to multiple measures. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order,
      |  SUM(l_quantity) / COUNT(*) AS avg_qty
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2: projection + predicate — both must reach the parquet scan
    * (PushedFilters / pruned ReadSchema; mrjob's shell pre_filter done
    * right, SURVEY §2.1 mapper_pre_filter). */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity >= 45 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q3: customer ⋈ orders ⋈ lineitem revenue by nation — the
    * reduce-side-join pattern (mr_text_classifier tag-union, SURVEY
    * §2.4) as real joins. nation/customer are broadcast (small dims);
    * orders⋈lineitem shuffles on the join key once.
    *
    * EAGER AGGREGATION (hand-planned — Catalyst has no such rewrite):
    * lineitem is pre-aggregated per l_orderkey BEFORE the orders join.
    * Both measures are distributive (DECIMAL sum re-sums exactly;
    * count re-sums as sum-of-counts), so results are bit-identical,
    * while the join's probe side shrinks from one row per LINEITEM to
    * one row per ORDER (~4× fewer shuffled rows, and the map-side
    * partial agg compacts the pre-agg shuffle itself) — the rewrite
    * that matters at 100 TB, where lineitem dwarfs orders. */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val nat = Tables.load(spark, dir, "nation")
    val liPerOrder = li.groupBy(col("l_orderkey"))
      .agg(sum(revenue).as("rev"), count(lit(1)).as("cnt"))
    liPerOrder.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("rev")).cast("double").as("revenue"),
        sum(col("cnt")).as("n_items"))
      .orderBy(col("n_name"))
  }

  val q3Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** q4: top-k by measure with deterministic tie-break — sort-limit
    * (TakeOrderedAndProject, no global sort), the
    * mr_most_used_word single-reducer-max pattern at scale. */
  def q4TopK(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    ord.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)
  }

  val q4Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 25""".stripMargin

  /** q5: window functions — rank within partition + running sum; the
    * SORT_VALUES marker-key emulation (mr_next_word_stats, SURVEY §2.4)
    * as a real window. One shuffle on the partition key. */
  def q5Window(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    ord.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q5Sql: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** q6: exact distinct counts — expand-based multi-distinct hash agg
    * (mrjob dedup-inside-reducer, mr_text_classifier.py:290-296). */
  def q6Distinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val q6Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** HLL approximate distinct (SURVEY §2.4): the sketch-based form of
    * [[q6Distinct]] — at 100 TB the exact expand-based multi-distinct
    * shuffles every (group, value) pair, while HLL merges fixed-size
    * sketches map-side. Sketch estimates are engine-defined → no SQL
    * oracle (rows-only gate); the error bound vs the exact count is
    * spec-pinned (ParityGoldenSpec: within 5%). */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** q7: set ops — union/intersect/except; mrjob only had multi-input
    * union (SURVEY §2.4 set ops). Nations appearing among customers vs
    * suppliers. */
  def q7SetOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_nationkey").as("nationkey")).distinct()
    val supp = Tables.load(spark, dir, "supplier")
      .select(col("s_nationkey").as("nationkey")).distinct()
    val both = cust.intersect(supp).withColumn("which", lit("both"))
    val custOnly = cust.except(supp).withColumn("which", lit("customer_only"))
    val suppOnly = supp.except(cust).withColumn("which", lit("supplier_only"))
    both.union(custOnly).union(suppOnly).orderBy(col("which"), col("nationkey"))
  }

  val q7Sql: String =
    """SELECT * FROM (
      |  SELECT nationkey, 'both' AS which FROM
      |    (SELECT DISTINCT c_nationkey AS nationkey FROM customer INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT nationkey, 'customer_only' AS which FROM
      |    (SELECT DISTINCT c_nationkey AS nationkey FROM customer EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT nationkey, 'supplier_only' AS which FROM
      |    (SELECT DISTINCT s_nationkey AS nationkey FROM supplier EXCEPT SELECT DISTINCT c_nationkey FROM customer)
      |) ORDER BY which, nationkey""".stripMargin

  /** q8: semi/anti join — customers with an open order but no 'F' order;
    * the broadcast stop-word file of mr_most_used_word (FILES +
    * membership test) is exactly a broadcast semi/anti join. */
  def q8SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val open = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val fin = ord.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
      .join(fin, cust("c_custkey") === fin("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q8Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** q9: rollup — grouping-set aggregation mrjob never had (free in
    * Spark, SURVEY §2.4). NULL group markers via grouping(). */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  val q9Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  SUM(l_quantity) AS sum_qty, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** q10: argmin-by-composite-order — mr_phone_to_url's min(struct(...))
    * pattern (SURVEY §2.3): cheapest supplier per part via min_by on an
    * ordered struct; one shuffle, no window needed. */
  def q10Argmin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_partkey"))
      .agg(min(struct(col("l_extendedprice"), col("l_suppkey"))).as("m"))
      .select(col("l_partkey"), col("m.l_suppkey").as("best_suppkey"),
        col("m.l_extendedprice").as("best_price"))
      .orderBy(col("l_partkey"))
  }

  val q10Sql: String =
    """SELECT l_partkey, l_suppkey AS best_suppkey, l_extendedprice AS best_price
      |FROM (
      |  SELECT l_partkey, l_suppkey, l_extendedprice,
      |    ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY l_extendedprice ASC, l_suppkey ASC) AS rn
      |  FROM lineitem) t
      |WHERE rn = 1
      |ORDER BY l_partkey""".stripMargin

  /** Blocked fuzzy (edit-distance) self-join over part names — the
    * entity-resolution string-matching pattern. Two scale moves, both
    * part of the registered CONTRACT (the oracle computes the same
    * blocked semantics):
    *  1. compact to DISTINCT names first (name-cardinality work, not
    *     row-cardinality — 2000 parts here carry 64 names, and a
    *     100 TB catalog's name vocabulary is similarly sublinear);
    *  2. equi-join on a blocking key (the head noun) so candidates
    *     are Σ block² over name-vocab blocks, never vocab² — the
    *     dedup_embedding blocking argument; levenshtein then verifies
    *     exactly within the block.
    * Output pairs carry the per-name part multiplicities, so a
    * consumer can expand to part-level matches without redoing the
    * string work. */
  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("noun", element_at(split(col("p_name"), " "), -1))
    val a = p.select(col("p_name").as("name_a"),
      col("n_parts").as("n_a"), col("noun"))
    val b = p.select(col("p_name").as("name_b"),
      col("n_parts").as("n_b"), col("noun"))
    a.join(b, Seq("noun"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("lev") <= 2)
      .select(col("name_a"), col("name_b"), col("lev"),
        col("n_a"), col("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  val fuzzyJoinSql: String =
    """WITH p AS (
      |  SELECT p_name, COUNT(*) AS n_parts,
      |    string_split(p_name, ' ')[-1] AS noun
      |  FROM part GROUP BY p_name)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
      |  a.n_parts AS n_a, b.n_parts AS n_b
      |FROM p a JOIN p b ON a.noun = b.noun AND a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY name_a, name_b""".stripMargin

  // ---------------- table profiling ----------------

  /** Columns profiled by table_profile: (name, isNumeric). */
  private val ProfileCols: Seq[(String, Boolean)] = Seq(
    "l_orderkey" -> true, "l_quantity" -> true, "l_extendedprice" -> true,
    "l_discount" -> true, "l_returnflag" -> false, "l_linestatus" -> false)

  /** Data-quality column profile of `lineitem` — the pipeline-hygiene
    * pass every ingest runs before heavier stages: per column, row
    * count, null count, exact distinct count, and min/max (numeric
    * min/max micro-quantized ONCE per column — the values have ≤2
    * decimal digits, so ×10⁶ never lands near a rounding half; string
    * min/max as-is).
    *
    * Scale: ONE scan. All six per-column profiles (including six exact
    * COUNT(DISTINCT)s) run in a single aggregate — Catalyst plans the
    * multi-distinct via Expand (6× row inflation map-side, still one
    * shuffle), which beats six separate scans of a 100 TB table by 6×
    * I/O. For columns where approximate suffices at scale, the
    * hll_distinct sketch path composes with this shape. The wide
    * single-row result is then unpivoted driver-free via
    * explode(array(struct…)). */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    def micro(c: String): Column =
      round(col(c).cast("double") * 1000000d).cast("long")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      ProfileCols.flatMap { case (c, isNum) =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nul"),
          countDistinct(col(c)).as(s"${c}__dst")) ++
          (if (isNum) Seq(min(micro(c)).as(s"${c}__min"),
            max(micro(c)).as(s"${c}__max"))
          else Seq(min(col(c)).as(s"${c}__smin"),
            max(col(c)).as(s"${c}__smax")))
      }
    val wide = l.agg(aggs.head, aggs.tail: _*)
    val rows = ProfileCols.map { case (c, isNum) =>
      struct(
        lit(c).as("column"), col("n_rows"),
        col(s"${c}__nul").as("n_null"), col(s"${c}__dst").as("n_distinct"),
        (if (isNum) col(s"${c}__min") else lit(null).cast("long"))
          .as("min_num_micro"),
        (if (isNum) col(s"${c}__max") else lit(null).cast("long"))
          .as("max_num_micro"),
        (if (isNum) lit(null).cast("string") else col(s"${c}__smin"))
          .as("min_str"),
        (if (isNum) lit(null).cast("string") else col(s"${c}__smax"))
          .as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy(col("column"))
  }

  val tableProfileSql: String = {
    val parts = ProfileCols.map { case (c, isNum) =>
      val minMax = if (isNum)
        s"""CAST(round(MIN($c) * 1000000) AS BIGINT) AS min_num_micro,
           |    CAST(round(MAX($c) * 1000000) AS BIGINT) AS max_num_micro,
           |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"""
          .stripMargin
      else
        s"""CAST(NULL AS BIGINT) AS min_num_micro,
           |    CAST(NULL AS BIGINT) AS max_num_micro,
           |    MIN($c) AS min_str, MAX($c) AS max_str""".stripMargin
      s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
         |    COUNT(*) - COUNT($c) AS n_null,
         |    COUNT(DISTINCT $c) AS n_distinct,
         |    $minMax
         |  FROM lineitem""".stripMargin
    }
    parts.mkString("", "\n  UNION ALL\n  ", "\nORDER BY \"column\"")
  }
}
