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
    * min/max micro-quantized ONCE per column in the final projection —
    * the values have ≤2 decimal digits, so ×10⁶ never lands near a
    * rounding half; string min/max as-is).
    *
    * Scale: ONE scan, TWO-STAGE (the Deequ-style exact-profile shape).
    * A naive single aggregate with six COUNT(DISTINCT)s plus string
    * MIN/MAX is a trap Catalyst can't escape: string aggregation
    * buffers are immutable, so the whole multi-distinct Expand falls
    * out of HashAggregate into SortAggregate — measured 14 s at sf0.1
    * (two full sorts of the 7× expanded corpus) vs ~1 s for this
    * shape. Instead: explode each row into (column, value) pairs,
    * HASH-aggregate them into the per-column distinct-value table
    * (values are GROUPING KEYS, which hash fine — only buffers can't
    * be strings), then summarize that compacted table (Σ distinct
    * values ≪ rows) into counts and min/max. The one sort-based agg
    * left runs over the compacted table, not the corpus. */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread (r14, measured): redistributing the 3-partition scan
    // before the ×|ProfileCols| explode just moved the cost — the
    // scan+round-robin write itself serializes on the same 3 tasks
    // and adds a 26 MB exchange for a ~flat wall (stage profile A/B)
    val l = Tables.load(spark, dir, "lineitem")
    val pairs = ProfileCols.map { case (c, isNum) =>
      struct(lit(c).as("pc"),
        (if (isNum) col(c).cast("double") else lit(null).cast("double"))
          .as("vnum"),
        (if (isNum) lit(null).cast("string") else col(c).cast("string"))
          .as("vstr"))
    }
    val g1 = l.select(explode(array(pairs: _*)).as("e")).select(col("e.*"))
      .groupBy(col("pc"), col("vnum"), col("vstr"))
      .agg(count(lit(1)).as("cnt"))
    val isNull = col("vnum").isNull && col("vstr").isNull
    g1.groupBy(col("pc"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(isNull, col("cnt")).otherwise(0L)).as("n_null"),
        sum(when(isNull, 0L).otherwise(1L)).as("n_distinct"),
        min(col("vnum")).as("mn"), max(col("vnum")).as("mx"),
        min(col("vstr")).as("min_str"), max(col("vstr")).as("max_str"))
      .select(col("pc").as("column"), col("n_rows"), col("n_null"),
        col("n_distinct"),
        round(col("mn") * 1000000d).cast("long").as("min_num_micro"),
        round(col("mx") * 1000000d).cast("long").as("max_num_micro"),
        col("min_str"), col("max_str"))
      .orderBy(col("column"))
  }

  // ---------------- Z-order layout key ----------------

  /** Bits interleaved per key by the Z-order curve (after range
    * normalization to 0..2^ZBits-1). */
  val ZBits = 8

  /** Morton interleave of two [[ZBits]]-bit values (ps even bits, ss
    * odd bits) — a bijection onto 0..2^(2·ZBits)-1, pure codegen'd
    * bit algebra. */
  def mortonInterleave(ps: Column, ss: Column): Column =
    (0 until ZBits).map { b =>
      shiftrightunsigned(ps, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b)) +
        shiftrightunsigned(ss, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1))
    }.reduce(_ + _)

  /** Z-order (Morton) layout audit over lineitem's (l_partkey,
    * l_suppkey): range-normalize each key to [[ZBits]] bits against
    * its observed min/max (integer scaling — the quantization
    * Delta/Iceberg OPTIMIZE ZORDER applies before interleaving, since
    * raw keys occupy only the low bits of their domain and would
    * degenerate to a single bucket), interleave into a 16-bit
    * z-value, bucket rows by the top 8 z-bits, and report each
    * bucket's row count and per-key min/max spans. Rows co-located in
    * a z-bucket cover a NARROW range of BOTH keys, so min/max file
    * statistics prune scans on either predicate — the span columns
    * are exactly the file-skipping stats a lakehouse writes, and
    * shrinking spans == better pruning.
    *
    * Scale: key bounds are one agg broadcast as a single row (the
    * tf_idf shape); the z-value itself is pure codegen'd bit algebra
    * (no shuffle, no UDF); the bucket summary is one partial+final
    * agg on an 8-bit key. Used as a write-time
    * `repartitionByRange(zval)` key, this is how a 100 TB table gets
    * multi-column scan pruning without a second sort column. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
    val bounds = l.agg(
      min(col("l_partkey")).as("pmin"), max(col("l_partkey")).as("pmax"),
      min(col("l_suppkey")).as("smin"), max(col("l_suppkey")).as("smax"))
    val top = (1L << ZBits) - 1
    def scale(k: String, lo: String, hi: String) =
      expr(s"(($k - $lo) * $top) DIV greatest(1, $hi - $lo)")
    val withScaled = l.crossJoin(broadcast(bounds))
      .withColumn("ps", scale("l_partkey", "pmin", "pmax"))
      .withColumn("ss", scale("l_suppkey", "smin", "smax"))
    withScaled.select(col("l_partkey"), col("l_suppkey"),
        mortonInterleave(col("ps"), col("ss")).as("zval"))
      .withColumn("zbucket", expr(s"zval DIV ${1L << ZBits}"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("part_lo"), max(col("l_partkey")).as("part_hi"),
        min(col("l_suppkey")).as("supp_lo"), max(col("l_suppkey")).as("supp_hi"))
      .orderBy(col("zbucket"))
  }

  val zorderLayoutSql: String = {
    val top = (1L << ZBits) - 1
    val terms = (0 until ZBits).map { b =>
      s"((ps >> $b) & 1) * ${1L << (2 * b)} + " +
        s"((ss >> $b) & 1) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")
    s"""WITH bounds AS (
       |  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
       |    MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
       |  FROM lineitem),
       |scaled AS (
       |  SELECT l_partkey, l_suppkey,
       |    ((l_partkey - pmin) * $top) // greatest(1, pmax - pmin) AS ps,
       |    ((l_suppkey - smin) * $top) // greatest(1, smax - smin) AS ss
       |  FROM lineitem CROSS JOIN bounds),
       |z AS (
       |  SELECT l_partkey, l_suppkey, ($terms) AS zval FROM scaled)
       |SELECT zval // ${1L << ZBits} AS zbucket, COUNT(*) AS n,
       |  MIN(l_partkey) AS part_lo, MAX(l_partkey) AS part_hi,
       |  MIN(l_suppkey) AS supp_lo, MAX(l_suppkey) AS supp_hi
       |FROM z
       |GROUP BY zbucket
       |ORDER BY zbucket""".stripMargin
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
