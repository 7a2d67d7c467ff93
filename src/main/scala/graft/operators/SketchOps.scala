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

  // ----------------- count-min sketch -----------------

  /** CMS geometry: d hash rows × w buckets. Cormode & Muthukrishnan
    * 2005 ("An improved data stream summary: the count-min sketch"):
    * overestimate-only point queries, est ≤ true + εN with
    * probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉; summaries merge by
    * cell-wise addition. */
  val CmsDepth = 4
  val CmsWidth = 256
  private val CmsSeeds = Seq(101L, 103L, 107L, 109L)
  /** Queried terms: the exact top-[[CmsTopK]] by (count desc, term). */
  val CmsTopK = 30

  /** Count-min sketch over document words, point-queried for the
    * exact top-[[CmsTopK]] terms: (word, exact cnt, CMS est,
    * overestimate). Complements [[heavyHitters]] in the mergeable-
    * sketch family — MG answers "which keys are frequent", CMS
    * answers "how frequent is THIS key" for any key, in d·w fixed
    * cells.
    *
    * Scale shape: the counter build is one explode + one (row,
    * bucket) partial+final agg whose result is ≤ d·w rows — a
    * broadcast-sized table no matter the corpus; the point-query side
    * joins the queried keys to it on the bucket equi-key. The exact
    * counts (verify side, same as heavy_hitters) are a vocab-bounded
    * agg. Hash family: vocab rank → quadratic hash mod P mod w — the
    * [[DedupOps.quadHash]] family both engines compute bit-identically
    * (rank over the sorted distinct vocabulary; binary UTF-8 order on
    * both), so the row is FULLY ORACLED: DuckDB rebuilds the whole
    * sketch and every estimate matches exactly. */
  def cmsCounts(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // vocab rank via the distributed rank-offsets job (r11) — the
    // global row_number window funneled the corpus-growing
    // vocabulary through one task
    val vocab = graft.functions.GlobalRank.withRank1(
      tf, "vid", col("tok"))
    val buckets = (cmsRow: Int) =>
      pmod(DedupOps.quadHash(col("vid"), CmsSeeds(cmsRow)),
        lit(CmsWidth.toLong))
    val cells = vocab.select(col("cnt"),
        posexplode(array((0 until CmsDepth).map(buckets): _*)))
      .groupBy(col("pos").as("r"), col("col").as("bucket"))
      .agg(sum(col("cnt")).as("total"))
    val queried = vocab
      .orderBy(col("cnt").desc, col("tok")).limit(CmsTopK)
      .select(col("tok"), col("cnt"),
        posexplode(array((0 until CmsDepth).map(buckets): _*)))
      .withColumnRenamed("pos", "r").withColumnRenamed("col", "bucket")
    queried.join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("tok"), col("cnt"))
      .agg(min(col("total")).as("est"))
      .select(col("tok").as("word"), col("cnt"), col("est"),
        (col("est") - col("cnt")).as("overcount"))
      .orderBy(col("cnt").desc, col("word"))
  }

  val cmsCountsSql: String = {
    val bucketSql = (i: Int) =>
      s"(${DedupOps.quadHashSql("vid", CmsSeeds(i))}) % $CmsWidth"
    val unpivot = (0 until CmsDepth).map(i =>
      s"SELECT $i AS r, ${bucketSql(i)} AS bucket, cnt FROM v")
      .mkString("\n  UNION ALL ")
    s"""WITH w AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |tf AS (
       |  SELECT tok, COUNT(*) AS cnt FROM w WHERE len(tok) > 0
       |  GROUP BY tok),
       |v AS (
       |  SELECT tok, cnt, ROW_NUMBER() OVER (ORDER BY tok) AS vid
       |  FROM tf),
       |cells0 AS (
       |  $unpivot),
       |cells AS (
       |  SELECT r, bucket, CAST(SUM(cnt) AS BIGINT) AS total FROM cells0
       |  GROUP BY r, bucket),
       |q AS (
       |  SELECT tok, cnt, vid FROM v
       |  ORDER BY cnt DESC, tok LIMIT $CmsTopK),
       |qb AS (
       |  ${(0 until CmsDepth).map(i =>
            s"SELECT tok, cnt, $i AS r, ${bucketSql(i)} AS bucket FROM q")
            .mkString("\n  UNION ALL ")}),
       |est AS (
       |  SELECT qb.tok, qb.cnt, MIN(c.total) AS est
       |  FROM qb JOIN cells c ON qb.r = c.r AND qb.bucket = c.bucket
       |  GROUP BY qb.tok, qb.cnt)
       |SELECT tok AS word, cnt, est, est - cnt AS overcount FROM est
       |ORDER BY cnt DESC, word""".stripMargin
  }

  // ---------------- fully-oracled HyperLogLog ----------------

  /** HLL precision: p=12 → m=4096 registers, ~1.04/√m ≈ 1.6% std
    * error. */
  val HllM = 4096

  /** HyperLogLog distinct-count (Flajolet et al. 2007), FULLY ORACLED:
    * unlike `hll_distinct` (Spark's approx_count_distinct — rows-only,
    * its internal hash family can't be replayed in the oracle), this
    * builds the sketch from an engine-agnostic hash — the first 15 hex
    * chars of md5 (60 bits; md5 is bit-identical everywhere) — so
    * DuckDB reconstructs the SAME 4096 registers digit-by-digit and
    * the estimate matches to the last bit. Register math is
    * all-integer: rho from the bit length of the 48-bit remainder,
    * register sums as Σ 2^(62−r) in DECIMAL(38,0) (exact; a double
    * Σ 2^−r would be summation-order-dependent), and the final
    * raw-estimate / linear-counting doubles are divisions of exactly
    * agreed integers with shared literals.
    *
    * Scale shape: the canonical mergeable sketch — one hash pass,
    * partial+final MAX per (column, bucket), ≤ m register rows per
    * column ever shuffled. The n_exact column is the verification
    * contract (a COUNT(DISTINCT) the oracle replays); a production
    * 100 TB run would emit only the sketch side — the whole point is
    * never paying that distinct shuffle. */
  def hllMd5(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val vals = e.select(lit("user_id").as("key"),
        col("user_id").cast("string").as("v"))
      .unionAll(e.select(lit("event_id").as("key"),
        col("event_id").cast("string").as("v")))
    hllEstimate(vals)
      .select(col("key").as("column_name"), col("n_exact"),
        col("hll_estimate"), col("v_empty"))
      .orderBy(col("column_name"))
  }

  /** The shared sketch core: input (key STRING, v STRING) → one row
    * per key with (key, n_exact, hll_estimate, v_empty). See
    * [[hllMd5]] for the determinism contract. */
  def hllEstimate(vals: DataFrame): DataFrame = {
    // ONE distinct pass, ONE consumer (r15; r14 verdict #6): r14 fed
    // the distinct set to TWO consumers (register leg + exact-count
    // leg, re-joined on key) and relied on AQE runtime exchange reuse
    // to shuffle it once — reuse the committed plans could not prove
    // (no ReusedExchange node; isFinalPlan=false) and that hll_md5
    // measurably did not get (1.02 → 1.20 s). Now the exact count
    // RIDES the register aggregation: the (key, bucket) agg also
    // counts its non-null v's, and Σ over buckets of those counts ≡
    // count(v) over the distinct set ≡ countDistinct(v) — bucket is a
    // pure function of v, NULL v lands in the one NULL-h bucket where
    // count(v) contributes 0, exactly matching countDistinct's NULL
    // skip. One chain: distinct → md5-per-distinct-value →
    // (key, bucket) agg → (key) agg; no second consumer, no join, no
    // reliance on runtime reuse. Register math unchanged (md5 is a
    // function of v — a duplicate can only repeat a rho, never raise
    // a bucket max), so registers, estimate, and v_empty are
    // bit-identical to r14's.
    val dv = vals.distinct()
    val regs = dv
      .withColumn("h",
        expr("CAST(conv(substr(md5(v), 1, 15), 16, 10) AS BIGINT)"))
      // top 12 bits → bucket, low 48 bits → rank input
      .withColumn("bucket", expr("h DIV 281474976710656"))
      .withColumn("rem", expr("h % 281474976710656"))
      .withColumn("rho", expr(
        "CASE WHEN rem = 0 THEN 49 ELSE 49 - length(bin(rem)) END"))
      .groupBy(col("key"), col("bucket"))
      .agg(max(col("rho")).as("r"), count(col("v")).as("nv"))
    regs.groupBy(col("key"))
      .agg(count(lit(1)).as("present"),
        sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), " +
          "CAST(62 - r AS INT)) AS DECIMAL(38,0))")).as("s_present"),
        sum(col("nv")).as("n_exact"))
      .withColumn("v_empty", lit(HllM) - col("present"))
      .withColumn("s_d", expr("CAST(s_present + CAST(v_empty AS " +
        "DECIMAL(38,0)) * CAST(4611686018427387904 AS DECIMAL(38,0)) " +
        "AS DOUBLE)"))
      .withColumn("e_raw", expr("(0.7213/(1+1.079/4096)) * 4096 * 4096" +
        " * CAST(4611686018427387904 AS DOUBLE) / s_d"))
      .withColumn("e", expr("CASE WHEN e_raw <= 2.5*4096 AND " +
        "v_empty > 0 THEN 4096.0 * ln(4096.0 / v_empty) ELSE e_raw END"))
      .select(col("key"), col("n_exact"),
        expr("CAST(round(e) AS BIGINT)").as("hll_estimate"),
        col("v_empty"))
  }

  /** Grouped HLL: per-SOURCE distinct-token estimates — the shape a
    * 100 TB corpus report actually runs (per-domain vocabulary sizes
    * without a per-domain COUNT(DISTINCT token) shuffle). Same
    * fully-oracled md5 sketch as [[hllMd5]], keyed by `source`; the
    * register table is ≤ m rows per source, so the heavy token stream
    * collapses map-side into (source, bucket) maxes. */
  def hllBySource(spark: SparkSession, dir: String): DataFrame =
    hllEstimate(docs(spark, dir)
      .select(col("source").as("key"),
        explode(split(col("text"), " ")).as("v"))
      .filter(length(col("v")) > 0))
      .select(col("key").as("source"), col("n_exact"),
        col("hll_estimate"), col("v_empty"))
      .orderBy(col("source"))

  /** Oracle-side sketch template: `valsCte` must define vals(key, v);
    * emits (<keyAlias>, n_exact, hll_estimate, v_empty) per key. */
  private def hllSqlOver(valsCte: String, keyAlias: String): String = {
    val hexfold = (1 to 15).map(i =>
      s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1) * " +
        s"${math.pow(16, 15 - i).toLong}").mkString(" + ")
    s"""WITH vals AS (
       |  $valsCte),
       |hv AS (
       |  SELECT key, CAST($hexfold AS BIGINT) AS h
       |  FROM (SELECT key, md5(v) AS m FROM vals)),
       |rho AS (
       |  SELECT key, h // 281474976710656 AS bucket,
       |    CASE WHEN h % 281474976710656 = 0 THEN 49
       |      ELSE 49 - length(bin(h % 281474976710656)) END AS rho
       |  FROM hv),
       |regs AS (SELECT key, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2),
       |summ AS (
       |  SELECT key, COUNT(*) AS present,
       |    SUM(CAST((CAST(1 AS BIGINT) << CAST(62 - r AS INT))
       |      AS DECIMAL(38,0))) AS s_present
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT key, $HllM - present AS v_empty,
       |    CAST(s_present + CAST($HllM - present AS DECIMAL(38,0)) *
       |      CAST(4611686018427387904 AS DECIMAL(38,0)) AS DOUBLE) AS s_d
       |  FROM summ),
       |fin AS (
       |  SELECT key, v_empty,
       |    CASE WHEN (0.7213/(1+1.079/4096)) * 4096 * 4096 *
       |        CAST(4611686018427387904 AS DOUBLE) / s_d <= 2.5*4096
       |        AND v_empty > 0
       |      THEN 4096.0 * ln(4096.0 / v_empty)
       |      ELSE (0.7213/(1+1.079/4096)) * 4096 * 4096 *
       |        CAST(4611686018427387904 AS DOUBLE) / s_d END AS e
       |  FROM est),
       |ex AS (
       |  SELECT key, COUNT(DISTINCT v) AS n_exact FROM vals GROUP BY 1)
       |SELECT fin.key AS $keyAlias, ex.n_exact,
       |  CAST(round(e) AS BIGINT) AS hll_estimate, v_empty
       |FROM fin JOIN ex ON ex.key = fin.key
       |ORDER BY $keyAlias""".stripMargin
  }

  /** The `hll_distinct` catalog row, rebuilt on the md5-register
    * sketch so the driver can verify it (Spark's native
    * `approx_count_distinct` — kept as
    * [[RelationalQueries.hllDistinct]] with a SketchSpec error-bound
    * gate — hashes with an engine-private family the oracle can't
    * replay; r1–r5 it was the last legacy rows-only row). Key space is
    * (l_returnflag × {partkey, suppkey}) packed as `flag|column`, so
    * the same one-pass, ≤m-registers-per-key merge shape covers the
    * grouped-two-column report the old row produced. */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val vals = li.select(
        concat(col("l_returnflag"), lit("|partkey")).as("key"),
        col("l_partkey").cast("string").as("v"))
      .unionAll(li.select(
        concat(col("l_returnflag"), lit("|suppkey")).as("key"),
        col("l_suppkey").cast("string").as("v")))
    hllEstimate(vals)
      .select(substring_index(col("key"), "|", 1).as("l_returnflag"),
        substring_index(col("key"), "|", -1).as("column_name"),
        col("n_exact"), col("hll_estimate"), col("v_empty"))
      .orderBy(col("l_returnflag"), col("column_name"))
  }

  val hllDistinctSql: String = {
    val inner = hllSqlOver(
      """SELECT l_returnflag || '|partkey' AS key,
        |    CAST(l_partkey AS VARCHAR) AS v FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag || '|suppkey' AS key,
        |    CAST(l_suppkey AS VARCHAR) AS v FROM lineitem""".stripMargin,
      "k")
    s"""SELECT string_split(k, '|')[1] AS l_returnflag,
       |  string_split(k, '|')[2] AS column_name,
       |  n_exact, hll_estimate, v_empty
       |FROM ($inner) t
       |ORDER BY l_returnflag, column_name""".stripMargin
  }

  val hllMd5Sql: String = hllSqlOver(
    """SELECT 'user_id' AS key, CAST(user_id AS VARCHAR) AS v
      |  FROM events
      |  UNION ALL
      |  SELECT 'event_id' AS key, CAST(event_id AS VARCHAR) AS v
      |  FROM events""".stripMargin,
    "column_name")

  val hllBySourceSql: String = hllSqlOver(
    """SELECT source AS key, t.tok AS v
      |  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
      |  WHERE length(t.tok) > 0""".stripMargin,
    "source")
}
