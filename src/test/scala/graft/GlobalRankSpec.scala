package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GlobalRank

/** The distributed rank-offsets job must equal the single-partition
  * window it replaces (r11: the SimHash/CMS vocab ranks moved off
  * `row_number().over(Window.orderBy(...))`). */
class GlobalRankSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  test("withRank1 equals row_number over the same total order on the " +
    "real vocabulary") {
    val vocab = graft.sources.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val viaWindow = vocab
      .withColumn("vid",
        row_number().over(Window.orderBy(col("tok"))).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaRank = GlobalRank.withRank1(vocab, "vid", col("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaRank.nonEmpty)
    assert(viaRank === viaWindow)
  }

  test("withRank0AndCount: rank is a 0-based permutation, count is " +
    "the relation size, and the result is partitioning-invariant") {
    import spark.implicits._
    val df = (0 until 257).map(i => ((i * 131) % 257).toLong)
      .toDF("k").repartition(7)
    val (ranked, n) = GlobalRank.withRank0AndCount(df, "r", col("k"))
    assert(n === 257L)
    val pairs = ranked.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.map(_._2).sorted.toSeq === (0L until 257L))
    // rank order == key order (k is a permutation of 0..256)
    pairs.foreach { case (k, r) => assert(k === r) }
  }

  test("empty input ranks to an empty frame with count 0") {
    import spark.implicits._
    val (ranked, n) = GlobalRank.withRank0AndCount(
      Seq.empty[Long].toDF("k"), "r", col("k"))
    assert(n === 0L)
    assert(ranked.count() === 0L)
  }

  test("withRunningSum equals sum().over(Window.orderBy) on a real " +
    "value histogram (the ppl_filter/events_gap_stats replacement)") {
    // the exact relation the r12 verdict #3 rewrite feeds it: a
    // (value, count) histogram with distinct keys — a total order
    val hist = graft.sources.Tables.load(spark, dir, "documents")
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val viaWindow = hist
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("v"))))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaJob = GlobalRank.withRunningSum(hist.repartition(5), "cum",
        col("c"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaJob.nonEmpty)
    assert(viaJob === viaWindow)
  }

  test("withRunningSum skips null values like sum() (r13 advice: the " +
    "helper is the designated drop-in for any sum().over(orderBy))") {
    import spark.implicits._
    val hist = Seq((1L, Some(2L)), (2L, None), (3L, Some(5L)),
      (4L, None), (5L, Some(1L)))
      .toDF("v", "c").repartition(3)
    val cum = GlobalRank.withRunningSum(hist, "cum", col("c"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // null contributes 0 and the row still appears, exactly as
    // sum(c).over(Window.orderBy(v)) treats it
    assert(cum === Map(1L -> 2L, 2L -> 2L, 3L -> 7L, 4L -> 7L, 5L -> 8L))
  }

  test("withRunningSum on an empty histogram is empty") {
    import spark.implicits._
    val out = GlobalRank.withRunningSum(
      Seq.empty[(Long, Long)].toDF("v", "c"), "cum", col("c"), col("v"))
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("v", "c", "cum"))
  }
}
