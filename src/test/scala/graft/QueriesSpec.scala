package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Smoke + semantic checks for every SparkEntry query at sf0.001.
  * Deep correctness is the DuckDB differ (tools/check.py / driver t2);
  * these pin cheap invariants so `sbt test` catches regressions fast. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  test("every registered query returns rows and a nonempty schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries entry: $missing")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 aggregates partition-independently (4 vs 1 shuffle partitions)") {
    val a = operators.RelationalQueries.q1Agg(spark, dir).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val b = operators.RelationalQueries.q1Agg(spark, dir).collect().toSeq
      assert(a == b, "aggregation result depends on partitioning")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("word_freq total equals wc word count") {
    val total = operators.TextQueries.wordFreq(spark, dir)
      .agg(sum("n")).collect()(0).getLong(0)
    val words = operators.TextQueries.wc(spark, dir)
      .collect()(0).getAs[Long]("words")
    assert(total == words)
  }

  test("next_word_stats pct sums to 1 per prev_word") {
    val bad = operators.TextQueries.nextWordStats(spark, dir)
      .groupBy(col("prev_word")).agg(sum(col("pct")).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9)
      .count()
    assert(bad == 0)
  }

  test("most_used_word excludes stop words") {
    val w = operators.TextQueries.mostUsedWord(spark, dir)
      .collect()(0).getAs[String]("word")
    assert(!operators.TextQueries.StopWords.contains(w))
  }

  test("seeded_sample: deterministic per seed, different across seeds") {
    val run1 = operators.TextQueries.seededSample(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    val run2 = operators.TextQueries.seededSample(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(run1 == run2, "same seed must reproduce the same sample")
    assert(run1.length == 25)
    val other = operators.TextQueries.seededSample(spark, dir, seed = 7L)
      .collect().map(_.getLong(0)).toSeq
    assert(other != run1, "different seed should draw a different sample")
  }

  test("hll_distinct tracks exact distinct within 5% per group") {
    val approx = operators.RelationalQueries.hllDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = operators.RelationalQueries.q6Distinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05,
        s"group $k: approx ${approx(k)} vs exact $e")
    }
  }

  test("events_quantiles honors the GK rank-error bound per group") {
    val acc = 10000
    val approx = operators.EventQueries.eventsQuantiles(spark, dir, acc)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val byType = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    approx.foreach { case (tpe, (n, ps)) =>
      val sorted = byType(tpe)
      assert(n == sorted.length)
      Seq(0.5, 0.95, 0.99).zip(ps).foreach { case (q, v) =>
        // GK contract: returned value's rank within n/accuracy of q·n
        val eps = sorted.length.toDouble / acc + 1
        val lo = math.max(0, math.floor(q * sorted.length - eps).toInt)
        val hi = math.min(sorted.length - 1,
          math.ceil(q * sorted.length + eps).toInt)
        assert(v >= sorted(lo) && v <= sorted(hi),
          s"$tpe p$q=$v outside [${sorted(lo)}, ${sorted(hi)}]")
      }
    }
  }

  test("mix_sample keeps the max-token source whole and thins larger shares") {
    val df = operators.TextAnalysis.mixSample(spark, dir)
    val rates = df.select(col("source"), col("rate_ppm")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.values.forall(r => r > 0L && r <= 1000000L))
    assert(rates.values.max == 1000000L,
      "the min-token source must pass through unsampled")
    // within a source the kept fraction tracks rate_ppm loosely
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val per = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = df.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rates.foreach { case (s, r) =>
      if (r == 1000000L)
        assert(kept(s) == per(s), s"rate-1.0 source $s lost docs")
    }
    // determinism: same seed, same sample
    val again = operators.TextAnalysis.mixSample(spark, dir)
    assert(df.collect().toSeq == again.collect().toSeq)
  }

  test("q10 argmin picks the minimum price per part") {
    val df = operators.RelationalQueries.q10Argmin(spark, dir)
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val expect = li.groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice")).as("p"))
    val joined = df.join(expect, Seq("l_partkey"))
      .filter(col("best_price") =!= col("p")).count()
    assert(joined == 0)
  }
}
