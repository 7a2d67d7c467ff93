package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{SketchOps, TextAnalysis}

/** Misra-Gries heavy hitters + split/filter operators on planted data
  * the synthetic corpus can't produce (Zipf skew, vocab ≫ k). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val sf = "/root/testdata/sf0.001"

  /** Zipf-ish stream: key i appears ~N/(i+1) times, vocab 500 ≫ k. */
  private def zipfStream(n: Int, vocab: Int, seed: Int): Seq[String] = {
    val rng = new scala.util.Random(seed)
    // inverse-CDF over harmonic weights
    val w = (1 to vocab).map(1.0 / _)
    val cum = w.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    (1 to n).map { _ =>
      val u = rng.nextDouble() * total
      "k" + cum.indexWhere(u <= _)
    }
  }

  test("MG kernel: undercount bound and no-false-negative under eviction") {
    val k = 16
    val stream = zipfStream(20000, 500, seed = 1)
    val n = stream.size
    val mg = new SketchOps.MisraGries(k)
    stream.foreach(mg.add)
    val est = mg.result.toMap
    assert(est.size <= k)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // vocab ≫ k forces eviction: the summary cannot hold everything
    assert(truth.size > k)
    // undercount bound: est ∈ [true − N/(k+1), true]
    est.foreach { case (w, e) =>
      assert(e <= truth(w), s"$w overcounted")
      assert(e >= truth(w) - n / (k + 1), s"$w undercount exceeds bound")
    }
    // every true heavy hitter survives
    truth.filter { case (_, c) => c * (k + 1) > n }.keys.foreach { w =>
      assert(est.contains(w), s"heavy key $w evicted")
    }
  }

  test("heavyHittersOver == exact heavy set on a skewed planted stream") {
    import spark.implicits._
    val stream = zipfStream(30000, 300, seed = 2)
    val n = stream.size
    val k = 24
    val got = SketchOps
      .heavyHittersOver(stream.toDF("w").repartition(8), k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }
      .toSeq.sortBy { case (w, c) => (-c, w) }
    assert(got.toSeq == want)
    assert(want.nonEmpty)
  }

  test("train_val_split: deterministic, ~90/5/5, per-doc stable") {
    val df = TextAnalysis.trainValSplit(spark, sf)
    val a = df.collect().map(_.toSeq)
    val b = TextAnalysis.trainValSplit(spark, sf).collect().map(_.toSeq)
    assert(a.sameElements(b))
    val bySplit = df.groupBy("split").sum("n_docs").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum.toDouble
    assert(math.abs(bySplit("train") / total - 0.90) < 0.03)
    assert(math.abs(bySplit.getOrElse("val", 0L) / total - 0.05) < 0.03)
    assert(math.abs(bySplit.getOrElse("test", 0L) / total - 0.05) < 0.03)
    // per-doc stability: the hash is a pure function of doc_id, so the
    // same id lands in the same split under any corpus subset
    val (ha, hb) = graft.operators.TextQueries.sampleHashConstants(11L)
    val p = graft.operators.TextQueries.SamplePrime
    def split(id: Long): String = {
      val h = ((id % p) * ha + hb) % p % 1000000L
      if (h < 900000L) "train" else if (h < 950000L) "val" else "test"
    }
    assert(split(17L) == split(17L))
    val counts = (0L until 100000L).map(split).groupBy(identity)
    assert(math.abs(counts("train").size / 100000.0 - 0.9) < 0.01)
  }

  test("ppl_filter: exact p75 quantile_disc semantics with ties kept") {
    val ppl = TextAnalysis.docPerplexity(spark, sf)
      .select("doc_id", "avg_nll_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = ppl.length
    val sorted = ppl.map(_._2).sorted
    val thr = sorted((3 * n + 3) / 4 - 1) // min v with 4·cum ≥ 3n
    val want = ppl.filter(_._2 <= thr).map(_._1).sorted
    val got = TextAnalysis.pplFilter(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq == want.toSeq)
    assert(want.length >= (3 * n) / 4)           // covers the quota
    assert(ppl.count(_._2 < thr) * 4 < 3 * n + 4) // threshold minimal
  }

  test("hll_md5: estimates land within the sketch error bound") {
    val rows = SketchOps.hllMd5(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { case (c, (exact, est, vEmpty)) =>
      // 1.04/sqrt(4096) ≈ 1.6% std error; allow 5σ ≈ 8%
      val err = math.abs(est - exact).toDouble / exact
      assert(err <= 0.08, s"$c: exact=$exact est=$est err=$err")
      assert(vEmpty >= 0 && vEmpty <= SketchOps.HllM)
    }
    // user_id (n ≪ m) must sit deep in the linear-counting regime
    // (most buckets empty); event_id carries real cardinality
    assert(rows("user_id")._3 > SketchOps.HllM / 2,
      "small-cardinality column should leave most buckets empty")
    assert(rows("event_id")._1 > 2 * rows("user_id")._1)
  }

  test("hll_distinct (md5 family): per-returnflag estimates within the " +
    "5-sigma sketch bound, two columns per flag") {
    val rows = SketchOps.hllDistinct(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.nonEmpty)
    assert(rows.keys.map(_._2).toSet == Set("partkey", "suppkey"))
    rows.foreach { case ((flag, c), (exact, est, vEmpty)) =>
      val err = math.abs(est - exact).toDouble / exact
      assert(err <= 0.08, s"$flag/$c: exact=$exact est=$est err=$err")
      assert(vEmpty >= 0 && vEmpty <= SketchOps.HllM)
    }
  }

  test("hllEstimate is duplication-invariant (r14: one distinct pass " +
    "feeds both legs — registers over distinct == registers over raw)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, lit, sequence}
    val base = Seq("a" -> "x", "a" -> "y", "a" -> "z", "b" -> "x")
      .toDF("key", "v")
    // every row duplicated 1..7x: estimates, exact counts and empty-
    // bucket counts must be BYTE-identical to the unduplicated input
    val dup = base.withColumn("r",
        explode(sequence(lit(1), (col("v").substr(1, 1) === "x")
          .cast("int") * 6 + 1)))
      .select(col("key"), col("v"))
    val one = SketchOps.hllEstimate(base).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val many = SketchOps.hllEstimate(dup).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(one === many)
    assert(one("a")._1 === 3L && one("b")._1 === 1L) // n_exact
  }
}
