package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, SimilarityOps, TextAnalysis}
import graft.sources.Tables

/** Semantic pins for the round-5 ingest/QA operators: bloom-pruned
  * exact dedup, incremental ANN, embedding QA, cross-source quality
  * calibration and source diversity. Each oracled row also gets a
  * pure-Scala or un-optimized-DataFrame replay here so `sbt test`
  * catches a regression without the DuckDB differ. */
class IngestQaSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  // the HALF_UP fixed-point quantization Spark's round() applies
  private def quantize(v: Seq[Float]): Array[Long] =
    v.map(f => java.math.BigDecimal.valueOf(f.toDouble * 1000000d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong)
      .toArray

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  test("dedup_bloom equals the un-bloomed exact fingerprint join " +
    "(bloom prefilters admit every true duplicate)") {
    val got = DedupOps.dedupBloom(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: the same join with NO bloom pruning anywhere
    val fp = array_join(
      sort_array(array_distinct(split(col("text"), " "))), " ")
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), fp.as("fp"))
    val isNew = col("doc_id") % DedupOps.BloomMod === DedupOps.BloomRem
    val want = d.filter(isNew)
      .join(d.filter(!isNew).groupBy(col("fp"))
        .agg(count(lit(1)).as("n_live_copies")), Seq("fp"))
      .select(col("doc_id"), col("n_live_copies")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"bloom path diverged: missing=${want -- got}, extra=${got -- want}")
    assert(got.nonEmpty, "fixture has no cross-slice fingerprint dups")
  }

  test("dedup_bloom plan probes a bloom filter on BOTH join inputs") {
    val p = DedupOps.dedupBloom(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"no bloom probe in the plan:\n$p")
    assert("might_contain".r.findAllIn(p).size >= 2,
      s"expected bloom probes on batch AND live sides:\n$p")
    assert(p.contains("bloom_filter_agg"),
      s"bloom build aggregate missing from the plan:\n$p")
  }

  test("ann_ingest (probes == cells) equals brute-force batch×live " +
    "top-k; batch never matches batch") {
    val raw = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), quantize(r.getSeq[Float](1))))
    val isNew = (id: Long) =>
      id % SimilarityOps.IngestVecMod == SimilarityOps.IngestVecRem
    val live = raw.filter(x => !isNew(x._1))
    val want = raw.filter(x => isNew(x._1)).flatMap { case (qid, qv) =>
      live.map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }
        .take(SimilarityOps.K).zipWithIndex
        .map { case ((cid, c), i) => (qid, cid, i + 1L) -> c }
    }.toMap
    val got = SimilarityOps.annIngest(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(isNew(r.getLong(0)), s"query ${r.getLong(0)} not in batch")
      assert(!isNew(r.getLong(1)), s"candidate ${r.getLong(1)} not live")
      assert(want.contains(key), s"unexpected row $key")
      assert(r.getDouble(3) == want(key), s"cos mismatch at $key")
    }
  }

  test("embedding_qa equals a pure-Scala per-label replay") {
    val raw = Tables.load(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), quantize(r.getSeq[Float](1))))
    val want = raw.groupBy(_._1).map { case (label, vs) =>
      val n2s = vs.map { case (_, q) => q.map(x => x * x).sum }
      val dims = vs.map(_._2.length.toLong)
      label -> (vs.length.toLong, dims.min, dims.max,
        n2s.count(_ == 0L).toLong, n2s.min, n2s.max,
        n2s.sum / vs.length)
    }
    val got = SimilarityOps.embeddingQa(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, dmin, dmax, nz, nmin, nmax, navg) = want(r.getInt(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)) ==
        ((n, dmin, dmax, nz, nmin, nmax, navg)),
        s"label ${r.getInt(0)} mismatch")
    }
  }

  test("quality_calibrate pct_ppm equals the strictly-less count replay " +
    "and is bounded in [0, 1e6)") {
    val rows = TextAnalysis.qualityCalibrate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._2)
    rows.foreach { case (docId, src, ppm, pct) =>
      val peers = bySrc(src)
      val nLess = peers.count(_._3 < ppm).toLong
      val expect = 1000000L * nLess / peers.length
      assert(pct == expect, s"doc $docId: pct $pct != $expect")
      assert(pct >= 0L && pct < 1000000L, s"doc $docId pct out of range")
    }
    // ties share a percentile: equal scores within a source ⇒ equal pct
    bySrc.values.foreach { peers =>
      peers.groupBy(_._3).values.foreach { same =>
        assert(same.map(_._4).distinct.length == 1,
          "tied quality scores got different percentiles")
      }
    }
  }

  test("source_diversity equals a pure-Scala string-trigram replay " +
    "(the 64-bit trigram hash is collision-free here)") {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").toSeq))
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val toks = ds.flatMap(_._2)
      val tris = ds.flatMap { case (_, ts) =>
        if (ts.length < 3) Nil else ts.sliding(3).map(_.mkString(" "))
      }
      src -> (ds.length.toLong, toks.length.toLong,
        toks.distinct.length.toLong, tris.length.toLong,
        tris.distinct.length.toLong)
    }
    val got = TextAnalysis.sourceDiversity(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (nd, nt, ndt, ntr, ndtr) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == ((nd, nt, ndt, ntr, ndtr)),
        s"source ${r.getString(0)} count mismatch")
      assert(r.getLong(6) == 1000000L * ndt / nt)
      assert(r.getLong(7) == 1000000L * ndtr / ntr)
    }
  }

  private def ksOf(rows: Seq[(String, Long)]): Map[String, Long] = {
    import spark.implicits._
    TextAnalysis.ksBySource(rows.toDF("source", "n_chars"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
  }

  test("drift_ks is 0 for identically-distributed sources and 10^6 " +
    "for disjoint supports") {
    val same = ksOf(Seq("a", "b").flatMap(s =>
      Seq(10L, 20L, 20L, 30L).map(s -> _)))
    assert(same == Map("a" -> 0L, "b" -> 0L))
    val disjoint = ksOf(
      Seq(1L, 2L, 3L).map("lo" -> _) ++ Seq(90L, 95L).map("hi" -> _))
    assert(disjoint == Map("lo" -> 1000000L, "hi" -> 1000000L))
    // single source: no "rest" CDF to drift from — 0, never NULL
    val solo = ksOf(Seq(5L, 7L, 7L).map("only" -> _))
    assert(solo == Map("only" -> 0L))
  }

  test("drift_ks equals a pure-Scala leave-one-out KS replay on the " +
    "test corpus") {
    val d = Tables.load(spark, dir, "documents")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val support = d.map(_._2).distinct.sorted
    val n = d.length.toLong
    val want = d.groupBy(_._1).map { case (src, rows) =>
      val ns = rows.length.toLong
      val mine = rows.groupBy(_._2).view.mapValues(_.length.toLong)
      val byC = d.groupBy(_._2).view.mapValues(_.length.toLong)
      var (scum, gcum) = (0L, 0L)
      val dist = support.map { c =>
        scum += mine.getOrElse(c, 0L); gcum += byC(c)
        (BigInt(scum) * (n - ns) - BigInt(gcum - scum) * ns).abs
      }.max
      src -> (dist * 1000000 / (BigInt(ns) * (n - ns))).toLong
    }
    val got = ksOf(d.toSeq)
    assert(got == want)
  }

  test("events_drift_ks rides the same ksOfHist algebra: equals " +
    "ksBySource over the (event_type, value-cents) projection") {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
      .select(col("event_type"),
        org.apache.spark.sql.functions.round(col("value") * 100d)
          .cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = ksOf(e.toSeq)
    val got = operators.EventQueries.eventsDriftKs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
