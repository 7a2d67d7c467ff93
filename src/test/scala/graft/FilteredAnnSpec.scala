package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** Filtered vector search: exactness at probes == cells, the filter
  * contract, and the pre- vs post-filtering distinction the operator
  * exists for. */
class FilteredAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  private lazy val vecs: Map[Long, (Int, Array[Long])] = {
    import spark.implicits._
    graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
      .map { case (id, l, v) =>
        id -> (l, v.map(x => math.round(x.toDouble * 1000000d)).toArray)
      }.toMap
  }

  private def cos(a: Array[Long], b: Array[Long]): Double = {
    val d = a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    d.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
      math.sqrt(b.map(x => x * x).sum.toDouble))
  }

  private def bruteFiltered(q: Long): Seq[Long] = {
    val (ql, qv) = vecs(q)
    vecs.toSeq.collect { case (c, (cl, cv)) if c != q && cl == ql =>
      c -> cos(qv, cv)
    }.sortBy { case (c, s) => (-s, c) }.take(SimilarityOps.K).map(_._1)
  }

  test("probes == cells: filtered IVF equals the filtered brute force") {
    val got = SimilarityOps.annIvfFiltered(spark, dir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3)).map(_.getLong(2)).toSeq
      }
    assert(got.keySet == (0L until SimilarityOps.QueryCount).toSet)
    got.foreach { case (q, cs) =>
      assert(cs == bruteFiltered(q), s"query $q")
    }
  }

  test("every result carries the query's own label") {
    SimilarityOps.annIvfFiltered(spark, dir).collect().foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) == vecs(q)._1.toLong, s"query $q label col")
      assert(vecs(r.getLong(2))._1 == vecs(q)._1, s"query $q result label")
    }
  }

  test("pre-filtering returns full k where post-filtering the " +
    "unfiltered top-k would come up short") {
    // for each query: how many of the UNFILTERED top-K share its label?
    val postFilterYield = (0L until SimilarityOps.QueryCount).map { q =>
      val (ql, qv) = vecs(q)
      val topk = vecs.toSeq.collect { case (c, (_, cv)) if c != q =>
        c -> cos(qv, cv)
      }.sortBy { case (c, s) => (-s, c) }.take(SimilarityOps.K)
      q -> topk.count { case (c, _) => vecs(c)._1 == ql }
    }.toMap
    // the corpus has several labels, so some query must lose results
    // to post-filtering — that query is the operator's reason to exist
    assert(postFilterYield.values.exists(_ < SimilarityOps.K),
      "fixture too easy: unfiltered top-k always label-pure")
    val got = SimilarityOps.annIvfFiltered(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    (0L until SimilarityOps.QueryCount).foreach { q =>
      assert(got(q) == SimilarityOps.K,
        s"query $q: pre-filtered search must still fill k")
    }
  }

  test("ann_matryoshka: the full-dimension leg is its own ground " +
    "truth (recall 10^6), every recall is a valid K-quantized ppm, " +
    "and all (dim, query) cells are present") {
    val rows = SimilarityOps.annMatryoshka(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dims = SimilarityOps.MatryoshkaDims.map(_.toLong).toSet
    assert(rows.length ==
      dims.size * SimilarityOps.QueryCount, "one row per (dim, query)")
    val valid = (0 to SimilarityOps.K)
      .map(o => 1000000L * o / SimilarityOps.K).toSet
    rows.foreach { case (d, q, rec) =>
      assert(dims.contains(d) && valid.contains(rec),
        s"($d, $q) recall $rec not a K-quantized ppm")
      if (d == 64L) assert(rec == 1000000L,
        s"query $q: the full-dim leg must have perfect recall")
    }
  }
}
