package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityOps

/** MMR re-rank: pure-Scala greedy replay over the collected candidate
  * pool, plus the diversification property the score formula exists
  * for. */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  /** (q -> (c -> rel)), (q -> ((c1,c2) -> sim)) recomputed
    * independently from raw embeddings. */
  private lazy val (relM, simM) = {
    import spark.implicits._
    val vecs = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toMap
      .map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1000000d)).toArray
      }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
      d.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val rel = (0L until SimilarityOps.QueryCount).map { q =>
      val pool = vecs.keys.filter(_ != q).toSeq
        .map(c => c -> cos(vecs(q), vecs(c)))
        .sortBy { case (c, r) => (-r, c) }
        .take(SimilarityOps.MmrCand)
      q -> pool.toMap
    }.toMap
    val sim = rel.map { case (q, pool) =>
      val cs = pool.keys.toSeq
      q -> (for (a <- cs; b <- cs if a != b)
        yield (a, b) -> cos(vecs(a), vecs(b))).toMap
    }
    (rel, sim)
  }

  private def greedy(q: Long): Seq[(Long, Double)] = {
    val pool = relM(q)
    var sel = Vector.empty[(Long, Double)]
    (1 to SimilarityOps.MmrK).foreach { r =>
      val remaining = pool.keys.filterNot(c => sel.exists(_._1 == c))
      val scored = remaining.map { c =>
        val score =
          if (r == 1) pool(c)
          else SimilarityOps.MmrLambda * pool(c) -
            (1 - SimilarityOps.MmrLambda) *
              sel.map(s => simM(q)((c, s._1))).max
        c -> score
      }.toSeq.sortBy { case (c, s) => (-s, c) }
      sel :+= scored.head
    }
    sel
  }

  test("engine MMR trace equals the pure-Scala greedy replay") {
    val got = SimilarityOps.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == SimilarityOps.QueryCount * SimilarityOps.MmrK)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val want = greedy(q)
      rows.sortBy(_._3).zip(want).zipWithIndex.foreach {
        case (((qq, c, round, score), (wc, ws)), idx) =>
          assert(c == wc, s"q=$q round=${idx + 1}: picked $c, want $wc")
          assert(math.abs(score - ws) < 1e-12, s"q=$q round=${idx + 1}")
      }
    }
  }

  test("MMR diversifies: average within-set max pairwise similarity " +
    "does not exceed plain top-k's, and at least one query differs") {
    def maxPairSim(q: Long, set: Seq[Long]): Double =
      (for (a <- set; b <- set if a != b) yield simM(q)((a, b)))
        .foldLeft(0.0)(math.max)
    val mmrSets = (0L until SimilarityOps.QueryCount)
      .map(q => q -> greedy(q).map(_._1)).toMap
    val topSets = (0L until SimilarityOps.QueryCount).map { q =>
      q -> relM(q).toSeq.sortBy { case (c, r) => (-r, c) }
        .take(SimilarityOps.MmrK).map(_._1)
    }.toMap
    val mmrAvg = mmrSets.map { case (q, s) => maxPairSim(q, s) }.sum
    val topAvg = topSets.map { case (q, s) => maxPairSim(q, s) }.sum
    assert(mmrAvg <= topAvg + 1e-12,
      s"diversified sets are MORE self-similar: $mmrAvg vs $topAvg")
    assert((0L until SimilarityOps.QueryCount)
      .exists(q => mmrSets(q) != topSets(q)),
      "lambda < 1 should change at least one query's selection")
  }
}
