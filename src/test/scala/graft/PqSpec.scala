package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ClusterOps, PqOps}

/** Semantic gates for product-quantization ANN. The DuckDB differ
  * proves cross-engine equality of the registered row; these prove the
  * ENGINE side computes the published algorithm (pure-Scala full-chain
  * replay: codebooks → codes → ADC shortlist → exact re-rank), pin the
  * measured recall of the registered configuration on the fixture, and
  * pin the exactness property that a shortlist covering the corpus
  * reduces PQ to brute-force L2 (the ann_ivf probes==cells analog). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  private def quantized: Array[(Long, Array[Long])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map { r =>
        r.getAs[Long]("vec_id") ->
          r.getSeq[Float](r.fieldIndex("embedding")).toArray
            .map(x => math.round(x.toDouble * 1000000d) + ClusterOps.Shift)
      }.sortBy(_._1)

  private def dist(v: Array[Long], c: Array[Long]): Long =
    v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Pure-Scala replay of the ENTIRE registered chain. */
  private def replay(): Seq[(Long, Long, Long, Long)] = {
    val q = quantized
    val qMap = q.toMap
    val (a, b) = operators.TextQueries.sampleHashConstants(PqOps.Seed)
    val p = operators.TextQueries.SamplePrime
    def hk(id: Long): Long = Math.floorMod(Math.floorMod(id, p) * a + b, p)
    // per-subspace integer Lloyd → codes + final codebooks
    val subs = (0 until PqOps.M).map { sub =>
      val sv = q.map { case (id, v) =>
        id -> v.slice(sub * PqOps.SubDim, (sub + 1) * PqOps.SubDim)
      }
      val svMap = sv.toMap
      var cents: Map[Int, Array[Long]] =
        sv.sortBy { case (id, _) => (hk(id), id) }
          .take(PqOps.Ks).zipWithIndex
          .map { case ((_, v), cl) => cl -> v.clone }.toMap
      var codes: Map[Long, Int] = Map.empty
      for (i <- 1 to PqOps.PqIters) {
        codes = sv.map { case (id, v) =>
          id -> cents.toSeq.map { case (cl, c) => (dist(v, c), cl) }.min._2
        }.toMap
        if (i < PqOps.PqIters) {
          cents = codes.groupBy(_._2).map { case (cl, m) =>
            val members = m.keys.toSeq.map(svMap)
            cl -> Array.tabulate(PqOps.SubDim) { d =>
              members.map(_(d)).sum / members.size
            }
          }
        }
      }
      (codes, cents)
    }
    // ADC shortlist + exact re-rank per query
    q.map(_._1).filter(_ < PqOps.QueryCount).sorted.toSeq.flatMap { qid =>
      val qv = qMap(qid)
      val adc = q.map(_._1).filter(_ != qid).map { cid =>
        cid -> (0 until PqOps.M).map { sub =>
          val qsub = qv.slice(sub * PqOps.SubDim, (sub + 1) * PqOps.SubDim)
          dist(qsub, subs(sub)._2(subs(sub)._1(cid)))
        }.sum
      }
      val short = adc.sortBy { case (cid, d) => (d, cid) }
        .take(PqOps.Shortlist).map(_._1)
      short.map(cid => cid -> dist(qv, qMap(cid)))
        .sortBy { case (cid, d) => (d, cid) }.take(PqOps.K).zipWithIndex
        .map { case ((cid, d2), i) => (qid, cid, (i + 1).toLong, d2) }
    }
  }

  test("pq_topk equals a pure-Scala replay of the full PQ chain " +
    "(codebooks, codes, ADC shortlist, exact re-rank)") {
    val want = replay()
    val got = PqOps.pqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }

  test("pq_topk recall@3 vs brute-force L2 is the measured 19/24 on " +
    "the fixture, every query >= 2/3") {
    val q = quantized
    val qMap = q.toMap
    val truth = q.map(_._1).filter(_ < PqOps.QueryCount).map { qid =>
      qid -> q.map(_._1).filter(_ != qid)
        .map(cid => cid -> dist(qMap(qid), qMap(cid)))
        .sortBy { case (cid, d) => (d, cid) }.take(PqOps.K).map(_._1).toSet
    }.toMap
    val got = PqOps.pqTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = truth.map { case (qid, t) => qid -> (t & got(qid)).size }
    assert(hits.values.forall(_ >= 2),
      s"a query fell below 2/3 recall: $hits")
    assert(hits.values.sum == 19,
      s"recall moved from the measured 19/24 — re-pin deliberately: $hits")
  }

  test("shortlist >= corpus makes PQ exactly brute-force L2 top-k") {
    val q = quantized
    val qMap = q.toMap
    val want = q.map(_._1).filter(_ < PqOps.QueryCount).sorted.toSeq
      .flatMap { qid =>
        q.map(_._1).filter(_ != qid)
          .map(cid => cid -> dist(qMap(qid), qMap(cid)))
          .sortBy { case (cid, d) => (d, cid) }.take(PqOps.K).zipWithIndex
          .map { case ((cid, d2), i) => (qid, cid, (i + 1).toLong, d2) }
      }
    val got = PqOps.pqTopK(spark, dir, shortlist = q.length).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }
}
