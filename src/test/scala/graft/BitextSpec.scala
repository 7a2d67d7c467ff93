package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BitextOps
import SparkFixture.spark

/** Margin-based mining: pure-Scala replay of the whole pipeline
  * (quantize → floor-q9 cosine → top-K sums → integer margin) and the
  * operator's reason to exist — a hub target outranks the true match
  * on raw cosine but is demoted by its own inflated neighborhood. */
class BitextSpec extends AnyFunSuite {

  import spark.implicits._

  private val srcVecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1f, 0f, 0f, 0f),            // the query x
    // hub attractors: aligned with the hub target, so its backward
    // neighborhood is dense and its bsum high
    2L -> Seq(0.80f, 0.42f, 0.42f, 0.10f),
    4L -> Seq(0.79f, 0.43f, 0.42f, 0.11f),
    6L -> Seq(0.81f, 0.41f, 0.43f, 0.09f),
    8L -> Seq(0.80f, 0.43f, 0.41f, 0.10f))
  private val tgtVecs: Seq[(Long, Seq[Float])] = Seq(
    1L -> Seq(0.80f, 0.42f, 0.42f, 0.10f), // hub: highest raw cos to x
    3L -> Seq(0.75f, 0f, 0f, 0.66f),       // true match: stands out
    5L -> Seq(0.20f, 0.90f, 0.10f, 0f),
    7L -> Seq(0.10f, 0.10f, 0.95f, 0f))

  // ---- pure-Scala replay of the registered semantics ----
  private def quant(v: Seq[Float]): Seq[Long] =
    v.map(x => math.round(x.toDouble * 1e6))
  private def q9(a: Seq[Long], b: Seq[Long]): Long = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
    val cos = dot / (math.sqrt(a.map(x => x * x).sum.toDouble) *
      math.sqrt(b.map(x => x * x).sum.toDouble))
    math.floor(cos * 1e9).toLong
  }

  private def reference(queryMax: Long)
    : Seq[(Long, Long, Long, Long, Long)] = {
    val k = BitextOps.MarginK
    val sq = srcVecs.map { case (id, v) => id -> quant(v) }
    val tq = tgtVecs.map { case (id, v) => id -> quant(v) }
    val queries = sq.filter(_._1 < queryMax)
    val fwd = queries.flatMap { case (qi, qv) =>
      tq.map { case (ti, tv) => (qi, ti, q9(qv, tv)) }
        .sortBy { case (_, ti, c) => (-c, ti) }.take(k)
    }
    val asum = fwd.groupBy(_._1).map { case (q, l) => q -> l.map(_._3).sum }
    val bsum = fwd.map(_._2).distinct.map { ti =>
      val tv = tq.find(_._1 == ti).get._2
      ti -> sq.map { case (si, sv) => (si, q9(tv, sv)) }
        .sortBy { case (si, c) => (-c, si) }.take(k).map(_._2).sum
    }.toMap
    fwd.filter { case (q, t, c) => c > 0 && asum(q) + bsum(t) > 0 }
      .map { case (q, t, c) =>
        (q, t, c, 1000000L * 2 * k * c / (asum(q) + bsum(t)))
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, t, _, m) => (-m, t) }.zipWithIndex
          .map { case ((q, t, c, m), i) => (q, t, i + 1L, c, m) }
      }.sortBy(r => (r._1, r._3))
  }

  private def engine(queryMax: Long): Seq[(Long, Long, Long, Long, Long)] =
    BitextOps.marginOf(
        srcVecs.toDF("id", "vec"), tgtVecs.toDF("id", "vec"), queryMax)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("engine margin pipeline equals the pure-Scala replay exactly " +
    "(quantize, floor-q9 cosine, top-K integer sums, truncating DIV)") {
    assert(engine(1L) == reference(1L))
  }

  test("hub demotion: the hub wins on raw cosine but the true match " +
    "wins on margin — the Artetxe-Schwenk flip") {
    val ref = reference(1L)
    // plant sanity on the replay itself: hub (id 1) has the highest
    // raw cosine to the query...
    val byCos = ref.sortBy(r => -r._4)
    assert(byCos.head._2 == 1L, s"hub must top raw cosine: $byCos")
    // ...but the true match (id 3) outranks it on margin
    val rank1 = ref.find(_._3 == 1L).get
    assert(rank1._2 == 3L, s"margin must promote the true match: $ref")
    // and the engine agrees
    val got = engine(1L)
    assert(got.find(_._3 == 1L).get._2 == 3L)
  }
}
