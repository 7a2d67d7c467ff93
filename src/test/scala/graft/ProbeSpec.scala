package graft

import java.math.BigInteger

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.ProbeOps

/** Semantic + exactness gates for the nearest-centroid linear probe:
  * a planted linearly-separable corpus must be classified perfectly,
  * and the query's scores must equal an INDEPENDENT BigInteger replay
  * of the published procedure (cross-multiplied mean difference,
  * sign-split reduction, integer midpoint threshold) — the PcaSpec
  * replay discipline. */
class ProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private val Dim = ProbeOps.Dim

  /** Deterministic corpus: class 0 sits at +0.5 on dim 0, the rest at
    * −0.5, with small reproducible per-component jitter everywhere. */
  private def plantedVecs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val label = i % 5
      val off = if (label == ProbeOps.PosLabel) 0.5f else -0.5f
      val v = Array.tabulate(Dim) { j =>
        val jitter = ((i * 31 + j * 17) % 7 - 3) * 0.01f
        if (j == 0) off + jitter else jitter
      }
      (i.toLong, v, label)
    }.toDF("vec_id", "embedding", "label")
  }

  test("planted separable classes are classified perfectly and the " +
    "scores match an independent exact replay") {
    val df = plantedVecs(60)
    val out = ProbeOps.embedProbeOn(df).collect()
    assert(out.length == 60)
    out.foreach { case Row(_, label: Long, y: Int, _, pred: Int) =>
      assert((label == ProbeOps.PosLabel) == (y == 1))
      assert(pred == y, s"misclassified label=$label")
    }

    // independent replay from first principles (no ProbeOps calls);
    // Spark round() is HALF_UP away from zero, not rint's half-even
    def quant(f: Float): Long = {
      val v = f.toDouble * 1e6
      if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong
    }
    val rows = (0 until 60).map { i =>
      val label = i % 5
      val off = if (label == ProbeOps.PosLabel) 0.5f else -0.5f
      val x = Array.tabulate(Dim) { j =>
        val jitter = ((i * 31 + j * 17) % 7 - 3) * 0.01f
        quant(if (j == 0) off + jitter else jitter)
      }
      (i.toLong, label, x)
    }
    val pos = rows.filter(_._2 == ProbeOps.PosLabel)
    val neg = rows.filter(_._2 != ProbeOps.PosLabel)
    val (n1, n0) = (BigInteger.valueOf(pos.size), BigInteger.valueOf(neg.size))
    def colSum(rs: Seq[(Long, Int, Array[Long])], j: Int): BigInteger =
      rs.map(r => BigInteger.valueOf(r._3(j))).foldLeft(BigInteger.ZERO)(_ add _)
    val s1 = Array.tabulate(Dim)(colSum(pos, _))
    val s0 = Array.tabulate(Dim)(colSum(neg, _))
    val dRaw = Array.tabulate(Dim)(j =>
      n0.multiply(s1(j)).subtract(n1.multiply(s0(j))))
    val scale = dRaw.map(_.abs).max
      .divide(BigInteger.valueOf(ProbeOps.DScale)).max(BigInteger.ONE)
    val ds = dRaw.map(_.divide(scale).longValueExact())
    val a1 = (0 until Dim).map(j =>
      s1(j).multiply(BigInteger.valueOf(ds(j)))).reduce(_ add _)
    val a0 = (0 until Dim).map(j =>
      s0(j).multiply(BigInteger.valueOf(ds(j)))).reduce(_ add _)
    val theta = a1.divide(n1).add(a0.divide(n0))
      .divide(BigInteger.TWO).longValueExact()
    val expect = rows.map { case (id, _, x) =>
      id -> (0 until Dim).map(j => x(j) * ds(j)).sum
    }.toMap
    out.foreach { case Row(id: Long, _, _, score: Long, pred: Int) =>
      assert(score == expect(id), s"score replay diverged for vec $id")
      assert(pred == (if (score >= theta) 1 else 0))
    }
  }

  test("a single-class corpus degrades to the zero probe (total, " +
    "deterministic) instead of dividing by zero") {
    import spark.implicits._
    val df = (0 until 8).map(i =>
        (i.toLong, Array.fill(Dim)(0.1f * (i % 3)), ProbeOps.PosLabel))
      .toDF("vec_id", "embedding", "label")
    val out = ProbeOps.embedProbeOn(df).collect()
    assert(out.length == 8)
    out.foreach { case Row(_, _, _, score: Long, pred: Int) =>
      assert(score == 0L && pred == 1)
    }
  }

  test("margin_sample selects exactly the k least-certain vectors " +
    "(smallest |score - theta|, ties on vec_id) off the corpus probe") {
    import org.apache.spark.sql.functions.col
    val dir = SparkFixture.Sf0001
    val d = graft.sources.Tables.load(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull && col("label").isNotNull)
    val (ds, theta) = ProbeOps.trainCentroidProbe(d)
    val all = ProbeOps.scoreWithProbe(d, ds, theta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val ref = all
      .map { case (id, label, score) =>
        (id, label, score, math.abs(score - theta)) }
      .sortBy { case (id, _, _, m) => (m, id) }
      .take(ProbeOps.MarginSampleK)
      .sortBy(_._1).toSeq
    val got = ProbeOps.marginSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == ref)
    // selection optimality: no unselected vector is strictly more
    // uncertain than any selected one
    val chosen = got.map(_._1).toSet
    val maxSel = got.map(_._4).max
    all.filterNot(t => chosen.contains(t._1)).foreach { case (id, _, sc) =>
      assert(math.abs(sc - theta) >= maxSel,
        s"unselected $id is more uncertain than a selected vector")
    }
  }
}
