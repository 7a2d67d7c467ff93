package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PcaOps

/** Exact fixed-point PCA: independent BigInt replay of the whole
  * pipeline, plus a convergence-quality gate the bit-exact oracle
  * cannot express (is the iterated direction actually the dominant
  * one?). */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  /** Raw quantized vectors, straight from parquet via an independent
    * path (no PcaOps code). */
  private lazy val xq: Array[Array[Long]] = {
    import spark.implicits._
    graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().sortBy(_._1)
      .map(_._2.map(x => math.round(x.toDouble * 1000000d)).toArray)
  }

  /** Independent BigInt covariance + reduction (mirrors the SPEC'd
    * algebra, not the engine code). */
  private lazy val cRef: Array[Array[Long]] = {
    val n = xq.length
    val d = PcaOps.Dim
    val t = Array.tabulate(d)(i => xq.map(v => BigInt(v(i))).sum)
    val c = Array.tabulate(d, d) { (i, j) =>
      val s = xq.map(v => BigInt(v(i)) * v(j)).sum
      s * n - t(i) * t(j)
    }
    val maxAbs = c.flatten.map(_.abs).max
    val scale = (maxAbs / PcaOps.VScale).max(BigInt(1))
    c.map(_.map { x =>
      val q = x.abs / scale
      (if (x >= 0) q else -q).toLong
    })
  }

  test("engine covariance reduction equals the BigInt replay") {
    val got = PcaOps.reducedCovariance(spark, dir)
    assert(got.length == PcaOps.Dim)
    (0 until PcaOps.Dim).foreach { i =>
      assert(got(i).toSeq == cRef(i).toSeq, s"row $i")
    }
  }

  test("embed_pca projections equal the replayed direction's dots") {
    val v = PcaOps.powerIterate(cRef)
    val got = PcaOps.embedPca(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == xq.length)
    xq.zipWithIndex.foreach { case (x, id) =>
      val want = x.iterator.zip(v.iterator).map { case (a, b) => a * b }.sum
      assert(got(id.toLong) == want, s"vec $id")
    }
  }

  test("the iterated direction is genuinely dominant: Rayleigh " +
    "quotient within 2% of a 200-round double-precision reference") {
    def rayleigh(c: Array[Array[Long]], v: Array[Double]): Double = {
      val cv = Array.tabulate(PcaOps.Dim)(i =>
        v.indices.map(j => c(i)(j).toDouble * v(j)).sum)
      v.indices.map(i => v(i) * cv(i)).sum /
        v.indices.map(i => v(i) * v(i)).sum
    }
    var ref = Array.fill(PcaOps.Dim)(1.0)
    (1 to 200).foreach { _ =>
      val w = Array.tabulate(PcaOps.Dim)(i =>
        ref.indices.map(j => cRef(i)(j).toDouble * ref(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      ref = w.map(_ / norm)
    }
    val got = PcaOps.powerIterate(cRef).map(_.toDouble)
    val rGot = rayleigh(cRef, got)
    val rRef = rayleigh(cRef, ref)
    assert(rRef > 0, "reference Rayleigh must be positive on a PSD matrix")
    assert(rGot >= 0.98 * rRef, s"rGot=$rGot vs rRef=$rRef")
  }

  test("projection centering: Σ_n proj_n equals the direction dotted " +
    "with the component sums (integer linearity end-to-end)") {
    val v = PcaOps.powerIterate(cRef)
    val projSum = PcaOps.embedPca(spark, dir).collect()
      .map(r => BigInt(r.getLong(2))).sum
    val want = (0 until PcaOps.Dim)
      .map(i => BigInt(v(i)) * xq.map(x => BigInt(x(i))).sum).sum
    assert(projSum == want)
  }
}
