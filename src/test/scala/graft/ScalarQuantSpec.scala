package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ScalarQuantOps, SimilarityOps}

/** Int8 scalar quantization: error bound, scale-invariance of the
  * code-space cosine, and shortlist≥N ≡ brute-force equivalence. */
class ScalarQuantSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  test("reconstruction error is bounded by scale/2 on every vector") {
    val rows = ScalarQuantOps.embedQuantize(spark, dir)
      .select("vec_id", "scale", "err_max").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1); val err = r.getDouble(2)
      // floor(x/scale + 0.5) is within half a code step of x/scale;
      // the tiny epsilon covers the double multiply in err itself
      assert(err <= scale / 2 + 1e-12,
        s"vec ${r.getLong(0)}: err=$err scale=$scale")
    }
  }

  test("int8 codes stay in [-127, 127]") {
    import spark.implicits._
    val mx = ScalarQuantOps.embedQuantize(spark, dir)
      .selectExpr("array_max(transform(qvec, x -> abs(x))) AS m")
      .as[Int].collect()
    assert(mx.forall(_ <= 127))
    assert(mx.exists(_ == 127)) // absmax scaling always hits the rail
  }

  test("with shortlist >= N, ann_int8 equals brute-force ann_topk " +
    "exactly (the re-rank sees every candidate)") {
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count().toInt
    val viaQuant = ScalarQuantOps.annInt8(spark, dir, shortlist = n)
      .collect().toSeq
    val brute = SimilarityOps.annTopK(spark, dir).collect().toSeq
    assert(viaQuant == brute)
  }

  test("embed_project replays pure-Scala: proj_j = sum_i q_i * sign(i,j) " +
    "over the md5-derived sign matrix") {
    val signs = ScalarQuantOps.signMatrix(ScalarQuantOps.Dim,
      ScalarQuantOps.ProjDim)
    val rows = ScalarQuantOps.embedProject(spark, dir)
      .join(ScalarQuantOps.embedQuantize(spark, dir)
        .select("vec_id", "qvec"), "vec_id")
      .select("vec_id", "qvec", "proj").collect()
    assert(rows.length > 100)
    rows.foreach { r =>
      val q = r.getSeq[Int](1)
      val got = r.getSeq[Long](2)
      val want = signs.map(row => row.iterator.zip(q.iterator)
        .map { case (s, qi) => s * qi }.sum)
      assert(got == want, s"vec ${r.getLong(0)}")
    }
  }

  test("embed_project is linear over code vectors: P(u + v) = Pu + Pv " +
    "in exact integer arithmetic") {
    val signs = ScalarQuantOps.signMatrix(ScalarQuantOps.Dim,
      ScalarQuantOps.ProjDim)
    def proj(q: Seq[Long]): Seq[Long] =
      signs.map(row => row.iterator.zip(q.iterator)
        .map { case (s, qi) => s * qi }.sum)
    val qs = ScalarQuantOps.embedQuantize(spark, dir)
      .select("qvec").limit(10).collect()
      .map(_.getSeq[Int](0).map(_.toLong))
    for (Seq(u, v) <- qs.toSeq.sliding(2)) {
      val sumVec = u.zip(v).map { case (a, b) => a + b }
      assert(proj(sumVec) ==
        proj(u).zip(proj(v)).map { case (a, b) => a + b })
    }
  }

  test("embed_project preserves squared norms in expectation " +
    "(JL contract: mean of ||Pu||^2 / (k*||u||^2) within ±10%)") {
    val rows = ScalarQuantOps.embedProject(spark, dir)
      .join(ScalarQuantOps.embedQuantize(spark, dir)
        .select("vec_id", "qvec"), "vec_id")
      .select("qvec", "proj").collect()
    val ratios = rows.map { r =>
      val q = r.getSeq[Int](0).map(x => x.toDouble * x).sum
      val p = r.getSeq[Long](1).map(x => x.toDouble * x).sum
      p / (ScalarQuantOps.ProjDim * q)
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.9 && mean < 1.1, s"mean norm ratio $mean")
    // per-vector spread follows chi^2_k/k; k=16 keeps it inside [0.05, 4]
    assert(ratios.forall(r => r > 0.05 && r < 4.0))
  }

  test("projected cosine correlates with true int8-code cosine on a " +
    "fixed pair sample (coarse-filter utility floor)") {
    val rows = ScalarQuantOps.embedProject(spark, dir)
      .join(ScalarQuantOps.embedQuantize(spark, dir)
        .select("vec_id", "qvec"), "vec_id")
      .orderBy("vec_id")
      .select("qvec", "proj").collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val q = rows.map(_.getSeq[Int](0).map(_.toDouble))
    val p = rows.map(_.getSeq[Long](1).map(_.toDouble))
    // deterministic pair sample: strides through the corpus
    val pairs = for (s <- Seq(1, 7, 37, 101); i <- q.indices
                     if i + s < q.length) yield (i, i + s)
    val xs = pairs.map { case (i, j) => cos(q(i), q(j)) }
    val ys = pairs.map { case (i, j) => cos(p(i), p(j)) }
    def mean(v: Seq[Double]) = v.sum / v.length
    val (mx, my) = (mean(xs), mean(ys))
    val covAndVars = xs.zip(ys).foldLeft((0d, 0d, 0d)) {
      case ((c, vx, vy), (x, y)) =>
        (c + (x - mx) * (y - my), vx + (x - mx) * (x - mx),
          vy + (y - my) * (y - my))
    }
    val pearson = covAndVars._1 /
      math.sqrt(covAndVars._2 * covAndVars._3)
    // measured 0.43 at k=16 on this corpus; 0.25 flags a broken matrix
    // (a sign bug drives it to ~0) without pinning corpus noise
    assert(pearson > 0.25, s"pearson $pearson")
  }

  test("production shortlist keeps full recall@K on the test corpus") {
    val got = ScalarQuantOps.annInt8(spark, dir)
      .select("q_vec_id", "c_vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = SimilarityOps.annTopK(spark, dir)
      .select("q_vec_id", "c_vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & want).size.toDouble / want.size
    // int8 cosine ranks this corpus' true top-3 inside a 9-candidate
    // shortlist; if the corpus shifts, this floor flags it
    assert(recall >= 0.9, s"recall@${SimilarityOps.K} = $recall")
  }
}
