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
