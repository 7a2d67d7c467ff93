package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupOps, TextAnalysis}
import SparkFixture.spark

/** Source card: the datasheet row must be EXACTLY its constituents —
  * every column equals the standalone oracled row's value for that
  * source, so the composition adds no arithmetic of its own. */
class SourceCardSpec extends AnyFunSuite {

  test("every source_card column matches its standalone constituent " +
    "row, and every corpus source is present") {
    val dir = SparkFixture.Sf0001
    val card = TextAnalysis.sourceCard(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val mix = TextAnalysis.domainMix(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val dup = DedupOps.ngramDupMass(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val ks = TextAnalysis.driftKs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val sources = graft.sources.Tables.load(spark, dir, "documents")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(card.keySet == sources, "one card row per corpus source")
    card.foreach { case (src, r) =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == mix(src),
        s"$src volume columns drift from domain_mix")
      assert(r.getLong(5) == dup(src), s"$src dup_rep_ppm drifts")
      assert(r.getLong(6) == ks(src), s"$src ks_ppm drifts")
      assert(r.getLong(7) >= 1L, s"$src n_langs must be positive")
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L,
        s"$src mean_quality_ppm out of range")
    }
  }
}
