package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextAnalysis, TextQueries}
import SparkFixture.spark

/** Cluster-aware split: the doc-hash rule leaks near-dup pairs across
  * splits, the cluster-hash rule provably cannot; both counters are
  * replayed in plain Scala on a planted cluster structure. */
class SplitLeakageSpec extends AnyFunSuite {

  import spark.implicits._

  // planted graph: {10,20,30} one cluster (keep 10), {40,50} a second
  // (keep 40), 60/70 singletons (no label row — the left-join path)
  private val docIds = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L)
  private val labels = Seq((10L, 10L), (20L, 10L), (30L, 10L),
    (40L, 40L), (50L, 40L))
  private val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L))

  private def splitOf(id: Long): String = {
    val (a, b) = TextQueries.sampleHashConstants(11L)
    val p = TextQueries.SamplePrime
    val h = ((id % p) * a + b) % p % 1000000L
    if (h < 900000L) "train" else if (h < 950000L) "val" else "test"
  }

  test("cluster-hash split never straddles a near-dup pair; doc-hash " +
    "straddles exactly the hash-replayed reference count") {
    val cluster = Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      40L -> 40L, 50L -> 40L, 60L -> 60L, 70L -> 70L)
    val refDocStraddle = pairs.count { case (i, j) =>
      splitOf(i) != splitOf(j)
    }.toLong
    val refCounts = docIds.groupBy(id => splitOf(id))
      .map { case (k, v) => k -> v.size.toLong }
    val refClCounts = docIds.groupBy(id => splitOf(cluster(id)))
      .map { case (k, v) => k -> v.size.toLong }
    val rows = TextAnalysis.splitLeakageOf(
        docIds.toDF("doc_id"), labels.toDF("doc_id", "keep_id"),
        pairs.toDF("i", "j"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (dTr, dVa, dTe, dSt) = rows("doc_hash")
    assert((dTr, dVa, dTe) == (refCounts.getOrElse("train", 0L),
      refCounts.getOrElse("val", 0L), refCounts.getOrElse("test", 0L)))
    assert(dSt == refDocStraddle)
    val (cTr, cVa, cTe, cSt) = rows("cluster_hash")
    assert((cTr, cVa, cTe) == (refClCounts.getOrElse("train", 0L),
      refClCounts.getOrElse("val", 0L), refClCounts.getOrElse("test", 0L)))
    assert(cSt == 0L, "same cluster => same hash input => same split")
  }

  test("registered row on the corpus: cluster_hash straddle is zero " +
    "over a NON-EMPTY pair list, and both kinds partition the corpus") {
    val dir = SparkFixture.Sf0001
    val nPairs = graft.operators.DedupOps.dedupJaccard(spark, dir).count()
    val rows = TextAnalysis.splitLeakage(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    val (dTr, dVa, dTe, _) = rows("doc_hash")
    val (cTr, cVa, cTe, cSt) = rows("cluster_hash")
    assert(dTr + dVa + dTe == nDocs && cTr + cVa + cTe == nDocs)
    assert(cSt == 0L)
    assert(nPairs > 0L, "vacuous corpus: no near-dup pairs at sf0.001")
  }
}
