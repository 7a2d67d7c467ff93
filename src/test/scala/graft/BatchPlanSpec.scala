package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PipelineOps, TextQueries}
import SparkFixture.spark

/** Length-bucketed batch planning: the rank-offsets engine path must
  * equal a pure-Scala window reference (bucket = bit-length, seeded
  * within-bucket order, BatchSize cuts, integer padding waste), and
  * the padding-waste invariants must hold. */
class BatchPlanSpec extends AnyFunSuite {

  private def refRows(dir: String)
    : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val (a, b) = TextQueries.sampleHashConstants(PipelineOps.BatchSeed)
    val p = TextQueries.SamplePrime
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val base = docs.map { case (id, t) =>
      val nTok = t.split(" ", -1).length.toLong
      val bucket = java.lang.Long.toBinaryString(nTok).length.toLong
      val h = ((id % p) * a + b) % p
      (id, nTok, bucket, h)
    }
    base.groupBy(_._3).toSeq.flatMap { case (bucket, rows) =>
      rows.sortBy { case (id, _, _, h) => (h, id) }.zipWithIndex
        .groupBy(_._2 / PipelineOps.BatchSize).map {
          case (batchId, members) =>
            val toks = members.map(_._1._2)
            val (n, mx, sm) = (toks.size.toLong, toks.max, toks.sum)
            (bucket, batchId.toLong, n, mx, sm,
              1000000L * (n * mx - sm) / (n * mx))
        }
    }.sortBy(r => (r._1, r._2))
  }

  test("engine batch plan equals the pure-Scala window reference on " +
    "the corpus (rank-offsets path == per-bucket row_number)") {
    val dir = SparkFixture.Sf0001
    val got = PipelineOps.batchPlan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == refRows(dir))
  }

  test("plan invariants: batches hold <= BatchSize docs, every batch " +
    "max equals some member length (waste 0 iff uniform), buckets " +
    "partition the corpus") {
    val dir = SparkFixture.Sf0001
    val rows = PipelineOps.batchPlan(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mx, sm, waste) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n >= 1 && n <= PipelineOps.BatchSize)
      assert(sm <= n * mx && sm >= mx)
      assert(waste == 1000000L * (n * mx - sm) / (n * mx))
      // bit-length bucketing bounds the within-batch spread: max < 2^b,
      // every member >= 2^(b-1), so waste < 50% + slack for short tails
      if (n == PipelineOps.BatchSize) assert(waste <= 500000L)
    }
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
  }
}
