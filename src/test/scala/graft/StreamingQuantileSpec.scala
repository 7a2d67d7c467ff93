package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventQueries
import graft.streaming.EventStreaming

/** Streaming exact-histogram quantiles vs the batch ground truth.
  * The operator's exactness contract is order-independence of the
  * histogram state: every snapshot must equal the batch answer over
  * the data seen so far, regardless of micro-batch slicing. */
class StreamingQuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  private def latestSnapshots(table: String): Map[String, (Long, Long, Long, Long)] =
    spark.table(table)
      .groupBy("event_type")
      .agg(last("n_events").as("n"), last("p50_cents").as("p50"),
        last("p95_cents").as("p95"), last("p99_cents").as("p99"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  private def batchTruth: Map[String, (Long, Long, Long, Long)] =
    EventQueries.eventsQuantilesExact(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toMap

  test("streaming quantiles equal the exact batch quantiles") {
    val d = java.nio.file.Files.createTempDirectory("graft-q-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    val q = EventStreaming.quantileStream(spark, d.toString)
      .writeStream.outputMode("update")
      .format("memory").queryName("q_out").start()
    try {
      q.processAllAvailable()
      assert(latestSnapshots("q_out") == batchTruth)
    } finally q.stop()
  }

  test("incremental snapshots converge to batch truth (2-chunk replay)") {
    // split the events into two landing files by event_id parity and
    // deliver them as separate micro-batches: the FINAL snapshot must
    // still equal the one-shot batch answer (histogram addition
    // commutes), which a merge-order-sensitive sketch cannot promise
    val e = spark.read.parquet(s"$dir/events.parquet")
    val landing = java.nio.file.Files.createTempDirectory("graft-q2-events")
    def stage(parity: Int, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-q2-chunk")
      e.filter(col("event_id") % 2 === parity).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, landing.resolve(name))
    }
    stage(0, "c0.parquet")
    val q = EventStreaming.quantileStream(spark, landing.toString)
      .writeStream.outputMode("update")
      .format("memory").queryName("q2_out").start()
    try {
      q.processAllAvailable()
      val mid = latestSnapshots("q2_out")
      // mid-stream snapshot covers exactly the even-id half
      val nEven = e.filter(col("event_id") % 2 === 0).count()
      assert(mid.values.map(_._1).sum == nEven)
      stage(1, "c1.parquet")
      q.processAllAvailable()
      assert(latestSnapshots("q2_out") == batchTruth)
    } finally q.stop()
  }

  test("binCents coarsening bounds state and keeps bucket lower bounds") {
    val d = java.nio.file.Files.createTempDirectory("graft-q3-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    val width = 1000L
    val q = EventStreaming.quantileStream(spark, d.toString, binCents = width)
      .writeStream.outputMode("update")
      .format("memory").queryName("q3_out").start()
    try {
      q.processAllAvailable()
      val coarse = latestSnapshots("q3_out")
      val exact = batchTruth
      coarse.foreach { case (t, (n, p50, p95, p99)) =>
        assert(n == exact(t)._1)
        // each coarse quantile is a bucket lower bound within `width`
        // BELOW (never above) the exact quantile's bucket
        assert(p50 % width == 0 && p50 <= exact(t)._2 &&
          exact(t)._2 - p50 < width)
        assert(p95 % width == 0 && p95 <= exact(t)._3 &&
          exact(t)._3 - p95 < width)
        assert(p99 % width == 0 && p99 <= exact(t)._4 &&
          exact(t)._4 - p99 < width)
      }
    } finally q.stop()
  }
}
