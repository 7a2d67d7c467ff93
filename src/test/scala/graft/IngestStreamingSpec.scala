package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.IngestStreaming

/** Streaming near-dup ingest: the stream over the SAME arriving docs,
  * delivered across two separate micro-batch landings, must produce
  * exactly the batch operator's verified pair list. */
class IngestStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  test("two-landing stream equals the batch ingest pair list") {
    import org.apache.spark.sql.functions.col
    val d = graft.sources.Tables.load(spark, dir, "documents")
    val isNew = col("doc_id") % DedupOps.IngestMod === DedupOps.IngestRem
    val live = d.filter(!isNew)
    val arriving = d.filter(isNew)

    val tmp = Files.createTempDirectory("graft_ingest_stream")
    val landing = tmp.resolve("landing").toString
    val out = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt").toString

    // land the arrivals as two separate parquet files;
    // maxFilesPerTrigger=1 makes AvailableNow drain them as two
    // micro-batches, so the equality below proves batch-split
    // invariance, not just end-to-end plumbing
    Files.createDirectory(java.nio.file.Paths.get(landing))
    Seq(0, 1).foreach { chunk =>
      val stage = tmp.resolve(s"stage$chunk").toString
      arriving.filter(col("doc_id") % 2 === chunk)
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        java.nio.file.Paths.get(landing, s"part-$chunk.parquet"))
    }

    val q = IngestStreaming.nearDupIngestStream(
      spark, landing, live, out, ckpt, maxFilesPerTrigger = Some(1))
    try q.awaitTermination() finally q.stop()

    val got = spark.read.parquet(out)
      .orderBy("new_id", "live_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val want = DedupOps.dedupIngest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(want.nonEmpty, "fixture must produce at least one near-dup pair")
    assert(got == want)
  }
}
