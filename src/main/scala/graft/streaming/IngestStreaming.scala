package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.DedupOps

/** Streaming ingest for the training-data pipeline — documents land
  * continuously and are near-dup-checked against the live corpus
  * WITHOUT ever re-pairing the corpus. ADDITIVE to the reference
  * (mrjob is batch-only; SURVEY §1.1).
  */
object IngestStreaming {

  /** documents.parquet schema (pinned by SchemaContractSpec). */
  private val DocSchema =
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"

  /** Streaming near-dup at the door: each micro-batch of arriving
    * documents probes the PERSISTENT live-corpus band index
    * ([[DedupOps.nearDupIndex]], built once and cached here; at 100 TB
    * a bucketed table on disk) and appends the verified (new_id,
    * live_id, jaccard ≥ threshold) match pairs to `outDir`.
    *
    * Why `foreachBatch` rather than a stream-static join chain: the
    * probe needs a per-batch candidate `distinct()` and a two-sided
    * equi-join verify — as stream operators those would accrete
    * unbounded dedup state, while inside foreachBatch they run with
    * BATCH semantics scoped to the micro-batch, which is exactly the
    * per-arrival cost model of the batch operator ([[DedupOps
    * .ingestPairs]] is shared verbatim). State held by the stream
    * itself: none — the index is static, every micro-batch is
    * independent, so the only streaming state is the source's file
    * offset log. Delivery is at-least-once on retry (parquet append);
    * a production sink dedups on (new_id, live_id) or uses a
    * transactional table format.
    *
    * Scale: per-batch shuffle is O(batch bands + matched buckets),
    * candidate work Σ_bucket |new_b|·|live_b| — proportional to the
    * ARRIVAL, never to corpus². The cached index is the resident
    * structure; `liveDocs` itself is never rescanned after index
    * build. */
  def nearDupIngestStream(spark: SparkSession, landingDir: String,
      liveDocs: DataFrame, outDir: String, checkpointDir: String,
      threshold: Double = 0.5,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val idx = DedupOps.nearDupIndex(liveDocs)
    idx.bands.persist(StorageLevel.MEMORY_AND_DISK)
    idx.shingles.persist(StorageLevel.MEMORY_AND_DISK)
    val reader = spark.readStream.schema(DocSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DedupOps.ingestPairs(batch, idx, threshold)
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
