package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (BASELINE.json extension surface):
  * image/audio/video as opaque `binary` payloads with typed metadata,
  * batch-decoded feature extraction as a partition-streaming operator.
  *
  * The decode step is a clearly-marked DETERMINISTIC FAKE — the
  * container has no image/audio codecs (builder prompt). Everything
  * around it is the real production shape:
  *  - schema: (id, payload: binary, meta: struct) — the layout a
  *    100 TB multimodal corpus uses (payload column pruned away unless
  *    the query touches it; metadata predicate pushdown stays live);
  *  - execution: `mapPartitions` over an iterator of batches — the
  *    Scala analog of `mapInPandas` (batch amortizes codec init; the
  *    iterator never materializes a partition);
  *  - output: fixed-width feature struct per payload.
  */
object MultimodalOps {

  case class MediaRecord(id: Long, payload: Array[Byte],
      mime: String, width: Int, height: Int)
  case class MediaFeatures(id: Long, byte_len: Long, checksum: Long,
      head: Array[Byte], embedding: Array[Float])

  /** Documents → binary media table: payload = UTF-8 bytes standing in
    * for an encoded image; metadata carried as typed columns. */
  def asMediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("mime"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
  }

  /** FAKE decode+featurize one payload batch. Real pipelines put the
    * codec call here (???-equivalent); the fake is deterministic so
    * tests can pin outputs: checksum = bytewise polynomial, embedding
    * = first 4 bytes scaled to [0,1]. */
  def decodeBatch(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    batch.map { r =>
      val cs = r.payload.foldLeft(7L)((h, b) => (h * 131 + (b & 0xFF)) % 1000000007L)
      MediaFeatures(
        id = r.id,
        byte_len = r.payload.length.toLong,
        checksum = cs,
        head = r.payload.take(8),
        embedding = r.payload.take(4).map(b => (b & 0xFF) / 255.0f))
    }

  /** Partition-streaming feature extraction — one decoder init per
    * partition, constant memory, no driver collect. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-task decoder init would go here (codec handles, model load)
      decodeBatch(it)
    }
  }

  case class MediaFrame(id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling — the video-analog operator: treat the payload as
    * fixed-width frames and keep every `every`-th one BEFORE any
    * decode. Real pipelines sample exactly like this so the expensive
    * codec only sees 1/every of the bytes; the slicing itself is pure
    * per-row iterator work in the partition stream. */
  def frameSample(media: Dataset[MediaRecord], frameBytes: Int = 16,
      every: Int = 4): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % every == 0 => MediaFrame(r.id, i, f) }
    }
  }

  /** Resize a decoded feature vector to `dim`: truncate or zero-pad —
    * column-level (codegen'd array ops) so it fuses with downstream
    * similarity operators instead of round-tripping through a UDF. */
  def resizeEmbedding(emb: org.apache.spark.sql.Column,
      dim: Int): org.apache.spark.sql.Column =
    slice(concat(emb, array_repeat(lit(0.0f), dim)), 1, dim)

  /** Driver-facing query: media features per payload. ORACLED: the
    * corpus text is pure ASCII (verified: max code point 121), so the
    * byte-level fake checksum is reproducible in SQL from code points
    * — the binary round-trip (encode → batch decode → features) must
    * agree with a pure relational derivation. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(asMediaTable(spark, dir))
      .select(col("id"), col("byte_len"), col("checksum"))
      .orderBy(col("id"))
  }

  val multimodalFeaturesSql: String =
    """SELECT doc_id AS id,
      |  CAST(length(text) AS BIGINT) AS byte_len,
      |  list_reduce(
      |    list_prepend(CAST(7 AS BIGINT),
      |      list_transform(range(length(text)),
      |        i -> CAST(unicode(text[i+1]) AS BIGINT))),
      |    (h, b) -> (h * 131 + b) % 1000000007) AS checksum
      |FROM documents
      |ORDER BY id""".stripMargin
}
