package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compressed-JSONL ingest parity: real pipelines land text corpora as
  * sharded `.jsonl.zst` (one JSON object per line, zstandard frames —
  * the Common Crawl / RedPajama / Dolma layout), not parquet. This
  * module proves that path end-to-end on the engine:
  *
  *  - the FIXTURE is derived deterministically from the parquet
  *    `documents` table (the WET-fixture trick behind phone_to_url):
  *    one `to_json(struct(...))` line per doc, written through
  *    Hadoop's codec seam with `io.airlift.compress.zstd.ZstdCodec` —
  *    the PURE-JAVA zstd codec already on Spark's classpath (airlift
  *    aircompressor; Hadoop's own ZStandardCodec needs libhadoop
  *    native bindings this container lacks), marker-cached per source
  *    dir like [[Blowup]];
  *  - the REGISTERED row reads it back with `spark.read.json` under an
  *    explicit schema (no inference pass), the codec resolved by the
  *    `.zst` extension through `io.compression.codecs`, and emits a
  *    projection plus an md5 content digest per doc, oracled against
  *    the parquet twin — so JSON escaping, zstd framing, and the
  *    multi-part landing layout are all on the verified path.
  *
  * 100 TB posture: a zstd stream is NOT splittable, so per-file
  * parallelism is 1 — exactly how production dumps handle it: MANY
  * shards (the fixture writes defaultParallelism part files), with
  * file-count parallelism and `maxPartitionBytes` irrelevant. The
  * decompress-and-parse cost is per-shard linear; a skewed shard is
  * re-sharded upstream, not split. */
object JsonlZst {

  /** Pure-Java zstd Hadoop codec on the Spark classpath. */
  val CodecClass = "io.airlift.compress.zstd.ZstdCodec"

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("n_chars", LongType),
    StructField("text", StringType)))

  /** Register the codec for the `.zst` extension on the session's
    * Hadoop conf, so both the sink and every later scan resolve it. */
  def registerCodec(spark: SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    val cur = hc.get("io.compression.codecs", "")
    if (!cur.contains(CodecClass))
      hc.set("io.compression.codecs",
        if (cur.isEmpty) CodecClass else cur + "," + CodecClass)
  }

  /** Derive (once, marker-cached) the sharded `.jsonl.zst` landing dir
    * for `dir`'s documents table; returns the landing path. */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val out = Paths.get(sys.props("java.io.tmpdir"),
      "graft-jsonl-zst-" + Integer.toHexString(dir.hashCode))
    val marker = out.resolve("_GRAFT_READY")
    if (!Files.exists(marker)) {
      registerCodec(spark)
      Tables.load(spark, dir, "documents")
        .select(to_json(struct(col("doc_id"), col("lang"), col("source"),
          col("n_chars"), col("text"))).as("value"))
        .repartition(spark.sparkContext.defaultParallelism,
          col("value")) // sharded landing layout, deterministic content
        .write.mode("overwrite")
        .option("compression", CodecClass)
        .text(out.toString)
      Files.createFile(marker)
    }
    out.toString
  }

  /** Registered row: read the compressed-JSONL landing dir back and
    * emit the per-doc projection + content digest the parquet oracle
    * recomputes — any JSON-escaping or framing bug breaks the match. */
  def ingestJsonl(spark: SparkSession, dir: String): DataFrame = {
    val path = ensure(spark, dir)
    spark.read.schema(schema).json(path)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  /** Parquet-side twin: DuckDB md5 digests the same UTF-8 bytes. */
  val ingestJsonlSql: String =
    """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin
}
