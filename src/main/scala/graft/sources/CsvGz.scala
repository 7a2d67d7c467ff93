package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gzipped-CSV ingest parity — the second landing format next to
  * [[JsonlZst]]: tabular corpora and metadata dumps land as sharded
  * `.csv.gz` at least as often as JSONL. Same proof shape:
  *
  *  - the FIXTURE derives deterministically from the parquet
  *    `documents` table, with a minted `note` column that carries
  *    embedded commas AND double quotes (`v,"<lang>",<source>`) so
  *    the RFC 4180 quoting path is actually exercised — an unquoted
  *    or mis-escaped writer shifts every later column and breaks the
  *    oracle hash;
  *  - the REGISTERED row reads the shards back under an explicit
  *    schema (no inference pass — schema inference is a full extra
  *    scan at 100 TB) and emits the projection + md5 text digest the
  *    parquet oracle recomputes.
  *
  * Both sides pin `escape = "` (RFC 4180 doubled-quote style) —
  * Spark's CSV default escape is backslash, which round-trips with
  * itself but produces files other RFC 4180 readers mis-parse; fixing
  * the convention here keeps the landing dir interoperable.
  *
  * 100 TB posture: gzip streams are not splittable, so parallelism is
  * file-count — the fixture writes defaultParallelism shards, exactly
  * the many-small-shards layout production dumps use. One decompress +
  * parse pass per shard, linear; the explicit schema avoids the
  * inference pre-scan. */
object CsvGz {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("n_chars", LongType),
    StructField("note", StringType), StructField("text", StringType)))

  /** Derive (once, marker-cached) the sharded `.csv.gz` landing dir
    * for `dir`'s documents table. */
  def ensure(spark: SparkSession, dir: String): String = synchronized {
    val out = Paths.get(sys.props("java.io.tmpdir"),
      "graft-csv-gz-" + Integer.toHexString(dir.hashCode))
    val marker = out.resolve("_GRAFT_READY")
    if (!Files.exists(marker)) {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          concat(lit("v,\""), col("lang"), lit("\","), col("source"))
            .as("note"),
          col("text"))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .write.mode("overwrite")
        .option("compression", "gzip")
        .option("header", "true")
        .option("escape", "\"")
        .csv(out.toString)
      Files.createFile(marker)
    }
    out.toString
  }

  /** Registered row: read the gzipped CSV landing dir back and emit
    * the per-doc projection + content digest the parquet oracle
    * recomputes — any quoting, escaping, or null-round-trip bug in
    * the CSV path breaks the hash match. */
  def ingestCsv(spark: SparkSession, dir: String): DataFrame = {
    val path = ensure(spark, dir)
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("note"), md5(col("text").cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  /** Parquet-side twin: recompute the minted note and the digest. */
  val ingestCsvSql: String =
    """SELECT doc_id, lang, source, n_chars,
      |  'v,"' || lang || '",' || source AS note,
      |  md5(text) AS text_md5
      |FROM documents ORDER BY doc_id""".stripMargin
}
