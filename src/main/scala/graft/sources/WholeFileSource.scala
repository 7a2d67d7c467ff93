package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Whole-file and Hadoop-format input — the reference's `mapper_raw` /
  * input-manifest machinery (mrjob/job.py:365-374,
  * mrjob/runner.py:1093-1124: one whole input file per task, used to
  * parse WARC archives in mr_phone_to_url.py:77-106) and
  * HADOOP_INPUT_FORMAT scans (mrjob/job.py:1313-1322; the harness uses
  * sc.hadoopFile, mrjob/spark/harness.py:242-252).
  *
  * Spark-first: `binaryFile` is a real DataSource (column pruning on
  * metadata, `pathGlobFilter` pushdown, one file per row) — no
  * manifest files needed. The payload column is only read for rows
  * the query keeps, but a kept file's content is MATERIALIZED as one
  * Array[Byte] row (the source's structural cap: files above
  * Int.MaxValue bytes fail the scan with Spark's "can't read binary
  * file bigger than 2147483647" error — same per-task whole-file
  * memory shape as the reference's mapper_raw local-file copy,
  * mrjob/runner.py:1093-1124). Archives beyond 2 GB belong on the
  * [[hadoopTextFile]] split path or a chunked reader, not mapRaw.
  */
object WholeFileSource {

  /** One row per file: (path, modificationTime, length, content). */
  def binaryFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  /** mapper_raw analog: run a whole-file parser over each file.
    * `parse` receives (path, bytes) and yields records — exactly the
    * `mapper_raw(local_path, uri)` contract, minus the local copy
    * (content arrives via the scan). */
  def mapRaw[T : org.apache.spark.sql.Encoder](spark: SparkSession,
      glob: String, parse: (String, Array[Byte]) => IterableOnce[T]): Dataset[T] = {
    import spark.implicits._
    binaryFiles(spark, glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parse(p, bytes) }
  }

  /** Hadoop InputFormat scan (HADOOP_INPUT_FORMAT parity): thin
    * wrapper over sc.hadoopFile with the classic TextInputFormat
    * shape. */
  def hadoopTextFile(spark: SparkSession, path: String,
      minPartitions: Int = 1): Dataset[String] = {
    import spark.implicits._
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.TextInputFormat
    spark.sparkContext
      .hadoopFile[LongWritable, Text, TextInputFormat](path, minPartitions)
      .map(_._2.toString)
      .toDS()
  }

  /** Per-file line counts through input_file_name() — the
    * mapreduce.map.input.file jobconf emulation
    * (mrjob/spark/harness.py:306-325). */
  def linesPerFile(spark: SparkSession, glob: String): DataFrame =
    spark.read.textFile(glob)
      .select(input_file_name().as("file"))
      .groupBy(col("file")).agg(count(lit(1)).as("n_lines"))

  /** Manifest-input scan — the nicknack ManifestTextInputFormat
    * contract (mrjob/examples/mr_nick_nack_input_format.py:19: the
    * input file LISTS one path per line; each listed file's lines are
    * the records): read the manifest, hand the listed paths to the
    * text source as the load set. The manifest itself is small by
    * definition (it's a file list), so the driver-side read of it is
    * the same bounded action as any path resolution; the listed files
    * stream through the ordinary distributed text scan with
    * input_file_name() preserved for provenance. Blank lines and
    * `#` comments are tolerated. */
  def manifestTextFile(spark: SparkSession, manifestPath: String): DataFrame = {
    val fs = GraftFs(spark)
    val paths = fs.catLines(manifestPath)
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    require(paths.nonEmpty, s"empty manifest: $manifestPath")
    spark.read.textFile(paths: _*)
      .select(input_file_name().as("file"), col("value").as("line"))
  }
}
