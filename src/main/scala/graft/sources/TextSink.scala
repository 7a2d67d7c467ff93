package graft.sources

import org.apache.spark.sql.{Dataset, SaveMode}
import graft.api.LineProtocol

/** Text part-file sink — the reference's output contract: a directory
  * of part files, `_`/`.`-prefixed entries ignored on read-back
  * (mrjob/sim.py:627-639, mrjob/runner.py:512-562;
  * harness saveAsTextFile: mrjob/spark/harness.py:270-282).
  *
  * `maxOutputFiles` maps to coalesce (harness.py:266-268) — a narrow
  * repartition that caps file count without a shuffle. Compression
  * mirrors `mapreduce.output.fileoutputformat.compress.codec`
  * (mrjob/spark/runner.py:446-454): "gzip" | "snappy" | "bzip2" |
  * "none".
  */
object TextSink {
  def write[K, V](ds: Dataset[(K, V)], protocol: LineProtocol[K, V],
      path: String, maxOutputFiles: Option[Int] = None,
      compression: String = "none"): Unit = {
    import ds.sparkSession.implicits._
    val lines = ds.map { case (k, v) => protocol.write(k, v) }
    val sized = maxOutputFiles.fold(lines)(n => lines.coalesce(n))
    sized.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .text(path)
  }

  /** HADOOP_OUTPUT_FORMAT parity (mrjob/job.py:1324-1342; harness
    * saveAsHadoopFile mrjob/spark/harness.py:271-279): write pairs
    * through a classic Hadoop OutputFormat. Produces Hadoop-style
    * `part-NNNNN` names (the exact reference naming contract). */
  def writeHadoopText[K, V](ds: Dataset[(K, V)], path: String): Unit = {
    import org.apache.hadoop.io.Text
    import org.apache.hadoop.mapred.TextOutputFormat
    val rdd = ds.rdd.map { case (k, v) =>
      // propagate null, don't stringify it: Hadoop's LineRecordWriter
      // emits value-only for a null key (the RawValueProtocol output
      // contract — String.valueOf(null) would write a literal "null\t"
      // prefix on every line of a fromText pipeline)
      val kt: Text = if (k == null) null else new Text(String.valueOf(k))
      val vt: Text = if (v == null) null else new Text(String.valueOf(v))
      (kt, vt)
    }
    new org.apache.spark.rdd.PairRDDFunctions(rdd)
      .saveAsHadoopFile[TextOutputFormat[Text, Text]](path)
  }

  /** Read back a part-file directory, skipping hidden/_ files the way
    * the reference's cat_output does (mrjob/runner.py:512-562) — Spark
    * applies the same default PathFilter. */
  def readBack[K, V](spark: org.apache.spark.sql.SparkSession,
      protocol: LineProtocol[K, V], path: String)(
      implicit e: org.apache.spark.sql.Encoder[(K, V)]): Dataset[(K, V)] =
    spark.read.textFile(path).map(protocol.read _)
}
