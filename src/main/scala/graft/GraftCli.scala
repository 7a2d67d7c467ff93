package graft

import org.apache.spark.sql.SparkSession

/** Command-line entry — the `python my_job.py -r spark input/ --output-dir out/`
  * shape for this engine (mrjob/job.py run()/cmd-line contract,
  * job.py:601-646), over the registered query catalog:
  *
  * {{{
  * spark-submit --class graft.GraftCli graft.jar \
  *   <query-name> <tablesDir> <outDir> [--format parquet|csv|json] [--list]
  * }}}
  *
  * `--list` prints every registered query (the full catalog a
  * reference user switches onto). Output goes through the normal
  * DataFrame writers, so the part-file directory contract matches the
  * reference's output-dir behavior.
  */
object GraftCli {
  def main(args: Array[String]): Unit = {
    if (args.contains("--list") || args.isEmpty) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    require(args.length >= 3,
      "usage: GraftCli <query-name> <tablesDir> <outDir> [--format parquet|csv|json]")
    val Array(name, tablesDir, outDir) = args.take(3)
    val format = args.sliding(2).collectFirst {
      case Array("--format", f) => f
    }.getOrElse("parquet")
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name' — run with --list for the catalog"))
    // an embedded caller's live session is used AS-IS and kept alive:
    // running builder configs through getOrCreate would APPLY them to
    // the existing session (Spark semantics), silently switching e.g.
    // a notebook's timezone to UTC for everything it renders after
    val existing = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
    val spark = existing.getOrElse(SparkSession.builder()
      .appName(s"graft.$name")
      // spark-submit supplies spark.master as a system property; bare
      // `java -cp`/runMain invocations fall back to local[*]
      .config("spark.master",
        sys.props.getOrElse("spark.master", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate())
    // a REUSED session keeps its own timeZone (builder configs are
    // silently ignored when a session exists) — but the catalog's
    // calendar bucketing (date_format/hour over TimestampType) is
    // defined in UTC, so pin the runtime conf on whichever session
    // runs the query
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try fn(spark, tablesDir).write.mode("overwrite").format(format)
      .save(outDir)
    finally if (existing.isEmpty) spark.stop()
  }
}
