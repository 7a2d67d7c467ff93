package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // harmless with the current µs testdata; kept so a LEGACY
      // ns-precision events.parquet (which Spark 4 otherwise rejects)
      // still reads — as nanos longs, the Tables.epochMicros BIGINT leg
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // ERROR, not WARN: first-build glob reads of the nick_nack/WET
    // fixtures make FileStreamSink's metadata probe log a benign
    // FileNotFoundException stack trace at WARN (same rationale as
    // Bench); every query output is still written and compared.
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter (the driver sets no env): comma-separated
    // query names to dump, for fast oracle iteration via tools/check.py.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape — PyJson.quote (the golden-bytes-gated
    // escaper) rather than a second hand-rolled table that could
    // silently diverge; a tab or CR in builder-authored SQL would
    // otherwise make the driver's json.load fail.
    def q(s: String): String = graft.api.PyJson.quote(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
