package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print a registered query's POST-EXECUTION physical plan —
  * with AQE on, `explain()` before an action shows only the initial
  * plan, while the re-planned reality (runtime broadcast decisions,
  * coalesced partitions, skew splits) exists only after the query ran.
  * The companion of [[StageProfile]]: the profiler names the expensive
  * stage, this names the operator that stage executes.
  * Usage: SPARK_GRAFT_SF_DIR=... [SPARK_GRAFT_PROFILE_BLOWUP=<f>]
  *        runMain graft.PlanDump <query ...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val profDir = sys.env.get("SPARK_GRAFT_PROFILE_BLOWUP")
      .map(f => graft.sources.Blowup.ensure(spark, dir, f.toInt))
      .getOrElse(dir)
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, profDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"\n========== $name (final adaptive plan) ==========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
