package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-stage wall/CPU breakdown for selected queries —
  * finds the single-task stages where an AQE-coalesced or
  * unsplittable-input plan quietly serializes CPU-heavy work (the
  * round-6 dedup_prefix_join diagnosis: two serial 3 s one-task
  * stage builds under a 7 s row).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.StageProfile <query ...>
  */
object StageProfile {
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

    val stages = mutable.ArrayBuffer[(Int, String, Long, Int, Long)]()
    val runByStage = mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) runByStage(te.stageId) =
          runByStage.getOrElse(te.stageId, 0L) + m.executorRunTime
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.name.take(60),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, runByStage.getOrElse(si.stageId, 0L)))
      }
    })

    args.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm: JIT + codegen
      stages.clear(); runByStage.clear()
      val sec = run()
      Thread.sleep(300)
      println(f"\n========== $name: $sec%.2f s ==========")
      stages.sortBy(-_._3).take(12).foreach { case (id, n, ms, nt, cpu) =>
        println(f"stage $id%5d wall=$ms%6d ms tasks=$nt%4d cpu=$cpu%6d ms  $n")
      }
    }
    spark.stop()
  }
}
