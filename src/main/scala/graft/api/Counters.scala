package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator
import scala.collection.concurrent.TrieMap

/** Hadoop-counter analog: named LongAccumulators, grouped.
  *
  * Reference: `increment_counter(group, counter, amount)` writes
  * `reporter:counter:...` lines to stderr (mrjob/job.py:547-583); the
  * reference's Spark harness replaces that with one dict-valued
  * accumulator (mrjob/spark/harness.py:127-139, 202-229). Here each
  * (group, counter) gets its own Spark LongAccumulator — cheap, no
  * custom AccumulatorParam, and visible in the Spark UI.
  *
  * Caveat (same as Hadoop/Spark generally): task retries can
  * double-count side-effect accumulators; counters are diagnostics,
  * not exactly-once metrics.
  */
final class Counters(spark: SparkSession) extends Serializable {
  private val accs = TrieMap.empty[(String, String), LongAccumulator]

  /** Get-or-register a counter. MUST first be called on the driver
    * (accumulators register with the SparkContext); capture the
    * returned accumulator in task closures, or call
    * `counter(...)`/`increment(...)` driver-side before the job runs
    * so the registry ships to executors already populated. */
  def counter(group: String, name: String): LongAccumulator =
    accs.getOrElse((group, name), {
      val sc = spark.sparkContext
      require(sc != null,
        s"counter $group:$name used on an executor before being " +
          "registered on the driver — call counter() driver-side first")
      accs.getOrElseUpdate((group, name),
        sc.longAccumulator(s"$group:$name"))
    })

  def increment(group: String, name: String, amount: Long = 1L): Unit =
    counter(group, name).add(amount)

  /** Snapshot: group -> counter -> value (analog of runner.counters()). */
  def snapshot: Map[String, Map[String, Long]] =
    accs.toMap.groupBy(_._1._1).map { case (g, m) =>
      g -> m.map { case ((_, n), acc) => n -> acc.value.longValue }.toMap
    }
}

/** set_status analog (mrjob/job.py:585-597): a keepalive/status line.
  * Surfaces in the Spark UI / event log as the job description. */
object Status {
  def set(spark: SparkSession, msg: String): Unit =
    spark.sparkContext.setJobDescription(msg)
}
