package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over the driver testdata layout
  * (`<dir>/<name>.parquet`, see /root/repo/TESTDATA.md).
  *
  * Reference analog: mrjob resolves input paths/globs and streams lines
  * (mrjob/runner.py:1069-1091, mrjob/cat.py:79-115). Here the catalog is
  * columnar from the start: `spark.read.parquet` gives Catalyst a real
  * schema, so column pruning and predicate pushdown reach the scan —
  * load-bearing at 100 TB, where "read only 2 of 16 columns" is the
  * difference between minutes and hours.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
