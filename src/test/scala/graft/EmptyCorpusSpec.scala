package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-corpus totality: every registered query must be TOTAL on a
  * zero-row corpus with the production schemas — at 100 TB, filters,
  * partition pruning, and fresh ingest dirs produce empty inputs
  * constantly, and an operator that throws on them takes the whole
  * pipeline down. The round-7 sweep that introduced this gate found
  * three real crashes: embed_pca NPE'd on null BigInteger moment
  * cells, and input_file_counts / nick_nack read a zero-match
  * partition glob (PATH_NOT_FOUND) because an empty partitionBy write
  * creates no partition dirs. */
class EmptyCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Zero-row twins of every table, schemas taken from the real
    * fixture (limit(0) round-trip through parquet). */
  private lazy val emptyDir: String = {
    val out = java.nio.file.Files
      .createTempDirectory("graft-empty-corpus").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"${SparkFixture.Sf0001}/$t.parquet")
        .limit(0).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  test("every registered query is total on an empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        try { f(spark, emptyDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name -> ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(120))
        }
    }
    assert(failures.isEmpty,
      s"queries not total on empty input:\n${failures.mkString("\n")}")
  }
}
