package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Null-robustness: every registered query must be TOTAL on a corpus
  * carrying NULL fields — real pipelines land nulls constantly
  * (broken producers, schema drift, PERMISSIVE JSON rows like the
  * ingest_jsonl corrupt-line contract). Convention pinned here: a
  * NULL payload/text/embedding row is SKIPPED by operators that must
  * materialize it Scala-side (the SQL expression paths already
  * null-propagate); it never crashes the job. The round-7 sweep that
  * introduced this gate found four real task-failure crashes:
  * embed_pca (null array into the Gram fold), multimodal_features
  * (null payload into the decode batch), and wc_mr / word_freq_mr
  * (null line into the mapper — a text FILE cannot contain null
  * lines, so the table→lines adapter now drops them). */
class NullRobustnessSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private lazy val nullDir: String = {
    val out = java.nio.file.Files
      .createTempDirectory("graft-null-corpus").toString
    val base = SparkFixture.Sf0001
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    val d = spark.read.parquet(s"$base/documents.parquet")
    d.unionByName(spark.range(1).select(
        lit(900001L).as("doc_id"), lit(null).cast("string").as("text"),
        lit("en").as("lang"), lit("src0").as("source"),
        lit(0L).as("n_chars")))
      .unionByName(spark.range(1).select(
        lit(900002L).as("doc_id"), lit("hello world text").as("text"),
        lit(null).cast("string").as("lang"), lit("src1").as("source"),
        lit(16L).as("n_chars")))
      .unionByName(spark.range(1).select(
        lit(900003L).as("doc_id"), lit("more sample words").as("text"),
        lit("de").as("lang"), lit(null).cast("string").as("source"),
        lit(17L).as("n_chars")))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val e = spark.read.parquet(s"$base/embeddings.parquet")
    e.unionByName(e.limit(1).select(lit(900001L).as("vec_id"),
        lit(null).cast(e.schema("embedding").dataType).as("embedding"),
        col("label")))
      .unionByName(e.limit(1).select(lit(900002L).as("vec_id"),
        col("embedding"),
        lit(null).cast(e.schema("label").dataType).as("label")))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val ev = spark.read.parquet(s"$base/events.parquet")
    ev.unionByName(ev.limit(1).select(lit(900001L).as("event_id"),
        col("ts"), lit(null).cast(ev.schema("user_id").dataType).as("user_id"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast(ev.schema("value").dataType).as("value"),
        lit(null).cast("string").as("props")))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  test("eventsQuantilesAudit emits (type, pct, 0, TRUE) rows for an " +
    "event_type whose values are ALL NULL — matching the oracle, " +
    "which never drops the group (r9 advice)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-allnull-events").toString
    val ev = spark.read.parquet(s"${SparkFixture.Sf0001}/events.parquet")
    ev.unionByName(ev.limit(2).select(
        (col("event_id") + 900000L).as("event_id"),
        col("ts"), col("user_id"), lit("allnulltype").as("event_type"),
        lit(null).cast(ev.schema("value").dataType).as("value"),
        col("props")))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val rows = graft.operators.EventQueries
      .eventsQuantilesAudit(spark, out)
      .where(col("event_type") === "allnulltype")
      .collect()
    assert(rows.length == 3,
      "all-NULL type must keep its three pct rows (inner join dropped " +
        s"them pre-fix): got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") == 0L)
      assert(r.getAs[Boolean]("within_gate"),
        "empty group gate is vacuously true, as the oracle emits")
    }
  }

  test("every registered query is total on a null-bearing corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        try { f(spark, nullDir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name -> ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(120))
        }
    }
    assert(failures.isEmpty,
      s"queries not total on null-bearing input:\n${failures.mkString("\n")}")
  }
}
