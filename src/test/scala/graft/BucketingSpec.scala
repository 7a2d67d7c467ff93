package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.{JsonPairProtocol, MrPipeline, MrStep}
import graft.sources.{Tables, TextSink}
import org.json4s._

/** Co-located (bucketed) joins and mrjob-format JSON output — the two
  * remaining machinery items: bucketing is the SURVEY §2's
  * "pre-partitioning for co-located joins" scale lever; JSON pair
  * lines are the reference's default OUTPUT_PROTOCOL. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  test("bucketed tables join without a shuffle exchange") {
    // clean slate: a crashed prior run can leave the managed location
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Tables.load(spark, dir, "orders")
      .write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    Tables.load(spark, dir, "lineitem")
      .write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    // hint forces SMJ (sf0.001 would auto-broadcast) so the
    // bucket-alignment property is what the plan demonstrates
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucket-aligned join: no Exchange below the join
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SMJ in:\n$plan")
    val below = plan.substring(joinIdx)
    assert(!below.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and the result is right
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect)
  }

  test("end-to-end job writes mrjob-style JSON pair lines") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-json").toString
    val lines = Tables.load(spark, dir, "documents")
      .select("text").as[String].map(t => (null: String, t))
    val step = MrStep[String, String, String, Long, String, Long](
      mapper = (_, l) => l.split(" ").iterator.map((_, 1L)),
      combiner = Some((_: String, cs: Iterator[Long]) =>
        Iterator.single(cs.sum)),
      reducer = (k, vs) => Iterator.single((k, vs.sum)))
    val result = MrPipeline.fromDataset(lines).step(step).ds
      .map { case (k, v) => (JString(k): JValue, JInt(v): JValue) }(
        org.apache.spark.sql.Encoders.kryo[(JValue, JValue)])
    TextSink.write(result, JsonPairProtocol, out, maxOutputFiles = Some(1))
    // every line parses back as json(key) \t json(value)
    val back = spark.read.textFile(out).collect()
    assert(back.nonEmpty)
    val parsed = back.map(JsonPairProtocol.read)
    val total = parsed.collect { case (_, JInt(n)) => n.toLong }.sum
    val words = operators.TextQueries.wc(spark, dir)
      .collect()(0).getAs[Long]("words")
    assert(total == words)
    assert(back.forall(_.matches("\"[^\"]*\"\t\\d+")))
  }
}
