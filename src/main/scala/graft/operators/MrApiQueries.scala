package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.{MrPipeline, MrStep}
import graft.sources.Tables

/** Queries routed through the mrjob-style step API (graft.api) instead
  * of DataFrame ops — proving the general mapper/combiner/reducer
  * surface hits the same correctness gate as the declarative path.
  * Same oracle SQL as the TextQueries equivalents.
  */
object MrApiQueries {

  /** Word count exactly as mr_word_freq_count.py:23-33 structures it:
    * tokenize mapper, summing combiner (map-side partial agg via
    * Aggregator), summing reducer. */
  def wordFreqMr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables.load(spark, dir, "documents")
      .select("text").as[String].map(t => (null: String, t))
    val step = MrStep[String, String, String, Long, String, Long](
      mapper = (_, line) => line.split(" ").iterator.map(w => (w, 1L)),
      combiner = Some((w: String, counts: Iterator[Long]) =>
        Iterator.single(counts.sum)),
      reducer = (w, counts) => Iterator.single((w, counts.sum)))
    MrPipeline.fromDataset(lines).step(step)
      .ds.toDF("word", "n").orderBy("word")
  }

  /** wc via mapper-state + mapper_final partials, reducer sum
    * (mr_wc.py:19-41) — exercises the init/final bracket contract. */
  def wcMr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables.load(spark, dir, "documents")
      .select("text").as[String].map(t => (null: String, t))
    // per-task tallies, emitted only at partition end
    class Tally extends Serializable {
      var lines = 0L; var words = 0L; var chars = 0L
    }
    val step = {
      val t = new Tally
      MrStep[String, String, String, Long, String, Long](
        mapper = (_, line) => {
          t.lines += 1
          t.words += line.split(" ").length
          t.chars += line.length
          Iterator.empty
        },
        mapperFinal = () => Iterator(
          ("chars", t.chars), ("lines", t.lines), ("words", t.words)),
        reducer = (k, vs) => Iterator.single((k, vs.sum)))
    }
    MrPipeline.fromDataset(lines).step(step)
      .ds.toDF("stat", "value").orderBy("stat")
  }

  val wcMrSql: String =
    """SELECT stat, value FROM (
      |  SELECT 'lines' AS stat, COUNT(*) AS value FROM documents
      |  UNION ALL
      |  SELECT 'words', CAST(SUM(len(string_split(text, ' '))) AS BIGINT) FROM documents
      |  UNION ALL
      |  SELECT 'chars', CAST(SUM(length(text)) AS BIGINT) FROM documents
      |) t ORDER BY stat""".stripMargin
}
