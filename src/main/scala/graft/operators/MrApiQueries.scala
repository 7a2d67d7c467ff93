package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.api.{JobArgs, MrPipeline, MrStep, MrsJob}
import graft.sources.Tables

/** Parameterized word count — the job-parameterization surface in use
  * (configure_args / add_passthru_arg / add_file_arg,
  * mrjob/job.py:1080-1213; the FILES-shipped stop-word list pattern of
  * mr_most_used_word.py:33-59):
  *
  *  - `stop_words` file arg: a stop-word list whose CONTENTS reach
  *    every task via SparkFiles (call `args.ship(spark)` driver-side);
  *    loaded lazily once per task, like the reference reading its
  *    shipped file in mapper_init.
  *  - `min_count` passthru arg: reducer-side threshold.
  *
  * Top-level class: the job instance itself is the task closure. */
final class StopWordCountJob(args: JobArgs)
    extends MrsJob[String, String, String, Long, String, Long] {

  @transient private lazy val stop: Set[String] = args.file("stop_words") match {
    case Some(p) =>
      val src = scala.io.Source.fromFile(p)
      try src.getLines().map(_.trim).filter(_.nonEmpty).toSet
      finally src.close()
    case None => Set.empty
  }

  def mapper(k: String, line: String): IterableOnce[(String, Long)] =
    line.split(" ").iterator.filter(w => w.nonEmpty && !stop(w)).map((_, 1L))

  override def combiner = Some((w: String, cs: Iterator[Long]) =>
    Iterator.single(cs.sum))

  def reducer(w: String, cs: Iterator[Long]): IterableOnce[(String, Long)] = {
    val n = cs.sum
    if (n >= args.passthruLong("min_count", 1L)) Iterator.single((w, n))
    else Iterator.empty
  }
}

/** Queries routed through the mrjob-style step API (graft.api) instead
  * of DataFrame ops — proving the general mapper/combiner/reducer
  * surface hits the same correctness gate as the declarative path.
  * Same oracle SQL as the TextQueries equivalents.
  */
object MrApiQueries {

  /** Word count exactly as mr_word_freq_count.py:23-33 structures it:
    * tokenize mapper, summing combiner (bounded map-side combine via
    * MapSideCombine), summing reducer. */
  def wordFreqMr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = Tables.load(spark, dir, "documents")
      .select("text").filter(col("text").isNotNull) // a text FILE cannot
      // contain null lines; the table->lines adapter drops them
      .as[String].map(t => (null: String, t))
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
      .select("text").filter(col("text").isNotNull) // a text FILE cannot
      // contain null lines; the table->lines adapter drops them
      .as[String].map(t => (null: String, t))
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
