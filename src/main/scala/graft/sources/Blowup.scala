package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus replication for scale probes: blow `documents`/`embeddings`
  * up `factor`× while keeping the SIMILARITY STRUCTURE linear in the
  * factor — the superlinearity probe the round-2 verdict asked for
  * (bench the heaviest queries at 10× and check sec grows ~linearly).
  *
  * A naive union of N copies is the wrong experiment: identical texts
  * across copies make every base near-dup pair an N²-family of
  * cross-copy pairs, so the OUTPUT grows quadratically and any engine
  * looks superlinear. Instead each copy k:
  *  - prefixes every token with `c<k>_` — a per-copy bijection of the
  *    vocabulary, so within-copy shingle/token-set similarity is
  *    IDENTICAL to the base corpus (both sides of a pair transform the
  *    same way) while cross-copy similarity is exactly zero;
  *  - shifts embedding `label` blocks by 1000·k — block sizes stay
  *    constant, block count grows linearly, cross-copy blocked pairs
  *    are impossible.
  * Result: factor× rows, factor× true pairs, factor× blocks — any
  * super-linear runtime growth is the engine's fault, not the data's.
  *
  * Only the two text/vector tables are replicated (the probe queries
  * read nothing else). Marker-cached per (sf dir, factor) in the
  * GraftFs scratch root.
  */
object Blowup {

  /** Per-copy id shift. The replication invariant REQUIRES base ids
    * below this (and labels below the 1000 block shift) — violated
    * silently, copies would collide and corrupt the probe, so
    * [[ensure]] checks it before writing. */
  private val IdShift = 10000000L
  private val LabelShift = 1000

  def ensure(spark: SparkSession, sfDir: String, factor: Int = 10): String = {
    // cache key: sanitized path for readability PLUS a hash of the
    // RAW path — sanitization alone mapped '/a/sf0.1' and '/a_sf0.1'
    // to the same scratch dir, serving one corpus's cached blow-up
    // for the other
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_") +
      f"_${sfDir.hashCode & 0x7fffffff}%08x"
    // v3: + the events table (round-9 probes the quantile-audit row)
    val out = GraftFs.scratchDir(spark, s"graft_blowup${factor}x_v3_$key")
    val fs = GraftFs(spark)
    if (!fs.exists(s"$out/_MARKER")) {
      // replication-invariant preconditions (one tiny agg per table)
      val dmax = spark.read.parquet(s"$sfDir/documents.parquet")
        .agg(max(col("doc_id"))).head().getLong(0)
      val Array(vmax, lmax) = spark.read
        .parquet(s"$sfDir/embeddings.parquet")
        .agg(max(col("vec_id")), max(col("label"))).head() match {
          case r => Array(r.getLong(0), r.getInt(1).toLong)
        }
      require(dmax < IdShift && vmax < IdShift && lmax < LabelShift,
        s"Blowup id/label shifts would collide: max doc_id=$dmax, " +
          s"vec_id=$vmax (shift $IdShift), label=$lmax (shift $LabelShift)")
      // File-count parity with real growth: the sf tables are single
      // small parquet files, so a same-layout blow-up would be ONE
      // file → ONE scan task, and every probe query would single-
      // thread its scan+explode stage — measuring the file layout,
      // not the engine (the v1 cache did exactly that: 10× data in
      // 1 task looked 4× superlinear). A corpus that grew 10× grows
      // its file count too; write `factor` files per table.
      val copies = explode(sequence(lit(0), lit(factor - 1))).as("k")
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          copies)
        .select((col("doc_id") + col("k") * IdShift).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            x => concat(lit("c"), col("k"), lit("_"), x)), " ").as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(factor, col("doc_id"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"), col("label"), copies)
        .select((col("vec_id") + col("k") * IdShift).as("vec_id"),
          col("embedding"),
          (col("label") + col("k") * LabelShift).cast("int").as("label"))
        .repartition(factor, col("vec_id"))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      // events (v3, for the quantile-audit probe): ids shift per copy
      // like the other tables; ts/type/value/props stay — each type's
      // value multiset is duplicated factor×, so every quantile (and
      // the GK audit's rank targets) is IDENTICAL to the base corpus
      // at factor× n, and per-user sequences replicate into disjoint
      // shifted users (sessionize/funnel shapes stay linear too)
      val e = spark.read.parquet(s"$sfDir/events.parquet")
      val emax = e.agg(max(col("event_id")), max(col("user_id"))).head()
      require(emax.getLong(0) < IdShift && emax.getLong(1) < IdShift,
        s"Blowup event id shift would collide: ${emax.mkString(",")}")
      e.select(copies +: e.columns.map(col): _*)
        .select((col("event_id") + col("k") * IdShift).as("event_id"),
          col("ts"), (col("user_id") + col("k") * IdShift).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(factor, col("event_id"))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      fs.touchz(s"$out/_MARKER")
    }
    out
  }
}
