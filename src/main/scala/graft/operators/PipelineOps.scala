package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Training-corpus assembly operators: the steps that sit BETWEEN the
  * cleaning/dedup stages (DedupOps, TextAnalysis) and the trainer —
  * per-group sampling, sequence packing, retrieval chunking, and
  * incremental corpus merge.
  *
  * No mrjob analog (the reference stops at generic MapReduce); these
  * are the extension surface the engine adds for LLM data pipelines.
  * Everything here is fully oracled: the only nondeterminism candidates
  * (sampling, ordering) ride the same seeded affine-permutation hash
  * over Z_P that seeded_sample established ([[TextQueries.SamplePrime]]
  * — a permutation both engines compute exactly), and all arithmetic is
  * integer.
  */
object PipelineOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  // the seeded affine hash lives in ONE place (TextQueries) — this
  // file's previous private SQL twin spelled a plain `%` where the
  // Column twin used pmod, a sign divergence that would bite on the
  // negative doc_id namespace corpusMerge mints below
  private def seededHash(idCol: Column, seed: Long): Column =
    TextQueries.seededHashCol(idCol, seed)

  private def seededHashSql(idExpr: String, seed: Long): String =
    TextQueries.seededHashSqlExpr(idExpr, seed)

  // ---------------- per-group seeded sample ----------------

  /** Fixed-k seeded sample PER SOURCE — the grouped form of
    * seeded_sample (the reference's reservoir sampler,
    * mr_log_sampler.py:32-120, run once per log family). Smallest-k by
    * the seeded permutation hash within each source: row_number over
    * (source → hash) then rk ≤ k.
    *
    * Scale: Spark's InferWindowGroupLimit turns the rank filter into a
    * map-side per-partition top-k BEFORE the shuffle (same machinery
    * PlanSpec pins for q5_window), so a source with 10⁹ docs moves only
    * partitions×k rows — never the group. One shuffle on source. */
  def groupSample(spark: SparkSession, dir: String, k: Int = 20,
      seed: Long = 41L): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__h"), col("doc_id"))
    docs(spark, dir)
      .select(col("source"), col("doc_id"), col("lang"),
        seededHash(col("doc_id"), seed).as("__h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("source"), col("doc_id"), col("lang"))
      .orderBy(col("source"), col("doc_id"))
  }

  val groupSampleSql: String =
    s"""SELECT source, doc_id, lang FROM (
       |  SELECT source, doc_id, lang,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ${seededHashSql("doc_id", 41L)}, doc_id) AS rk
       |  FROM documents) t
       |WHERE rk <= 20
       |ORDER BY source, doc_id""".stripMargin

  // ---------------- sequence packing ----------------

  /** Concat-and-chunk sequence packing at L = [[PackLen]] tokens — the
    * standard LLM pretraining layout: documents are concatenated in a
    * deterministic order and the stream is cut every L tokens, so a doc
    * may span sequences. Output: each doc's token span in the packed
    * stream and the first/last sequence id it lands in.
    *
    * Packing is PER SOURCE (partitioned window cumsum), not global: a
    * global token offset would be one total-order sort of the corpus,
    * while per-source packing shuffles once on source and each trainer
    * shard stays self-contained — the layout DoReMi/LLaMA-style
    * source-mixture training wants anyway. A pathologically dominant
    * source makes one big sort partition; the mitigation is the same
    * salting used in SkewOps (pack per (source, doc_id DIV B) superblock
    * then offset by superblock totals), not a different algorithm. */
  val PackLen = 256L

  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(spark, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("source"), col("doc_id"), col("n_tok"), col("start_tok"),
        expr(s"start_tok DIV $PackLen").as("seq_first"),
        expr(s"(start_tok + n_tok - 1) DIV $PackLen").as("seq_last"))
      .orderBy(col("source"), col("doc_id"))
  }

  val seqPackSql: String =
    s"""WITH d AS (
       |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
       |  FROM documents),
       |o AS (
       |  SELECT source, doc_id, n_tok,
       |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS start_tok
       |  FROM d)
       |SELECT source, doc_id, n_tok, start_tok,
       |  start_tok // $PackLen AS seq_first,
       |  (start_tok + n_tok - 1) // $PackLen AS seq_last
       |FROM o
       |ORDER BY source, doc_id""".stripMargin

  // ---------------- retrieval chunking ----------------

  /** Overlapping retrieval chunks (RAG indexing layout): windows of
    * [[ChunkLen]] tokens at stride [[ChunkStride]] per doc. Chunk count
    * is 1 + ceil((n − W)/S) so the final window always reaches the last
    * token; the tail chunk may be shorter. Emits the span plus its
    * boundary tokens (the slice itself stays derivable from
    * (doc_id, off, len) against the corpus — shipping every overlapped
    * token string would inflate the output ~W/S ≈ 1.3× plus copies).
    *
    * Scale: explode factor is n/S per doc — linear in corpus tokens,
    * no shuffle at all until the caller aggregates (the plan is scan →
    * generate → project). */
  val ChunkLen = 64L
  val ChunkStride = 48L

  def ragChunk(spark: SparkSession, dir: String): DataFrame = {
    val nc = when(col("n") <= ChunkLen, lit(1L))
      .otherwise(expr(s"(n - $ChunkLen + $ChunkStride - 1) DIV $ChunkStride") + 1L)
    docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .withColumn("n", size(col("ts")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L), nc - 1L)))
      .select(col("doc_id"), col("chunk_id"), col("n"), col("ts"),
        (col("chunk_id") * ChunkStride).as("off"))
      .withColumn("chunk_len", least(lit(ChunkLen), col("n") - col("off")))
      .select(col("doc_id"), col("chunk_id"), col("off"), col("chunk_len"),
        element_at(col("ts"), (col("off") + 1L).cast("int")).as("first_tok"),
        element_at(col("ts"),
          (col("off") + col("chunk_len")).cast("int")).as("last_tok"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val ragChunkSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, ts, n,
       |    unnest(range(0, CASE WHEN n <= $ChunkLen THEN 1
       |      ELSE (n - $ChunkLen + $ChunkStride - 1) // $ChunkStride + 1 END)) AS chunk_id
       |  FROM d)
       |SELECT doc_id, chunk_id, chunk_id * $ChunkStride AS off,
       |  least($ChunkLen, n - chunk_id * $ChunkStride) AS chunk_len,
       |  ts[CAST(chunk_id * $ChunkStride + 1 AS INT)] AS first_tok,
       |  ts[CAST(chunk_id * $ChunkStride +
       |    least($ChunkLen, n - chunk_id * $ChunkStride) AS INT)] AS last_tok
       |FROM c
       |ORDER BY doc_id, chunk_id""".stripMargin

  // ---------------- incremental corpus merge ----------------

  /** Incremental ingest: merge a new batch into the corpus with
    * latest-version-wins upsert, then reject inserted docs whose text
    * exactly duplicates the existing corpus (ingest-time exact dedup —
    * the streaming-world compaction DedupOps.dedupExact does in batch).
    *
    * The batch is DERIVED deterministically from `documents` so the
    * query is a pure function of the table (the phone_to_url fixture
    * trick): doc_id ≡ 0 (mod 7) arrives revised (text + " v2");
    * doc_id ≡ 4 (mod 26) arrives re-posted under a fresh id with
    * UNCHANGED text — rejected as a dup UNLESS its original was
    * itself revised in the same batch (ids ≡ 56 mod 182 hit both
    * rules: the corpus copy moved on to " v2", so the re-post of the
    * old text is genuinely new content and survives; the spec
    * computes this, it doesn't assume); doc_id ≡ 17 (mod 26)
    * arrives as genuinely new text (must survive).
    *
    * Scale: upsert = one hash shuffle on doc_id (on a bucketed corpus
    * layout, BucketingSpec's no-exchange SMJ shape makes it
    * shuffle-free); ingest dedup = one anti-join shuffle on text, the
    * dedup_exact shape. Nothing quadratic, nothing driver-side. */
  def corpusMerge(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val base = d.select(col("doc_id"), col("text"), col("source"),
      lit(1).as("version"))
    val updates = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
        col("source"), lit(2).as("version"))
    // fresh-id inserts live in the NEGATIVE id namespace — provably
    // disjoint from every non-negative corpus id at any scale (an
    // additive offset collides once the corpus grows past it)
    val inserts = d.filter(col("doc_id") % 26 === 4 || col("doc_id") % 26 === 17)
      .select((-col("doc_id") - 1).as("doc_id"),
        when(col("doc_id") % 26 === 17, concat(lit("fresh "), col("text")))
          .otherwise(col("text")).as("text"),
        col("source"), lit(2).as("version"))
    val merged = base.unionByName(updates).unionByName(inserts)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("version").desc)))
      .filter(col("rn") === 1).drop("rn")
    val existing = merged.filter(col("doc_id") >= 0)
    val insKept = merged.filter(col("doc_id") < 0)
      .join(existing.select(col("text")), Seq("text"), "left_anti")
    existing.unionByName(insKept.select(existing.columns.map(col): _*))
      .select(col("doc_id"), col("version"), col("source"),
        when(col("doc_id") < 0, lit("insert"))
          .when(col("version") === 2, lit("update"))
          .otherwise(lit("keep")).as("op"),
        length(col("text")).cast("long").as("n_chars_cur"))
      .orderBy(col("doc_id"))
  }

  /** Table reconciliation (data-diff): FULL OUTER join of the corpus
    * against its next version, classifying every doc as added /
    * removed / changed / kept and reporting the changed-size delta —
    * the audit step between pipeline runs (what changed since the
    * last snapshot?). The "new version" is derived deterministically
    * from `documents` (the corpus_merge fixture trick) so the query
    * is a pure function of the table: doc_id ≡ 0 (mod 11) is dropped,
    * ≡ 3 (mod 11) gets text appended, ≡ 7 (mod 13) arrives as a new
    * id. Output keeps only the non-kept rows (bounded by churn, not
    * corpus size).
    *
    * Scale: ONE hash shuffle on doc_id for the full outer join
    * (shuffle-free on a bucketed layout); the kept-row filter means
    * the output is churn-sized. Length deltas, not text bodies, cross
    * the wire. */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val old = d.select(col("doc_id"), length(col("text")).cast("long").as("len"))
    // synthetic "added" docs live in the NEGATIVE id namespace —
    // provably disjoint from every non-negative corpus id at any
    // scale (an additive offset could collide with real ids once the
    // corpus grows past it)
    val newv = d.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 3,
          length(col("text")).cast("long") + 9L) // 9-char simulated append
          .otherwise(length(col("text")).cast("long")).as("len"))
      .unionByName(d.filter(col("doc_id") % 13 === 7)
        .select((-col("doc_id") - 1).as("doc_id"),
          length(col("text")).cast("long").as("len")))
    old.select(col("doc_id"), col("len").as("old_len"))
      .join(newv.select(col("doc_id"), col("len").as("new_len")),
        Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_len").isNull, lit("added"))
          .when(col("new_len").isNull, lit("removed"))
          .when(col("old_len") =!= col("new_len"), lit("changed"))
          .otherwise(lit("kept")))
      .filter(col("status") =!= "kept")
      .select(col("doc_id"), col("status"),
        coalesce(col("old_len"), lit(-1L)).as("old_len"),
        coalesce(col("new_len"), lit(-1L)).as("new_len"))
      .orderBy(col("doc_id"))
  }

  val tableDiffSql: String =
    """WITH old AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS old_len
      |  FROM documents),
      |newv AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 3 THEN CAST(length(text) AS BIGINT) + 9
      |         ELSE CAST(length(text) AS BIGINT) END AS new_len
      |  FROM documents WHERE doc_id % 11 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1 AS doc_id,
      |    CAST(length(text) AS BIGINT) AS new_len
      |  FROM documents WHERE doc_id % 13 = 7),
      |j AS (
      |  SELECT COALESCE(old.doc_id, newv.doc_id) AS doc_id,
      |    old.old_len, newv.new_len
      |  FROM old FULL OUTER JOIN newv ON old.doc_id = newv.doc_id)
      |SELECT doc_id,
      |  CASE WHEN old_len IS NULL THEN 'added'
      |       WHEN new_len IS NULL THEN 'removed'
      |       WHEN old_len <> new_len THEN 'changed'
      |       ELSE 'kept' END AS status,
      |  COALESCE(old_len, -1) AS old_len,
      |  COALESCE(new_len, -1) AS new_len
      |FROM j
      |WHERE (CASE WHEN old_len IS NULL THEN 'added'
      |            WHEN new_len IS NULL THEN 'removed'
      |            WHEN old_len <> new_len THEN 'changed'
      |            ELSE 'kept' END) <> 'kept'
      |ORDER BY doc_id""".stripMargin

  val corpusMergeSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, source, 1 AS version FROM documents),
      |updates AS (
      |  SELECT doc_id, text || ' v2' AS text, source, 2 AS version
      |  FROM documents WHERE doc_id % 7 = 0),
      |inserts AS (
      |  SELECT -doc_id - 1 AS doc_id,
      |    CASE WHEN doc_id % 26 = 17 THEN 'fresh ' || text ELSE text END AS text,
      |    source, 2 AS version
      |  FROM documents WHERE doc_id % 26 = 4 OR doc_id % 26 = 17),
      |merged AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY doc_id
      |      ORDER BY version DESC) AS rn
      |    FROM (SELECT * FROM base UNION ALL SELECT * FROM updates
      |          UNION ALL SELECT * FROM inserts) u) t
      |  WHERE rn = 1),
      |existing AS (SELECT * FROM merged WHERE doc_id >= 0),
      |ins_kept AS (
      |  SELECT * FROM merged m WHERE doc_id < 0
      |    AND NOT EXISTS (SELECT 1 FROM existing e WHERE e.text = m.text))
      |SELECT doc_id, version, source,
      |  CASE WHEN doc_id < 0 THEN 'insert'
      |       WHEN version = 2 THEN 'update' ELSE 'keep' END AS op,
      |  CAST(length(text) AS BIGINT) AS n_chars_cur
      |FROM (SELECT doc_id, version, source, text FROM existing
      |      UNION ALL SELECT doc_id, version, source, text FROM ins_kept) r
      |ORDER BY doc_id""".stripMargin

  // ---------------- deterministic global shuffle ----------------

  /** Shard count for the registered row. Production sets this to
    * corpus_bytes / target_shard_bytes — the shape below is
    * shard-count-agnostic. */
  val ShuffleShards = 8L

  val ShuffleSeed = 77L

  /** Deterministic global corpus shuffle into training shards — the
    * data-ordering step before writing a pre-training corpus:
    * examples must reach the trainer in a fixed pseudo-random order
    * that (a) never correlates with crawl/source order and (b) is
    * byte-identical on re-runs, or a resumed run trains on a
    * different stream.
    *
    * Order is the seeded affine permutation over Z_P (the
    * seeded_sample machinery — both engines compute it exactly, so
    * the row is fully oracled, unlike an engine-defined rand/shuffle):
    * shard = h mod [[ShuffleShards]], position = rank of h within the
    * shard.
    *
    * Scale shape: ONE hash shuffle on shard, then each shard sorts
    * locally (the row_number window partitioned by shard IS the
    * per-shard sort a shard-file writer runs); no global sort ever
    * happens, and shards are independent — 1000 executors write 1000
    * shard groups concurrently. A doc's (shard, pos) depends only on
    * its id and the corpus membership of its shard, so adding a new
    * source reshuffles only the shards its ids land in. */
  def globalShuffle(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        seededHash(col("doc_id"), ShuffleSeed).as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(ShuffleShards)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("source"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val globalShuffleSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |    ${seededHashSql("doc_id", ShuffleSeed)} AS hh
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, source, hh, hh % $ShuffleShards AS shard FROM h)
       |SELECT doc_id, source, shard,
       |  CAST(row_number() OVER (PARTITION BY shard
       |    ORDER BY hh, doc_id) AS BIGINT) AS pos
       |FROM sh
       |ORDER BY shard, pos""".stripMargin

  // ---------------- length-bucketed batch planning ----------------

  /** Docs per padded batch. */
  val BatchSize = 16
  /** Seed for the within-bucket batch order (simulates the epoch
    * shuffle a loader runs before batching). */
  val BatchSeed = 19L

  /** Length-bucketed BATCH PLANNING with padding-waste accounting —
    * the dynamic-batching step a finetuning/inference loader runs
    * (fairseq/HF group_by_length lineage): batching arbitrary-length
    * docs together pads every sequence to the batch max, so loaders
    * first bucket by length (here: bucket = bit-length of the token
    * count, i.e. ⌊log₂ n⌋+1 — INTEGER-exact in both engines via
    * length(bin(n)), no float log), shuffle within the bucket
    * (seeded hash — deterministic, cross-engine-exact), and cut
    * [[BatchSize]]-doc batches. Output: one row per (bucket, batch)
    * with n_docs, max_tok, sum_tok and pad_waste_ppm =
    * 10⁶·(n_docs·max − Σtok) DIV (n_docs·max) — the padding fraction
    * the bucketing exists to minimize (and the metric that justifies
    * the bucket width choice).
    *
    * Scale shape: the within-bucket rank does NOT run as a window
    * over the bucket key (log-many buckets ⇒ hot partitions at
    * 100 TB); it rides the lengthCurriculum rank-offsets job — one
    * range-repartition by the full (bucket, h, doc_id) sort key, a
    * per-partition count collect (≤ partitions longs), and a
    * partition-local running index; the within-bucket index is the
    * global rank minus the bucket's min rank (one bounded agg,
    * broadcast back). The batch stats are one partial+final hash agg
    * on (bucket, batch). */
  def batchPlan(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("bucket", length(bin(col("n_tok"))).cast("long"))
      .withColumn("h", seededHash(col("doc_id"), BatchSeed))
    val withRank = graft.functions.GlobalRank.withRank0(
      base, "rank0", col("bucket"), col("h"), col("doc_id"))
    val bucketMin = withRank.groupBy(col("bucket"))
      .agg(min(col("rank0")).as("b0"))
    withRank.join(broadcast(bucketMin), Seq("bucket"))
      .withColumn("batch_id", expr(s"(rank0 - b0) DIV $BatchSize"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("max_tok"),
        sum(col("n_tok")).as("sum_tok"))
      .withColumn("pad_waste_ppm", expr(
        "1000000 * (n_docs * max_tok - sum_tok) DIV (n_docs * max_tok)"))
      .select(col("bucket"), col("batch_id"), col("n_docs"),
        col("max_tok"), col("sum_tok"), col("pad_waste_ppm"))
      .orderBy(col("bucket"), col("batch_id"))
  }

  val batchPlanSql: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, n_tok,
       |    CAST(length(bin(n_tok)) AS BIGINT) AS bucket,
       |    ${TextQueries.seededHashSqlExpr("doc_id", 19L)} AS h
       |  FROM q),
       |r AS (
       |  SELECT bucket, n_tok,
       |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1
       |      AS rk
       |  FROM b),
       |g AS (
       |  SELECT bucket, rk // $BatchSize AS batch_id,
       |    COUNT(*) AS n_docs, MAX(n_tok) AS max_tok,
       |    CAST(SUM(n_tok) AS BIGINT) AS sum_tok
       |  FROM r GROUP BY 1, 2)
       |SELECT bucket, CAST(batch_id AS BIGINT) AS batch_id,
       |  CAST(n_docs AS BIGINT) AS n_docs, max_tok, sum_tok,
       |  CAST(1000000 * (n_docs * max_tok - sum_tok) //
       |    (n_docs * max_tok) AS BIGINT) AS pad_waste_ppm
       |FROM g
       |ORDER BY bucket, batch_id""".stripMargin
}
