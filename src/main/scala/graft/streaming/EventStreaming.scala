package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface — ADDITIVE to the reference, which has
  * no incremental processing at all ("streaming" in mrjob means Hadoop
  * Streaming batch pipes, SURVEY §1.1). Not oracle-gated; validated by
  * StreamingSpec driving the same parquet through the streaming and
  * batch plans and comparing.
  *
  * Scale posture: watermark + windowed agg is the canonical unbounded
  * aggregation (state pruned past the watermark);
  * mapGroupsWithState keeps per-key state bounded by the key space.
  */
object EventStreaming {

  /** events.parquet schema as currently generated (µs-precision
    * TIMESTAMP_NTZ ts; see Tables.epochMicros for the encoding
    * history). Used as the fallback when the landing dir is still
    * empty at stream definition time. */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** FileStreamSource needs an explicit schema; sniff the actual one
    * from the landing dir's parquet footers (one batch-read of
    * metadata) so the stream tracks whatever physical ts encoding the
    * files carry. Failure discipline: only a not-yet-inferable dir
    * (empty/absent — AnalysisException) falls back to [[EventSchema]];
    * a readable dir whose files LACK `ts` fails loudly here, at
    * definition time, instead of streaming all-null ts_us into
    * silently-empty windows, and any other error (corrupt footer,
    * permissions) propagates untouched. */
  private def sniffSchema(spark: SparkSession, dir: String): StructType =
    try {
      val s = spark.read.parquet(dir).schema
      require(s.fieldNames.contains("ts"),
        s"events landing dir $dir has schema <${s.simpleString}> " +
          "without a 'ts' column — not an events table")
      s
    } catch {
      case _: org.apache.spark.sql.AnalysisException => EventSchema
    }

  /** The shared streaming source: events landing dir → stream with a
    * normalized `ts_us` epoch-micros column (the streaming twin of
    * Tables.events). The two-arg overload lets a caller that needs
    * several branches of one source (attributionStream's self-join)
    * sniff the dir once. */
  private def eventStream(spark: SparkSession, eventsDir: String): DataFrame =
    eventStream(spark, eventsDir, sniffSchema(spark, eventsDir))

  private def eventStream(spark: SparkSession, eventsDir: String,
      schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .parquet(eventsDir)
      .withColumn("ts_us",
        graft.sources.Tables.epochMicros(schema("ts").dataType))

  /** Streaming hourly windowed counts per event type with a 1-hour
    * watermark — the incremental version of EventQueries.eventsHourly.
    * `eventsDir` must be a DIRECTORY of parquet files (FileStreamSource
    * contract — new files appearing there enter the stream). */
  def hourlyCounts(spark: SparkSession, eventsDir: String): DataFrame =
    eventStream(spark, eventsDir)
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"))

  case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  case class SessionState(start_us: Long, end_us: Long, n_events: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long)

  /** Streaming gap-based sessionization — the incremental version of
    * EventQueries.eventsSessionize. Per user, events within `gapMin`
    * minutes of each other share a session; a session CLOSES when the
    * gap passes (next event too late, or event-time timeout once the
    * watermark moves past end + gap). The still-open trailing session
    * per user stays in state — exactly the at-scale contract: state
    * holds one open session per active key, nothing else.
    *
    * Within one micro-batch a key's events are sorted in memory —
    * bounded by per-key-per-batch volume, the standard
    * flatMapGroupsWithState trade. */
  def sessionize(spark: SparkSession, eventsDir: String,
      gapMin: Int = 30): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapUs = gapMin.toLong * 60 * 1000000
    eventStream(spark, eventsDir)
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", s"$gapMin minutes")
      // keep the watermarked attribute itself in the projection — the
      // stateful operator requires it to survive to its input
      .select(col("user_id").as[Long],
        col("event_ts").as[java.time.Instant],
        col("ts_us").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.time.Instant, Long)],
         state: GroupState[SessionState]) =>
          // hasTimedOut is the CONTRACTUAL timeout signal — an empty
          // iterator happens to coincide today, but the GroupState API
          // does not promise it (a state-visiting pass without a
          // timeout would have closed live sessions early)
          if (state.hasTimedOut) {
            // event-time timeout: watermark passed end + gap → close
            val closed = state.getOption.map(s =>
              ClosedSession(user, s.start_us, s.end_us, s.n_events))
            state.remove()
            closed.iterator
          } else {
            val times = rows.map(_._3).toArray.sorted
            var sessions = List.empty[SessionState]
            var cur = state.getOption.orNull
            times.foreach { t =>
              cur match {
                case null =>
                  cur = SessionState(t, t, 1)
                case s if t - s.end_us <= gapUs =>
                  // min/max, not overwrite: a LATER batch can deliver
                  // an event OLDER than the session end (in-watermark
                  // out-of-order arrival) — writing end_us = t would
                  // regress the end and corrupt the next gap check
                  cur = SessionState(math.min(s.start_us, t),
                    math.max(s.end_us, t), s.n_events + 1)
                case s =>
                  sessions ::= s
                  cur = SessionState(t, t, 1)
              }
            }
            // cur is null only on a no-timeout call with no rows and
            // no prior state — nothing to track, nothing to time out
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end_us / 1000 + gapUs / 1000)
            }
            sessions.reverse.iterator.map(s =>
              ClosedSession(user, s.start_us, s.end_us, s.n_events))
          }
      }
  }

  /** Streaming exact dedup on ingest — the training-pipeline "dedup at
    * the door" operator: duplicate records (same event_id) arriving
    * within the watermark horizon are dropped incrementally.
    * `dropDuplicatesWithinWatermark` keeps only ids newer than the
    * watermark in state — bounded, unlike a plain streaming
    * dropDuplicates whose id state grows forever; at 100 TB/day of
    * ingest that bound is the difference between a working stream and
    * an OOM. */
  def dedupStream(spark: SparkSession, eventsDir: String): DataFrame =
    eventStream(spark, eventsDir)
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  case class HeavyHitterEst(shard: Int, word: String, est: Long)

  /** Streaming Misra-Gries heavy hitters: the batch SketchOps kernel
    * carried as mapGroupsWithState state, one MG summary per state
    * shard. Memory is k counters per shard FOREVER — the property a
    * streaming top-k needs (a plain streaming groupBy(word).count()
    * holds the whole vocabulary in state).
    *
    * CONSUMPTION CONTRACT (Update mode): each micro-batch re-emits
    * the shard's full CUMULATIVE snapshot, so rows are re-emissions,
    * not deltas — union-summing across batches double-counts. A
    * consumer keeps the LATEST row per (shard, word) (the shard id is
    * in the schema precisely so re-emissions are identifiable), and
    * only then union-sums ACROSS shards of one snapshot generation —
    * that cross-shard sum is the batch-partials merge (mergeable-
    * summaries bound), so candidates-then-exact-verify works
    * incrementally. Spec consumes exactly this way and checks the
    * merged estimates against batch truth under N/(k+1). */
  def heavyHitterStream(spark: SparkSession, docsDir: String,
      k: Int = 32, shards: Int = 8): Dataset[HeavyHitterEst] = {
    import spark.implicits._
    val words = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, " +
        "n_chars LONG")
      .parquet(docsDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("w"), pmod(hash(col("w")), lit(shards)).as("shard"))
      .as[(String, Int)]
    words.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[(String, Int)],
         state: GroupState[Map[String, Long]]) =>
          val mg = new graft.operators.SketchOps.MisraGries(k)
          state.getOption.foreach(mg.seed)
          rows.foreach { case (w, _) => mg.add(w) }
          val snap = mg.result.toMap
          state.update(snap)
          snap.iterator.map { case (w, c) => HeavyHitterEst(shard, w, c) }
      }
  }

  /** Stateful per-user running totals via mapGroupsWithState — the
    * custom-state escape hatch (what a stateful reducer would be if
    * the reference had streaming). */
  def userRunningTotals(spark: SparkSession,
      eventsDir: String): Dataset[UserRunning] = {
    import spark.implicits._
    val events = eventStream(spark, eventsDir)
      .select(col("user_id").as[Long], col("value").as[Double])
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0d))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserRunning(user, n, tot)
          state.update(next)
          next
      }
  }

  /** Stream-stream interval join: each click joined to the same user's
    * purchases landing in (click, click + 1 h] — the incremental form
    * of EventQueries.eventsAttribution's bucketized range join.
    *
    * Batch bucketizes to avoid a per-user cross product; streaming
    * instead bounds STATE with watermarks + the event-time range
    * condition: clicks wait at most 1 h of event time for a matching
    * purchase, so the click buffer holds ≤ 2 h (watermark + range) and
    * the purchase buffer ≤ 1 h past its watermark — both pruned as the
    * watermark advances. That state bound is the whole point: an
    * unbounded-state stream join is the streaming analog of the
    * cartesian scan the batch side refused to plan. */
  def attributionStream(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = sniffSchema(spark, eventsDir) // once for both branches
    def src = eventStream(spark, eventsDir, schema)
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("event_ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"), col("c_ts"), col("p_ts"))
  }

  /** Streaming upsert via foreachBatch — the merge-into-target
    * pattern every streaming ingest runs (the incremental form of
    * PipelineOps.corpusMerge): each micro-batch is folded into a
    * parquet target with latest-ts-wins per event_id, so replayed or
    * duplicated input files UPSERT instead of appending duplicates.
    * foreachBatch is the escape hatch Structured Streaming provides
    * exactly for sinks with merge semantics; on Delta/Iceberg the
    * body would be a single MERGE INTO — here it's read-merge-write
    * to a tmp dir then the two-rename swap (GraftFs.compactParquet's
    * contract: one-rename exposure window, not a true atomic swap).
    *
    * State story: the TARGET holds the state — the stream itself
    * keeps none (no watermark, no state store), which is what makes
    * the pattern restart-safe: reprocessed batches are idempotent
    * because the merge key dedups them, and a crash between the two
    * swap renames is recovered at the next batch by restoring the
    * _merge_old backup before merging. */
  def upsertStream(spark: SparkSession, eventsDir: String,
      targetDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream
      .schema(sniffSchema(spark, eventsDir)) // raw columns ride the merge
      .parquet(eventsDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        val fs = graft.sources.GraftFs(s)
        // crash recovery: a crash between the two swap renames leaves
        // the target ABSENT and the previous state stranded in
        // _merge_old — restore it before merging, or the replayed
        // batch would rebuild from itself alone and the delete below
        // would destroy the only copy of prior history
        val p0 = new org.apache.hadoop.fs.Path(targetDir)
        val hfs0 = p0.getFileSystem(s.sparkContext.hadoopConfiguration)
        val old0 = new org.apache.hadoop.fs.Path(
          targetDir.stripSuffix("/") + "_merge_old")
        // rename() reports failure by BOOLEAN, not exception — an
        // unchecked false here would let the batch "succeed" over a
        // missing/corrupt target (same contract as GraftFs.compactParquet)
        if (!hfs0.exists(p0) && hfs0.exists(old0))
          require(hfs0.rename(old0, p0),
            s"upsert recovery: rename($old0, $p0) failed")
        // EVERY EventSchema column rides the merge — an earlier
        // version projected props away, silently dropping it from
        // the target on the first merged batch
        val incoming = batch.select(col("event_id"), col("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        val merged = (if (fs.exists(s"$targetDir/part-*"))
          s.read.parquet(targetDir).unionByName(incoming)
        else incoming)
          .groupBy(col("event_id"))
          .agg(max(struct(col("ts"), col("user_id"), col("event_type"),
            col("value"), col("props"))).as("m"))
          .select(col("event_id"), col("m.ts"), col("m.user_id"),
            col("m.event_type"), col("m.value"), col("m.props"))
        val tmp = targetDir.stripSuffix("/") + "_merge_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        val conf = s.sparkContext.hadoopConfiguration
        val p = new org.apache.hadoop.fs.Path(targetDir)
        val hfs = p.getFileSystem(conf)
        val old = new org.apache.hadoop.fs.Path(
          targetDir.stripSuffix("/") + "_merge_old")
        hfs.delete(old, true)
        // checked swap: if rename(p, old) silently failed, the next
        // rename would move tmp INSIDE the still-present target dir and
        // report success over a corrupted layout — abort the batch
        // instead (foreachBatch rethrows → query fails loudly; recovery
        // above restores _merge_old on restart)
        if (hfs.exists(p))
          require(hfs.rename(p, old), s"upsert swap: rename($p, $old) failed")
        require(hfs.rename(new org.apache.hadoop.fs.Path(tmp), p),
          s"upsert swap: rename($tmp, $p) failed")
        hfs.delete(old, true)
        ()
      }
      .start()
  }

  /** Stream-static enrichment join: the event stream joined to a
    * STATIC dimension (per-user segment derived from `customer`) —
    * the remaining canonical Structured Streaming join shape
    * (stream-stream is attributionStream). The static side is planned
    * per micro-batch as an ordinary batch relation: no watermark, no
    * state — on a cluster the dim is broadcast into each batch (or
    * re-read if it changed), which is why enrichment dims should stay
    * small or bucketed. Output: per (segment, event_type) running
    * counts in update mode. */
  def enrichedCounts(spark: SparkSession, eventsDir: String,
      tablesDir: String): DataFrame = {
    val dim = graft.sources.Tables.load(spark, tablesDir, "customer")
      .select((col("c_custkey") % 200).as("user_id"),
        (col("c_custkey") % 5).cast("long").as("segment"))
      .groupBy(col("user_id")).agg(min(col("segment")).as("segment"))
    spark.readStream
      .schema(sniffSchema(spark, eventsDir))
      .parquet(eventsDir)
      .join(dim, Seq("user_id"), "left")
      .select(coalesce(col("segment"), lit(-1L)).as("segment"),
        col("event_type"))
      .groupBy(col("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  case class QuantileSnap(event_type: String, n_events: Long,
      p50_cents: Long, p95_cents: Long, p99_cents: Long)

  /** Streaming exact-histogram quantiles: per event type, a running
    * value-cents histogram carried as mapGroupsWithState state, with
    * p50/p95/p99 re-derived from the cumulative counts each
    * micro-batch — the incremental form of
    * [[graft.operators.EventQueries.eventsQuantilesExact]]'s
    * histogram-running-sum idiom (same pX = min{c : 100·cum ≥ X·n}
    * integer-rank definition, no interpolation).
    *
    * Why a histogram and not a GK/t-digest sketch: histogram counts
    * are ORDER-INDEPENDENT (addition commutes), so the streaming
    * answer is bit-equal to the batch answer at every snapshot — an
    * exactness contract no merge-order-sensitive sketch gives, and
    * the property the spec pins (N-micro-batch run ≡ one-shot batch).
    *
    * State bound: distinct cents-bins per event type — the VALUE
    * DOMAIN, not the event count; the same domain bound the batch
    * op's histogram shuffle relies on. `binCents` coarsens state by
    * floorDiv-bucketing cents (state ≤ domain/binCents; emitted
    * quantiles become bucket lower bounds, error < binCents); the
    * default 1 keeps bins = cents and the result exact. Update-mode
    * snapshots: consumers keep the LATEST row per event_type. */
  def quantileStream(spark: SparkSession, eventsDir: String,
      binCents: Long = 1L): Dataset[QuantileSnap] = {
    import spark.implicits._
    require(binCents >= 1, s"binCents must be >= 1, got $binCents")
    val cents = eventStream(spark, eventsDir)
      .select(col("event_type").as[String],
        round(col("value") * 100d).cast("long").as[Long])
    cents.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[(String, Long)],
         state: GroupState[Map[Long, Long]]) =>
          var hist = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { case (_, c) =>
            val bin = Math.floorDiv(c, binCents)
            hist = hist.updated(bin, hist.getOrElse(bin, 0L) + 1L)
          }
          state.update(hist)
          val n = hist.valuesIterator.sum
          val sorted = hist.toArray.sortBy(_._1)
          def q(num: Long, den: Long): Long = {
            var cum = 0L
            var i = 0
            while (i < sorted.length) {
              cum += sorted(i)._2
              if (cum * den >= n * num) return sorted(i)._1 * binCents
              i += 1
            }
            sorted.last._1 * binCents
          }
          QuantileSnap(etype, n, q(1, 2), q(19, 20), q(99, 100))
      }
  }
}
