package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventQueries, MultimodalOps}
import graft.streaming.EventStreaming

/** Streaming and multimodal plumbing: drive the streaming plans over
  * the batch parquet with processAllAvailable, compare to the batch
  * plans; pin the fake decode against direct computation. */
class StreamingMultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  /** FileStreamSource needs a directory; stage the batch parquet file
    * into one (the production layout — a landing dir of part files). */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("frameSample keeps every Nth fixed-width frame before decode") {
    import spark.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val media = spark.createDataset(Seq(
      MultimodalOps.MediaRecord(1L, payload, "video/fake", 0, 0)))
    val frames = MultimodalOps.frameSample(media, frameBytes = 16, every = 2)
      .collect().sortBy(_.frame_idx)
    // 100 bytes → 7 frames (6×16 + 4); sampled idx 0,2,4,6
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    assert(frames(0).frame.toSeq == payload.slice(0, 16).toSeq)
    assert(frames(3).frame.length == 4, "trailing partial frame kept")
  }

  test("resizeEmbedding truncates and zero-pads to the target dim") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "emb")
    val shrunk = df.select(
      MultimodalOps.resizeEmbedding(col("emb"), 2).as("e"))
      .collect()(0).getSeq[Float](0)
    val grown = df.select(
      MultimodalOps.resizeEmbedding(col("emb"), 5).as("e"))
      .collect()(0).getSeq[Float](0)
    assert(shrunk == Seq(1.0f, 2.0f))
    assert(grown == Seq(1.0f, 2.0f, 3.0f, 0.0f, 0.0f))
  }

  test("streaming dedup drops duplicate event_ids incrementally") {
    // landing dir with the same file staged twice → every event is a dup
    val d = java.nio.file.Files.createTempDirectory("graft-dup-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("b.parquet"))
    val q = EventStreaming.dedupStream(spark, d.toString).writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select(countDistinct(col("event_id")), count(lit(1)))
        .collect()(0)
      val exact = graft.sources.Tables.load(spark, dir, "events")
        .select(countDistinct(col("event_id"))).collect()(0).getLong(0)
      assert(got.getLong(0) == exact, "every distinct id survives")
      assert(got.getLong(1) == exact, s"duplicates not dropped: ${got.getLong(1)} rows")
    } finally q.stop()
  }

  test("streaming hourly counts match the batch aggregation") {
    val q = EventStreaming.hourlyCounts(spark, eventsDir).writeStream
      .outputMode("complete")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_out")
        .select("hour", "event_type", "n")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val expect = EventQueries.eventsHourly(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got == expect)
    } finally q.stop()
  }

  test("foreachBatch upsert: replayed input files merge, not duplicate") {
    val src = java.nio.file.Files.createTempDirectory("graft-upsert-src")
    val tgt = java.nio.file.Files
      .createTempDirectory("graft-upsert-tgt").toString + "/state"
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("b1.parquet"))
    val q = EventStreaming.upsertStream(spark, src.toString, tgt)
    try {
      q.processAllAvailable()
      // replay: the SAME events land again as a new file (at-least-once
      // delivery) — the merge key must dedup them
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        src.resolve("b2.parquet"))
      q.processAllAvailable()
      val got = spark.read.parquet(tgt)
      val expect = graft.sources.Tables.load(spark, dir, "events")
      assert(got.count() == expect.count(),
        "replayed file duplicated rows instead of upserting")
      assert(got.select(col("event_id")).distinct().count() == expect.count())
      // ts payload comparison via the type-dispatched epoch-micros
      // projection (ts is TIMESTAMP in the current parquet)
      def dsum(df: org.apache.spark.sql.DataFrame) =
        df.agg(sum(graft.sources.Tables.epochMicros(
          df.schema("ts").dataType).cast("decimal(38,0)"))).head().getDecimal(0)
      val (gs, es) = (dsum(got), dsum(expect))
      assert(gs == es, "merged payloads drifted from the source")
      // EVERY schema column must survive the merge — a review catch:
      // props was once projected away by the upsert body
      assert(got.columns.sorted.toSeq == expect.columns.sorted.toSeq,
        s"upsert dropped columns: ${got.columns.toSeq}")
      val psum = sum(length(col("props")).cast("decimal(38,0)"))
      assert(got.agg(psum).head().getDecimal(0) ==
        expect.agg(psum).head().getDecimal(0),
        "props payload drifted through the merge")
    } finally q.stop()
  }

  test("stream-static enrichment join matches the batch join, no state") {
    val q = EventStreaming.enrichedCounts(spark, eventsDir, dir).writeStream
      .outputMode("complete")
      .format("memory").queryName("enriched_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("enriched_out")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      // batch replay of the same dim derivation + join + agg
      val dim = graft.sources.Tables.load(spark, dir, "customer")
        .select((col("c_custkey") % 200).as("user_id"),
          (col("c_custkey") % 5).cast("long").as("segment"))
        .groupBy(col("user_id")).agg(min(col("segment")).as("segment"))
      val expect = graft.sources.Tables.load(spark, dir, "events")
        .join(dim, Seq("user_id"), "left")
        .select(coalesce(col("segment"), lit(-1L)).as("segment"),
          col("event_type"))
        .groupBy(col("segment"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(got == expect)
      assert(got.keys.map(_._1).toSet.size > 1, "dim never matched")
    } finally q.stop()
  }

  test("stateful running totals cover every user with batch-equal counts") {
    val q = EventStreaming.userRunningTotals(spark, eventsDir).writeStream
      .outputMode("update")
      .format("memory").queryName("running_out")
      .start()
    try {
      q.processAllAvailable()
      // last update per user = final running state
      val got = spark.table("running_out")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = graft.sources.Tables.load(spark, dir, "events")
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally q.stop()
  }

  test("streaming sessionize closes every batch session except the trailing one per user") {
    val q = EventStreaming.sessionize(spark, eventsDir).writeStream
      .outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()
    try {
      q.processAllAvailable()
      val closed = spark.table("sessions_out")
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = EventQueries.eventsSessionize(spark, dir)
        .groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // all sessions close except possibly each user's trailing one
      // (it DOES close when the global watermark passed its end + gap
      // — the event-time timeout path)
      batch.foreach { case (user, n) =>
        val c = closed.getOrElse(user, 0L)
        assert(c == n - 1 || c == n,
          s"user $user: $c closed vs $n batch")
      }
      // per-session shape also matches: compare (start, end, n) sets
      val closedRows = spark.table("sessions_out")
        .select("user_id", "start_us", "end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val batchRows = EventQueries.eventsSessionize(spark, dir)
        .select("user_id", "start_us", "end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(closedRows.subsetOf(batchRows))
    } finally q.stop()
  }

  test("stream-stream interval join matches batch attribution counts") {
    val q = EventStreaming.attributionStream(spark, eventsDir).writeStream
      .outputMode("append")
      .format("memory").queryName("attr_out")
      .start()
    try {
      q.processAllAvailable()
      // per-click matched-purchase counts; batch rows with 0 purchases
      // have no streaming counterpart (inner join)
      val got = spark.table("attr_out")
        .groupBy("click_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = EventQueries.eventsAttribution(spark, dir)
        .collect().map(r => r.getAs[Long]("event_id") ->
          r.getAs[Long]("n_purchases")).toMap
        .filter(_._2 > 0)
      assert(got == expect)
    } finally q.stop()
  }

  test("streaming MG heavy hitters: merged shard estimates bound the truth") {
    val docsDir = {
      val d = java.nio.file.Files.createTempDirectory("graft-docs")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        d.resolve("documents.parquet"))
      d.toString
    }
    val k = 16
    val q = EventStreaming.heavyHitterStream(spark, docsDir, k = k)
      .writeStream.outputMode("update")
      .format("memory").queryName("hh_out")
      .start()
    try {
      q.processAllAvailable()
      // the consumption contract: latest row per (shard, word), THEN
      // union-sum across shards — with a single batch the table holds
      // exactly one snapshot generation, so the dedup is a no-op and
      // the cross-shard sum is the mergeable-summaries merge
      val snap = spark.table("hh_out")
        .groupBy("shard", "word").agg(last("est").as("est"))
      val est = snap
        .groupBy("word").agg(sum("est").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = graft.sources.Tables.load(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = truth.values.sum
      est.foreach { case (w, e) =>
        assert(e <= truth(w), s"$w overcounted")
      }
      truth.filter { case (_, c) => c * (k + 1) > n }.foreach { case (w, c) =>
        val e = est.getOrElse(w, 0L)
        assert(e > 0, s"heavy key $w missing from merged summaries")
        assert(e >= c - n / (k + 1), s"$w undercount exceeds merged bound")
      }
    } finally q.stop()
  }

  test("multimodal feature extraction matches direct computation") {
    import spark.implicits._
    val feats = MultimodalOps.multimodalFeatures(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val texts = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val cs = bytes.foldLeft(7L)((h, b) => (h * 131 + (b & 0xFF)) % 1000000007L)
      assert(feats(id) == (bytes.length.toLong, cs), s"doc $id")
    }
  }

  test("media table keeps payload binary + typed metadata") {
    val media = MultimodalOps.asMediaTable(spark, dir)
    val schema = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("payload") == "binary")
    assert(media.count() > 0)
  }
}
