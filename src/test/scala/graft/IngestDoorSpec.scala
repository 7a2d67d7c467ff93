package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.{DedupOps, IngestDoor}
import graft.streaming.IngestStreaming

/** The composed ingest door (VERDICT r10 #5): the five gate stages as
  * ONE pipeline — gate semantics on a planted corpus, and the
  * streaming composition equals the one-shot batch row across a
  * forced multi-micro-batch split. */
class IngestDoorSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  private def docsOf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def emptyPrior(live: org.apache.spark.sql.DataFrame) =
    DedupOps.mintedCanonUrls(live.limit(0)).select(col("canon_url"))

  test("door gates: url dup, near dup, contamination, low quality " +
    "each block; a clean arrival admits") {
    // live corpus: id 0 is the benchmark doc (0 % 97 == 0), id 10 the
    // url-dup target (source shared with arrival 11; both DIV 140 ==
    // 0 so the canon collides), id 12 the near-dup target
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val nearText = "one two three four five six seven eight nine ten"
    val live = docsOf(Seq(
      (0L, benchText, "bench"),
      (10L, "completely different words here entirely", "shared"),
      (12L, nearText, "l12")))
    val idx = IngestDoor.doorIndex(live)
    // arrivals (all % 97 != 0, distinct sources unless noted):
    //  11 — same source as live 10 → same canon page → URL-blocked
    //  13 — same text as live 12   → jaccard 1 → near-dup-blocked
    //  17 — contains the benchmark shingles → contamination-blocked
    //  19 — one token repeated     → quality floor blocks
    //  21 — clean                  → admitted
    val arrivals = docsOf(Seq(
      (11L, "fresh arrival text with plenty of distinct tokens", "shared"),
      (13L, nearText, "a13"),
      (17L, "prefix " + benchText + " suffix words", "a17"),
      (19L, ("dup " * 40).trim, "a19"),
      (21L, "a genuinely novel clean document with varied words", "a21")))
    val out = IngestDoor.doorFrame(arrivals, idx, emptyPrior(live))
      .orderBy(col("doc_id"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getLong(6), r.getLong(7), r.getBoolean(9)))
      .toMap
    // (url_ok, near_dup_ppm, contam_hits, admit)
    assert(out(11L)._1 === false, "url dup must fail the URL gate")
    assert(out(11L)._4 === false)
    assert(out(13L)._1 === true)
    assert(out(13L)._2 === 1000000L, "identical text → jaccard 1")
    assert(out(13L)._4 === false)
    assert(out(17L)._3 >= IngestDoor.ContamGate,
      "benchmark shingles must register as contamination")
    assert(out(17L)._4 === false)
    assert(out(19L)._4 === false, "repeated-token doc is under the " +
      "quality floor")
    assert(out(21L)._1 === true)
    assert(out(21L)._4 === true, "clean arrival must admit")
  }

  test("registered ingest_door row: one row per arrival, ordered") {
    val d = graft.sources.Tables.load(spark, dir, "documents")
    val nArr = d.filter(
      col("doc_id") % DedupOps.IngestMod === DedupOps.IngestRem).count()
    val rows = IngestDoor.ingestDoor(spark, dir).collect()
    assert(rows.length.toLong === nArr)
    assert(rows.map(_.getLong(0)).toSeq ===
      rows.map(_.getLong(0)).sorted.toSeq)
    assert(rows.exists(_.getBoolean(9)), "some arrival must admit")
    assert(rows.exists(!_.getBoolean(9)), "some arrival must be gated")
  }

  test("door stream survives a checkpoint RESTART mid-corpus: the " +
    "admitted table is not re-seeded, processed files are not " +
    "re-read, and cross-restart URL first-wins holds") {
    val d = graft.sources.Tables.load(spark, dir, "documents")
    val isNew = col("doc_id") % DedupOps.IngestMod === DedupOps.IngestRem
    val live = d.filter(!isNew)
    val arriving = d.filter(isNew)
    val ids = arriving.select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    val tmp = Files.createTempDirectory("graft_door_restart")
    val landing = tmp.resolve("landing").toString
    val out = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt").toString
    Files.createDirectory(java.nio.file.Paths.get(landing))
    def land(p: org.apache.spark.sql.Column, name: String): Unit = {
      val stage = tmp.resolve(s"stage_$name").toString
      arriving.filter(p).coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        java.nio.file.Paths.get(landing, s"$name.parquet"))
    }
    // first half lands (lower doc_ids — the canon holders), door runs,
    // then goes DOWN
    land(col("doc_id") < cut, "part-0")
    val q1 = IngestStreaming.ingestDoorStream(
      spark, landing, live, out, ckpt)
    try q1.awaitTermination() finally q1.stop()
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)
    // second half arrives while the door is down; the restarted query
    // must (a) NOT overwrite the admitted table with the empty seed
    // (r7 urlDedupStream advice — rows admitted before the restart can
    // never be re-derived), (b) resume the source's processed-file log
    // (a re-read of part-0 would duplicate its rows), and (c) block a
    // post-restart arrival whose canon a PRE-restart arrival already
    // admitted — the cross-restart first-wins state lives in the
    // admitted table itself
    land(col("doc_id") >= cut, "part-1")
    // lose the compact canon-state sibling across the restart: the
    // stream must rebuild it from the admitted table (the r11
    // canon-table change keeps the admitted table the source of
    // truth), so cross-restart first-wins still holds below
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(out + "_canon"))
    val q2 = IngestStreaming.ingestDoorStream(
      spark, landing, live, out, ckpt)
    try q2.awaitTermination() finally q2.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2),
        Option(r.get(3)), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), Option(r.get(8)), r.getBoolean(9)))
      .toSeq
    val got = key(spark.read.parquet(out))
    assert(got.map(_._1).distinct.length === got.length,
      "a restart re-read a processed landing file (duplicate doc_ids)")
    val want = key(IngestDoor.ingestDoor(spark, dir))
    assert(got === want)
    // the cross-restart block is non-vacuous: some post-restart
    // arrival shares a canon with a pre-restart url_ok holder
    val preCanon = got.filter(r => r._1 < cut && r._3).flatMap(_._2).toSet
    assert(got.exists(r => r._1 >= cut && !r._3 &&
        r._2.exists(preCanon.contains)),
      "fixture lost the cross-restart canon collision")
  }

  test("three-landing door stream equals the one-shot batch door, " +
    "including cross-batch URL first-wins") {
    val d = graft.sources.Tables.load(spark, dir, "documents")
    val isNew = col("doc_id") % DedupOps.IngestMod === DedupOps.IngestRem
    val live = d.filter(!isNew)
    val arriving = d.filter(isNew)
    val ids = arriving.select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(ids.length >= 3)
    // doc_id-ordered thirds → first-arrival == min-doc_id, so the
    // streamed union must equal the batch row exactly
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val tmp = Files.createTempDirectory("graft_door_stream")
    val landing = tmp.resolve("landing").toString
    val out = tmp.resolve("out").toString
    val ckpt = tmp.resolve("ckpt").toString
    Files.createDirectory(java.nio.file.Paths.get(landing))
    val slices = Seq(
      col("doc_id") < cuts(0),
      col("doc_id") >= cuts(0) && col("doc_id") < cuts(1),
      col("doc_id") >= cuts(1))
    slices.zipWithIndex.foreach { case (p, i) =>
      val stage = tmp.resolve(s"stage$i").toString
      arriving.filter(p).coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        java.nio.file.Paths.get(landing, s"part-$i.parquet"))
    }
    val q = IngestStreaming.ingestDoorStream(
      spark, landing, live, out, ckpt, maxFilesPerTrigger = Some(1))
    try q.awaitTermination() finally q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2),
        Option(r.get(3)), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), Option(r.get(8)), r.getBoolean(9)))
      .toSeq
    val got = key(spark.read.parquet(out))
    val want = key(IngestDoor.ingestDoor(spark, dir))
    assert(want.nonEmpty)
    assert(got === want)
  }
}
