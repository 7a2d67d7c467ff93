package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupOps, VideoOps}
import SparkFixture.spark

/** Video modality: GVID container golden bytes, parse round-trip,
  * garbage totality, frame-set-Jaccard near-dup semantics against an
  * independent all-pairs reference, the df-cap exclusion contract,
  * and cluster-label resolution over the pair graph. */
class VideoSpec extends AnyFunSuite {

  import spark.implicits._

  test("synthVideo(1, \"AB\") emits the hand-derived GVID golden " +
    "(header fields little-endian, text-only frame pixels, +f term)") {
    val p = VideoOps.synthVideo(1L, "AB")
    // len=2 → w=4, h=2, fbytes=8; id=1 → nf=2; total 20 + 16
    assert(p.length == 36)
    val header = Array[Int](
      'G', 'V', 'I', 'D', 2, 0, 0, 0, 4, 0, 0, 0, 2, 0, 0, 0, 8, 0, 0, 0)
    assert(p.take(20).map(_ & 0xFF).toSeq == header.toSeq)
    // frame 0: idx p%2 alternates A,B → (65·31)%256=223, (66·31)%256=254
    assert(p.slice(20, 28).map(_ & 0xFF).toSeq ==
      Seq(223, 254, 223, 254, 223, 254, 223, 254))
    // frame 1: idx (7+p)%2 alternates B,A; +1 term → 255, 224
    assert(p.slice(28, 36).map(_ & 0xFF).toSeq ==
      Seq(255, 224, 255, 224, 255, 224, 255, 224))
  }

  test("parseVideo reads every header field back out of the planted " +
    "bytes and verifies the container length identity") {
    val planted = Seq(
      1L -> VideoOps.synthVideo(1L, "AB"),
      12L -> VideoOps.synthVideo(12L, "hello world"),
      999L -> VideoOps.synthVideo(999L, "x"))
    val rows = VideoOps.parseVideo(planted.toDF("id", "payload"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getLong(1) == 2L && r1.getLong(2) == 4L && // nf, w
      r1.getLong(3) == 2L && r1.getLong(4) == 8L &&      // h, fps
      r1.getLong(5) == 36L && r1.getBoolean(7))          // size, chk_ok
    // frame0_sum: 4 × (223 + 254)
    assert(r1.getLong(6) == 4L * (223 + 254))
    // "hello world": len=11 → w=5, h=4; id=12 → nf=5
    val r12 = rows(12L)
    assert(r12.getLong(1) == 5L && r12.getLong(2) == 5L &&
      r12.getLong(3) == 4L && r12.getBoolean(7))
    assert(rows(999L).getBoolean(7))
  }

  test("parseVideo and videoFrameSets are total on garbage payloads " +
    "(corrupt rows fail chk_ok and never reach the pair join)") {
    val good = VideoOps.synthVideo(5L, "some words")
    val garbage: Seq[(Long, Array[Byte])] = Seq(
      1L -> Array.empty[Byte],
      2L -> Array.fill(7)(0xFF.toByte),
      3L -> ("NOPE".getBytes ++ good.drop(4)),   // wrong magic
      4L -> good.dropRight(3),                   // truncated frames
      5L -> (good :+ 0x00.toByte),               // padded past identity
      6L -> {                                    // billion-frame header
        val p = good.clone(); p(4) = 0xFF.toByte; p(7) = 0x7F.toByte; p
      },
      7L -> good)                                // one valid control row
    val parsed = VideoOps.parseVideo(garbage.toDF("id", "payload"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(7)).exists(_.asInstanceOf[Boolean])).toMap
    assert((1L to 6L).forall(!parsed(_)), s"corrupt rows must fail: $parsed")
    assert(parsed(7L), "the valid control row must verify")
    val sets = VideoOps.videoFrameSets(garbage.toDF("id", "payload"))
      .select("id").distinct().as[Long].collect().toSet
    assert(sets == Set(7L), s"only the valid payload yields frames: $sets")
  }

  test("dedup_video: trimmed same-content videos pair at the Jaccard " +
    "threshold, and the engine equals an independent all-pairs " +
    "frame-set reference") {
    val t = "hello world"
    val planted = Seq(
      7L -> VideoOps.synthVideo(7L, t),   // nf=8
      3L -> VideoOps.synthVideo(3L, t),   // nf=4 — prefix of 7's frames
      1L -> VideoOps.synthVideo(1L, t),   // nf=2 — prefix of both
      4L -> VideoOps.synthVideo(4L, "other text entirely"))
    // independent reference: slice frames straight off the bytes
    def frames(p: Array[Byte]): Set[Seq[Byte]] = {
      def u32(off: Int): Int =
        (0 until 4).map(k => (p(off + k) & 0xFF) << (8 * k)).sum
      val (nf, w, h) = (u32(4), u32(8), u32(12))
      (0 until nf).map(f =>
        p.slice(20 + f * w * h, 20 + (f + 1) * w * h).toSeq).toSet
    }
    val fs = planted.map { case (id, p) => id -> frames(p) }.toMap
    val refPairs = (for {
      (i, si) <- fs; (j, sj) <- fs if i < j
      shared = (si intersect sj).size if shared > 0
      jppm = 1000000L * shared / (si.size + sj.size - shared)
      if jppm >= VideoOps.VideoJaccardPpm
    } yield (i, j, shared.toLong, jppm)).toSet
    // the plant's own semantics: 8/4 frames → J=0.5 in; 8/2 → 0.25 out
    assert(refPairs.map(p => (p._1, p._2)) == Set((3L, 7L), (1L, 3L)))
    val got = VideoOps.videoDedupPairs(planted.toDF("id", "payload"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == refPairs, s"engine $got != reference $refPairs")
  }

  test("df cap: a frame carried by more videos than VideoDfCap is " +
    "excluded from candidates AND set sizes; under-cap groups pair") {
    // 51 single-frame videos of the same text → df=51 > 50 → silent
    val ubiquitous = (0 until 51).map(k => (k * 8L) ->
      VideoOps.synthVideo(k * 8L, "Q")) // id%8==0 → nf=1, same frame
    // a 2-video identical pair (same text, same nf) stays under cap
    val pairA = 15L -> VideoOps.synthVideo(15L, "RST")
    val pairB = 23L -> VideoOps.synthVideo(23L, "RST") // both nf=8
    val got = VideoOps.videoDedupPairs(
        (ubiquitous ++ Seq(pairA, pairB)).toDF("id", "payload"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .toSet
    assert(got == Set((15L, 23L, 1000000L)),
      s"only the under-cap identical pair survives: $got")
  }

  test("video cluster labels: the trim chain resolves to one component " +
    "with the min id as survivor and the right size") {
    val t = "hello world"
    val planted = Seq(
      7L -> VideoOps.synthVideo(7L, t),
      3L -> VideoOps.synthVideo(3L, t),
      1L -> VideoOps.synthVideo(1L, t),
      4L -> VideoOps.synthVideo(4L, "other text entirely"))
    // (1,3) and (3,7) edges → {1,3,7} one component, keep 1, size 3
    val pairs = VideoOps.videoDedupPairs(planted.toDF("id", "payload"))
      .select("i", "j")
    val labels = DedupOps.resolveDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 3L -> 1L, 7L -> 1L))
  }

  test("dedup_video_ingest: the arrival slice finds exactly its live " +
    "near-dups under the live-side df cap (engine == all-pairs " +
    "batch-by-live reference on the corpus)") {
    import org.apache.spark.sql.functions.col
    val dir = SparkFixture.Sf0001
    // independent reference: frame sets straight off the synthesized
    // bytes, df cap computed on the live side only
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.nonEmpty)
    // the fingerprint includes the DIMENSIONS (a 6-byte frame of a
    // 3x2 video is not the same frame as a byte-identical 2x3 one) —
    // keying on bytes alone admits cross-text collisions the operator
    // is defined to reject
    def frames(id: Long, t: String): Set[(Int, Int, Seq[Byte])] = {
      val p = VideoOps.synthVideo(id, t)
      def u32(off: Int): Int =
        (0 until 4).map(k => (p(off + k) & 0xFF) << (8 * k)).sum
      val (nf, w, h) = (u32(4), u32(8), u32(12))
      (0 until nf).map(f => (w, h,
        p.slice(20 + f * w * h, 20 + (f + 1) * w * h).toSeq)).toSet
    }
    val all = docs.map { case (id, t) => id -> frames(id, t) }
    val (batch, live) = all.partition(
      _._1 % VideoOps.VideoIngestMod == VideoOps.VideoIngestRem)
    val liveDf = live.flatMap(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.size }
    val overCap = liveDf.filter(_._2 > VideoOps.VideoDfCap).keySet
    def kept(s: Set[(Int, Int, Seq[Byte])]) = s -- overCap
    val ref = (for {
      (bi, bs) <- batch.map { case (i, s) => (i, kept(s)) }
      (li, ls) <- live.map { case (i, s) => (i, kept(s)) }
      shared = (bs intersect ls).size if shared > 0
      if bs.nonEmpty && ls.nonEmpty
      jppm = 1000000L * shared / (bs.size + ls.size - shared)
      if jppm >= VideoOps.VideoJaccardPpm
    } yield (bi, li, shared.toLong, jppm)).toSet
    val got = VideoOps.dedupVideoIngest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == ref, s"engine $got != reference $ref")
    // every emitted pair crosses the slice boundary
    got.foreach { case (n, l, _, _) =>
      assert(n % VideoOps.VideoIngestMod == VideoOps.VideoIngestRem &&
        l % VideoOps.VideoIngestMod != VideoOps.VideoIngestRem)
    }
    assert(got.nonEmpty, "vacuous fixture: no cross-boundary pair")
  }
}
