package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CdcChunks
import graft.operators.DedupOps

/** Content-defined chunking: the partition property (chunks exactly
  * reassemble the document), the shift-resilience property that is
  * CDC's reason to exist, and totality on degenerate inputs. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  private def chunksOf(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("text")
      .select(CdcChunks.chunks(col("text")).as("c"))
      .collect()(0).getSeq[String](0)
  }

  test("chunks exactly partition every corpus document (concat == text, " +
    "zero loss, zero overlap)") {
    import graft.sources.Tables
    val bad = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        concat_ws("", CdcChunks.chunks(col("text"))).as("re"))
      .where(col("text") =!= col("re"))
      .count()
    assert(bad == 0L, s"$bad docs fail the partition property")
  }

  test("shift-resilience: identical content embedded at different " +
    "offsets yields identical interior chunks — the property fixed " +
    "windows lack") {
    // a shared passage long enough to contain synchronized boundaries
    val passage = "the quick brown fox jumps over the lazy dog and " +
      "then runs far away into the deep green forest tonight again"
    val a = chunksOf("PREFIX-A " + passage + " SUFFIX-ONE")
    val b = chunksOf("a completely different and much longer prefix " +
      "sits here " + passage + " other tail")
    // interior chunks (drop first/last two, which straddle the edit
    // boundaries) of the passage must appear in BOTH chunkings
    val shared = a.toSet.intersect(b.toSet)
    assert(shared.exists(_.length >= 8),
      s"no substantial shared chunk despite a shared passage:\n" +
        s"a=$a\nb=$b")
  }

  test("totality: empty, sub-gram, and null inputs") {
    import spark.implicits._
    assert(chunksOf("") == Seq())
    assert(chunksOf("abc") == Seq("abc"),
      "text shorter than the gram is one chunk")
    val r = Seq[Option[String]](None).toDF("text")
      .select(CdcChunks.chunks(col("text")).as("c")).collect()(0)
    assert(r.isNullAt(0), "null text → null chunk list")
  }

  test("boundary rule matches the oracle's arithmetic on a hand case") {
    // find a boundary by brute force and confirm chunk split there
    val s = "key agg row scan slow fast table value part hash"
    val cps = s.toCharArray.map(_.toInt)
    val cuts = (3 until cps.length).filter { i =>
      (((cps(i - 3).toLong * 31 + cps(i - 2)) * 31 +
        cps(i - 1)) * 31 + cps(i)) % CdcChunks.Mask == 0L
    }
    val got = chunksOf(s)
    val wantSizes = (cuts.map(_ + 1) :+ cps.length)
      .distinct.sorted
      .foldLeft((Seq.empty[Int], 0)) { case ((acc, prev), e) =>
        (acc :+ (e - prev), e)
      }._1
    assert(got.map(_.length) == wantSizes,
      s"cuts=$cuts got=${got.map(_.length)} want=$wantSizes")
  }

  test("dedup_cdc registered row: n_big <= n_chunks, dup_big <= n_big, " +
    "and the fixture carries real cross-doc chunk duplication") {
    val rows = DedupOps.dedupCdc(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, nb, db, ppm) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(nb <= nc && db <= nb,
        s"count sanity violated: $r")
      assert(ppm == (if (nb > 0) db * 1000000L / nb else 0L))
    }
    assert(rows.map(_.getLong(3)).sum > 0,
      "word-salad corpus must share some >=8-cp chunks")
  }
}
