package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeOps

/** BPE merge induction pinned against a direct pure-Scala
  * transcription of the published algorithm (Sennrich et al. 2016,
  * learn_bpe): same init (chars + </w>), same weighted pair stats,
  * same deterministic tie-break (count desc, "a b" string asc), same
  * left-to-right non-overlapping merge application. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Per-CODE-POINT split — the engine's `(?s)(.)` regex matches a
    * code point (a surrogate pair is ONE symbol), so the reference
    * must not split on UTF-16 chars. */
  private def charSyms(w: String): Vector[String] =
    w.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))

  /** Reference learner (driver-side, exponential-free, small data). */
  private def refBpe(corpus: Seq[String], merges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity)
      .map { case (w, ws) =>
        (charSyms(w) :+ "</w>") -> ws.size.toLong
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var done = false
    while (k < merges && !done) {
      val stats = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        stats((syms(i), syms(i + 1))) += f
      if (stats.isEmpty) done = true
      else {
        val ((a, b), c) = stats.toSeq
          .minBy { case ((x, y), n) => (-n, x + " " + y) }
        out += ((a, b, c))
        vocab = vocab.map { case (syms, f) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += syms(i); i += 1 }
          }
          nb.result() -> f
        }
        k += 1
      }
    }
    out.result()
  }

  private def check(corpus: Seq[String], merges: Int): Unit = {
    import spark.implicits._
    val got = BpeOps.learnMerges(corpus.toDF("text"), merges)
      .map { case (_, a, b, c) => (a, b, c) }
    val want = refBpe(corpus, merges)
    assert(got == want,
      s"merge tables diverge:\n got=$got\nwant=$want")
  }

  test("bpe merges match the reference algorithm on a planted corpus") {
    check(Seq(
      "low low low low low",
      "lower lower newest newest newest newest newest newest",
      "widest widest widest"), 10)
  }

  test("bpe handles repeats, ties, and single-char words identically") {
    check(Seq(
      "aaa aaa aa a b",
      "abab ab ba",
      "x y z zz"), 12)
  }

  test("bpe stops when fully merged instead of looping") {
    // 2 distinct tiny words exhaust their pairs before 50 merges
    check(Seq("ab ab cd"), 50)
  }

  test("bpe segments embedded line terminators and non-BMP chars " +
      "per code point (the (?s) DOTALL + code-point contract)") {
    // "a\nb" must segment as [a, \n, b], not [a, \nb] (pre-(?s) bug);
    // the emoji (U+1F600, a surrogate pair) must be ONE symbol
    check(Seq("a\nb a\nb a\nb xéy", "😀z 😀z"), 6)
  }

  /** Reference encoder: apply merges in rank order, left-to-right
    * non-overlapping (Sennrich apply_bpe on a single word). */
  private def refEncode(w: String,
      table: Seq[(String, String, Long)]): Seq[String] = {
    var syms = charSyms(w) :+ "</w>"
    for ((a, b, _) <- table) {
      val nb = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          nb += (a + b); i += 2
        } else { nb += syms(i); i += 1 }
      }
      syms = nb.result()
    }
    syms
  }

  test("segmentWords matches the reference encoder word for word") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest newest newest newest newest",
      "widest widest widest")
    val d = corpus.toDF("text")
    val table = BpeOps.learnMerges(d, 8)
    val got = BpeOps.segmentWords(d, table).collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ").toSeq).toMap
    val ref = table.map { case (_, a, b, c) => (a, b, c) }
    corpus.flatMap(_.split(" ")).distinct.foreach { w =>
      assert(got(w) == refEncode(w, ref), s"segmentation diverges on $w")
    }
  }

  test("bpe_encode fertility is consistent: words <= subwords <= chars+1") {
    val out = BpeOps.bpeEncode(spark, "/root/testdata/sf0.001", merges = 4)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (words, subs) = (r.getLong(1), r.getLong(2))
      assert(subs >= words, "every word is at least one subword")
      assert(r.getLong(3) == 1000 * subs / words)
    }
  }

  test("token_fertility: per-(source, lang) sums equal the doc-level " +
    "encode rows, and fertility is >= 1000 milli (subwords >= words)") {
    import org.apache.spark.sql.functions.col
    val dir = SparkFixture.Sf0001
    val docRows = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val enc = BpeOps.bpeEncode(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = enc.groupBy { case (id, _, _) => docRows(id) }
      .map { case ((src, lang), rows) =>
        val (w, t) = (rows.map(_._2).sum, rows.map(_._3).sum)
        (src, lang) -> (rows.size.toLong, w, t, 1000L * t / w)
      }
    val got = BpeOps.tokenFertility(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == ref)
    got.values.foreach { case (_, _, _, f) => assert(f >= 1000L) }
  }
}
