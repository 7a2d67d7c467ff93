package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
import graft.functions.CharEntropyMicro

/** Semantic pins for the round-5 additions: containment-scored
  * doc-in-doc dedup (Broder containment vs the Jaccard resemblance the
  * rest of the dedup family scores) and the zero-shuffle char-entropy
  * quality signal. */
class ContainmentEntropySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Planted containment: doc 1 is doc 0's text wholly embedded in a
    * much longer page (C(1→0 direction): every shingle of 0 appears in
    * 1 — so 0 is contained in 1), docs 2/3 are unrelated, doc 4 is a
    * SHORT quote of 0 (high containment in 0, low resemblance). */
  private def plantedDocs = {
    import spark.implicits._
    val core = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val wrapper = "header menu navigation " + core +
      " footer copyright contact about sitemap terms privacy " +
      "careers press blog community support help faq"
    Seq(
      (0L, core),
      (1L, wrapper),
      (2L, "totally unrelated text about volcanoes and glaciers and " +
        "tectonic plates drifting slowly across the mantle surface"),
      (3L, "another separate document regarding cooking recipes soup " +
        "bread butter salt pepper onion garlic tomato basil"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
  }

  test("containment finds doc-in-doc pairs resemblance misses") {
    val rows = DedupOps.containmentPairs(plantedDocs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // core is fully contained in wrapper: every 3-gram of 0 is in 1
    assert(rows.get((0L, 1L)).contains(1.0),
      s"core→wrapper containment should be 1.0, got ${rows.get((0L, 1L))}")
    // the short quote is fully contained in the core and the wrapper
    assert(rows.get((4L, 0L)).contains(1.0))
    assert(rows.get((4L, 1L)).contains(1.0))
    // containment is DIRECTED: the wrapper is NOT contained in the core
    assert(!rows.contains((1L, 0L)),
      "wrapper→core must stay under the threshold (directed score)")
    // unrelated docs never pair
    assert(!rows.keys.exists(p => p._1 == 2L || p._2 == 2L || p._1 == 3L))
    // resemblance would have missed 4→0: J = |A∩B|/|A∪B| is small
    val j = {
      val a = (0 to 5).toSet // 8 tokens → 6 shingles of doc 4
      val b = (0 to 17).toSet // 20 tokens → 18 shingles of doc 0
      a.size.toDouble / (a.size + b.size - a.size)
    }
    assert(j < DedupOps.ContainTau,
      "sanity: the planted quote is below the Jaccard threshold")
  }

  test("containment respects the rare-shingle df cap") {
    import spark.implicits._
    // every doc shares the same boilerplate 3-gram run; with cap=2 the
    // boilerplate (df=4 > 2) is excluded, so no pairs survive
    val boiler = "one two three four five"
    val d = (0L to 3L).map(i => (i, boiler)).toDF("doc_id", "text")
    assert(DedupOps.containmentPairs(d, cap = 2).count() == 0)
    // with the cap above df they are exact dups: all 12 directed pairs
    assert(DedupOps.containmentPairs(d, cap = 10).count() == 12)
  }

  test("prefix join equals a brute-force shingle-set Jaccard sweep") {
    import spark.implicits._
    // one-word edit inside a 41-token doc: 39 shingles, 3 touched →
    // J = 36/42 ≈ 0.857 ≥ 0.8 — a true near-dup pair; doc 2 shares
    // doc 0's token SET but reshuffled (order-sensitivity probe);
    // 3↔4 exact dup; 5 unrelated
    val base = ('a' to 'z').map(_.toString) ++
      Seq("one", "two", "three", "four", "five", "six", "seven",
        "eight", "nine", "ten", "eleven", "twelve", "thirteen",
        "fourteen", "fifteen")
    val texts = Seq(
      0L -> base.mkString(" "),
      1L -> base.updated(20, "EDIT").mkString(" "),
      2L -> base.reverse.mkString(" "),
      3L -> "totally different tokens here now please",
      4L -> "totally different tokens here now please",
      5L -> "the quick brown fox jumps over the lazy dog tonight")
    val got = DedupOps.prefixJoinPairs(
        texts.toDF("doc_id", "text"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    // brute force over distinct 3-gram shingle sets
    val sets = texts.map { case (id, t) =>
      id -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet }
    val want = (for {
      (i, a) <- sets; (j, b) <- sets if i < j
      inter = (a & b).size
      jac = inter.toDouble / (a.size + b.size - inter)
      if jac >= 0.8
    } yield (i, j) -> jac).toMap
    assert(got == want, s"got=$got want=$want")
    // the planted structure: near-dup and exact-dup qualify; the
    // token-set-identical but reshuffled doc 2 must NOT (this is the
    // order-sensitivity a token-set basis would miss)
    assert(want.contains((0L, 1L)) && want.contains((3L, 4L)) &&
      !want.exists(p => p._1._1 == 2L || p._1._2 == 2L))
  }

  test("char entropy: exact closed-form values") {
    // uniform over 1 char: H = 0
    assert(CharEntropyMicro.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaaa")) == 0L)
    // "ab": H = ln 2 = 0.693147... → micro-nats with the quantized
    // formula: round(ln2*1e6) - (2*round(1*ln1*1e6)) / 2 = 693147
    assert(CharEntropyMicro.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab")) == 693147L)
    // empty → 0 by definition
    assert(CharEntropyMicro.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("")) == 0L)
    // "aab": H = ln3 - (2 ln2)/3; quantized: round(ln3*1e6) -
    //   (round(2*ln2*1e6) + 0) / 3 = 1098612 - 1386294/3 = 1098612-462098
    assert(CharEntropyMicro.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("aab")) ==
      1098612L - 1386294L / 3L)
  }

  test("char entropy orders repeated-char junk below real text") {
    import spark.implicits._
    val d = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (2L, "abababababababababababababababababababababa"))
      .toDF("doc_id", "text")
    val h = d.select(col("doc_id"),
        CharEntropyMicro.entropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == 0L, "single-char flood has zero entropy")
    assert(h(2L) < h(0L), "two-char pattern sits below English text")
    assert(h(2L) > 0L)
  }

  test("char entropy counts code points, not UTF-16 units") {
    // U+1D49E (𝒞, surrogate pair in UTF-16) repeated: one distinct
    // code point → entropy 0; a UTF-16-unit counter would see two
    // alternating chars and report ln 2
    val s = new String(Character.toChars(0x1D49E)) * 5
    assert(CharEntropyMicro.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)) == 0L)
  }
}
