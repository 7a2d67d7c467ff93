package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.json4s._
import graft.api._

/** Property-based checks over the pure-JVM kernels (no SparkSession —
  * these run per-generated-case, so they exercise the iterator/codec
  * machinery directly at ScalaCheck volume):
  *
  *  - [[MapSideCombine]] must be RESULT-TRANSPARENT for algebraic
  *    combiners: whatever interleaving/flush pattern the bounded
  *    buffer takes, merging its output per key equals merging the raw
  *    input per key (the combiner "runs 0..n times" contract,
  *    mrjob/job.py:295-309);
  *  - [[AdjacentGroups]] must partition a key-sorted stream exactly;
  *  - the Python-literal and JSON codecs must round-trip arbitrary
  *    JValue trees.
  */
object PropertySpec extends Properties("graft.kernels") {

  private val pairsGen: Gen[List[(String, Long)]] =
    Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c", "d", "e", "f"),
      Gen.chooseNum(-1000L, 1000L)))

  property("mapSideCombine result-transparent for sums") =
    Prop.forAll(pairsGen) { pairs =>
      val combined = new MapSideCombine[String, Long](pairs.iterator,
        (_, vs) => Iterator.single(vs.sum)).toList
      val got = combined.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val expect = pairs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      got == expect
    }

  property("mapSideCombine one run per key below spill bounds") =
    Prop.forAll(pairsGen) { pairs =>
      val combined = new MapSideCombine[String, Long](pairs.iterator,
        (_, vs) => Iterator.single(vs.sum)).toList
      combined.map(_._1).distinct.length == combined.length
    }

  property("adjacentGroups reconstructs the sorted input exactly") =
    Prop.forAll(pairsGen) { pairs =>
      val sorted = pairs.sortBy(_._1)
      val groups = AdjacentGroups(sorted.iterator)
        .map { case (k, vs) => (k, vs.toList) }.toList
      groups.map(_._1) == sorted.map(_._1).distinct &&
        groups.flatMap { case (k, vs) => vs.map(k -> _) } == sorted
    }

  private val jvalueGen: Gen[JValue] = {
    val leaf: Gen[JValue] = Gen.oneOf(
      Gen.const(JNull),
      Gen.oneOf(true, false).map(JBool(_)),
      Gen.chooseNum(-1000000L, 1000000L).map(JLong(_)),
      Gen.alphaNumStr.map(JString(_)),
      Gen.oneOf("tab\there", "nl\nthere", "quote'mix\"q", "café")
        .map(JString(_)))
    def tree(depth: Int): Gen[JValue] =
      if (depth <= 0) leaf
      else Gen.frequency(
        3 -> leaf,
        1 -> Gen.listOfN(3, tree(depth - 1)).map(JArray(_)),
        1 -> Gen.listOfN(2, Gen.zip(Gen.alphaNumStr, tree(depth - 1)))
          .map(fs => JObject(fs)))
    tree(3)
  }

  property("reprPairProtocol round-trips JValue trees") =
    Prop.forAll(jvalueGen, jvalueGen) { (k, v) =>
      ReprPairProtocol.read(ReprPairProtocol.write(k, v)) == ((k, v))
    }

  /** json4s parses whole numbers as JInt (BigInt); value-equal to the
    * JLong the generator produced. Compare under that normalization —
    * byte-level fidelity is pinned separately by the golden specs. */
  private def normNum(v: JValue): JValue = v match {
    case JLong(l) => JInt(BigInt(l))
    case JArray(xs) => JArray(xs.map(normNum))
    case JObject(fs) => JObject(fs.map { case (k, fv) => k -> normNum(fv) })
    case other => other
  }

  property("jsonPairProtocol round-trips JValue trees") =
    Prop.forAll(jvalueGen, jvalueGen) { (k, v) =>
      val (k2, v2) = JsonPairProtocol.read(JsonPairProtocol.write(k, v))
      (k2, v2) == ((normNum(k), normNum(v)))
    }

  // ---- seeded-hash kernels (the cross-engine-exact sampling family) ----

  private val P = graft.operators.TextQueries.SamplePrime

  /** The affine map x → (a·x + b) mod P with P prime and 1 ≤ a < P is
    * a bijection on [0, P) — the property the whole seeded_sample /
    * group_sample / mix_sample / train_val_split determinism story
    * rests on (distinct ids never collide, so top-n by hash is a true
    * permutation sample). */
  property("seeded affine permutation is injective and seed-stable") =
    Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2),
      Gen.listOfN(50, Gen.chooseNum(0L, 1000000L))) { (seed, ids) =>
      val (a, b) = graft.operators.TextQueries.sampleHashConstants(seed)
      def h(x: Long) = (x % P * a + b) % P
      val (a2, b2) = graft.operators.TextQueries.sampleHashConstants(seed)
      val distinctIds = ids.distinct.filter(_ < P)
      (a, b) == ((a2, b2)) && a >= 1 && a < P &&
        distinctIds.map(h).distinct.size == distinctIds.size &&
        distinctIds.forall(x => h(x) >= 0 && h(x) < P)
    }

  /** quadHash (the oracled-SimHash bit source) must stay in [0, P),
    * be deterministic, and every intermediate must fit a Long — the
    * scaladoc's overflow argument, exercised at the domain edges. */
  property("simhash quadratic hash stays in-range at domain edges") =
    Prop.forAll(Gen.oneOf(Gen.chooseNum(1L, 1000000L),
      Gen.oneOf(1L, P - 1, P, P + 1, 2 * P - 1))) { vid =>
      def q(seed: Long): Long = {
        val (a1, b1) = graft.operators.TextQueries.sampleHashConstants(seed)
        val (a2, b2) = graft.operators.TextQueries
          .sampleHashConstants(seed + 77)
        val h = (vid % P * a1 + b1) % P
        ((h * h % P) * a2 + b2 + h) % P
      }
      val (x, y) = (q(7L), q(19L))
      x >= 0 && x < P && y >= 0 && y < P && q(7L) == x
    }

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))

  property("PcmS16LeSum eval equals a BigInt int16-LE reference for " +
    "arbitrary payloads and offsets") =
    Prop.forAll(bytesGen, Gen.chooseNum(-4, 64)) { (buf, off) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      val got = graft.functions.PcmS16LeSum(
        Literal(buf), Literal(off)).eval(null).asInstanceOf[Long]
      val start = math.max(off, 0)
      val want = Iterator.range(start, buf.length - 1, 2).map { i =>
        BigInt((buf(i) & 0xFF) | (buf(i + 1).toInt << 8))
      }.sum
      BigInt(got) == want
    }

  // ------- GVID synth/parse round-trip (pure byte arithmetic) -------

  private val videoTextGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 40)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', 'é', '中', '!', '\u00df')))
  } yield cs.mkString

  property("synthVideo header/geometry/frame-0 sum round-trip through"
    + " the planted formulas for arbitrary (id, text)") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L), videoTextGen) { (id, t) =>
      val p = graft.operators.VideoOps.synthVideo(id, t)
      val len = t.codePointCount(0, t.length)
      val w = 2 + (len % 4)
      val h = 2 + ((len / 4) % 4)
      val nf = 1 + (id % 8).toInt
      def u32(off: Int): Long =
        (0 until 4).map(k => (p(off + k) & 0xFFL) << (8 * k)).sum
      val headerOk = p.length == 20 + nf * w * h &&
        new String(p.take(4), "US-ASCII") == "GVID" &&
        u32(4) == nf && u32(8) == w && u32(12) == h && u32(16) == 8L
      val cps = t.codePoints().toArray
      val frame0Ok = (0 until w * h).forall { q =>
        (p(20 + q) & 0xFF) == (cps(q % len) * 31) % 256
      }
      headerOk && frame0Ok
    }
}
