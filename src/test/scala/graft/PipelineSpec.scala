package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

/** Semantic gates for the corpus-assembly operators (PipelineOps).
  * Deep correctness is the DuckDB differ; these pin the invariants that
  * make each operator MEAN what it claims. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = SparkFixture.Sf0001

  test("group_sample takes exactly min(k, |source|) docs per source") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = PipelineOps.groupSample(spark, dir, k = 20)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == sizes.keySet)
    got.foreach { case (s, n) => assert(n == math.min(20L, sizes(s)),
      s"source $s: got $n of ${sizes(s)}") }
  }

  test("group_sample is partitioning-independent") {
    val a = PipelineOps.groupSample(spark, dir).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val b = PipelineOps.groupSample(spark, dir).collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("seq_pack offsets are gapless per source and spans match L") {
    val rows = PipelineOps.seqPack(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last")))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._4 == 0L, "first doc must start at token 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._4 + a._3, "token stream has a gap/overlap")
        case _ =>
      }
    }
    rows.foreach { case (_, id, n, st, sf, sl) =>
      assert(sf == st / PipelineOps.PackLen, s"doc $id seq_first")
      assert(sl == (st + n - 1) / PipelineOps.PackLen, s"doc $id seq_last")
      assert(sf <= sl)
    }
  }

  test("rag_chunk covers every token, last chunk ends at n, overlap = W-S") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = PipelineOps.ragChunk(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("off"), r.getAs[Long]("chunk_len")))
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = docs(id)
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0L)
      val last = sorted.last
      assert(last._3 + last._4 == n, s"doc $id: last chunk must end at n")
      sorted.foreach { case (_, _, off, len) =>
        assert(len > 0 && off + len <= n)
        assert(len == math.min(PipelineOps.ChunkLen, n - off))
      }
      // strides are exact, so consecutive chunks overlap by W-S
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 == PipelineOps.ChunkStride)
        case _ =>
      }
    }
  }

  test("corpus_merge: upsert wins, dup re-posts rejected, fresh inserts kept") {
    val rows = PipelineOps.corpusMerge(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("version"), r.getAs[String]("op"))).toMap
    val textOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = textOf.keySet
    // every original id survives exactly once, with the right op
    ids.foreach { id =>
      val (v, op) = rows(id)
      if (id % 7 == 0) assert(v == 2 && op == "update", s"doc $id")
      else assert(v == 1 && op == "keep", s"doc $id")
    }
    // an insert survives iff its text is absent from the upserted corpus
    // (the original may have moved on via the %7 update, or another doc
    // may hold an identical dup text — both computed, not assumed)
    val currentTexts = ids.map(id =>
      if (id % 7 == 0) textOf(id) + " v2" else textOf(id))
    def expectInserted(text: String): Boolean = !currentTexts.contains(text)
    ids.filter(_ % 26 == 4).foreach { id =>
      assert(rows.contains(-id - 1L) == expectInserted(textOf(id)),
        s"dup re-post of $id")
    }
    ids.filter(_ % 26 == 17).foreach { id =>
      assert(rows.contains(-id - 1L) ==
        expectInserted("fresh " + textOf(id)), s"fresh insert of $id")
      rows.get(-id - 1L).foreach(r => assert(r._2 == "insert"))
    }
  }
}
