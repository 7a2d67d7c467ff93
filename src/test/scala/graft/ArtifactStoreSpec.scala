package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, SimilarityOps}
import graft.sources.ArtifactStore

/** Round-8 verdict #4: prep products persisted as on-disk parquet
  * artifacts and RELOADED across sessions — the memo maps only
  * amortize within a session; a pipeline restart must not retrain. */
class ArtifactStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark

  /** A private copy of one fixture table under a fresh dir — fresh
    * (dir, fingerprint) key, so each test controls cold vs warm. */
  private def copyOf(table: String): String = {
    val d = Files.createTempDirectory("graft-artifact").toString
    Files.copy(Paths.get(s"${SparkFixture.Sf0001}/$table.parquet"),
      Paths.get(s"$d/$table.parquet"))
    d
  }

  test("clusterLabels: a FRESH session reuses the on-disk artifact " +
    "(no rebuild) with identical labels; a mutated input fingerprint " +
    "rebuilds") {
    val dir = copyOf("documents")
    DedupOps.clearClusterLabelMemo()
    DedupOps.clearJaccardMemo()
    val b0 = ArtifactStore.builds
    val first = DedupOps.clusterLabels(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(ArtifactStore.builds == b0 + 1, "cold call must build once")
    // fresh session (new memo key), memo cleared: only the artifact
    // can answer without a rebuild
    DedupOps.clearClusterLabelMemo()
    DedupOps.clearJaccardMemo()
    val s2 = spark.newSession()
    val again = DedupOps.clusterLabels(s2, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(ArtifactStore.builds == b0 + 1,
      "warm dir must be answered from the artifact, not rebuilt")
    assert(again == first, "artifact labels must equal built labels")
    // a CHANGED input (newer mtime => new fingerprint) must rebuild —
    // stale labels over a regenerated corpus are the failure this
    // key guards against
    val f = Paths.get(s"$dir/documents.parquet")
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime
      .fromMillis(Files.getLastModifiedTime(f).toMillis + 123000L))
    DedupOps.clearClusterLabelMemo()
    DedupOps.clearJaccardMemo()
    DedupOps.clusterLabels(spark, dir).collect()
    assert(ArtifactStore.builds == b0 + 2,
      "a new input fingerprint must trigger a rebuild")
  }

  test("corpusIvf: centroids + assignment reload across sessions and " +
    "the probed search result is identical") {
    val dir = copyOf("embeddings")
    SimilarityOps.clearIvfMemo()
    val b0 = ArtifactStore.builds
    val (c1, a1) = SimilarityOps.corpusIvf(spark, dir, cells = 16)
    val cold = (c1.collect().map(_.toSeq).toSet,
      a1.select(col("vec_id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(ArtifactStore.builds == b0 + 2,
      "cold IVF build writes two artifacts (cents, assigned)")
    SimilarityOps.clearIvfMemo()
    val s2 = spark.newSession()
    val (c2, a2) = SimilarityOps.corpusIvf(s2, dir, cells = 16)
    val warm = (c2.collect().map(_.toSeq).toSet,
      a2.select(col("vec_id"), col("cell")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(ArtifactStore.builds == b0 + 2,
      "warm dir must read the stored index, not rebuild it")
    assert(warm == cold, "stored index must equal the built index")
  }
}
