package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Housekeeping for the per-(SparkSession, dir, …) prep-product memos
  * (DedupOps.jaccardMemo/labelMemo, ClusterOps.centroidMemo/
  * shortlistMemo, SimilarityOps.ivfMemo, BpeOps.learnerMemo): entries
  * key on a live SparkSession and hold localCheckpoint'd DataFrames,
  * so an entry for a STOPPED session pins executor blocks and driver
  * references for the process lifetime (round-7 advice #5 — a
  * long-lived multi-session process, e.g. a test suite cycling
  * fixtures, leaks one checkpoint per abandoned session/dir).
  *
  * Every memo accessor calls [[purgeStopped]] on its map before
  * `computeIfAbsent`: dead-session keys are dropped inline on the next
  * miss-or-hit, so no listener registration or background thread is
  * needed and the maps stay bounded by the LIVE sessions' working
  * sets. The checkpoint blocks themselves die with their session's
  * BlockManager; this reclaims the driver-side references and lets the
  * DataFrames (and their plans) be collected.
  */
private[graft] object Memos {

  /** Remove every entry whose key's first element is a stopped
    * SparkSession. Keys are the memo tuples — (session, dir[, …]) —
    * so the session is always productElement(0). */
  def purgeStopped[K <: Product, V](m: ConcurrentHashMap[K, V]): Unit = {
    val it = m.keySet.iterator()
    while (it.hasNext) {
      it.next().productElement(0) match {
        case s: SparkSession if s.sparkContext.isStopped => it.remove()
        case _ => ()
      }
    }
  }
}
