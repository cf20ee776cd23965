package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization of per-(session, sf-dir) corpus artifacts —
  * the discipline shared by every "built once per corpus, read by every
  * consumer" artifact (normalized vectors, verified near-dup pairs, the
  * trained BPE merge table, the five-gate verdict table):
  *
  *  - keys are (SparkSession, data dir); entries for stopped sessions are
  *    pruned on every access, so a torn-down session can't pin its
  *    checkpointed blocks (or stale driver state) forever;
  *  - lookup is get-then-putIfAbsent, NOT computeIfAbsent: building an
  *    artifact runs Spark jobs and must not hold the map's bin lock for
  *    their duration. The race this admits — two threads building
  *    concurrently — is benign by contract: `build` must be DETERMINISTIC,
  *    and a losing duplicate's localCheckpoint blocks are reclaimed by
  *    the ContextCleaner once the DataFrame is garbage.
  *
  * Callers hold one `SessionCache[V]` per artifact kind. The immutability
  * assumption is the same one the QueryModule scratch convention makes:
  * the testdata dirs never change under a running session.
  */
final class SessionCache[V] {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]

  def getOrBuild(s: SparkSession, d: String)(build: => V): V = {
    prune()
    val key = (s, d)
    Option(m.get(key)).getOrElse {
      val built = build
      Option(m.putIfAbsent(key, built)).getOrElse(built)
    }
  }

  /** Producer-refresh for caches with an explicit producer/consumer
    * split (DedupOps.verifiedPairs: q27 REBUILDS and publishes, q42
    * consumes the latest artifact): unconditionally replaces the entry.
    * The replaced value's checkpoint blocks are reclaimed by the
    * ContextCleaner once unreferenced. */
  def put(s: SparkSession, d: String, v: V): Unit = {
    prune()
    m.put((s, d), v)
    (): Unit
  }

  private def prune(): Unit = {
    m.keySet.removeIf(k => k._1.sparkContext.isStopped)
    (): Unit
  }
}
