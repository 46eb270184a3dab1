package graft.util

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Memoized width-1 clone of a SparkSession, one per SparkContext.
  *
  * Driver-local iterative tails (the PCA power rounds: 4096→64→1-row
  * stages, 8 rounds deep) must plan at shuffle width 1 — the session
  * width (32+) would pay dozens of empty-task launches per round. That
  * narrow width cannot live on the SHARED session (a concurrent query
  * — an /api/sql request mid-flight — would plan at width 1 too), so
  * it lives on a clone with isolated conf. But `newSession()` builds a
  * fresh SessionState whose analyzer/optimizer/codegen stacks
  * initialize lazily on first use — a per-CALL clone re-pays that
  * warm-up on every invocation (measured as part of q_pca_power's
  * r13→r14 regression). The clone is conf-frozen and stateless from
  * the caller's perspective, so one per SparkContext is sound: memoize
  * it and every subsequent caller gets a warmed narrow planner.
  */
object NarrowSession {
  private val cache = TrieMap.empty[SparkContext, SparkSession]

  /** The memoized width-1 session sharing `s`'s SparkContext (and
    * therefore its executors, caches, and catalog implementation).
    * Callers must NOT mutate its conf — it is shared, and beyond the
    * pinned shuffle width it carries the FIRST caller's session conf
    * (the width-1 iterations it serves are conf-insensitive).
    */
  def get(s: SparkSession): SparkSession = {
    // a JVM that stops and recreates contexts (test harness, server
    // restart loop) must not accumulate dead SessionStates — evict
    // entries whose context has stopped
    cache.filterInPlace((sc, _) => !sc.isStopped)
    // TrieMap.getOrElseUpdate may run the builder twice under a
    // concurrent first call, leaking a SessionState — build eagerly,
    // then let putIfAbsent pick ONE winner (the loser is just an
    // unreferenced session object; nothing to close on it)
    cache.get(s.sparkContext).getOrElse {
      val iso = s.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "1")
      cache.putIfAbsent(s.sparkContext, iso).getOrElse(iso)
    }
  }
}
