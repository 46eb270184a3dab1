package graft.util

import org.apache.spark.sql.{DataFrame, Dataset}
import scala.collection.concurrent.TrieMap

/** Cache-hygiene helper: materialize an operator's result
  * (localCheckpoint) and release its staging caches in one step — the
  * PageRank.ranks pattern as a function. The PRE-checkpoint physical
  * plan (and its cached-relation reference count) is recorded per tag,
  * because after the checkpoint the result reads back as a bare
  * `Scan ExistingRDD` and plan assertions (PlanSpec) would otherwise
  * have nothing to inspect.
  */
object Staged {
  private val plans = TrieMap.empty[String, String]
  private val cacheRefs = TrieMap.empty[String, Int]

  def checkpointRelease(tag: String, result: DataFrame,
      release: Dataset[_]*): DataFrame = {
    val out = result.localCheckpoint(true) // materializes eagerly
    plans.put(tag, result.queryExecution.executedPlan.toString)
    cacheRefs.put(tag, result.queryExecution.withCachedData.collect {
      case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => 1
    }.sum)
    release.foreach(_.unpersist())
    out
  }

  /** The executed plan of the LAST checkpointRelease under this tag. */
  def plan(tag: String): String = plans.getOrElse(tag, "")

  /** InMemoryRelation references in that plan (cache-reuse proof). */
  def cachedRefCount(tag: String): Int = cacheRefs.getOrElse(tag, 0)
}
