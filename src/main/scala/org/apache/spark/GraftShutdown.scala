package org.apache.spark

import org.apache.spark.util.ShutdownHookManager

/** Bridge into the private[spark] shutdown-hook manager — the only way
  * to ORDER work against Spark's own context-stop hook (a plain
  * `Runtime.addShutdownHook` runs concurrently with it, which is the
  * race being fixed, not a fix). Used by the test harness: a long
  * suite leaves ContextCleaner work in flight (async remove-broadcast/
  * remove-block futures on Spark's cached ask pools — tens of
  * thousands of completions over a full run), and when the JVM exits
  * the pools shut down mid-completion, spraying benign-but-noisy
  * RejectedExecutionException traces over the test summary. Running a
  * quiesce BEFORE the context-stop hook (higher priority = earlier)
  * drains the queues while the pools are still alive.
  */
object GraftShutdown {

  /** Register `body` to run before Spark's SparkContext stop hook
    * (priority 50); ours runs at `priority` (higher runs first).
    */
  def beforeSparkStops(priority: Int = 60)(body: => Unit): Unit = {
    ShutdownHookManager.addShutdownHook(priority)(() => body)
    ()
  }

  /** Register `body` to run AFTER Spark's SparkContext stop hook
    * (priority 50; lower priority runs later) — for cleanup that must
    * not race in-flight tasks, e.g. deleting the session temp root.
    */
  def afterSparkStops(priority: Int = 25)(body: => Unit): Unit = {
    ShutdownHookManager.addShutdownHook(priority)(() => body)
    ()
  }

  /** Best-effort drain of a context's asynchronous tails: enqueue any
    * unreferenced cleanup targets (gc), let the ContextCleaner fire
    * its async removes, wait for the listener bus, then STOP THE
    * CLEANER (its removes ride the block-manager ask/storage pools —
    * the pools whose shutdown used to reject the removes' completion
    * callbacks; thread-dump diagnosis: a ~100-thread TPE at ~32k
    * completed tasks, rejecting during sc.stop) and give the last
    * in-flight asks a beat to land — THEN stop the context, so its
    * pool shutdowns find empty queues.
    */
  def quiesceAndStop(sc: SparkContext, settleMs: Long = 400L): Unit = {
    try {
      System.gc()
      Thread.sleep(settleMs / 2)
      sc.listenerBus.waitUntilEmpty(10000L)
      sc.cleaner.foreach(_.stop())
      Thread.sleep(settleMs / 2)
    } catch { case scala.util.control.NonFatal(_) => () }
    if (sys.env.get("SPARK_GRAFT_SHUTDOWN_DEBUG").contains("1")) {
      val all = Thread.getAllStackTraces
      val names = all.keySet().toArray
        .collect { case t: Thread => t.getName }.sorted
        .groupBy(_.replaceAll("-?\\d+$", "")).view
        .mapValues(_.length).toSeq.sortBy(-_._2)
      Console.err.println("[graft-shutdown] thread pools before stop: " +
        names.map { case (n, c) => s"$n×$c" }.mkString(", "))
      all.forEach { (t, st) =>
        if (t.getName.startsWith("Executor task launch worker"))
          Console.err.println(s"[graft-shutdown] zombie ${t.getName}:\n  " +
            st.take(12).mkString("\n  "))
      }
    }
    try sc.stop()
    catch { case scala.util.control.NonFatal(_) => () }
    if (sys.env.get("SPARK_GRAFT_SHUTDOWN_DEBUG").contains("1"))
      Console.err.println("[graft-shutdown] context stopped")
  }
}
