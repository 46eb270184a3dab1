package graft.util

/** Env-gated wall timer for attributing a query's cost to its phases
  * (SPARK_GRAFT_PHASE_TIMING=1 → one stderr line per phase; zero cost
  * when unset). The measurement knob behind per-query latency work —
  * bench medians say WHICH query is slow, these lines say WHY.
  */
object PhaseTimer {
  private val on = sys.env.get("SPARK_GRAFT_PHASE_TIMING").contains("1")

  def apply[T](label: String)(body: => T): T =
    if (!on) body else run("phase-timing", label)(body)

  /** The same timer under a caller-chosen env gate and line prefix —
    * the ONE implementation behind every env-gated phase line
    * (GoldStage's refresh phases ride SPARK_GRAFT_PUBLISH_TIMING
    * through here; Commit.publish keeps its own variant because it
    * aggregates three phase durations into a single line).
    */
  def gated[T](envKey: String, prefix: String, label: String)(body: => T): T =
    if (!sys.env.get(envKey).contains("1")) body
    else run(prefix, label)(body)

  private def run[T](prefix: String, label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    Console.err.println(
      f"[$prefix] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
}
