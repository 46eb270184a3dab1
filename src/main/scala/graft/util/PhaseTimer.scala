package graft.util

/** Env-gated wall timer for attributing a query's cost to its phases
  * (SPARK_GRAFT_PHASE_TIMING=1 → one stderr line per phase; zero cost
  * when unset). The measurement knob behind per-query latency work —
  * bench medians say WHICH query is slow, these lines say WHY.
  */
object PhaseTimer {
  private val on = sys.env.get("SPARK_GRAFT_PHASE_TIMING").contains("1")

  def apply[T](label: String)(body: => T): T =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      val r = body
      Console.err.println(
        f"[phase-timing] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
}
