package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, attach the right row
  * with the greatest `rightTime <= leftTime` within the same key — the
  * classic event-to-latest-state lookup (attribution, slowly-changing
  * state, market-data alignment).
  *
  * Spark has no ASOF JOIN operator; the naive rewrite (theta join on
  * `r.ts <= l.ts` + row_number) materializes every (left, right)
  * time-ordered pair and dies at scale. This implementation is the
  * sort-merge shape instead: UNION both sides tagged, one shuffle on
  * the key, one in-partition sort on (time, side), then a running
  * `last(_, ignoreNulls = true)` window pulls the latest right payload
  * onto each left row. Cost at 100 TB: exactly one Exchange per input
  * (the union children share the output partitioning) and one sort —
  * identical to a sort-merge join, with zero pair blow-up.
  *
  * Tie semantics: a right row at exactly `leftTime` matches
  * (`rightTime <= leftTime`, inclusive) — the right side sorts before
  * the left side at equal times. Callers must pre-reduce the right side
  * to one row per (key, time) to keep ties deterministic (DuckDB's
  * ASOF JOIN has the same requirement).
  */
object AsOf {

  /** Left as-of join.
    *
    * @param left      probe side; all its columns are preserved
    * @param right     build side: must be unique per (key, time)
    * @param key       equi-join key column present on both sides
    * @param time      event-time column present on both sides (same type)
    * @param payload   right-side columns to attach (null when no right
    *                  row is <= the left row's time)
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.contains(key) && !payload.contains(time),
      "payload must not include the key/time columns")

    // side 0 = right (state), side 1 = left (probe): at equal times the
    // state row sorts first, making the match inclusive.
    val taggedRight = right.select(
      col(key) +: col(time) +: lit(0).as("asof_side") +:
        payload.map(col): _*)
    val taggedLeft = left.select(
      col(key) +: col(time) +: lit(1).as("asof_side") +:
        leftCols.filterNot(c => c == key || c == time).map(col): _*)

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(key).orderBy(col(time), col("asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withState = payload.foldLeft(
      unioned.withColumn("asof_time",
        last(when(col("asof_side") === 0, col(time)), ignoreNulls = true).over(w))) {
      case (df, p) =>
        df.withColumn(s"asof_$p", last(col(p), ignoreNulls = true).over(w))
    }

    withState
      .filter(col("asof_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"asof_$p").as(p)) :+ col("asof_time"): _*)
  }
}

/** Connected components over an undirected edge list — the clustering
  * step of web-scale dedup: near-dup candidate pairs (MinHash/SimHash)
  * chain transitively, and each connected component keeps one canonical
  * document.
  *
  * Algorithm: min-label propagation with POINTER JUMPING. Each round a
  * node takes the min label across its neighborhood (one equi-join +
  * one hash agg), then additionally follows its own label's label
  * (`comp := min(comp, label(comp))` — path halving). Neighborhood
  * propagation alone needs diameter rounds, which a templated-page
  * near-dup CHAIN makes O(n); the jump step collapses chains
  * logarithmically, so rounds = O(log diameter). No driver-side data —
  * only a scalar convergence count crosses per round — and the loop
  * THROWS if the round cap is hit, because un-converged labels are
  * silently wrong (some nodes not yet at their component minimum).
  */
object ConnectedComponents {

  /** @param edges edge list; self-loops and duplicates are fine
    * @return (n, comp): every node appearing in an edge, labeled with
    *         the min node id reachable from it
    */
  def components(edges: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    val bi = edges.select(col(src).as("n"), col(dst).as("m"))
      .union(edges.select(col(dst).as("n"), col(src).as("m")))
      .cache()

    // Lineage MUST be truncated every round: each round's plan refers
    // to the previous labels twice (neighbor join + pointer jump), so
    // an un-truncated logical plan doubles per round — O(2^rounds)
    // analysis/planning cost that OOMs the driver long before the data
    // does. localCheckpoint materializes the round's labels and cuts
    // the plan back to a leaf (swap for reliable checkpoint() on a
    // cluster if executor loss during the loop must be survivable).
    var labels = bi.groupBy("n").agg(min(col("m")).as("nbr"))
      .select(col("n"), least(col("n"), col("nbr")).as("comp"))
      .transform(graft.util.Staged.materialize)

    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // each node's candidate label: min over its neighbors' labels
      val viaNbr = bi.join(labels.select(col("n").as("m"), col("comp").as("m_comp")), "m")
        .groupBy("n").agg(min(col("m_comp")).as("cand"))
      val prop = labels.join(viaNbr, Seq("n"), "left")
        .select(col("n"),
          least(col("comp"), coalesce(col("cand"), col("comp"))).as("comp"))
      // pointer jump: follow my label's label (labels only decrease, so
      // this is monotone toward the component minimum and collapses
      // chains in O(log diameter) rounds)
      val byN = prop.select(col("n").as("comp"), col("comp").as("comp2"))
      val next = prop.join(byN, Seq("comp"), "left")
        .select(col("n"),
          least(col("comp"), coalesce(col("comp2"), col("comp"))).as("comp"))
        .transform(graft.util.Staged.materialize)
      changed = next.select(col("n"), col("comp").as("next_comp"))
        .join(labels, "n")
        .filter(col("next_comp") =!= col("comp"))
        .count()
      labels = next
      it += 1
    }
    bi.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(labels would be silently wrong); raise maxIter")
    labels
  }
}
