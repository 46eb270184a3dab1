package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PageRank power iteration over a long-keyed edge list —
  * the weighted-propagation sibling of [[ConnectedComponents]] (label
  * propagation). Used for domain-authority weighting in corpus
  * pipelines; `q_pagerank` runs it over the symmetrized
  * customer–supplier graph.
  *
  * Contract: `edges(src, dst)` with LONG node ids (string keys would
  * ride every iteration's shuffle; label rendering belongs on the
  * k-row result, not the edge list), and every node must have
  * out-degree ≥ 1 (symmetrize the graph or pre-drop dangling nodes —
  * otherwise their mass silently leaks each round). Nodes with
  * in-degree 0 ARE handled: each round re-attaches the full node set,
  * so they keep the bare teleport rank instead of vanishing.
  *
  * Determinism: each round's rank is
  * `round(teleport/N + damping · Σ r(u)/deg(u), 12)` with the
  * contribution sum carried in DECIMAL(28,20) — order-independent, so
  * any partitioning/merge order yields bit-identical ranks (the exact
  * mechanism the k-means centroids use). `teleport` is taken as an
  * explicit double (default 0.15) rather than `1 - damping`, whose
  * floating-point result differs from the literal both engines parse.
  *
  * Scale shape per round: one join of the edge list with the
  * node-keyed rank table on src (ranks and degrees share that
  * partitioning) and one contribution aggregation on dst — one edge
  * shuffle per iteration, the canonical distributed PageRank. N is a
  * single scalar count on the driver. The iteration budget is explicit
  * because every round is a full edge pass.
  */
object PageRank {

  /** `cacheEdges = false` when `edges` is already a persisted layout
    * whose scan supplies the join's distribution — e.g.
    * [[graft.warehouse.GraphStage.prEdges]], bucketed+sorted by src:
    * caching would pin executor memory to save a scan that costs no
    * shuffle, and every iteration's src-join plans zero exchanges and
    * zero sorts on the edge side straight from the bucket metadata.
    */
  def ranks(edges: DataFrame, iters: Int = 2, damping: Double = 0.85,
      teleport: Double = 0.15, cacheEdges: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (cacheEdges) e0.cache() else e0
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .cache() // joined into every round + counted for N
    val n = deg.count().toDouble
    // each round re-attaches the FULL node set: a node nobody links to
    // receives no contribution rows, and rebuilding ranks from the
    // groupBy(dst) alone would silently drop it (and leak its mass)
    // from every later round — it must instead keep the bare teleport
    // rank. The node set is deg's key column, already cached.
    val nodes = deg.select(col("src").as("node"))
    def step(r: DataFrame): DataFrame = {
      val contrib = e.join(r.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), (col("r") / col("deg")).as("contrib"))
        .groupBy("node")
        .agg(sum(col("contrib").cast(DecimalType(28, 20))).as("csum"))
      nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          round(lit(teleport) / n + lit(damping) *
            coalesce(col("csum").cast("double"), lit(0.0)),
            12).as("r"))
    }
    val r0 = nodes.select(col("node"), (lit(1.0) / n).as("r"))
    val out = (1 to iters).foldLeft(r0)((r, _) => step(r))
      // materialize, then release the iteration caches — a long-lived
      // session (the 136-query bench suite) must not keep them pinned
      .transform(graft.util.Staged.materialize)
    if (cacheEdges) { e.unpersist(); () }
    deg.unpersist()
    out
  }
}
