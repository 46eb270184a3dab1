package graft.warehouse

import graft.Tables
import graft.queries.Graph
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The supplier-similarity graph as a MATERIALIZED warehouse artifact.
  *
  * Six analyses (q_pagerank, q_cooccur_similarity, q_triangles, q_hits,
  * q_label_propagation, q_recommend) consume the same relations derived
  * from the co-purchase projection: the distinct (customer, supplier)
  * edge set, its degree-capped variant, the Jaccard similarity pairs
  * (whose Σ min(deg,128)² self-join is the expensive step), and the
  * top-3-neighbor kNN edge set. Rebuilding that chain per query paid
  * the pair self-join four times over (~half the graph family's suite
  * time). Production similarity-graph pipelines stage it instead: the
  * graph is built ONCE per source snapshot as a bucketed warehouse
  * table and every analysis is a consumer — at 100 TB the build is one
  * job, and each consumer starts from a scan whose bucketing
  * (`bucketBy` on the join key) hands its first join/window a
  * ready-made hash partitioning instead of a shuffle.
  *
  * Staged per (session, testdata dir), write-once via `saveAsTable`
  * (bucket metadata lives in the session catalog; the default
  * in-memory catalog scopes the artifact to the session, which is the
  * right lifetime for a derived artifact keyed to a source snapshot).
  * Results are bit-identical to the inline builds these replaced: the
  * staging chain is the same expression DAG, parquet round-trips longs
  * and the 6-dp rounded doubles exactly, and the DuckDB oracles
  * (`Graph.knnGraphSql`) are unchanged.
  */
object GraphStage {

  private val built = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Set[String]]())

  /** Wall-clock seconds of the last artifact build per source dir —
    * bench instrumentation (the build runs once in the warmup pass, so
    * per-query medians don't show it; this keeps the amortized cost
    * visible instead of silently free). Bench embeds it in
    * BENCH_DETAIL.json.
    */
  val lastBuildSecs: scala.collection.concurrent.TrieMap[String, Double] =
    scala.collection.concurrent.TrieMap.empty

  /** Artifact names are keyed to the source dir (tests alternate scale
    * factors inside one session).
    */
  private def tag(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  private def rawName(d: String) = s"g_copurchase_${tag(d)}"
  private def eName(d: String)   = s"g_copurchase_capped_${tag(d)}"
  private def simName(d: String) = s"g_supplier_sim_${tag(d)}"
  private def undName(d: String) = s"g_supplier_knn_${tag(d)}"

  /** Distinct (ck, sk) co-purchase projection — bucketed by ck. */
  def raw(s: SparkSession, d: String): DataFrame =
    { ensure(s, d); s.table(rawName(d)) }

  /** [[Graph.capDegree]](raw, K=128) — bucketed by ck. */
  def e(s: SparkSession, d: String): DataFrame =
    { ensure(s, d); s.table(eName(d)) }

  /** Jaccard similarity pairs (u < v): (u, v, common, nu, nv, j) with
    * j = round(common / (nu + nv − common), 6) — bucketed by u.
    */
  def sim(s: SparkSession, d: String): DataFrame =
    { ensure(s, d); s.table(simName(d)) }

  /** Top-3-neighbor kNN edge set, symmetrized then canonicalized to
    * u < v — bucketed by u.
    */
  def und(s: SparkSession, d: String): DataFrame =
    { ensure(s, d); s.table(undName(d)) }

  private def ensure(s: SparkSession, d: String): Unit = {
    val dirs = built.computeIfAbsent(s,
      _ => scala.collection.mutable.Set.empty[String])
    // memoize only a SUCCESSFUL build: a thrown build is retried on the
    // next accessor call instead of poisoning the session
    dirs.synchronized { if (!dirs.contains(d)) { build(s, d); dirs += d } }
  }

  /** A fresh JVM starts with an empty in-memory catalog but inherits
    * whatever managed-table directories earlier JVMs left under
    * spark-warehouse — and `saveAsTable` refuses a location that exists
    * without a catalog entry (LOCATION_ALREADY_EXISTS). Drop any
    * catalog entry AND the on-disk location before writing.
    */
  private def freshTarget(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val p = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** One pass, each stage reading the previously-written table — the
    * warehouse posture (no caches to pin or leak; a failed build is
    * re-attempted on the next accessor call in a fresh session).
    * `repartition(8, key)` before each bucketed write aligns task
    * partitioning with the bucket hash (Murmur3 mod 8 on both sides),
    * so every task writes exactly one bucket file AND the clustering
    * already satisfies the downstream dedup/window requirement — one
    * shuffle serves layout and computation.
    */
  private def build(s: SparkSession, d: String): Unit = {
    val t0 = System.nanoTime()
    try doBuild(s, d)
    finally lastBuildSecs.put(d, (System.nanoTime() - t0) / 1e9)
  }

  private def doBuild(s: SparkSession, d: String): Unit = {
    Seq(rawName(d), eName(d), simName(d), undName(d))
      .foreach(freshTarget(s, _))
    val raw0 = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      .join(Tables.lineitem(s, d).select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .repartition(8, col("ck"))
      .dropDuplicates("ck", "sk")
    Sources.writeBucketed(raw0, rawName(d), "ck", 8)

    // capped variant: the bucketed scan's HashPartitioning(ck) feeds the
    // cap window's partitionBy(ck) with no exchange
    val rawT = s.table(rawName(d))
    Sources.writeBucketed(
      Graph.capDegree(rawT, "ck", "sk", 128), eName(d), "ck", 8)

    // similarity pairs: the ck-bucketed self-join needs no exchange on
    // either side; pair volume is Σ min(deg,128)² by construction
    val eT = s.table(eName(d))
    val deg0 = eT.groupBy("sk").agg(count(lit(1)).as("n"))
    val pairs = eT.alias("a")
      .join(eT.alias("b"),
        col("a.ck") === col("b.ck") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
      .agg(count(lit(1)).as("common"))
    val sim0 = pairs
      .join(deg0.select(col("sk").as("u"), col("n").as("nu")), "u")
      .join(deg0.select(col("sk").as("v"), col("n").as("nv")), "v")
      .select(col("u"), col("v"), col("common"), col("nu"), col("nv"),
        round(col("common").cast("double") /
          (col("nu") + col("nv") - col("common")), 6).as("j"))
      .repartition(8, col("u"))
    Sources.writeBucketed(sim0, simName(d), "u", 8)

    // kNN edges: top-3 by similarity per node over the symmetrized
    // pairs, canonicalized undirected
    val simT = s.table(simName(d))
    val dir = simT.select(col("u").as("a"), col("v").as("b"), col("j"))
      .unionByName(simT.select(col("v").as("a"), col("u").as("b"), col("j")))
    val und0 = dir
      .withColumn("rn", row_number().over(
        Window.partitionBy("a").orderBy(desc("j"), asc("b"))))
      .filter(col("rn") <= 3)
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .repartition(8, col("u"))
    Sources.writeBucketed(und0, undName(d), "u", 8)
  }
}
