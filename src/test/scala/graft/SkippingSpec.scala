package graft

import graft.sources.Commit
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Manifest-level data skipping (graft.sources.Skipping +
  * Commit.readWhere): zone maps harvested from parquet footers at
  * publish time must prune entries the predicate cannot match — and
  * must NEVER change a result. Every case here asserts both: the
  * skipping plan (which entries survived) and bit-equality of the
  * pruned read with the unpruned read + filter.
  */
class SkippingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/table"

  /** Four buckets with DISJOINT v ranges: bucket b holds v in
    * [100b, 100b+9], names prefixed per bucket, note null only in
    * bucket 0, ts = 2024-01-01 + b days (+i minutes).
    */
  private def zonedDf = {
    val rows = for (b <- 0 to 3; i <- 0 to 9) yield
      (b.toLong * 10 + i, b * 100 + i,
        ('a' + b).toChar.toString + "x" + i,
        if (b == 0) null else s"n$b", b, i)
    rows.toDF("user_id", "v", "name", "note", "bucket", "i")
      .withColumn("ts", expr(
        "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,bucket,0,i,0)"))
      .drop("i")
  }

  private def keptDirs(root: String, pred: String): Set[String] = {
    val (kept, _) = Commit.planWhere(spark, root, pred)
    kept.map(_.dir).toSet
  }

  /** The invariant every case must hold: pruned read ≡ full read +
    * filter, row for row.
    */
  private def sameAsUnpruned(root: String, pred: String): Unit = {
    val pruned = Commit.readWhere(spark, root, pred).get
      .select("user_id", "v").as[(Long, Int)].collect().toSet
    val full = Commit.read(spark, root).get.filter(expr(pred))
      .select("user_id", "v").as[(Long, Int)].collect().toSet
    assert(pruned === full, s"pruning changed the result for: $pred")
  }

  test("value-range zone maps prune buckets the predicate cannot match") {
    val root = tmp("skip-range")
    Commit.publishBuckets(zonedDf, root)
    // the manifest carries stats for every entry
    val m = Files.readString(Paths.get(root, "manifest-1.txt"))
    assert(m.linesIterator.count(_.startsWith("#stats=")) === 4, m.take(400))

    assert(keptDirs(root, "v >= 200") ===
      Set("v=1/bucket=2", "v=1/bucket=3"))
    assert(keptDirs(root, "v > 209") === Set("v=1/bucket=3"))
    assert(keptDirs(root, "v = 105") === Set("v=1/bucket=1"))
    assert(keptDirs(root, "v between 5 and 102") ===
      Set("v=1/bucket=0", "v=1/bucket=1"))
    assert(keptDirs(root, "v in (5, 305)") ===
      Set("v=1/bucket=0", "v=1/bucket=3"))
    assert(keptDirs(root, "v >= 100 and v < 200") === Set("v=1/bucket=1"))
    assert(keptDirs(root, "v < 10 or v > 300") ===
      Set("v=1/bucket=0", "v=1/bucket=3"))
    // literal-on-the-left mirrors
    assert(keptDirs(root, "200 <= v") === Set("v=1/bucket=2", "v=1/bucket=3"))
    Seq("v >= 200", "v = 105", "v in (5, 305)", "v < 10 or v > 300")
      .foreach(sameAsUnpruned(root, _))
  }

  test("timestamp, string-prefix, null-count, and bucket-key pruning") {
    val root = tmp("skip-kinds")
    Commit.publishBuckets(zonedDf, root)
    // ts: bucket b spans [Jan 1+b 00:00, Jan 1+b 00:09]
    assert(keptDirs(root, "ts >= timestamp_ntz'2024-01-03 00:00:00'") ===
      Set("v=1/bucket=2", "v=1/bucket=3"))
    assert(keptDirs(root,
      "ts between timestamp_ntz'2024-01-02 00:00:00' " +
        "and timestamp_ntz'2024-01-02 23:59:59'") === Set("v=1/bucket=1"))
    // names in bucket b start with ('a'+b): like 'cx%' → bucket 2 only
    assert(keptDirs(root, "name like 'cx%'") === Set("v=1/bucket=2"))
    assert(keptDirs(root, "name like 'z%'") === Set.empty[String])
    // note is null only in bucket 0; null-rejecting compare never
    // matches the all-null entry
    assert(keptDirs(root, "note is null") === Set("v=1/bucket=0"))
    assert(keptDirs(root, "note = 'n2'") === Set("v=1/bucket=2"))
    assert(keptDirs(root, "note is not null") ===
      Set("v=1/bucket=1", "v=1/bucket=2", "v=1/bucket=3"))
    // the bucket partition column prunes by entry key
    assert(keptDirs(root, "bucket = 3") === Set("v=1/bucket=3"))
    assert(keptDirs(root, "bucket >= 2 and v < 250") === Set("v=1/bucket=2"))
    Seq("ts >= timestamp_ntz'2024-01-03 00:00:00'", "name like 'cx%'",
      "note is null", "bucket = 3").foreach(sameAsUnpruned(root, _))
  }

  test("a fully pruned read returns an empty relation with the committed schema") {
    val root = tmp("skip-empty")
    Commit.publishBuckets(zonedDf, root)
    val df = Commit.readWhere(spark, root, "v > 10000").get
    assert(df.columns.toSet ===
      Set("user_id", "v", "name", "note", "ts", "bucket"))
    assert(df.count() === 0)
    val (kept, pruned) = Commit.planWhere(spark, root, "v > 10000")
    assert(kept.isEmpty && pruned.size === 4)
  }

  test("carried buckets keep their zone maps across incremental publishes") {
    val root = tmp("skip-carry")
    Commit.publishBuckets(zonedDf, root) // v=1, buckets 0-3
    // rewrite ONLY bucket 0 with values far above everyone
    val patch = Seq((99L, 900, "zz", "n0", 0))
      .toDF("user_id", "v", "name", "note", "bucket")
      .withColumn("ts", expr("timestamp_ntz'2024-02-01 00:00:00'"))
    Commit.publishBuckets(patch, root) // v=2
    // carried buckets 1-3 must still prune on their v=1 stats,
    // and the fresh bucket 0 on its new ones
    assert(keptDirs(root, "v >= 900") === Set("v=2/bucket=0"))
    assert(keptDirs(root, "v between 100 and 199") === Set("v=1/bucket=1"))
    assert(keptDirs(root, "v <= 9") === Set.empty[String]) // old bucket-0 range gone
    sameAsUnpruned(root, "v >= 900")
    sameAsUnpruned(root, "v between 100 and 199")
  }

  test("stats-less manifests and unknown shapes decline to prune") {
    val root = tmp("skip-legacy")
    // a pre-skipping manifest, hand-written exactly as round 11 wrote
    // them: no #stats lines
    zonedDf.filter(col("bucket") === 1).drop("bucket")
      .write.parquet(s"$root/v=1/bucket=1")
    Files.writeString(Paths.get(root, "manifest-1.txt"),
      "1\n#parent=0\n1\tv=1/bucket=1")
    val tmpPtr = Paths.get(root, "_POINTER")
    Files.writeString(tmpPtr, "manifest-1.txt")
    // a value predicate cannot prune without stats — but the read
    // still answers correctly
    assert(keptDirs(root, "v >= 10000") === Set("v=1/bucket=1"))
    assert(Commit.readWhere(spark, root, "v >= 100").get.count() === 10)
    // unknown column / unsupported shape keep everything
    val root2 = tmp("skip-conservative")
    Commit.publishBuckets(zonedDf, root2)
    assert(keptDirs(root2, "no_such_col > 5").size === 4)
    assert(keptDirs(root2, "v % 7 = 3").size === 4)
    assert(keptDirs(root2, "not (v > 200)").size === 4)
    sameAsUnpruned(root2, "v % 7 = 3")
  }
}
