package graft

import graft.sources.Commit
import org.apache.spark.sql.functions._

/** Concurrent writers on ONE table within one driver — the real
  * posture of a maintained table whose statusUpsert stream, gold
  * refresh, and optimizeBuckets cron share the JVM. Commit's per-root
  * writer lock serializes the read-prev → write → claim → swap
  * sequence, so racing publishes must behave as SOME serial order:
  * every publish lands exactly once, versions are dense, no writer's
  * bucket rewrite is lost to a stale carry-forward, txn watermarks
  * max-merge across apps, and the CDF from the baseline reproduces the
  * final snapshot.
  *
  * Without the lock this fails concretely: writer A interleaving
  * between writer B's manifest create and pointer swap carries forward
  * from B's PREDECESSOR, silently resurrecting the pre-B content of
  * B's buckets — and the last pointer rename wins, possibly regressing
  * the table to a lower version outright.
  */
class CommitConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("racing same-table writers on disjoint buckets linearize: " +
      "dense versions, no lost rewrites, watermarks max-merge") {
    val root = graft.util.TempRoot.freshDir("commit-conc").toString + "/t"
    val Threads = 4
    val Rounds = 5
    def df(user: Long, v: Double) =
      Seq((user, v)).toDF("user_id", "v")
        .withColumn("bucket", pmod(col("user_id"), lit(Threads)).cast("int"))
    // baseline: every bucket populated (user t lives in bucket t)
    Commit.publishBuckets(
      (0L until Threads.toLong).map(t => (t, 0.0)).toDF("user_id", "v")
        .withColumn("bucket", pmod(col("user_id"), lit(Threads)).cast("int")),
      root)

    val pool = java.util.concurrent.Executors.newFixedThreadPool(Threads)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val futs = (0 until Threads).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          gate.await()
          try {
            (1 to Rounds).foreach { r =>
              // thread t owns bucket t; its epochs advance 1..Rounds
              Commit.publishBuckets(df(t.toLong, r.toDouble), root,
                txn = Some((s"app_$t", r.toLong)))
            }
          } catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    gate.countDown()
    futs.foreach(_.get())
    pool.shutdown()
    assert(errs.isEmpty, s"racing publish threw: ${errs.peek()}")

    // every publish landed exactly once → versions are DENSE
    val head = Commit.current(spark, root).get._1
    assert(head === 1L + Threads * Rounds,
      s"expected ${1 + Threads * Rounds} dense versions, head=$head")
    // no rewrite lost to stale carry-forward: each bucket holds its
    // thread's LAST value
    val got = Commit.read(spark, root).get
      .select("user_id", "v").as[(Long, Double)].collect().toMap
    (0 until Threads).foreach { t =>
      assert(got(t.toLong) === Rounds.toDouble,
        s"bucket $t lost its last rewrite: ${got(t.toLong)}")
    }
    // watermarks max-merged across every interleaving
    (0 until Threads).foreach { t =>
      assert(Commit.lastTxn(spark, root, s"app_$t") === Some(Rounds.toLong),
        s"app_$t watermark wrong")
    }
    // the change feed across the whole contended chain applies cleanly
    val feed = Commit.changesSinceKeyed(spark, root, 1L, Seq("user_id")).get
    val ups = feed.filter(col("_change") === "upsert")
      .select("user_id", "v").as[(Long, Double)].collect().toMap
    assert(feed.filter(col("_change") === "delete").count() === 0)
    (0 until Threads).foreach { t =>
      assert(ups(t.toLong) === Rounds.toDouble,
        s"CDF from the baseline does not converge bucket $t")
    }
  }
}
