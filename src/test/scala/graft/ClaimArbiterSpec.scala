package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{ClaimArbiter, Layout}

/** A lock-table arbiter: putIfAbsent on a JVM-global map — the same
  * CAS-on-absence primitive a DynamoDB lock table or a conditional PUT
  * provides. Counters let the spec prove commits actually route
  * through it.
  */
class TestLockTableArbiter extends ClaimArbiter {
  import TestLockTableArbiter._
  override def tryClaim(spark: SparkSession, root: String, version: Int,
      token: String): Boolean = {
    claims.incrementAndGet()
    table.putIfAbsent(key(root, version), token) == null
  }
  override def holder(spark: SparkSession, root: String,
      version: Int): Option[String] =
    Option(table.get(key(root, version)))
  override def release(spark: SparkSession, root: String, version: Int,
      token: String): Unit =
    table.remove(key(root, version), token)
}

object TestLockTableArbiter {
  private def key(root: String, version: Int) =
    new org.apache.hadoop.fs.Path(root).toUri.getPath + "#" + version
  val table = new java.util.concurrent.ConcurrentHashMap[String, String]()
  val claims = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Plant a foreign claim, as a racing writer would. */
  def plant(root: String, version: Int, token: String): Unit =
    table.put(key(root, version), token)
  def unplant(root: String, version: Int): Unit =
    table.remove(key(root, version))
}

/** The external [[ClaimArbiter]] seam: commits route their claim CAS /
  * holder re-read / release through the configured lock service — the
  * object-store commit answer — with the rest of the protocol
  * (loud loss, idempotent reclaim) unchanged.
  */
class ClaimArbiterSpec extends GraftSuite {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def withArbiter[T](body: => T): T = {
    spark.conf.set("spark.graft.commit.arbiter",
      classOf[TestLockTableArbiter].getName)
    try body
    finally spark.conf.unset("spark.graft.commit.arbiter")
  }

  test("commits claim through the configured lock table; reads stay exact") {
    withArbiter {
      val root = freshRoot("arb")
      import spark.implicits._
      val c0 = TestLockTableArbiter.claims.get()
      Layout.snapshotAppend(spark, root,
        Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      Layout.snapshotAppend(spark, root, Seq((3L, "c")).toDF("k", "v"))
      assert(TestLockTableArbiter.claims.get() - c0 >= 2,
        "both commits must CAS through the arbiter")
      assert(Layout.snapshotVersions(spark, root) == Seq(1, 2))
      assert(Layout.readSnapshot(spark, root).count() == 3)
      // both versions' claims are still held in the lock table (released
      // only by TTL/expiry in a real service) — holder survives
      assert(TestLockTableArbiter.table.keySet().size() >= 2)
    }
  }

  test("a foreign claim in the lock table makes the commit lose LOUDLY, and releasing it unblocks") {
    withArbiter {
      val root = freshRoot("arb-race")
      import spark.implicits._
      Layout.snapshotAppend(spark, root, Seq((1L, "a")).toDF("k", "v"))
      // a racing writer holds v2 in the lock table
      TestLockTableArbiter.plant(root, 2, "racer")
      val ex = intercept[IllegalStateException] {
        Layout.snapshotAppend(spark, root, Seq((2L, "b")).toDF("k", "v"))
      }
      assert(ex.getMessage.contains("lost the race"))
      assert(Layout.snapshotVersions(spark, root) == Seq(1),
        "the loser must not publish")
      TestLockTableArbiter.unplant(root, 2)
      Layout.snapshotAppend(spark, root, Seq((2L, "b")).toDF("k", "v"))
      assert(Layout.snapshotVersions(spark, root) == Seq(1, 2))
    }
  }

  test("idempotent writer reclaims its OWN lock-table claim after a simulated pre-rename crash") {
    withArbiter {
      val root = freshRoot("arb-reclaim")
      import spark.implicits._
      Layout.snapshotAppend(spark, root, Seq((1L, "a")).toDF("k", "v"))
      // simulate: writer 'w1' claimed v2 in the lock table, then crashed
      // before the manifest rename — on replay the SAME writer id must
      // reclaim and complete, not deadlock on its own stale claim
      TestLockTableArbiter.plant(root, 2, "w1")
      val v = Layout.snapshotAppendIdempotent(spark, root,
        Seq((2L, "b")).toDF("k", "v"), epoch = 1, writerId = "w1")
      assert(v == 2)
      assert(Layout.readSnapshot(spark, root).count() == 2)
      // a FOREIGN writer in the same position stays a loss
      TestLockTableArbiter.plant(root, 3, "someone-else")
      val ex = intercept[IllegalStateException] {
        Layout.snapshotAppendIdempotent(spark, root,
          Seq((3L, "c")).toDF("k", "v"), epoch = 2, writerId = "w2")
      }
      assert(ex.getMessage.contains("lost the race"))
      TestLockTableArbiter.unplant(root, 3)
    }
  }

  test("eight concurrent appends through the lock-table arbiter: linear history, no lost commits") {
    withArbiter {
      import spark.implicits._
      val root = freshRoot("arb-conc")
      Layout.snapshotAppend(spark, root, Seq((0L, "base")).toDF("key", "tag"))
      val writers = 8
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = (1 to writers).map { w =>
        scala.concurrent.Future {
          Layout.withCommitRetry(attempts = writers + 2) {
            Layout.snapshotAppend(spark, root,
              Seq((w.toLong, s"writer$w")).toDF("key", "tag"))
          }
        }
      }
      import scala.concurrent.duration._
      val committed = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures), 120.seconds)
      pool.shutdown()
      assert(Layout.snapshotVersions(spark, root) == (1 to writers + 1),
        "history must be a linear sequence of winners")
      assert(committed.toSet.size == writers)
      val rows = Layout.readSnapshot(spark, root)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(rows == ((0L, "base") +:
        (1 to writers).map(w => (w.toLong, s"writer$w"))).sorted,
        "no commit lost, none duplicated — the lock-table CAS arbitrated")
    }
  }
}
