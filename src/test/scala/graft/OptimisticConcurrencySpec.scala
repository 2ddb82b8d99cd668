package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{ClaimArbiter, CommitConflictException, Layout}

/** Deterministic two-writer arbiter: the FIRST claim attempt after
  * arming triggers `racer` — a full competing commit of the SAME
  * version — before the caller's CAS runs, so the caller provably
  * loses and must rebase. State lives in the companion because
  * commits cache arbiter instances by class name.
  */
class RacingArbiter extends ClaimArbiter {
  import RacingArbiter._
  override def tryClaim(spark: SparkSession, root: String, version: Int,
      token: String): Boolean = {
    val r = racer
    if (armed && r != null) {
      armed = false
      r() // the competing writer claims and commits this version first
    }
    table.putIfAbsent(key(root, version), token) == null
  }
  override def holder(spark: SparkSession, root: String,
      version: Int): Option[String] =
    Option(table.get(key(root, version)))
  override def release(spark: SparkSession, root: String, version: Int,
      token: String): Unit =
    table.remove(key(root, version), token)
}

object RacingArbiter {
  private def key(root: String, version: Int) =
    new org.apache.hadoop.fs.Path(root).toUri.getPath + "#" + version
  val table = new java.util.concurrent.ConcurrentHashMap[String, String]()
  @volatile var armed: Boolean = false
  @volatile var racer: () => Unit = null
  /** A claim nobody ever releases — a writer that vanished mid-commit. */
  def plantForeign(root: String, version: Int): Unit =
    table.put(key(root, version), "foreign:stuck")
  def reset(): Unit = { table.clear(); armed = false; racer = null }
}

/** OPTIMISTIC CONCURRENCY over the snapshot commit protocol: an append
  * that loses its version claim REBASES — re-resolves the head,
  * recomputes carried state, and re-commits its already-written data
  * files at head+1 (appends commute with any interleaved commit) —
  * while read-dependent committers (overwrite & kin) surface a typed
  * [[CommitConflictException]], because their output was computed from
  * the base version and silently rebasing could drop the winner's
  * effect.
  */
class OptimisticConcurrencySpec extends GraftSuite {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def withArbiter[T](body: => T): T = {
    spark.conf.set("spark.graft.commit.arbiter",
      classOf[RacingArbiter].getName)
    try body
    finally {
      spark.conf.unset("spark.graft.commit.arbiter")
      RacingArbiter.reset()
    }
  }

  test("two concurrent appends both land: the loser rebases onto the winner without rewriting its files") {
    withArbiter {
      import spark.implicits._
      val root = freshRoot("occ")
      Layout.snapshotAppend(spark, root,
        Seq((1L, "base")).toDF("k", "v"), statsKey = Some("k")) // v1
      // writer B fires INSIDE writer A's first claim attempt for v2
      RacingArbiter.racer = () => Layout.snapshotAppend(spark, root,
        Seq((2L, "writerB")).toDF("k", "v"))
      RacingArbiter.armed = true
      val committed = Layout.snapshotAppend(spark, root,
        Seq((3L, "writerA")).toDF("k", "v"))
      assert(committed == 3, s"A must rebase to v3, committed v$committed")
      assert(Layout.snapshotVersions(spark, root) == Seq(1, 2, 3))
      // all three writers' rows present exactly once
      val got = Layout.readSnapshot(spark, root)
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq == Seq((1L, "base"), (2L, "writerB"), (3L, "writerA")))
      // REUSE proof: A staged its files for attempt v2; the rebase
      // committed those same files (path still under a v2-* attempt
      // dir) instead of rewriting them for v3
      val v3Meta = Layout.snapshotMeta(spark, root, 3)
      val aFiles = v3Meta.paths.filterNot(
        Layout.snapshotMeta(spark, root, 2).paths.toSet)
      assert(aFiles.nonEmpty && aFiles.forall(_.contains("/v2-")),
        s"A's files must be the v2-attempt staging reused at v3: $aFiles")
      // the rebase carried the winner's stats property forward: A's new
      // entries still carry k ranges (statsKey declared at v1 travels)
      val files = Layout.snapshotFilesTable(spark, root)
      assert(files.filter(element_at(col("col_ranges"), "k").isNull)
        .count() == 0,
        "every committed file must carry k stats after the rebase")
    }
  }

  test("a permanently-held claim exhausts bounded retries with a typed conflict error") {
    withArbiter {
      import spark.implicits._
      val root = freshRoot("occ2")
      Layout.snapshotAppend(spark, root, Seq((1L, "x")).toDF("k", "v"))
      RacingArbiter.plantForeign(root, 2) // a vanished writer holds v2
      spark.conf.set("spark.graft.commit.maxRetries", "1")
      try {
        val ex = intercept[CommitConflictException] {
          Layout.snapshotAppend(spark, root, Seq((2L, "y")).toDF("k", "v"))
        }
        assert(ex.version == 2 && ex.getMessage.contains("lost the race"))
        // nothing half-committed
        assert(Layout.snapshotVersions(spark, root) == Seq(1))
      } finally spark.conf.unset("spark.graft.commit.maxRetries")
    }
  }

  test("read-dependent committers do NOT auto-rebase: overwrite surfaces the conflict") {
    withArbiter {
      import spark.implicits._
      val root = freshRoot("occ3")
      Layout.snapshotAppend(spark, root, Seq((1L, "x")).toDF("k", "v"))
      RacingArbiter.plantForeign(root, 2)
      val ex = intercept[CommitConflictException] {
        Layout.snapshotOverwrite(spark, root, Seq((9L, "z")).toDF("k", "v"))
      }
      assert(ex.version == 2)
      // the table is untouched: same head, same rows
      assert(Layout.snapshotVersions(spark, root) == Seq(1))
      assert(Layout.readSnapshot(spark, root).count() == 1)
    }
  }

  test("rebase adopts properties a concurrent FIRST commit declared") {
    withArbiter {
      import spark.implicits._
      val root = freshRoot("occ4")
      // writer B creates the table WITH a statsKey while A races it for v1
      RacingArbiter.racer = () => Layout.snapshotAppend(spark, root,
        Seq((10L, "first")).toDF("k", "v"), statsKey = Some("k"))
      RacingArbiter.armed = true
      val committed = Layout.snapshotAppend(spark, root,
        Seq((20L, "second")).toDF("k", "v")) // declares nothing
      assert(committed == 2)
      // A's rebased commit recomputed its entries under B's statsKey —
      // its file carries k stats, so the table prunes uniformly
      val files = Layout.snapshotFilesTable(spark, root)
      assert(files.filter(element_at(col("col_ranges"), "k").isNull)
        .count() == 0,
        "the rebased file must carry stats under the adopted statsKey")
      val got = Layout.readSnapshot(spark, root).orderBy("k")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(10L, 20L))
    }
  }
}
