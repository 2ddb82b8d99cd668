package graft

import org.apache.spark.sql.functions._

import graft.ops.{ConcurrentWriteConflictException, Layout}

/** Named refs on the manifest layer — tags (immutable version names)
  * and branches (isolated zero-copy workspaces with fast-forward
  * publish), with retention protecting referenced versions and the
  * read surface riding `VERSION AS OF '<name>'`.
  */
class RefsSpec extends GraftSuite {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def orders = Tables(spark, sf, "orders")
    .select(col("o_orderkey").as("key"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").cast("double").as("price"))

  test("tags: immutable named versions; history shows them; retention stops at a tagged version until the tag drops") {
    val root = tmp("refs-tag") + "/t"
    Layout.snapshotAppend(spark, root, orders.filter(col("key") % 3 === 0))
    Layout.snapshotAppend(spark, root, orders.filter(col("key") % 3 === 1))
    Layout.snapshotAppend(spark, root, orders.filter(col("key") % 3 === 2))
    Layout.snapshotTag(spark, root, "train-v1", 2)
    // duplicate names refuse; all-digit names refuse (VERSION AS OF
    // ambiguity); a tag of an uncommitted version refuses
    intercept[IllegalArgumentException] {
      Layout.snapshotTag(spark, root, "train-v1", 1)
    }
    intercept[IllegalArgumentException] {
      Layout.snapshotTag(spark, root, "7", 1)
    }
    intercept[IllegalArgumentException] {
      Layout.snapshotTag(spark, root, "ghost", 99)
    }
    // the ref resolves to the pinned content
    val (r, v) = Layout.snapshotRefTarget(spark, root, "train-v1")
    assert(r == root && v == 2)
    // history surfaces the ref at its version
    val hist = Layout.snapshotHistory(spark, root)
      .select("version", "refs").collect()
      .map(row => row.getInt(0) -> row.getSeq[String](1)).toMap
    assert(hist(2) == Seq("tag:train-v1") && hist(1).isEmpty)
    // retention: the drop-prefix truncates at the tagged version — v1
    // goes, v2 (tagged) and v3 survive even under keep=1
    Layout.vacuumSnapshots(spark, root, keep = 1)
    assert(Layout.snapshotVersions(spark, root) == Seq(2, 3),
      "a tagged version must survive any retention policy")
    assert(Layout.readSnapshot(spark, root, 2).count() > 0,
      "the tagged version's files survive too")
    // dropping the tag unpins; the next retention pass may reclaim it
    Layout.snapshotDropRef(spark, root, "train-v1")
    Layout.vacuumSnapshots(spark, root, keep = 1)
    assert(Layout.snapshotVersions(spark, root) == Seq(3))
  }

  test("branches: zero-copy fork, isolation both ways, fast-forward publish adopts the head by reference, non-FF refuses typed") {
    val root = tmp("refs-br") + "/t"
    Layout.snapshotAppend(spark, root, orders.filter(col("key") % 2 === 0),
      statsKey = Some("key"))
    val mainBefore = Layout.readSnapshot(spark, root).localCheckpoint()
    val bRoot = Layout.snapshotBranch(spark, root, "dev")
    assert(bRoot == Layout.snapshotBranchRoot(root, "dev"))
    // the branch is born as the fork content with ZERO data copy:
    // its files ARE main's files
    assert(Layout.readSnapshot(spark, bRoot).inputFiles.toSet ==
      Layout.readSnapshot(spark, root).inputFiles.toSet,
      "branch creation must not copy a data byte")
    // writes to the branch: ordinary Layout ops against the workspace
    Layout.snapshotAppend(spark, bRoot,
      orders.filter(col("key") % 2 === 1))         // branch v2
    // ISOLATION: main unchanged; branch sees its own writes
    val main = Layout.readSnapshot(spark, root)
    assert(main.exceptAll(mainBefore).isEmpty &&
      mainBefore.exceptAll(main).isEmpty,
      "branch commits must be invisible to main before publish")
    assert(Layout.readSnapshot(spark, bRoot).count() == orders.count())
    // history shows the branch at its fork point
    assert(Layout.snapshotHistory(spark, root)
      .filter(col("version") === 1).select("refs")
      .head().getSeq[String](0) == Seq("branch:dev"))
    // FAST-FORWARD PUBLISH: one main commit, content = branch head,
    // files adopted BY REFERENCE (no rewrite)
    val pub = Layout.snapshotBranchPublish(spark, root, "dev")
    assert(pub == 2)
    val mainNow = Layout.readSnapshot(spark, root)
    val branchHead = Layout.readSnapshot(spark, bRoot)
    assert(mainNow.exceptAll(branchHead).isEmpty &&
      branchHead.exceptAll(mainNow).isEmpty,
      "published main must equal the branch head exactly")
    assert(Layout.readSnapshot(spark, root, 2).inputFiles.toSet ==
      branchHead.inputFiles.toSet,
      "publish must adopt the branch's files by reference, not rewrite")
    // the ref advanced to the published version; the branch continues
    assert(Layout.snapshotRefs(spark, root)
      .exists(r => r.name == "dev" && r.version == 2))
    Layout.snapshotAppend(spark, bRoot,
      orders.filter(col("key") % 97 === 0))
    // MAIN MOVED with a PURE APPEND disjoint from the branch's files:
    // publish REBASES — the published commit carries the branch head's
    // content PLUS main's appended files (file-level disjointness is
    // structural: main's new files postdate the fork)
    Layout.snapshotAppend(spark, root, orders.filter(col("key") % 89 === 0))
    val pub2 = Layout.snapshotBranchPublish(spark, root, "dev")
    val expected = orders
      .unionAll(orders.filter(col("key") % 97 === 0))
      .unionAll(orders.filter(col("key") % 89 === 0))
    val got = Layout.readSnapshot(spark, root)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "rebase publish must land BOTH the branch content and main's append")
    // the BRANCH was rebased too: its head equals the published content,
    // so the NEXT fast-forward publish cannot drop main's appended rows
    val bNow = Layout.readSnapshot(spark, bRoot)
    assert(bNow.exceptAll(got).isEmpty && got.exceptAll(bNow).isEmpty,
      "the workspace must adopt main's appends during a rebase publish")
    assert(Layout.snapshotRefs(spark, root)
      .exists(r => r.name == "dev" && r.version == pub2))
    // OVERLAPPING main change (a compaction rewrote files the fork
    // read): not rebasable → typed refusal naming the change
    Layout.snapshotAppend(spark, bRoot, orders.limit(5))
    Layout.snapshotCompact(spark, root, 64L << 20)
    val ex = intercept[ConcurrentWriteConflictException] {
      Layout.snapshotBranchPublish(spark, root, "dev")
    }
    assert(ex.getMessage.contains("not rebasable"))
  }

  test("publish crash repair: a landed commit whose ref write was lost is detected from the stamp — idempotent catch-up, then normal publishing") {
    val root = tmp("refs-repair") + "/t"
    Layout.snapshotAppend(spark, root, orders.filter(col("key") % 2 === 0))
    val bRoot = Layout.snapshotBranch(spark, root, "dev")
    Layout.snapshotAppend(spark, bRoot, orders.filter(col("key") % 2 === 1))
    val pub = Layout.snapshotBranchPublish(spark, root, "dev")
    // simulate the crash window: the publish commit landed but the ref
    // write didn't — rewind the ref to the old fork by hand (through the
    // Hadoop fs so the CRC sidecar follows)
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val refOut = hfs.create(
      new org.apache.hadoop.fs.Path(s"$root/_refs/dev.ref"), true)
    try refOut.write("kind=branch\nv=1\n".getBytes("UTF-8"))
    finally refOut.close()
    // next publish detects the landed head from #publishRef/#publishSrc,
    // repairs the ref, and returns the landed version WITHOUT a new
    // commit (the branch hasn't moved)
    val repaired = Layout.snapshotBranchPublish(spark, root, "dev")
    assert(repaired == pub, "an already-landed head repairs, not refuses")
    assert(Layout.snapshotVersions(spark, root).last == pub,
      "idempotent repair must not commit a duplicate version")
    assert(Layout.snapshotRefs(spark, root)
      .exists(r => r.name == "dev" && r.version == pub))
    // and the branch keeps publishing normally afterwards
    Layout.snapshotAppend(spark, bRoot, orders.limit(7))
    val next = Layout.snapshotBranchPublish(spark, root, "dev")
    assert(next == pub + 1)
    val got = Layout.readSnapshot(spark, root)
    val expected = orders.unionAll(orders.limit(7))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("workspace vacuum safety: branch-side vacuum and orphan sweep never delete files main's published versions reference") {
    val root = tmp("refs-wsvac") + "/t"
    Layout.snapshotAppend(spark, root, orders.filter(col("key") % 2 === 0))
    val bRoot = Layout.snapshotBranch(spark, root, "dev")
    Layout.snapshotAppend(spark, bRoot, orders.filter(col("key") % 2 === 1))
    Layout.snapshotBranchPublish(spark, root, "dev")
    val mainBefore = Layout.readSnapshot(spark, root).localCheckpoint()
    val adopted = Layout.readSnapshot(spark, root).inputFiles
      .filter(_.contains("/_refs/dev.branch/"))
    assert(adopted.nonEmpty, "fixture: main must reference workspace files")
    // the branch keeps working: a compaction rewrites its files, so the
    // published files are now referenced ONLY by old branch versions —
    // and by MAIN. Branch-side retention + orphan sweep (explicitly
    // supported on a workspace — it is a full table root) must protect
    // them: per-root reasoning alone would count them dead.
    Layout.snapshotCompact(spark, bRoot, 64L << 20)
    Layout.vacuumSnapshots(spark, bRoot, keep = 1)
    Layout.vacuumOrphanFiles(spark, bRoot)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    adopted.foreach { f =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(f)),
        s"published file $f must survive workspace-side vacuum — deleting " +
          "it is silent data loss on the MAIN line")
    }
    val mainNow = Layout.readSnapshot(spark, root)
    assert(mainNow.exceptAll(mainBefore).isEmpty &&
      mainBefore.exceptAll(mainNow).isEmpty,
      "main must read identically after workspace maintenance")
    // the dropped-and-re-created branch name replays the same hazard:
    // the NEW workspace's orphan sweep sees the old published files as
    // unreferenced garbage unless the parent's references protect them
    Layout.snapshotDropRef(spark, root, "dev")
    Layout.snapshotBranch(spark, root, "dev")
    Layout.vacuumOrphanFiles(spark, Layout.snapshotBranchRoot(root, "dev"))
    adopted.foreach { f =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(f)),
        s"published file $f must survive the re-created branch's sweep")
    }
    val mainAfter = Layout.readSnapshot(spark, root)
    assert(mainAfter.exceptAll(mainBefore).isEmpty &&
      mainBefore.exceptAll(mainAfter).isEmpty)
  }

  test("branch drop: an unpublished workspace deletes whole; a published one keeps its adopted data files for main") {
    val root = tmp("refs-drop") + "/t"
    Layout.snapshotAppend(spark, root, orders.limit(50))
    // unpublished branch: drop removes the entire workspace
    val b1 = Layout.snapshotBranch(spark, root, "scratch")
    Layout.snapshotAppend(spark, b1, orders.limit(10))
    Layout.snapshotDropRef(spark, root, "scratch")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(b1)),
      "an unpublished branch's workspace is garbage — delete it whole")
    assert(Layout.snapshotRefs(spark, root).isEmpty)
    // published branch: main references workspace data files — drop
    // keeps them (main's vacuum owns their lifecycle now)
    val b2 = Layout.snapshotBranch(spark, root, "shipit")
    Layout.snapshotAppend(spark, b2, orders.limit(20))
    Layout.snapshotBranchPublish(spark, root, "shipit")
    val adopted = Layout.readSnapshot(spark, root).inputFiles
      .filter(_.contains("/_refs/shipit.branch/"))
    assert(adopted.nonEmpty, "published main must reference workspace files")
    Layout.snapshotDropRef(spark, root, "shipit")
    assert(Layout.readSnapshot(spark, root).count() == 70,
      "main must stay fully readable after dropping a published branch")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$b2/_manifests")),
      "the dropped branch's own manifests go")
  }

  test("SQL surface: VERSION AS OF resolves tag and branch names through the catalog") {
    import spark.implicits._
    val wh = tmp("refs-sql")
    spark.conf.set("spark.sql.catalog.grefs",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grefs.root", wh)
    spark.sql("CREATE TABLE grefs.t (k BIGINT, v DOUBLE)")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").createOrReplaceTempView("r_src")
    spark.sql("INSERT INTO grefs.t SELECT * FROM r_src")         // v2
    val root = s"$wh/t"
    Layout.snapshotTag(spark, root, "golden")                    // tag @ v2
    Seq((3L, 3.0)).toDF("k", "v").createOrReplaceTempView("r_src2")
    spark.sql("INSERT INTO grefs.t SELECT * FROM r_src2")        // v3
    assert(spark.sql("SELECT * FROM grefs.t VERSION AS OF 'golden'")
      .count() == 2, "the tag pins v2 regardless of later commits")
    // branch: write to the workspace, read it by name
    val bRoot = Layout.snapshotBranch(spark, root, "exp")
    Layout.snapshotAppend(spark, bRoot,
      Seq((100L, 100.0)).toDF("k", "v"))
    assert(spark.sql("SELECT * FROM grefs.t VERSION AS OF 'exp'")
      .count() == 4, "the branch name reads the workspace head")
    assert(spark.sql("SELECT count(*) FROM grefs.t").head().getLong(0) == 3,
      "main stays isolated from the branch")
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM grefs.t VERSION AS OF 'nope'").collect()
    }
    assert(ex.getMessage.contains("no ref") ||
      ex.getMessage.contains("not an integer"))
  }

  test("SQL procedures + writable branch identifier: CALL tag/branch/publish/drop_ref; INSERT INTO t.branch_<name> isolates until publish") {
    import spark.implicits._
    val wh = tmp("refs-proc")
    spark.conf.set("spark.sql.catalog.gproc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.root", wh)
    spark.sql("CREATE TABLE gproc.t (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k')")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").createOrReplaceTempView("pr_src")
    spark.sql("INSERT INTO gproc.t SELECT * FROM pr_src")       // v2
    // tag via SQL
    val tagRow = spark.sql(
      "CALL gproc.system.tag(table => 't', name => 'golden')").head()
    assert(tagRow.getString(0) == "golden" && tagRow.getInt(1) == 2)
    // branch via SQL, write through the branch identifier
    val br = spark.sql(
      "CALL gproc.system.branch(table => 't', name => 'dev')").head()
    assert(br.getString(0) == "dev" && br.getInt(1) == 2)
    Seq((10L, 10.0)).toDF("k", "v").createOrReplaceTempView("pr_src2")
    spark.sql("INSERT INTO gproc.t.branch_dev SELECT * FROM pr_src2")
    assert(spark.sql("SELECT count(*) FROM gproc.t.branch_dev")
      .head().getLong(0) == 3, "the branch identifier reads its workspace")
    assert(spark.sql("SELECT count(*) FROM gproc.t").head().getLong(0) == 2,
      "main must stay isolated from branch-identifier writes")
    // SQL row-level ops run on the branch too (the workspace is a full
    // table root behind the same catalog surface)
    spark.sql("UPDATE gproc.t.branch_dev SET v = v + 100 WHERE k = 10")
    assert(spark.sql(
      "SELECT v FROM gproc.t.branch_dev WHERE k = 10").head().getDouble(0)
      == 110.0)
    // publish via SQL: main becomes the branch head
    val pub = spark.sql(
      "CALL gproc.system.publish(table => 't', name => 'dev')").head()
    assert(pub.getInt(0) == 3)
    assert(spark.sql("SELECT count(*) FROM gproc.t").head().getLong(0) == 3)
    assert(spark.sql("SELECT v FROM gproc.t WHERE k = 10")
      .head().getDouble(0) == 110.0)
    // graft.t.refs metadata table: the queryable inventory
    val refs = spark.sql("SELECT name, kind, version FROM gproc.t.refs " +
      "ORDER BY name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(refs == Seq(("dev", "branch", 3), ("golden", "tag", 2)),
      s"refs inventory: $refs")
    // drop via SQL; the identifier stops resolving
    assert(spark.sql("CALL gproc.system.drop_ref(table => 't', " +
      "name => 'golden')").head().getString(0) == "tag:golden")
    intercept[Exception] {
      spark.sql("SELECT * FROM gproc.t VERSION AS OF 'golden'").collect()
    }
  }

  test("SQL UPDATE emits the typed CDC pair (routes through snapshotMergeKeys, which stamps cdcKey)") {
    import spark.implicits._
    val wh = tmp("refs-sqlupd")
    spark.conf.set("spark.sql.catalog.gupd",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gupd.root", wh)
    spark.sql("CREATE TABLE gupd.t (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k')")
    (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
      .createOrReplaceTempView("su_src")
    spark.sql("INSERT INTO gupd.t SELECT * FROM su_src")        // v2
    spark.sql("UPDATE gupd.t SET v = v + 1000 WHERE k = 42")    // v3 (COW)
    val ch = Layout.snapshotChanges(spark, s"$wh/t", 2, 3).localCheckpoint()
    val byType = ch.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L),
      s"a one-row SQL UPDATE must type exactly one pair: $byType")
    assert(ch.filter(col("_change_type") === "update_postimage")
      .select("v").head().getDouble(0) == 1042.0)
  }

  test("age-based retention also stops at a protected version") {
    val root = tmp("refs-age") + "/t"
    Layout.snapshotAppend(spark, root, orders.limit(10))
    Layout.snapshotAppend(spark, root, orders.limit(20))
    Layout.snapshotAppend(spark, root, orders.limit(30))
    Layout.snapshotBranch(spark, root, "hold", fromVersion = 2)
    // cutoff far in the future would drop v1 and v2 — the fork stops it
    val stats = Layout.vacuumSnapshotsOlderThan(spark, root,
      cutoffMillis = System.currentTimeMillis() + 1000000, minKeep = 1)
    assert(Layout.snapshotVersions(spark, root) == Seq(2, 3),
      "the branch fork version must survive age-based retention")
  }
}
