package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout
import graft.ops.Layout.{MaintenancePolicy, MaintenanceReport}

/** The standing maintenance driver ([[Layout.snapshotMaintain]]):
  * metadata-priced debt measurement, threshold-gated compaction that
  * fires EXACTLY ONCE per debt accrual, age-based retention, orphan
  * sweep — and a guaranteed no-op rerun (maintenance never ping-pongs).
  */
class MaintenanceSpec extends GraftSuite {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def ordersBase = Tables(spark, sf, "orders")
    .select(col("o_orderkey").as("key"),
      col("o_totalprice").cast("double").as("price"))
    .repartitionByRange(8, col("key")).sortWithinPartitions(col("key"))

  test("MOR sidecar debt past threshold: compaction fires once, folds the debt, retention expires history, rerun is a no-op") {
    val root = freshRoot("maint-mor")
    Layout.snapshotAppend(spark, root, ordersBase, statsKey = Some("key"))
    val keys = Layout.readSnapshot(spark, root)
      .select("key").orderBy("key").limit(9)
      .collect().map(_.getLong(0))
    // three MOR deletes = three sidecar commits (debt past maxDeleteFiles=3)
    keys.grouped(3).foreach(g =>
      Layout.snapshotDeleteMOR(spark, root, "key", g))
    val preVersions = Layout.snapshotVersions(spark, root)
    assert(preVersions.size == 4)
    val expect = Layout.readSnapshot(spark, root).localCheckpoint()
    assert(expect.filter(col("key").isin(keys.map(Long.box): _*)).isEmpty)

    val policy = MaintenancePolicy(maxDeleteFiles = 3,
      maxSmallFiles = 1000000, retentionMillis = 0, minKeepVersions = 1)
    val now = System.currentTimeMillis() + 10000
    val r: MaintenanceReport = Layout.snapshotMaintain(spark, root, policy, now)

    assert(r.deleteFilesBefore >= 3, s"saw ${r.deleteFilesBefore} sidecars")
    assert(r.compactedVersion.contains(preVersions.last + 1))
    // debt folded: head has zero sidecars and serves the same rows
    val head = Layout.snapshotVersions(spark, root)
    assert(head == Seq(r.compactedVersion.get),
      s"retention should keep only the compacted head, saw $head")
    val hist = Layout.snapshotHistory(spark, root)
      .select("n_delete_files").head().getInt(0)
    assert(hist == 0, "compaction must fold the sidecar debt")
    val after = Layout.readSnapshot(spark, root)
    assert(after.exceptAll(expect).isEmpty && expect.exceptAll(after).isEmpty)
    // retention dropped every pre-compaction version (oldest prefix)
    assert(r.vacuum.droppedVersions == preVersions)

    // CONVERGENCE: the very next cycle observes zero debt and does nothing
    val r2 = Layout.snapshotMaintain(spark, root, policy,
      System.currentTimeMillis() + 10000)
    assert(r2.compactedVersion.isEmpty, "no-op rerun must not re-compact")
    assert(r2.deleteFilesBefore == 0)
    assert(r2.vacuum.droppedVersions.isEmpty && r2.vacuum.deletedFiles == 0)
    val after2 = Layout.readSnapshot(spark, root)
    assert(after2.exceptAll(expect).isEmpty && expect.exceptAll(after2).isEmpty)
  }

  test("small-file debt past threshold: bin-pack fires once; under-threshold head never re-triggers") {
    val root = freshRoot("maint-small")
    // 12 one-file appends = 12 tiny files at the head (enough that the
    // zero-shuffle bin-packer's bytes-per-core split sizing packs
    // multiple files per split even at local[4])
    val rows = ordersBase.limit(120).localCheckpoint()
    (0 until 12).foreach { i =>
      Layout.snapshotAppend(spark, root,
        rows.filter(col("key") % 12 === i).coalesce(1))
    }
    val preHead = Layout.snapshotVersions(spark, root).last
    assert(preHead == 12)
    val expect = Layout.readSnapshot(spark, root).localCheckpoint()

    // every file is "small" vs a 10 MB cutoff; threshold 8 < 12 → trigger.
    // retention huge → vacuum must NOT expire anything this cycle.
    val policy = MaintenancePolicy(maxDeleteFiles = 1000000,
      maxSmallFiles = 8, smallFileBytes = 10L << 20,
      retentionMillis = 365L * 24 * 3600 * 1000, minKeepVersions = 1)
    val r = Layout.snapshotMaintain(spark, root, policy)
    assert(r.smallFilesBefore == 12)
    assert(r.compactedVersion.contains(preHead + 1))
    assert(r.vacuum.droppedVersions.isEmpty, "inside retention: no expiry")
    val nAfter = Layout.readSnapshot(spark, root).inputFiles.length
    assert(nAfter < 12, s"bin-pack must reduce the file count (saw $nAfter)")
    val after = Layout.readSnapshot(spark, root)
    assert(after.exceptAll(expect).isEmpty && expect.exceptAll(after).isEmpty)

    // the packed head is below the COUNT threshold even though its files
    // are still under the size cutoff — no ping-pong
    val r2 = Layout.snapshotMaintain(spark, root, policy)
    assert(r2.compactedVersion.isEmpty,
      s"packed head (${r2.smallFilesBefore} small files) must not re-trigger")
  }

  test("OPTIMIZE ZORDER: after z-order compaction a filter on EITHER dimension prunes files through the manifest") {
    val root = freshRoot("maint-zorder")
    val base = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("key"), col("o_custkey").as("cust"),
        col("o_totalprice").cast("double").as("price"))
      // clustered by key ONLY: every file's cust range spans the space
      .repartitionByRange(8, col("key")).sortWithinPartitions(col("key"))
    Layout.snapshotAppend(spark, root, base, statsKey = Some("key,cust"))
    val (loK, hiK) = {
      val r = base.agg(min("key"), max("key")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (loC, hiC) = {
      val r = base.agg(min("cust"), max("cust")).head()
      (r.getLong(0), r.getLong(1))
    }
    // pre-compaction: a narrow cust slice prunes NOTHING (overlap everywhere)
    // (pruning happens at physical planning — measure via the index's
    // lastListedFiles after an action, not df.inputFiles which is unpruned)
    def filesFor(cond: org.apache.spark.sql.Column): (Int, Int) = {
      val (df, idx) = Layout.snapshotTableWithIndex(spark, root)
      df.filter(cond).count()
      (idx.lastListedFiles, idx.inputFiles.length)
    }
    val custSlice = col("cust").between(loC, loC + (hiC - loC) / 10)
    val keySlice = col("key").between(loK, loK + (hiK - loK) / 10)
    val (custBefore, totalBefore) = filesFor(custSlice)
    assert(custBefore == totalBefore,
      "key-clustered layout must NOT prune on cust (the motivating gap)")
    // z-order compact on (key, cust) into ~8 files
    val bytes = Layout.readSnapshot(spark, root).inputFiles
      .map(f => new java.io.File(f.stripPrefix("file:")).length).sum
    val v = Layout.snapshotCompact(spark, root, math.max(1L, bytes / 8),
      zOrderBy = Seq(col("key"), col("cust")))
    val after = Layout.readSnapshot(spark, root, v)
    assert(after.exceptAll(base).isEmpty && base.exceptAll(after).isEmpty,
      "compaction preserves content exactly")
    // BOTH dimensions now prune through Catalyst + manifest stats
    val (nCust, total) = filesFor(custSlice)
    assert(total >= 4, s"need a multi-file layout to show pruning (got $total)")
    val (nKey, _) = filesFor(keySlice)
    assert(nCust < total,
      s"z-order must make cust prune ($nCust of $total files)")
    assert(nKey < total,
      s"z-order must keep key pruning ($nKey of $total files)")
    // and the results stay exact
    val expCust = base.filter(custSlice)
    val gotCust = Layout.snapshotTable(spark, root).filter(custSlice)
    assert(gotCust.exceptAll(expCust).isEmpty && expCust.exceptAll(gotCust).isEmpty)
    // QUANTILE mode (the skew-safe binning): recompaction stays
    // content-exact and keeps pruning on both dimensions
    val bytes2 = Layout.readSnapshot(spark, root).inputFiles
      .map(f => new java.io.File(f.stripPrefix("file:")).length).sum
    val v2 = Layout.snapshotCompact(spark, root, math.max(1L, bytes2 / 8),
      zOrderBy = Seq(col("key"), col("cust")), zQuantile = true)
    val afterQ = Layout.readSnapshot(spark, root, v2)
    assert(afterQ.exceptAll(base).isEmpty && base.exceptAll(afterQ).isEmpty,
      "quantile z-order compaction preserves content exactly")
    val (nCustQ, totalQ) = filesFor(custSlice)
    val (nKeyQ, _) = filesFor(keySlice)
    assert(nCustQ < totalQ && nKeyQ < totalQ,
      s"quantile z-order must keep both dimensions pruning " +
        s"($nCustQ/$nKeyQ of $totalQ)")
  }

  test("OPTIMIZE WHERE: partition-scoped compaction repacks only the target partition's files; cold partitions carry untouched") {
    val root = freshRoot("maint-pscope")
    val base = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("key"),
        col("o_orderstatus").as("part"),
        col("o_totalprice").cast("double").as("price"))
    // per-partition appends, each splintered into several small files
    for (s <- Seq("O", "F", "P"))
      Layout.snapshotAppendPartitioned(spark, root,
        base.filter(col("part") === s).repartition(4),
        // keep the pre-splintered 4-file layout: the default partition
        // shuffle would fold each single-value batch into one file
        "part", statsKey = Some("key"), shuffleByPartition = false)
    val before = Layout.readSnapshot(spark, root)
    val beforeFiles = before.inputFiles.toSet
    def filesOf(p: String): Set[String] =
      Layout.readSnapshot(spark, root, -1, partitions = Seq(p))
        .inputFiles.toSet
    val fBefore = filesOf("F")
    val oBefore = filesOf("O")
    assert(fBefore.size >= 3, s"need small-file debt in F (${fBefore.size})")
    // compact ONLY partition F into ~1 target-sized file
    val bytes = beforeFiles.toSeq
      .map(f => new java.io.File(f.stripPrefix("file:")).length).sum
    val v = Layout.snapshotCompactPartitions(spark, root, bytes, Seq("F"))
    val after = Layout.readSnapshot(spark, root, v)
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
      "scoped compaction preserves content exactly")
    val fAfter = filesOf("F")
    assert(fAfter.size < fBefore.size,
      s"F must repack (${fBefore.size} -> ${fAfter.size})")
    assert(fAfter.intersect(fBefore).isEmpty, "F's files are new files")
    assert(filesOf("O") == oBefore && filesOf("P").subsetOf(beforeFiles),
      "cold partitions' files must carry byte-identical (same paths)")
    // partition pruning still serves from the new manifest
    val gotF = Layout.readSnapshot(spark, root, v, partitions = Seq("F"))
    val expF = base.filter(col("part") === "F")
    assert(gotF.exceptAll(expF).isEmpty && expF.exceptAll(gotF).isEmpty)
    // no-op scope: unknown partition value commits NOTHING
    assert(Layout.snapshotCompactPartitions(spark, root, bytes,
      Seq("ZZ")) == v, "out-of-scope OPTIMIZE must not commit")
    assert(Layout.snapshotVersions(spark, root).last == v)
    // sidecar debt refuses the scoped form
    val k = after.select("key").head().getLong(0)
    Layout.snapshotDeleteMOR(spark, root, "key", Array(k))
    intercept[IllegalArgumentException] {
      Layout.snapshotCompactPartitions(spark, root, bytes, Seq("F"))
    }
  }

  test("orphan sweep honors the grace clock: aged strays go, fresh attempt files survive") {
    val root = freshRoot("maint-orphan")
    Layout.snapshotAppend(spark, root, ordersBase.limit(20).coalesce(1))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dataDir = new org.apache.hadoop.fs.Path(s"$root/data")
    val aged = new org.apache.hadoop.fs.Path(dataDir, "crashed-attempt.parquet")
    val fresh = new org.apache.hadoop.fs.Path(dataDir, "inflight-attempt.parquet")
    for (p <- Seq(aged, fresh)) { val o = fs.create(p); o.write(1); o.close() }
    fs.setTimes(aged, 1000L, -1) // crashed long ago

    val r = Layout.snapshotMaintain(spark, root,
      MaintenancePolicy(maxDeleteFiles = 1000000, maxSmallFiles = 1000000,
        retentionMillis = 365L * 24 * 3600 * 1000))
    assert(r.compactedVersion.isEmpty)
    assert(!fs.exists(aged), "aged orphan must be swept")
    assert(fs.exists(fresh), "an in-grace attempt file must survive")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      Layout.readSnapshot(spark, root).inputFiles.head
        .stripPrefix("file:"))), "referenced data is never an orphan")
  }
}
