package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.ops.Layout
import graft.sources.GraftScan

/** The manifest-planned DSv2 scan ([[graft.sources.GraftScan]]) behind
  * `SELECT … FROM graft.t`: static file pruning from manifest stats,
  * optimizer statistics from pruned real bytes, and runtime (DPP)
  * re-pruning — each proven by observed file counts, not plan strings.
  */
class SqlScanPruningSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlprune").toString
    spark.conf.set("spark.sql.catalog.gprune",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gprune.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  /** Every [[GraftScan]] in the (AQE-final) executed plan. */
  private def graftScans(df: DataFrame): Seq[GraftScan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // AQE stages wrap their subtree as leaves — unwrap explicitly
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        s +: walk(s.plan)
      case other => other +: (other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk))
    }
    walk(df.queryExecution.executedPlan)
      .collect { case b: BatchScanExec => b.scan }
      .collect { case g: GraftScan => g }
  }

  /** Three disjoint-range commits into `gprune.<name>` -> three file
    * groups with tight k stats. Idempotent per suite run.
    */
  private def mkRangedTable(name: String): Unit = {
    import spark.implicits._
    if (Layout.snapshotVersions(spark, s"$wh/$name").nonEmpty) return
    sql(s"CREATE TABLE gprune.$name (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsKey'='k')")
    for (b <- 0 until 3) {
      (b * 1000 until b * 1000 + 100).map(i => (i.toLong, s"v$i"))
        .toDF("k", "v").orderBy("k").coalesce(1)
        .createOrReplaceTempView("tsrc")
      sql(s"INSERT INTO gprune.$name SELECT * FROM tsrc")
    }
  }

  test("static manifest pruning: a range predicate plans only the overlapping files") {
    wh
    mkRangedTable("t")
    val total = Layout.snapshotMeta(spark, s"$wh/t").paths.size
    assert(total >= 3, s"expected >=3 files, got $total")

    val q = sql("SELECT k, v FROM gprune.t WHERE k BETWEEN 1000 AND 1099")
    val rows = q.collect()
    assert(rows.length == 100)
    val scans = graftScans(q)
    assert(scans.nonEmpty, "expected a GraftScan in the plan")
    assert(scans.forall(_.lastPlannedFiles < total),
      s"range scan must prune: planned ${scans.map(_.lastPlannedFiles)} of $total")
    // correctness against the engine read
    val direct = Layout.readSnapshot(spark, s"$wh/t")
      .filter(col("k").between(1000, 1099))
    assert(q.exceptAll(direct).isEmpty && direct.exceptAll(q).isEmpty)
  }

  test("manifest statistics: the optimizer sees pruned bytes and exact unfiltered rows") {
    wh
    mkRangedTable("t")
    val full = sql("SELECT k, v FROM gprune.t")
    val slice = sql("SELECT k, v FROM gprune.t WHERE k BETWEEN 1000 AND 1099")
    val fullBytes = full.queryExecution.optimizedPlan.stats.sizeInBytes
    val sliceBytes = slice.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(sliceBytes < fullBytes,
      s"pruned scan must report fewer bytes: $sliceBytes vs $fullBytes")
    // unfiltered scan: exact manifest row count
    assert(full.queryExecution.optimizedPlan.stats.rowCount.contains(BigInt(300)),
      s"expected exact rowCount 300, got ${full.queryExecution.optimizedPlan.stats.rowCount}")
  }

  test("runtime filtering (DPP): a selective dim predicate re-prunes the fact file list at execution") {
    wh
    import spark.implicits._
    // partitioned fact: 8 tag values localized into files by the
    // partition shuffle; manifest records each file's tag set
    val fact = (0 until 800).map(i => (i.toLong, s"tag${i % 8}"))
      .toDF("k", "tag")
    // pin the partition-shuffle fanout (AQE would coalesce this tiny
    // batch into one file, leaving nothing to prune)
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Layout.snapshotAppendPartitioned(spark, s"$wh/fact", fact, "tag")
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", saved)
    val factFiles = Layout.snapshotMeta(spark, s"$wh/fact").paths.size
    assert(factFiles >= 2, s"need multiple fact files, got $factFiles")
    // the dim must be FILE-backed: a local relation's filter constant-
    // folds away at optimization, leaving no selective predicate for
    // the DPP rule to plant
    val dimDir = java.nio.file.Files.createTempDirectory("gprune-dim").toString
    Seq(("tag0", "keep"), ("tag1", "drop"), ("tag2", "drop"),
        ("tag3", "drop"), ("tag4", "drop"), ("tag5", "drop"),
        ("tag6", "drop"), ("tag7", "drop"))
      .toDF("tag", "attr").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("dim")

    val q = sql("SELECT f.k, f.tag FROM gprune.fact f " +
      "JOIN dim d ON f.tag = d.tag WHERE d.attr = 'keep'")
    val rows = q.collect()
    assert(rows.length == 100 && rows.forall(_.getString(1) == "tag0"))
    val scans = graftScans(q)
    assert(scans.nonEmpty, "expected a GraftScan under the join")
    // the runtime IN('tag0') filter must have re-pruned the file list
    assert(scans.exists(s => s.lastPlannedFiles < factFiles),
      s"DPP must prune fact files: planned ${scans.map(_.lastPlannedFiles)} " +
        s"of $factFiles\n${q.queryExecution.executedPlan}")
  }

  test("runtime filtering composes with static pruning and stays exact") {
    wh
    import spark.implicits._
    // static k-range AND runtime tag filter together
    sql("CREATE TABLE gprune.fact2 (k BIGINT, tag STRING) " +
      "TBLPROPERTIES ('partCol'='tag')")
    (0 until 400).map(i => (i.toLong, s"t${i % 4}")).toDF("k", "tag")
      .createOrReplaceTempView("f2src")
    sql("INSERT INTO gprune.fact2 SELECT * FROM f2src")
    Seq(("t1", 1), ("t2", 2)).toDF("tag", "n")
      .createOrReplaceTempView("dim2")
    val q = sql("SELECT f.k, f.tag, d.n FROM gprune.fact2 f " +
      "JOIN dim2 d ON f.tag = d.tag WHERE d.n = 1 AND f.k < 100")
    val got = q.collect()
    val want = (0 until 100).filter(i => i % 4 == 1).map(_.toLong).toSet
    assert(got.map(_.getLong(0)).toSet == want &&
      got.forall(r => r.getString(1) == "t1" && r.getInt(2) == 1))
  }

  test("INSERT INTO a declared-partCol table value-localizes its files") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gprune.ploc (k BIGINT, tag STRING) " +
      "TBLPROPERTIES ('partCol'='tag')")
    (0 until 200).map(i => (i.toLong, s"p${i % 3}")).toDF("k", "tag")
      .createOrReplaceTempView("ploc_src")
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try sql("INSERT INTO gprune.ploc SELECT * FROM ploc_src")
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", saved)
    // the declared partition column LOCALIZES the INSERT's shuffle: each
    // file holds the value(s) hashed to its shuffle partition — never the
    // whole value space an unshuffled write would smear across every file
    val (_, entries, _) = Layout.snapshotEntriesFor(spark, s"$wh/ploc")
    val dataEntries = entries.filter(_.parts.isDefined)
    assert(dataEntries.nonEmpty &&
      dataEntries.forall(_.parts.exists(_.size < 3)),
      s"INSERT must write value-localized files: " +
        s"${dataEntries.map(_.parts)}")
    assert(dataEntries.flatMap(_.parts.get).toSet == Set("p0", "p1", "p2"))
    // and partition pruning pays off: a one-value read opens a subset
    val hit = dataEntries.count(_.parts.get.contains("p2"))
    assert(hit < dataEntries.size,
      s"a p2-only read must prune ($hit of ${dataEntries.size})")
    assert(sql("SELECT count(*) FROM gprune.ploc").head().getLong(0) == 200L)
  }

  test("SQL reads over an evolved schema and empty prune results stay correct") {
    wh
    mkRangedTable("t")
    // header-only column added after data: reads as null through the scan
    sql("ALTER TABLE gprune.t ADD COLUMN extra DOUBLE")
    val q = sql("SELECT k, extra FROM gprune.t WHERE k = 5")
    val r = q.collect()
    assert(r.length == 1 && r.head.getLong(0) == 5L && r.head.isNullAt(1))
    // a predicate outside every file's range: zero files planned, zero rows
    val none = sql("SELECT k FROM gprune.t WHERE k = 999999")
    assert(none.collect().isEmpty)
    val scans = graftScans(none)
    assert(scans.forall(_.lastPlannedFiles == 0),
      s"out-of-range predicate must prune everything: " +
        s"${scans.map(_.lastPlannedFiles)}")
  }
}
