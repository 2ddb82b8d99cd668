package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** PARTITION-SCOPED OVERWRITE (Delta's replaceWhere / classic
  * `INSERT OVERWRITE … PARTITION`): atomically replace one partition's
  * rows, carrying every other partition's files untouched; mixed files
  * rewrite keeping their out-of-scope rows; the replacement must lie
  * inside the replaced scope; dynamic mode replaces exactly the
  * partitions present in the frame.
  */
class PartitionOverwriteSpec extends GraftSuite {

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def noCoalesce[T](body: => T): T = {
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try body
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", saved)
  }

  test("replacing one partition leaves every other partition's files byte-untouched") {
    import spark.implicits._
    val root = freshRoot("powr")
    val base = (0 until 300).map(i => (i.toLong, s"p${i % 3}"))
      .toDF("k", "part")
    noCoalesce {
      for (v <- 0 until 3)
        Layout.snapshotAppendPartitioned(spark, root,
          base.filter(col("part") === s"p$v").coalesce(1), "part",
          shuffleByPartition = false)
    }
    val before = Layout.snapshotMeta(spark, root)
    val p0Files = Layout.snapshotEntriesFor(spark, root)._2
      .filter(_.parts.exists(_ == Seq("p0"))).map(_.path).toSet
    val repl = Seq((9001L, "p1"), (9002L, "p1")).toDF("k", "part")
    val v = Layout.snapshotOverwritePartitions(spark, root, repl, Seq("p1"))
    val after = Layout.snapshotMeta(spark, root, v)
    // p0/p2 files carried VERBATIM (no rewrite, no copy)
    assert(p0Files.subsetOf(after.paths.toSet),
      "untouched partitions must carry by reference")
    val got = Layout.readSnapshot(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = ((0 until 300).filter(i => i % 3 != 1)
      .map(i => (i.toLong, s"p${i % 3}")) ++
      Seq((9001L, "p1"), (9002L, "p1"))).sortBy(_._1)
    assert(got.toSeq == want)
    // time travel below the overwrite sees the old content
    assert(Layout.readSnapshot(spark, root, before.version)
      .filter(col("part") === "p1").count() == 100)
  }

  test("mixed files rewrite keeping out-of-scope rows; null partitions survive") {
    import spark.implicits._
    val root = freshRoot("pomix")
    // ONE file spanning p0+p1+null — the layout partition overwrite must
    // handle without losing the out-of-scope rows
    val messy = Seq((1L, "p0"), (2L, "p1"), (3L, null.asInstanceOf[String]))
      .toDF("k", "part").coalesce(1)
    Layout.snapshotAppendPartitioned(spark, root, messy, "part",
      shuffleByPartition = false)
    val repl = Seq((20L, "p1")).toDF("k", "part")
    Layout.snapshotOverwritePartitions(spark, root, repl, Seq("p1"))
    val got = Layout.readSnapshot(spark, root).orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((1L, Some("p0")), (3L, None), (20L, Some("p1"))))
  }

  test("a replacement outside the scope refuses; dynamic mode replaces exactly what arrived") {
    import spark.implicits._
    val root = freshRoot("podyn")
    val base = (0 until 90).map(i => (i.toLong, s"p${i % 3}")).toDF("k", "part")
    noCoalesce {
      Layout.snapshotAppendPartitioned(spark, root, base, "part")
    }
    val stray = Seq((1L, "p0"), (2L, "p2")).toDF("k", "part")
    val ex = intercept[IllegalArgumentException] {
      Layout.snapshotOverwritePartitions(spark, root, stray, Seq("p0"))
    }
    assert(ex.getMessage.contains("outside the overwrite scope"))
    // dynamic: the frame names p0+p2; p1 is untouched
    val v = Layout.snapshotOverwritePartitionsDynamic(spark, root, stray)
    val got = Layout.readSnapshot(spark, root, v)
      .groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("p0" -> 1L, "p1" -> 30L, "p2" -> 1L))
  }

  test("SQL: CREATE PARTITIONED BY + INSERT OVERWRITE PARTITION replaces exactly one partition") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-posql").toString
    spark.conf.set("spark.sql.catalog.gpo",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpo.root", wh)
    spark.sql("CREATE TABLE gpo.t (k BIGINT, flag STRING) " +
      "PARTITIONED BY (flag)")
    assert(Layout.snapshotMeta(spark, s"$wh/t").header.get("partCol")
      .contains("flag"), "PARTITIONED BY must declare the partCol property")
    (0 until 200).map(i => (i.toLong, s"f${i % 2}")).toDF("k", "flag")
      .createOrReplaceTempView("po_src")
    noCoalesce { spark.sql("INSERT INTO gpo.t SELECT * FROM po_src") }
    Seq(777L).toDF("k").createOrReplaceTempView("po_repl")
    spark.sql("INSERT OVERWRITE gpo.t PARTITION (flag = 'f1') " +
      "SELECT k FROM po_repl")
    val got = spark.sql("SELECT flag, count(*) AS n FROM gpo.t GROUP BY flag")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("f0" -> 100L, "f1" -> 1L), s"got $got")
    assert(spark.sql("SELECT k FROM gpo.t WHERE flag = 'f1'")
      .head().getLong(0) == 777L)
    // unqualified INSERT OVERWRITE still truncates-and-replaces
    spark.sql("INSERT OVERWRITE gpo.t SELECT * FROM po_src")
    assert(spark.sql("SELECT count(*) FROM gpo.t").head().getLong(0) == 200L)
  }

  test("LOGICAL RESOLUTION: a partition reload racing an OUT-OF-SCOPE append — both land; an in-scope append refuses") {
    import spark.implicits._
    import graft.ops.Layout
    spark.conf.set("spark.sql.catalog.gpo_occ",
      classOf[graft.sources.GraftCatalog].getName)
    val wh = java.nio.file.Files
      .createTempDirectory("graft-po-occ").toString
    spark.conf.set("spark.sql.catalog.gpo_occ.root", wh)
    val root = s"$wh/t"
    spark.conf.set("spark.graft.commit.arbiter",
      classOf[RacingArbiter].getName)
    try {
      Layout.snapshotAppendPartitioned(spark, root,
        (0 until 200).map(i => (i.toLong, s"p${i % 4}")).toDF("k", "p"), "p")
      // writer B appends rows in p3 — OUTSIDE the reloaded p0 — inside
      // the reload's claim window
      RacingArbiter.racer = () => Layout.snapshotAppendPartitioned(
        spark, root, Seq((900L, "p3")).toDF("k", "p"), "p")
      RacingArbiter.armed = true
      val v = Layout.snapshotOverwritePartitions(spark, root,
        Seq((1000L, "p0"), (1001L, "p0")).toDF("k", "p"), Seq("p0"))
      assert(v == 3, s"reload must rebase past the append (got v$v)")
      val head = Layout.readSnapshot(spark, root)
      assert(head.filter(col("p") === "p0").count() == 2,
        "p0 fully replaced")
      assert(head.filter(col("k") === 900L).count() == 1,
        "the interleaved out-of-scope append survives")
      assert(head.count() == 150 + 2 + 1)
      // an IN-SCOPE append refuses deterministically: the reload was
      // computed without those rows
      RacingArbiter.racer = () => Layout.snapshotAppendPartitioned(
        spark, root, Seq((901L, "p0")).toDF("k", "p"), "p")
      RacingArbiter.armed = true
      val ex = intercept[graft.ops.ConcurrentWriteConflictException] {
        Layout.snapshotOverwritePartitions(spark, root,
          Seq((2000L, "p0")).toDF("k", "p"), Seq("p0"))
      }
      assert(ex.getMessage.contains("inside"), ex.getMessage)
      // the winner's append is intact; re-running the reload replaces
      // BOTH the old p0 rows and the interleaved one
      assert(Layout.readSnapshot(spark, root)
        .filter(col("k") === 901L).count() == 1)
      Layout.snapshotOverwritePartitions(spark, root,
        Seq((2000L, "p0")).toDF("k", "p"), Seq("p0"))
      val p0 = Layout.readSnapshot(spark, root).filter(col("p") === "p0")
        .collect().map(_.getLong(0)).toSeq
      assert(p0 == Seq(2000L), s"re-run reload owns the scope: $p0")
    } finally {
      spark.conf.unset("spark.graft.commit.arbiter")
      RacingArbiter.reset()
    }
  }
}
