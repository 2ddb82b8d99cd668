package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** `format("graft")` — the path-based batch surface
  * ([[graft.sources.GraftRelationProvider]]): reads (head, version
  * pins, timestamp as-of, op-typed changes) and writes (append /
  * overwrite as manifest commits) without a catalog registration.
  */
class GraftFormatSpec extends GraftSuite {

  test("write modes commit manifests; reads serve head, pins, as-of, and the change feed") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-fmt").toString + "/t"
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val d2 = Seq((3L, "c")).toDF("k", "v")
    d1.write.format("graft").option("statsKey", "k").save(root)   // v1
    d2.write.format("graft").mode("append").save(root)            // v2
    assert(Layout.snapshotVersions(spark, root) == Seq(1, 2))
    assert(Layout.snapshotMeta(spark, root).header.get("statsKey")
      .contains("k"), "first write declares the stats column")

    val head = spark.read.format("graft").load(root)
    val direct = Layout.readSnapshot(spark, root)
    assert(head.exceptAll(direct).isEmpty && direct.exceptAll(head).isEmpty)

    val v1 = spark.read.format("graft")
      .option("versionAsOf", "1").load(root)
    assert(v1.count() == 2 &&
      v1.select("k").collect().map(_.getLong(0)).sorted.sameElements(Array(1L, 2L)))

    val ts1 = Layout.snapshotTimestamps(spark, root).find(_._1 == 1).get._2
    val asOf = spark.read.format("graft")
      .option("timestampAsOf", ts1.toString).load(root)
    assert(asOf.count() == 2)

    // MOR delete, then the op-typed batch change feed
    Layout.snapshotDeleteMOR(spark, root, "k", Array(2L))         // v3
    val ch = spark.read.format("graft")
      .option("changesFrom", "2").load(root)
    assert(ch.filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).sameElements(Array(2L)),
      "changesFrom must surface the retraction")
    val chPinned = spark.read.format("graft")
      .option("changesFrom", "1").option("changesTo", "2").load(root)
    assert(chPinned.filter(col("_change_type") =!= "insert").count() == 0 &&
      chPinned.count() == 1, "pinned interval carries exactly v2's insert")

    // errorifexists refuses a live table; ignore no-ops
    intercept[Exception] {
      d1.write.format("graft").mode("errorifexists").save(root)
    }
    val vs = Layout.snapshotVersions(spark, root)
    d1.write.format("graft").mode("ignore").save(root)
    assert(Layout.snapshotVersions(spark, root) == vs,
      "ignore mode must not commit to an existing table")

    // overwrite is one atomic replacement commit, history preserved
    d2.write.format("graft").mode("overwrite").save(root)
    assert(Layout.readSnapshot(spark, root).count() == 1)
    assert(spark.read.format("graft").option("versionAsOf", "2")
      .load(root).count() == 3, "pre-overwrite versions still travel")

    // exclusive options refuse
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "1")
        .option("changesFrom", "1").load(root).count()
    }
  }

  test("format(\"graft\") reads prune columns and push filters into the relation") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-fmt-prune").toString + "/t"
    Seq.tabulate(50)(i => (i.toLong, i * 2.0, s"s$i", s"t$i"))
      .toDF("k", "v", "s", "t")
      .write.format("graft").option("statsKey", "k").save(root)
    val q = spark.read.format("graft").load(root)
      .filter(col("k") < 10).select("k", "v")
    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(got.sameElements((0 until 10).map(i => (i.toLong, i * 2.0))))
    // the physical scan carries only the pruned projection
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("Scan"))
    assert(scans.nonEmpty && scans.forall(s => !s.contains("t#")),
      s"scan must not carry unprojected columns:\n${scans.mkString("\n")}")
    // count(*) survives the zero-column projection path
    assert(spark.read.format("graft").load(root).count() == 50)
    // a NOT over a conjunction stays exact (polarity rule: translated
    // only when complete; either way Spark re-evaluates)
    val notQ = spark.read.format("graft").load(root)
      .filter(!(col("k") < 40 && col("s").startsWith("s1"))).select("k")
    assert(notQ.count() == 50 - (0 until 40).count(i => s"s$i".startsWith("s1")))
  }
}
