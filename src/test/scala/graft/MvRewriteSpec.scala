package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Layout
import graft.plans.MvRewriteRule

/** MATERIALIZED-VIEW QUERY REWRITE: registered sum-view rollups answer
  * matching aggregates over the base table — SUM/COUNT/AVG, grouped or
  * global, optionally filtered on the group key — reading O(groups)
  * view rows instead of scanning the base; staleness or any
  * untranslatable shape refuses and the original plan runs.
  */
class MvRewriteSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-mv").toString
    spark.conf.set("spark.sql.catalog.gmv",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmv.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  private def usesView(df: DataFrame): Boolean = {
    val s = df.queryExecution.optimizedPlan.toString
    !s.contains("RelationV2") && !s.contains("GraftScan")
  }

  private lazy val base: Unit = {
    wh
    import spark.implicits._
    (0 until 600).map(i => (i.toLong, s"c${i % 5}", (i % 100) / 2.0))
      .toDF("k", "cat", "price").createOrReplaceTempView("mv_src")
    sql("CREATE TABLE gmv.base (k BIGINT, cat STRING, price DOUBLE)")
    sql("INSERT INTO gmv.base SELECT * FROM mv_src")
    Layout.maintainSumView(spark, s"$wh/base", s"$wh/base_by_cat",
      "cat", "price")
  }

  private val groupedSql =
    "SELECT cat, sum(price) AS s, count(*) AS n, avg(price) AS a " +
      "FROM gmv.base GROUP BY cat"

  test("grouped SUM/COUNT/AVG answer from the registered rollup; answers match the base scan") {
    base
    val control = sql(groupedSql).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    MvRewriteRule.register(s"$wh/base", s"$wh/base_by_cat", "cat", "price")
    try {
      val q = sql(groupedSql)
      assert(usesView(q), s"must rewrite onto the view:\n" +
        q.queryExecution.optimizedPlan)
      val got = q.collect().map(r => (r.getString(0), r.getDouble(1),
        r.getLong(2), r.getDouble(3))).sortBy(_._1).toSeq
      assert(got == control)
    } finally MvRewriteRule.clear()
  }

  test("global aggregates and group-key filters rewrite; other filters refuse") {
    base
    MvRewriteRule.register(s"$wh/base", s"$wh/base_by_cat", "cat", "price")
    try {
      val g = sql("SELECT sum(price) AS s, count(*) AS n FROM gmv.base")
      assert(usesView(g))
      val r = g.head()
      assert(r.getDouble(0) == (0 until 600).map(i => (i % 100) / 2.0).sum &&
        r.getLong(1) == 600L)
      val f = sql("SELECT cat, count(*) AS n FROM gmv.base " +
        "WHERE cat IN ('c1','c3') GROUP BY cat")
      assert(usesView(f), s"group-key filter must push onto the view:\n" +
        f.queryExecution.optimizedPlan)
      assert(f.collect().map(x => (x.getString(0), x.getLong(1))).sorted
        .toSeq == Seq(("c1", 120L), ("c3", 120L)))
      // a predicate on a NON-key column cannot answer from the rollup
      val nf = sql("SELECT cat, count(*) FROM gmv.base WHERE k < 100 " +
        "GROUP BY cat")
      assert(!usesView(nf))
      assert(nf.collect().map(_.getLong(1)).sum == 100L)
      // MIN is not a maintained partial: whole query refuses
      val m = sql("SELECT cat, min(price) FROM gmv.base GROUP BY cat")
      assert(!usesView(m))
    } finally MvRewriteRule.clear()
  }

  test("a stale view refuses the rewrite; re-maintenance restores it") {
    base
    import spark.implicits._
    MvRewriteRule.register(s"$wh/base", s"$wh/base_by_cat", "cat", "price")
    try {
      Seq((9000L, "c1", 10.0)).toDF("k", "cat", "price")
        .createOrReplaceTempView("mv_add")
      sql("INSERT INTO gmv.base SELECT * FROM mv_add")
      val q = sql(groupedSql)
      assert(!usesView(q), "stale view must never answer")
      val c1 = q.collect().find(_.getString(0) == "c1").get
      assert(c1.getLong(2) == 121L, "the fresh base row must be counted")
      Layout.maintainSumView(spark, s"$wh/base", s"$wh/base_by_cat",
        "cat", "price")
      val q2 = sql(groupedSql)
      assert(usesView(q2), "maintained view must answer again")
      assert(q2.collect().find(_.getString(0) == "c1").get.getLong(2) == 121L)
    } finally MvRewriteRule.clear()
  }

  test("an unregistered base is untouched") {
    base
    val q = sql(groupedSql)
    assert(!usesView(q))
  }

  test("a LEGACY view (no nn column) migrates via full recompute instead of crashing the maintainer") {
    wh
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-mv-legacy").toString
    Layout.snapshotAppend(spark, s"$root/base",
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
        .toDF("k", "cat", "price"))
    // hand-write the PRE-nn view layout a previous release committed
    Layout.snapshotOverwrite(spark, s"$root/view",
      Seq(("a", 30.0, 2L), ("b", 5.0, 1L))
        .toDF("cat", "sum_v", "n")
        .withColumn("base_version", lit(1)))
    // base advances with a pure append — the OLD code's incremental
    // merge would select the missing nn column and crash
    Layout.snapshotAppend(spark, s"$root/base",
      Seq((4L, "b", 7.0)).toDF("k", "cat", "price"))
    val v = Layout.maintainSumView(spark, s"$root/base", s"$root/view",
      "cat", "price")
    assert(v == 2)
    val got = Layout.readSnapshot(spark, s"$root/view")
      .select("cat", "sum_v", "n", "nn").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq(("a", 30.0, 2L, 2L), ("b", 12.0, 2L, 2L)),
      s"full recompute migrates the layout: $got")
    // the CDC maintainer migrates the same way
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-mv-legacy2").toString
    Layout.snapshotAppend(spark, s"$root2/base",
      Seq((1L, "x", 1.0)).toDF("k", "cat", "price"))
    Layout.snapshotOverwrite(spark, s"$root2/view",
      Seq(("x", 1.0, 1L)).toDF("cat", "sum_v", "n")
        .withColumn("base_version", lit(1)))
    Layout.snapshotAppend(spark, s"$root2/base",
      Seq((2L, "x", 2.0)).toDF("k", "cat", "price"))
    Layout.maintainSumViewCdc(spark, s"$root2/base", s"$root2/view",
      "cat", "price")
    assert(Layout.readSnapshot(spark, s"$root2/view")
      .select("sum_v", "nn").head() ==
      org.apache.spark.sql.Row(3.0, 2L))
  }

  test("a nondeterministic filter refuses the rewrite") {
    base
    MvRewriteRule.register(s"$wh/base", s"$wh/base_by_cat", "cat", "price")
    try {
      val q = sql("SELECT cat, count(*) FROM gmv.base " +
        "WHERE cat > string(rand()) GROUP BY cat")
      assert(!usesView(q),
        "rand() evaluates per-row on the base but per-group on the view " +
          "— the rewrite must refuse")
    } finally MvRewriteRule.clear()
  }

  /** NULL semantics through the rollup: AVG divides by the NON-NULL
    * count, SUM over an all-NULL group is NULL (not 0.0), COUNT(v)
    * counts non-nulls — on both the full-recompute and the incremental
    * append-merge maintainer paths.
    */
  test("NULLs in the value column: SUM/AVG/COUNT(v) match the base scan, incremental merges included") {
    wh
    import spark.implicits._
    // c0: mixed nulls; c1: ALL null; c2: no nulls
    val rows = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "c0", 10.0), (2L, "c0", null), (3L, "c0", 20.0),
      (4L, "c1", null), (5L, "c1", null),
      (6L, "c2", 7.0), (7L, "c2", 9.0))
    rows.toDF("k", "cat", "price").createOrReplaceTempView("mvn_src")
    sql("CREATE TABLE gmv.nbase (k BIGINT, cat STRING, price DOUBLE)")
    sql("INSERT INTO gmv.nbase SELECT * FROM mvn_src")
    Layout.maintainSumView(spark, s"$wh/nbase", s"$wh/nbase_by_cat",
      "cat", "price")
    val q = "SELECT cat, sum(price) AS s, count(*) AS n, " +
      "count(price) AS nn, avg(price) AS a FROM gmv.nbase GROUP BY cat"
    def snap(df: DataFrame) = df.collect().map(r => (r.getString(0),
      Option(r.get(1)), r.getLong(2), r.getLong(3), Option(r.get(4))))
      .sortBy(_._1).toSeq
    val control = snap(sql(q))
    assert(control.find(_._1 == "c1").get._2.isEmpty,
      "sanity: base SUM over the all-NULL group is NULL")
    assert(control.find(_._1 == "c0").get._5.contains(15.0),
      "sanity: base AVG divides by the non-null count (30/2, not 30/3)")
    MvRewriteRule.register(s"$wh/nbase", s"$wh/nbase_by_cat",
      "cat", "price")
    try {
      val v = sql(q)
      assert(usesView(v), s"must rewrite:\n${v.queryExecution.optimizedPlan}")
      assert(snap(v) == control)
      // incremental path: append more rows (one null into the all-null
      // group, keeping it all-null; one value into c0) and re-maintain —
      // the APPEND-lineage merge must keep c1's sum NULL
      Seq[(java.lang.Long, String, java.lang.Double)](
        (8L, "c1", null), (9L, "c0", 40.0))
        .toDF("k", "cat", "price").createOrReplaceTempView("mvn_add")
      sql("INSERT INTO gmv.nbase SELECT * FROM mvn_add")
      Layout.maintainSumView(spark, s"$wh/nbase", s"$wh/nbase_by_cat",
        "cat", "price")
      val control2 = {
        MvRewriteRule.clear()
        val c = snap(sql(q))
        MvRewriteRule.register(s"$wh/nbase", s"$wh/nbase_by_cat",
          "cat", "price")
        c
      }
      assert(control2.find(_._1 == "c1").get._2.isEmpty,
        "sanity: still all-NULL after the append")
      val v2 = sql(q)
      assert(usesView(v2))
      assert(snap(v2) == control2)
      // global AVG over ONLY the all-null group: view answers NULL
      val g = sql("SELECT avg(price) AS a, sum(price) AS s " +
        "FROM gmv.nbase WHERE cat = 'c1'")
      assert(usesView(g))
      val gr = g.head()
      assert(gr.isNullAt(0) && gr.isNullAt(1))
    } finally MvRewriteRule.clear()
  }
}
