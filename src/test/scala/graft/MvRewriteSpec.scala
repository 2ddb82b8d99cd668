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
}
