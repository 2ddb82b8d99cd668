package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** CHECK CONSTRAINTS + table properties: `check.*` properties (declared
  * at CREATE or via SET TBLPROPERTIES) gate every write path — append,
  * overwrite, streaming epoch, merge/UPDATE — with SQL-standard
  * semantics (only FALSE violates; nulls pass); adding a constraint
  * validates the existing rows first; user properties carry across
  * commits and survive compaction.
  */
class ConstraintsSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-chk").toString
    spark.conf.set("spark.sql.catalog.gchk",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gchk.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  test("a constraint declared at CREATE refuses violating INSERTs and UPDATEs; nulls pass") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gchk.t (k BIGINT, price DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k', 'check.positive' = 'price > 0')")
    Seq[(Long, java.lang.Double)]((1L, 10.0), (2L, null))
      .toDF("k", "price").createOrReplaceTempView("chk_ok")
    sql("INSERT INTO gchk.t SELECT * FROM chk_ok") // null passes (SQL rule)
    assert(sql("SELECT count(*) FROM gchk.t").head().getLong(0) == 2L)
    Seq((3L, -5.0)).toDF("k", "price").createOrReplaceTempView("chk_bad")
    val ex = intercept[Exception] {
      sql("INSERT INTO gchk.t SELECT * FROM chk_bad")
    }
    assert(ex.getMessage.contains("check.positive"), ex.getMessage)
    assert(sql("SELECT count(*) FROM gchk.t").head().getLong(0) == 2L,
      "the refused batch must not land")
    // an UPDATE that would break the constraint refuses too
    val ex2 = intercept[Exception] {
      sql("UPDATE gchk.t SET price = -1.0 WHERE k = 1")
    }
    assert(ex2.getMessage.contains("check.positive"), ex2.getMessage)
    assert(sql("SELECT price FROM gchk.t WHERE k = 1").head().getDouble(0)
      == 10.0)
  }

  test("ALTER TABLE SET TBLPROPERTIES adds a constraint only if existing rows satisfy it; UNSET lifts it") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gchk.t2 (k BIGINT, v STRING)")
    Seq((1L, "a"), (200L, "b")).toDF("k", "v")
      .createOrReplaceTempView("chk2_src")
    sql("INSERT INTO gchk.t2 SELECT * FROM chk2_src")
    // violated by k=200: must refuse to appear to hold
    val ex = intercept[Exception] {
      sql("ALTER TABLE gchk.t2 SET TBLPROPERTIES " +
        "('check.small' = 'k < 100')")
    }
    assert(ex.getMessage.contains("existing rows violate"), ex.getMessage)
    // a satisfiable one lands as a metadata-only commit and enforces
    sql("ALTER TABLE gchk.t2 SET TBLPROPERTIES ('check.bounded' = 'k < 1000')")
    Seq((5000L, "z")).toDF("k", "v").createOrReplaceTempView("chk2_bad")
    intercept[Exception] {
      sql("INSERT INTO gchk.t2 SELECT * FROM chk2_bad")
    }
    sql("ALTER TABLE gchk.t2 UNSET TBLPROPERTIES ('check.bounded')")
    sql("INSERT INTO gchk.t2 SELECT * FROM chk2_bad") // lifted
    assert(sql("SELECT count(*) FROM gchk.t2").head().getLong(0) == 3L)
    // engine-owned properties refuse the generic path
    val ex3 = intercept[Exception] {
      sql("ALTER TABLE gchk.t2 SET TBLPROPERTIES ('statsKey' = 'k')")
    }
    assert(ex3.getMessage.contains("engine-owned"), ex3.getMessage)
  }

  test("user properties carry across commits and survive compaction; constraints gate the streaming epoch path") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-chk3").toString + "/t"
    Layout.snapshotAppend(spark, root, Seq((1L, 5.0)).toDF("k", "price"),
      extraProps = Map("owner.team" -> "data-eng",
        "check.positive" -> "price > 0"))
    Layout.snapshotAppend(spark, root, Seq((2L, 6.0)).toDF("k", "price"))
    Layout.snapshotCompact(spark, root, targetBytes = 128L * 1024 * 1024)
    val hdr = Layout.snapshotMeta(spark, root).header
    assert(hdr.get("owner.team").contains("data-eng") &&
      hdr.get("check.positive").contains("price > 0"),
      s"properties must survive append + compaction: $hdr")
    // the exactly-once streaming commit path enforces too
    val ex = intercept[Exception] {
      Layout.snapshotAppendEpoch(spark, root,
        Seq((3L, -1.0)).toDF("k", "price"), epoch = 100L,
        writerId = "w1", appendToExisting = true)
    }
    assert(ex.getMessage.contains("check.positive"), ex.getMessage)
    assert(Layout.readSnapshot(spark, root).count() == 2)
  }

  test("the gate is ONE job regardless of how many constraints the table declares") {
    import spark.implicits._
    def jobsForAppend(nChecks: Int): Int = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-chk-j$nChecks").toString + "/t"
      val checks = (1 to nChecks)
        .map(i => s"check.c$i" -> s"price > ${-i}").toMap
      Layout.snapshotAppend(spark, root,
        Seq((1L, 5.0)).toDF("k", "price"), extraProps = checks)
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        Layout.snapshotAppend(spark, root, Seq((2L, 6.0)).toDF("k", "price"))
        // drain the async listener bus so every job-start event lands
        val deadline = System.currentTimeMillis() + 30000
        var last = -1
        while (System.currentTimeMillis() < deadline &&
            counter.get() != last) {
          last = counter.get(); Thread.sleep(200)
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      counter.get()
    }
    val one = jobsForAppend(1)
    val five = jobsForAppend(5)
    assert(five == one,
      s"k constraints must cost the same job count as 1 (got $one vs $five)" +
        " — the rules fold into a single labeled pass")
    // and the fold still names the SPECIFIC violated rule
    val root = java.nio.file.Files
      .createTempDirectory("graft-chk-name").toString + "/t"
    Layout.snapshotAppend(spark, root, Seq((1L, 5.0)).toDF("k", "price"),
      extraProps = Map("check.pos" -> "price > 0",
        "check.cap" -> "price < 100"))
    val ex = intercept[Exception] {
      Layout.snapshotAppend(spark, root, Seq((2L, 200.0)).toDF("k", "price"))
    }
    assert(ex.getMessage.contains("check.cap") &&
      ex.getMessage.contains("price < 100"), ex.getMessage)
  }
}
