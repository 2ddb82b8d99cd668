package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** The DSv2 catalog + SQL surface over the snapshot layer
  * ([[graft.sources.GraftCatalog]] / [[graft.plans.GraftMergeRule]]):
  * CREATE/INSERT/SELECT, VERSION AS OF / TIMESTAMP AS OF, DELETE FROM
  * (MOR), MERGE INTO (pruned COW), read-only time travel, catalog ops.
  */
class SqlCatalogSpec extends GraftSuite {

  private lazy val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sqlcat").toString
    spark.conf.set("spark.sql.catalog.gtest",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.root", dir)
    dir
  }

  private def sql(q: String) = spark.sql(q)

  test("CREATE + INSERT + SELECT round-trips through manifest commits") {
    wh
    sql("CREATE TABLE gtest.t1 (key BIGINT, price DOUBLE, tag STRING) " +
      "TBLPROPERTIES ('statsKey'='key')")
    assert(Layout.snapshotVersions(spark, s"$wh/t1") == Seq(1),
      "CREATE must commit an empty v1")
    Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").cast("double").as("price"),
        col("o_orderstatus").as("tag"))
      .createOrReplaceTempView("t1_src")
    sql("INSERT INTO gtest.t1 SELECT key, price, tag FROM t1_src")
    assert(Layout.snapshotVersions(spark, s"$wh/t1") == Seq(1, 2),
      "INSERT must be one snapshot commit")
    val viaSql = sql("SELECT key, price, tag FROM gtest.t1")
    val direct = Layout.readSnapshot(spark, s"$wh/t1")
    assert(viaSql.exceptAll(direct).isEmpty && direct.exceptAll(viaSql).isEmpty)
    // the INSERT recorded key stats: the table property survived CREATE
    assert(Layout.snapshotMeta(spark, s"$wh/t1").header.get("statsKey")
      .contains("key"))
    // pushdown sanity: the scan is Spark's v2 parquet batch scan
    val plan = sql("SELECT key FROM gtest.t1 WHERE key = 42")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") || plan.contains("Scan parquet"),
      s"expected a parquet batch scan, got:\n$plan")
  }

  test("VERSION AS OF / TIMESTAMP AS OF match readSnapshot; time travel is read-only") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.tt (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("tt_src1")
    sql("INSERT INTO gtest.tt SELECT * FROM tt_src1")            // v2
    Seq((3L, "c")).toDF("k", "v").createOrReplaceTempView("tt_src2")
    sql("INSERT INTO gtest.tt SELECT * FROM tt_src2")            // v3
    val v2 = sql("SELECT * FROM gtest.tt VERSION AS OF 2")
    val v2d = Layout.readSnapshot(spark, s"$wh/tt", 2)
    assert(v2.exceptAll(v2d).isEmpty && v2d.exceptAll(v2).isEmpty)
    assert(sql("SELECT * FROM gtest.tt VERSION AS OF 3").count() == 3)
    // timestamp travel: resolve v2's commit stamp, query AS OF it
    val ts2 = Layout.snapshotTimestamps(spark, s"$wh/tt")
      .find(_._1 == 2).get._2
    val asOf = sql("SELECT * FROM gtest.tt TIMESTAMP AS OF " +
      s"timestamp_millis(${ts2}L)")
    assert(asOf.exceptAll(v2d).isEmpty && v2d.exceptAll(asOf).isEmpty)
    // a pinned version refuses writes
    val ex = intercept[Exception] {
      sql("DELETE FROM gtest.tt VERSION AS OF 2 WHERE k = 1")
    }
    // (parser may reject time travel on DELETE outright — either way,
    // nothing mutated)
    assert(Layout.snapshotVersions(spark, s"$wh/tt") == Seq(1, 2, 3))
  }

  test("DELETE FROM key IN (...) commits an O(keys) MOR sidecar; SQL reads stay exact") {
    wh
    sql("CREATE TABLE gtest.td (key BIGINT, price DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='key')")
    Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").cast("double").as("price"))
      .createOrReplaceTempView("td_src")
    sql("INSERT INTO gtest.td SELECT * FROM td_src")
    val keys = sql("SELECT key FROM gtest.td ORDER BY key LIMIT 3")
      .collect().map(_.getLong(0))
    val before = Layout.snapshotVersions(spark, s"$wh/td").size
    sql(s"DELETE FROM gtest.td WHERE key IN (${keys.mkString(",")})")
    assert(Layout.snapshotVersions(spark, s"$wh/td").size == before + 1,
      "DELETE must be one sidecar commit, no data rewrite")
    assert(Layout.snapshotMeta(spark, s"$wh/td").hasDeleteSidecars,
      "the commit must be MOR, not COW")
    // the sidecar-aware V1 fallback read still serves SQL exactly
    val after = sql("SELECT * FROM gtest.td")
    val direct = Layout.readSnapshot(spark, s"$wh/td")
    assert(after.exceptAll(direct).isEmpty && direct.exceptAll(after).isEmpty)
    assert(after.filter(col("key").isin(keys.map(Long.box): _*)).count() == 0)
    // equality delete and truncate forms
    val k4 = sql("SELECT key FROM gtest.td ORDER BY key LIMIT 1")
      .head().getLong(0)
    sql(s"DELETE FROM gtest.td WHERE key = $k4")
    assert(sql(s"SELECT * FROM gtest.td WHERE key = $k4").count() == 0)
  }

  test("MERGE INTO ≡ snapshotMergeKeys: same rows, pruned COW commit") {
    wh
    // twin tables with identical content; one merged via SQL, one via
    // the Scala changelog API — results must be identical
    val base = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").cast("double").as("price"),
        col("o_orderstatus").as("status"))
      .repartitionByRange(4, col("key")).sortWithinPartitions(col("key"))
    val sqlRoot = s"$wh/tm"
    val apiRoot = java.nio.file.Files
      .createTempDirectory("graft-mergeapi").toString + "/t"
    Layout.snapshotAppend(spark, sqlRoot, base, statsKey = Some("key"))
    Layout.snapshotAppend(spark, apiRoot, base, statsKey = Some("key"))
    val cutoff = base.agg(max(col("key"))).head().getLong(0) / 5
    val changes = base.filter(col("key") % 7 === 0 && col("key") <= cutoff)
      .select(col("key").as("c_key"), (col("price") * 1.1).as("c_price"),
        lit("U").as("c_status"))
      .unionAll(base.filter(col("key") % 1000 === 3)
        .select((col("key") + 10000000L).as("c_key"),
          col("price").as("c_price"), lit("N").as("c_status")))
      .localCheckpoint()
    changes.createOrReplaceTempView("tm_changes")
    val filesBefore = Layout.snapshotMeta(spark, sqlRoot).paths.toSet
    sql("""MERGE INTO gtest.tm t USING tm_changes s ON t.key = s.c_key
          |WHEN MATCHED THEN UPDATE SET price = s.c_price, status = s.c_status
          |WHEN NOT MATCHED THEN INSERT (key, price, status)
          |  VALUES (s.c_key, s.c_price, s.c_status)""".stripMargin)
    Layout.snapshotMergeKeys(spark, apiRoot, "key",
      changes.select(col("c_key")),
      touched => touched.join(changes, col("key") === col("c_key"),
          "full_outer")
        .select(coalesce(col("key"), col("c_key")).as("key"),
          coalesce(col("c_price"), col("price")).as("price"),
          coalesce(col("c_status"), col("status")).as("status")))
    val viaSql = sql("SELECT * FROM gtest.tm")
    val viaApi = Layout.readSnapshot(spark, apiRoot)
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty,
      "SQL MERGE and snapshotMergeKeys must produce identical tables")
    // PRUNED: untouched files carried by reference into the new version
    val filesAfter = Layout.snapshotMeta(spark, sqlRoot).paths.toSet
    assert((filesBefore intersect filesAfter).nonEmpty,
      "the merge must carry untouched files, not rewrite the table")
    // unsupported shapes still fail loudly, naming the Scala API:
    // a non-equality merge condition has no key-pruning story
    val ex = intercept[Exception] {
      sql("""MERGE INTO gtest.tm t USING tm_changes s ON t.key >= s.c_key
            |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(ex.getMessage.contains("snapshotMergeKeys"))
  }

  test("MERGE clause matrix: conditional multi-clause MATCHED, NOT MATCHED, and NOT MATCHED BY SOURCE — first clause wins") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.mc (k BIGINT, v DOUBLE, s STRING) " +
      "TBLPROPERTIES ('statsKey'='k')")
    // target: k 1..10, v = k*1.0, s = 'T'
    (1L to 10L).map(k => (k, k.toDouble, "T")).toDF("k", "v", "s")
      .createOrReplaceTempView("mc_src0")
    sql("INSERT INTO gtest.mc SELECT * FROM mc_src0")
    // source: matches k in {2,3,4,6}, new keys {20, 21}
    Seq((2L, 100.0, "a"), (3L, 100.0, "b"), (4L, 100.0, "a"),
      (6L, 100.0, "b"), (20L, 5.0, "a"), (21L, 5.0, "b"))
      .toDF("mk", "mv", "mtag").createOrReplaceTempView("mc_chg")
    sql("""MERGE INTO gtest.mc t USING mc_chg m ON t.k = m.mk
          |WHEN MATCHED AND m.mtag = 'a' AND t.k < 3 THEN DELETE
          |WHEN MATCHED AND m.mtag = 'a' THEN UPDATE SET v = m.mv * 2, s = 'A'
          |WHEN MATCHED THEN UPDATE SET v = m.mv, s = 'B'
          |WHEN NOT MATCHED AND m.mtag = 'a' THEN
          |  INSERT (k, v, s) VALUES (m.mk, m.mv, 'NA')
          |WHEN NOT MATCHED THEN INSERT (k, v, s) VALUES (m.mk, m.mv + 1, 'NB')
          |WHEN NOT MATCHED BY SOURCE AND t.k = 9 THEN DELETE
          |WHEN NOT MATCHED BY SOURCE AND t.k % 2 = 1 THEN UPDATE SET s = 'X'
          |""".stripMargin)
    val got = sql("SELECT k, v, s FROM gtest.mc ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSeq
    val expected = Seq(
      (1L, 1.0, "X"),    // NMBS second clause (odd, not 9)
      // 2 deleted: first matched clause (mtag=a, k<3)
      (3L, 100.0, "B"),  // matched, mtag=b → third clause
      (4L, 200.0, "A"),  // matched, mtag=a, k>=3 → second clause
      (5L, 5.0, "X"),    // NMBS update
      (6L, 100.0, "B"),  // matched fallback
      (7L, 7.0, "X"),    // NMBS update
      (8L, 8.0, "T"),    // target-only, no NMBS clause fires → unchanged
      // 9 deleted: first NMBS clause shadows the odd-update clause
      (10L, 10.0, "T"),
      (20L, 5.0, "NA"),  // first insert clause
      (21L, 6.0, "NB"))  // fallback insert (mv + 1)
    assert(got == expected, s"got:\n${got.mkString("\n")}")
    // nondeterministic clause conditions refuse loudly
    val ex = intercept[Exception] {
      sql("""MERGE INTO gtest.mc t USING mc_chg m ON t.k = m.mk
            |WHEN MATCHED AND rand() > 0.5 THEN DELETE""".stripMargin)
    }
    assert(ex.getMessage.contains("nondeterministic"), ex.getMessage)
  }

  test("MERGE WITH SCHEMA EVOLUTION: a new source column widens the table via the metadata-only ADD COLUMN path") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.mse (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k')")
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .createOrReplaceTempView("mse_src0")
    sql("INSERT INTO gtest.mse SELECT * FROM mse_src0")
    // source carries a column the target lacks; WITH SCHEMA EVOLUTION
    // routes through GraftCatalog.alterTable (ADD COLUMN, metadata-only)
    // during analysis, then the merge assigns it
    Seq((2L, 99.0, "fresh"), (3L, 30.0, "new"))
      .toDF("k", "v", "note").createOrReplaceTempView("mse_chg")
    sql("""MERGE WITH SCHEMA EVOLUTION INTO gtest.mse t
          |USING mse_chg s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = s.v, note = s.note
          |WHEN NOT MATCHED THEN INSERT (k, v, note) VALUES (s.k, s.v, s.note)
          |""".stripMargin)
    val got = sql("SELECT k, v, note FROM gtest.mse ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)))).toSeq
    assert(got == Seq((1L, 10.0, None), (2L, 99.0, Some("fresh")),
      (3L, 30.0, Some("new"))),
      s"evolved merge state wrong: $got")
  }

  test("MERGE WHEN MATCHED DELETE drops exactly the matched keys") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.md (k BIGINT, v STRING)")
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
      .createOrReplaceTempView("md_src")
    sql("INSERT INTO gtest.md SELECT * FROM md_src")
    Seq(2L, 4L, 9L).toDF("dk").createOrReplaceTempView("md_del")
    sql("MERGE INTO gtest.md t USING md_del s ON t.k = s.dk " +
      "WHEN MATCHED THEN DELETE")
    assert(sql("SELECT k FROM gtest.md ORDER BY k").as[Long]
      .collect().toSeq == Seq(1L, 3L))
  }

  test("catalog ops: listTables / tableExists / DROP TABLE") {
    wh
    sql("CREATE TABLE gtest.c1 (k BIGINT)")
    sql("CREATE TABLE gtest.c2 (k BIGINT)")
    val listed = sql("SHOW TABLES IN gtest").select("tableName")
      .collect().map(_.getString(0)).toSet
    assert(Set("c1", "c2").subsetOf(listed))
    sql("DROP TABLE gtest.c2")
    assert(!sql("SHOW TABLES IN gtest").select("tableName")
      .collect().map(_.getString(0)).contains("c2"))
    intercept[Exception] { sql("SELECT * FROM gtest.no_such") }
  }

  test("UPDATE with arbitrary predicate: pruned COW rewrite, exact rows, history intact") {
    wh
    sql("CREATE TABLE gtest.tu (key BIGINT, price DOUBLE, tag STRING) " +
      "TBLPROPERTIES ('statsKey'='key')")
    Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").cast("double").as("price"),
        col("o_orderstatus").as("tag"))
      .repartitionByRange(4, col("key")).sortWithinPartitions(col("key"))
      .createOrReplaceTempView("tu_src")
    sql("INSERT INTO gtest.tu SELECT key, price, tag FROM tu_src")
    val before = Layout.readSnapshot(spark, s"$wh/tu").localCheckpoint()
    sql("UPDATE gtest.tu SET price = price * 2, tag = concat(tag, '!') " +
      "WHERE price > 150000")
    val expect = before.select(col("key"),
      when(col("price") > 150000, col("price") * 2)
        .otherwise(col("price")).as("price"),
      when(col("price") > 150000, concat(col("tag"), lit("!")))
        .otherwise(col("tag")).as("tag"))
    val after = sql("SELECT key, price, tag FROM gtest.tu")
    assert(after.exceptAll(expect).isEmpty && expect.exceptAll(after).isEmpty)
    // one COW commit, zero sidecars, pre-update version still travels
    val vs = Layout.snapshotVersions(spark, s"$wh/tu")
    assert(vs == Seq(1, 2, 3), "UPDATE must be exactly one commit")
    assert(Layout.snapshotHistory(spark, s"$wh/tu")
      .filter(col("version") === 3).select("n_delete_files")
      .head().getInt(0) == 0, "UPDATE is COW — no MOR sidecar")
    val old = sql("SELECT key, price, tag FROM gtest.tu VERSION AS OF 2")
    assert(old.exceptAll(before).isEmpty && before.exceptAll(old).isEmpty)
  }

  test("UPDATE without a statsKey refuses loudly, naming the property") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.tun (k BIGINT, v DOUBLE)")
    Seq((1L, 1.0)).toDF("k", "v").createOrReplaceTempView("tun_src")
    sql("INSERT INTO gtest.tun SELECT * FROM tun_src")
    val ex = intercept[Exception] {
      sql("UPDATE gtest.tun SET v = 0 WHERE k = 1")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("statsKey")),
      s"error must name the missing property, got: ${ex.getMessage}")
  }

  test("DELETE with an arbitrary predicate commits a position-delete sidecar (no rewrite); mode=cow opts into the rewrite; NULL-predicate rows kept") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.tdc (key BIGINT, price DOUBLE, tag STRING) " +
      "TBLPROPERTIES ('statsKey'='key')")
    Seq((1L, 10.0, "F"), (2L, 20.0, "O"), (3L, 30.0, null),
        (4L, 40.0, "F"), (5L, 50.0, "O"))
      .toDF("key", "price", "tag").createOrReplaceTempView("tdc_src")
    sql("INSERT INTO gtest.tdc SELECT * FROM tdc_src")
    def dataFiles() = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk) else Seq(d)
      walk(new java.io.File(s"$wh/tdc/data"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.lastModified(), f.length())).toMap
    }
    val filesBefore = dataFiles()
    // predicate no EQUALITY sidecar can serve (non-key column,
    // conjunction): the position-delete path commits O(matched)
    // metadata, rewrites nothing, and the NULL-tag row SURVIVES (SQL:
    // null predicate doesn't match)
    sql("DELETE FROM gtest.tdc WHERE tag = 'F' AND price < 35")
    val after = sql("SELECT key FROM gtest.tdc").collect()
      .map(_.getLong(0)).sorted
    assert(after.sameElements(Array(2L, 3L, 4L, 5L)),
      s"only (1, 'F', 10.0) matches; saw ${after.mkString(",")}")
    assert(dataFiles() === filesBefore,
      "predicate DELETE must not add or rewrite any data file")
    assert(Layout.snapshotHistory(spark, s"$wh/tdc")
      .agg(sum("n_delete_files")).head().getLong(0) == 1,
      "predicate DELETE is one position sidecar")
    // the key-IN shape still rides the O(keys) equality fast path
    sql("DELETE FROM gtest.tdc WHERE key IN (2, 5)")
    assert(Layout.snapshotHistory(spark, s"$wh/tdc")
      .agg(sum("n_delete_files")).head().getLong(0) == 3, // 1 pos + carried + eq
      "key-IN DELETE must stay on the equality sidecar path")
    assert(sql("SELECT key FROM gtest.tdc").collect()
      .map(_.getLong(0)).sorted.sameElements(Array(3L, 4L)))
    // mode=cow restores the rewriting form: predicate delete rewrites
    // touched files and commits NO new sidecar (COW requires a
    // sidecar-free base — fold the debt first, the documented contract)
    Layout.snapshotCompact(spark, s"$wh/tdc", targetBytes = 1L << 22)
    spark.conf.set("spark.graft.delete.mode", "cow")
    try {
      val sidecarsBefore = Layout.snapshotHistory(spark, s"$wh/tdc")
        .agg(sum("n_delete_files")).head().getLong(0)
      sql("DELETE FROM gtest.tdc WHERE price > 35")
      assert(sql("SELECT key FROM gtest.tdc").collect()
        .map(_.getLong(0)).toSeq == Seq(3L))
      val sidecarsAfter = Layout.snapshotHistory(spark, s"$wh/tdc")
        .agg(sum("n_delete_files")).head().getLong(0)
      assert(sidecarsAfter == sidecarsBefore,
        "mode=cow must not commit a new sidecar")
    } finally spark.conf.unset("spark.graft.delete.mode")
  }

  test("metadata tables: graft.t.history / graft.t.files answer from manifests; real tables shadow the names") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.mt (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k')")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      .createOrReplaceTempView("mt_src")
    sql("INSERT INTO gtest.mt SELECT * FROM mt_src")      // v2
    sql("INSERT INTO gtest.mt SELECT k + 2, v FROM mt_src") // v3
    val hist = sql("SELECT version, n_files, n_delete_files FROM gtest.mt.history")
    assert(hist.count() == 3, "one history row per committed version")
    assert(hist.select("version").collect().map(_.getInt(0)).sorted
      .sameElements(Array(1, 2, 3)))
    val files = sql("SELECT path, rows FROM gtest.mt.files")
    val nInput = Layout.readSnapshot(spark, s"$wh/mt").inputFiles.length
    assert(files.count() == nInput,
      "one files row per head data file")
    assert(sql("SELECT sum(rows) FROM gtest.mt.files").head().getLong(0) == 4,
      "commit-time row stats must sum to the table count")
    // a REAL table at the metadata name shadows it
    sql("CREATE TABLE gtest.mt.history (note STRING)")
    Seq("real").toDF("note").createOrReplaceTempView("mth_src")
    sql("INSERT INTO gtest.mt.history SELECT * FROM mth_src")
    val shadowed = sql("SELECT * FROM gtest.mt.history")
    assert(shadowed.columns.toSeq == Seq("note"),
      "a real table must win over the metadata name")
    // an unknown suffix on a real table is still a missing table
    intercept[Exception] { sql("SELECT * FROM gtest.mt.nope") }
  }

  test("CTAS and REPLACE TABLE ride the catalog: content exact, properties recorded, history resets on replace") {
    wh
    import spark.implicits._
    Seq((1L, 2.0), (3L, 4.0), (5L, 6.0)).toDF("k", "v")
      .createOrReplaceTempView("ctas_src")
    sql("CREATE TABLE gtest.ct TBLPROPERTIES('statsKey'='k') " +
      "AS SELECT * FROM ctas_src")
    val got = sql("SELECT * FROM gtest.ct")
    val src = spark.table("ctas_src")
    assert(got.exceptAll(src).isEmpty && src.exceptAll(got).isEmpty)
    assert(Layout.snapshotMeta(spark, s"$wh/ct").header.get("statsKey")
      .contains("k"), "CTAS must record the declared table property")
    // non-staging REPLACE = drop + recreate + insert: fresh history,
    // new schema
    sql("REPLACE TABLE gtest.ct AS SELECT k FROM ctas_src")
    assert(sql("SELECT * FROM gtest.ct").columns.toSeq == Seq("k"))
    assert(sql("SELECT * FROM gtest.ct").count() == 3)
    assert(Layout.snapshotVersions(spark, s"$wh/ct") == Seq(1, 2),
      "REPLACE starts a fresh manifest history (create + insert)")
  }

  test("CALL graft.system.optimize/vacuum/maintain drive the maintenance engines from SQL and return their reports") {
    wh
    import spark.implicits._
    // a table with small-file debt: three tiny single-file commits
    sql("CREATE TABLE gtest.mx (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k')")
    for (b <- 0 to 2) {
      Seq.tabulate(40)(i => (b * 40L + i, i.toDouble)).toDF("k", "v")
        .coalesce(1).createOrReplaceTempView(s"mx_src$b")
      sql(s"INSERT INTO gtest.mx SELECT * FROM mx_src$b")
    }
    val root = s"$wh/mx"
    val before = Layout.readSnapshot(spark, root).inputFiles.length
    assert(before >= 3)

    // OPTIMIZE with z-order: one row back (version, files before/after),
    // content exact, recorded head advanced
    val opt = sql("CALL gtest.system.optimize(table => 'mx', " +
      "zorder_by => 'k')").collect()
    assert(opt.length == 1)
    val newV = opt(0).getInt(0)
    assert(opt(0).getInt(1) == before, "files_before must report the head")
    assert(Layout.snapshotVersions(spark, root).last == newV)
    val head = sql("SELECT * FROM gtest.mx")
    assert(head.count() == 120 &&
      head.distinct().count() == 120, "optimize preserves content exactly")

    // VACUUM: cutoff now, keep 1 → every superseded version expires
    val vac = sql("CALL gtest.system.vacuum(table => 'mx', " +
      s"older_than_millis => ${System.currentTimeMillis() + 1000}, " +
      "min_keep => 1)").collect()
    assert(vac.length == 1)
    val dropped = vac(0).getSeq[Int](2)
    assert(dropped.nonEmpty && !dropped.contains(newV),
      s"vacuum must drop only superseded versions, dropped $dropped")
    assert(Layout.snapshotVersions(spark, root) == Seq(newV))

    // MAINTAIN on a clean head: debt below thresholds → no compaction,
    // nothing vacuumed (fresh timestamps), report says so
    val m = sql("CALL gtest.system.maintain(table => 'mx')").collect()
    assert(m.length == 1)
    assert(m(0).isNullAt(2), "no compaction on a packed head")
    assert(m(0).getSeq[Int](4).isEmpty, "retention must not expire fresh commits")
    assert(Layout.snapshotVersions(spark, root) == Seq(newV),
      "a no-debt maintenance cycle must not commit")

    // procedures are discoverable and self-describing
    val shown = sql("SHOW PROCEDURES IN gtest.system").collect()
      .map(_.toString).mkString("\n")
    Seq("optimize", "vacuum", "maintain").foreach(p =>
      assert(shown.contains(p), s"SHOW PROCEDURES must list $p:\n$shown"))
  }

  test("graft.t.detail: one-row operator summary from manifests + one listing") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.det (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsKey'='k', 'owner.team' = 'curation')")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .createOrReplaceTempView("det_src")
    sql("INSERT INTO gtest.det SELECT * FROM det_src")
    val r = sql("SELECT * FROM gtest.det.detail").head()
    assert(r.getAs[Int]("version") == 2 &&
      r.getAs[Int]("n_delete_files") == 0 &&
      r.getAs[Long]("size_bytes") > 0 &&
      r.getAs[Long]("recorded_rows") == 2L &&
      r.getAs[String]("stats_key") == "k" &&
      r.getAs[Map[String, String]]("properties")
        .get("owner.team").contains("curation"), s"detail row: $r")
  }

  test("MOR fallback scan prunes columns and pushes filters through the V1 bridge") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.morp (k BIGINT, a DOUBLE, b STRING, c STRING) " +
      "TBLPROPERTIES ('statsKey'='k')")
    Seq.tabulate(100)(i =>
        (i.toLong, i * 1.5, s"b$i", s"c$i")).toDF("k", "a", "b", "c")
      .createOrReplaceTempView("morp_src")
    sql("INSERT INTO gtest.morp SELECT * FROM morp_src")
    sql("DELETE FROM gtest.morp WHERE k IN (5, 6)") // → MOR sidecar debt
    assert(Layout.snapshotMeta(spark, s"$wh/morp").hasDeleteSidecars,
      "precondition: the table must be on the MOR fallback path")
    val q = sql("SELECT k, a FROM gtest.morp WHERE k >= 90")
    // rows exact (deleted keys gone, filter applied)
    val got = q.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(got.sameElements((90 until 100).map(i => (i.toLong, i * 1.5))))
    // the scan node's output is the PRUNED projection, not all 4 columns
    val scans = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("Scan"))
    assert(scans.nonEmpty && scans.forall { s =>
      s.contains("k") && !s.contains("c#") && !s.contains("b#")
    }, s"scan must carry only (k, a):\n${scans.mkString("\n")}")
    // the fallback reports REAL bytes, so this tiny table broadcasts in
    // a join instead of inheriting the unknowable-huge V1 default
    spark.range(0, 100000).toDF("k").createOrReplaceTempView("morp_big")
    val j = sql("SELECT b.k FROM morp_big b JOIN gtest.morp m ON b.k = m.k")
    assert(j.count() == 98) // 100 rows minus the 2 MOR-deleted keys
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "a KB-sized MOR table must broadcast:\n" +
        j.queryExecution.executedPlan.toString.take(2000))
  }

  test("composition: clusterBy on the event-time column + temporal stats = time-sliced reads prune on a clustered-on-write table") {
    wh
    val prevOtt = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    val prevCoal = spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val src = Tables(spark, sf, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderdate").as("ts"))
        .repartition(4) // hash layout in: the table's own clustering fixes it
      src.createOrReplaceTempView("tcl_src")
      sql("CREATE TABLE gtest.tcl (k BIGINT, ts TIMESTAMP) " +
        "TBLPROPERTIES ('statsKey'='ts', 'clusterBy'='ts')")
      sql("INSERT INTO gtest.tcl SELECT * FROM tcl_src")
      val r = src.agg(min("ts"), max("ts")).head()
      val (loMs, hiMs) = (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
      val cut = new java.sql.Timestamp(loMs + (hiMs - loMs) / 10)
      val (df, idx) = Layout.snapshotTableWithIndex(spark, s"$wh/tcl")
      val got = df.filter(col("ts") <= lit(cut))
      val exp = src.filter(col("ts") <= lit(cut))
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
      assert(idx.lastListedFiles < idx.inputFiles.length,
        s"time slice must prune a ts-clustered-on-write table " +
          s"(${idx.lastListedFiles}/${idx.inputFiles.length})")
      // the declared properties are SQL-visible
      val props = sql("SHOW TBLPROPERTIES gtest.tcl").collect()
        .map(r2 => r2.getString(0) -> r2.getString(1)).toMap
      assert(props.get("statsKey").contains("ts") &&
        props.get("clusterBy").contains("ts"),
        s"SHOW TBLPROPERTIES must surface the declared layout, got $props")
    } finally {
      prevOtt match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoal)
    }
  }

  test("CALL restore: metadata-only undo to an old version; CALL clone: zero-copy table copy that diverges freely") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.rt (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k')")                      // v1
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      .createOrReplaceTempView("rt_s1")
    sql("INSERT INTO gtest.rt SELECT * FROM rt_s1")           // v2
    Seq((3L, 3.0)).toDF("k", "v").createOrReplaceTempView("rt_s2")
    sql("INSERT INTO gtest.rt SELECT * FROM rt_s2")           // v3
    sql("DELETE FROM gtest.rt WHERE k IN (1)")                // v4 (the "bad" write)
    val root = s"$wh/rt"
    val v2 = Layout.readSnapshot(spark, root, 2).localCheckpoint()
    val dataBefore = Layout.readSnapshot(spark, root).inputFiles.toSet
    val r = sql("CALL gtest.system.restore(table => 'rt', version => 2)")
      .collect()
    assert(r.length == 1 && r(0).getInt(0) == 2 && r(0).getInt(1) == 5)
    val head = sql("SELECT * FROM gtest.rt")
    assert(head.exceptAll(v2).isEmpty && v2.exceptAll(head).isEmpty,
      "restored head must equal version 2 exactly")
    assert(Layout.readSnapshot(spark, root, 5).inputFiles.toSet
      .subsetOf(dataBefore), "restore must be metadata-only (no new files)")
    // the bad head stays time-travelable below the restore
    assert(sql("SELECT * FROM gtest.rt VERSION AS OF 4").count() == 2)
    // properties restored with the state: appends still record stats
    sql("INSERT INTO gtest.rt SELECT * FROM rt_s2")           // v6
    assert(Layout.snapshotMeta(spark, root).header.get("statsKey")
      .contains("k"))

    // zero-copy clone, then divergence isolation both ways
    val c = sql("CALL gtest.system.clone(source => 'rt', target => 'rtc')")
      .collect()
    assert(c.length == 1)
    val cloned = sql("SELECT * FROM gtest.rtc")
    val srcHead = sql("SELECT * FROM gtest.rt")
    assert(cloned.exceptAll(srcHead).isEmpty && srcHead.exceptAll(cloned).isEmpty)
    sql("INSERT INTO gtest.rtc SELECT * FROM rt_s1")
    assert(sql("SELECT * FROM gtest.rtc").count() ==
      srcHead.count() + 2, "clone writes land on the clone")
    assert(sql("SELECT * FROM gtest.rt").count() == srcHead.count(),
      "the source never sees the clone's writes")
  }

  test("graft.t.partitions: per-value file and row inventory from manifests; the scoped-OPTIMIZE shopping list") {
    wh
    val src = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("part"),
        col("o_totalprice").cast("double").as("v"))
    val root = s"$wh/pt"
    for (s <- Seq("O", "F", "P"))
      Layout.snapshotAppendPartitioned(spark, root,
        src.filter(col("part") === s), "part", statsKey = Some("k"))
    val got = sql("SELECT * FROM gtest.pt.partitions").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    val expRows = src.groupBy("part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("O", "F", "P"))
    expRows.foreach { case (p, n) =>
      assert(got(p)._2.contains(n),
        s"partition $p must report $n recorded rows, got ${got(p)}")
      assert(got(p)._1 >= 1)
    }
    // the inventory is manifest-priced: zero parquet footers opened
    val f0 = Layout.footerReads.get()
    Layout.snapshotPartitionsTable(spark, root).collect()
    assert(Layout.footerReads.get() == f0,
      "partitions table must resolve from manifests alone")
  }

  test("clusterBy table property: every INSERT range-clusters at write, so narrow slices prune; an undeclared twin does not") {
    wh
    val src = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("k"),
        col("o_totalprice").cast("double").as("v"))
      .repartition(4) // hash layout: every partition spans the key space
    src.createOrReplaceTempView("cl_src")
    val (loK, hiK) = {
      val r = src.agg(min("k"), max("k")).head()
      (r.getLong(0), r.getLong(1))
    }
    val slice = col("k").between(loK, loK + (hiK - loK) / 20)
    def prunedCount(table: String,
        expected: org.apache.spark.sql.DataFrame = src): (Int, Int) = {
      val (df, idx) = Layout.snapshotTableWithIndex(spark, s"$wh/$table")
      val got = df.filter(slice)
      val exp = expected.filter(slice)
      assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty,
        s"$table: rows diverged")
      (idx.lastListedFiles, idx.inputFiles.length)
    }
    // pin the shuffle layout: AQE's partition coalescing would merge a
    // tiny test batch into one range partition (one file spanning the
    // space); production batches are file-sized and tile naturally
    val prevCoalesce = spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // declared: inserts cluster on write, the slice prunes
      sql("CREATE TABLE gtest.cl (k BIGINT, v DOUBLE) " +
        "TBLPROPERTIES ('statsKey'='k', 'clusterBy'='k')")
      sql("INSERT INTO gtest.cl SELECT * FROM cl_src WHERE k % 2 = 0")
      sql("INSERT INTO gtest.cl SELECT * FROM cl_src WHERE k % 2 = 1")
      val (nCl, totCl) = prunedCount("cl")
      assert(totCl >= 4 && nCl < totCl,
        s"clustered-on-write inserts must prune ($nCl of $totCl files)")
      // undeclared twin with the SAME hash-shuffled inserts: no pruning
      sql("CREATE TABLE gtest.cln (k BIGINT, v DOUBLE) " +
        "TBLPROPERTIES ('statsKey'='k')")
      sql("INSERT INTO gtest.cln SELECT * FROM cl_src WHERE k % 2 = 0")
      sql("INSERT INTO gtest.cln SELECT * FROM cl_src WHERE k % 2 = 1")
      val (nPlain, totPlain) = prunedCount("cln")
      // totPlain counts CREATE's empty first-commit file too, which the
      // pruner always drops (rows=0); stats must not prune any DATA file
      assert(nPlain == totPlain - 1,
        s"hash-layout control must NOT prune data files ($nPlain of " +
          s"$totPlain incl. the empty CREATE file) — the clusterBy " +
          "property is what made the difference")
      // the property travels: a later Scala append clusters too
      val extra = src.limit(500).localCheckpoint()
      Layout.snapshotAppend(spark, s"$wh/cl", extra)
      val (nCl2, totCl2) = prunedCount("cl", src.unionAll(extra))
      assert(nCl2 < totCl2, "carried clusterBy must keep clustering appends")
    } finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    // declaring a conflicting layout refuses
    intercept[Exception] {
      Layout.snapshotAppend(spark, s"$wh/cl", src.limit(10),
        clusterBy = Some("v"))
    }
  }

  test("graft.t.changes: the full op-typed feed as SQL; version predicates bound which deltas are computed; replay reconstructs the head") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.ch (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('statsKey'='k')")                       // v1 (empty)
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
      .createOrReplaceTempView("ch_src1")
    sql("INSERT INTO gtest.ch SELECT * FROM ch_src1")          // v2
    Seq((4L, 4.0), (5L, 5.0)).toDF("k", "v")
      .createOrReplaceTempView("ch_src2")
    sql("INSERT INTO gtest.ch SELECT * FROM ch_src2")          // v3
    sql("DELETE FROM gtest.ch WHERE k IN (2, 4)")              // v4 (MOR)
    val all = sql("SELECT * FROM gtest.ch.changes")
    assert(all.columns.takeRight(3).toSeq ==
      Seq("_change_type", "_graft_version", "_commit_ts"))
    assert(all.filter(col("_commit_ts") <= 0).count() == 0,
      "every change row carries its commit's wall-clock stamp")
    val byV = all.groupBy("_graft_version", "_change_type").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byV == Map((2, "insert") -> 3L, (3, "insert") -> 2L,
      (4, "delete") -> 2L), s"feed shape wrong: $byV")
    // version-range predicate: rows exact under the bounded compute
    val tail = sql(
      "SELECT k, _change_type FROM gtest.ch.changes WHERE _graft_version >= 4")
    assert(tail.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .sameElements(Array((2L, "delete"), (4L, "delete"))))
    // replaying the feed reconstructs the head
    val allC = all.localCheckpoint()
    val replay = allC.filter(col("_change_type") === "insert")
      .drop("_change_type", "_graft_version", "_commit_ts")
      .exceptAll(allC.filter(col("_change_type") === "delete")
        .drop("_change_type", "_graft_version", "_commit_ts"))
    val head = sql("SELECT * FROM gtest.ch")
    assert(replay.exceptAll(head).isEmpty && head.exceptAll(replay).isEmpty)
  }

  test("ALTER TABLE ADD COLUMN: metadata-only widening, old rows null, time travel keeps the narrow schema") {
    wh
    import spark.implicits._
    sql("CREATE TABLE gtest.ev (k BIGINT, v DOUBLE)")
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
      .createOrReplaceTempView("ev_src")
    sql("INSERT INTO gtest.ev SELECT * FROM ev_src")            // v2
    val root = s"$wh/ev"
    val filesBefore = Layout.readSnapshot(spark, root).inputFiles.toSet
    sql("ALTER TABLE gtest.ev ADD COLUMN extra STRING")         // v3
    assert(Layout.snapshotVersions(spark, root) == Seq(1, 2, 3))
    assert(Layout.readSnapshot(spark, root).inputFiles.toSet == filesBefore,
      "ALTER must be metadata-only (zero new data files)")
    // SQL and Scala reads both surface the null-filled column
    val viaSql = sql("SELECT k, v, extra FROM gtest.ev")
    assert(viaSql.count() == 2 &&
      viaSql.filter(col("extra").isNull).count() == 2)
    assert(Layout.readSnapshot(spark, root).columns.toSeq ==
      Seq("k", "v", "extra"))
    // INSERT with the new column; old rows stay null, new row valued
    Seq((3L, 3.0, "x")).toDF("k", "v", "extra")
      .createOrReplaceTempView("ev_src2")
    sql("INSERT INTO gtest.ev SELECT * FROM ev_src2")           // v4
    val after = sql("SELECT k, extra FROM gtest.ev").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(after == Map(1L -> None, 2L -> None, 3L -> Some("x")))
    // time travel below the ALTER keeps the narrow schema
    assert(sql("SELECT * FROM gtest.ev VERSION AS OF 2").columns.toSeq ==
      Seq("k", "v"))
    // refusals: duplicate name, NOT NULL
    intercept[Exception] { sql("ALTER TABLE gtest.ev ADD COLUMN v STRING") }
    intercept[Exception] {
      sql("ALTER TABLE gtest.ev ADD COLUMN req STRING NOT NULL") }
    // DROP COLUMN is now a metadata-only commit (ColumnMappingSpec owns
    // the detailed contract); here just prove the SQL surface routes
    sql("ALTER TABLE gtest.ev DROP COLUMN extra")
    assert(sql("SELECT * FROM gtest.ev").columns.toSeq == Seq("k", "v"))
  }
}
