package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.ops.Layout

/** SQL STORED PROCEDURES for the snapshot layer — the `CALL` surface
  * every table format ships its maintenance through (Iceberg's
  * `CALL cat.system.rewrite_data_files`, Delta's `OPTIMIZE`/`VACUUM`
  * statements), on Spark 4's native `ProcedureCatalog` API:
  *
  * {{{
  * CALL graft.system.optimize(table => 't', target_bytes => 134217728,
  *                            zorder_by => 'key,cust')
  * CALL graft.system.vacuum(table => 't', older_than_millis => …)
  * CALL graft.system.maintain(table => 't')          -- the policy driver
  * }}}
  *
  * Each procedure is a thin SQL binding over the SAME engines the Scala
  * API runs ([[Layout.snapshotCompact]] / [[Layout
  * .vacuumSnapshotsOlderThan]] + [[Layout.vacuumOrphanFiles]] /
  * [[Layout.snapshotMaintain]]) and returns its report as a one-row
  * result set (a [[LocalScan]] — the rows are driver-side metadata, no
  * job runs to serve them). A scheduler that can only submit SQL can
  * therefore run the full standing-maintenance loop.
  */
private[sources] object GraftProcedures {

  val Namespace: Array[String] = Array("system")
  val Names: Seq[String] =
    Seq("optimize", "vacuum", "maintain", "restore", "clone", "index",
      "analyze", "tag", "branch", "publish", "drop_ref")

  def load(spark: => SparkSession, warehouse: String,
      ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Namespace),
      s"graft procedures live under the 'system' namespace " +
        s"(got ${ident.namespace.mkString(".")}.${ident.name})")
    def rootOf(table: String): String =
      (warehouse +: table.split('.').toSeq).mkString("/")
    ident.name match {
      case "optimize" => new OptimizeProcedure(spark, rootOf)
      case "vacuum" => new VacuumProcedure(spark, rootOf)
      case "maintain" => new MaintainProcedure(spark, rootOf)
      case "restore" => new RestoreProcedure(spark, rootOf)
      case "clone" => new CloneProcedure(spark, rootOf)
      case "index" => new IndexProcedure(spark, rootOf)
      case "analyze" => new AnalyzeProcedure(spark, rootOf)
      case "tag" => new TagProcedure(spark, rootOf)
      case "branch" => new BranchProcedure(spark, rootOf)
      case "publish" => new PublishProcedure(spark, rootOf)
      case "drop_ref" => new DropRefProcedure(spark, rootOf)
      case other => throw new UnsupportedOperationException(
        s"no graft procedure 'system.$other' " +
          s"(available: ${Names.mkString(", ")})")
    }
  }

  private def p(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def pd(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def zcolsOf(s: String): Seq[org.apache.spark.sql.Column] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map(col)

  private def result(schema: StructType,
      row: InternalRow): java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = schema
    }
    Seq(scan).asJava.iterator()
  }

  /** `CALL graft.system.optimize(table, [target_bytes], [zorder_by],
    * [cluster_by])` — OPTIMIZE [ZORDER BY]: bin-pack (default),
    * z-order-recluster (`zorder_by => 'a,b'`), or lexicographically
    * recluster (`cluster_by => 'a'`), committed as a new version.
    */
  private final class OptimizeProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "optimize"
    override def description(): String =
      "bin-pack / re-cluster a snapshot table into a new version"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      pd("target_bytes", LongType, (128L << 20).toString),
      pd("zorder_by", StringType, "NULL"),
      pd("cluster_by", StringType, "NULL"),
      pd("zorder_quantile", BooleanType, "false"),
      pd("where_partitions", StringType, "NULL"))
    private val outSchema = StructType(Seq(
      StructField("version", IntegerType, nullable = false),
      StructField("files_before", IntegerType, nullable = false),
      StructField("files_after", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val root = rootOf(input.getUTF8String(0).toString)
      val target = input.getLong(1)
      val zBy = if (input.isNullAt(2)) Nil
        else zcolsOf(input.getUTF8String(2).toString)
      val cBy = if (input.isNullAt(3)) Nil
        else zcolsOf(input.getUTF8String(3).toString)
      val before = Layout.readSnapshot(spark, root).inputFiles.length
      val v =
        if (!input.isNullAt(5)) {
          // OPTIMIZE … WHERE: partition-scoped bin-pack — cold history
          // untouched, the hot partitions repack (recluster modes are
          // whole-table operations and don't combine with a scope)
          require(zBy.isEmpty && cBy.isEmpty,
            "where_partitions does not combine with zorder_by/cluster_by")
          Layout.snapshotCompactPartitions(spark, root, target,
            input.getUTF8String(5).toString.split(",")
              .map(_.trim).filter(_.nonEmpty).toSeq)
        } else Layout.snapshotCompact(spark, root, target,
          clusterBy = cBy, zOrderBy = zBy,
          zQuantile = input.getBoolean(4))
      val after = Layout.readSnapshot(spark, root, v).inputFiles.length
      result(outSchema, InternalRow(v, before, after))
    }
  }

  /** `CALL graft.system.index(table, key_col)` — build/advance the
    * per-file BLOOM INDEX on `key_col` ([[Layout.maintainBloomIndexFor]]:
    * only files new since the last run index; the convention location
    * and the table's `bloomIndex` property let the DSv2 scan prune
    * equality/IN predicates through it with zero per-query config).
    * Run on the maintenance cadence; un-caught-up files stay scanned
    * (conservative).
    */
  private final class IndexProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "index"
    override def description(): String =
      "build/advance the per-file bloom index on a column"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("key_col", StringType))
    private val outSchema = StructType(Seq(
      StructField("indexed_through_version", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val root = rootOf(input.getUTF8String(0).toString)
      val v = Layout.maintainBloomIndexFor(spark, root,
        input.getUTF8String(1).toString)
      result(outSchema, InternalRow(v))
    }
  }

  /** `CALL graft.system.tag(table, name, [version])` — name a committed
    * version ([[Layout.snapshotTag]]): immutable, time-travels via
    * `VERSION AS OF '<name>'`, protected from retention while it lives.
    */
  private final class TagProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "tag"
    override def description(): String =
      "tag a committed version with an immutable name"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("name", StringType),
      pd("version", IntegerType, "-1"))
    private val outSchema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("version", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val ref = Layout.snapshotTag(spark,
        rootOf(input.getUTF8String(0).toString),
        input.getUTF8String(1).toString, input.getInt(2))
      result(outSchema, InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(ref.name),
        ref.version))
    }
  }

  /** `CALL graft.system.branch(table, name, [from_version])` — create a
    * zero-copy branch workspace ([[Layout.snapshotBranch]]); write to it
    * as `graft.<table>.branch_<name>` or via the Scala API, read it as
    * `VERSION AS OF '<name>'`, land it with `publish`.
    */
  private final class BranchProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "branch"
    override def description(): String =
      "create a zero-copy branch workspace from a committed version"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("name", StringType),
      pd("from_version", IntegerType, "-1"))
    private val outSchema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("fork_version", IntegerType, nullable = false),
      StructField("workspace", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val root = rootOf(input.getUTF8String(0).toString)
      val nm = input.getUTF8String(1).toString
      val ws = Layout.snapshotBranch(spark, root, nm, input.getInt(2))
      val fork = Layout.snapshotRefs(spark, root)
        .find(_.name == nm).map(_.version).getOrElse(-1)
      result(outSchema, InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(nm), fork,
        org.apache.spark.unsafe.types.UTF8String.fromString(ws)))
    }
  }

  /** `CALL graft.system.publish(table, name)` — fast-forward the branch
    * head into main ([[Layout.snapshotBranchPublish]]): one commit
    * adopting the branch's entries by reference; refuses typed when main
    * moved past the fork.
    */
  private final class PublishProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "publish"
    override def description(): String =
      "fast-forward a branch head into the main line"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("name", StringType))
    private val outSchema = StructType(Seq(
      StructField("published_version", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val v = Layout.snapshotBranchPublish(spark,
        rootOf(input.getUTF8String(0).toString),
        input.getUTF8String(1).toString)
      result(outSchema, InternalRow(v))
    }
  }

  /** `CALL graft.system.drop_ref(table, name)` — drop a tag or branch
    * ([[Layout.snapshotDropRef]]); retention may then reclaim the
    * versions it protected.
    */
  private final class DropRefProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "drop_ref"
    override def description(): String = "drop a tag or branch ref"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("name", StringType))
    private val outSchema = StructType(Seq(
      StructField("dropped", StringType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val root = rootOf(input.getUTF8String(0).toString)
      val nm = input.getUTF8String(1).toString
      val kind = Layout.snapshotRefs(spark, root)
        .find(_.name == nm).map(_.kind).getOrElse(
          throw new IllegalArgumentException(s"no ref '$nm' at $root"))
      Layout.snapshotDropRef(spark, root, nm)
      result(outSchema, InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$kind:$nm")))
    }
  }

  /** `CALL graft.system.analyze(table, cols, [hist_cols])` — the
    * ANALYZE TABLE slot: backfill per-file KMV NDV synopses (+ null
    * counts, + exact row counts for previously stat-less entries) for
    * the comma-separated `cols`, and per-file equi-height quantile
    * boundaries for the numeric `hist_cols`, over every head data file
    * ([[Layout.snapshotAnalyze]]: one distributed pass, one metadata
    * commit, zero data rewritten), declaring `ndvKey`/`histKey` so
    * subsequent appends keep the statistics fresh. After one ANALYZE
    * the optimizer's CBO sees per-column distinct counts — and, for
    * hist_cols, the equi-height histogram range FilterEstimation reads
    * ([[GraftScan]] column statistics).
    */
  private final class AnalyzeProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "analyze"
    override def description(): String =
      "backfill per-file NDV synopses and declare ndvKey"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("cols", StringType),
      pd("hist_cols", StringType, "''"))
    private val outSchema = StructType(Seq(
      StructField("analyzed_version", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val root = rootOf(input.getUTF8String(0).toString)
      def csv(i: Int): Seq[String] =
        if (input.isNullAt(i)) Nil
        else input.getUTF8String(i).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val v = Layout.snapshotAnalyze(spark, root, csv(1), csv(2))
      result(outSchema, InternalRow(v))
    }
  }

  /** `CALL graft.system.vacuum(table, older_than_millis, [min_keep])` —
    * expire versions committed before the cutoff (always keeping the
    * newest `min_keep`) and delete the files only they referenced.
    */
  private final class VacuumProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "expire snapshot versions older than a cutoff; delete their files"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("older_than_millis", LongType),
      pd("min_keep", IntegerType, "2"))
    private val outSchema = StructType(Seq(
      StructField("deleted_files", IntegerType, nullable = false),
      StructField("kept_files", IntegerType, nullable = false),
      StructField("dropped_versions", ArrayType(IntegerType), nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val root = rootOf(input.getUTF8String(0).toString)
      val st = Layout.vacuumSnapshotsOlderThan(spark, root,
        input.getLong(1), input.getInt(2))
      result(outSchema, InternalRow(st.deletedFiles, st.keptFiles,
        new GenericArrayData(st.droppedVersions.toArray)))
    }
  }

  /** `CALL graft.system.restore(table, version)` — Delta's `RESTORE
    * TABLE … TO VERSION AS OF` as a procedure: commit the named
    * version's exact state as the new head ([[Layout.snapshotRestore]]
    * — metadata-only, zero data I/O; the bad head stays
    * time-travelable below the restore commit).
    */
  private final class RestoreProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "restore"
    override def description(): String =
      "commit an old version's exact state as the new head (undo)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      p("version", IntegerType))
    private val outSchema = StructType(Seq(
      StructField("restored_to", IntegerType, nullable = false),
      StructField("version", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val root = rootOf(input.getUTF8String(0).toString)
      val target = input.getInt(1)
      val v = Layout.snapshotRestore(spark, root, target)
      result(outSchema, InternalRow(target, v))
    }
  }

  /** `CALL graft.system.clone(source, target, [version])` — zero-copy
    * shallow clone ([[Layout.snapshotClone]]): one manifest write
    * referencing the source version's files; the clone is a full
    * read-write table from birth and diverges freely.
    */
  private final class CloneProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "clone"
    override def description(): String =
      "zero-copy shallow clone of a snapshot table version"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("source", StringType),
      p("target", StringType),
      pd("version", IntegerType, "-1"))
    private val outSchema = StructType(Seq(
      StructField("cloned_version", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val v = Layout.snapshotClone(spark,
        rootOf(input.getUTF8String(0).toString),
        rootOf(input.getUTF8String(1).toString),
        input.getInt(2))
      result(outSchema, InternalRow(v))
    }
  }

  /** `CALL graft.system.maintain(table, [thresholds…])` — one cycle of
    * the standing maintenance policy ([[Layout.snapshotMaintain]]):
    * metadata-priced debt measurement, threshold-gated compaction (with
    * optional standing z-order), retention, orphan sweep.
    */
  private final class MaintainProcedure(sparkF: => SparkSession,
      rootOf: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = "maintain"
    override def description(): String =
      "run one standing-maintenance cycle (compact/vacuum/orphan sweep)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(
      p("table", StringType),
      pd("target_bytes", LongType, (128L << 20).toString),
      pd("max_delete_files", IntegerType, "4"),
      pd("max_small_files", IntegerType, "16"),
      pd("retention_millis", LongType, (7L * 24 * 3600 * 1000).toString),
      pd("min_keep", IntegerType, "2"),
      pd("zorder_by", StringType, "NULL"),
      pd("zorder_quantile", BooleanType, "false"))
    private val outSchema = StructType(Seq(
      StructField("delete_files_before", IntegerType, nullable = false),
      StructField("small_files_before", IntegerType, nullable = false),
      StructField("compacted_version", IntegerType, nullable = true),
      StructField("vacuum_deleted_files", IntegerType, nullable = false),
      StructField("vacuum_dropped_versions", ArrayType(IntegerType),
        nullable = false),
      StructField("orphans_swept", IntegerType, nullable = false)))
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = sparkF
      val root = rootOf(input.getUTF8String(0).toString)
      val policy = Layout.MaintenancePolicy(
        targetFileBytes = input.getLong(1),
        maxDeleteFiles = input.getInt(2),
        maxSmallFiles = input.getInt(3),
        retentionMillis = input.getLong(4),
        minKeepVersions = input.getInt(5),
        zOrderBy = if (input.isNullAt(6)) Nil
          else zcolsOf(input.getUTF8String(6).toString),
        zQuantile = input.getBoolean(7))
      val rep = Layout.snapshotMaintain(spark, root, policy)
      result(outSchema, InternalRow(
        rep.deleteFilesBefore, rep.smallFilesBefore,
        rep.compactedVersion.map(Int.box).orNull,
        rep.vacuum.deletedFiles,
        new GenericArrayData(rep.vacuum.droppedVersions.toArray),
        rep.orphansSwept))
    }
  }
}
