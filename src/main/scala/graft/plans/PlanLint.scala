package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Expression, Literal}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, ProjectExec, SparkPlan}

/** Plan LINTER — the suite-level plan invariants (PlanInvariantsSpec)
  * surfaced as a LIBRARY feature, so a pipeline can gate its own plans in
  * CI the way this repo gates its queries: `PlanLint.lint(df)` walks the
  * physical plan and returns findings for the anti-patterns that kill
  * 100 TB jobs; `PlanLint.require(df)` throws on any non-allowed finding.
  *
  * Rules:
  *  - `cartesian`: a CartesianProduct or BroadcastNestedLoopJoin anywhere
  *    in the executed plan — O(n·m) row pairing; intended only for
  *    bounded/1-row sides (allow it explicitly where that is the design,
  *    exactly like PlanInvariantsSpec's allowlist).
  *  - `unpushed-filter`: a Filter with a pushable attribute⋈literal
  *    conjunct sitting on a scan that CANNOT use it — either the format
  *    never evaluates source filters (text, json without the conf, …) or
  *    the format's pushdown conf is disabled — so the scan decodes every
  *    row the filter then throws away; at 100 TB that is the whole table
  *    through the decoder. NOTE the plan string's `PushedFilters: [...]`
  *    is advisory (it lists TRANSLATABLE filters even for formats that
  *    ignore them), so the rule tests format capability + session conf,
  *    not the metadata string. A genuinely non-pushable predicate
  *    (cast/function over the column) does not fire the rule.
  *  - `wide-scan`: a scan reading ≥ `wideScanColumns` columns — almost
  *    always a missing projection; columnar formats make narrow reads
  *    nearly free, so a wide ReadSchema is the symptom of `select *`
  *    reaching the scan.
  *
  * Detection walks `sparkPlan` (the pre-AQE physical tree — scans/filters
  * are stable there) and string-matches the executed plan for the join
  * shapes (robust under AQE's adaptive wrapping).
  */
object PlanLint {

  case class Finding(rule: String, detail: String)

  val DefaultWideScanColumns = 24

  def lint(df: DataFrame, allow: Set[String] = Set.empty,
      wideScanColumns: Int = DefaultWideScanColumns): Seq[Finding] = {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    val executed = df.queryExecution.executedPlan.toString
    if (!allow("cartesian")) {
      if (executed.contains("CartesianProduct"))
        out += Finding("cartesian", "CartesianProduct in executed plan")
      if (executed.contains("BroadcastNestedLoopJoin"))
        out += Finding("cartesian", "BroadcastNestedLoopJoin in executed plan")
    }
    val plan: SparkPlan = df.queryExecution.sparkPlan
    def scanOf(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case s: FileSourceScanExec => Some(s)
      // a column-pruning projection between filter and scan is normal
      case ProjectExec(_, s: FileSourceScanExec) => Some(s)
      case _ => None
    }
    def pushableConjunct(e: Expression): Boolean = e match {
      case b: BinaryComparison =>
        (b.left.isInstanceOf[Attribute] && b.right.isInstanceOf[Literal]) ||
          (b.right.isInstanceOf[Attribute] && b.left.isInstanceOf[Literal])
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        pushableConjunct(l) || pushableConjunct(r)
      case _ => false
    }
    val sqlConf = df.sparkSession.sessionState.conf
    def formatPushes(s: FileSourceScanExec): Boolean = {
      import org.apache.spark.sql.execution.datasources.csv.CSVFileFormat
      import org.apache.spark.sql.execution.datasources.json.JsonFileFormat
      import org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
      import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
      s.relation.fileFormat match {
        case _: ParquetFileFormat => sqlConf.parquetFilterPushDown
        case _: OrcFileFormat => sqlConf.orcFilterPushDown
        case _: CSVFileFormat => sqlConf.csvFilterPushDown
        case _: JsonFileFormat => sqlConf.jsonFilterPushDown
        case _ => false // text/binary: never evaluates source filters
      }
    }
    if (!allow("unpushed-filter")) plan.foreach {
      case FilterExec(cond, child) =>
        scanOf(child).foreach { s =>
          if (!formatPushes(s) && pushableConjunct(cond))
            out += Finding("unpushed-filter",
              s"filter `${cond.sql.take(120)}` sits on a " +
                s"${s.relation.fileFormat.toString} scan of " +
                s"${s.relation.location.rootPaths.headOption.getOrElse("?")} " +
                "that cannot evaluate it")
        }
      case _ => ()
    }
    if (!allow("wide-scan")) plan.foreach {
      case s: FileSourceScanExec if s.requiredSchema.size >= wideScanColumns =>
        out += Finding("wide-scan",
          s"scan reads ${s.requiredSchema.size} columns " +
            s"(${s.requiredSchema.fieldNames.take(6).mkString(", ")}, …) — " +
            "missing projection?")
      case _ => ()
    }
    out.toList
  }

  /** Throw (with every finding listed) unless the plan lints clean. */
  def require(df: DataFrame, allow: Set[String] = Set.empty,
      wideScanColumns: Int = DefaultWideScanColumns): Unit = {
    val f = lint(df, allow, wideScanColumns)
    if (f.nonEmpty) throw new IllegalStateException(
      "plan lint failed:\n" + f.map(x => s"  [${x.rule}] ${x.detail}").mkString("\n"))
  }
}
