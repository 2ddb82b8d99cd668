package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftDatasetBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.ops.Layout
import graft.sources.GraftTable

/** `MERGE INTO graft.t` → the snapshot COW merge engine — the Delta
  * shape (an analyzer post-hoc rule rewriting `MergeIntoTable` into a
  * runnable command) rather than the full `SupportsRowLevelOperations`
  * machinery, because the pruned path already exists:
  * [[Layout.snapshotMergeKeys]] resolves touched files from MANIFEST
  * STATS against the source's key set and rewrites only those, so a SQL
  * MERGE costs O(touched + source), never a whole-table rewrite — the
  * property a group-based DSv2 ReplaceData plan without runtime file
  * filtering would lose.
  *
  * Supported shape (the canonical upsert; anything else fails loudly
  * naming the Scala API):
  *
  * {{{
  * MERGE INTO graft.t t USING src s ON t.key = s.k
  *   WHEN MATCHED THEN UPDATE SET c = expr… | WHEN MATCHED THEN DELETE
  *   WHEN NOT MATCHED THEN INSERT (cols…) VALUES (exprs…)
  * }}}
  *
  * Semantics per row (replayed in the rewrite over the full-outer join
  * of touched rows with the source): matched → the UPDATE assignments
  * (or dropped, for DELETE); target-only → unchanged; source-only →
  * the INSERT row (or dropped if no NOT MATCHED clause). Source rows
  * whose key misses every touched file are genuinely new keys — the
  * full-outer join surfaces them as inserts precisely because a
  * matching target row would have made its file touched.
  */
case class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved && graftTarget(m).isDefined =>
        GraftMergeCommand(m)
    }

  private def graftTarget(m: MergeIntoTable): Option[DataSourceV2Relation] =
    m.targetTable.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
    }
}

case class GraftMergeCommand(merge: MergeIntoTable)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(merge)

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE INTO supports one unconditional WHEN MATCHED " +
        s"UPDATE/DELETE and one unconditional WHEN NOT MATCHED INSERT " +
        s"on a single-key equality condition; $what. For richer shapes " +
        "use Layout.snapshotMergeKeys directly.")

  override def run(spark: SparkSession): Seq[Row] = {
    val rel = merge.targetTable.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
    }.getOrElse(unsupported("target is not a graft table"))
    val gt = rel.table.asInstanceOf[GraftTable]
    require(gt.writable,
      s"MERGE targets ${gt.name()} pinned by time travel — read-only")

    val tIds = rel.output.map(_.exprId).toSet
    val sIds = merge.sourceTable.output.map(_.exprId).toSet

    // ---- condition: t.key = s.k, attributes only, integral key
    val (tKey, sKey) = merge.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tIds(a.exprId) && sIds(b.exprId) => (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sIds(a.exprId) && tIds(b.exprId) => (b, a)
      case other => unsupported(s"condition `${other.sql}` is not a " +
        "target-attribute = source-attribute equality")
    }
    tKey.dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case dt => unsupported(s"merge key ${tKey.name} has type $dt " +
        "(manifest key stats are integral)")
    }

    // ---- actions
    sealed trait Matched
    case object MKeep extends Matched
    case object MDelete extends Matched
    case class MUpdate(assigns: Seq[Assignment]) extends Matched
    val matched: Matched = merge.matchedActions match {
      case Seq() => MKeep
      case Seq(UpdateAction(None, assigns, _)) => MUpdate(assigns)
      case Seq(DeleteAction(None)) => MDelete
      case _ => unsupported("matched clauses are conditional or multiple")
    }
    val insert: Option[Seq[Assignment]] = merge.notMatchedActions match {
      case Seq() => None
      case Seq(InsertAction(None, assigns)) => Some(assigns)
      case _ => unsupported("not-matched clauses are conditional or multiple")
    }
    if (merge.notMatchedBySourceActions.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE scans every target row " +
        "(unpruneable)")

    // ---- translate resolved expressions to columns over the prefixed
    // full-outer join: attribute identity (exprId) decides which side
    val tPref = "__graft_t_"
    val sPref = "__graft_s_"
    def colOf(e: Expression): org.apache.spark.sql.Column =
      GraftColumnBridge.column(e.transform {
        case a: AttributeReference if tIds(a.exprId) =>
          UnresolvedAttribute(Seq(tPref + a.name))
        case a: AttributeReference if sIds(a.exprId) =>
          UnresolvedAttribute(Seq(sPref + a.name))
      })
    def assignName(a: Assignment): String = a.key match {
      case att: Attribute => att.name
      case other => unsupported(s"assignment key `${other.sql}` is not " +
        "a plain column")
    }

    val sourceDf = GraftDatasetBridge.ofRows(spark, merge.sourceTable)
    val changeKeys = sourceDf
      .select(GraftColumnBridge.column(sKey).cast("long").as("__graft_k"))

    val targetCols: Seq[Attribute] = rel.output
    val rewrite: DataFrame => DataFrame = { touched =>
      val tP = touched.select(
        targetCols.map(a => touched(a.name).as(tPref + a.name)) :+
          lit(1).as(tPref + "__x"): _*)
      val sP = sourceDf.select(
        merge.sourceTable.output.map(a =>
          sourceDf(a.name).as(sPref + a.name)) :+
          lit(1).as(sPref + "__x"): _*)
      val joined = tP.join(sP,
        col(tPref + tKey.name) === col(sPref + sKey.name), "full_outer")
      val isMatched =
        col(tPref + "__x").isNotNull && col(sPref + "__x").isNotNull
      val targetOnly = col(sPref + "__x").isNull
      val updBy: Map[String, Assignment] = matched match {
        case MUpdate(as) => as.map(a => assignName(a) -> a).toMap
        case _ => Map.empty
      }
      val insBy: Map[String, Assignment] =
        insert.map(_.map(a => assignName(a) -> a).toMap).getOrElse(Map.empty)
      val kept = (matched match {
        case MDelete => joined.filter(!isMatched)
        case _ => joined
      }) match {
        case j if insert.isEmpty => j.filter(!col(tPref + "__x").isNull)
        case j => j
      }
      kept.select(targetCols.map { a =>
        val keepCol = col(tPref + a.name)
        val updCol = updBy.get(a.name)
          .map(x => colOf(x.value).cast(a.dataType)).getOrElse(keepCol)
        val insCol = insBy.get(a.name)
          .map(x => colOf(x.value).cast(a.dataType))
          .getOrElse(lit(null).cast(a.dataType))
        when(isMatched, updCol).when(targetOnly, keepCol)
          .otherwise(insCol).as(a.name)
      }: _*)
    }

    Layout.snapshotMergeKeys(spark, gt.tableRoot, tKey.name,
      changeKeys, rewrite)
    Nil
  }
}
