package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.GraftDatasetBridge
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, EqualNullSafe, EqualTo, Expression, In, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
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
  * Supported surface — the full Delta-style clause matrix on a
  * single-key equality condition:
  *
  * {{{
  * MERGE INTO graft.t t USING src s ON t.key = s.k
  *   WHEN MATCHED [AND cond] THEN UPDATE SET c = expr… | DELETE   (×N, first wins)
  *   WHEN NOT MATCHED [AND cond] THEN INSERT (cols…) VALUES (…)   (×N, first wins)
  *   WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET … | DELETE (×N)
  * }}}
  *
  * Semantics per row (replayed in the rewrite over the full-outer join
  * of touched rows with the source, SQL clause order = first matching
  * clause wins): matched → its clause's UPDATE assignments / DELETE,
  * no clause matching → unchanged; target-only → the first matching
  * NOT MATCHED BY SOURCE clause (unchanged without one); source-only →
  * the first matching INSERT clause (dropped without one). Source rows
  * whose key misses every touched file are genuinely new keys — the
  * full-outer join surfaces them as inserts precisely because a
  * matching target row would have made its file touched. Clause
  * conditions must be DETERMINISTIC (each is evaluated in more than
  * one derived expression; Delta refuses the same).
  *
  * PRICING: without NOT MATCHED BY SOURCE the touched-file set prunes
  * to files whose key ranges overlap the SOURCE keys — O(touched +
  * source). A NOT MATCHED BY SOURCE clause can change any target row
  * whose key is absent from the source, which no file-level key stat
  * can bound, so the changelog widens to all target keys (every
  * populated file rewrites — the same full-scan price Delta pays for
  * that clause).
  */
case class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case m: MergeIntoTable if m.resolved && graftTarget(m.targetTable).isDefined =>
        GraftMergeCommand(m)
      case u: UpdateTable if u.resolved && graftTarget(u.table).isDefined =>
        GraftUpdateCommand(u)
      // DELETE: leave the MOR-servable shapes (no WHERE / key = / key IN)
      // to the DSv2 SupportsDelete path — O(keys) sidecar commit, zero
      // data I/O; everything richer commits a position-delete sidecar
      // here (or a COW rewrite under spark.graft.delete.mode=cow)
      case d: DeleteFromTable if d.resolved &&
          graftTarget(d.table).isDefined && !morServable(d.condition) =>
        GraftDeleteCommand(d)
    }

  private def graftTarget(p: LogicalPlan): Option[DataSourceV2Relation] =
    p.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
    }

  // foldable, not Literal — and cast-tolerant on BOTH sides: this rule
  // runs at ANALYSIS (post-hoc resolution), before ConstantFolding /
  // UnwrapCastInBinaryComparison, so type coercion leaves
  // `key IN (2, 5)` as `cast(key) IN (cast(2), cast(5))`; the optimizer
  // strips those before the DSv2 filter translation the MOR path sees
  private def integralType(dt: org.apache.spark.sql.types.DataType) =
    dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }

  private def integralLit(e: Expression): Boolean =
    e.foldable && integralType(e.dataType)

  private def keyAttr(e: Expression): Boolean = e match {
    case a: AttributeReference => integralType(a.dataType)
    case c: Cast if integralType(c.dataType) => keyAttr(c.child)
    case _ => false
  }

  /** The exact predicate shapes [[GraftTable.deleteWhere]] serves as an
    * O(keys) MOR sidecar — the fast path this rule must NOT steal.
    */
  private def morServable(cond: Expression): Boolean = cond match {
    case Literal(true, _) => true
    case EqualTo(a, v) if keyAttr(a) => integralLit(v)
    case EqualTo(v, a) if keyAttr(a) => integralLit(v)
    case EqualNullSafe(a, v) if keyAttr(a) => integralLit(v)
    case EqualNullSafe(v, a) if keyAttr(a) => integralLit(v)
    case In(a, vs) if keyAttr(a) && vs.nonEmpty => vs.forall(integralLit)
    case _ => false
  }
}

case class GraftMergeCommand(merge: MergeIntoTable)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(merge)

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft MERGE INTO supports conditional multi-clause WHEN MATCHED " +
        "UPDATE/DELETE, WHEN NOT MATCHED INSERT, and WHEN NOT MATCHED " +
        s"BY SOURCE UPDATE/DELETE on a single-key equality condition; " +
        s"$what. For richer shapes use Layout.snapshotMergeKeys directly.")

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

    // ---- actions: ordered clause lists, each (condition, effect).
    // condition None = always; a clause condition must be deterministic
    // (it is evaluated in several derived expressions — keep/value
    // chains — which must agree per row)
    sealed trait Effect
    case object EDelete extends Effect
    case class EUpdate(assigns: Seq[Assignment]) extends Effect
    case class EInsert(assigns: Seq[Assignment]) extends Effect
    def checkCond(c: Option[Expression]): Option[Expression] = {
      c.foreach(e => if (!e.deterministic)
        unsupported(s"clause condition `${e.sql}` is nondeterministic"))
      c
    }
    val matchedClauses: Seq[(Option[Expression], Effect)] =
      merge.matchedActions.map {
        case UpdateAction(c, assigns, _) => (checkCond(c), EUpdate(assigns))
        case DeleteAction(c) => (checkCond(c), EDelete)
        case other => unsupported(s"matched action $other")
      }
    val insertClauses: Seq[(Option[Expression], Seq[Assignment])] =
      merge.notMatchedActions.map {
        case InsertAction(c, assigns) => (checkCond(c), assigns)
        case other => unsupported(s"not-matched action $other")
      }
    val nmbsClauses: Seq[(Option[Expression], Effect)] =
      merge.notMatchedBySourceActions.map {
        case UpdateAction(c, assigns, _) => (checkCond(c), EUpdate(assigns))
        case DeleteAction(c) => (checkCond(c), EDelete)
        case other => unsupported(s"not-matched-by-source action $other")
      }

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
    val sourceKeys = sourceDf
      .select(GraftColumnBridge.column(sKey).cast("long").as("__graft_k"))
    // NOT MATCHED BY SOURCE can change any target row whose key the
    // source lacks — unboundable by file key stats, so the changelog
    // widens to every target key (all populated files rewrite)
    val changeKeys =
      if (nmbsClauses.isEmpty) sourceKeys
      else sourceKeys.union(Layout.readSnapshot(spark, gt.tableRoot)
        .select(col(tKey.name).cast("long").as("__graft_k")))

    val targetCols: Seq[Attribute] = rel.output
    val rewrite: DataFrame => DataFrame = { touched =>
      // files written BEFORE a schema evolution lack the new columns
      // physically; pad them as NULL (exactly what a table read shows)
      val tP = touched.select(
        targetCols.map(a =>
          (if (touched.columns.contains(a.name)) touched(a.name)
           else lit(null).cast(a.dataType)).as(tPref + a.name)) :+
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
      val sourceOnly = col(tPref + "__x").isNull
      // per-clause tri-state machinery: a clause fires when its
      // condition (null-safe: NULL = no) is true AND no earlier clause
      // fired — folded as ordered `when` chains
      def condCol(c: Option[Expression]) =
        c.map(e => coalesce(colOf(e), lit(false))).getOrElse(lit(true))
      // does the FIRST firing clause delete? (no clause fires → kept)
      def deletedBy(clauses: Seq[(Option[Expression], Effect)]) =
        clauses.reverse.foldLeft(lit(false)) {
          case (tail, (c, eff)) =>
            when(condCol(c), lit(eff == EDelete)).otherwise(tail)
        }
      val matchedDeleted = deletedBy(matchedClauses)
      val nmbsDeleted = deletedBy(nmbsClauses)
      // does ANY insert clause fire for a source-only row?
      val insFires = insertClauses.reverse.foldLeft(lit(false)) {
        case (tail, (c, _)) => when(condCol(c), lit(true)).otherwise(tail)
      }
      val kept = joined.filter(
        (isMatched && !matchedDeleted) ||
          (targetOnly && !nmbsDeleted) ||
          (sourceOnly && insFires))
      // value of column `a` per branch: ordered when-chain over the
      // branch's clauses; fall through = keep (matched / target-only)
      // or NULL (insert — an unfired insert row is filtered out above)
      def chainVal(clauses: Seq[(Option[Expression], Effect)],
          a: Attribute, fallThrough: org.apache.spark.sql.Column) =
        clauses.reverse.foldLeft(fallThrough) {
          case (tail, (c, EUpdate(assigns))) =>
            val v = assigns.find(x => assignName(x) == a.name)
              .map(x => colOf(x.value).cast(a.dataType))
              .getOrElse(col(tPref + a.name))
            when(condCol(c), v).otherwise(tail)
          case (tail, (c, EDelete)) =>
            // deleted rows never survive the filter; keep the chain's
            // shape so later (lower-priority) clauses stay shadowed
            when(condCol(c), col(tPref + a.name)).otherwise(tail)
          case (tail, _) => tail
        }
      val insChain = (a: Attribute) =>
        insertClauses.reverse.foldLeft(lit(null).cast(a.dataType)) {
          case (tail, (c, assigns)) =>
            val v = assigns.find(x => assignName(x) == a.name)
              .map(x => colOf(x.value).cast(a.dataType))
              .getOrElse(lit(null).cast(a.dataType))
            when(condCol(c), v).otherwise(tail)
        }
      kept.select(targetCols.map { a =>
        val keepCol = col(tPref + a.name)
        when(isMatched, chainVal(matchedClauses, a, keepCol))
          .when(targetOnly, chainVal(nmbsClauses, a, keepCol))
          .otherwise(insChain(a)).as(a.name)
      }: _*)
    }

    Layout.snapshotMergeKeys(spark, gt.tableRoot, tKey.name,
      changeKeys, rewrite,
      // NMBS reads every target row — its commit must conflict with
      // ANY concurrent append, not just key-overlapping ones
      readsWholeTable = nmbsClauses.nonEmpty)
    Nil
  }
}

/** Shared plumbing for single-table row-level rewrites (UPDATE / COW
  * DELETE): resolve the graft target, derive the pruning key from the
  * table's declared `statsKey`, translate resolved condition/assignment
  * expressions to Columns over a re-read of the same table (attribute →
  * plain name; single table, no ambiguity), and route the rewrite
  * through the manifest-stats-pruned COW engine
  * [[Layout.snapshotMergeKeys]] — touched files resolve from the keys
  * of rows the predicate ACTUALLY matches (a file containing a matching
  * row necessarily has that row's key in its stats range), untouched
  * files are carried by reference, so SQL UPDATE/DELETE cost
  * O(matched-scan + touched-rewrite), never a whole-table rewrite.
  */
private[plans] trait GraftRowLevelCommand { self: LeafRunnableCommand =>

  protected def opName: String

  protected def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft $opName: $what. For richer shapes use " +
        "Layout.snapshotMergeKeys directly.")

  protected def relationOf(plan: LogicalPlan): (DataSourceV2Relation, GraftTable) = {
    val rel = plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] => r
    }.getOrElse(unsupported("target is not a graft table"))
    val gt = rel.table.asInstanceOf[GraftTable]
    require(gt.writable,
      s"$opName targets ${gt.name()} pinned by time travel — read-only")
    (rel, gt)
  }

  /** The pruning key: first column of the table's `statsKey` property —
    * declared once at CREATE, the same column every manifest commit
    * records ranges for.
    */
  protected def pruneKeyOf(rel: DataSourceV2Relation, gt: GraftTable): String = {
    val sk = Option(gt.properties().get("statsKey"))
      .map(_.split(",").head.trim).filter(_.nonEmpty)
      .getOrElse(unsupported(s"table ${gt.name()} declares no 'statsKey' " +
        "TBLPROPERTY — the COW rewrite needs a stats column to prune " +
        "touched files by"))
    val att = rel.output.find(_.name == sk)
      .getOrElse(unsupported(s"statsKey column `$sk` missing from the " +
        "table schema"))
    att.dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case dt => unsupported(s"statsKey column `$sk` has type $dt " +
        "(manifest key pruning is integral)")
    }
    sk
  }

  /** Resolved expression → Column over a frame with the table's plain
    * column names. Subqueries can't ride the Dataset rewrite — refuse
    * loudly rather than silently drop them.
    */
  protected def colOf(e: Expression): org.apache.spark.sql.Column = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      unsupported(s"condition `${e.sql}` contains a subquery")
    GraftColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
    })
  }

  /** Keys of the rows the predicate matches, as the merge engine's
    * changelog frame — read through the head snapshot (null predicate
    * rows don't match, SQL semantics).
    */
  protected def matchedKeys(spark: SparkSession, gt: GraftTable,
      keyCol: String, cond: Option[Expression]): DataFrame = {
    val base = Layout.readSnapshot(spark, gt.tableRoot)
    val c = cond.map(e => coalesce(colOf(e), lit(false))).getOrElse(lit(true))
    base.filter(c).select(col(keyCol).cast("long").as("__graft_k"))
  }
}

/** `UPDATE graft.t SET c = expr, … [WHERE cond]` → the COW merge
  * engine: touched files (those whose stats range covers a matched
  * row's key) rewrite with the assignments applied to rows the
  * condition matches, every other row — in touched files and out —
  * byte-for-byte preserved or carried by reference. Cost
  * O(matched-scan + touched bytes), the Delta UPDATE shape.
  */
case class GraftUpdateCommand(update: UpdateTable)
    extends LeafRunnableCommand with GraftRowLevelCommand {

  override protected def opName: String = "UPDATE"
  override def innerChildren: Seq[LogicalPlan] = Seq(update)

  override def run(spark: SparkSession): Seq[Row] = {
    val (rel, gt) = relationOf(update.table)
    val keyCol = pruneKeyOf(rel, gt)
    val assigns: Map[String, Assignment] = update.assignments.map { a =>
      a.key match {
        case att: Attribute => att.name -> a
        case other => unsupported(s"assignment key `${other.sql}` is " +
          "not a plain column")
      }
    }.toMap
    val changeKeys = matchedKeys(spark, gt, keyCol, update.condition)
    val rewrite: DataFrame => DataFrame = { touched =>
      val c = update.condition
        .map(e => coalesce(colOf(e), lit(false))).getOrElse(lit(true))
      touched.select(rel.output.map { a =>
        assigns.get(a.name) match {
          case Some(x) =>
            when(c, colOf(x.value).cast(a.dataType))
              .otherwise(col(a.name)).as(a.name)
          case None => col(a.name)
        }
      }: _*)
    }
    Layout.snapshotMergeKeys(spark, gt.tableRoot, keyCol, changeKeys, rewrite)
    Nil
  }
}

/** `DELETE FROM graft.t WHERE <arbitrary predicate>` → by default a
  * POSITION-DELETE sidecar commit ([[Layout.snapshotDeletePositions]]):
  * one predicate scan, O(matched rows) of metadata, zero data files
  * rewritten — correct even when no key is unique, because ordinals are
  * the key (an equality sidecar would over-delete every row sharing a
  * matched row's key). Rows failing the predicate or evaluating it null
  * are preserved exactly (SQL semantics). The key-equality/IN shapes
  * never reach here (the rule leaves them to the O(keys) equality
  * sidecar path — zero scan). `spark.graft.delete.mode=cow` opts into
  * the rewriting form: COW of only the touched files, re-evaluating the
  * predicate per row — no read-side debt, at O(touched bytes) write
  * cost.
  */
case class GraftDeleteCommand(delete: DeleteFromTable)
    extends LeafRunnableCommand with GraftRowLevelCommand {

  override protected def opName: String = "DELETE"
  override def innerChildren: Seq[LogicalPlan] = Seq(delete)

  override def run(spark: SparkSession): Seq[Row] = {
    val (rel, gt) = relationOf(delete.table)
    require(gt.writable,
      s"DELETE targets ${gt.name()} pinned by time travel — read-only")
    // DEFAULT: position-delete sidecar (deletion-vector path) — one
    // predicate scan, O(matched rows) of committed metadata, ZERO data
    // files rewritten, and no unique key or statsKey required. SQL NULL
    // semantics ride the same coalesce (null predicate = no match).
    // `spark.graft.delete.mode=cow` opts back into the rewriting form
    // (e.g. to avoid read-side sidecar debt on a write-once table).
    if (spark.conf.get("spark.graft.delete.mode", "pos") != "cow") {
      Layout.snapshotDeletePositions(spark, gt.tableRoot,
        coalesce(colOf(delete.condition), lit(false)))
      return Nil
    }
    val keyCol = pruneKeyOf(rel, gt)
    val changeKeys = matchedKeys(spark, gt, keyCol, Some(delete.condition))
    val rewrite: DataFrame => DataFrame = { touched =>
      touched.filter(!coalesce(colOf(delete.condition), lit(false)))
    }
    Layout.snapshotMergeKeys(spark, gt.tableRoot, keyCol, changeKeys, rewrite)
    Nil
  }
}
