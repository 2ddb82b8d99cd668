package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.ops.Layout

/** CATALYST-INTEGRATED DATA SKIPPING for the manifest-versioned table —
  * the snapshot table exposed as a first-class Spark relation (the
  * Delta/Iceberg integration shape: a custom [[FileIndex]] behind a
  * `HadoopFsRelation`, Spark's own parquet reader doing the I/O): at
  * PHYSICAL PLANNING, `FileSourceScanExec` hands every pushed data
  * filter to [[listFiles]], and this index prunes the version's file
  * list from MANIFEST METADATA — stats ranges for the table's declared
  * stats columns, partition-value sets for its `partCol` — before a
  * single split is planned. Any query shape benefits (`WHERE key
  * BETWEEN`, `= lit`, `IN (...)`, conjunctions, join-pushed filters) with
  * no special read API: the optimizer decides, the manifest answers.
  *
  * Pruning is CONSERVATIVE by construction: only conjuncts it can prove
  * prune (attribute ⋈ literal on a stats/partition column) narrow the
  * list; everything else — casts, functions, disjunctions, unknown
  * columns, stat-less entries — keeps the file. Spark re-evaluates the
  * full predicate on the rows, so over-keeping is only a cost, never a
  * wrong answer.
  *
  * 100 TB: this is where manifest stats pay off END TO END — a
  * `BETWEEN` on a clustered key plans O(overlapping files) splits out
  * of a million-file table from pure metadata, inside the same Catalyst
  * plan that then broadcast-joins or aggregates the survivors.
  */
class SnapshotFileIndex(
    spark: SparkSession,
    root: String,
    entries: Seq[Layout.FileEntry],
    partCol: Option[String],
    partSpec: Seq[graft.ops.PartSpec.Dim] = Nil) extends FileIndex {

  // One listStatus per distinct parent directory (a commit's data dir),
  // not one RPC per file: the statuses carry the sizes Spark needs for
  // split planning and broadcast sizing.
  private val statusByPath: Map[String, FileStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    entries.map(e => new Path(e.path)).groupBy(_.getParent).flatMap {
      case (parent, _) =>
        parent.getFileSystem(conf).listStatus(parent)
          .map(st => st.getPath.toUri.getPath -> st)
    }
  }
  private def statusOf(e: Layout.FileEntry): FileStatus =
    statusByPath.getOrElse(new Path(e.path).toUri.getPath,
      throw new java.util.NoSuchElementException(
        s"snapshot data file ${e.path} is referenced by the resolved " +
          s"manifest under $root but missing from its directory listing " +
          "— most likely vacuumed by a concurrent retention job after " +
          "this snapshot was resolved. Re-open the table to resolve a " +
          "current version, or raise the vacuum retention window."))

  /** Files listed by the latest [[listFiles]] call — observability for
    * the pruning specs (`FileSourceScanExec`'s numFiles metric, without
    * metric plumbing).
    */
  @volatile var lastListedFiles: Int = entries.size

  override def rootPaths: Seq[Path] = Seq(new Path(root))

  override def inputFiles: Array[String] = entries.map(_.path).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = entries.map(statusOf(_).getLen).sum

  override def partitionSchema: StructType = StructType(Nil)

  // ----- shared matchers: ONE definition of "this expression is the
  // integral/string column named c" and of literal extraction, so the
  // three bound translators cannot silently diverge in what they prune on

  /** The attribute is `colName` AND carries its value as an exact
    * integer — plain integrals, DATE (Catalyst value = days since
    * epoch) and TIMESTAMP[_NTZ] (value = micros): exactly the unit the
    * manifest records from footers, so interval arithmetic is exact.
    * Fractional types stay out here (a fractional literal truncated by
    * longValue() would build a wrong interval); doubles prune through
    * their own one-sided path.
    */
  private def isIntegralCol(x: Expression, colName: String): Boolean = x match {
    case a: Attribute =>
      spark.sessionState.conf.resolver(a.name, colName) &&
        (a.dataType match {
          case org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.ShortType |
               org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.DateType |
               org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType => true
          case _ => false
        })
    case _ => false
  }

  private def isStringCol(x: Expression, colName: String): Boolean = x match {
    case a: Attribute =>
      spark.sessionState.conf.resolver(a.name, colName) &&
        a.dataType == org.apache.spark.sql.types.StringType
    case _ => false
  }

  private def longOf(l: Literal): Option[Long] = l.value match {
    case n @ (_: java.lang.Long | _: java.lang.Integer |
              _: java.lang.Short | _: java.lang.Byte) =>
      Some(n.asInstanceOf[java.lang.Number].longValue())
    case _ => None
  }

  private def strOf(l: Literal): Option[String] = l.value match {
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case s: String => Some(s)
    case _ => None
  }

  private def isFractionalCol(x: Expression, colName: String): Boolean = x match {
    case a: Attribute =>
      spark.sessionState.conf.resolver(a.name, colName) &&
        (a.dataType == org.apache.spark.sql.types.DoubleType ||
          a.dataType == org.apache.spark.sql.types.FloatType)
    case _ => false
  }

  private def dblOf(l: Literal): Option[Double] = l.value match {
    case d: java.lang.Double => Some(d)
    case f: java.lang.Float => Some(f.toDouble)
    case _ => None
  }

  /** The UPPER bound a conjunct proves for fractional `colName`, as
    * (bound, inclusive) — the only side of a double interval that is
    * sound to prune on from footer stats: footer min is a true lower
    * bound of every row even when the file hides NaN rows (Spark
    * orders NaN greatest), footer max is not (a hidden NaN satisfies
    * `d > lo` while the NaN-excluding footer max says nothing about
    * it), so lower-bound conjuncts never prune here.
    */
  private def dblHiOf(e: Expression,
      colName: String): Option[(Double, Boolean)] = {
    def isCol(x: Expression) = isFractionalCol(x, colName)
    e match {
      case EqualTo(a, l: Literal) if isCol(a) => dblOf(l).map(v => (v, true))
      case EqualTo(l: Literal, a) if isCol(a) => dblOf(l).map(v => (v, true))
      case LessThan(a, l: Literal) if isCol(a) => dblOf(l).map(v => (v, false))
      case LessThanOrEqual(a, l: Literal) if isCol(a) => dblOf(l).map(v => (v, true))
      case GreaterThan(l: Literal, a) if isCol(a) => dblOf(l).map(v => (v, false))
      case GreaterThanOrEqual(l: Literal, a) if isCol(a) => dblOf(l).map(v => (v, true))
      case In(a, vs) if isCol(a) && vs.forall(_.isInstanceOf[Literal]) =>
        val ds = vs.collect { case l: Literal => dblOf(l) }.flatten
        if (ds.size == vs.size && ds.nonEmpty && !ds.exists(_.isNaN))
          Some((ds.max, true))
        else None
      case And(l, r) =>
        (dblHiOf(l, colName), dblHiOf(r, colName)) match {
          case (Some((v1, i1)), Some((v2, i2))) =>
            // tighter bound wins; on a tie the EXCLUSIVE form is tighter
            if (v1 < v2) Some((v1, i1))
            else if (v2 < v1) Some((v2, i2))
            else Some((v1, i1 && i2))
          case (x, None) => x
          case (None, y) => y
        }
      case _ => None
    }
  }

  /** Bounds a conjunct proves for `colName`, as an allowed [lo, hi]
    * interval — None when the conjunct says nothing about the column.
    */
  private def boundOf(e: Expression, colName: String): Option[(Long, Long)] = {
    def isCol(x: Expression) = isIntegralCol(x, colName)
    e match {
      case EqualTo(a, l: Literal) if isCol(a) => longOf(l).map(v => (v, v))
      case EqualTo(l: Literal, a) if isCol(a) => longOf(l).map(v => (v, v))
      case GreaterThan(a, l: Literal) if isCol(a) =>
        longOf(l).map(v => (v + 1, Long.MaxValue))
      case GreaterThanOrEqual(a, l: Literal) if isCol(a) =>
        longOf(l).map(v => (v, Long.MaxValue))
      case LessThan(a, l: Literal) if isCol(a) =>
        longOf(l).map(v => (Long.MinValue, v - 1))
      case LessThanOrEqual(a, l: Literal) if isCol(a) =>
        longOf(l).map(v => (Long.MinValue, v))
      case GreaterThan(l: Literal, a) if isCol(a) =>
        longOf(l).map(v => (Long.MinValue, v - 1))
      case GreaterThanOrEqual(l: Literal, a) if isCol(a) =>
        longOf(l).map(v => (Long.MinValue, v))
      case LessThan(l: Literal, a) if isCol(a) =>
        longOf(l).map(v => (v + 1, Long.MaxValue))
      case LessThanOrEqual(l: Literal, a) if isCol(a) =>
        longOf(l).map(v => (Long.MinValue, v))
      case In(a, vs) if isCol(a) && vs.forall(_.isInstanceOf[Literal]) =>
        val ls = vs.collect { case l: Literal => longOf(l) }.flatten
        if (ls.size == vs.size && ls.nonEmpty) Some((ls.min, ls.max)) else None
      case And(l, r) =>
        (boundOf(l, colName), boundOf(r, colName)) match {
          case (Some((a1, b1)), Some((a2, b2))) =>
            Some((math.max(a1, a2), math.min(b1, b2)))
          case (x, None) => x
          case (None, y) => y
        }
      case _ => None
    }
  }

  /** Partition values a conjunct restricts `partCol` to (None = no
    * restriction proven).
    */
  private def partValuesOf(e: Expression, colName: String): Option[Set[String]] = {
    // STRING-TYPED columns and literals only: partition values are
    // recorded via cast-to-string at commit, but a date/timestamp
    // literal's INTERNAL value (days/micros as a number) never equals
    // that recorded text — comparing them would prune every file and
    // silently return zero rows. Non-string partition columns simply
    // don't prune (conservative).
    def isCol(x: Expression) = isStringCol(x, colName)
    e match {
      case EqualTo(a, l: Literal) if isCol(a) => strOf(l).map(Set(_))
      case EqualTo(l: Literal, a) if isCol(a) => strOf(l).map(Set(_))
      case In(a, vs) if isCol(a) && vs.forall(_.isInstanceOf[Literal]) =>
        val ss = vs.collect { case l: Literal => strOf(l) }.flatten
        if (ss.size == vs.size) Some(ss.toSet) else None
      case _ => None
    }
  }

  /** String bounds a conjunct proves for `colName` (Java string order —
    * sound against the recorded ASCII-only stats; see the FileStats
    * collation guard). None bound component = unbounded on that side.
    */
  private def strBoundOf(e: Expression,
      colName: String): Option[(Option[String], Option[String])] = {
    def isCol(x: Expression) = isStringCol(x, colName)
    e match {
      case EqualTo(a, l: Literal) if isCol(a) => strOf(l).map(v => (Some(v), Some(v)))
      case EqualTo(l: Literal, a) if isCol(a) => strOf(l).map(v => (Some(v), Some(v)))
      case GreaterThanOrEqual(a, l: Literal) if isCol(a) => strOf(l).map(v => (Some(v), None))
      case GreaterThan(a, l: Literal) if isCol(a) => strOf(l).map(v => (Some(v), None))
      case LessThanOrEqual(a, l: Literal) if isCol(a) => strOf(l).map(v => (None, Some(v)))
      case LessThan(a, l: Literal) if isCol(a) => strOf(l).map(v => (None, Some(v)))
      case GreaterThanOrEqual(l: Literal, a) if isCol(a) => strOf(l).map(v => (None, Some(v)))
      case GreaterThan(l: Literal, a) if isCol(a) => strOf(l).map(v => (None, Some(v)))
      case LessThanOrEqual(l: Literal, a) if isCol(a) => strOf(l).map(v => (Some(v), None))
      case LessThan(l: Literal, a) if isCol(a) => strOf(l).map(v => (Some(v), None))
      case In(a, vs) if isCol(a) && vs.forall(_.isInstanceOf[Literal]) =>
        val ss = vs.collect { case l: Literal => strOf(l) }.flatten
        if (ss.size == vs.size && ss.nonEmpty) Some((Some(ss.min), Some(ss.max)))
        else None
      case _ => None
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = prunedEntries(dataFilters).map(_._2)
    lastListedFiles = kept.size
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  /** The manifest entries (with their [[FileStatus]]es — real sizes for
    * split planning and statistics) surviving `dataFilters` — the one
    * pruning engine behind both [[listFiles]] (the V1
    * `HadoopFsRelation` path) and the DSv2 [[GraftScan]], which also
    * re-prunes on runtime (DPP) filters through it.
    */
  def prunedEntries(
      rawFilters: Seq[Expression]): Seq[(Layout.FileEntry, FileStatus)] = {
    // NORMALIZE InSet → In before matching: the optimizer rewrites any
    // IN list past spark.sql.optimizer.inSetConversionThreshold
    // (default 10) into InSet, whose values are INTERNAL forms —
    // without this, a 366-day DPP probe or a wide static IN proves
    // nothing and the scan silently keeps every file (observed on the
    // q104 ladder at sf1: 8/8 planned where 2/8 match)
    val dataFilters = rawFilters.map(_.transform {
      case InSet(child, hset) =>
        In(child, hset.toSeq.map(Literal(_, child.dataType)))
    })
    val statsCols = entries.flatMap(_.stats.toSeq.flatMap(_.cols.keys)).distinct
    val strStatsCols = entries.flatMap(_.stats.toSeq.flatMap(_.strCols.keys)).distinct
    // per stats column: the intersection of every conjunct's bound
    val bounds: Map[String, (Long, Long)] = statsCols.flatMap { c =>
      val bs = dataFilters.flatMap(boundOf(_, c))
      if (bs.isEmpty) None
      else Some(c -> bs.reduce((x, y) =>
        (math.max(x._1, y._1), math.min(x._2, y._2))))
    }.toMap
    val strBounds: Map[String, (Option[String], Option[String])] =
      strStatsCols.flatMap { c =>
        val bs = dataFilters.flatMap(strBoundOf(_, c))
        if (bs.isEmpty) None
        else Some(c -> bs.reduce { (x, y) =>
          val lo = (x._1.toSeq ++ y._1.toSeq).maxOption
          val hi = (x._2.toSeq ++ y._2.toSeq).minOption
          (lo, hi)
        })
      }.toMap
    val dblStatsCols = entries.flatMap(_.stats.toSeq.flatMap(_.dblCols.keys)).distinct
    val dblHis: Map[String, (Double, Boolean)] = dblStatsCols.flatMap { c =>
      val bs = dataFilters.flatMap(dblHiOf(_, c))
      if (bs.isEmpty) None
      else Some(c -> bs.reduce { (x, y) =>
        if (x._1 < y._1) x else if (y._1 < x._1) y else (x._1, x._2 && y._2)
      })
    }.toMap
    val partWant: Option[Set[String]] = partCol.flatMap { pc =>
      val vs = dataFilters.flatMap(partValuesOf(_, pc))
      if (vs.isEmpty) None else Some(vs.reduce(_ intersect _))
    }
    // PARTITION-TRANSFORM restrictions ([[graft.ops.PartSpec]]): per
    // dim, the set of transformed probe values equality/IN conjuncts
    // allow, and — for monotone dims — the transformed interval range
    // conjuncts allow. Each is a NECESSARY per-dim condition, so
    // requiring a recorded value inside every restricted dim is sound.
    val dimRestr: Seq[(graft.ops.PartSpec.Dim, Option[Set[String]],
        Option[(Long, Long)])] =
      partSpec.flatMap { d =>
        def isDimCol(x: Expression) = x match {
          case a: Attribute => spark.sessionState.conf.resolver(a.name, d.col)
          case _ => false
        }
        val sets = dataFilters.flatMap { e =>
          (e match {
            case EqualTo(a, l: Literal) if isDimCol(a) =>
              Some(Seq(l))
            case EqualTo(l: Literal, a) if isDimCol(a) =>
              Some(Seq(l))
            case In(a, vs) if isDimCol(a) &&
                vs.forall(_.isInstanceOf[Literal]) =>
              Some(vs.collect { case l: Literal => l })
            case _ => None
          }).flatMap { lits =>
            val mapped = lits.flatMap(graft.ops.PartSpec.valueOf(d, _))
            // every literal must translate, else the conjunct proves
            // nothing for this dim (conservative)
            if (mapped.size == lits.size) Some(mapped.toSet) else None
          }
        }
        val set = if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
        val range: Option[(Long, Long)] =
          if (!d.monotone) None
          else {
            val dt = dataFilters.flatMap(_.collect {
              case a: Attribute
                  if spark.sessionState.conf.resolver(a.name, d.col) =>
                a.dataType
            }).headOption
            dt.flatMap { t =>
              val bs = dataFilters.flatMap(boundOf(_, d.col))
              if (bs.isEmpty) None
              else {
                val (lo, hi) = bs.reduce((x, y) =>
                  (math.max(x._1, y._1), math.min(x._2, y._2)))
                for {
                  dl <- if (lo == Long.MinValue) Some(Long.MinValue)
                        else graft.ops.PartSpec.boundOf(d, lo, t)
                  dh <- if (hi == Long.MaxValue) Some(Long.MaxValue)
                        else graft.ops.PartSpec.boundOf(d, hi, t)
                } yield (dl, dh)
              }
            }
          }
        if (set.isEmpty && range.isEmpty) None else Some((d, set, range))
      }
    def keep(e: Layout.FileEntry): Boolean = {
      // a file the manifest KNOWS is empty (rows=0 — e.g. the data file
      // behind CREATE TABLE's empty first commit) contributes nothing to
      // any scan; its stats are the conservative full range, so without
      // this check it would survive every predicate forever
      if (e.stats.exists(_.rows == 0)) return false
      val statsOk = bounds.forall { case (c, (lo, hi)) =>
        e.stats.flatMap(_.cols.get(c)).forall { case (mn, mx) =>
          mx >= lo && mn <= hi
        }
      }
      val strOk = strBounds.forall { case (c, (lo, hi)) =>
        e.stats.flatMap(_.strCols.get(c)).forall { case (mn, mx) =>
          lo.forall(l => mx >= l) && hi.forall(h => mn <= h)
        }
      }
      // one-sided double check with PRIMITIVE comparisons: any
      // comparison against a NaN bound is false → keep (conservative),
      // and IEEE -0.0 == 0.0 matches Spark's predicate semantics
      val dblOk = dblHis.forall { case (c, (hi, incl)) =>
        e.stats.flatMap(_.dblCols.get(c)).forall { case (mn, _) =>
          if (incl) !(mn > hi) else !(mn >= hi)
        }
      }
      val partOk = partWant.forall(want => e.parts.forall(_.exists(want)))
      val specOk = dimRestr.forall { case (d, set, range) =>
        val prefix = s"${d.idx}:"
        e.parts match {
          case None => true // legacy entry: nothing recorded, keep
          case Some(ps) =>
            val vs = ps.collect {
              case s if s.startsWith(prefix) => s.substring(prefix.length)
            }
            if (vs.isEmpty) true // dim not recorded for this file: keep
            else {
              val setOk = set.forall(w => vs.exists(w))
              val rangeOk = range.forall { case (lo, hi) =>
                vs.exists { v =>
                  v.toLongOption match {
                    case Some(l) => l >= lo && l <= hi
                    // the NUL sentinel marks null source rows — a range
                    // predicate is never true on null; any other
                    // unparseable value keeps (conservative)
                    case None => v != graft.ops.PartSpec.NullSentinel
                  }
                }
              }
              setOk && rangeOk
            }
        }
      }
      // null-count pruning: `c IS NULL` skips files recording zero nulls
      // in c; `c IS NOT NULL` skips files whose every row is null in c
      // (an all-null file under an IS NOT NULL conjunct yields no rows).
      // Unknown counts keep the file.
      val nullOk = dataFilters.forall {
        case IsNull(a: Attribute) =>
          e.stats.flatMap(_.nulls.find { case (c, _) =>
            spark.sessionState.conf.resolver(a.name, c) })
            .forall { case (_, z) => z > 0 }
        case IsNotNull(a: Attribute) =>
          !(e.stats.exists(st => st.nulls.exists { case (c, z) =>
            spark.sessionState.conf.resolver(a.name, c) && z == st.rows &&
              st.rows > 0 }))
        case _ => true
      }
      statsOk && strOk && dblOk && partOk && specOk && nullOk
    }
    entries.filter(keep).map(e => e -> statusOf(e))
  }
}
