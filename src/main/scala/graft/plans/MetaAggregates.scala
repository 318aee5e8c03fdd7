package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

import graft.sink.VersionedTable
import graft.sink.VersionedTable.FileMeta
import graft.sources.VersionedRelation

/** Metadata-only aggregates over the versioned format: COUNT(*) /
  * COUNT(col) / MIN / MAX over a [[VersionedRelation]] snapshot — global,
  * GROUP BY'd over file-single-valued columns, and/or filtered by a
  * predicate every file can DECIDE from its metadata — collapse to a
  * [[LocalRelation]] holding the answer from the MANIFEST: per-file row
  * counts, deletion-vector cardinalities, footer [lo, hi] and null
  * counts. The 100 TB `SELECT day, count(*) FROM t WHERE day >= …
  * GROUP BY day` is one small JSON read, not a cluster scan (the
  * lakehouse analog of Spark's own `OptimizeMetadataOnlyQuery` /
  * parquet aggregate pushdown, lifted from footer level to manifest
  * level; at 1000 executors the difference is a full scan job vs no job
  * at all).
  *
  * Every answer used here is EXACT, never estimated:
  *  - `count(*)` = Σ file rows − Σ DV cardinalities (DV positions are
  *    distinct in-range rows, so the subtraction is exact — per file,
  *    hence also per group and per filtered subset);
  *  - `count(col)` = Σ (live rows − null count). A DV-bearing file
  *    answers only from a LIVE stat (survivor-exact nulls, re-derived by
  *    the vectored DML that last grew its vector — a deleted row's
  *    null-ness is unknowable from a raw footer count); a fully-vectored
  *    file contributes 0 without needing stats at all.
  *  - `sum(col)` (integral columns) = Σ per-file exact sums
  *    ([[graft.sink.VersionedTable.indexSums]]'s index, refreshed by
  *    the vectored DMLs), refused unless every live file carries a sum
  *    (with a usable null count). The total folds with `addExact` and
  *    REFUSES on overflow: when the true total is representable the
  *    answer equals the scan's under every eval mode (ANSI included —
  *    no overflow occurred, so nothing to throw; TRY — same; legacy —
  *    wrap never engaged), and when it isn't, the scan keeps its own
  *    mode's overflow semantics. Metadata never silently wraps.
  *  - `min/max(col)` come from footer/live bounds, restricted to the
  *    INTEGRAL logical types + DATE + timestamps whose stat records its
  *    time unit ([[graft.sink.VersionedTable.ColStat.unit]] — an
  *    unlabeled INT64 bound can't prove micros vs millis): footer double
  *    stats are NaN-blind (a file holding NaN reports non-NaN bounds
  *    while Spark's `max` orders NaN above everything) and string bounds
  *    may be writer-truncated — those fall back to the scan rather than
  *    risk a wrong answer. A DV-bearing file's bound must be LIVE (the
  *    raw extremum might be deleted); a live-empty file is exempt.
  *
  * GROUP BY / WHERE participate only through columns on which every
  * (surviving) file is SINGLE-VALUED and null-free — degenerate [v, v]
  * stats with zero nulls: hive partition columns by construction
  * (dir-derived, exact for every recorded type), or any file-clustered
  * layout in the "long" footer domain (strings/doubles excluded for the
  * truncation/NaN reasons above). A WHERE over such columns is constant
  * per file, so membership is decided by evaluating the predicate once
  * per file against its literal values.
  *
  * All-or-nothing: if ANY aggregate in the list isn't metadata-answerable
  * (or any file lacks the needed field — e.g. a manifest written before
  * `nrows` existed), the whole Aggregate is left for the executors.
  * Time travel holds for free — the relation is bound to a version and
  * the rule reads that version's manifest. Disable with
  * `spark.graft.metaAggregates=false`. */
object MetaAggregates extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.metaAggregates", "true").toBoolean)
      return plan
    plan.transform {
      case agg: Aggregate
          if agg.aggregateExpressions.nonEmpty &&
            agg.groupingExpressions.forall(_.isInstanceOf[AttributeReference]) =>
        (for {
          (rel, conds) <- relationAndFilters(agg.child)
          rewritten <- answer(agg, rel, conds)
        } yield rewritten).getOrElse(agg)
    }
  }

  /** The VersionedRelation under the aggregate plus any Filter conditions
    * on the way down, tolerating only column-pruning Projects (pure
    * attribute lists) — any alias/computation in between means the
    * aggregate is NOT over the raw snapshot and must run. */
  private def relationAndFilters(plan: LogicalPlan)
      : Option[(VersionedRelation, Seq[Expression])] =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case vr: VersionedRelation => Some((vr, Seq.empty))
        case _ => None
      }
      case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        relationAndFilters(p.child)
      case f: Filter =>
        relationAndFilters(f.child).map { case (vr, cs) => (vr, f.condition +: cs) }
      case _ => None
    }

  /** Integral types (Long-typed `sum` output) plus DECIMAL(p<=18) —
    * the domains where a representable Σ per-file sums is bit-exactly
    * the scan's sum (decimals sum exactly as unscaled longs; the
    * manifest stores them in that domain with the scale in the stat's
    * unit field). */
  private def summableType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case d: DecimalType if d.precision <= 18 => true
    case _ => false
  }

  /** Could `dt` ever come back from a "long"-domain bound? The static
    * half of the min/max exactness rule, usable before any manifest IO.
    * Timestamps qualify statically; per-stat, only when the recorded
    * `unit` proves the conversion (see [[statLong]]). */
  private def boundableType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | ShortType | ByteType => true
    case TimestampType | TimestampNTZType => true
    // decimal bounds live in the exact UNSCALED domain (indexSums / the
    // DML refresh store them; footers are skipped for decimals) -- same
    // scale => same order, so min/max convert back exactly
    case d: DecimalType if d.precision <= 18 => true
    case _ => false
  }

  /** One stat bound as `dt`'s internal LONG domain (micros for
    * timestamps, days for dates, the value itself for integrals) — None
    * when the recorded unit can't prove the conversion. Millis stats
    * (files written by other engines) scale exactly; an unlabeled
    * timestamp stat (pre-unit manifests) refuses. */
  private def statLong(dt: DataType, s: graft.sink.VersionedTable.ColStat,
                       isMin: Boolean): Option[Long] = try {
    val v = (if (isMin) s.lo else s.hi).toLong
    dt match {
      case TimestampType => s.unit match {
        case "ts-micros" => Some(v)
        case "ts-millis" => Some(Math.multiplyExact(v, 1000L))
        case _ => None
      }
      case TimestampNTZType => s.unit match {
        case "ts-micros-ntz" => Some(v)
        case "ts-millis-ntz" => Some(Math.multiplyExact(v, 1000L))
        case _ => None
      }
      case LongType | IntegerType | DateType | ShortType | ByteType => Some(v)
      case d: DecimalType if s.unit == s"dec${d.scale}" => Some(v)
      case _ => None
    }
  } catch {
    // an unparseable bound or a ts-millis value that overflows the
    // micros domain (foreign writer's sentinel, corrupt manifest) must
    // REFUSE to the scan, not fail the query from inside the optimizer
    case scala.util.control.NonFatal(_) => None
  }

  /** An internal-long-domain extremum back as `dt`'s Catalyst value. */
  private def fromLong(dt: DataType, v: Long): Option[Any] = dt match {
    case LongType | TimestampType | TimestampNTZType => Some(v)
    case IntegerType | DateType => Some(v.toInt)
    case ShortType => Some(v.toShort)
    case ByteType => Some(v.toByte)
    case d: DecimalType => Some(
      org.apache.spark.sql.types.Decimal(v, d.precision, d.scale))
    case _ => None
  }

  /** Cheap SHAPE check — no manifest IO. The optimizer re-runs this rule
    * to fixed point, and a refused rewrite is re-attempted every
    * iteration: a query whose aggregate list can NEVER be answered
    * (avg, distinct, expressions over aggregates) must bail here,
    * not after an O(files) metadata walk — at 10⁶ manifest entries that
    * walk per iteration is real driver time for zero benefit. */
  /** Whether ONE aggregate call is metadata-answerable in principle. */
  private def aggFnAnswerable(ae: AggregateExpression): Boolean =
    ae.filter.isEmpty && {
      if (ae.isDistinct)
        // count(DISTINCT col): answerable when every live file is
        // single-valued and null-free on col (partition columns,
        // clustered layouts) — the distinct set is the per-file values
        ae.aggregateFunction match {
          case Count(Seq(_: AttributeReference)) => true
          case _ => false
        }
      else ae.aggregateFunction match {
        case Count(Seq(l: Literal)) => l.value != null
        case Count(Seq(_: AttributeReference)) => true
        case Min(a: AttributeReference) => boundableType(a.dataType)
        case Max(a: AttributeReference) => boundableType(a.dataType)
        case s: Sum => s.child match {
          case a: AttributeReference => summableType(a.dataType)
          case _ => false
        }
        // avg answers for decimal children (the buffer sum is the exact
        // decimal total metadata reproduces bit-for-bit) and for
        // INTEGRAL children (the scan's DOUBLE buffer provably
        // accumulates exactly when the worst-case Σ|v| stays under
        // 2^53 — gated per-snapshot in aggValue from the same stats;
        // past the bound the scan's own result is addition-order-
        // dependent and metadata refuses). Double/float avg stays
        // refused: its buffer rounds from the first addition.
        case av: Average => av.child match {
          case a: AttributeReference => a.dataType match {
            case d: DecimalType => d.precision <= 18
            case LongType | IntegerType | ShortType | ByteType => true
            case _ => false
          }
          case _ => false
        }
        case _ => false
      }
    }

  /** Attributes of `e` OUTSIDE any aggregate call — with grouping, these
    * must all be grouping attributes for the projection to be constant
    * per group (CollapseProject folds `avg(x) * 1e6` or `tag` literals
    * into the aggregate list; the rewrite evaluates them after
    * substituting each inner aggregate's metadata answer). */
  private def outsideAggAttrs(e: Expression): Seq[AttributeReference] =
    e match {
      case _: AggregateExpression => Seq.empty
      case a: AttributeReference => Seq(a)
      case other => other.children.flatMap(outsideAggAttrs)
    }

  private def shapeAnswerable(agg: Aggregate, conds: Seq[Expression]): Boolean =
    conds.forall(_.deterministic) && agg.aggregateExpressions.forall {
      case a: AttributeReference =>
        agg.groupingExpressions.exists(_.semanticEquals(a))
      case Alias(e, _) if e.deterministic =>
        e.collect { case ae: AggregateExpression => ae }
          .forall(aggFnAnswerable) &&
          outsideAggAttrs(e).forall(a =>
            agg.groupingExpressions.exists(_.semanticEquals(a)))
      case _ => false
    }

  private def answer(agg: Aggregate, rel: VersionedRelation,
                     conds: Seq[Expression]): Option[LogicalPlan] = {
    if (!shapeAnswerable(agg, conds)) return None
    val spark = rel.sqlContext.sparkSession
    // ONE manifest resolution for both the file metadata and the layout —
    // two independent reads could straddle a concurrent commit
    val (all, partColsSeq) =
      VersionedTable.metaSnapshot(spark, rel.root, rel.version)
    val partCols = partColsSeq.toSet
    // filter: every file must decide the whole conjunction from metadata
    val included: Seq[FileMeta] =
      if (conds.isEmpty) all
      else {
        val cond = conds.reduce(And)
        val decided = all.map(f => fileDecides(cond, f, partCols).map(f -> _))
        if (decided.exists(_.isEmpty)) return None
        decided.flatten.collect { case (f, true) => f }
      }
    if (agg.groupingExpressions.isEmpty) answerGlobal(agg, included, partCols)
    else answerGrouped(agg, included, partCols)
  }

  /** Whether `cond` holds for every row of `f` — decidable when each
    * referenced column is single-valued and null-free in the file, by
    * evaluating the predicate once on the file's literal values. A
    * constant NULL verdict drops the file (Filter keeps only TRUE). A
    * recorded-zero-row file is vacuously excluded. */
  private def fileDecides(cond: Expression, f: FileMeta,
                          partCols: Set[String]): Option[Boolean] = {
    if (!cond.deterministic) return None
    // recorded-empty AND fully-vectored files contribute no live rows:
    // exclude them rather than demand stats they may no longer carry (a
    // vectored delete that emptied a file drops its refreshable stats —
    // without this exemption every filtered metadata query on the table
    // would silently fall back to a full scan)
    if (f.rows.contains(0L) || f.rows.exists(_ == f.dvCard)) return Some(false)
    try {
      var ok = true
      val subbed = cond.transformUp {
        case a: AttributeReference =>
          singleValue(a, f, partCols) match {
            case Some(v) => Literal(v, a.dataType)
            case None => ok = false; a
          }
      }
      if (!ok) None
      else subbed.eval(InternalRow.empty) match {
        case null => Some(false)
        case b: java.lang.Boolean => Some(b.booleanValue())
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** `a`'s single value over all of `f`'s rows as its Catalyst-internal
    * form, when the file's stats prove single-valued-ness exactly.
    * Hive partition columns take their degenerate stats from the DIR
    * NAME — exact for every recorded type; footer-derived stats are
    * trusted only in the "long" domain (footer string bounds may be
    * writer-truncated — a truncated lo == hi can mask distinct values —
    * and double bounds are NaN-blind). */
  private def singleValue(a: AttributeReference, f: FileMeta,
                          partCols: Set[String]): Option[Any] =
    f.stats.get(a.name)
      .filter(s => s.lo == s.hi && s.nulls == 0L &&
        (partCols.contains(a.name) || s.typ == "long"))
      .flatMap { s =>
        // single-valued-ness is MONOTONE under deletion (every raw row has
        // the value, so every survivor does too) — no liveness needed here
        if (s.typ == "long")
          statLong(a.dataType, s, isMin = true).flatMap(fromLong(a.dataType, _))
        else internalValue(a.dataType, s.typ, s.lo)
      }

  private def answerGlobal(agg: Aggregate, fs: Seq[FileMeta],
                           partCols: Set[String]): Option[LogicalPlan] = {
    val values = agg.aggregateExpressions.map {
      case Alias(e, _) => exprValue(e, fs, partCols, Map.empty)
      case _ => None
    }
    if (values.exists(_.isEmpty)) None
    else Some(LocalRelation(agg.output,
      Seq(InternalRow.fromSeq(values.map(_.get)))))
  }

  /** GROUP BY over columns on which every surviving file is single-valued
    * and null-free: the groups are unions of whole files, and each
    * group's aggregate is the same manifest arithmetic as the global
    * case, per group. A single file with a multi-valued or null-bearing
    * grouping column refuses the whole rewrite (its rows could land in
    * several groups, including the null group metadata cannot see). */
  private def answerGrouped(agg: Aggregate, fs: Seq[FileMeta],
                            partCols: Set[String]): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    def keyOf(f: FileMeta): Option[Seq[Any]] = {
      val vs = groupAttrs.map(a => singleValue(a, f, partCols))
      if (vs.exists(_.isEmpty)) None else Some(vs.map(v => normKey(v.get)))
    }
    // a recorded-zero-row or FULLY-VECTORED file contributes no rows to
    // any group (and may have lost its refreshable stats when its last
    // survivors were deleted) — exempt rather than refuse
    val keyed = fs
      .filterNot(f => f.rows.contains(0L) || f.rows.exists(_ == f.dvCard))
      .map(f => keyOf(f).map(_ -> f))
    if (keyed.exists(_.isEmpty)) return None
    val groups = keyed.flatten.groupBy(_._1).view.mapValues(_.map(_._2))
      .toSeq.sortBy(_._1.map(String.valueOf).mkString("|"))
    val rows = groups.flatMap { case (key, members) =>
      // a group whose files hold ZERO live rows yields NO output row in a
      // real scan — emitting ("s0", 0) after a whole partition was
      // vectored away would be a phantom group (and a phantom DISTINCT
      // value). Per-file liveness: rows − dvCard when the count is
      // recorded; an uncounted file with no vector is non-empty (its
      // grouping stat witnesses a value); uncounted WITH a vector is
      // undecidable — refuse the whole rewrite.
      val live = members.map { f =>
        f.rows match {
          case Some(n) => Some(n - f.dvCard)
          case None if f.dvCard == 0L => Some(1L) // non-empty witness
          case None => None
        }
      }
      if (live.exists(_.isEmpty)) return None
      if (live.flatten.sum == 0L) None
      else {
        val byAttr = groupAttrs.zip(key).toMap
        val byId = byAttr.map { case (a, v) => a.exprId -> (v, a.dataType) }
        val values = agg.aggregateExpressions.map {
          case a: AttributeReference if byAttr.contains(a) => Some(byAttr(a))
          case Alias(e, _) => exprValue(e, members, partCols, byId)
          case _ => None
        }
        if (values.exists(_.isEmpty)) return None
        Some(InternalRow.fromSeq(values.map(_.get)))
      }
    }
    Some(LocalRelation(agg.output, rows))
  }

  /** One file subset's aggregate from metadata — the exactness rules from
    * the class doc, applied uniformly to the whole table, one group, or a
    * filtered subset. */
  private def aggValue(fn: AggregateFunction, fs: Seq[FileMeta]): Option[Any] =
    fn match {
      case Count(Seq(l: Literal)) if l.value != null =>
        if (fs.exists(_.rows.isEmpty)) None
        else Some(fs.map(_.rows.get).sum - fs.map(_.dvCard).sum)
      case Count(Seq(a: AttributeReference)) =>
        val per = fs.map { f =>
          f.rows match {
            // fully vectored (or genuinely empty): zero live rows, no
            // stats needed — covers the file whose last survivors a
            // vectored delete just removed
            case Some(n) if n == f.dvCard => Some(0L)
            // DV-free files answer from any recorded null count; a
            // DV-bearing file needs a LIVE one (survivor-exact)
            case Some(n) => f.stats.get(a.name)
              .filter(s => s.nulls >= 0 && (f.dvCard == 0L || s.live))
              .map(s => (n - f.dvCard) - s.nulls)
            case None => None
          }
        }
        if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
      case Min(a: AttributeReference) => bound(a, fs, isMin = true)
      case Max(a: AttributeReference) => bound(a, fs, isMin = false)
      case s: Sum if s.child.isInstanceOf[AttributeReference] =>
        val a = s.child.asInstanceOf[AttributeReference]
        if (!summableType(a.dataType)) None
        else sumAndCount(a, fs).flatMap { case (total, nonNull) =>
          // sum over zero non-null values is NULL, like the scan's
          if (nonNull == 0L) Some(Some(null))
          else a.dataType match {
            case d: DecimalType =>
              // exact unscaled total back as Sum's own result type;
              // a total past its precision refuses (the scan then
              // applies its own eval mode's overflow semantics)
              val rt = s.dataType.asInstanceOf[DecimalType]
              val dec = org.apache.spark.sql.types.Decimal(
                BigDecimal(java.math.BigDecimal.valueOf(total, d.scale)))
              if (dec.changePrecision(rt.precision, rt.scale)) Some(Some(dec))
              else None
            case _ => Some(Some(total))
          }
        }.map(_.orNull)
      // avg(decimal) = the exact decimal total ÷ live non-null count,
      // pushed through Spark's OWN Average.evaluateExpression (its
      // buffer attributes substituted with the metadata values), so
      // division precision/rounding are bit-identical to the scan's
      case av: Average if av.child.isInstanceOf[AttributeReference] =>
        val a = av.child.asInstanceOf[AttributeReference]
        a.dataType match {
          case d: DecimalType if d.precision <= 18 =>
            sumAndCount(a, fs).flatMap { case (total, nonNull) =>
              if (nonNull == 0L) Some(null) // avg over no values is NULL
              else {
                val sumAttr = av.aggBufferAttributes.head
                val cntAttr = av.aggBufferAttributes(1)
                val st = sumAttr.dataType.asInstanceOf[DecimalType]
                val dec = org.apache.spark.sql.types.Decimal(
                  BigDecimal(java.math.BigDecimal.valueOf(total, d.scale)))
                if (!dec.changePrecision(st.precision, st.scale)) None
                else {
                  val sub = av.evaluateExpression.transform {
                    case ar: AttributeReference if ar.exprId == sumAttr.exprId =>
                      Literal(dec, sumAttr.dataType)
                    case ar: AttributeReference if ar.exprId == cntAttr.exprId =>
                      Literal(nonNull)
                  }
                  try Some(sub.eval(InternalRow.empty))
                  catch { case scala.util.control.NonFatal(_) => None }
                }
              }
            }
          // avg(integral) = exact long total ÷ live count through
          // Spark's OWN evaluateExpression — answerable only when the
          // scan's double buffer provably accumulates the same value on
          // EVERY addition order: all partial sums are exact in a
          // double iff the worst-case Σ|v| < 2^53 (integers are exact
          // doubles there). Σ|v| is bounded from the same metadata:
          // Σ_files live_rows · max(|lo|, |hi|). Past the bound the
          // scan's own answer is addition-order-dependent — refuse and
          // let it run.
          case LongType | IntegerType | ShortType | ByteType =>
            sumAndCount(a, fs).flatMap { case (total, nonNull) =>
              if (nonNull == 0L) Some(null)
              else integralAbsBound(a, fs).flatMap { worstAbsSum =>
                if (worstAbsSum >= (1L << 53)) None
                else {
                  val sumAttr = av.aggBufferAttributes.head
                  val cntAttr = av.aggBufferAttributes(1)
                  val sub = av.evaluateExpression.transform {
                    case ar: AttributeReference if ar.exprId == sumAttr.exprId =>
                      Literal(total.toDouble, sumAttr.dataType)
                    case ar: AttributeReference if ar.exprId == cntAttr.exprId =>
                      Literal(nonNull)
                  }
                  try Some(sub.eval(InternalRow.empty))
                  catch { case scala.util.control.NonFatal(_) => None }
                }
              }
            }
          case _ => None
        }
      case _ => None
    }

  /** Upper bound on Σ|v| of a column's LIVE non-null values over a file
    * subset: Σ_files live_rows · max(|lo|, |hi|), from per-file range
    * stats in the exact "long" domain. None when any live file lacks a
    * usable stat or the bound itself overflows (then nothing can be
    * proven — refuse). */
  private def integralAbsBound(a: AttributeReference,
                               fs: Seq[FileMeta]): Option[Long] = {
    val per = fs.map { f =>
      f.rows match {
        case Some(n) if n == f.dvCard => Some(0L)
        case Some(n) => f.stats.get(a.name)
          .filter(s => s.typ == "long" && s.unit == "" &&
            (f.dvCard == 0L || s.live))
          .flatMap { s =>
            try {
              val lo = s.lo.toLong; val hi = s.hi.toLong
              if (lo == Long.MinValue) None
              else Some(Math.multiplyExact(n - f.dvCard,
                math.max(math.abs(lo), math.abs(hi))))
            } catch { case _: Exception => None }
          }
        case None => None
      }
    }
    if (per.exists(_.isEmpty)) None
    else try Some(per.flatten.foldLeft(0L)(Math.addExact))
    catch { case _: ArithmeticException => None }
  }

  /** Evaluate one output expression from metadata: every inner aggregate
    * call substitutes its metadata answer as a literal, every grouping
    * attribute its group value, and the residue (casts, arithmetic, tag
    * literals — whatever CollapseProject folded in) evaluates with
    * Spark's own expression semantics. None if any inner aggregate
    * refuses or anything non-substitutable remains. */
  private def exprValue(e: Expression, fs: Seq[FileMeta],
                        partCols: Set[String],
                        groupVals: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
                                       (Any, DataType)]): Option[Any] = {
    var ok = true
    val sub = e.transformUp {
      case ae: AggregateExpression if ae.filter.isEmpty =>
        val v = if (ae.isDistinct) distinctValue(ae.aggregateFunction, fs, partCols)
          else aggValue(ae.aggregateFunction, fs)
        v match {
          case Some(x) => Literal(x, ae.dataType)
          case None => ok = false; ae
        }
      case a: AttributeReference if groupVals.contains(a.exprId) =>
        val (v, dt) = groupVals(a.exprId)
        Literal(v, dt)
    }
    if (!ok || sub.exists(x => x.isInstanceOf[AttributeReference] ||
        x.isInstanceOf[AggregateExpression])) None
    else try Some(sub.eval(InternalRow.empty))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** (exact unscaled/integral total, live non-null count) over a file
    * subset — the shared Σ for sum and avg. Per file: a DV-bearing file
    * needs a LIVE sum; a fully-vectored file contributes (0, 0) free;
    * decimal stats must carry the column's own scale in their unit
    * (type/scale integrity across schema evolution). None = some file
    * can't answer, or the exact fold overflowed Long. */
  private def sumAndCount(a: AttributeReference,
                          fs: Seq[FileMeta]): Option[(Long, Long)] = {
    val wantTyp = a.dataType match {
      case _: DecimalType => "dec"
      case _ => "long"
    }
    val wantUnit = a.dataType match {
      case d: DecimalType => s"dec${d.scale}"
      case _ => ""
    }
    val per = fs.map { f =>
      f.rows match {
        case Some(n) if n == f.dvCard => Some((0L, 0L))
        case Some(n) => f.stats.get(a.name)
          .filter(s0 => s0.typ == wantTyp && s0.unit == wantUnit &&
            s0.sum.isDefined && s0.nulls >= 0 && (f.dvCard == 0L || s0.live))
          .map(s0 => (s0.sum.get, (n - f.dvCard) - s0.nulls))
        case None => None
      }
    }
    if (per.exists(_.isEmpty)) None
    else {
      val vals = per.flatten
      try Some((vals.foldLeft(0L)((acc, b) => Math.addExact(acc, b._1)),
        vals.map(_._2).sum))
      catch { case _: ArithmeticException => None }
    }
  }

  /** count(DISTINCT col) over a file subset where every live file is
    * single-valued and null-free on col — the distinct set is exactly
    * the set of per-file values. A file with an unrecorded row count AND
    * a deletion vector might be live-empty (its value would be a
    * phantom), so it refuses. */
  private def distinctValue(fn: AggregateFunction, fs: Seq[FileMeta],
                            partCols: Set[String]): Option[Any] =
    fn match {
      case Count(Seq(a: AttributeReference)) =>
        val counted = fs.filterNot(f =>
          f.rows.contains(0L) || f.rows.exists(_ == f.dvCard))
        if (counted.exists(f => f.rows.isEmpty && f.dvCard > 0L)) return None
        val vs = counted.map(f => singleValue(a, f, partCols))
        if (vs.exists(_.isEmpty)) None
        else Some(vs.flatten.map(normKey).distinct.size.toLong)
      case _ => None
    }

  /** GROUP BY / DISTINCT normalize -0.0 to 0.0 before comparing (Spark's
    * NormalizeFloatingNumbers); boxed Any equality doesn't — normalize
    * so a double-typed x=-0.0 next to x=0.0 lands in ONE group/value. */
  private def normKey(v: Any): Any = v match {
    case d: java.lang.Double if d.doubleValue() == 0.0 =>
      java.lang.Double.valueOf(0.0)
    case fl: java.lang.Float if fl.floatValue() == 0.0f =>
      java.lang.Float.valueOf(0.0f)
    case x => x
  }

  /** min/max over a file subset, only for logical types whose manifest
    * "long" stat domain is exact AND unambiguous (see class doc for why
    * doubles and strings refuse; timestamps answer when their stat
    * records its unit). A DV-bearing file participates only through a
    * LIVE stat — its raw extremum might be deleted — and a file with
    * zero LIVE rows (recorded-empty or fully vectored) cannot hold the
    * extremum, so it is exempt from the coverage rule. */
  private def bound(a: AttributeReference, fs: Seq[FileMeta],
                    isMin: Boolean): Option[Any] = {
    val counted = fs.filterNot(f =>
      f.rows.contains(0L) || f.rows.exists(_ == f.dvCard))
    // per-file: the stat must exist, live in the attribute's exact
    // domain ("long", or "dec" for decimals — whose unit must carry the
    // column's own scale), and be live when the file carries a vector
    val wantTyp = a.dataType match {
      case _: DecimalType => "dec"
      case _ => "long"
    }
    val vals = counted.map { f =>
      f.stats.get(a.name)
        .filter(s => s.typ == wantTyp && (f.dvCard == 0L || s.live))
        .flatMap(s => statLong(a.dataType, s, isMin))
    }
    if (vals.isEmpty || vals.exists(_.isEmpty)) return None
    val flat = vals.flatten
    fromLong(a.dataType, if (isMin) flat.min else flat.max)
  }

  /** A manifest stat-domain value as `dt`'s Catalyst-internal form. The
    * string and double cases are reachable only via partition-column
    * stats (dir-derived, exact); the "long" domain is exact everywhere. */
  private def internalValue(dt: DataType, typ: String, v: String): Option[Any] =
    (dt, typ) match {
      case (LongType, "long") => Some(v.toLong)
      case (IntegerType | DateType, "long") => Some(v.toLong.toInt)
      case (ShortType, "long") => Some(v.toLong.toShort)
      case (ByteType, "long") => Some(v.toLong.toByte)
      case (StringType, "string") =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(v))
      case (DoubleType, "double") => Some(v.toDouble)
      case (FloatType, "double") => Some(v.toDouble.toFloat)
      case _ => None
    }
}
