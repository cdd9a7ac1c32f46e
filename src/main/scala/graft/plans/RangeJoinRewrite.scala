package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Join-condition marker that requests the bucketed range-join rewrite
  * ([[RangeJoinRewrite]]) for the enclosing inner join.
  *
  * Semantically it is the constant `true` (constant-folded codegen, no
  * per-row work), so a session without the rule installed still computes
  * the identical join result — just on the unrewritten plan. It carries:
  *  - `point`: the probe-side scalar being range-tested (anchors the
  *    marker to the point side),
  *  - `bound`: one interval bound (anchors it to the interval side —
  *    referencing BOTH sides keeps predicate pushdown from hoisting the
  *    marker out of the join condition before the rule sees it),
  *  - `bin`: the literal bucket width.
  *
  * Not foldable despite being constant-valued: ConstantFolding would
  * otherwise erase the marker inside the same optimizer batch the rewrite
  * rule runs in.
  */
case class RangeBinHint(point: Expression, bound: Expression, bin: Expression)
    extends Expression with Predicate {

  override def children: Seq[Expression] = Seq(point, bound, bin)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (!point.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"range_bin point must be numeric, got ${point.dataType.simpleString}")
    else if (!bound.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(s"range_bin bound must be numeric, got ${bound.dataType.simpleString}")
    else if (!bin.foldable || !bin.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure("range_bin bin must be a numeric literal")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = true

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ExprCode.forNonNullValue(JavaCode.literal("true", dataType))

  override def prettyName: String = "range_bin"

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): RangeBinHint =
    copy(point = newChildren(0), bound = newChildren(1), bin = newChildren(2))
}

/** Optimizer rule: rewrite a marked non-equi interval join into a bucketed
  * equi-join.
  *
  * An inner join whose only condition is `lo <= point < hi` plans as a
  * BroadcastNestedLoopJoin (small interval side) or a cartesian product
  * (two large sides) — O(|A|·|B|) comparisons, the classic 100 TB
  * scale-killer. With a user-chosen bucket width `bin` (via
  * [[graft.functions.pointInInterval]], the same contract as the
  * published range-join bin hints in Databricks/Flink interval joins),
  * every matching pair must share the bucket `floor(point/bin)` with one
  * of the interval's spanned buckets `floor(lo/bin) .. floor(hi/bin)`, so
  * the join becomes:
  *
  * {{{
  *   point side:     + bucket = floor(point / bin)           (map-side)
  *   interval side:  explode(sequence(floor(lo/bin), floor(hi/bin)))
  *   JOIN ON point_bucket = interval_bucket AND <original predicate>
  * }}}
  *
  * — a shuffled (or broadcast) HASH join, partitionable on the bucket key,
  * with the original predicate kept as the join filter. Each qualifying
  * pair matches exactly once (the point row has ONE bucket; the exploded
  * buckets are distinct), so no dedup step is needed. Division by a
  * positive constant and floor are monotone in IEEE arithmetic, so
  * `lo <= point <= hi` implies the bucket containment — no matches are
  * lost at bucket edges.
  *
  * The interval side grows by its spanned-bucket count, so `bin` should be
  * on the order of the typical interval width (then the blowup is ~2×; the
  * sequence cost is how skew manifests — one huge interval explodes into
  * many rows rather than stalling one task).
  *
  * Null semantics match the unrewritten join: a null point hashes to a
  * null bucket (joins nothing); a null bound nulls the sequence and
  * `outer=false` explode drops the row — the original predicate would have
  * rejected both.
  *
  * Bounds are detected from conjuncts of the form `point >= lo` / `point
  * > lo` / `point <= hi` / `point < hi` (either operand order) where the
  * bounds are computed purely from the other side; extra conjuncts ride
  * along into the rewritten condition. If no such pair exists the marker
  * is simply stripped. Installed by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`; it self-disables by construction once applied
  * (the rewritten join carries no marker).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // top-level conjuncts only: a marker nested under OR etc. (contrary to
    // the AND-it API contract) is simply left in place — it is inert
    // constant-true, so the join still computes the documented result
    case j @ Join(_, _, Inner, Some(cond), _)
        if splitConjunctivePredicates(cond).exists(_.isInstanceOf[RangeBinHint]) =>
      rewrite(j).getOrElse(stripHints(j))
  }

  /** floor(e / bin) as a LongType bucket id (Floor on double yields long). */
  private def bucketOf(e: Expression, bin: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(bin, DoubleType), EvalMode.LEGACY))

  private def stripHints(j: Join): Join = {
    val kept = splitConjunctivePredicates(j.condition.get)
      .filterNot(_.isInstanceOf[RangeBinHint])
    j.copy(condition = kept.reduceOption(And).orElse(Some(Literal.TrueLiteral)))
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val hint = conjuncts.collectFirst { case h: RangeBinHint => h }.get
    val rest = conjuncts.filterNot(_.isInstanceOf[RangeBinHint])

    val bin = hint.bin.eval() match {
      case n: java.lang.Number => n.doubleValue()
      case _                   => return None
    }
    if (!(bin > 0) || bin.isInfinite) return None

    val p = hint.point
    if (!p.dataType.isInstanceOf[NumericType] || p.references.isEmpty) return None
    val pointIsLeft =
      if (p.references.subsetOf(j.left.outputSet)) true
      else if (p.references.subsetOf(j.right.outputSet)) false
      else return None
    val (pointPlan, intervalPlan) =
      if (pointIsLeft) (j.left, j.right) else (j.right, j.left)

    // a usable bound is numeric, deterministic, and computed purely from
    // the interval side (constants allowed)
    def boundOk(e: Expression): Boolean =
      e.dataType.isInstanceOf[NumericType] && e.deterministic &&
        e.references.subsetOf(intervalPlan.outputSet)

    val lower = rest.collectFirst {
      case GreaterThanOrEqual(l, lo) if l.semanticEquals(p) && boundOk(lo) => lo
      case GreaterThan(l, lo) if l.semanticEquals(p) && boundOk(lo)        => lo
      case LessThanOrEqual(lo, r) if r.semanticEquals(p) && boundOk(lo)    => lo
      case LessThan(lo, r) if r.semanticEquals(p) && boundOk(lo)           => lo
    }
    val upper = rest.collectFirst {
      case LessThanOrEqual(l, hi) if l.semanticEquals(p) && boundOk(hi)    => hi
      case LessThan(l, hi) if l.semanticEquals(p) && boundOk(hi)           => hi
      case GreaterThanOrEqual(hi, r) if r.semanticEquals(p) && boundOk(hi) => hi
      case GreaterThan(hi, r) if r.semanticEquals(p) && boundOk(hi)        => hi
    }
    (lower, upper) match {
      case (Some(lo), Some(hi)) =>
        val pBucket = Alias(bucketOf(p, bin), "graft_bucket_p")()
        val newPoint = Project(pointPlan.output :+ pBucket, pointPlan)
        // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED without a
        // timeZoneId even for purely-numeric sequences
        val loB = bucketOf(lo, bin)
        val hiB = bucketOf(hi, bin)
        val seq = Sequence(loB, hiB, Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
        // an empty/inverted interval (lo > hi — dirty data) matches nothing
        // in the unrewritten join; Sequence would THROW on inverted bounds,
        // so guard it to an empty bucket list (the row drops at the
        // explode, same zero matches). A finite-but-huge interval still
        // fails loudly inside Sequence (too-long sequence) rather than
        // ever producing wrong results — the bin-hint contract is that
        // bin is proportionate to the interval width.
        val buckets = If(LessThanOrEqual(loB, hiB), seq,
          Literal.create(Array.empty[Long], seq.dataType))
        val iBucket = AttributeReference("graft_bucket_i", LongType, nullable = false)()
        val newInterval =
          Generate(Explode(buckets), Nil, outer = false, None, Seq(iBucket), intervalPlan)
        val newCond = (rest :+ EqualTo(pBucket.toAttribute, iBucket)).reduce(And)
        val (nl, nr) = if (pointIsLeft) (newPoint, newInterval) else (newInterval, newPoint)
        Some(Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint)))
      case _ => None
    }
  }
}
