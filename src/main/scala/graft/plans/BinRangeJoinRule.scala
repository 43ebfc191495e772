package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a NAIVE range join — an inner join
  * whose only cross-side predicates are interval bounds, the query a
  * user writes as `points.join(intervals, $"p" >= $"lo" && $"p" <=
  * $"hi")` — into the binned-replication equi-join
  * [[graft.operators.RangeJoin]] implements by hand. Without an
  * equi-key Spark can only plan BroadcastNestedLoopJoin (or a
  * cartesian): every point row meets every interval row — the cliff a
  * 100 TB query walks off silently. The rewrite:
  *
  *   - intervals side: explode `sequence(bin(lo), bin(hi))` — each
  *     interval replicates into the ceil(len/w)+1 bins it spans;
  *   - points side: project `bin(p)`;
  *   - join gains the `__graft_bin` equi-key; the ORIGINAL bounds stay
  *     as the exact residual, so semantics are unchanged (a pair
  *     co-occurs in exactly the one bin holding the point).
  *
  * Bins use exact integer floor division ((x − pmod(x, w)) div w — the
  * IntMath.floordiv construction at Expression level), so negative
  * values bin consistently on both sides. `w` comes from
  * `spark.graft.rangejoin.binWidth` (default 1024; 0 disables).
  *
  * Scope guards (bail = leave the plan untouched, never break a query):
  *   - inner joins only, both bound predicates LongType;
  *   - no existing cross-side equi-predicate (then Spark already plans
  *     a hash join with the range as residual — nothing to fix);
  *   - point expression references exactly one side, both bounds the
  *     other (either orientation);
  *   - idempotent: the rewritten join HAS an equi-key, so a rerun of
  *     the fixpoint batch skips it by the guard above.
  *
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`) —
  * the custom-Rule tier of the extension ladder, used exactly where
  * the declarative API cannot express the fix (a user's join shape is
  * not ours to rewrite at the DataFrame level). */
object BinRangeJoinRule extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangejoin.binWidth"
  val MaxBinsKey = "spark.graft.rangejoin.maxBinsPerInterval"
  private val BinCol = "__graft_bin"

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Floor division at Expression level, the [[graft.functions.IntMath
    * .floordiv]] construction: truncating IntegralDivide minus one when
    * the remainder is negative. NOT the subtract-pmod form — e − pmod(e,
    * w) underflows Long.MinValue-adjacent values for non-power-of-two
    * widths and silently mis-bins the row (missed matches). */
  private def binOf(e: Expression, w: Long): Expression = {
    val q = IntegralDivide(e, Literal(w))
    val negRem = LessThan(Remainder(e, Literal(w)), Literal(0L))
    Subtract(q, If(negRem, Literal(1L), Literal(0L)))
  }

  /** (point, lo, hi, pointsOnLeft) when the condition is a pure
    * interval containment between the two sides. */
  private def extractRange(preds: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    // cross-side lower/upper bounds keyed by the point expression
    var lower = Map.empty[(Expression, Boolean), Expression]
    var upper = Map.empty[(Expression, Boolean), Expression]
    preds.foreach {
      case GreaterThanOrEqual(a, b) => (sideOf(a), sideOf(b)) match {
        case (Some(sa), Some(sb)) if sa != sb =>
          lower += ((a.canonicalized, sa) -> b)
        case _ => ()
      }
      case LessThanOrEqual(a, b) => (sideOf(a), sideOf(b)) match {
        case (Some(sa), Some(sb)) if sa != sb =>
          upper += ((a.canonicalized, sa) -> b)
        case _ => ()
      }
      case GreaterThan(a, b) => (sideOf(a), sideOf(b)) match {
        case (Some(sa), Some(sb)) if sa != sb =>
          lower += ((a.canonicalized, sa) -> b)
        case _ => ()
      }
      case LessThan(a, b) => (sideOf(a), sideOf(b)) match {
        case (Some(sa), Some(sb)) if sa != sb =>
          upper += ((a.canonicalized, sa) -> b)
        case _ => ()
      }
      case _ => ()
    }
    val keys = lower.keySet.intersect(upper.keySet)
    keys.collectFirst {
      case k @ (_, pointsOnLeft)
        if lower(k).dataType == LongType && upper(k).dataType == LongType =>
          // recover the un-canonicalized point expression of this key
          val point = preds.collectFirst {
            case GreaterThanOrEqual(a, _) if a.canonicalized == k._1 => a
            case GreaterThan(a, _) if a.canonicalized == k._1 => a
          }.get
          (point, lower(k), upper(k), pointsOnLeft)
    }.filter(_._1.dataType == LongType)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinWidthKey, "1024").toLong
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved &&
            !left.output.exists(_.name == BinCol) &&
            !right.output.exists(_.name == BinCol) =>
        val preds = splitConj(cond)
        val hasEqui = preds.exists {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet) &&
              a.references.nonEmpty && b.references.nonEmpty) ||
            (b.references.subsetOf(left.outputSet) &&
              a.references.subsetOf(right.outputSet) &&
              a.references.nonEmpty && b.references.nonEmpty)
          case EqualNullSafe(_, _) => true
          case _ => false
        }
        if (hasEqui) j
        else extractRange(preds, left, right) match {
          case None => j
          case Some((point, lo, hi, pointsOnLeft)) =>
            val (points, intervals) = if (pointsOnLeft) (left, right)
              else (right, left)
            // points: one projected bin
            val pBin = Alias(binOf(point, w), BinCol)()
            val pPlan = Project(points.output :+ pBin, points)
            // intervals: replicate into every spanned bin
            // Sequence is TimeZoneAwareExpression — without an explicit
            // timeZoneId it reports unresolved and the optimizer's plan
            // validator rejects the rewrite (irrelevant for LongType
            // bounds, but resolution demands it regardless).
            // INVERTED intervals (lo > hi) guard: the original query
            // returns zero matches for such a row; Sequence would THROW
            // ('Illegal sequence boundaries') — an optimizer rule must
            // never change failure behavior, so clamp to an empty array
            // (explode of empty = row contributes nothing, as before).
            // WIDE intervals: one lo=0/hi=10^12 row would make Sequence
            // build a ~10^9-element array (throw or OOM where the
            // original BNLJ merely ran slow) — refuse LOUDLY with the
            // remediation in the message instead of letting the
            // replication blow up an executor mid-job.
            val maxBins = conf.getConfString(MaxBinsKey, "1048576").toLong
            val arrTy = org.apache.spark.sql.types.ArrayType(LongType, false)
            val binLo = binOf(lo, w)
            val binHi = binOf(hi, w)
            val tooWide = Cast(new RaiseError(Literal(
              s"BinRangeJoinRule: an interval spans more than $maxBins " +
                s"bins at binWidth=$w — raise $BinWidthKey, raise " +
                s"$MaxBinsKey, or set $BinWidthKey=0 to keep the " +
                "unrewritten nested-loop plan")), arrTy)
            val gen = Explode(If(GreaterThan(binLo, binHi),
              Literal.create(Array.empty[Long], arrTy),
              // guard on the BIN COUNT (hi - lo + 1), not the difference:
              // the difference allowed maxBins + 1 bins, one more than
              // the config and the error message state
              If(GreaterThan(Add(Subtract(binHi, binLo), Literal(1L)),
                Literal(maxBins)),
                tooWide,
                new Sequence(binLo, binHi, Some(Literal(1L)),
                  Some(conf.sessionLocalTimeZone)))))
            val iAttr = AttributeReference(BinCol, LongType, nullable = false)()
            val iPlan = Generate(gen, unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(iAttr), intervals)
            val newCond = And(cond, EqualTo(pBin.toAttribute, iAttr))
            val (nl, nr) = if (pointsOnLeft) (pPlan, iPlan) else (iPlan, pPlan)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
    }
  }
}
