package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Opt-in Catalyst optimizer rule: rewrites point-in-interval INNER joins
  * — `p.t >= iv.s AND p.t <= iv.e` (any strictness), which Spark can only
  * plan as a broadcast nested loop or cartesian — into the bin-bucketed
  * equi-join [[graft.operators.RangeJoin.pointInInterval]] certifies:
  * intervals replicate to every fixed-width bin they cover (Generate over
  * `sequence`), points hash to exactly one bin, and the join becomes a
  * plain equi-join on (equi keys..., bin) with the ORIGINAL predicates
  * kept verbatim as a residual filter — so the rewrite is exact by
  * construction for every bound strictness, null, and malformed-interval
  * (s > e) case: binning only ever OVER-approximates the match set and
  * the untouched residual trims it.
  *
  * Activation: set `spark.graft.rangeJoin.binSize` (integral units of the
  * joined columns, e.g. ms) — unset/0 leaves every plan alone. The bin
  * width is the operator's usual trade (wide = residual waste, narrow =
  * replication); there is no safe universal default, which is why this is
  * a session knob and not always-on. SQL users then get the scale-safe
  * plan with no API change:
  *
  *   SET spark.graft.rangeJoin.binSize=3600000;
  *   SELECT ... FROM events e JOIN shifts s
  *     ON e.user_id = s.user_id AND e.ts_ms >= s.start_ms
  *                              AND e.ts_ms <  s.end_ms
  *
  * Equality conjuncts join alongside the bin — the shuffle key is
  * (keys..., bin), the same narrow-reducer shape as the operator API.
  * Registered via `GraftExtensions` (config route `injectOptimizerRule`
  * and the runtime `spark.experimental.extraOptimizations` path).
  *
  * Idempotency: the rewritten join's children expose the synthetic
  * `__graft_pbin`/`__graft_ibin` columns; the rule skips any join whose
  * inputs already carry them (filter-pushback folds the residual back
  * into the join condition inside the fixed-point batch, so a tag-free
  * re-match guard is required).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeConf = "spark.graft.rangeJoin.binSize"
  private val PBin = "__graft_pbin"
  private val IBin = "__graft_ibin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize =
      try conf.getConfString(BinSizeConf, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (binSize <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) if !alreadyRewritten(j) =>
        rewrite(j, cond, binSize).getOrElse(j)
    }
  }

  private def alreadyRewritten(j: Join): Boolean =
    (j.left.output.iterator ++ j.right.output.iterator)
      .exists(a => a.name == PBin || a.name == IBin)

  /** floor(e / binSize) — the operator's exact bin expression (double
    * floor-division: correct for negatives, exact to |v| < 2^53).
    */
  private def binOf(e: Expression, bin: Long): Expression =
    Floor(Divide(Cast(e, DoubleType, Some(conf.sessionLocalTimeZone)),
      Literal(bin.toDouble)))

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  /** bound/point operands must additionally be integral — the bin
    * arithmetic (floor-divide + sequence) is defined on integral units.
    */
  private def sideOnly(e: Expression, side: LogicalPlan): Boolean =
    fromSide(e, side) && (e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })

  /** (point, bound, pointOnLeft, isLower) readings of one comparison —
    * each inequality bounds either operand, so both views are emitted and
    * the pairing phase keeps whichever completes a (lower, upper) pair on
    * one point expression.
    */
  private def readings(c: Expression, left: LogicalPlan, right: LogicalPlan)
      : Seq[(Expression, Expression, Boolean, Boolean, Expression)] = {
    def views(pt: Expression, bd: Expression, isLower: Boolean) = {
      val ptLeft = sideOnly(pt, left) && sideOnly(bd, right)
      val ptRight = sideOnly(pt, right) && sideOnly(bd, left)
      if (ptLeft || ptRight) Seq((pt, bd, ptLeft, isLower, c)) else Nil
    }
    c match {
      case GreaterThanOrEqual(a, b) => views(a, b, true) ++ views(b, a, false)
      case GreaterThan(a, b)        => views(a, b, true) ++ views(b, a, false)
      case LessThanOrEqual(a, b)    => views(a, b, false) ++ views(b, a, true)
      case LessThan(a, b)           => views(a, b, false) ++ views(b, a, true)
      case _                        => Nil
    }
  }

  private def rewrite(j: Join, cond: Expression, bin: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val all = conjuncts.flatMap(readings(_, j.left, j.right))
    // first (lower, upper) pair agreeing on the point expression and side,
    // drawn from two distinct conjuncts
    val pair = (for {
      lo <- all.iterator if lo._4
      hi <- all.iterator if !hi._4
      if (lo._5 ne hi._5) && lo._3 == hi._3 && lo._1.semanticEquals(hi._1)
    } yield (lo, hi)).nextOption()
    pair.map { case ((pt, sExpr, ptOnLeft, _, _), (_, eExpr, _, _, _)) =>
      val (pointSide, intervalSide) =
        if (ptOnLeft) (j.left, j.right) else (j.right, j.left)
      val equi = conjuncts.filter {
        case EqualTo(a, b) =>
          (fromSide(a, j.left) && fromSide(b, j.right)) ||
            (fromSide(a, j.right) && fromSide(b, j.left))
        case _ => false
      }
      val residual = conjuncts.filterNot(equi.contains)

      val pbin = Alias(binOf(pt, bin), PBin)()
      val pointBinned = Project(pointSide.output :+ pbin, pointSide)
      val explode = Explode(Sequence(binOf(sExpr, bin), binOf(eExpr, bin),
        None, Some(conf.sessionLocalTimeZone)))
      val el = explode.elementSchema.head
      val ibin = AttributeReference(IBin, el.dataType, el.nullable)()
      val intervalBinned =
        Generate(explode, Nil, outer = false, None, Seq(ibin), intervalSide)

      val (newLeft, newRight) =
        if (ptOnLeft) (pointBinned, intervalBinned)
        else (intervalBinned, pointBinned)
      val newCond = (EqualTo(pbin.toAttribute, ibin) +: equi).reduce(And)
      val joined = Join(newLeft, newRight, Inner, Some(newCond), JoinHint.NONE)
      // residual includes the two bounds, so it is never empty
      Project(j.output, Filter(residual.reduce(And), joined))
    }
  }
}
