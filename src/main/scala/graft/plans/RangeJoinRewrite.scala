package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Opt-in Catalyst optimizer rule: rewrites the two nested-loop-only
  * interval join families — point-in-interval `p.t >= iv.s AND
  * p.t <= iv.e` and interval overlap `l.s <= r.e AND r.s <= l.e` (any
  * strictness, either operand order), which Spark can only plan as a
  * broadcast nested loop or cartesian — into the bin-bucketed
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
  private val LBin = "__graft_lbin"
  private val RBin = "__graft_rbin"
  private val SyntheticBins = Set(PBin, IBin, LBin, RBin)

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
      .exists(a => SyntheticBins.contains(a.name))

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
    val equi = conjuncts.filter {
      case EqualTo(a, b) =>
        (fromSide(a, j.left) && fromSide(b, j.right)) ||
          (fromSide(a, j.right) && fromSide(b, j.left))
      case _ => false
    }
    val residual = conjuncts.filterNot(equi.contains)
    rewritePoint(j, conjuncts, equi, residual, bin)
      .orElse(rewriteOverlap(j, conjuncts, equi, residual, bin))
  }

  /** point-in-interval: `p >= s AND p <= e` with p on one side, s/e on
    * the other — the point projects its single bin, the interval side
    * replicates; each qualifying pair meets in exactly one reducer (the
    * point's bin), so no dedup is needed.
    */
  private def rewritePoint(j: Join, conjuncts: Seq[Expression],
      equi: Seq[Expression], residual: Seq[Expression], bin: Long)
      : Option[LogicalPlan] = {
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
      val pbin = Alias(binOf(pt, bin), PBin)()
      val pointBinned = Project(pointSide.output :+ pbin, pointSide)
      val (ibin, intervalBinned) = binGenerate(IBin, sExpr, eExpr, bin, intervalSide)
      val (newLeft, newRight) =
        if (ptOnLeft) (pointBinned, intervalBinned)
        else (intervalBinned, pointBinned)
      val newCond = (EqualTo(pbin.toAttribute, ibin) +: equi).reduce(And)
      val joined = Join(newLeft, newRight, Inner, Some(newCond), JoinHint.NONE)
      // residual includes the two bounds, so it is never empty
      Project(j.output, Filter(residual.reduce(And), joined))
    }
  }

  /** interval overlap: `lS <= rE AND rS <= lE` (any strictness/order) —
    * BOTH sides replicate to their covered bins, and since an overlapping
    * pair shares possibly many bins, only its FIRST shared bin
    * `max(floor(lS/b), floor(rS/b))` emits (the operator's dedup-free
    * trick, RangeJoin.intervalOverlapJoin): for any pair satisfying the
    * residual, `floor(lS) <= floor(lE)`-side coverage of that bin follows
    * from `lS <= lE or the residual's cross bounds`, symmetrically for
    * the right — so the pair meets there and nowhere else after the
    * first-shared-bin conjunct. Exact for strict bounds and malformed
    * (start > end) intervals alike: `sequence` covers the same bin range
    * in either direction and the residual is the original predicate.
    */
  private def rewriteOverlap(j: Join, conjuncts: Seq[Expression],
      equi: Seq[Expression], residual: Seq[Expression], bin: Long)
      : Option[LogicalPlan] = {
    def asLoHi(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThanOrEqual(a, b)    => Some((a, b))
      case LessThan(a, b)           => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b)        => Some((b, a))
      case _                        => None
    }
    val lohis = conjuncts.flatMap(c => asLoHi(c).map { case (lo, hi) => (lo, hi, c) })
    val found = (for {
      c1 <- lohis.iterator // lS <= rE
      c2 <- lohis.iterator // rS <= lE
      if c1._3 ne c2._3
      if sideOnly(c1._1, j.left) && sideOnly(c1._2, j.right) &&
        sideOnly(c2._1, j.right) && sideOnly(c2._2, j.left)
    } yield (c1, c2)).nextOption()
    found.map { case ((lS, rE, _), (rS, lE, _)) =>
      val (lbin, lGen) = binGenerate(LBin, lS, lE, bin, j.left)
      val (rbin, rGen) = binGenerate(RBin, rS, rE, bin, j.right)
      val newCond = (EqualTo(lbin, rbin) +: equi).reduce(And)
      val joined = Join(lGen, rGen, Inner, Some(newCond), JoinHint.NONE)
      val firstShared =
        EqualTo(lbin, Greatest(Seq(binOf(lS, bin), binOf(rS, bin))))
      Project(j.output, Filter((residual :+ firstShared).reduce(And), joined))
    }
  }

  /** Generate(explode(sequence(floor(s/bin), floor(e/bin)))) over `child`,
    * exposing the bin as `name`.
    */
  private def binGenerate(name: String, s: Expression, e: Expression,
      bin: Long, child: LogicalPlan): (Attribute, LogicalPlan) = {
    val explode = Explode(Sequence(binOf(s, bin), binOf(e, bin),
      None, Some(conf.sessionLocalTimeZone)))
    val el = explode.elementSchema.head
    val attr = AttributeReference(name, el.dataType, el.nullable)()
    (attr, Generate(explode, Nil, outer = false, None, Seq(attr), child))
  }
}
