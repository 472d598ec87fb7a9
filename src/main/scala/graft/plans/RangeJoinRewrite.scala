package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType, StringType}

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
  * Join types: Inner for both families, plus LeftOuter/RightOuter and
  * LeftSemi/LeftAnti for point-in-interval when the preserved side is
  * the point side — "events LEFT JOIN shifts ON ... ts in range" keeps
  * unmatched events, and `[NOT] EXISTS (SELECT ... WHERE ts BETWEEN s
  * AND e)` (which the analyzer rewrites to a semi/anti join Spark would
  * plan as a nested loop) filters them. The point side is never
  * replicated, so the outer form null-extends each unmatched point
  * exactly once and the semi/anti forms cannot duplicate; the full
  * original condition moves into the join condition, since a Filter
  * above an outer join would drop the null-extended rows. Joins
  * carrying an explicit user hint are left
  * untouched (the user's strategy choice wins over the opt-in rule), and
  * `spark.graft.rangeJoin.maxBinsPerInterval` (default 2^20) ports the
  * operator API's loud degenerate-interval guard to the rewrite.
  *
  * Idempotency: the rewritten join's children expose the synthetic
  * `__graft_pbin`/`__graft_ibin` columns; the rule skips any join whose
  * inputs already carry them (filter-pushback folds the residual back
  * into the join condition inside the fixed-point batch, so a tag-free
  * re-match guard is required).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeConf = "spark.graft.rangeJoin.binSize"
  val MaxBinsConf = "spark.graft.rangeJoin.maxBinsPerInterval"
  private val DefaultMaxBins = 1L << 20
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
      // A user-supplied join hint (/*+ BROADCAST */ etc.) is an explicit
      // strategy choice — the rule steps aside rather than discarding it.
      case j @ Join(_, _, jt, Some(cond), JoinHint.NONE)
          if supportedType(jt) && !alreadyRewritten(j) =>
        rewrite(j, cond, binSize).getOrElse(j)
    }
  }

  /** Inner, plus the types whose PRESERVED side can be the point side:
    * outer (the non-replicated side null-extends exactly once per
    * unmatched row), and semi/anti — the `[NOT] EXISTS (... t BETWEEN s
    * AND e)` SQL shape, which Spark otherwise plans as a semi/anti
    * nested loop; only the non-replicated left survives into the output,
    * so binning cannot duplicate it. Overlap rewrites stay Inner-only:
    * both sides replicate there, so a preserved row would emit once per
    * bin copy.
    */
  private def supportedType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
    case _ => false
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
    // band-join SQL (`abs(x - y) <= d`) derives its two bounds so the
    // standard pair machinery sees a point-in-interval; the ORIGINAL abs
    // conjunct stays in the residual, so exactness is untouched
    val withBands = conjuncts ++ conjuncts.flatMap(expandAbsBand)
    rewritePoint(j, withBands, equi, residual, bin)
      .orElse(if (j.joinType == Inner)
        rewriteOverlap(j, conjuncts, equi, residual, bin) else None)
  }

  /** `abs(x - y) <= d` (either operand order of the comparison, both
    * strictnesses) expands to `x >= y - d AND x <= y + d` — both bounds
    * on ONE point expression, which is what the (lower, upper) pairing
    * needs. `d` may be any expression; side/type eligibility is decided
    * by the standard `sideOnly` checks downstream.
    */
  private def expandAbsBand(c: Expression): Seq[Expression] = c match {
    case LessThanOrEqual(Abs(Subtract(x, y, _), _), d) =>
      Seq(GreaterThanOrEqual(x, Subtract(y, d)), LessThanOrEqual(x, Add(y, d)))
    case LessThan(Abs(Subtract(x, y, _), _), d) =>
      Seq(GreaterThan(x, Subtract(y, d)), LessThan(x, Add(y, d)))
    case GreaterThanOrEqual(d, Abs(Subtract(x, y, _), _)) =>
      Seq(GreaterThanOrEqual(x, Subtract(y, d)), LessThanOrEqual(x, Add(y, d)))
    case GreaterThan(d, Abs(Subtract(x, y, _), _)) =>
      Seq(GreaterThan(x, Subtract(y, d)), LessThan(x, Add(y, d)))
    case _ => Nil
  }

  /** point-in-interval: `p >= s AND p <= e` with p on one side, s/e on
    * the other — the point projects its single bin, the interval side
    * replicates; each qualifying pair meets in exactly one reducer (the
    * point's bin), so no dedup is needed.
    *
    * Outer forms: because the point side is NEVER replicated, a
    * LeftOuter join whose preserved (left) side is the point side — or a
    * RightOuter whose preserved (right) side is — rewrites to the same
    * binned join with the SAME outer type, provided the ENTIRE original
    * condition moves into the join condition (a Filter above an outer
    * join would eat the null-extended rows). Each unmatched point then
    * null-extends exactly once, matching the nested-loop semantics. A
    * LeftOuter preserving the INTERVAL side is not rewritten (the
    * interval side replicates, so unmatched intervals would null-extend
    * once per bin).
    */
  private def rewritePoint(j: Join, conjuncts: Seq[Expression],
      equi: Seq[Expression], residual: Seq[Expression], bin: Long)
      : Option[LogicalPlan] = {
    val all = conjuncts.flatMap(readings(_, j.left, j.right))
    // first (lower, upper) pair agreeing on the point expression and side,
    // drawn from two distinct conjuncts; for outer joins, only pairs
    // whose point side is the PRESERVED side qualify
    def preservedOk(ptOnLeft: Boolean): Boolean = j.joinType match {
      case Inner                => true
      case LeftOuter            => ptOnLeft
      case RightOuter           => !ptOnLeft
      case LeftSemi | LeftAnti  => ptOnLeft
      case _                    => false
    }
    val pair = (for {
      lo <- all.iterator if lo._4
      hi <- all.iterator if !hi._4
      if (lo._5 ne hi._5) && lo._3 == hi._3 && lo._1.semanticEquals(hi._1)
      if preservedOk(lo._3)
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
      val binEq = EqualTo(pbin.toAttribute, ibin)
      j.joinType match {
        case Inner =>
          val newCond = (binEq +: equi).reduce(And)
          val joined = Join(newLeft, newRight, Inner, Some(newCond), JoinHint.NONE)
          // residual includes the two bounds, so it is never empty
          Project(j.output, Filter(residual.reduce(And), joined))
        case other => // LeftOuter / RightOuter / LeftSemi / LeftAnti
          // every original conjunct joins the bin equality INSIDE the
          // join condition (a Filter above would break outer null
          // extension and anti complements alike); ExtractEquiJoinKeys
          // still finds (bin, equi) as keys, the bounds ride along as
          // the join's extra condition
          val newCond = (binEq +: equi ++: residual).reduce(And)
          Project(j.output,
            Join(newLeft, newRight, other, Some(newCond), JoinHint.NONE))
      }
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
    * exposing the bin as `name` — with the operator API's loud
    * degenerate-interval guard (RangeJoin.guardedStart): an interval
    * spanning >= `spark.graft.rangeJoin.maxBinsPerInterval` bins (default
    * 2^20; <= 0 disables) raises a codegen'd error naming the offending
    * bounds instead of silently replicating one row to millions of bins
    * (the classic symptom: a units mismatch between the binSize conf and
    * the column). The guard runs post-analysis, so it is typed by hand:
    * RaiseError is NullType and is Cast to the bin's LongType to keep the
    * If well-formed without the analyzer's coercion.
    */
  private def binGenerate(name: String, s: Expression, e: Expression,
      bin: Long, child: LogicalPlan): (Attribute, LogicalPlan) = {
    val maxBins =
      try conf.getConfString(MaxBinsConf, DefaultMaxBins.toString).toLong
      catch { case _: NumberFormatException => DefaultMaxBins }
    val startBin = binOf(s, bin)
    val endBin = binOf(e, bin)
    val tz = Some(conf.sessionLocalTimeZone)
    val guardedStart =
      if (maxBins > 0) {
        val msg = Concat(Seq(
          Literal(s"RangeJoinRewrite: interval spans >= $maxBins bins of $bin ("),
          Cast(s, StringType, tz), Literal(".."), Cast(e, StringType, tz),
          Literal(s") — widen $BinSizeConf or raise $MaxBinsConf")))
        If(GreaterThanOrEqual(Subtract(endBin, startBin), Literal(maxBins)),
          Cast(RaiseError(msg), LongType, tz), startBin)
      } else startBin
    val explode = Explode(Sequence(guardedStart, endBin, None, tz))
    val el = explode.elementSchema.head
    val attr = AttributeReference(name, el.dataType, el.nullable)()
    (attr, Generate(explode, Nil, outer = false, None, Seq(attr), child))
  }
}
