package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) joins — the non-equi join family Spark only executes
  * as a broadcast nested loop (quadratic in the worst case, and capped by
  * the broadcast size). Re-expressed as a BIN-bucketed equi-join: both
  * sides key on fixed-width time bins, intervals replicate to every bin
  * they cover, points hash to exactly ONE bin — the join is a plain
  * hash/sort-merge equi-join on the bin plus a residual predicate, so it
  * scales like any other keyed join (shuffle by bin, AQE skew handling,
  * no cross product).
  *
  * Each qualifying (point, interval) pair meets in exactly one reducer —
  * the point's bin, which the interval covers by construction — so no
  * dedup pass is needed.
  *
  * `binSize` tuning is the usual trade: bins much wider than the typical
  * interval waste residual-filter work; bins much narrower replicate
  * intervals too often. A degenerate interval (spanning millions of bins)
  * is the skew hazard — [[overflowIntervals]] surfaces offenders the same
  * way the dedup caps do, and `maxBinsPerInterval` fails the job loudly
  * (codegen'd `raise_error`, no driver pass) rather than letting one row
  * fan out unboundedly.
  */
object RangeJoin {

  /** The loud degenerate-interval guard shared by every binned builder:
    * the interval's start column, or a codegen'd `raise_error` when the
    * interval spans >= `maxBinsPerInterval` bins (one row must never fan
    * out unboundedly in silence).
    */
  private def guardedStart(op: String, startCol: String, endCol: String,
      binSize: Long, maxBinsPerInterval: Long) =
    if (maxBinsPerInterval > 0)
      when(
        floor(col(endCol) / binSize) - floor(col(startCol) / binSize) >= maxBinsPerInterval,
        raise_error(concat(
          lit(s"$op: interval spans >= $maxBinsPerInterval bins of $binSize ("),
          col(startCol), lit(".."), col(endCol),
          lit(") — widen binSize or split the interval"))))
      .otherwise(col(startCol))
    else col(startCol)

  /** Pairs every point row with every interval row whose
    * `[startCol, endCol]` (inclusive both ends) contains its `tCol`.
    * All columns of both inputs pass through; disambiguate upstream.
    * Columns must be integral (epoch-ms, versions, offsets...).
    *
    * `keys` are extra equi-join columns (present on BOTH sides) folded
    * into the shuffle key alongside the bin — a per-user temporal join
    * shuffles on (user, bin), not on bin alone, so reducers stay narrow
    * even when every user is active in every bin.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      binSize: Long,
      tCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1 << 20): DataFrame = {
    require(binSize > 0, "pointInInterval: binSize must be positive")
    val p = points.withColumn("__bin", floor(col(tCol) / binSize))
    val guarded = guardedStart("pointInInterval", startCol, endCol,
      binSize, maxBinsPerInterval)
    val iv = intervals
      .withColumn("__bin", explode(sequence(
        floor(guarded / binSize), floor(col(endCol) / binSize))))
    p.join(iv, keys :+ "__bin")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bin")
  }

  /** LEFT-OUTER [[pointInInterval]]: every point row survives — paired
    * with each containing interval, or null-extended on the interval's
    * columns when none contains it (the "events LEFT JOIN shifts" shape a
    * migrating user types in week one). Same scale story as the inner
    * form, with one structural difference: because each point hashes to
    * exactly ONE bin, the point side is never replicated, so a plain
    * left-outer hash/sort-merge equi-join on (keys, bin) — with the
    * containment predicate folded into the join condition, NOT a filter
    * above it — null-extends each unmatched point exactly once. No
    * anti-join complement pass, no dedup.
    *
    * The interval side's `keys` columns are dropped from the output (they
    * would be null on unmatched rows; the point side's copies are the
    * preserved ones) — everything else on both sides passes through.
    */
  def pointInIntervalLeft(
      points: DataFrame,
      intervals: DataFrame,
      binSize: Long,
      tCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1 << 20): DataFrame = {
    require(binSize > 0, "pointInIntervalLeft: binSize must be positive")
    val p = points.withColumn("__bin", floor(col(tCol) / binSize))
    val guarded = guardedStart("pointInIntervalLeft", startCol, endCol,
      binSize, maxBinsPerInterval)
    val iv = keys.foldLeft(
      intervals.withColumn("__ibin", explode(sequence(
        floor(guarded / binSize), floor(col(endCol) / binSize))))) {
      (df, k) => df.withColumnRenamed(k, s"__iv_$k")
    }
    val cond = (keys.map(k => col(k) === col(s"__iv_$k")) ++ Seq(
      col("__bin") === col("__ibin"),
      col(tCol) >= col(startCol), col(tCol) <= col(endCol))).reduce(_ && _)
    p.join(iv, cond, "left")
      .drop("__bin" +: "__ibin" +: keys.map(k => s"__iv_$k"): _*)
  }

  /** Interval-overlap join: pairs (l, r) where `[lStart, lEnd]` and
    * `[rStart, rEnd]` overlap (inclusive: `lStart <= rEnd AND rStart <=
    * lEnd`) — the interval×interval member of the family, which Spark
    * likewise only plans as a nested loop. Both sides replicate to their
    * covered bins and equi-join on (keys, bin); a pair sharing SEVERAL
    * bins would duplicate, so each pair is emitted only in its first
    * shared bin — `max(floor(lStart/b), floor(rStart/b))`, which any
    * overlapping pair covers on both sides by construction — keeping the
    * join dedup-free (no distinct pass over the output). Columns of both
    * inputs pass through; the degenerate-interval guard applies to BOTH
    * sides.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      binSize: Long,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1 << 20): DataFrame = {
    require(binSize > 0, "intervalOverlapJoin: binSize must be positive")
    def binned(df: DataFrame, s: String, e: String): DataFrame = {
      val guarded = guardedStart("intervalOverlapJoin", s, e,
        binSize, maxBinsPerInterval)
      df.withColumn("__bin", explode(sequence(
        floor(guarded / binSize), floor(col(e) / binSize))))
    }
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), keys :+ "__bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(
          floor(col(lStart) / binSize), floor(col(rStart) / binSize)))
      .drop("__bin")
  }

  /** LEFT-OUTER [[intervalOverlapJoin]]: every left interval survives —
    * paired with each overlapping right interval, or null-extended when
    * none overlaps. Unlike the point form, BOTH sides replicate to their
    * bins, so folding the predicate into an outer bin-join would
    * null-extend an unmatched left once PER BIN copy; instead this is the
    * inner binned core (exact, dedup-free) plus a LEFT-ANTI complement of
    * the left side against the same core's match keys — two keyed passes,
    * both equi-joins, still no cross product. The right side's `keys`
    * copies are dropped (the left's are the preserved ones).
    */
  def intervalOverlapJoinLeft(
      left: DataFrame,
      right: DataFrame,
      binSize: Long,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Long = 1 << 20): DataFrame = {
    require(binSize > 0, "intervalOverlapJoinLeft: binSize must be positive")
    withLeftComplement(left,
      intervalOverlapJoin(left, right, binSize,
        lStart, lEnd, rStart, rEnd, keys, maxBinsPerInterval),
      right, keys, keys :+ lStart :+ lEnd)
  }

  /** Left-outer closure over an inner binned join whose LEFT side
    * replicates: the inner result, plus left rows whose `matchCols`
    * (keys + the left's join operands) matched nothing, null-extended on
    * the right's non-key columns. `matchCols` — not the full row — is
    * the match identity: two left rows equal on it have identical match
    * sets, and rows with NULL operands match nothing on either path, so
    * they null-extend exactly as a nested-loop LEFT JOIN would. Both
    * passes are keyed equi-joins (the anti probe side is a distinct of
    * bounded match keys), so the scale shape survives. Note the binned
    * candidate pipeline evaluates twice — once for the output, once for
    * the match-key distinct; deliberately NOT cached (the
    * `minhashLshPairs` no-cache discipline: a lazy returned DataFrame
    * can never unpersist safely, and at 100 TB the intermediate would
    * not fit in cluster memory anyway).
    */
  private def withLeftComplement(left: DataFrame, inner: DataFrame,
      right: DataFrame, keys: Seq[String], matchCols: Seq[String]): DataFrame = {
    val rightOnly = right.columns.toSeq.filterNot(keys.contains)
    val outCols = left.columns.toSeq ++ rightOnly
    val unmatched = left.join(
      inner.select(matchCols.map(col): _*).distinct(), matchCols, "left_anti")
    val nullExtended = rightOnly.foldLeft(unmatched)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    inner.select(outCols.map(col): _*)
      .unionByName(nullExtended.select(outCols.map(col): _*))
  }

  /** Band join: pairs (l, r) with |l.`lCol` - r.`rCol`| <= delta —
    * the same bin trick with the left side probing its own bin and both
    * neighbors (a band of width delta can only reach adjacent bins when
    * `binSize >= delta`, which is enforced). Each qualifying pair meets
    * exactly once (the right row's bin is unique). Columns pass through;
    * `keys` as in [[pointInInterval]].
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      delta: Long,
      lCol: String,
      rCol: String,
      keys: Seq[String] = Nil,
      binSize: Long = 0L): DataFrame = {
    require(delta >= 0, "bandJoin: delta must be non-negative")
    val bin = if (binSize > 0) binSize else math.max(delta, 1L)
    require(bin >= delta, s"bandJoin: binSize $bin < delta $delta would miss pairs")
    val l = left.withColumn("__bin",
      explode(array(Seq(-1L, 0L, 1L).map(o => floor(col(lCol) / bin) + o): _*)))
    val r = right.withColumn("__bin", floor(col(rCol) / bin))
    l.join(r, keys :+ "__bin")
      .filter(abs(col(lCol) - col(rCol)) <= delta)
      .drop("__bin")
  }

  /** LEFT-OUTER [[bandJoin]]: every left row survives — paired with each
    * right row within `delta`, or null-extended when none is (orphan
    * detection: readings with no counterpart within the tolerance). The
    * left side replicates to ±1 neighbor bins, so this rides the same
    * [[withLeftComplement]] closure as the overlap form.
    */
  def bandJoinLeft(
      left: DataFrame,
      right: DataFrame,
      delta: Long,
      lCol: String,
      rCol: String,
      keys: Seq[String] = Nil,
      binSize: Long = 0L): DataFrame =
    withLeftComplement(left,
      bandJoin(left, right, delta, lCol, rCol, keys, binSize),
      right, keys, keys :+ lCol)

  /** The intervals [[pointInInterval]]'s loud guard would reject at this
    * `binSize` + `maxBinsPerInterval`: (start, end, n_bins), empty when
    * the guard is a no-op — the probe-before-run companion, same idiom as
    * `Dedup.simhashOverflowBands`.
    */
  def overflowIntervals(
      intervals: DataFrame,
      binSize: Long,
      startCol: String,
      endCol: String,
      maxBinsPerInterval: Long = 1 << 20): DataFrame =
    intervals.select(col(startCol), col(endCol),
        (floor(col(endCol) / binSize) - floor(col(startCol) / binSize) + 1).as("n_bins"))
      .filter(col("n_bins") > maxBinsPerInterval)
}
