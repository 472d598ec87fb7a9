package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing ("gaps and islands"): merge the overlapping or
  * touching closed intervals of each key into maximal disjoint islands.
  * The classic uses — session coverage, outage windows, validity-range
  * normalization — all reduce to this one operator.
  *
  * Scale shape: ONE hash shuffle on the keys, one sort per partition.
  * Both window passes (the running max and the running island sum) share
  * the same partitioning + ordering, so they plan as adjacent Window
  * operators over one exchange; the island grouping keys are a SUPERSET
  * of the window partition keys, so the final aggregation reuses the same
  * partitioning (no second exchange — pinned by PlanShapeSpec). Nothing
  * here is proportional to anything but the per-key interval count, so
  * the plan survives a 100 TB fact table as long as single keys fit a
  * partition — the same contract as any window function.
  */
object Intervals {

  /** One row per maximal island: keys, `island` ordinal (1-based per key),
    * `island_start`, `island_end`, `n_merged`. Intervals are CLOSED:
    * `[s, e]` with `s <= e`; an interval starting exactly at the current
    * island's max end merges into it (use `e - 1` upstream for half-open
    * semantics). Rows with NULL start or end are dropped — a NULL bound
    * has no interval semantics.
    */
  def coalesce(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String): DataFrame = {
    require(keys.nonEmpty, "interval coalesce needs at least one key")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(startCol), col(endCol))
    // strictly-preceding running max end: NULL marks each key's first row
    val prevMaxEnd = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.filter(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__new_island",
        when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("__new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keys.map(col) :+ col("island"): _*)
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_merged"))
  }

  /** Interval-set SUBTRACTION per key: the maximal disjoint spans covered
    * by at least one `left` interval and NO `right` interval (uptime
    * minus maintenance, coverage minus outages). Closed integral
    * intervals on both sides; output `(keys..., seg_start, seg_end)`
    * closed, ordered disjoint per key.
    */
  def subtract(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String): DataFrame =
    sweep(left, right, keys, lStart, lEnd, rStart, rEnd,
      (covL, covR) => covL > 0 && covR === 0)

  /** Interval-set INTERSECTION per key: the maximal disjoint spans
    * covered by BOTH some `left` and some `right` interval. Same sweep,
    * same contract as [[subtract]].
    */
  def intersect(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String): DataFrame =
    sweep(left, right, keys, lStart, lEnd, rStart, rEnd,
      (covL, covR) => covL > 0 && covR > 0)

  /** The boundary sweep shared by the set-algebra ops, still ONE hash
    * shuffle: every interval contributes a +1 boundary at `s` and a -1 at
    * `e + 1` (closed -> half-open), tagged by side; one window pass over
    * (keys) ordered by position accumulates both running coverages; the
    * LAST row of each position group carries the complete totals at that
    * position and spans the segment to the next distinct position; kept
    * segments merge into maximal spans with the islands trick. Every
    * window and the final aggregation reuse the single
    * hashpartitioning(keys) exchange (the same superset-grouping property
    * [[coalesce]] pins); nothing is proportional to anything but the
    * per-key boundary count.
    */
  private def sweep(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      keep: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): DataFrame = {
    require(keys.nonEmpty, "interval set algebra needs at least one key")
    val kcols = keys.map(col)
    def bounds(df: DataFrame, s: String, e: String, isLeft: Boolean) = {
      val (dl, dr) = if (isLeft) (1L, 0L) else (0L, 1L)
      df.filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
        .select(kcols :+ explode(array(
          struct(col(s).cast("long").as("pos"),
            lit(dl).as("dl"), lit(dr).as("dr")),
          struct((col(e).cast("long") + 1L).as("pos"),
            lit(-dl).as("dl"), lit(-dr).as("dr")))).as("b"): _*)
        .select(kcols :+ col("b.pos") :+ col("b.dl") :+ col("b.dr"): _*)
    }
    val w = Window.partitionBy(kcols: _*).orderBy(col("pos"))
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    val prevQual = lag(col("__qual"), 1).over(w)
    bounds(left, lStart, lEnd, isLeft = true)
      .unionByName(bounds(right, rStart, rEnd, isLeft = false))
      .withColumn("__covL", sum(col("dl")).over(run))
      .withColumn("__covR", sum(col("dr")).over(run))
      .withColumn("__next_pos", lead(col("pos"), 1).over(w))
      // last row of each position group: totals include every delta here,
      // and the segment runs to the next DISTINCT position (the partition's
      // final boundary has all-zero coverage, so dropping it is exact)
      .filter(col("__next_pos").isNull || col("__next_pos") =!= col("pos"))
      .withColumn("__qual",
        col("__next_pos").isNotNull && keep(col("__covL"), col("__covR")))
      .withColumn("__new_island",
        when(col("__qual") && (prevQual.isNull || !prevQual), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new_island")).over(run))
      .filter(col("__qual"))
      .groupBy(kcols :+ col("__island"): _*)
      .agg(min(col("pos")).as("seg_start"),
        (max(col("__next_pos")) - 1L).as("seg_end"))
      .drop("__island")
  }

  /** The complement: one row per GAP between consecutive islands of a key
    * (`gap_start` = previous island's end, `gap_end` = next island's
    * start, both exclusive of covered time). Empty for keys with one
    * island.
    */
  def gaps(df: DataFrame, keys: Seq[String], startCol: String,
      endCol: String): DataFrame = {
    val islands = coalesce(df, keys, startCol, endCol)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("island"))
    islands
      .withColumn("gap_start", lag(col("island_end"), 1).over(w))
      .filter(col("gap_start").isNotNull)
      .select(keys.map(col) :+ col("gap_start") :+
        col("island_start").as("gap_end"): _*)
  }
}
