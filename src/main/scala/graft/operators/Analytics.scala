package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a keyed, timestamped stream — the
  * funnel/cohort family every product-analytics engine ships, expressed
  * with the one-shuffle discipline (reference anchor: the engine's
  * ordered keyspace scan, `kv/lsm/iterator.go:303-366`, is the same
  * sorted-per-key pass these operators ride).
  *
  * Scale shape: [[funnelStages]] computes EVERY stage frontier inside a
  * single window pass over one sort on (keys, ts, tie) — funnel depth
  * adds projections, never self-joins, so a 10-stage funnel over 100 TB
  * of events still pays exactly one shuffle. [[cohortRetention]] is a
  * (key, period) hash agg, a per-key window that reuses the agg's
  * partitioning, and the final cohort roll-up — two shuffles total.
  */
object Analytics {

  /** Per-entity stage-completion timestamps for an ORDERED funnel: stage
    * i completes at the earliest event satisfying `stages(i)` at-or-after
    * stage i-1's completion (ties on ts broken by `tieCol` for a total
    * order), with every stage past the first bounded to `horizonMs` of
    * stage 0 when given. Output: the input keys plus one nullable
    * `<name>_ts` column per stage (the running frontier, per entity).
    *
    * Value-predicate semantics (>= on timestamps, not row order) make the
    * result engine-replayable — the q_funnel oracle replays it in SQL.
    */
  def funnelStages(
      events: DataFrame,
      stages: Seq[(String, Column)],
      keys: Seq[String],
      tsCol: String = "ts_ms",
      tieCol: String = "event_id",
      horizonMs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnelStages: at least one stage")
    require(keys.nonEmpty, "funnelStages: at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withFrontiers = stages.zipWithIndex.foldLeft(events) {
      case (df, ((name, pred), i)) =>
        val gate =
          if (i == 0) pred
          else {
            val afterPrev = pred && col(tsCol) >= col(s"${stages(i - 1)._1}_ts")
            horizonMs.fold(afterPrev)(h =>
              afterPrev && col(tsCol) - col(s"${stages.head._1}_ts") <= h)
          }
        df.withColumn(s"${name}_ts", min(when(gate, col(tsCol))).over(w))
    }
    val frontierCols = stages.map { case (n, _) => max(col(s"${n}_ts")).as(s"${n}_ts") }
    withFrontiers.groupBy(keys.map(col): _*)
      .agg(frontierCols.head, frontierCols.tail: _*)
  }

  /** Stage-membership bitmask: bit i set iff the row satisfies
    * `stages(i)` — how arbitrary (possibly overlapping) stage predicates
    * cross the typed boundary into
    * [[graft.streaming.EventStream.funnelStream]]'s state function.
    */
  def stageBits(stages: Seq[Column]): Column = {
    require(stages.nonEmpty && stages.length <= 62,
      "stageBits: 1 to 62 stages")
    stages.zipWithIndex
      .map { case (p, i) => when(p, lit(1L << i)).otherwise(lit(0L)) }
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Funnel conversion counts: one row, `n_<stage>` = entities whose
    * frontier reached that stage (monotone non-increasing by
    * construction).
    */
  def funnelCounts(
      events: DataFrame,
      stages: Seq[(String, Column)],
      keys: Seq[String],
      tsCol: String = "ts_ms",
      tieCol: String = "event_id",
      horizonMs: Option[Long] = None): DataFrame = {
    val per = funnelStages(events, stages, keys, tsCol, tieCol, horizonMs)
    val counts = stages.map { case (n, _) =>
      sum(when(col(s"${n}_ts").isNotNull, 1L).otherwise(0L)).as(s"n_$n") }
    per.agg(counts.head, counts.tail: _*)
  }

  /** Cohort retention: entities grouped by first-active period, counted
    * at each period offset they return. Output:
    * `(cohort_period, period_offset, n_entities)` with periods =
    * `floor(ts / periodMs)`.
    */
  def cohortRetention(
      events: DataFrame,
      keyCol: String,
      tsCol: String = "ts_ms",
      periodMs: Long = 604800000L): DataFrame = {
    require(periodMs > 0, "cohortRetention: periodMs must be positive")
    val perPeriod = events
      .groupBy(col(keyCol), (col(tsCol) / lit(periodMs)).cast("long").as("period"))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(keyCol))
    perPeriod
      .withColumn("cohort_period", min(col("period")).over(w))
      .select(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_entities"))
  }
}
