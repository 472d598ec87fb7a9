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
