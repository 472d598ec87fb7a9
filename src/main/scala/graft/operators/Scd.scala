package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 history builder: collapse a change
  * log `(key, ts, attributes…)` into one validity interval per distinct
  * consecutive attribute version — the standard warehouse shape
  * `(key, attrs…, version, valid_from, valid_to, is_current)`. No-op
  * updates (consecutive rows with identical tracked attributes) extend
  * the current version instead of opening a new one; `valid_to` is the
  * next version's `valid_from` (half-open intervals), NULL on the
  * current version. The reference's analogue is the LSM's LWW version
  * chain (`kv/db.go` Get returns only the latest); SCD2 is what a
  * warehouse keeps instead of discarding the older versions.
  *
  * Scale shape: ONE hash exchange on `keys` total. The change-marker
  * window, the per-version aggregation (whose grouping keys are a
  * superset of the window partition keys), and the `valid_to` lead
  * window all reuse that same partitioning — pinned by PlanShapeSpec.
  * Cost is proportional to per-key change counts, the same contract as
  * any window function.
  */
object Scd {

  /** @param df       change log, one row per observed change event
    * @param keys     entity key columns
    * @param tsCol    change timestamp (integral or timestamp; ordering +
    *                 interval bounds)
    * @param tieCol   deterministic tie-break within equal `tsCol`
    * @param attrs    tracked attribute columns — a version is a maximal
    *                 run of consecutive rows with identical (null-safe)
    *                 values of these
    * @return one row per version: keys, attrs, `version` (1-based per
    *         key), `valid_from` (first ts of the run), `valid_to` (next
    *         version's valid_from; NULL = open), `is_current`,
    *         `n_events` (rows collapsed into the version)
    */
  def scd2(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
      attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val attrStruct = struct(attrs.map(col): _*)
    // null-safe: a NULL attr equals a NULL attr, so it does not re-open;
    // the first row's lag is a NULL struct, which <=> judges different
    // from any real struct, opening version 1
    val opens = when(!(lag(attrStruct, 1).over(w) <=> attrStruct), 1L)
      .otherwise(0L)
    val wLead = Window.partitionBy(keys.map(col): _*).orderBy(col("version"))
    df.withColumn("version", sum(opens).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys ++ attrs).map(col) :+ col("version"): _*)
      .agg(min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wLead))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ attrs).map(col) ++ Seq(col("version"),
        col("valid_from"), col("valid_to"), col("is_current"),
        col("n_events")): _*)
  }
}
