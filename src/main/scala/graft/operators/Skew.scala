package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at 100 TB scale. Spark's hash
  * aggregate already does map-side partial aggregation for algebraic
  * functions (sum/count/min/max), and AQE splits skewed SHUFFLE JOIN
  * partitions — the two places that still melt on hot keys are
  * count-distinct (all distinct values of a hot key shuffle to one
  * reducer) and non-AQE-eligible joins. These rewrites cover them.
  */
object Skew {

  /** count(DISTINCT valueCol) per key, two-phase: first reduce to the
    * distinct (key, value) pairs — a shuffle keyed on BOTH columns, so a
    * hot key's values spread over the cluster — then count per key.
    * Result is identical to `countDistinct`; only the shuffle shape
    * changes.
    */
  def distinctCountTwoPhase(df: DataFrame, keys: Seq[String], valueCol: String,
      resultName: String = "n_distinct"): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct() // phase 1: shuffle on (keys, value)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(resultName)) // phase 2: shuffle on keys, tiny rows

  /** Salted inner equi-join for a skewed LEFT side against a
    * non-broadcastable right side: left rows get a deterministic salt in
    * [0, saltFactor); the right side is replicated once per salt value, so
    * a hot key's rows land on `saltFactor` reducers instead of one.
    * Row-identical to `left.join(right, keys)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
