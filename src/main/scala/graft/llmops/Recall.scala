package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-visible recall gates for the approximate operators (LSH / IVF /
  * MinHash / SimHash banding).
  *
  * Rows-only checks can't catch a recall regression — a change that
  * returns 50 *wrong* neighbors stays green. Each gate query computes the
  * approximate result AND its exact baseline inside one plan, reduces to a
  * single `(gate, floor_met)` row, and is oracled against the constant
  * `SELECT '<gate>', true` — so a regression that drops recall below the
  * floor turns a driver CORRECTNESS row red instead of passing silently.
  *
  * The floors are deliberately below the measured values (regression
  * tripwires, not tight bounds); the spec suites assert the tighter
  * measured floors.
  */
object Recall {

  /** One-row gate: |approx ∩ exact| / |exact| >= floor over `keys`.
    * An empty exact baseline yields NULL (≠ true ⇒ red row) — a gate
    * whose ground truth vanished should fail loudly, not certify.
    */
  def gate(approx: DataFrame, exact: DataFrame, keys: Seq[String],
      floor: Double, name: String): DataFrame = {
    val a = approx.select(keys.map(col): _*).dropDuplicates(keys)
    val e = exact.select(keys.map(col): _*).dropDuplicates(keys)
    val found = a.join(e, keys, "left_semi")
      .agg(count(lit(1)).cast("double").as("__found"))
    val total = e.agg(count(lit(1)).cast("double").as("__total"))
    found.crossJoin(total).select(
      lit(name).as("gate"),
      when(col("__total") > 0.0, col("__found") / col("__total") >= floor)
        .as("floor_met"))
  }
}
