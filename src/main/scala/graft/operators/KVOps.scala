package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's storage-dataflow operators (SURVEY §2) generalized to
  * arbitrary DataFrames: any table with (key..., version) columns gets the
  * same merge semantics the LSM engine applies to its log.
  *
  * All operators are single-shuffle (one window or one aggregation on the
  * key) and stay inside whole-stage codegen — at 100 TB the LWW resolve is
  * one shuffle on the key columns, which AQE will skew-split if needed.
  */
object KVOps {

  /** Last-writer-wins resolution (reference MergeIterator dedup,
    * `kv/lsm/iterator.go:357-366`): keep the newest row per key. Ties on
    * `versionCols` are broken by the trailing tie-break columns, so pass a
    * unique id last for determinism.
    */
  def lwwResolve(df: DataFrame, keyCols: Seq[String], versionCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(versionCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Visibility filter applied AFTER LWW resolution (reference
    * `kv/db.go:114-130`): drop rows whose newest version is a tombstone or
    * has expired. `tombstone` may be any boolean Column; `expired` likewise.
    */
  def visible(resolved: DataFrame, tombstone: Column, expired: Column): DataFrame =
    resolved.filter(!tombstone && !expired)

  /** Prefix scan (reference iterator `Options.Prefix`,
    * `kv/utils/iterator.go:16-19` — declared there, implemented here):
    * expressed as a sargable range so it pushes down to parquet.
    */
  def prefixScan(df: DataFrame, keyCol: String, prefix: String): DataFrame =
    df.filter(col(keyCol) >= lit(prefix) && col(keyCol) < lit(prefix + "￿"))

  /** Range scan with optional bounds, ordered (reference `NewIterator`
    * asc/desc, `kv/lsm/iterator.go:232-436`).
    */
  def rangeScan(df: DataFrame, keyCol: String, from: Option[Column],
      until: Option[Column], ascending: Boolean = true): DataFrame = {
    var out = df
    from.foreach(f => out = out.filter(col(keyCol) >= f))
    until.foreach(u => out = out.filter(col(keyCol) < u))
    out.orderBy(if (ascending) col(keyCol).asc else col(keyCol).desc)
  }
}
