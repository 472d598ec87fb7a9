package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expressions.LayoutExpressions

/** Multi-dimensional data-layout clustering: Z-order (Morton) writes.
  *
  * The reference engine clusters one-dimensionally — every SST is sorted
  * by key and pruned via per-table min/max metas (kv/lsm/builder.go,
  * levels.go); a predicate on anything other than the key reads
  * everything. Z-order is the multi-column generalization Spark can
  * express natively: bucket each clustering column by its fitted
  * quantiles, interleave the bucket bits into one Morton key, range-sort
  * the write by that key. Rows close in EVERY clustered dimension land in
  * the same files and parquet row groups, so footer min/max statistics
  * prune scans for predicates on ANY clustered column — the same skipping
  * mechanism the engine's key-sorted generations use, widened to n
  * dimensions.
  *
  * Scale shape: the quantile fit is one `approxQuantile` pass (driver
  * holds 2^bits - 1 doubles per column); bucketing + interleaving are
  * narrow codegen'd expressions; the only shuffle is the range
  * repartition by z-key — exactly the shuffle any clustered write pays.
  * Quantile (not linear) bucketing keeps the key balanced under skewed
  * column distributions, so the range partitions stay even and no file
  * goes hot.
  */
object Layout {

  /** Fit per-column quantile boundaries for [[zOrderKey]]: 2^bits - 1
    * interior quantiles per column via one approxQuantile pass. Columns
    * must be numeric (cast to double for the fit and the bucketing).
    */
  def fitZBoundaries(df: DataFrame, cols: Seq[String], bits: Int,
      relErr: Double = 0.001): Seq[Array[Double]] = {
    require(cols.nonEmpty, "fitZBoundaries: need at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"fitZBoundaries: bits=$bits over ${cols.size} dims exceeds a long")
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    val casted = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    casted.stat.approxQuantile(cols.toArray, probs, relErr).toSeq
  }

  /** The Morton key column: each column quantile-bucketed against its
    * fitted boundaries, bucket bits interleaved round-robin.
    */
  def zOrderKey(cols: Seq[Column], boundaries: Seq[Array[Double]],
      bits: Int): Column = {
    require(cols.size == boundaries.size,
      "zOrderKey: one boundary array per column")
    LayoutExpressions.interleave_bits(
      cols.zip(boundaries).map { case (c, b) =>
        LayoutExpressions.boundary_bucket(c.cast("double"), b)
      }, bits)
  }

  /** Write `df` Z-ordered by `zCols` into `numFiles` range-balanced
    * files at `path`. The written schema is unchanged (the key is
    * dropped); the clustering lives purely in the file/row-group layout,
    * so any reader prunes via plain parquet statistics with no
    * cooperation needed.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 8, numFiles: Int = 0, format: String = "parquet"): Unit = {
    val bounds = fitZBoundaries(df, zCols, bits)
    val keyed = df.withColumn("__z", zOrderKey(zCols.map(col), bounds, bits))
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    keyed
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.format(format).mode("overwrite").save(path)
  }

  /** The 2-d Hilbert key column: both columns quantile-bucketed against
    * their fitted boundaries, then mapped to the cell's position on the
    * order-`bits` Hilbert curve. Stronger locality than [[zOrderKey]]:
    * consecutive key values are always grid-adjacent (the Morton curve
    * jumps across the grid at every power-of-two boundary), so a range
    * sort on this key packs files whose min/max spans on BOTH dimensions
    * are at least as tight — fewer files survive footer pruning for the
    * same two-column predicate.
    */
  def hilbertKey(cols: Seq[Column], boundaries: Seq[Array[Double]],
      bits: Int): Column = {
    require(cols.size == 2 && boundaries.size == 2,
      "hilbertKey: the Hilbert layout is 2-dimensional (d>2 has no " +
        "locality advantage worth the key cost over z-order here)")
    LayoutExpressions.hilbert_key(
      LayoutExpressions.boundary_bucket(cols(0).cast("double"), boundaries(0)),
      LayoutExpressions.boundary_bucket(cols(1).cast("double"), boundaries(1)),
      bits)
  }

  /** Write `df` Hilbert-ordered by the two `hCols` into range-balanced
    * files at `path` — the [[writeZOrdered]] contract (schema unchanged,
    * clustering purely in the file/row-group layout, any reader prunes
    * via plain parquet statistics) with the tighter Hilbert locality.
    */
  def writeHilbertOrdered(df: DataFrame, path: String, hCols: Seq[String],
      bits: Int = 8, numFiles: Int = 0, format: String = "parquet"): Unit = {
    val bounds = fitZBoundaries(df, hCols, bits)
    val keyed = df.withColumn("__h", hilbertKey(hCols.map(col), bounds, bits))
    val parts = if (numFiles > 0) numFiles
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    keyed
      .repartitionByRange(parts, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.format(format).mode("overwrite").save(path)
  }
}
