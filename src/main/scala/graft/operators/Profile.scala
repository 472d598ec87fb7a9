package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE / data-quality pass a pipeline runs
  * before trusting a new corpus drop: per-column null counts, exact
  * distinct cardinalities, and type-appropriate extremes/means, computed
  * in ONE aggregation over ONE scan (every column's stats ride the same
  * `agg`; the long output shape is a driver-side unpivot of that single
  * row, not one job per column).
  *
  * Determinism discipline: numeric means go through the engine-wide
  * per-row decimal cast (scale 6) so the averages are exact at any
  * partitioning and replay in plain SQL — the `q_profile` row is FULLY
  * oracled. String extremes compare lexicographically (Spark and DuckDB
  * agree on UTF-8 binary collation for ASCII corpora).
  *
  * Scale note: exact `count(distinct)` across k columns makes Spark plan
  * an Expand (k+1 rows per input row) — the honest certified form. At
  * 100 TB profiling runs, pass `exactDistinct = false` to swap in
  * HLL++ `approx_count_distinct` (one pass, no Expand, ±2%) — same
  * schema, gate-certifiable like every sketch here.
  */
object Profile {

  /** One row per profiled column:
    * `(column, n_rows, n_nulls, n_distinct, min_num, max_num, avg_num,
    * min_str, max_str, avg_len)` — numeric columns fill the `_num`
    * triple (6dp), string columns fill `_str`/`avg_len`; the other side
    * is null.
    */
  def profileColumns(
      df: DataFrame,
      numericCols: Seq[String],
      stringCols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty,
      "profileColumns: nothing to profile")
    val dec = "decimal(27,6)"
    def dist(c: Column): Column =
      if (exactDistinct) count_distinct(c) else approx_count_distinct(c, 0.02)

    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++
      numericCols.flatMap { c => Seq(
        count(col(c)).as(s"__cnt_$c"),
        dist(col(c)).as(s"__dist_$c"),
        min(col(c).cast(dec)).as(s"__min_$c"),
        max(col(c).cast(dec)).as(s"__max_$c"),
        sum(col(c).cast(dec)).as(s"__sum_$c"))
      } ++
      stringCols.flatMap { c => Seq(
        count(col(c)).as(s"__cnt_$c"),
        dist(col(c)).as(s"__dist_$c"),
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c"),
        sum(length(col(c))).as(s"__len_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)

    val rows: Seq[Column] =
      numericCols.map { c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        round(col(s"__min_$c").cast("double"), 6).as("min_num"),
        round(col(s"__max_$c").cast("double"), 6).as("max_num"),
        round(col(s"__sum_$c").cast("double") / col(s"__cnt_$c"), 6).as("avg_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"),
        lit(null).cast("double").as("avg_len"))
      } ++
      stringCols.map { c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        lit(null).cast("double").as("avg_num"),
        col(s"__min_$c").as("min_str"),
        col(s"__max_$c").as("max_str"),
        round(col(s"__len_$c").cast("double") / col(s"__cnt_$c"), 6).as("avg_len"))
      }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Population Stability Index between two snapshots of a numeric
    * column — the standard "did this feature's distribution move"
    * monitor a training pipeline runs between data refreshes. Fixed
    * equal-width bins from `lo` (width `binWidth`, `nBins` of them, plus
    * an underflow and an overflow bin) make the result DETERMINISTIC and
    * SQL-replayable; empty-bin ratios floor at `eps` (the standard
    * smoothing — without it one empty bin yields an infinite PSI).
    * Output: one row `(col_name, n_base, n_current, psi)` (6dp); NULLs
    * are excluded on both sides. Rule of thumb: < 0.1 stable, > 0.25
    * shifted.
    *
    * Scale shape: one map-side-combined count aggregation per snapshot
    * (the shuffle carries <= nBins+2 rows), a full-outer join of two
    * tiny bin tables, and the one-row total broadcast onto them — the
    * data passes are narrow scans.
    */
  /** ROBUST per-group outlier flagging: modified z-score on
    * median/MAD (`z = 0.6745 * (x - med) / mad`), the estimator that a
    * fat tail cannot drag the way it drags mean/stddev — the standard
    * data-quality screen before training statistics. Output: the input
    * plus `robust_z` (6dp) and `is_outlier` (|z| > cutoff). A
    * zero-MAD group (constant-majority values) flags nothing and
    * reports z = 0 — the conventional degenerate reading, documented
    * rather than NaN.
    *
    * Scale shape: two rounds of (exact-percentile agg -> one-row-per-
    * group join back) — medians are not algebraic, so the MAD needs the
    * group median joined before its own median. Exact percentile state
    * is the group's value multiset (the [[graft.llmops.Curation.winsorize]]
    * caveat); `exact = false` switches both quantiles to t-digest
    * `percentile_approx` for 100 TB groups.
    */
  def outliers(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      cutoff: Double = 3.5,
      exact: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "outliers: at least one key column")
    require(cutoff > 0, "outliers: cutoff must be positive")
    def med(c: String) =
      if (exact) expr(s"percentile($c, 0.5)")
      else expr(s"percentile_approx($c, 0.5, 10000)")
    val m1 = df.groupBy(keys.map(col): _*).agg(med(valueCol).as("__med"))
    val withMed = df.join(m1, keys)
      .withColumn("__ad", abs(col(valueCol) - col("__med")))
    val m2 = withMed.groupBy(keys.map(col): _*).agg(med("__ad").as("__mad"))
    withMed.join(m2, keys)
      .withColumn("robust_z",
        round(when(col("__mad") === 0, 0.0)
          .otherwise(lit(0.6745) * (col(valueCol) - col("__med")) / col("__mad")), 6))
      .withColumn("is_outlier", abs(col("robust_z")) > cutoff)
      .drop("__med", "__ad", "__mad")
  }

  /** SET OVERLAP between two snapshots of a key column — the
    * between-refresh audience/membership monitor (who stayed, who
    * churned): `(n_a, n_b, n_both, n_union, jaccard)` over DISTINCT
    * keys, NULLs excluded, jaccard 6dp.
    *
    * `exact = true`: one hash aggregation keyed on the key (map-side
    * combine; side-tag booleans OR-fold, so a key's multiplicity never
    * matters) + a one-row final — the form the oracle replays.
    * `exact = false`: HLL sketches via inclusion–exclusion
    * (`|A∩B| = a + b - u`), in ONE aggregation with NO key shuffle at
    * all — sketch partials merge map-side, the only movement is one
    * sketch per partition. That is the 100 TB path: cardinality-scale
    * state instead of key-scale shuffle; q_overlap_hll_gate pins the
    * estimate within tolerance of the exact form. Inclusion–exclusion
    * differences can go slightly negative on tiny overlaps — counts
    * floor at zero.
    */
  def setOverlap(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      exact: Boolean = true): DataFrame = {
    val tagged = a.select(col(keyCol).as("__k"), lit(true).as("__a"), lit(false).as("__b"))
      .unionAll(b.select(col(keyCol).as("__k"), lit(false).as("__a"), lit(true).as("__b")))
      .filter(col("__k").isNotNull)
    val agg =
      if (exact)
        tagged.groupBy(col("__k"))
          .agg(max(col("__a")).as("__ia"), max(col("__b")).as("__ib"))
          .agg(
            sum(when(col("__ia"), 1L).otherwise(0L)).as("n_a"),
            sum(when(col("__ib"), 1L).otherwise(0L)).as("n_b"),
            sum(when(col("__ia") && col("__ib"), 1L).otherwise(0L)).as("n_both"),
            count(lit(1)).as("n_union"))
      else
        tagged.agg(
            approx_count_distinct(when(col("__a"), col("__k")), 0.02).as("__ca"),
            approx_count_distinct(when(col("__b"), col("__k")), 0.02).as("__cb"),
            approx_count_distinct(col("__k"), 0.02).as("__cu"))
          .select(col("__ca").as("n_a"), col("__cb").as("n_b"),
            greatest(col("__ca") + col("__cb") - col("__cu"), lit(0L)).as("n_both"),
            col("__cu").as("n_union"))
    agg.withColumn("jaccard",
      round(when(col("n_union") === 0, 0.0)
        .otherwise(col("n_both").cast("double") / col("n_union")), 6))
  }

  def psiDrift(
      base: DataFrame,
      current: DataFrame,
      colName: String,
      lo: Double,
      binWidth: Double,
      nBins: Int,
      eps: Double = 1e-6): DataFrame = {
    require(binWidth > 0, "psiDrift: binWidth must be positive")
    require(nBins > 0, "psiDrift: nBins must be positive")
    require(eps > 0, "psiDrift: eps must be positive")
    def binned(df: DataFrame, out: String) = df
      .filter(col(colName).isNotNull)
      .select(least(greatest(
          floor((col(colName).cast("double") - lo) / binWidth), lit(-1.0)),
        lit(nBins.toDouble)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    val j = binned(base, "nb").join(binned(current, "nc"), Seq("bin"), "full_outer")
      .select(coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("nc"), lit(0L)).as("nc"))
    val tot = j.agg(sum("nb").as("tb"), sum("nc").as("tc"))
    val p = greatest(col("nb") / col("tb"), lit(eps))
    val q = greatest(col("nc") / col("tc"), lit(eps))
    j.crossJoin(broadcast(tot))
      .select(col("tb"), col("tc"), ((p - q) * log(p / q)).as("term"))
      .agg(max(col("tb")).as("n_base"), max(col("tc")).as("n_current"),
        round(sum(col("term")), 6).as("psi"))
      .select(lit(colName).as("col_name"), col("n_base"), col("n_current"),
        col("psi"))
  }
}
