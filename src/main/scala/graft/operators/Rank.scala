package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order prefix scans — `row_number`, running sum,
  * strict-prefix max over a TOTAL order — without ever shuffling the
  * data frame to one partition.
  *
  * Spark's `Window.orderBy(...)` with no `partitionBy` plans an
  * `Exchange SinglePartition` of the whole input: fine on a frame that
  * is structurally bounded (a dimension, an hours series), a ceiling on
  * anything data-sized. The members of this family that rank
  * *unbounded* post-aggregation frames (customer spend for the Gini
  * statistic, distinct attribute cells for the skyline, supplier
  * revenue for Pareto heads) route through here instead.
  *
  * Two-phase plan (no RDDs; the only collect is the bounded one-row
  * boundary array, for determinism — see `tag`):
  *
  *  1. '''Bucket''' — one aggregate computes `parts-1` approximate
  *     quantile boundaries of the numeric bucket key
  *     (`percentile_approx`), collected to the driver (bounded: one row,
  *     ≤ parts-1 doubles — see `tag`) and embedded as a literal that tags
  *     every row with `__bkt` = count of boundaries strictly below its
  *     key. Equal keys always share a bucket, so bucket ranges respect any
  *     total order whose FIRST attribute is the bucket key, in either
  *     direction (pass the negated key for descending). Boundary
  *     placement only balances work — every output value is
  *     independent of where the cuts land.
  *  2. '''Local scan''' — the ordinary `Window.partitionBy("__bkt")`
  *     running aggregate: one keyed exchange, each bucket ~n/parts rows.
  *  3. '''Offsets''' — per-bucket totals (`groupBy("__bkt")`, map-side
  *     partials) combined by a triangular `b.__bkt < a.__bkt` self-join
  *     over the ≤parts-row bucket frame (≤parts² ~ 4k intermediate
  *     rows) — the exclusive prefix aggregate of the buckets WITHOUT a
  *     single-partition window. Broadcast back on `__bkt` and folded
  *     into the local scan.
  *
  * Result: the only exchanges are two keyed hash shuffles on `__bkt`
  * plus aggregate-sized broadcasts; `PlanShapeSpec` pins that every
  * `Window` in the routed queries carries a non-empty partition spec.
  *
  * Contract: the combined `orderCols` must be a TOTAL order (unique
  * key) whose first attribute is `bucketOn`'s ordering — ties broken
  * by later columns stay inside one bucket, so local ranks compose
  * exactly. `bucketOn` must be numeric (quantile boundaries); NULL
  * bucket keys land in bucket 0, matching NULLS-FIRST ascending
  * window order. Skew bound: all rows sharing one bucket-key value
  * share a bucket — a single dominant value degrades toward the
  * single-partition plan for that bucket only; callers ranking frames
  * with heavy single-value concentration should rank a rounded/jittered
  * key or pre-aggregate per value (the routed callers rank aggregates
  * keyed by the value's owner, so each key value is one row per owner).
  *
  * The input is traversed three times (boundaries, scan, offsets);
  * callers ranking an expensive upstream should persist it first —
  * the routed queries rank cheap keyed aggregates where the repeated
  * map-side partial is noise.
  */
object Rank {

  private def nParts(df: DataFrame): Int =
    math.min(64,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Tags `__bkt`: quantile-bucket index of `bucketOn`, order-consistent
    * (ascending) and equal-keys-share-a-bucket. One extra column.
    *
    * The boundary array is COLLECTED to the driver (one row, ≤ parts-1
    * doubles) and re-embedded as a literal rather than left in the plan
    * as a subtree: `percentile_approx` is an order-sensitive approximate
    * sketch, and the tagged frame fans out to BOTH the local window scan
    * and the per-bucket offsets aggregate — if exchange reuse ever failed
    * to deduplicate the aggregate (AQE re-plan, task retry, speculation),
    * the two sides could compute different cuts and a row would be tagged
    * into one bucket but counted in another. A driver-side literal makes
    * bucket assignment single-sourced and deterministic; the boundary
    * VALUES still only balance work, never change any output. Cost: one
    * bounded eager job at plan-build time (the documented first pass). */
  private def tag(df: DataFrame, bucketOn: Column, parts: Int): DataFrame = {
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    // accuracy 1000, not the library default 10000: boundary placement
    // only balances work (never changes any output value), and the
    // sketch update cost is the dominant term of this pass
    val row = df.agg(
      percentile_approx(bucketOn.cast("double"), lit(probs), lit(1000))
        .as("__bnds")).collect()(0)
    val bnds: Array[Double] =
      if (row.isNullAt(0)) Array.empty else row.getSeq[Double](0).toArray
    // bucket index = count of boundaries strictly below the key, as a
    // CASE cascade over the ≤ parts-1 distinct literal cuts: fully
    // whole-stage-codegen'd, unlike a higher-order array filter (a
    // per-row interpreted lambda + array allocation on the hot path).
    // NULL keys fall through every WHEN to 0 — bucket 0, the
    // NULLS-FIRST ascending window order.
    val uniq = bnds.distinct.sorted
    val bkt =
      if (uniq.isEmpty) lit(0)
      else uniq.map(b => when(bucketOn.cast("double") > lit(b), 1)
        .otherwise(0)).reduce(_ + _)
    df.withColumn("__bkt", bkt)
  }

  /** Exclusive per-bucket prefix of `perBucket`'s `__bagg` column via the
    * triangular self-join; output (`__bkt`, `__off`) with `__off` NULL
    * for the first bucket (no predecessors). `combine` folds the
    * predecessor aggregates (sum for sum/count scans, max for max). */
  private def offsets(perBucket: DataFrame,
      combine: Column => Column): DataFrame = {
    val a = perBucket.select(col("__bkt"), col("__bagg"))
    val b = perBucket.select(col("__bkt").as("__bkt_b"),
      col("__bagg").as("__bagg_b"))
    a.join(broadcast(b), col("__bkt_b") < col("__bkt"), "left")
      .groupBy(col("__bkt"))
      .agg(combine(col("__bagg_b")).as("__off"))
  }

  /** Global `row_number` over `orderCols` (total order, first attribute
    * = `bucketOn` ascending), 1-based, as `out`. */
  def rowNumber(df: DataFrame, orderCols: Seq[Column], bucketOn: Column,
      out: String, parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts else nParts(df)
    val tagged = tag(df, bucketOn, p)
    val w = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
    val local = tagged.withColumn("__lrn", row_number().over(w).cast("long"))
    val perB = tagged.groupBy(col("__bkt")).agg(count(lit(1)).as("__bagg"))
    local.join(broadcast(offsets(perB, sum)), Seq("__bkt"), "left")
      .withColumn(out, col("__lrn") + coalesce(col("__off"), lit(0L)))
      .drop("__bkt", "__lrn", "__off")
  }

  /** Global running sum of `value` (current row INCLUSIVE) over
    * `orderCols`, as `out`. Use an exact-integer `value` when the
    * result feeds an oracle hash — two-phase summation is
    * order-independent only in exact arithmetic. */
  def runningSum(df: DataFrame, orderCols: Seq[Column], bucketOn: Column,
      value: Column, out: String, parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts else nParts(df)
    val tagged = tag(df, bucketOn, p)
    val w = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = tagged.withColumn("__lrs", sum(value).over(w))
    val perB = tagged.groupBy(col("__bkt")).agg(sum(value).as("__bagg"))
    local.join(broadcast(offsets(perB, sum)), Seq("__bkt"), "left")
      .withColumn(out, col("__lrs") + coalesce(col("__off"), lit(0L)))
      .drop("__bkt", "__lrs", "__off")
  }

  /** Distributed EXACT discrete quantiles: for each `p` in `probs`, the
    * value whose global ascending rank is `max(1, ceil(p * n))` — the
    * `quantile_disc` selection rule, computed without a single-partition
    * sort AND without the per-group value-multiset state Spark's exact
    * `percentile` aggregate holds (the whole column in one aggregation
    * buffer — the other 100 TB ceiling on exact quantiles;
    * `percentile_approx` trades exactness away instead). Rank order
    * among TIED values is arbitrary, but the value AT any rank is
    * well-defined, so the result is exact and deterministic regardless.
    *
    * Output: (`p` double, `value` = the input column) one row per prob.
    * NULL values are excluded (they have no rank), matching every SQL
    * quantile. The rank target uses plain IEEE `ceil(p * n)` so an
    * external SQL oracle replaying the same formula agrees bit-for-bit.
    *
    * Plan shape: the bounded boundary job (see `tag`) plus ONE job for
    * rank + selection — the per-bucket window, bucket offsets, total
    * count and target filter all live in a single plan, so the
    * hashpartitioning(__bkt) exchange is shared and the frame is
    * scanned, shuffled and bucket-sorted once. (A bucket-pruned variant
    * that sorts only target-holding buckets was measured SLOWER end to
    * end at bench scale: it needs a counts job between boundary and
    * selection, and the extra job's scan + schedule overhead exceeds
    * the saved sort, which parallelizes across buckets anyway. At
    * 100 TB the job constant stays fixed while both variants scan the
    * frame the same number of times, so the one-job shape wins there
    * too.)
    */
  def quantilesDisc(df: DataFrame, valueCol: String, probs: Seq[Double],
      parts: Int = 0): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "quantilesDisc: probs must be in [0, 1]")
    val in = df.filter(col(valueCol).isNotNull)
    val ranked = rowNumber(in, Seq(col(valueCol)), bucketOn = col(valueCol),
      out = "__rn", parts = parts)
    val n = in.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .select(col(valueCol), col("__rn"),
        explode(lit(probs.toArray)).as("p"), col("__n"))
      .filter(col("__rn") ===
        greatest(lit(1L), ceil(col("p") * col("__n")).cast("long")))
      .select(col("p"), col(valueCol))
  }

  /** Global `ntile(n)` over `orderCols` (total order, first attribute =
    * `bucketOn` ascending), as `out` — the EXACT SQL semantics: with
    * `c` rows, `q = c div n`, `r = c mod n`, the first `r` buckets get
    * `q+1` rows and the rest `q` (when `n > c`, row k is alone in
    * bucket k). Derived from the two-phase [[rowNumber]] plus a one-row
    * count broadcast, in pure integer arithmetic an external SQL
    * engine's `ntile()` reproduces bit-for-bit — no single-partition
    * window. */
  def ntile(df: DataFrame, orderCols: Seq[Column], bucketOn: Column,
      n: Int, out: String, parts: Int = 0): DataFrame = {
    require(n > 0, "ntile: n must be positive")
    val ranked = rowNumber(df, orderCols, bucketOn, "__rn", parts)
    val cnt = df.agg(count(lit(1)).as("__c"))
    // `div` (true integer division), never floor(a/b): an IEEE quotient
    // a ulp under an integer would floor off by one at large counts
    ranked.crossJoin(broadcast(cnt))
      .withColumn("__q", expr(s"__c div ${n}L"))
      .withColumn("__r", expr(s"__c % ${n}L"))
      .withColumn(out, expr(
        """CASE WHEN __rn - 1 < __r * (__q + 1)
             THEN (__rn - 1) div (__q + 1) + 1
             ELSE __r + ((__rn - 1) - __r * (__q + 1)) div __q + 1 END"""))
      .drop("__rn", "__c", "__q", "__r")
  }

  /** Global `percent_rank` over `orderCols`, as `out`: `(rn-1)/(c-1)`
    * as an IEEE double (0.0 for a single row, the SQL convention) — the
    * same division every SQL engine's `percent_rank()` performs, so
    * parity is bit-exact. No single-partition window. */
  def percentRank(df: DataFrame, orderCols: Seq[Column], bucketOn: Column,
      out: String, parts: Int = 0): DataFrame = {
    val ranked = rowNumber(df, orderCols, bucketOn, "__rn", parts)
    val cnt = df.agg(count(lit(1)).as("__c"))
    ranked.crossJoin(broadcast(cnt))
      .withColumn(out,
        when(col("__c") === 1L, lit(0.0))
          .otherwise((col("__rn") - 1L).cast("double") /
            (col("__c") - 1L).cast("double")))
      .drop("__rn", "__c")
  }

  /** Global `cume_dist` over ascending `valueCol`, as `out`:
    * `count(rows with value <= current) / n` in IEEE double — the SQL
    * tie rule (all peers share the cumulative count of their LAST
    * member), which `percent_rank`'s row-level form can't express.
    * Computed on the DISTINCT-VALUE frame: per-value counts fold
    * through the two-phase [[runningSum]] (distinct values are their
    * own total order, so no tie column is needed) and join back on the
    * value — a keyed shuffle join at scale, never a single-partition
    * window, never a self-join on rows. */
  def cumeDist(df: DataFrame, valueCol: String, out: String,
      parts: Int = 0): DataFrame = {
    // NULL values are EXCLUDED up front (the quantilesDisc contract:
    // they have no rank) — left in, they would inflate n and, sorting
    // NULLS-FIRST, every value's cumulative count, while the keyed
    // join back dropped their rows anyway (NULL joins nothing):
    // silently wrong for every row. Engines also disagree on NULL
    // order (Spark NULLS FIRST asc, DuckDB NULLS LAST), so excluding
    // is the only cross-engine-stable semantics.
    val in = df.filter(col(valueCol).isNotNull)
    val perV = in.groupBy(col(valueCol)).agg(count(lit(1)).as("__cv"))
    val cumLe = runningSum(perV, Seq(col(valueCol)),
        bucketOn = col(valueCol), value = col("__cv"), out = "__le",
        parts = parts)
      .select(col(valueCol), col("__le"))
    val n = in.agg(count(lit(1)).as("__n"))
    in.join(cumLe, Seq(valueCol))
      .crossJoin(broadcast(n))
      .withColumn(out, col("__le").cast("double") / col("__n").cast("double"))
      .drop("__le", "__n")
  }

  /** Global STRICT-prefix max of `value` (current row excluded:
    * `rowsBetween(unboundedPreceding, -1)`) over `orderCols`, as `out`
    * — NULL for the global first row, the frontier-scan contract. */
  def prefixMax(df: DataFrame, orderCols: Seq[Column], bucketOn: Column,
      value: Column, out: String, parts: Int = 0): DataFrame = {
    val p = if (parts > 0) parts else nParts(df)
    val tagged = tag(df, bucketOn, p)
    val w = Window.partitionBy(col("__bkt")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = tagged.withColumn("__lpm", max(value).over(w))
    val perB = tagged.groupBy(col("__bkt")).agg(max(value).as("__bagg"))
    // greatest() skips NULLs (returns NULL only when all inputs are),
    // exactly the fold wanted: first row of first bucket stays NULL.
    local.join(broadcast(offsets(perB, max)), Seq("__bkt"), "left")
      .withColumn(out, greatest(col("__lpm"), col("__off")))
      .drop("__bkt", "__lpm", "__off")
  }
}
