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

  /** Prefix scan over a STRING key column (reference iterator
    * `Options.Prefix`, `kv/utils/iterator.go:16-19` — declared there,
    * implemented here): `startsWith` is exact for every string (including
    * ones containing U+FFFF, where the old `[prefix, prefix+"￿")`
    * range trick silently dropped matches) and still pushes down to the
    * parquet scan as a `StringStartsWith` predicate, pruning row groups on
    * their min/max stats. Binary keys go through [[graft.core.GraftDB.scan]],
    * whose `[prefix, prefixSuccessor)` range uses the exact carry-based
    * byte successor.
    */
  def prefixScan(df: DataFrame, keyCol: String, prefix: String): DataFrame =
    df.filter(col(keyCol).startsWith(lit(prefix)))

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

  /** Backward as-of join: for every left row, attach the payload of the
    * most recent right row with the same keys and `rightTime <= leftTime`
    * (inclusive). Output = left columns + `asof_<c>` for each payload
    * column (null when no prior right row exists).
    *
    * Implementation is the union-window trick, not a join: both sides are
    * tagged and unioned, then one window per key partition carries the
    * latest right payload forward (`last(..., ignoreNulls)`). At scale this
    * is ONE shuffle on the keys — compared to a range join it never
    * explodes matching pairs, and skewed keys are handled by AQE like any
    * other window shuffle. `rightOrderCol` breaks ties among right rows
    * sharing a timestamp. `toleranceMs` (pandas merge_asof's tolerance)
    * nulls out a match older than the bound — applied AFTER the window
    * pass, so the plan is unchanged.
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightOrderCol: Option[String] = None,
      toleranceMs: Option[Long] = None): DataFrame =
    asofJoinImpl(left, right, keys, leftTime, rightTime, payloadCols,
      rightOrderCol, forward = false, toleranceMs)

  /** Forward as-of join: for every left row, attach the payload of the
    * EARLIEST right row with the same keys and `rightTime >= leftTime`
    * (inclusive) — "what happens next" (next purchase after each event,
    * next error after each deploy). Same union-window shape and scale
    * contract as [[asofJoinBackward]]: one shuffle on the keys, no pair
    * explosion; only the window ordering flips. Ties among right rows
    * sharing a timestamp break toward the SMALLEST `rightOrderCol` (the
    * earliest, mirroring backward's latest-wins).
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightOrderCol: Option[String] = None,
      toleranceMs: Option[Long] = None): DataFrame =
    asofJoinImpl(left, right, keys, leftTime, rightTime, payloadCols,
      rightOrderCol, forward = true, toleranceMs)

  /** Nearest as-of join (pandas `merge_asof direction='nearest'`): for
    * every left row, attach the right row minimizing `|rightTime -
    * leftTime|`; at equal distance the BACKWARD candidate (at-or-before)
    * wins, and within one timestamp the backward side takes the largest
    * `rightOrderCol` / the forward side the smallest — all
    * deterministic. `toleranceMs` bounds the distance on both sides.
    *
    * Same union-window shape as backward/forward, with BOTH carries
    * computed over the SAME key partitioning (one hash exchange, two
    * in-partition sorts — the ascending and descending windows share the
    * shuffle); the winner is a row-local comparison of the two carried
    * distances. Still no pair explosion and no range join.
    */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightOrderCol: Option[String] = None,
      toleranceMs: Option[Long] = None): DataFrame = {
    val payloadT = struct(payloadCols.map(col) :+
      col(rightTime).cast("long").as("__graft_rt"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("long").as("__t"),
        lit(0).as("__side"),
        coalesce(rightOrderCol.map(col(_).cast("long")).getOrElse(lit(0L)), lit(0L)).as("__ord"),
        payloadT.as("__payload")): _*)
    val l = left.withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__ord", lit(Long.MaxValue))
      .withColumn("__payload", lit(null).cast(r.schema("__payload").dataType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    def w(o: Seq[Column]) = Window.partitionBy(keys.map(col): _*)
      .orderBy(o: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = w(Seq(col("__t").asc, col("__side").asc, col("__ord").asc))
    val wF = w(Seq(col("__t").desc, col("__side").asc, col("__ord").desc))
    val carried = unioned
      .withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__f", last(col("__payload"), ignoreNulls = true).over(wF))
    val db = col("__t") - col("__b.__graft_rt")
    val df = col("__f.__graft_rt") - col("__t")
    val tol = toleranceMs.map(lit(_)).getOrElse(lit(Long.MaxValue))
    val bOk = col("__b").isNotNull && db <= tol
    val fOk = col("__f").isNotNull && df <= tol
    val pick = when(bOk && (!fOk || db <= df), col("__b"))
      .when(fOk, col("__f"))
      .otherwise(lit(null).cast(r.schema("__payload").dataType))
    val outCols = left.columns.map(col).toSeq ++
      payloadCols.map(c => col(s"__pick.$c").as(s"asof_$c"))
    carried.withColumn("__pick", pick)
      .filter(col("__side") === 1).select(outCols: _*)
  }

  private def asofJoinImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      rightOrderCol: Option[String],
      forward: Boolean,
      toleranceMs: Option[Long] = None): DataFrame = {
    // the matched right row's own time rides inside the payload struct so
    // a tolerance (max staleness/lookahead) can null out a carried match
    // AFTER the window pass — the one-shuffle shape is unchanged
    val payloadT = struct(payloadCols.map(col) :+
      col(rightTime).cast("long").as("__graft_rt"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).cast("long").as("__t"),
        lit(0).as("__side"),
        coalesce(rightOrderCol.map(col(_).cast("long")).getOrElse(lit(0L)), lit(0L)).as("__ord"),
        payloadT.as("__payload")): _*)
    val l = left.withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__side", lit(1))
      .withColumn("__ord", lit(Long.MaxValue))
      .withColumn("__payload", lit(null).cast(r.schema("__payload").dataType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // backward walks time ascending (latest right at-or-before carries
    // forward); forward walks descending (earliest right at-or-after
    // carries backward). Either way rights at the left row's own
    // timestamp sort BEFORE it (inclusive), and the last carried right
    // among a timestamp tie is backward's max / forward's min __ord.
    val ordering =
      if (forward) Seq(col("__t").desc, col("__side").asc, col("__ord").desc)
      else Seq(col("__t").asc, col("__side").asc, col("__ord").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
    val withinTol = toleranceMs match {
      case None => lit(true)
      case Some(tol) =>
        if (forward) col("__asof.__graft_rt") - col("__t") <= tol
        else col("__t") - col("__asof.__graft_rt") <= tol
    }
    val outCols = left.columns.map(col).toSeq ++
      payloadCols.map(c => when(withinTol, col(s"__asof.$c")).as(s"asof_$c"))
    carried.filter(col("__side") === 1).select(outCols: _*)
  }
}
