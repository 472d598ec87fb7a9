package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO over snapshot frames — the lakehouse upsert the reference
  * expresses one key at a time (`Set`/`Del` against the LSM,
  * reference/db.go) re-expressed as ONE set-oriented plan: a keyed
  * full-outer join of the target snapshot against a delta source, with
  * matched rows updated or deleted and unmatched source rows inserted.
  * This is the batch dual of [[graft.core.GraftDB]]'s write path: where
  * the engine folds deltas into the LWW view at read time, `mergeInto`
  * produces the folded NEXT snapshot eagerly — the form a parquet
  * re-materialization or a dimension-table refresh wants.
  *
  * Clause semantics (classic three-clause MERGE):
  *   - matched + `deleteWhen`          → row dropped;
  *   - matched + `updateWhen` (else)   → source values replace target's;
  *   - matched + neither               → target row kept unchanged;
  *   - target-only                     → kept unchanged;
  *   - source-only + `insertWhen`      → inserted (else dropped).
  *
  * Conditions are evaluated on the joined frame: target columns keep
  * their names, source columns appear as `src_<name>` — so
  * `col("src_status") === "D"` is "delete where the INCOMING row says D".
  *
  * Ambiguous matches: SQL MERGE raises on a source that matches one
  * target row twice. Same here — a per-key occurrence count over the
  * source feeds a codegen'd `raise_error`, so a duplicate-key delta
  * fails loudly on the executors instead of silently double-applying.
  * The guard window is keyed on the join keys, so the source side pays
  * its join exchange once and the window rides it.
  *
  * Scale shape: ONE equi-join shuffle on the merge keys (Catalyst
  * broadcasts a small delta on its own; AQE splits skewed keys), no
  * window over unbounded groups, no driver-side state. The output is a
  * plain DataFrame — write it wherever the next snapshot lives.
  */
object Merge {

  /** Merge `source` into `target` on `keys`, returning the next snapshot
    * with the target's schema. `source` must carry every target column
    * (extra source columns are ignored) and at most one row per key.
    */
  def mergeInto(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateWhen: Column = lit(true),
      deleteWhen: Column = lit(false),
      insertWhen: Column = lit(true)): DataFrame = {
    require(keys.nonEmpty, "mergeInto: at least one merge key column")
    val tCols = target.columns.toSeq
    val missing = tCols.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"mergeInto: source is missing target columns ${missing.mkString(", ")}")

    val kw = Window.partitionBy(keys.map(c => col(s"src_$c")): _*)
    val src = source
      .select(tCols.map(c => col(c).as(s"src_$c")): _*)
      .withColumn("__kn", count(lit(1)).over(kw))
      // the guard must be a FILTER, not a projected column: projections are
      // column-pruned (a count() over the merge result would silently skip
      // a raise_error carried in a column), while filter semantics survive
      .filter(
        when(col("__kn") > 1, raise_error(concat(
          lit(s"mergeInto: source has duplicate rows for merge key (${keys.mkString(", ")}) = "),
          concat_ws(",", keys.map(c => col(s"src_$c").cast("string")): _*))))
          .otherwise(lit(true)))
      .drop("__kn")
      .withColumn("__s_present", lit(true))
    val tgt = target.withColumn("__t_present", lit(true))

    // source columns are renamed src_* above, so plain col() references are
    // unambiguous even when the delta derives from the target itself (the
    // self-join case DataFrame-qualified refs trip over)
    val joinCond = keys.map(c => col(c) <=> col(s"src_$c")).reduce(_ && _)
    val joined = tgt.join(src, joinCond, "full_outer")

    val matched = col("__t_present").isNotNull && col("__s_present").isNotNull
    val sourceOnly = col("__t_present").isNull
    // SQL MERGE treats a NULL clause condition as FALSE (the clause does
    // not fire) — e.g. `deleteWhen = col("src_status") === "D"` on a NULL
    // src_status must KEEP the row, not drop it through a NULL __keep
    val del = coalesce(deleteWhen, lit(false))
    val upd = coalesce(updateWhen, lit(false))
    val ins = coalesce(insertWhen, lit(false))
    val keep = when(matched, !del)
      .when(sourceOnly, ins)
      .otherwise(lit(true)) // target-only rows always survive
    val takeSource = (matched && !del && upd) || sourceOnly

    joined
      .withColumn("__keep", keep)
      .withColumn("__take_src", takeSource)
      .filter(col("__keep"))
      .select(tCols.map { c =>
        when(col("__take_src"), col(s"src_$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}
