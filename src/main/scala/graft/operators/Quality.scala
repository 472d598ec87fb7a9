package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (Deequ-style): the user
  * states a list of constraints — completeness, key uniqueness, value
  * bounds, set membership, regex shape, volume — and gets back one row
  * per constraint with the measured metric, the threshold, and a verdict.
  * The reference has no quality surface (it stores opaque bytes —
  * `kv/db.go` Set/Get); this is the training-data-pipeline extension the
  * brief asks for: before 100 TB of documents enters a tokenizer run, the
  * gate is exactly this kind of single-pass audit.
  *
  * Scale shape: ALL metrics are computed in ONE aggregation pass over the
  * table — every constraint compiles to an aggregate expression (a
  * null-safe conditional average or a count), and the whole batch ships
  * as a single `agg(...)` with map-side partials, so the cost is one scan
  * regardless of how many constraints are declared. The only exception is
  * [[Quality.Unique]], whose exact distinct-count makes Spark pre-aggregate
  * by the key expression first — still the same single scan, one extra
  * keyed shuffle; at extreme scale pass `approxUnique = true` to measure
  * uniqueness with an HLL sketch instead (pure map-side partials again,
  * ~2% tolerance). The result is one row per constraint — driver-weightless.
  *
  * MULTI-`Unique` hazard: TWO OR MORE exact [[Quality.Unique]] constraints
  * on different key sets make Spark plan an `Expand` — still ONE scan, but
  * every input row is replicated once per distinct set (plus once for the
  * plain metrics), so an audit with k exact Uniques shuffles ~(k+1)x the
  * row volume (QualitySpec pins the shape). That is a deliberate,
  * bounded cost — but at 100 TB prefer `approxUnique = true` whenever the
  * batch carries more than one Unique: the HLL form keeps every
  * constraint a plain map-side partial and the Expand never appears.
  */
object Quality {

  /** One declared constraint. `name` defaults to a derived slug; `target`
    * is the audited column (or column list) surfaced in the result.
    */
  sealed trait Check {
    def name: String
    def target: String
    /** threshold the metric must meet (metric >= threshold passes) */
    def threshold: Double
  }

  /** Fraction of rows with a non-NULL `column` must be >= `minRatio`. */
  final case class Completeness(column: String, minRatio: Double = 1.0)
      extends Check {
    val name = s"completeness:$column"
    val target = column
    val threshold = minRatio
  }

  /** distinct(columns) / count(*) must be >= `minRatio` (1.0 = the
    * columns form a key). Rows where every key column is NULL still
    * count one distinct group, matching SQL `count(distinct (a, b))`
    * semantics on both engines via a concatenated null-marked form.
    */
  final case class Unique(columns: Seq[String], minRatio: Double = 1.0)
      extends Check {
    require(columns.nonEmpty, "Unique needs at least one column")
    val name = s"unique:${columns.mkString("+")}"
    val target = columns.mkString(",")
    val threshold = minRatio
  }

  /** Fraction of rows with `lo <= column <= hi` (NULL fails) must be
    * >= `minRatio`.
    */
  final case class Bounds(column: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends Check {
    require(lo <= hi, s"Bounds: lo $lo > hi $hi")
    val name = s"bounds:$column"
    val target = column
    val threshold = minRatio
  }

  /** Fraction of rows whose `column` is one of `allowed` (NULL fails)
    * must be >= `minRatio`.
    */
  final case class MemberOf(column: String, allowed: Seq[String],
      minRatio: Double = 1.0) extends Check {
    require(allowed.nonEmpty, "MemberOf needs a non-empty allowed set")
    val name = s"member_of:$column"
    val target = column
    val threshold = minRatio
  }

  /** Fraction of rows whose `column` fully matches `regex` (anchored
    * both sides; NULL fails) must be >= `minRatio`. Keep the pattern in
    * the common RE2-ish subset — it must mean the same thing to every
    * engine that re-audits the table.
    */
  final case class Matches(column: String, regex: String,
      minRatio: Double = 1.0) extends Check {
    val name = s"matches:$column"
    val target = column
    val threshold = minRatio
  }

  /** Table must have at least `n` rows. The metric is min(count/n, 1)
    * so every constraint's metric lives on the same [0, 1] scale.
    */
  final case class MinRows(n: Long) extends Check {
    require(n > 0, "MinRows needs n > 0")
    val name = s"min_rows:$n"
    val target = "*"
    val threshold = 1.0
  }

  /** Mean of `column` must lie in `[lo, hi]` (audits drift of a score
    * column between pipeline runs). Metric is the mean itself; the
    * verdict is a band test, surfaced with threshold = lo (the metric
    * column still shows the real mean for dashboards).
    */
  final case class MeanInRange(column: String, lo: Double, hi: Double)
      extends Check {
    require(lo <= hi, s"MeanInRange: lo $lo > hi $hi")
    val name = s"mean_in_range:$column"
    val target = column
    val threshold = lo
  }

  private val Eps = 1e-9

  /** Run every constraint in one aggregation pass. Returns one row per
    * constraint: `(check, target, metric, threshold, passed)`, ordered
    * by `check` — metrics rounded to 6dp so re-audits hash-compare.
    */
  def check(df: DataFrame, checks: Seq[Check],
      approxUnique: Boolean = false): DataFrame =
    checkImpl(df, Nil, checks, approxUnique)

  /** The per-GROUP audit: the same constraint batch measured within
    * every group of `groupBy` (ingest partition, source, day), one
    * result row per (group, constraint) — the "WHICH slice is broken"
    * form of [[check]]. Still one aggregation pass; [[Unique]] measures
    * distinctness within each group.
    */
  def checkGrouped(df: DataFrame, groupBy: Seq[String], checks: Seq[Check],
      approxUnique: Boolean = false): DataFrame = {
    require(groupBy.nonEmpty,
      "checkGrouped needs group columns — use check() for the global audit")
    checkImpl(df, groupBy, checks, approxUnique)
  }

  private def checkImpl(df: DataFrame, groupBy: Seq[String],
      checks: Seq[Check], approxUnique: Boolean): DataFrame = {
    require(checks.nonEmpty, "Quality.check needs at least one constraint")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate constraint names — name clashes would collapse result rows")

    def ratio(cond: Column): Column =
      round(avg(when(coalesce(cond, lit(false)), 1.0d).otherwise(0.0d)), 6)

    // null-marked concatenation so (NULL, x) and ("", x) stay distinct:
    // separator is the 0x01 control char, NULL becomes the 0x02 char, so
    // the only collisions are values that themselves contain 0x01/0x02 --
    // characters key-shaped columns never inhabit
    def keyOf(cols: Seq[String]): Column =
      concat_ws("\u0001",
        cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*)

    val metricExprs: Seq[Column] = checks.map {
      case c: Completeness => ratio(col(c.column).isNotNull)
      case c: Unique =>
        val d =
          if (approxUnique) approx_count_distinct(keyOf(c.columns))
          else count_distinct(keyOf(c.columns))
        round(d.cast("double") / count(lit(1)), 6)
      case c: Bounds =>
        ratio(col(c.column).cast("double").between(c.lo, c.hi))
      case c: MemberOf => ratio(col(c.column).cast("string").isin(c.allowed: _*))
      case c: Matches =>
        ratio(col(c.column).cast("string").rlike("^(?:" + c.regex + ")$"))
      case c: MinRows =>
        round(least(count(lit(1)).cast("double") / c.n, lit(1.0d)), 6)
      case c: MeanInRange => round(avg(col(c.column).cast("double")), 6)
    }

    val aliased = metricExprs.head.as("m0") +:
      metricExprs.tail.zipWithIndex.map { case (e, i) => e.as(s"m${i + 1}") }
    val agged =
      if (groupBy.isEmpty) df.agg(aliased.head, aliased.tail: _*)
      else df.groupBy(groupBy.map(col): _*).agg(aliased.head, aliased.tail: _*)

    val verdictOf: (Check, Column) => Column = {
      case (c: MeanInRange, m) => m >= c.lo - Eps && m <= c.hi + Eps
      case (c, m) => m >= c.threshold - Eps
    }
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val m = col(s"m$i")
      struct(lit(c.name).as("check"), lit(c.target).as("target"),
        m.as("metric"), lit(c.threshold).as("threshold"),
        coalesce(verdictOf(c, m), lit(false)).as("passed"))
    }
    agged.select(groupBy.map(col) :+ explode(array(rows: _*)).as("r"): _*)
      .select(groupBy.map(col) ++ Seq(col("r.check"), col("r.target"),
        col("r.metric"), col("r.threshold"), col("r.passed")): _*)
      .orderBy(groupBy.map(col) :+ col("check"): _*)
  }
}
