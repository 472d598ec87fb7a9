package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a keyed, timestamped stream — the
  * funnel/cohort family every product-analytics engine ships, expressed
  * with the one-shuffle discipline (reference anchor: the engine's
  * ordered keyspace scan, `kv/lsm/iterator.go:303-366`, is the same
  * sorted-per-key pass these operators ride).
  *
  * Scale shape: [[funnelStages]] computes EVERY stage frontier inside a
  * single window pass over one sort on (keys, ts, tie) — funnel depth
  * adds projections, never self-joins, so a 10-stage funnel over 100 TB
  * of events still pays exactly one shuffle. [[cohortRetention]] is a
  * (key, period) hash agg, a per-key window that reuses the agg's
  * partitioning, and the final cohort roll-up — two shuffles total.
  */
object Analytics {

  /** Per-entity stage-completion timestamps for an ORDERED funnel: stage
    * i completes at the earliest event satisfying `stages(i)` at-or-after
    * stage i-1's completion (ties on ts broken by `tieCol` for a total
    * order), with every stage past the first bounded to `horizonMs` of
    * stage 0 when given. Output: the input keys plus one nullable
    * `<name>_ts` column per stage (the running frontier, per entity).
    *
    * Value-predicate semantics (>= on timestamps, not row order) make the
    * result engine-replayable — the q_funnel oracle replays it in SQL.
    */
  def funnelStages(
      events: DataFrame,
      stages: Seq[(String, Column)],
      keys: Seq[String],
      tsCol: String = "ts_ms",
      tieCol: String = "event_id",
      horizonMs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnelStages: at least one stage")
    require(keys.nonEmpty, "funnelStages: at least one key column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withFrontiers = stages.zipWithIndex.foldLeft(events) {
      case (df, ((name, pred), i)) =>
        val gate =
          if (i == 0) pred
          else {
            val afterPrev = pred && col(tsCol) >= col(s"${stages(i - 1)._1}_ts")
            horizonMs.fold(afterPrev)(h =>
              afterPrev && col(tsCol) - col(s"${stages.head._1}_ts") <= h)
          }
        df.withColumn(s"${name}_ts", min(when(gate, col(tsCol))).over(w))
    }
    val frontierCols = stages.map { case (n, _) => max(col(s"${n}_ts")).as(s"${n}_ts") }
    withFrontiers.groupBy(keys.map(col): _*)
      .agg(frontierCols.head, frontierCols.tail: _*)
  }

  /** Stage-membership bitmask: bit i set iff the row satisfies
    * `stages(i)` — how arbitrary (possibly overlapping) stage predicates
    * cross the typed boundary into
    * [[graft.streaming.EventStream.funnelStream]]'s state function.
    */
  def stageBits(stages: Seq[Column]): Column = {
    require(stages.nonEmpty && stages.length <= 62,
      "stageBits: 1 to 62 stages")
    stages.zipWithIndex
      .map { case (p, i) => when(p, lit(1L << i)).otherwise(lit(0L)) }
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Funnel conversion counts: one row, `n_<stage>` = entities whose
    * frontier reached that stage (monotone non-increasing by
    * construction).
    */
  def funnelCounts(
      events: DataFrame,
      stages: Seq[(String, Column)],
      keys: Seq[String],
      tsCol: String = "ts_ms",
      tieCol: String = "event_id",
      horizonMs: Option[Long] = None): DataFrame = {
    val per = funnelStages(events, stages, keys, tsCol, tieCol, horizonMs)
    val counts = stages.map { case (n, _) =>
      sum(when(col(s"${n}_ts").isNotNull, 1L).otherwise(0L)).as(s"n_$n") }
    per.agg(counts.head, counts.tail: _*)
  }

  /** Cohort retention: entities grouped by first-active period, counted
    * at each period offset they return. Output:
    * `(cohort_period, period_offset, n_entities)` with periods =
    * `floor(ts / periodMs)`.
    */
  def cohortRetention(
      events: DataFrame,
      keyCol: String,
      tsCol: String = "ts_ms",
      periodMs: Long = 604800000L): DataFrame = {
    require(periodMs > 0, "cohortRetention: periodMs must be positive")
    val perPeriod = events
      .groupBy(col(keyCol), (col(tsCol) / lit(periodMs)).cast("long").as("period"))
      .agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(keyCol))
    perPeriod
      .withColumn("cohort_period", min(col("period")).over(w))
      .select(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .groupBy("cohort_period", "period_offset")
      .agg(count(lit(1)).as("n_entities"))
  }

  /** Multi-touch attribution: credit each conversion's value to the
    * touch events (by channel) that preceded it within a lookback
    * window, under the three standard models at once —
    * `first_touch` (all credit to the earliest touch in window),
    * `last_touch` (all to the latest before the conversion), and
    * `linear` (value split evenly across every touch in window).
    * Output: `(model, channel, n_conv, credit)` — `n_conv` counts the
    * conversions contributing to the cell, `credit` the value credited.
    * Conversions with NO touch in window are dropped (unattributable).
    *
    * Scale shape: candidates come from [[RangeJoin.pointInInterval]]
    * keyed on the entity — a binned EQUI-join ((key, bin) shuffle, no
    * per-entity cross product, degenerate-interval guard inherited).
    * After candidates, ONE exchange on the conversion id computes the
    * per-(conversion, channel) rollup AND the per-conversion frontier
    * window (groupBy on a superset of the partition key + window on the
    * key itself both ride the same repartition); the three models then
    * EXPLODE from each rolled-up row — single lineage, no tri-branch
    * union recomputation — into the final (model, channel) cells-sized
    * aggregation. Ties on touch timestamp are broken by `tieCol`
    * (unique), so first/last are total-order deterministic.
    *
    * Extension surface (reference anchor: SURVEY §2.5 — the reference
    * engine has no joins; this is the event-analytics idiom its users
    * reach for first).
    */
  def attribution(
      events: DataFrame,
      convType: String,
      touchTypes: Seq[String],
      lookbackMs: Long,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms",
      tieCol: String = "event_id",
      valueCol: String = "value",
      binSizeMs: Long = 86400000L): DataFrame = {
    require(touchTypes.nonEmpty, "attribution: touchTypes must be non-empty")
    require(lookbackMs > 0, "attribution: lookbackMs must be positive")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(keyCol), col(tieCol).as("__conv_id"),
        col(tsCol).as("__cts"), col(valueCol).as("__value"))
      .withColumn("__start", col("__cts") - lit(lookbackMs))
      .withColumn("__end", col("__cts") - lit(1L)) // strictly before
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(keyCol), col(typeCol).as("channel"),
        col(tsCol).as("__tts"), col(tieCol).as("__tid"))
    val cand = RangeJoin.pointInInterval(
      touch, conv, binSizeMs, "__tts", "__start", "__end", Seq(keyCol))
    val byConv = Window.partitionBy(col("__conv_id"))
    val perChannel = cand
      .repartition(col("__conv_id"))
      .groupBy(col("__conv_id"), col("channel"))
      .agg(
        count(lit(1)).as("__cnt"),
        min(struct(col("__tts"), col("__tid"))).as("__first"),
        max(struct(col("__tts"), col("__tid"))).as("__last"),
        first(col("__value")).as("__value"))
      .withColumn("__n", sum(col("__cnt")).over(byConv))
      .withColumn("__conv_first", min(col("__first")).over(byConv))
      .withColumn("__conv_last", max(col("__last")).over(byConv))
    perChannel
      .select(col("channel"), col("__conv_id"), explode(array(
        when(col("__first") === col("__conv_first"),
          struct(lit("first_touch").as("model"), col("__value").as("credit"))),
        when(col("__last") === col("__conv_last"),
          struct(lit("last_touch").as("model"), col("__value").as("credit"))),
        struct(lit("linear").as("model"),
          (col("__value") * col("__cnt") / col("__n")).as("credit"))
      )).as("__m"))
      .filter(col("__m").isNotNull)
      .select(col("__m.model").as("model"), col("channel"),
        col("__conv_id"), col("__m.credit").as("credit"))
      .groupBy("model", "channel")
      .agg(count(lit(1)).as("n_conv"), sum(col("credit")).as("credit"))
  }

  /** Market-basket association rules (2-itemsets, a-priori pruned):
    * for every ordered pair of frequent items (A, B) co-occurring in a
    * basket, emit `support` = P(A,B), `confidence` = P(B|A) and
    * `lift` = P(B|A)/P(B). Both rule directions surface (A=>B and B=>A
    * share `n_pair` but differ in confidence/lift).
    *
    * Scale shape: basket-item pairs dedup on ONE (basket, item) hash
    * agg; item supports are an item-keyed agg (vocabulary-sized);
    * infrequent items are pruned BEFORE pair generation (the a-priori
    * bound: a pair can't be frequent if either member isn't) via a
    * broadcast semi-join. Pairs generate MAP-SIDE from each basket's
    * sorted item array (a higher-order transform — no basket self-join,
    * so the shuffle carries one row per distinct co-occurring pair per
    * basket, never the quadratic join intermediate), then aggregate on
    * the (a, b) pair key — bounded by vocabulary², not by corpus size.
    * Baskets wider than `maxBasketItems` fail LOUDLY (raise_error in a
    * filter, so column pruning can't drop the guard): quadratic
    * per-basket work is a design bound, not a silent cap. The global
    * basket count rides a one-row broadcast (crossJoin of an
    * aggregate), never a driver collect.
    *
    * Extension surface (reference anchor: SURVEY §2.5 — co-occurrence
    * mining is the first "what sells together" ask over order data).
    */
  def basketRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Double = 0.01,
      minConfidence: Double = 0.0,
      maxBasketItems: Int = 10000): DataFrame = {
    require(minSupport > 0 && minSupport <= 1, "basketRules: minSupport in (0, 1]")
    val bi = df.select(col(basketCol).as("__basket"), col(itemCol).as("__item"))
      .filter(col("__basket").isNotNull && col("__item").isNotNull)
      .distinct()
    val nBaskets = bi.agg(countDistinct(col("__basket")).as("__n_baskets"))
    val itemCnt = bi.groupBy(col("__item"))
      .agg(count(lit(1)).as("__n_item"))
    val frequent = itemCnt.crossJoin(broadcast(nBaskets))
      .filter(col("__n_item") >= col("__n_baskets") * minSupport)
      .select(col("__item"), col("__n_item"))
    val baskets = bi
      .join(broadcast(frequent.select(col("__item"))), Seq("__item"), "leftsemi")
      .groupBy(col("__basket"))
      .agg(sort_array(collect_set(col("__item"))).as("__items"))
      .filter(size(col("__items")) <= maxBasketItems ||
        raise_error(concat(lit(s"basketRules: basket wider than $maxBasketItems items: "),
          col("__basket").cast("string"))))
    val pairCnt = baskets
      .select(explode(expr(
        """flatten(transform(__items, (x, i) ->
             transform(slice(__items, i + 2, size(__items)),
               y -> struct(x AS a, y AS b))))""")).as("__p"))
      .groupBy(col("__p.a").as("__a"), col("__p.b").as("__b"))
      .agg(count(lit(1)).as("__n_pair"))
    // count lookups join the RAW item counts (not `frequent`): the final
    // support filter re-applies the threshold, and this keeps the one-row
    // basket-count gate out of the lookup branches — itemCnt's exchange is
    // identical in both, so AQE reuses it instead of re-aggregating
    val na = itemCnt.select(col("__item").as("__a"), col("__n_item").as("__n_a"))
    val nb = itemCnt.select(col("__item").as("__b"), col("__n_item").as("__n_b"))
    pairCnt
      .join(broadcast(na), Seq("__a"))
      .join(broadcast(nb), Seq("__b"))
      .crossJoin(broadcast(nBaskets))
      .select(explode(array(
        struct(col("__a").as("antecedent"), col("__b").as("consequent"),
          col("__n_pair"), col("__n_a").as("__n_ante"), col("__n_b").as("__n_cons"),
          col("__n_baskets")),
        struct(col("__b").as("antecedent"), col("__a").as("consequent"),
          col("__n_pair"), col("__n_b").as("__n_ante"), col("__n_a").as("__n_cons"),
          col("__n_baskets")))).as("__r"))
      .select(
        col("__r.antecedent").as("antecedent"),
        col("__r.consequent").as("consequent"),
        col("__r.__n_pair").as("n_pair"),
        (col("__r.__n_pair") / col("__r.__n_baskets")).as("support"),
        (col("__r.__n_pair") / col("__r.__n_ante")).as("confidence"),
        (col("__r.__n_pair") / col("__r.__n_ante") * col("__r.__n_baskets")
          / col("__r.__n_cons")).as("lift"))
      .filter(col("support") >= minSupport && col("confidence") >= minConfidence)
  }

  /** 2-attribute skyline (Pareto frontier): the distinct (`minCol`,
    * `maxCol`) cells no other row dominates — dominance = `<=` on the
    * minimized attribute and `>=` on the maximized one, strict on at
    * least one. The multi-objective "best tradeoff" operator relational
    * engines lack natively (every cheaper row is smaller, every larger
    * row is pricier).
    *
    * Sort-scan algorithm over DISTINCT cells: ordered by (minCol asc,
    * maxCol desc), every EARLIER cell is a dominance candidate (strictly
    * cheaper, or same price and strictly larger — cells are distinct, so
    * the ambiguity between `>=` and `>` never arises), and a cell is on
    * the frontier iff its maxCol beats the running max. Scale shape: one
    * distributed hash agg to cells, then the running max rides
    * [[Rank.prefixMax]]'s two-phase distributed scan — the cells frame
    * of a CONTINUOUS attribute pair is not structurally bounded (it can
    * approach the table's cardinality), so no single-partition window
    * anywhere in the plan; both attributes must be numeric (the scan
    * quantile-buckets on `minCol`). NULL in either attribute can't
    * rank — those rows are excluded.
    *
    * Output: (minCol, maxCol, n_rows) frontier cells, original names.
    */
  /** d-attribute skyline (Pareto frontier, d >= 2): the distinct cells
    * over `minCols ++ maxCols` no other cell dominates (`<=` on every
    * minimized, `>=` on every maximized attribute, strict somewhere).
    * [[skyline2]]'s sort-scan is 2-attribute-only — past two dimensions
    * there is no total order whose prefix carries the frontier, so this
    * is the classic distributed LOCAL-SKYLINE-THEN-MERGE:
    *
    *  1. one hash agg to distinct cells (+ row counts);
    *  2. a per-partition frontier scan (`mapPartitions` — genuinely
    *     imperative per-partition logic: each point tests against and
    *     prunes a running frontier; no join/window composition expresses
    *     local-then-merge without going quadratic in the CELLS) keeps
    *     each partition's local skyline. EXACT under any partitioning:
    *     a global skyline point is dominated by nothing, so it survives
    *     its partition; and any dominated point's maximal dominator
    *     chain ends at a skyline point (transitivity), so no false
    *     positives survive the merge;
    *  3. the merged candidates — typically a few hundred cells — fold
    *     through the SAME frontier scan in one partition, with a LOUD
    *     guard at `maxCandidates` (a frontier that big means the
    *     attributes are anti-correlated noise and the skyline is not a
    *     useful summary; raise, don't silently crawl).
    *
    * All attributes must be numeric (dominance compares doubles;
    * maximized attributes are negated internally and restored on
    * output); rows with a NULL in any attribute can't rank and are
    * excluded ([[skyline2]]'s contract). Output: the attribute columns
    * (as doubles, original orientation) + `n_rows` per frontier cell.
    */
  def skylineN(
      df: DataFrame,
      minCols: Seq[String],
      maxCols: Seq[String],
      maxCandidates: Int = 200000): DataFrame = {
    val names = minCols ++ maxCols
    val d = names.size
    require(d >= 2, "skylineN: need at least two attributes")
    require(names.distinct.size == d, "skylineN: attributes must be distinct")
    names.foreach(c => require(df.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"skylineN: attribute '$c' must be numeric (dominance compares " +
        s"doubles), got ${df.schema(c).dataType.simpleString}"))
    val oriented = minCols.map(c => col(c).cast("double").as(c)) ++
      maxCols.map(c => (-col(c).cast("double")).as(c))
    val cells = df.select(oriented: _*)
      .filter(names.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(names.map(col): _*).agg(count(lit(1)).as("n_rows"))
    // distinct cells ⇒ all-<= implies strict-somewhere, so dominance is
    // a plain conjunction of <= over the oriented attributes
    def localSky(cap: Int)(it: Iterator[org.apache.spark.sql.Row])
        : Iterator[org.apache.spark.sql.Row] = {
      val frontier = scala.collection.mutable.ArrayBuffer
        .empty[(Array[Double], org.apache.spark.sql.Row)]
      var seen = 0L
      for (r <- it) {
        seen += 1
        if (cap > 0 && seen > cap)
          throw new IllegalStateException(
            s"skylineN: merged candidate set exceeded $maxCandidates cells — " +
              "the local frontiers are data-sized (anti-correlated attributes); " +
              "a skyline over them is not a meaningful summary at this scale")
        val v = Array.tabulate(d)(i => r.getDouble(i))
        val dominated = frontier.exists { case (q, _) =>
          var i = 0; var le = true
          while (le && i < d) { le = q(i) <= v(i); i += 1 }
          le
        }
        if (!dominated) {
          frontier.filterInPlace { case (q, _) =>
            var i = 0; var le = true
            while (le && i < d) { le = v(i) <= q(i); i += 1 }
            !le
          }
          frontier += ((v, r))
        }
      }
      frontier.iterator.map(_._2)
    }
    val enc = org.apache.spark.sql.Encoders.row(cells.schema)
    val local = cells.mapPartitions(localSky(0) _)(enc)
    val global = local.coalesce(1).mapPartitions(localSky(maxCandidates) _)(enc)
    global.select(minCols.map(col) ++
      maxCols.map(c => (-col(c)).as(c)) :+ col("n_rows"): _*)
  }

  def skyline2(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    // The distributed frontier quantile-buckets minCol (Rank.prefixMax
    // casts it to double) — a date/timestamp/string minCol would silently
    // degrade to one bucket or fail mid-plan. Fail loudly at the boundary
    // instead; maxCol only needs an ordering, so any comparable type works.
    require(df.schema(minCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"skyline2: minCol '$minCol' must be numeric (it seeds the " +
        s"distributed frontier's quantile buckets), got " +
        df.schema(minCol).dataType.simpleString)
    val cells = df.select(col(minCol).as("__lo"), col(maxCol).as("__hi"))
      .filter(col("__lo").isNotNull && col("__hi").isNotNull)
      .groupBy(col("__lo"), col("__hi"))
      .agg(count(lit(1)).as("n_rows"))
    Rank.prefixMax(cells, Seq(col("__lo"), col("__hi").desc),
        bucketOn = col("__lo"), value = col("__hi"), out = "__runmax")
      .filter(col("__runmax").isNull || col("__hi") > col("__runmax"))
      .select(col("__lo").as(minCol), col("__hi").as(maxCol), col("n_rows"))
  }
}
