package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Corpus-curation operators a large-scale pre-training pipeline runs
  * between raw ingest and tokenization: eval-set decontamination,
  * deterministic stratified sampling (domain mixing), sequence packing,
  * and PII redaction.
  *
  * Relationship to the inline Catalog rows: `pipeline_contamination`
  * reports the TRAIN side (which corpus docs share a shingle with the
  * probe set); [[decontaminate]] reports the EVAL side (what fraction of
  * each held-out doc leaked) — the number an eval-integrity report needs.
  * `pipeline_sample` certifies md5-bucket sampling end to end;
  * [[sampleStrata]] is the reusable operator form of the same idea.
  * `pipeline_pii_scrub` certifies email scrubbing; [[redactPii]] is the
  * multi-kind (email/phone/IP) library surface.
  *
  * Scale notes (100 TB discipline):
  *  - decontaminate never shuffles the training corpus: the eval side's
  *    distinct shingle set is bounded (eval suites are thousands of docs,
  *    not billions) and broadcast; the train side is one narrow
  *    scan+explode filtered map-side.
  *  - sampleStrata is a stateless per-row hash filter — no shuffle, no
  *    sampleBy Bernoulli draw; the SAME rows survive on every run and on
  *    every engine (pure int64 arithmetic, replayable in plain SQL).
  *  - packSequences shuffles once per source partition (the window sort);
  *    bins never cross sources, so layout stays local at any corpus size.
  *  - redactPii is a pure per-row regexp pass inside whole-stage codegen.
  */
object Curation {

  /** Fraction of each eval document's distinct word `shingleK`-grams that
    * appear ANYWHERE in the training corpus — the standard n-gram
    * decontamination check (an eval doc with high overlap leaked into
    * training data). Returns one row per eval doc:
    * `(eval_id, n_shingles, n_hit, overlap_frac, contaminated)`.
    *
    * Plan shape: eval's distinct shingles (bounded) BROADCAST against the
    * train-side shingle stream; the surviving "hit" shingle set is again
    * bounded by the eval vocabulary, so the only shuffles touch
    * eval-sized data. The 100 TB train corpus is read once, narrow.
    */
  /** Per-group WINSORIZATION: clip a numeric column to its group's
    * `[loQ, hiQ]` quantiles — the standard outlier-taming pass before
    * scoring/statistics (a fat-finger value stops dominating a mean
    * without dropping its row). Output: the input plus
    * `<valueCol>_w` (clipped) and the group's `__lo`/`__hi` bounds
    * dropped — quantiles use linear interpolation (Spark `percentile` ==
    * DuckDB `quantile_cont`, the engine's proven parity pair).
    *
    * Scale note: `exact = true` (the oracled form) runs Spark's exact
    * percentile, whose per-group state is the group's value multiset —
    * fine up to millions of rows per group, wrong tool past that. At
    * 100 TB set `exact = false` for `percentile_approx` (t-digest,
    * bounded state, same plan shape) and accept approximation in the
    * clip bounds. Either way: one agg over the grouped values + one
    * keyed join back — the bounds frame is one row per group, so the
    * join broadcasts when groups are few.
    */
  def winsorize(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      loQ: Double = 0.01,
      hiQ: Double = 0.99,
      exact: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "winsorize: at least one key column")
    require(loQ >= 0 && hiQ <= 1 && loQ <= hiQ,
      "winsorize: need 0 <= loQ <= hiQ <= 1")
    val pct =
      if (exact) expr(s"percentile($valueCol, array($loQ, $hiQ))")
      else expr(s"percentile_approx($valueCol, array($loQ, $hiQ), 10000)")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(pct.as("__b"))
      .select(keys.map(col) :+ col("__b").getItem(0).as("__lo")
        :+ col("__b").getItem(1).as("__hi"): _*)
    df.join(bounds, keys)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      shingleK: Int = 5,
      minOverlap: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val evalSh = eval.select(col(idCol).as("eval_id"),
        explode(Text.shingles(col(textCol), shingleK)).as("sh"))
    // distinct eval vocabulary: bounded, broadcastable
    val evalVocab = evalSh.select(col("sh")).distinct()
    // train shingles that exist in the eval vocabulary — map-side filter of
    // the big scan, then distinct over an eval-vocabulary-bounded set
    val hitVocab = train
      .select(explode(Text.shingles(col(textCol), shingleK)).as("sh"))
      .join(broadcast(evalVocab), Seq("sh"), "left_semi")
      .distinct()
    evalSh
      .join(broadcast(hitVocab.withColumn("__hit", lit(1))), Seq("sh"), "left")
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_hit"))
      .withColumn("overlap_frac",
        round(col("n_hit").cast("double") / col("n_shingles"), 6))
      .withColumn("contaminated", col("overlap_frac") >= minOverlap)
      .select("eval_id", "n_shingles", "n_hit", "overlap_frac", "contaminated")
  }

  /** Multiplicative-hash uniform draw in [0, 2^32): TWO Knuth-style draws
    * — 2654435761 over `id mod 1000003`, and a second odd constant
    * (2246822519, xxHash's PRIME2) over `id mod 999983` (a different
    * prime) — summed mod 2^32. Pure int64 arithmetic that any SQL engine
    * replays bit-for-bit (no engine-specific rand/hash): each product is
    * < 2^20 x 2^32 = 2^52, far from Long overflow. Composing two COPRIME
    * moduli widens the draw's granularity to their product, ~10^12
    * distinct fates (CRT): the old single `mod 1000003` draw made every
    * ~1M-th id share fate — each residue class kept or dropped as a
    * block at billion-doc scale, and stacked [[sampleStrata]] calls
    * composed dependently — whereas here two ids congruent mod 1000003
    * still draw independently through the second modulus.
    *
    * The id is PLAN-GUARDED to a long (the priority samplers'
    * [[guardedLongId]] discipline): a NULL or non-long-castable id
    * would draw NULL, the keep predicate would go NULL, and the row
    * would silently vanish from EVERY knuthDraw-based sampler
    * ([[sampleStrata]], [[sampleByWeight]], [[temperatureMix]]) — the
    * same silent-bias hole the r13 fix closed for the priority family.
    * NON-INTEGRAL numeric ids also raise: `try_cast('long')` silently
    * TRUNCATES a fractional double/decimal (3.2 and 3.9 both draw as
    * 3), so distinct ids would collide in the draw — caught by a
    * double-space roundtrip compare, which is exact for this purpose
    * because every IEEE double with a fractional part is below 2^52
    * where doubles are exact (integral values past 2^53 roundtrip
    * through the same rounding on both sides). Long ids pass through
    * value-identical, so existing draws (and their oracles) are
    * unchanged.
    */
  private def knuthDraw(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val asLong = id.try_cast("long")
    val idL = when(asLong.isNull,
      raise_error(concat(
        lit("deterministic sampler: the id column must be a " +
          "long-castable unique id (it seeds the keep/drop draw), got "),
        coalesce(id.cast("string"), lit("NULL")))).cast("long"))
      .when(!(asLong.cast("double") <=> id.try_cast("double")),
        raise_error(concat(
          lit("deterministic sampler: the id column must be INTEGRAL — " +
            "a fractional id would silently truncate in the draw " +
            "(3.2 and 3.9 would collide as 3), got "),
          id.cast("string"))).cast("long"))
      .otherwise(asLong)
    pmod(
      (pmod(idL, lit(1000003L)) + 1L) * lit(2654435761L) +
        (pmod(idL, lit(999983L)) + 1L) * lit(2246822519L),
      lit(4294967296L))
  }

  /** Deterministic stratified sampling — the domain-mixing step: keep each
    * row of stratum `s` with probability `fractions(s)` (strata absent
    * from the map keep `defaultFraction`). Membership is a pure function
    * of the id (Knuth multiplicative hash), so the sample is reproducible
    * across runs, engines, and cluster sizes — no RNG state, no shuffle,
    * no collect. Returns the surviving rows.
    */
  def sampleStrata(
      df: DataFrame,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 1.0,
      idCol: String = "doc_id"): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0) &&
      defaultFraction >= 0.0 && defaultFraction <= 1.0,
      "sampleStrata: fractions must be in [0, 1]")
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(knuthDraw(col(idCol)) < frac * 4294967296.0)
  }

  /** Temperature-flattened source mixing — the `p^alpha` recipe
    * multilingual/pretraining corpora use to keep high-resource strata
    * from drowning low-resource ones (alpha = 1 reproduces natural
    * proportions, alpha → 0 approaches uniform): stratum `s` with share
    * `p_s = n_s / N` gets sampling weight `q_s ∝ p_s^alpha`, and a
    * total `budget` rows are drawn as per-stratum keep-rates
    * `r_s = min(1, budget · (q_s / Z) / n_s)` (without-replacement
    * clamp — the standard practice when a low-resource stratum's target
    * exceeds its size). The draw itself is [[sampleStrata]]'s certified
    * pure-int64 Knuth hash, so the EXACT surviving set is a function of
    * the ids and SQL-verifiable. A NULL stratum is a stratum of its own
    * — counted, rated, and matched null-safely (the `<=>` discipline of
    * [[prioritySampleByStratum]]); rows never vanish silently on a NULL
    * `strataCol`.
    *
    * Budget semantics, default mode: when a low-resource stratum's
    * target `budget · q_s / Z` exceeds its size `n_s`, the clamp keeps
    * ALL of that stratum and the realized expected total undershoots
    * `budget` by exactly `Σ_clamped (budget · q_s / Z − n_s)` — the
    * residual is NOT redistributed. `exactBudget = true` redistributes
    * it by water-filling: sort strata by `n_s / q_s` ascending (the
    * order in which they saturate), find the maximal clamp prefix, and
    * rate the rest at `λ* · q_s / n_s` where
    * `λ* = (budget − Σ_clamped n) / (Σ_unclamped q)` — the expected
    * total then equals `min(budget, N)` up to the 9dp rate rounding.
    * The prefix scan replaces the usual iterative renormalization (the
    * clamp set under water-filling is always a prefix of the
    * `n_s / q_s` order), so the whole recipe stays one driver-side pass
    * and — at `alpha = 0.5` — stays IEEE-replayable: the sort key is a
    * correctly-rounded division, the running sums fold in that sorted
    * order, and the final rate is one multiply, one divide, one 9dp
    * HALF_UP round, exactly what the pipeline_temperature_mix_exact
    * oracle replays in SQL.
    *
    * Cost: one count aggregate (exchange carries |strata| cells;
    * the driver collect is BOUNDED at `maxStrata` rows by a plan-side
    * limit and raises loudly past it — the keep-rate plan enumerates
    * every stratum as a literal branch, so an accidental
    * high-cardinality strataCol must fail, not OOM the driver or
    * build a million-branch CASE) + one narrow filter — no shuffle of
    * the corpus, no RNG state. Cross-engine replay: with `alpha = 0.5`
    * every step is IEEE-correctly-rounded (integer counts, one exact
    * division, `sqrt`, fixed-order sums — strata ordered by UTF-8 byte
    * order with NULL last, matching SQL collation where Java's UTF-16
    * `compareTo` diverges above the BMP — one 9dp HALF_UP round) and
    * the pipeline_temperature_mix oracles replay the whole recipe;
    * other alphas go through `pow`, which is libm-dependent (the
    * documented reason the priority sampler avoids transcendentals) —
    * fine for use, not for bit-level cross-engine replay.
    */
  def temperatureMix(
      df: DataFrame,
      strataCol: String,
      budget: Long,
      alpha: Double = 0.5,
      idCol: String = "doc_id",
      exactBudget: Boolean = false,
      maxStrata: Int = 10000): DataFrame =
    applyStratumRates(df, strataCol,
      temperatureRates(df, strataCol, budget, alpha, exactBudget, maxStrata),
      idCol)

  /** The FIT half of [[temperatureMix]]: per-stratum keep-rates from one
    * bounded count pass, exposed so the fit can run on a STATIC
    * reference corpus and the filter apply elsewhere — most usefully to
    * a live STREAM via [[applyStratumRates]] (the rate filter is a
    * stateless narrow map, so it is stream-safe; the fit's
    * count+collect is not). Keys are `Option[String]` because NULL is a
    * stratum of its own; rates are the 9dp-rounded values the oracles
    * replay.
    */
  def temperatureRates(
      df: DataFrame,
      strataCol: String,
      budget: Long,
      alpha: Double = 0.5,
      exactBudget: Boolean = false,
      maxStrata: Int = 10000): Seq[(Option[String], Double)] = {
    require(budget > 0, "temperatureMix: budget must be positive")
    require(alpha > 0.0 && alpha <= 1.0,
      "temperatureMix: alpha must be in (0, 1] (1 = natural proportions)")
    require(maxStrata > 0, "temperatureMix: maxStrata must be positive")
    require(df.schema(strataCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"temperatureMix: strataCol '$strataCol' must be a string (the " +
        "keep-rate map keys match on string equality), got " +
        df.schema(strataCol).dataType.simpleString)
    // NULL is a first-class stratum (no isNotNull pre-filter: silent
    // stratum loss is a bias bug); the limit bounds the collect BEFORE
    // rows reach the driver, so the guard below fires on maxStrata + 1
    // rows instead of materializing an unbounded stratum list
    val raw = df
      .groupBy(col(strataCol).as("__s"))
      .agg(count(lit(1)).as("n"))
      .limit(maxStrata + 1)
      .collect()
    require(raw.length <= maxStrata,
      s"temperatureMix: more than $maxStrata distinct strata in " +
        s"'$strataCol' — the keep-rate plan enumerates every stratum as " +
        "a literal branch; stratify coarser or raise maxStrata")
    require(raw.nonEmpty, "temperatureMix: no strata to mix")
    val counts: Seq[(Option[String], Long)] = raw.toSeq
      .map(r => (if (r.isNullAt(0)) None else Some(r.getString(0))) ->
        r.getLong(1))
      .sortBy(_._1)(utf8NullsLast)
    val total = counts.map(_._2).sum.toDouble
    // sqrt (correctly rounded) for the replayable alpha; pow otherwise
    def flat(p: Double): Double =
      if (alpha == 0.5) math.sqrt(p) else math.pow(p, alpha)
    def round9(r: Double): Double =
      BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val qs = counts.map { case (s, n) => (s, n, flat(n / total)) }
    val rates: Seq[(Option[String], Double)] =
      if (!exactBudget) {
        // denominator summed in SORTED-stratum order — the same
        // sequential fold the oracle's ordered running sum replays
        var z = 0.0
        qs.foreach(z += _._3)
        qs.map { case (s, n, q) =>
          s -> round9(math.min(1.0, budget.toDouble * (q / z) / n.toDouble))
        }
      } else {
        // water-filling by prefix scan: strata saturate in n/q order, so
        // the clamp set is a prefix; λ_k = (budget − Σ_{i≤k} n) /
        // (Z − Σ_{i≤k} q) is the water level with the first k strata
        // clamped, and the valid k is the first whose level sits below
        // the next stratum's saturation ratio. Running sums fold in the
        // (ratio, stratum) sort order — the oracle's windowed sums.
        val byRatio = qs.map { case (s, n, q) => (s, n, q, n.toDouble / q) }
          .sortBy(t => (t._4, t._1))(
            Ordering.Tuple2(Ordering.Double.TotalOrdering, utf8NullsLast))
        val m = byRatio.length
        val cn = new Array[Long](m + 1)
        val cq = new Array[Double](m + 1)
        for (i <- 0 until m) {
          cn(i + 1) = cn(i) + byRatio(i)._2
          cq(i + 1) = cq(i) + byRatio(i)._3
        }
        val zTotal = cq(m)
        // first rank (1-based) whose water level clears its ratio; all
        // ranks before it clamp at rate 1. budget ≥ N leaves none.
        var firstSat = m + 1
        var lamStar = 0.0
        var r = 1
        while (r <= m && firstSat > m) {
          val lam = (budget.toDouble - cn(r - 1).toDouble) /
            (zTotal - cq(r - 1))
          if (lam < byRatio(r - 1)._4) { firstSat = r; lamStar = lam }
          r += 1
        }
        byRatio.zipWithIndex.map { case ((s, n, q, _), i) =>
          s -> (if (i + 1 < firstSat) 1.0
                else math.min(1.0, round9(lamStar * q / n.toDouble)))
        }
      }
    rates
  }

  /** The APPLY half of [[temperatureMix]]: keep each row by its
    * stratum's rate through the certified Knuth draw. Every observed
    * stratum (NULL included) carries its rate into ONE FLAT literal-map
    * lookup — `coalesce(try_element_at(map(k₁→f₁, …), stratum),
    * unseen)` — a single expression node with 2·|strata| children. The
    * previous form folded a nested `when().otherwise()` per stratum,
    * which built a |strata|-DEEP expression tree: at the fit's default
    * `maxStrata = 10000` Catalyst's recursive analyzer/optimizer
    * traversals risk a driver StackOverflowError far below the fit's
    * loud guard, turning an in-range input into an opaque JVM error
    * (spec'd at the full 10k cap). Draws are identical: the same rate
    * reaches the same stratum either way.
    *
    * `unseenRate` governs strata ABSENT from `rates` (a moving input,
    * or a stream with strata the static fit never saw):
    * `Some(f)` keeps them at rate `f` (default 0.0 — drop, the
    * temperature-mix semantics: an unfitted stratum has no budget
    * share); `None` RAISES on first contact — the loud option a
    * streaming caller chooses when a never-fitted stratum means the
    * fit is stale, not that its documents should silently vanish.
    * STATELESS narrow filter — no shuffle, no RNG state — so it
    * applies unchanged to a streaming DataFrame (spec-proved
    * batch-identical through MemoryStream).
    */
  def applyStratumRates(
      df: DataFrame,
      strataCol: String,
      rates: Seq[(Option[String], Double)],
      idCol: String = "doc_id",
      unseenRate: Option[Double] = Some(0.0)): DataFrame = {
    require(rates.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
      "applyStratumRates: rates must be in [0, 1]")
    unseenRate.foreach(f => require(f >= 0.0 && f <= 1.0,
      "applyStratumRates: unseenRate must be in [0, 1]"))
    val keyed = rates.collect { case (Some(k), f) => k -> f }
    require(keyed.map(_._1).distinct.length == keyed.length,
      "applyStratumRates: duplicate stratum keys in rates")
    val nullRate = rates.collectFirst { case (None, f) => f }
    // the unseen branch: a literal rate, or a loud per-row raise —
    // coalesce/CaseWhen evaluate lazily, so the raise only fires for
    // rows that actually reach an unfitted stratum
    val unseen: org.apache.spark.sql.Column = unseenRate match {
      case Some(f) => lit(f)
      case None => raise_error(concat(
        lit("applyStratumRates: stratum '"),
        coalesce(col(strataCol), lit("NULL")),
        lit("' is absent from the fitted rates (stale fit?) — refit, " +
          "or pass unseenRate = Some(rate) to keep/drop unseen strata " +
          "silently"))).cast("double")
    }
    // flat lookup: try_element_at (NULL on miss — the ANSI-safe form)
    // over a literal map, one node wide instead of |strata| deep
    val seen: org.apache.spark.sql.Column =
      if (keyed.isEmpty) unseen
      else coalesce(
        try_element_at(
          map_from_arrays(
            typedLit(keyed.map(_._1)),
            typedLit(keyed.map(_._2))),
          col(strataCol)),
        unseen)
    val frac = nullRate match {
      case Some(f) => when(col(strataCol).isNull, lit(f)).otherwise(seen)
      case None => when(col(strataCol).isNull, unseen).otherwise(seen)
    }
    df.filter(knuthDraw(col(idCol)) < frac * 4294967296.0)
  }

  /** UTF-8 byte order (== Unicode code-point order) with NULL sorting
    * LAST — the stratum fold order of [[temperatureMix]]'s replay
    * contract. Java's `String.compareTo` is UTF-16 code-unit order,
    * which diverges from SQL's binary UTF-8 collation for
    * supplementary-plane code points (surrogates sort above U+E000 in
    * UTF-16, below in UTF-8), so a sortBy(_._1) fold could sum the Z
    * denominator in a different order than the oracle's running sum.
    */
  private[graft] val utf8NullsLast: Ordering[Option[String]] =
    new Ordering[Option[String]] {
      def compare(a: Option[String], b: Option[String]): Int = (a, b) match {
        case (None, None) => 0
        case (None, _) => 1
        case (_, None) => -1
        case (Some(x), Some(y)) =>
          val xb = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val yb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var i = 0
          val n = math.min(xb.length, yb.length)
          while (i < n) {
            val c = java.lang.Integer.compare(xb(i) & 0xff, yb(i) & 0xff)
            if (c != 0) return c
            i += 1
          }
          java.lang.Integer.compare(xb.length, yb.length)
      }
    }

  /** Deterministic per-row WEIGHTED sampling: keep each row with
    * probability `weightCol` (clamped to [0, 1]) — quality- or
    * length-proportional downsampling, the continuous generalization of
    * [[sampleStrata]]. Membership is the same pure-int64 Knuth draw over
    * the id, so the sample is reproducible across runs/engines/cluster
    * sizes and the EXACT surviving set is SQL-verifiable (the
    * `pipeline_weighted_sample` row oracles the draw itself in DuckDB).
    * One narrow filter: no RNG state, no shuffle, no collect.
    */
  def sampleByWeight(
      df: DataFrame,
      weightCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0))
    df.filter(knuthDraw(col(idCol)) < w * 4294967296.0)
  }

  /** Deterministic fixed-size WEIGHTED sample without replacement —
    * priority sampling (Duffield–Lund–Thorup, JACM 2007): each row gets
    * priority `q = w / u` with `u` a (0,1] uniform derived from md5 of
    * its id, and the k HIGHEST priorities are the sample. This is the
    * global "exactly k rows, inclusion probability ~ proportional to
    * weight" sampler the fractional forms can't express
    * ([[sampleByWeight]] fixes the RATE, not the size; a global
    * `row_number` window would be the single-partition hazard the rank
    * family exists to avoid). Output: the k sampled rows plus their
    * `priority` and `w_hat = max(w, tau)` where `tau` is the (k+1)-th
    * priority — the unbiased Horvitz–Thompson-style weight-sum estimator
    * the paper proves (near-)optimal; when the population has at most k
    * rows, `tau = 0` and the sample is exhaustive with `w_hat = w`.
    *
    * Determinism, cross-engine: `u = (U+1)/2^52` from the first 13 hex
    * chars of md5(id) — the numerator is an exact <= 2^52 integer, the
    * divisor an exact power of two (exponent shift, no rounding), and
    * the single `w/u` IEEE division is correctly rounded on every
    * engine, so priorities (and therefore the EXACT sample and
    * estimators) are bit-identical in Spark and the DuckDB oracle —
    * transcendental-free on purpose (the classic `u^(1/w)` exponential
    * key of Efraimidis–Spirakis is libm-dependent and not replayable).
    *
    * Scale shape: one narrow scan into the map-side [[graft.functions
    * .expressions.TopKBy]] partial aggregate (per-partition top-(k+1)
    * buffers merged, never a global sort, never a single-partition
    * window), then the k winners broadcast-joined back for their full
    * rows and the scalar `tau` attached as a one-row broadcast. Weights
    * must be positive (ENFORCED in the plan, the [[capPerStratum]]
    * discipline — the weight is data, a driver-side require can't see
    * it); a zero/negative/non-numeric weight raises loudly. The id
    * column carries the SAME plan-guard: the winner set is keyed on
    * `idCol` cast to long, so a non-long-castable id (a string doc-id
    * corpus, a NULL) would silently vanish from the TopKBy buffer and
    * the join-back — the exact silent-bias failure the weight guard
    * exists to prevent, one column over. Ids must also be UNIQUE: a
    * duplicated id fans out the winner join and returns more than `k`
    * rows (enforced in specs, documented here — a global distinct-count
    * would cost a full extra aggregate per call).
    */
  def prioritySample(
      df: DataFrame,
      k: Int,
      weightCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "prioritySample: k must be positive")
    val raw = col(weightCol)
    val w = when(raw.cast("double").isNull || raw.cast("double") <= 0.0,
        raise_error(concat(
          lit(s"prioritySample: weight column '$weightCol' must be a " +
            "positive numeric value, got "),
          raw.cast("string"))).cast("double"))
      .otherwise(raw.cast("double"))
    val idL = guardedLongId(col(idCol), idCol, "prioritySample")
    val arr = df
      .select(priorityKey(col(idCol), w).as("__pri"), idL.as("__id"))
      .agg(graft.functions.expressions.TopKExpressions
        .topk_by_scored(col("__pri"), col("__id"), k + 1).as("arr"))
    // tau = the (k+1)-th priority (0.0 when the population fits in k);
    // `get` is 0-based and NULL-safe out of bounds (never ANSI-throws)
    val sel = arr
      .select(explode(slice(col("arr"), 1, k)).as("e"),
        coalesce(get(col("arr"), lit(k))("score"), lit(0.0)).as("__tau"))
      .select(col("e.id").as("__sel_id"), col("e.score").as("priority"),
        col("__tau"))
    // try_cast on the probe side: the winner build (where the guard
    // lives) always executes before the broadcast probe streams, so a
    // malformed id has already raised OUR error by the time this side
    // would see it — a plain ANSI cast here could race in first with
    // the generic message
    df.join(broadcast(sel), col(idCol).try_cast("long") === col("__sel_id"))
      .withColumn("w_hat",
        greatest(col(weightCol).cast("double"), col("__tau")))
      .drop("__sel_id", "__tau")
  }

  /** [[prioritySample]] PER STRATUM: exactly `k` weight-proportional
    * rows from EVERY stratum (balanced corpus construction — "200
    * weight-proportional docs per language"), where the global form
    * would let heavy strata crowd light ones out and
    * [[sampleFixedPerStratum]] ignores weights. One aggregate keyed by
    * the stratum (map-side TopKBy partials, so the exchange carries at
    * most k+1 pairs per stratum per partition — never a per-stratum
    * window sort), winners broadcast back with their stratum's tau.
    * Same bit-stable `w/u` priority key, so the exact per-stratum
    * sample and `w_hat` estimators replay in the oracle. Same id
    * plan-guard as [[prioritySample]] (a non-long-castable id raises
    * instead of silently emptying the sample); a NULL stratum is a
    * stratum like any other — the winner join-back is null-safe
    * (`<=>`), so NULL-stratum winners survive instead of being
    * silently dropped by a plain equi-join.
    *
    * Scale bound: the winner frame broadcast back is `k × |strata|`
    * rows — fine for domain/language-like strata, but at millions of
    * strata the broadcast (not the corpus scan) becomes the bound, so
    * the winner frame streams through a single-partition counter that
    * raises loudly past `maxBroadcastWinners` rows (the
    * [[graft.operators.Analytics.skylineN]] cap discipline; reduce `k`
    * or stratify coarser). The counter never materializes the frame —
    * rows stream through it into the broadcast that was going to
    * single-node them anyway.
    */
  def prioritySampleByStratum(
      df: DataFrame,
      k: Int,
      weightCol: String,
      strataCol: String,
      idCol: String = "doc_id",
      maxBroadcastWinners: Int = 200000): DataFrame = {
    require(k > 0, "prioritySampleByStratum: k must be positive")
    require(maxBroadcastWinners > 0,
      "prioritySampleByStratum: maxBroadcastWinners must be positive")
    val raw = col(weightCol)
    val w = when(raw.cast("double").isNull || raw.cast("double") <= 0.0,
        raise_error(concat(
          lit(s"prioritySampleByStratum: weight column '$weightCol' must " +
            "be a positive numeric value, got "),
          raw.cast("string"))).cast("double"))
      .otherwise(raw.cast("double"))
    val idL = guardedLongId(col(idCol), idCol, "prioritySampleByStratum")
    val arr = df
      .select(col(strataCol).as("__stratum"),
        priorityKey(col(idCol), w).as("__pri"), idL.as("__id"))
      .groupBy(col("__stratum"))
      .agg(graft.functions.expressions.TopKExpressions
        .topk_by_scored(col("__pri"), col("__id"), k + 1).as("arr"))
    val selRaw = arr
      .select(col("__stratum"),
        explode(slice(col("arr"), 1, k)).as("e"),
        coalesce(get(col("arr"), lit(k))("score"), lit(0.0)).as("__tau"))
      .select(col("__stratum"), col("e.id").as("__sel_id"),
        col("e.score").as("priority"), col("__tau"))
    val enc = org.apache.spark.sql.Encoders.row(selRaw.schema)
    val cap = maxBroadcastWinners
    val sel = selRaw.repartition(1).mapPartitions { it =>
      var n = 0L
      it.map { r =>
        n += 1
        if (n > cap) throw new IllegalStateException(
          s"prioritySampleByStratum: winner set exceeded $cap rows " +
            "(k x |strata|) — the broadcast join-back would bottleneck " +
            "on a single node; reduce k, stratify coarser, or raise " +
            "maxBroadcastWinners")
        r
      }
    }(enc)
    df.join(broadcast(sel),
        col(idCol).try_cast("long") === col("__sel_id") &&
          col(strataCol) <=> col("__stratum"))
      .withColumn("w_hat",
        greatest(col(weightCol).cast("double"), col("__tau")))
      .drop("__sel_id", "__stratum", "__tau")
  }

  /** The shared id plan-guard of the priority samplers: `idCol` cast to
    * long, raising loudly on a non-long-castable value (NULL, a string
    * doc-id) — the winner set and join-back are keyed on this cast, so
    * without the guard such rows silently vanish from the sample.
    */
  private[graft] def guardedLongId(id: org.apache.spark.sql.Column,
      idCol: String, op: String): org.apache.spark.sql.Column =
    // try_cast, not cast: under ANSI (the Spark 4 default) a plain cast
    // of a malformed id throws the generic CAST_INVALID_INPUT before
    // this guard's condition can see the NULL — try_cast yields the
    // NULL the guard exists to catch, so the error names the contract
    when(id.try_cast("long").isNull,
      raise_error(concat(
        lit(s"$op: id column '$idCol' must be a long-castable unique " +
          "id (it keys the winner set and the join-back), got "),
        coalesce(id.cast("string"), lit("NULL")))).cast("long"))
      .otherwise(id.try_cast("long"))

  /** The priority-sampling key `w / u`: `u = (U+1)/2^52` with `U` the
    * first 52 md5 bits of the id — every step exact except the final
    * correctly-rounded division, so the key is bit-stable across
    * engines (see [[prioritySample]]).
    */
  private[graft] def priorityKey(id: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    w.cast("double") /
      ((conv(substring(md5(id.cast("string")), 1, 13), 16, 10).cast("long") +
        lit(1L)).cast("double") / lit(4503599627370496.0))

  /** Deterministic fixed-SIZE sample per stratum — eval-set construction
    * ("exactly 100 docs per language"), where the fractional samplers
    * can't hit an exact count: rank rows within each stratum by the md5
    * of their id (a stable pseudo-random order, id as tie-break) and
    * keep the first `n`. One window shuffle on the stratum; membership
    * is a pure function of the population + id, so the sample only
    * changes when the population does, and the EXACT set is
    * SQL-verifiable.
    */
  def sampleFixedPerStratum(
      df: DataFrame,
      strataCol: String,
      n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, "sampleFixedPerStratum: n must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n).drop("__rk")
  }

  /** Deterministic per-stratum BUDGET cap — the RefinedWeb-style
    * per-domain cap: within each stratum, keep documents in the stable
    * md5(id) order while the running total of `weightCol` stays within
    * `budget`, drop the rest. With no `weightCol` every row weighs 1
    * and this is the plain top-N-rows-per-domain cap; with a token or
    * char weight it is the "at most B tokens from any one domain"
    * mixing rule — the cap form [[sampleStrata]] (a fraction) and
    * [[sampleFixedPerStratum]] (an exact count for eval sets) don't
    * express. Weights must be positive integral values (ENFORCED in the
    * plan — an offending row raises), so the kept set is a clean
    * prefix of the stratum's md5 order: once the budget trips, every
    * later row is out — membership is a pure function of the
    * population + ids (no RNG), reproducible across runs, engines, and
    * cluster sizes, and the EXACT set is SQL-verifiable
    * (pipeline_domain_cap oracles the window replay).
    *
    * One window shuffle on the stratum — the sampleFixedPerStratum
    * scale shape; per-domain row counts are the skew bound (a domain's
    * rows sort within one partition; cap inputs are per-domain
    * document sets, not the raw corpus).
    */
  def capPerStratum(
      df: DataFrame,
      strataCol: String,
      budget: Long,
      weightCol: Option[String] = None,
      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "capPerStratum: budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // The clean-prefix membership guarantee above REQUIRES positive
    // integral weights: a zero/negative weight would let rows after the
    // budget trip back in, and a fractional weight silently truncated by
    // cast('long') would under-count. Enforce it in the plan (the weight
    // is data, not a parameter — a driver-side require can't see it):
    // any offending row raises a loud executor-side error.
    val wt = weightCol.map { c =>
      val raw = col(c)
      // First disjunct must be cast-based: a non-numeric weight (e.g. a
      // string column) casts to NULL, and with a bare raw.isNull the whole
      // WHEN condition would evaluate NULL and fall through to
      // otherwise(raw.cast('long')) = NULL — a silent zero-weight row that
      // breaks the clean-prefix contract instead of raising.
      when(raw.cast("double").isNull || raw.cast("double") <= 0.0 ||
          raw.cast("double") =!= raw.cast("long").cast("double"),
        raise_error(concat(
          lit(s"capPerStratum: weight column '$c' must be a positive " +
            "integral value (clean-prefix cap contract), got "),
          raw.cast("string"))).cast("long"))
        .otherwise(raw.cast("long"))
    }.getOrElse(lit(1L))
    df.withColumn("__cum", sum(wt).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Deterministic leakage-free train/val/test split: every row gets a
    * `split` label as a pure function of its id (16-bit md5 bucket, the
    * [[Catalog]] `pipeline_sample` convention), cut by cumulative
    * fractions — val takes buckets `[0, valFrac)`, test
    * `[valFrac, valFrac+testFrac)`, train the rest. Purity is the whole
    * point: membership never changes across reruns, retries, engines, or
    * cluster sizes (a `rand()` split silently leaks rows between splits
    * on every retry), and the EXACT assignment is SQL-verifiable. One
    * narrow projection — no RNG state, no shuffle, no collect.
    */
  def trainValTestSplit(
      df: DataFrame,
      valFrac: Double,
      testFrac: Double,
      idCol: String = "doc_id"): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0,
      "trainValTestSplit: fractions must be non-negative and sum to <= 1")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("int")
    df.withColumn("split",
      when(bucket < (valFrac * 65536).toInt, "val")
        .when(bucket < ((valFrac + testFrac) * 65536).toInt, "test")
        .otherwise("train"))
  }

  /** Sequence packing: documents concatenate in id order WITHIN their
    * source and chunk at `budget`-token boundaries (a doc spanning a
    * boundary splits across bins — the standard concat-then-chunk packing
    * of pre-training pipelines, no padding waste). Returns one row per
    * doc: `(doc_id, source, n_tokens, first_bin, last_bin, n_bins)` where
    * bin ids count from 0 per source.
    *
    * One window sort per source partition; bins never cross sources, so
    * the layout is reproducible shard-by-shard at any corpus size.
    */
  def packSequences(
      docs: DataFrame,
      budget: Int,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, "packSequences: budget must be positive")
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = docs
      .select(col(idCol), col(sourceCol),
        Text.bpeTokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("__start", col("__cum") - col("n_tokens"))
    withCum.select(
      col(idCol), col(sourceCol), col("n_tokens"),
      floor(col("__start") / budget).as("first_bin"),
      // an empty doc sits at its start boundary; a non-empty doc's last
      // token is at offset __cum - 1
      when(col("n_tokens") === 0, floor(col("__start") / budget))
        .otherwise(floor((col("__cum") - 1) / budget)).as("last_bin"))
      .withColumn("n_bins", col("last_bin") - col("first_bin") + 1)
  }

  /** Deterministic global shuffle into training shards: every row gets an
    * engine-portable pseudo-random key (md5 of its id — no RNG state, the
    * same hash family `pipeline_sample` certifies), the key's leading 32
    * bits pick the shard, and rows order WITHIN their shard by (key, id).
    * The training order is a pure function of the ids: reproducible
    * across runs, engines, and cluster sizes, and verifiable row-by-row
    * in plain SQL — which `ORDER BY rand()` can never be.
    * Returns `(<idCol>, shard, pos)` with pos counting from 0 per shard.
    *
    * Scale shape: one narrow projection + one window per SHARD (each
    * reducer sorts one shard — size numShards to the target cluster the
    * same way you size bucket counts; the md5 key distributes rows
    * uniformly, so shards stay balanced at any corpus size).
    */
  def shuffleShards(
      docs: DataFrame,
      numShards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, "shuffleShards: numShards must be positive")
    val key = md5(col(idCol).cast("string"))
    val shard = pmod(conv(substring(key, 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("__key"), col(idCol))
    docs.select(col(idCol), key.as("__key"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Sliding-window document chunking — the RAG/indexing splitter: token
    * windows of `chunkTokens` starting every `strideTokens` (overlap =
    * chunkTokens - strideTokens), the last window clipped at the doc end.
    * Every doc yields at least one chunk (a short doc is its own chunk),
    * and every token is covered. Returns
    * `(<idCol>, chunk_id, chunk_text, chunk_tokens)`, chunk_id 0-based.
    *
    * Scale shape: one narrow explode — sequence() builds the chunk-start
    * list per row and slice() cuts each window from the already-split
    * token array, all codegen'd natives, no shuffle at all; the fan-out
    * is ~n_tokens/strideTokens rows per doc, the output's inherent size.
    * Chunk identity is a pure function of (doc, position), so the split
    * is reproducible across runs/engines and SQL-verifiable.
    */
  def chunkDocuments(
      docs: DataFrame,
      chunkTokens: Int,
      strideTokens: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      "chunkDocuments: need 0 < strideTokens <= chunkTokens")
    // last chunk start: the smallest multiple of stride from which the
    // window reaches the doc end — ceil((n - chunk)/stride), floored at 0
    val nChunksM1 = greatest(
      ceil((col("__n") - chunkTokens) / lit(strideTokens.toDouble)), lit(0.0))
      .cast("long")
    docs
      .select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), nChunksM1)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        array_join(slice(col("__toks"),
          (col("chunk_id") * strideTokens + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(col("__n") - col("chunk_id") * strideTokens, lit(chunkTokens.toLong))
          .as("chunk_tokens"))
  }

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  private val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction: emails, phone numbers, and IPv4 literals replaced by
    * typed placeholder tags, with per-kind match counts. The patterns are
    * RE2-compatible (no backrefs/lookaround) so an external SQL engine
    * verifies the exact same redaction. Returns
    * `(doc_id, n_emails, n_phones, n_ips, redacted)`.
    *
    * Order matters: emails redact FIRST (an email's host part would
    * otherwise half-match the IP pattern after phone/ip passes), then
    * ips, then phones. Each kind's COUNT is computed on the text with the
    * prior kinds already redacted — the same text its replacement pass
    * sees — so `n_<kind>` always equals the number of `<KIND>` tags in
    * `redacted` (counting every kind on the raw text would over-count,
    * e.g. phone-shaped digits inside an email's local part that the
    * email pass already consumed).
    */
  def redactPii(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), emailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipRe, "<IP>")
    docs.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterIp, lit(phoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(afterEmail, lit(ipRe), lit(0))).as("n_ips"),
      regexp_replace(afterIp, phoneRe, "<PHONE>").as("redacted"))
  }

  /** Corpus drift between two dataset versions: the top-`topK` tokens by
    * absolute unigram-probability shift — the distribution check a
    * training pipeline runs before swapping in a new corpus drop (a
    * sudden mover usually means a scraper regression, a boilerplate
    * flood, or a dedup bug, long before any model-level signal).
    * Returns `(tok, p_old, p_new, delta)` — probabilities and the signed
    * shift, 6dp — ordered by |delta| desc then token.
    *
    * Determinism: probabilities are 6dp-rounded BEFORE the delta so the
    * whole comparison replays in plain SQL (the engine-wide decimal
    * discipline); tokens absent from one side count as probability 0 via
    * the full outer join. Scale shape: two token hash aggs (map-side
    * combine) and one vocabulary-sized join — the corpora are each read
    * once, narrow; top-K is orderBy+limit (map-side partial top-K).
    */
  def corpusDrift(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      topK: Int = 20,
      textCol: String = "text"): DataFrame = {
    def probs(docs: DataFrame, p: String): DataFrame = {
      val toks = docs.select(explode(Text.tokens(col(textCol))).as("tok"))
      val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      counts.crossJoin(broadcast(counts.agg(sum(col("c")).as("n"))))
        .select(col("tok"),
          round(col("c").cast("double") / col("n"), 6).cast("decimal(18,6)").as(p))
    }
    probs(oldDocs, "p_old")
      .join(probs(newDocs, "p_new"), Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("p_old"), lit(0).cast("decimal(18,6)")).as("p_old"),
        coalesce(col("p_new"), lit(0).cast("decimal(18,6)")).as("p_new"))
      .withColumn("delta", (col("p_new") - col("p_old")).cast("decimal(18,6)"))
      .orderBy(abs(col("delta")).desc, col("tok"))
      .limit(topK)
      .select(col("tok"),
        col("p_old").cast("double").as("p_old"),
        col("p_new").cast("double").as("p_new"),
        col("delta").cast("double").as("delta"))
  }

  /** The per-document signal block shared by [[corpusReport]] (batch
    * GROUP BY) and
    * [[graft.streaming.EventStream.corpusReportStream]] (stateful
    * integer-sum fold): appends the `__cr_*` integer columns — nonempty
    * token count, char count, code-route flag, U+FFFD count,
    * control-char count, the Latin-argmax flag — off ONE narrow pass
    * over the (NULL-coalesced) text. Because every signal is an
    * integer, ANY downstream summation (hash aggregate, streaming
    * state fold, partial/merge) is association-free and exact.
    */
  private[graft] def corpusSignals(
      docs: DataFrame,
      textCol: String): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val toks = graft.functions.Text.tokens(text)
    docs
      .withColumn("__cr_toks",
        size(filter(toks, t => length(t) > 0)).cast("long"))
      .withColumn("__cr_chars", length(text).cast("long"))
      .withColumn("__cr_code",
        (graft.functions.Text.codeScore(text) >= 0.5).cast("long"))
      .withColumn("__cr_repl", regexp_count(text, lit("\uFFFD")).cast("long"))
      .withColumn("__cr_ctrl", regexp_count(text,
        lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")).cast("long"))
      // the withScriptProfile argmax (fixed tie order, Latin first) as a
      // per-doc integer flag: 1 iff Latin is the tie-winning dominant
      // listed script — decided on exact integer counts, not ratios
      .withColumn("__cr_lat", regexp_count(text, lit("\\p{IsLatin}")).cast("long"))
      .withColumn("__cr_han", regexp_count(text, lit("\\p{IsHan}")).cast("long"))
      .withColumn("__cr_cyr", regexp_count(text, lit("\\p{IsCyrillic}")).cast("long"))
      .withColumn("__cr_ara", regexp_count(text, lit("\\p{IsArabic}")).cast("long"))
      .withColumn("__cr_latdoc",
        (col("__cr_lat") >= col("__cr_han") &&
          col("__cr_lat") >= col("__cr_cyr") &&
          col("__cr_lat") >= col("__cr_ara") &&
          col("__cr_lat") > 0).cast("long"))
  }

  /** Per-source corpus health report — the one-pass dashboard aggregate
    * a pipeline owner reads per crawl/source/shard: document and token
    * volume, average length, how much of the source routes to the code
    * path, and how many replacement characters (broken transcoding) it
    * carries — plus control-char counts (binary-in-text, the
    * [[graft.functions.Text.withEncodingQuality]] C0-minus-whitespace
    * class) and how many documents are script-confirmed Latin (the
    * [[graft.functions.Text.withScriptProfile]] integer-count argmax
    * as a per-doc flag: a non-Latin spike in a Latin-labeled source
    * means mislabeling or transliteration). Every aggregated value is
    * an INTEGER sum — counts, token counts, char counts, a code-route
    * flag on the replayable [[graft.functions.Text.codeScore]]
    * threshold, U+FFFD counts, control-char counts, the Latin flag —
    * so the aggregation is association-free and exact under ANY
    * partitioning (the sqFit min/max discipline applied to a report:
    * no double sums whose value depends on partial-aggregation order);
    * the derived averages/shares are one division + one 6dp round off
    * exact inputs. NULL text counts EXPLICITLY as a zero-length
    * document (coalesced to '' before every signal): a NULL-skipping
    * sum would count the doc in n_docs but exclude its damage from
    * every numerator, silently deflating the averages — the same
    * silent-bias class the samplers raise on. One narrow per-row pass
    * into one hash aggregate keyed on the source — map-side partial
    * combine, |sources| output rows.
    */
  def corpusReport(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    corpusSignals(docs, textCol)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__cr_toks")).as("n_tokens"),
        sum(col("__cr_chars")).as("n_chars"),
        sum(col("__cr_code")).as("n_code_docs"),
        sum(col("__cr_repl")).as("n_repl_chars"),
        sum(col("__cr_ctrl")).as("n_ctrl_chars"),
        sum(col("__cr_latdoc")).as("n_latin_docs"))
      .withColumn("avg_tokens",
        round(col("n_tokens").cast("double") / col("n_docs"), 6))
      .withColumn("avg_chars",
        round(col("n_chars").cast("double") / col("n_docs"), 6))
      .withColumn("latin_share",
        round(col("n_latin_docs").cast("double") / col("n_docs"), 6))
  }
}
