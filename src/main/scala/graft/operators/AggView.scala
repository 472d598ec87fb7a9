package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate views — the LSM write
  * discipline (reference: `kv/lsm/level.go:82` flushes immutable runs,
  * `kv/lsm/compact.go:124-226` folds them in the background, readers
  * merge across levels) applied to GROUP BY state. A view is a set of
  * PARTIAL-aggregate generations on disk: the base build and every append
  * each contribute one key-partitioned parquet root of
  * `(keys..., __cnt, m__sum, m__min, m__max)` rows; a read merges the
  * roots with one re-aggregation (merge-on-read, the LWW-resolve shape);
  * [[compactAggView]] folds them back to one root (the compaction);
  * appends are exactly-once under a batch tag (the manifest fence every
  * index family here shares), so a Structured Streaming `foreachBatch`
  * replay converges.
  *
  * Why partial aggregates: count/sum/min/max are commutative monoids, so
  * a delta batch folds into the view WITHOUT re-reading the base data —
  * refresh cost is O(delta), the whole point at 100 TB (re-running the
  * full GROUP BY is exactly the "rewrite the level on every append"
  * anti-pattern the reference's LSM exists to avoid). avg finalizes as
  * sum/cnt at read time.
  *
  * Determinism: metric values are cast to `decimal(18, scale)` PER ROW at
  * ingest (the determinism boundary — the same cast replays in plain
  * SQL), then summed as decimals, so the merged view is bit-identical to
  * a one-shot GROUP BY over the union of all ingested batches at ANY
  * partitioning and ANY append order; the Catalog row `q_agg_view` is
  * FULLY oracled on that property.
  *
  * Scale shape: each root is hash-partitioned on the group keys (`pk`),
  * so [[lookupAggView]] point reads prune to one partition; a root's size
  * is bounded by KEY CARDINALITY, not ingested rows — the read-side merge
  * union touches aggregate state only. Roots accumulate per append;
  * [[maintainAggView]] is the fold policy that keeps the root count flat
  * (the text/IVF/near-dup `maintain` contract).
  */
object AggView {

  private[operators] final case class AggViewManifest(
      keys: Seq[String],
      metrics: Seq[String],
      scale: Int,
      numBuckets: Int,
      roots: Vector[String],
      appliedTags: Vector[String] = Vector.empty,
      tagHighWater: Long = -1L,
      nRows: Long = 0L,
      distinctCols: Seq[String] = Nil,
      // equi-width histogram state (mergeable percentiles): one shared
      // (lo, hi, bins) config; per column, bins+2 count columns
      // (underflow | bins | overflow). Absent on pre-round-8 views
      // (json4s fills the defaults), which therefore read unchanged.
      histCols: Seq[String] = Nil,
      histLo: Double = 0.0,
      histHi: Double = 0.0,
      histBins: Int = 0)

  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
  private val lock = new Object

  private def numericTag(t: String): Option[Long] =
    if (t.nonEmpty && t.length <= 18 && t.forall(c => c >= '0' && c <= '9'))
      Some(java.lang.Long.parseLong(t))
    else None

  private def tagApplied(m: AggViewManifest, tag: String): Boolean =
    numericTag(tag) match {
      case Some(v) => v <= m.tagHighWater ||
        m.appliedTags.exists(numericTag(_).contains(v))
      case None => m.appliedTags.contains(tag)
    }

  private def recordTag(m: AggViewManifest, tag: String): AggViewManifest =
    numericTag(tag) match {
      case Some(v) => m.copy(tagHighWater = math.max(m.tagHighWater, v))
      case None => m.copy(appliedTags = m.appliedTags :+ tag)
    }

  // stamp cache (size+mtime revalidation — the shared manifest pattern);
  // `manifestParses` counts actual parses so a spec can pin the cache
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, AggViewManifest)]()
  private[operators] val manifestParses = new java.util.concurrent.atomic.AtomicLong(0L)

  private[operators] def readManifest(spark: SparkSession, viewDir: String,
      fresh: Boolean = false): Option[AggViewManifest] = {
    val p = new org.apache.hadoop.fs.Path(s"$viewDir/MANIFEST.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = try Some(fs.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None => manifestCache.remove(viewDir); None
      case Some(s) =>
        val cached = manifestCache.get(viewDir)
        if (!fresh && cached != null &&
            cached._1 == s.getLen && cached._2 == s.getModificationTime)
          Some(cached._3)
        else {
          val in = fs.open(p)
          val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          val m = org.json4s.jackson.Serialization.read[AggViewManifest](text)
          manifestParses.incrementAndGet()
          manifestCache.put(viewDir, (s.getLen, s.getModificationTime, m))
          Some(m)
        }
    }
  }

  private[operators] def commitIfUnchanged(spark: SparkSession, viewDir: String,
      expected: Option[AggViewManifest], next: AggViewManifest): Unit = {
    if (readManifest(spark, viewDir, fresh = true) != expected)
      throw new IllegalStateException(
        s"concurrent agg-view mutation on $viewDir — aborting; " +
          "staged dirs are unreferenced and reclaimed by vacuumAggView")
    val dst = new org.apache.hadoop.fs.Path(s"$viewDir/MANIFEST.json")
    val tmp = new org.apache.hadoop.fs.Path(s"$viewDir/MANIFEST.json.tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(org.json4s.jackson.Serialization.write(next).getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(dst.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    manifestCache.remove(viewDir)
  }

  private def sumCol(m: String): String = s"${m}__sum"
  private def minCol(m: String): String = s"${m}__min"
  private def maxCol(m: String): String = s"${m}__max"
  private def sumsqCol(m: String): String = s"${m}__sumsq"
  private def hllCol(c: String): String = s"${c}__hll"
  private def histCol(c: String, i: Int): String = s"${c}__h$i"

  private def pkExpr(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets.toLong)).cast("int")

  /** Partial-aggregate one batch into the root schema. The per-row
    * decimal cast is the determinism boundary (see object doc).
    */
  private def partialAgg(df: DataFrame, m: AggViewManifest): DataFrame = {
    val dec = s"decimal(18,${m.scale})"
    val aggs =
      count(lit(1)).as("__cnt") +:
      (m.metrics.flatMap { c =>
        val d = col(c).cast(dec)
        // sumsq is the variance monoid half: decimal(37, 2*scale) per-row
        // squares summed exactly, so merged stddev equals one-shot stddev
        Seq(sum(d).as(sumCol(c)), min(d).as(minCol(c)), max(d).as(maxCol(c)),
          sum((d * d).cast(s"decimal(38,${2 * m.scale})")).as(sumsqCol(c)))
      } ++
      // distinct counting merges as an HLL sketch union — the ONLY sane
      // shape for count-distinct in an incremental view (exact distinct
      // is not a monoid; re-reading the base per refresh is the
      // anti-pattern this operator exists to avoid)
      m.distinctCols.map(c => hll_sketch_agg(col(c)).as(hllCol(c))) ++
      // histogram partials: the SHIFTED bucket index (0 = underflow,
      // 1..bins = in-range, bins+1 = overflow) turns into bins+2
      // conditional sums — all codegen'd in the same single hash-agg
      // pass as every other partial
      m.histCols.flatMap { c =>
        val w = (m.histHi - m.histLo) / m.histBins
        val shifted = least(greatest(
          floor((col(c) - lit(m.histLo)) / lit(w)), lit(-1L)),
          lit(m.histBins.toLong)) + lit(1L)
        (0 to m.histBins + 1).map(i =>
          sum(when(shifted === i, 1L).otherwise(0L)).as(histCol(c, i)))
      })
    df.groupBy(m.keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("pk", pkExpr(m.keys, m.numBuckets))
  }

  /** The merge aggregates over partial columns (shared by read, lookup,
    * and fold): sums add, mins/maxes fold, sketches union.
    */
  private def mergeAggs(m: AggViewManifest): Seq[Column] =
    sum(col("__cnt")).as("__cnt") +:
    (m.metrics.flatMap { c => Seq(
      sum(col(sumCol(c))).as(sumCol(c)),
      min(col(minCol(c))).as(minCol(c)),
      max(col(maxCol(c))).as(maxCol(c)),
      sum(col(sumsqCol(c))).as(sumsqCol(c)))
    } ++
    m.distinctCols.map(c => hll_union_agg(col(hllCol(c))).as(hllCol(c))) ++
    m.histCols.flatMap(c => (0 to m.histBins + 1).map(i =>
      sum(col(histCol(c, i))).as(histCol(c, i)))))

  /** Finalized output columns from merged partials. `m_std` is the
    * population stddev computed in DOUBLE from the exact decimal
    * partials with a fixed operand order — the same expression the
    * oracle runs, so it replays bit-for-bit.
    */
  private def finalizeCols(m: AggViewManifest): Seq[Column] =
    m.keys.map(col) ++ Seq(col("__cnt").as("cnt")) ++
    m.metrics.flatMap { c =>
      val sumD = col(sumCol(c)).cast("double")
      val sqD = col(sumsqCol(c)).cast("double")
      val n = col("__cnt").cast("double")
      Seq(
        round(sumD, m.scale).as(s"${c}_sum"),
        round(col(minCol(c)).cast("double"), m.scale).as(s"${c}_min"),
        round(col(maxCol(c)).cast("double"), m.scale).as(s"${c}_max"),
        round(sumD / col("__cnt"), 6).as(s"${c}_avg"),
        round(sqrt(greatest(lit(0.0), sqD / n - (sumD / n) * (sumD / n))), 6)
          .as(s"${c}_std"))
    } ++
    m.distinctCols.map(c =>
      hll_sketch_estimate(col(hllCol(c))).as(s"${c}_approx_distinct")) ++
    // histogram percentiles: first shifted bucket whose cumulative count
    // reaches q*cnt, reported as that bucket's RIGHT edge (lo + j*w for
    // shifted index j) — deterministic, replays in plain SQL, and within
    // one bin width of the exact quantile for in-range data (the oracled
    // gate's bound). The q*cnt product is computed in DOUBLE on both
    // sides (a decimal literal would round differently).
    m.histCols.flatMap { c =>
      val w = (m.histHi - m.histLo) / m.histBins
      // the bins+2 count columns fold as ONE linear higher-order
      // `aggregate` over an array (a naive shared-cumsum when-chain
      // builds a quadratic expression tree that Catalyst's
      // subexpression-elimination pass spins on for MINUTES at plan
      // time): walk the array once, record the first index whose
      // cumulative count reaches q*cnt, report that bucket's right edge
      val harr = array((0 to m.histBins + 1).map(i => col(histCol(c, i))): _*)
      Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99").map { case (q, tag) =>
        val target = lit(q) * col("__cnt").cast("double")
        val crossing = aggregate(harr,
          struct(lit(0L).as("cum"), lit(-1).as("ans"), lit(0).as("i")),
          (acc, x) => {
            val cum2 = acc.getField("cum") + x
            struct(cum2.as("cum"),
              coalesce(
                when(acc.getField("ans") >= 0, acc.getField("ans")),
                when(cum2.cast("double") >= target, acc.getField("i")),
                lit(-1)).as("ans"),
              (acc.getField("i") + lit(1)).as("i"))
          },
          acc => acc.getField("ans"))
        round(when(crossing >= 0,
          lit(m.histLo) + crossing.cast("double") * lit(w)), 6)
          .as(s"${c}_$tag")
      }
    }

  private def stageRoot(df: DataFrame, viewDir: String, m: AggViewManifest,
      skipIfEmpty: Boolean): Option[(String, Long)] = {
    val n = df.count()
    if (skipIfEmpty && n == 0) return None
    val dir = s"agg-${java.util.UUID.randomUUID}"
    partialAgg(df, m)
      .repartition(col("pk"))
      .write.mode("overwrite").partitionBy("pk").parquet(s"$viewDir/$dir")
    Some((dir, n))
  }

  /** Create a view at `viewDir` over `df`, grouped by `keys`, maintaining
    * count/sum/min/max/avg/std for each of `metrics` (numeric columns,
    * decimal-cast at `scale` — 2 for money, 6 for ratios) and an HLL
    * distinct sketch per `distinctCols` column. Replaces any prior
    * manifest; superseded roots wait for [[vacuumAggView]].
    *
    * Metric columns are assumed NON-NULL: `cnt` counts rows while
    * sum/min/max skip nulls, so a null-bearing metric skews avg/std —
    * `coalesce` or filter upstream if the source permits nulls.
    */
  def buildAggView(
      df: DataFrame,
      viewDir: String,
      keys: Seq[String],
      metrics: Seq[String],
      scale: Int = 2,
      numBuckets: Int = 32,
      distinctCols: Seq[String] = Nil,
      histCols: Seq[String] = Nil,
      histLo: Double = 0.0,
      histHi: Double = 1.0,
      histBins: Int = 64): Unit = lock.synchronized {
    require(keys.nonEmpty, "buildAggView: at least one group key")
    require(metrics.nonEmpty, "buildAggView: at least one metric column")
    require(histCols.isEmpty || (histBins > 0 && histHi > histLo),
      "buildAggView: histogram needs histHi > histLo and histBins > 0")
    val spark = df.sparkSession
    val prior = readManifest(spark, viewDir)
    val m0 = AggViewManifest(keys, metrics, scale, numBuckets, Vector.empty,
      distinctCols = distinctCols, histCols = histCols,
      histLo = histLo, histHi = histHi,
      histBins = if (histCols.isEmpty) 0 else histBins)
    val (dir, n) = stageRoot(df, viewDir, m0, skipIfEmpty = false).get
    commitIfUnchanged(spark, viewDir, prior,
      m0.copy(roots = Vector(dir), nRows = n))
  }

  /** Fold one delta batch into the view: O(delta) — one partial agg over
    * the batch, one root write, one manifest swap; the base roots are
    * NEVER re-read. Exactly-once under `batchTag` (a replayed tag returns
    * false and writes nothing — the streaming fence); an empty batch
    * stages nothing. Returns true when the view changed.
    */
  def appendToAggView(
      viewDir: String,
      df: DataFrame,
      batchTag: Option[String] = None): Boolean = lock.synchronized {
    val spark = df.sparkSession
    val m = readManifest(spark, viewDir).getOrElse(throw new IllegalStateException(
      s"appendToAggView: no readable view manifest at $viewDir"))
    if (batchTag.exists(tagApplied(m, _))) return false
    stageRoot(df, viewDir, m, skipIfEmpty = true) match {
      case None => false
      case Some((dir, n)) =>
        val next = m.copy(roots = m.roots :+ dir, nRows = m.nRows + n)
        try commitIfUnchanged(spark, viewDir, Some(m),
          batchTag.fold(next)(recordTag(next, _)))
        catch { case e: IllegalStateException =>
          new org.apache.hadoop.fs.Path(viewDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(s"$viewDir/$dir"), true)
          throw e
        }
        true
    }
  }

  private def readRoots(spark: SparkSession, viewDir: String,
      m: AggViewManifest): DataFrame =
    m.roots.map(r => spark.read.parquet(s"$viewDir/$r"))
      .reduce(_.unionByName(_))

  /** All roots in ONE datasource scan (guide §6: the 51-separate-reads
    * form paid one file listing + one parquet schema inference + one
    * scan operator PER ROOT — the degraded long-append read's dominant
    * cost was that fixed per-root overhead, not data). Sibling roots
    * trip Spark's multi-path partition discovery
    * (CONFLICTING_DIRECTORY_STRUCTURES), so this reads with
    * `recursiveFileLookup` — no partition columns, one shared file
    * index, one footer inference — which drops the directory-derived
    * `pk`. That is fine for every MERGE consumer (the merge
    * re-aggregates by the group keys and never touches `pk`);
    * [[lookupAggView]] keeps the per-root partition-discovery path
    * because pk-pruned point reads are its whole point.
    *
    * Decimal widening: append roots store `m__sum` as the partial agg's
    * decimal(p+10, s) while FOLD roots store the re-aggregated
    * decimal(38, s) — one sampled footer cannot read both
    * (PARQUET_COLUMN_DATA_TYPE_MISMATCH, caught by AggViewFuzzSpec's
    * fold/append interleavings). The read schema is the first root's
    * footer with every decimal widened to precision 38 at its own scale;
    * Spark 4's vectorized reader widens narrower stored decimals
    * losslessly, and the old unionByName path coerced mixed roots to the
    * same decimal(38, s) anyway, so merged values are bit-identical.
    */
  private def readRootsMerged(spark: SparkSession, viewDir: String,
      m: AggViewManifest): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, StructType}
    val sampled = spark.read.parquet(s"$viewDir/${m.roots.head}").schema
    val widened = StructType(sampled.map { f =>
      f.dataType match {
        case d: DecimalType if !m.keys.contains(f.name) =>
          f.copy(dataType = DecimalType(38, d.scale))
        case _ => f
      }
    }.filterNot(_.name == "pk"))
    spark.read.schema(widened).option("recursiveFileLookup", "true")
      .parquet(m.roots.map(r => s"$viewDir/$r"): _*)
  }

  /** The merged PARTIAL state (keys..., __cnt, m__sum/min/max, one row
    * per key) — the re-aggregation of all roots. Internal merge step for
    * reads and folds.
    */
  private def mergedPartial(spark: SparkSession, viewDir: String,
      m: AggViewManifest): DataFrame = {
    val aggs = mergeAggs(m)
    readRootsMerged(spark, viewDir, m)
      .groupBy(m.keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Read the finalized view: one row per key with
    * `cnt`, and per metric `m`: `m_sum` (scale-dp), `m_min`, `m_max`,
    * `m_avg` (6dp) — bit-identical to a one-shot GROUP BY over everything
    * ever ingested, regardless of how the rows arrived.
    */
  def readAggView(spark: SparkSession, viewDir: String): DataFrame = {
    val m = readManifest(spark, viewDir).getOrElse(throw new IllegalStateException(
      s"readAggView: no readable view manifest at $viewDir"))
    mergedPartial(spark, viewDir, m).select(finalizeCols(m): _*)
  }

  /** Point lookup of one key tuple — prunes every root scan to the key's
    * single `pk` partition (the view's answer to the reference's `Get`:
    * manifest → partition prune → merge). `values` align with the view's
    * `keys`.
    */
  def lookupAggView(spark: SparkSession, viewDir: String,
      values: Seq[Any]): DataFrame = {
    val m = readManifest(spark, viewDir).getOrElse(throw new IllegalStateException(
      s"lookupAggView: no readable view manifest at $viewDir"))
    require(values.length == m.keys.length,
      s"lookupAggView: ${m.keys.length} key values expected")
    val aggs = mergeAggs(m)
    val roots = readRoots(spark, viewDir, m)
    // probe literals are CAST to the stored key types before hashing and
    // comparing — an Int literal probing a Long key column would
    // otherwise xxhash64 to a different pk and read an empty partition
    val keyTypes = m.keys.map(k => roots.schema(k).dataType)
    val typed = m.keys.zip(values).zip(keyTypes)
      .map { case ((k, v), t) => (k, lit(v).cast(t)) }
    val pred = typed.map { case (k, v) => col(k) <=> v }.reduce(_ && _)
    // pk literal prunes the partitioned scan; the key predicate finishes
    // the job inside the pruned partition
    val pkVals = spark.range(1).select(
      typed.map { case (k, v) => v.as(k) }: _*)
      .select(pkExpr(m.keys, m.numBuckets).as("pk"))
      .collect().map(_.getInt(0))
    roots
      .filter(col("pk") === pkVals.head && pred)
      .groupBy(m.keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(finalizeCols(m): _*)
  }

  /** Fold all roots into one (the compaction): the merged partial state
    * is rewritten as a single root, numeric batch tags collapse into the
    * high-water fence, and reads stop paying the multi-root union.
    * Bit-identical before/after by the monoid property. Returns true
    * when a fold ran.
    */
  def compactAggView(spark: SparkSession, viewDir: String): Boolean = lock.synchronized {
    readManifest(spark, viewDir) match {
      case Some(m) if m.roots.size > 1 ||
          m.appliedTags.exists(numericTag(_).isDefined) =>
        val dir = s"agg-${java.util.UUID.randomUUID}"
        mergedPartial(spark, viewDir, m)
          .withColumn("pk", pkExpr(m.keys, m.numBuckets))
          .repartition(col("pk"))
          .write.mode("overwrite").partitionBy("pk").parquet(s"$viewDir/$dir")
        val numeric = m.appliedTags.flatMap(numericTag)
        try commitIfUnchanged(spark, viewDir, Some(m), m.copy(
          roots = Vector(dir),
          appliedTags = m.appliedTags.filter(numericTag(_).isEmpty),
          tagHighWater = (m.tagHighWater +: numeric).max))
        catch { case e: IllegalStateException =>
          new org.apache.hadoop.fs.Path(viewDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(s"$viewDir/$dir"), true)
          throw e
        }
        true
      case _ => false
    }
  }

  /** The auto-fold policy (the shared `maintain` contract): fold when
    * append roots pile past `foldRootsAbove`. Returns true when a fold
    * ran.
    */
  def maintainAggView(spark: SparkSession, viewDir: String,
      foldRootsAbove: Int = 4): Boolean = lock.synchronized {
    readManifest(spark, viewDir) match {
      case Some(m) if m.roots.size > foldRootsAbove =>
        compactAggView(spark, viewDir)
      case _ => false
    }
  }

  /** Delete roots the manifest no longer references (crashed stages,
    * superseded folds) past an age grace for in-flight foreign stages.
    * Returns the number of directories removed.
    */
  def vacuumAggView(spark: SparkSession, viewDir: String,
      minAgeMs: Long = 600000L): Int = lock.synchronized {
    readManifest(spark, viewDir) match {
      case None => 0
      case Some(m) =>
        val root = new org.apache.hadoop.fs.Path(viewDir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val live = m.roots.toSet
        val cutoff = System.currentTimeMillis() - minAgeMs
        val stale = fs.listStatus(root).filter { st =>
          val n = st.getPath.getName
          st.isDirectory && n.startsWith("agg-") &&
            !live.contains(n) && st.getModificationTime <= cutoff
        }
        if (readManifest(spark, viewDir, fresh = true) != Some(m))
          throw new IllegalStateException(
            s"concurrent agg-view mutation on $viewDir during vacuum — aborting")
        stale.foreach(st => fs.delete(st.getPath, true))
        stale.length
    }
  }
}
