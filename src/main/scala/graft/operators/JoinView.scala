package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized JOIN views — delta-join
  * maintenance for the enrichment join every pipeline materializes:
  * an append-only FACT stream equi-joined against an upsertable
  * DIMENSION (LWW per key, deletes as tombstones). The view equals
  * `facts_so_far JOIN dim_current` at every point — the classical IVM
  * contract (`ΔV = Δfact ⋈ dim  ∪  fact ⋈ Δdim`), not the weaker
  * "join-at-ingest-time" snapshot.
  *
  * Architecture (the LSM discipline shared with [[AggView]] and the
  * index families; reference anchors: `kv/lsm/level.go:82` immutable
  * runs, `kv/lsm/compact.go:124` background folds, `kv/file/
  * manifest.go:27` the authoritative root list):
  *
  *  - The view is stored as LEFT-join rows (fact columns + nullable dim
  *    payload + a `__m` matched flag), hash-bucketed on the join key
  *    (`pk` partition column). Storing the unmatched fact rows is what
  *    makes the view self-contained: a dim upsert that creates a NEVER-
  *    BEFORE-SEEN key can heal its orphaned fact rows from the view's
  *    own storage — no re-read of the fact source, ever.
  *  - Fact appends are O(Δfact): delta LEFT JOIN current dim, one new
  *    root, one manifest swap.
  *  - Dim upserts are O(Δdim + affected buckets): the delta's keys
  *    touch a bounded set of pk buckets; ONLY those buckets' view rows
  *    are re-joined (partition-pruned on every root) and written as a
  *    replacement root. The manifest maps each pk bucket to the roots
  *    that own it, so a rebuilt bucket atomically supersedes its old
  *    rows WITHOUT row-level LWW at read time — readers pay a plain
  *    pruned union, never a resolve.
  *  - The dim itself persists as LWW generations (`__seq`, `__del`),
  *    pk-partitioned for pruned bucket rebuilds; [[compactJoinView]]
  *    folds both the view roots and the dim generations.
  *
  * Exactly-once: `batchTag` fences replayed micro-batches (numeric tags
  * collapse into a high-water mark at fold, the shared contract).
  * Crash-safety: roots stage under fresh UUID dirs and become visible
  * only at the manifest swap; a loser of the optimistic commit race
  * deletes its stage and throws; [[vacuumJoinView]] reclaims orphans
  * past an age grace.
  *
  * Scale notes: no driver-side data collects — affected-bucket lists
  * are bounded by `numBuckets`, read from the staged parquet's
  * partition directories. The append join is a plain equi-join (AQE
  * broadcasts a small dim; a large dim shuffles on the key like any
  * keyed join). Bucket rebuilds scan only the affected partitions of
  * each root (parquet partition pruning on `pk`).
  */
object JoinView {

  // `pks` = the pk buckets this root currently OWNS (dim upserts narrow
  // it as bucket ownership moves to rebuild roots); `fullPks` = the
  // buckets the root's parquet dir physically CONTAINS (fixed at stage
  // time). A root whose pks == fullPks needs no per-root bucket filter,
  // which lets a full-view read collapse every such root into ONE
  // datasource scan (see readRaw). Manifests written before fullPks
  // existed deserialize it empty — treated as "unknown, assume
  // narrowed", which safely falls back to the filtered per-root path.
  private[operators] final case class RootEntry(dir: String, pks: Seq[Int],
      fullPks: Seq[Int] = Nil)

  private[operators] final case class JoinViewManifest(
      joinKeys: Seq[String],
      factCols: Seq[String],
      dimCols: Seq[String],
      numBuckets: Int,
      roots: Vector[RootEntry],
      dimRoots: Vector[String],
      nextSeq: Long = 1L,
      // SEPARATE exactly-once fences for the two maintenance families:
      // a fact stream and a dim-CDC stream each number their micro-
      // batches from 0, so one shared high-water would let whichever
      // stream advances first silently fence the other out
      appliedTags: Vector[String] = Vector.empty,
      tagHighWater: Long = -1L,
      dimAppliedTags: Vector[String] = Vector.empty,
      dimTagHighWater: Long = -1L)

  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
  private val lock = new Object

  private def numericTag(t: String): Option[Long] =
    if (t.nonEmpty && t.length <= 18 && t.forall(c => c >= '0' && c <= '9'))
      Some(java.lang.Long.parseLong(t))
    else None

  private def tagApplied(m: JoinViewManifest, tag: String,
      dim: Boolean): Boolean = {
    val (tags, hw) =
      if (dim) (m.dimAppliedTags, m.dimTagHighWater)
      else (m.appliedTags, m.tagHighWater)
    numericTag(tag) match {
      case Some(v) => v <= hw || tags.exists(numericTag(_).contains(v))
      case None => tags.contains(tag)
    }
  }

  private def recordTag(m: JoinViewManifest, tag: String,
      dim: Boolean): JoinViewManifest =
    (numericTag(tag), dim) match {
      case (Some(v), false) => m.copy(tagHighWater = math.max(m.tagHighWater, v))
      case (Some(v), true) => m.copy(dimTagHighWater = math.max(m.dimTagHighWater, v))
      case (None, false) => m.copy(appliedTags = m.appliedTags :+ tag)
      case (None, true) => m.copy(dimAppliedTags = m.dimAppliedTags :+ tag)
    }

  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, JoinViewManifest)]()

  private[operators] def readManifest(spark: SparkSession, viewDir: String,
      fresh: Boolean = false): Option[JoinViewManifest] = {
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
          val m = org.json4s.jackson.Serialization.read[JoinViewManifest](text)
          manifestCache.put(viewDir, (s.getLen, s.getModificationTime, m))
          Some(m)
        }
    }
  }

  private[operators] def commitIfUnchanged(spark: SparkSession, viewDir: String,
      expected: Option[JoinViewManifest], next: JoinViewManifest): Unit = {
    if (readManifest(spark, viewDir, fresh = true) != expected)
      throw new IllegalStateException(
        s"concurrent join-view mutation on $viewDir — aborting; " +
          "staged dirs are unreferenced and reclaimed by vacuumJoinView")
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

  private def pkExpr(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets)).cast("int")

  /** pk partition values a staged parquet dir actually contains — read
    * from the partition DIRECTORY NAMES (bounded by numBuckets), never
    * from the data.
    */
  private def stagedPks(spark: SparkSession, dir: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("pk="))
      .map(n => n.substring(3).toInt).toSeq.sorted
  }

  /** Current dimension state: LWW per key across generations, tombstones
    * dropped. `pkFilter` prunes every generation scan to the probed
    * buckets (None = full dim).
    */
  private def dimCurrent(spark: SparkSession, viewDir: String,
      m: JoinViewManifest, pkFilter: Option[Seq[Int]]): DataFrame = {
    val gens = m.dimRoots.map { r =>
      val df = spark.read.parquet(s"$viewDir/$r")
      pkFilter.fold(df)(pks => df.filter(col("pk").isin(pks: _*)))
    }.reduce(_.unionByName(_))
    val payload = struct((m.dimCols.map(col) :+ col("__del")): _*)
    gens.groupBy(m.joinKeys.map(col): _*)
      .agg(max_by(payload, col("__seq")).as("__p"))
      .filter(!col("__p.__del"))
      .select((m.joinKeys.map(col) ++
        m.dimCols.map(c => col(s"__p.$c").as(c))): _*)
  }

  /** Left-join a fact slice against the current dim; output carries the
    * fact columns, nullable dim payload, the `__m` matched flag, and the
    * pk bucket column.
    */
  private def joined(facts: DataFrame, dim: DataFrame,
      m: JoinViewManifest): DataFrame =
    facts
      .join(dim.withColumn("__m", lit(true)), m.joinKeys, "left")
      .withColumn("__m", coalesce(col("__m"), lit(false)))
      .withColumn("pk", pkExpr(m.joinKeys, m.numBuckets))

  private def stageViewRoot(spark: SparkSession, viewDir: String,
      df: DataFrame): (String, Seq[Int]) = {
    val dir = s"jv-${java.util.UUID.randomUUID}"
    df.repartition(col("pk"))
      .write.mode("overwrite").partitionBy("pk").parquet(s"$viewDir/$dir")
    (dir, stagedPks(spark, s"$viewDir/$dir"))
  }

  /** Stage one dim generation. `delExpr` is the per-row tombstone flag;
    * when every row is a delete the delta may carry only key columns —
    * payload types then come from the live dim schema so the
    * generations stay union-compatible.
    */
  private def stageDimRoot(spark: SparkSession, viewDir: String,
      delta: DataFrame, m: JoinViewManifest, seq: Long,
      delExpr: Column): (String, Seq[Int]) = {
    val dir = s"jvdim-${java.util.UUID.randomUUID}"
    lazy val dimSchema =
      spark.read.parquet(s"$viewDir/${m.dimRoots.head}").schema
    val have = delta.columns.toSet
    val cols = m.joinKeys.map(col) ++ m.dimCols.map { c =>
      if (have(c)) col(c)
      else lit(null).cast(dimSchema(c).dataType).as(c)
    }
    delta.select((cols :+ lit(seq).as("__seq") :+ delExpr.as("__del")): _*)
      .withColumn("pk", pkExpr(m.joinKeys, m.numBuckets))
      .repartition(col("pk"))
      .write.mode("overwrite").partitionBy("pk").parquet(s"$viewDir/$dir")
    (dir, stagedPks(spark, s"$viewDir/$dir"))
  }

  /** Create the view at `viewDir`: `fact` LEFT-materialized against
    * `dim`, bucketed on `joinKeys` (columns of BOTH inputs; all other
    * column names must be disjoint). Replaces any prior manifest;
    * superseded dirs wait for [[vacuumJoinView]].
    */
  def buildJoinView(
      fact: DataFrame,
      dim: DataFrame,
      viewDir: String,
      joinKeys: Seq[String],
      numBuckets: Int = 32): Unit = lock.synchronized {
    require(joinKeys.nonEmpty, "buildJoinView: at least one join key")
    require(!fact.isEmpty,
      "buildJoinView: empty initial fact — build once data exists " +
        "(an empty partitioned root has no readable schema)")
    val spark = fact.sparkSession
    val factCols = fact.columns.filterNot(joinKeys.contains).toSeq
    val dimCols = dim.columns.filterNot(joinKeys.contains).toSeq
    val clash = factCols.intersect(dimCols)
    require(clash.isEmpty,
      s"buildJoinView: fact/dim column names must be disjoint, got $clash")
    require(!(factCols ++ dimCols).exists(c => c == "pk" || c.startsWith("__")),
      "buildJoinView: pk and __-prefixed column names are reserved")
    val prior = readManifest(spark, viewDir)
    val m0 = JoinViewManifest(joinKeys, factCols, dimCols, numBuckets,
      Vector.empty, Vector.empty)
    val (dimDir, _) = stageDimRoot(spark, viewDir, dim, m0, seq = 0L, lit(false))
    val m1 = m0.copy(dimRoots = Vector(dimDir))
    val (viewDir0, pks) = stageViewRoot(spark, viewDir,
      joined(fact, dimCurrent(spark, viewDir, m1, None), m1))
    commitIfUnchanged(spark, viewDir, prior,
      m1.copy(roots = Vector(RootEntry(viewDir0, pks, pks))))
  }

  /** Fold one fact delta into the view: Δfact LEFT JOIN current dim →
    * one new root; O(Δ), the base roots are never re-read. Exactly-once
    * under `batchTag`; empty deltas stage nothing. Returns true when the
    * view changed.
    */
  def appendFactsToJoinView(
      viewDir: String,
      delta: DataFrame,
      batchTag: Option[String] = None): Boolean = lock.synchronized {
    val spark = delta.sparkSession
    val m = readManifest(spark, viewDir).getOrElse(throw new IllegalStateException(
      s"appendFactsToJoinView: no readable view manifest at $viewDir"))
    if (batchTag.exists(tagApplied(m, _, dim = false))) return false
    if (delta.isEmpty) return false
    val (dir, pks) = stageViewRoot(spark, viewDir,
      joined(delta.select((m.joinKeys ++ m.factCols).map(col): _*),
        dimCurrent(spark, viewDir, m, None), m))
    val next = m.copy(roots = m.roots :+ RootEntry(dir, pks, pks))
    try commitIfUnchanged(spark, viewDir, Some(m),
      batchTag.fold(next)(recordTag(next, _, dim = false)))
    catch { case e: IllegalStateException =>
      new org.apache.hadoop.fs.Path(viewDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(s"$viewDir/$dir"), true)
      throw e
    }
    true
  }

  /** Apply a dim delta (upsert when `delete` is false, tombstone the
    * delta's keys when true) and repair the view: the delta lands as a
    * new dim generation, then ONLY the pk buckets its keys hash to are
    * re-joined — view rows of untouched buckets are never read or
    * written. Exactly-once under `batchTag`. Returns true when applied.
    */
  def upsertDimToJoinView(
      viewDir: String,
      delta: DataFrame,
      delete: Boolean = false,
      batchTag: Option[String] = None): Boolean =
    dimMutate(viewDir, delta, lit(delete), batchTag)

  /** Apply one MIXED CDC dim batch — rows flagged by boolean `delCol`
    * tombstone their keys, the rest upsert — as a single generation and
    * a single bucket repair, so a micro-batch carrying both ops stays
    * atomic under one exactly-once tag (two tagged calls would fence
    * each other out). Delete rows may carry null payloads.
    */
  def applyDimCdcToJoinView(
      viewDir: String,
      delta: DataFrame,
      delCol: String = "__delete",
      batchTag: Option[String] = None): Boolean =
    dimMutate(viewDir, delta.drop("pk"), col(delCol), batchTag)

  private def dimMutate(
      viewDir: String,
      delta: DataFrame,
      delExpr: Column,
      batchTag: Option[String]): Boolean = lock.synchronized {
    val spark = delta.sparkSession
    val m = readManifest(spark, viewDir).getOrElse(throw new IllegalStateException(
      s"upsertDimToJoinView: no readable view manifest at $viewDir"))
    if (batchTag.exists(tagApplied(m, _, dim = true))) return false
    if (delta.isEmpty) return false
    val (dimDir, touched) =
      stageDimRoot(spark, viewDir, delta, m, m.nextSeq, delExpr)
    val mDim = m.copy(dimRoots = m.dimRoots :+ dimDir, nextSeq = m.nextSeq + 1)
    // rebuild ONLY the touched buckets, from the view's own fact columns.
    // Buckets no root owns hold no fact rows — nothing to repair there
    // (a brand-new dim key with no facts yet joins when facts arrive).
    val touchedSet = touched.toSet
    val owned = touched.filter(p => m.roots.exists(_.pks.contains(p)))
    val staged: Option[(String, Seq[Int])] =
      if (owned.isEmpty) None
      else {
        val factSlice = readRaw(spark, viewDir, mDim, Some(owned))
          .select((m.joinKeys ++ m.factCols).map(col): _*)
        Some(stageViewRoot(spark, viewDir,
          joined(factSlice, dimCurrent(spark, viewDir, mDim, Some(owned)), m)))
      }
    // an affected bucket's ownership moves atomically to the rebuild
    // root; roots left owning nothing are dropped (vacuum reclaims them)
    val kept = mDim.roots
      .map(r => r.copy(pks = r.pks.filterNot(touchedSet)))
      .filter(_.pks.nonEmpty)
    val next = mDim.copy(roots = staged match {
      case Some((dir, pks)) if pks.nonEmpty => kept :+ RootEntry(dir, pks, pks)
      case _ => kept
    })
    try commitIfUnchanged(spark, viewDir, Some(m),
      batchTag.fold(next)(recordTag(next, _, dim = true)))
    catch { case e: IllegalStateException =>
      val fs = new org.apache.hadoop.fs.Path(viewDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$viewDir/$dimDir"), true)
      staged.foreach { case (dir, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$viewDir/$dir"), true) }
      throw e
    }
    true
  }

  /** The stored LEFT-join rows (fact cols + nullable dim payload + __m),
    * each pk bucket read from exactly the roots that own it.
    */
  private def readRaw(spark: SparkSession, viewDir: String,
      m: JoinViewManifest, pkFilter: Option[Seq[Int]]): DataFrame = {
    val wanted = pkFilter.map(_.toSet)
    val live = m.roots.flatMap { r =>
      val pks = wanted.fold(r.pks)(w => r.pks.filter(w))
      if (pks.isEmpty) None else Some((r, pks))
    }
    if (live.isEmpty)
      throw new IllegalStateException(
        s"readRaw: join view at $viewDir has no live roots for $pkFilter")
    // Full-view read over un-narrowed roots (pks == fullPks: every bucket
    // on disk is still owned) needs NO per-root bucket filter, so all
    // roots collapse into ONE datasource scan — guide §6: the per-root
    // form paid one file listing + one parquet schema inference + one
    // scan operator per root, the dominant cost of a many-append read.
    // Sibling roots trip multi-path partition discovery
    // (CONFLICTING_DIRECTORY_STRUCTURES), so the single scan uses
    // `recursiveFileLookup`, which drops the directory-derived `pk`; pk
    // is re-derived from the join keys by the SAME expression that
    // bucketed the write, so downstream consumers (compact's repartition,
    // the select in readJoinView) see identical values.
    val unNarrowed = live.forall { case (r, pks) =>
      r.fullPks.nonEmpty && r.pks == r.fullPks && pks == r.pks }
    if (unNarrowed && pkFilter.isEmpty && live.size > 1) {
      spark.read.option("recursiveFileLookup", "true")
        .parquet(live.map { case (r, _) => s"$viewDir/${r.dir}" }: _*)
        .withColumn("pk", pkExpr(m.joinKeys, m.numBuckets))
    } else {
      // pruned / narrowed path: per-root reads keep `pk` a partition
      // column so the isin filter prunes at the file index. The parquet
      // schema is inferred ONCE (first root) and passed to the rest —
      // every root is written by the same stage pipeline, so the
      // schemas are identical by construction.
      val sch = spark.read.parquet(s"$viewDir/${live.head._1.dir}").schema
      live.map { case (r, pks) =>
        spark.read.schema(sch).parquet(s"$viewDir/${r.dir}")
          .filter(col("pk").isin(pks: _*))
      }.reduce(_.unionByName(_))
    }
  }

  /** Read the view. `inner = true` (default) yields exactly
    * `facts JOIN dim_current`; `inner = false` yields the LEFT form with
    * unmatched fact rows carrying null dim payload.
    */
  def readJoinView(spark: SparkSession, viewDir: String,
      inner: Boolean = true): DataFrame = {
    val m = readManifest(spark, viewDir).getOrElse(throw new IllegalStateException(
      s"readJoinView: no readable view manifest at $viewDir"))
    val raw = readRaw(spark, viewDir, m, None)
    val base = if (inner) raw.filter(col("__m")) else raw
    base.select((m.joinKeys ++ m.factCols ++ m.dimCols).map(col): _*)
  }

  /** Point lookup of one join-key tuple — the view's answer to the
    * reference's `Get` (`kv/db.go:107-130`: manifest → prune → resolve):
    * the key hashes to ONE pk bucket, only the roots owning that bucket
    * are scanned, and each scan prunes to the single `pk` partition.
    * Returns the inner rows for that key (empty when unmatched/deleted).
    */
  def lookupJoinView(spark: SparkSession, viewDir: String,
      values: Seq[Any]): DataFrame = {
    val m = readManifest(spark, viewDir).getOrElse(throw new IllegalStateException(
      s"lookupJoinView: no readable view manifest at $viewDir"))
    require(values.length == m.joinKeys.length,
      s"lookupJoinView: ${m.joinKeys.length} key values expected")
    val sample = spark.read.parquet(s"$viewDir/${m.roots.head.dir}")
    val typed = m.joinKeys.zip(values)
      .map { case (k, v) => (k, lit(v).cast(sample.schema(k).dataType)) }
    val pk = spark.range(1)
      .select(typed.map { case (k, v) => v.as(k) }: _*)
      .select(pkExpr(m.joinKeys, m.numBuckets).as("pk"))
      .collect().head.getInt(0)
    val pred = typed.map { case (k, v) => col(k) <=> v }.reduce(_ && _)
    val raw =
      if (m.roots.exists(_.pks.contains(pk))) readRaw(spark, viewDir, m, Some(Seq(pk)))
      else sample.filter(lit(false)) // bucket holds no facts at all
    raw.filter(pred && col("__m"))
      .select((m.joinKeys ++ m.factCols ++ m.dimCols).map(col): _*)
  }

  /** Fold the view to one root per family: all view roots into a single
    * full-coverage root, all dim generations into one LWW-resolved
    * generation (tombstones drop — nothing older remains to resurrect).
    * Bit-identical reads before/after. Returns true when a fold ran.
    */
  def compactJoinView(spark: SparkSession, viewDir: String): Boolean = lock.synchronized {
    readManifest(spark, viewDir) match {
      case Some(m) if m.roots.size > 1 || m.dimRoots.size > 1 ||
          m.appliedTags.exists(numericTag(_).isDefined) ||
          m.dimAppliedTags.exists(numericTag(_).isDefined) =>
        val (viewDir1, pks) = stageViewRoot(spark, viewDir,
          readRaw(spark, viewDir, m, None))
        val (dimDir, _) = stageDimRoot(spark, viewDir,
          dimCurrent(spark, viewDir, m, None), m, m.nextSeq, lit(false))
        val numeric = m.appliedTags.flatMap(numericTag)
        val dimNumeric = m.dimAppliedTags.flatMap(numericTag)
        try commitIfUnchanged(spark, viewDir, Some(m), m.copy(
          roots = Vector(RootEntry(viewDir1, pks, pks)),
          dimRoots = Vector(dimDir),
          nextSeq = m.nextSeq + 1,
          appliedTags = m.appliedTags.filter(numericTag(_).isEmpty),
          tagHighWater = (m.tagHighWater +: numeric).max,
          dimAppliedTags = m.dimAppliedTags.filter(numericTag(_).isEmpty),
          dimTagHighWater = (m.dimTagHighWater +: dimNumeric).max))
        catch { case e: IllegalStateException =>
          val fs = new org.apache.hadoop.fs.Path(viewDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(s"$viewDir/$viewDir1"), true)
          fs.delete(new org.apache.hadoop.fs.Path(s"$viewDir/$dimDir"), true)
          throw e
        }
        true
      case _ => false
    }
  }

  /** Auto-fold policy (the shared `maintain` contract): fold when view
    * roots or dim generations pile past the thresholds.
    */
  def maintainJoinView(spark: SparkSession, viewDir: String,
      foldRootsAbove: Int = 4, foldDimGensAbove: Int = 4): Boolean =
    lock.synchronized {
      readManifest(spark, viewDir) match {
        case Some(m) if m.roots.size > foldRootsAbove ||
            m.dimRoots.size > foldDimGensAbove =>
          compactJoinView(spark, viewDir)
        case _ => false
      }
    }

  /** Delete staged dirs the manifest no longer references past an age
    * grace (crashed stages, superseded folds, fully-rebuilt roots).
    * Returns the number of directories removed.
    */
  def vacuumJoinView(spark: SparkSession, viewDir: String,
      minAgeMs: Long = 600000L): Int = lock.synchronized {
    readManifest(spark, viewDir) match {
      case None => 0
      case Some(m) =>
        val root = new org.apache.hadoop.fs.Path(viewDir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val live = m.roots.map(_.dir).toSet ++ m.dimRoots.toSet
        val cutoff = System.currentTimeMillis() - minAgeMs
        val stale = fs.listStatus(root).filter { st =>
          val n = st.getPath.getName
          st.isDirectory && (n.startsWith("jv-") || n.startsWith("jvdim-")) &&
            !live.contains(n) && st.getModificationTime <= cutoff
        }
        if (readManifest(spark, viewDir, fresh = true) != Some(m))
          throw new IllegalStateException(
            s"concurrent join-view mutation on $viewDir during vacuum — aborting")
        stale.foreach(st => fs.delete(st.getPath, true))
        stale.length
    }
  }
}
