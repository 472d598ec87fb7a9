package graft.core

import java.util.UUID
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine options — Spark-scale defaults replacing the reference's
  * single-node geometry (`kv/option.go:21-33`).
  *
  * @param valueThreshold  values >= this many bytes go to the blob table
  *                        (WiscKey separation; reference default 1024,
  *                        `kv/utils/const.go:9`)
  * @param compactTriggerFiles  number of live L0 generations that triggers
  *                        compaction (analog of `NumLevelZeroTables`)
  * @param rangePartitions target partition count for compaction output;
  *                        on a real cluster, size so each partition's rows
  *                        fit executor memory (~128-512 MB of key+value)
  * @param l1TargetRows    total level-1 rows above which the largest L1
  *                        file is promoted to level 2 (the analog of the
  *                        reference's per-level size targets and scoring,
  *                        `kv/lsm/compact.go:626-751`) — keeps L1 small so
  *                        L0→L1 merges stay cheap under sustained ingest
  */
final case class GraftOptions(
    valueThreshold: Int = 1024,
    compactTriggerFiles: Int = 8,
    rangePartitions: Int = 32,
    gcDiscardRatio: Double = 0.5,
    l1TargetRows: Long = 4000000L)

/** GraftDB — the reference's embedded LSM KV engine re-expressed Spark-first.
  *
  * Storage layout under `rootDir`:
  *   - `data/<uuid>/`  sorted parquet segments ("generations"): level 0 =
  *     freshly appended batches (the memtable-flush analog, reference
  *     `kv/lsm/level.go:82-106`); level 1 = compacted, range-partitioned,
  *     key-sorted output (reference compaction, `kv/lsm/compact.go:239-447`).
  *   - `blobs/<uuid>/` parquet blob segments (the value-log analog,
  *     reference `kv/vlog.go:366-484`).
  *   - `MANIFEST.json`  atomic list of live segments + counters (reference
  *     manifest, `kv/file/manifest.go`).
  *
  * Read semantics are merge-on-read: union of live segments, last-writer-wins
  * by `version` (reference merge-iterator dedup, `kv/lsm/iterator.go:357-366`),
  * then tombstone and TTL visibility filters (reference `kv/db.go:114-130`) —
  * TTL strictly AFTER LWW so a newer expired version shadows an older live one.
  *
  * Scale design: no driver-side collects except point-get results; every
  * lifecycle job is a linear scan plus at most one shuffle; compaction output
  * is range-partitioned and key-sorted so parquet footer min/max stats prune
  * files/row-groups on point and range reads, and a parquet bloom filter on
  * `key` serves the negative-lookup role of the reference's per-SST bloom
  * (`kv/utils/bloom_filter.go`).
  */
final class GraftDB(
    val spark: SparkSession,
    val rootDir: String,
    val options: GraftOptions = GraftOptions()) {

  private val manifest = new Manifest(rootDir)
  private def newSegmentDir(kind: String): String =
    s"$rootDir/$kind/${UUID.randomUUID().toString}"

  // ---------------------------------------------------------------- write path

  /** Upsert one entry (reference `Set`, `kv/db.go:71-87`). */
  def set(key: Array[Byte], value: Array[Byte], ttlSeconds: Long = 0L): Unit = {
    val exp = if (ttlSeconds == 0) 0L else System.currentTimeMillis() / 1000 + ttlSeconds
    batchSet(Seq(KVEntry(key, value, 0L, exp, tombstone = false, null)))
  }

  /** Delete = tombstone append (reference `Del`, `kv/db.go:132-138`). */
  def del(key: Array[Byte]): Unit = batchSet(Seq(KVEntry.tombstone(key)))

  /** Group-commit a batch (reference `batchSet` write pipeline,
    * `kv/db.go:191-285`). Entries later in the batch win over earlier
    * duplicates (distinct versions are assigned in batch order).
    */
  def batchSet(entries: Seq[KVEntry]): Unit = {
    if (entries.isEmpty) return
    // Allocate a contiguous version range + blob ids in one manifest txn.
    val nBlobs = entries.count(e =>
      !e.tombstone && e.value != null && e.value.length >= options.valueThreshold)
    var baseVersion = 0L
    var baseBlob = 0L
    manifest.commit { st =>
      baseVersion = st.nextVersion; baseBlob = st.nextBlobId
      st.copy(nextVersion = st.nextVersion + entries.size,
        nextBlobId = st.nextBlobId + nBlobs)
    }
    var blobSeq = baseBlob
    val blobs = Vector.newBuilder[Row]
    val rows = entries.zipWithIndex.map { case (e, i) =>
      val version = baseVersion + i
      if (!e.tombstone && e.value != null && e.value.length >= options.valueThreshold) {
        val id = blobSeq; blobSeq += 1
        blobs += Row(id, e.value)
        Row(e.key, null, version, e.expiresAt, false, id)
      } else {
        Row(e.key, if (e.tombstone) null else e.value, version, e.expiresAt,
          e.tombstone, null)
      }
    }
    val blobRows = blobs.result()
    val blobMeta = if (blobRows.nonEmpty) {
      val dir = newSegmentDir("blobs")
      spark.createDataFrame(spark.sparkContext.parallelize(blobRows, 1),
        KVEntry.blobSchema).write.mode(SaveMode.Overwrite).parquet(dir)
      Some(BlobFileMeta(dir, blobRows.size.toLong))
    } else None

    val sorted = rows.sortBy(r => r.getAs[Array[Byte]](0))(UnsignedBytesOrdering)
    val dir = newSegmentDir("data")
    spark.createDataFrame(spark.sparkContext.parallelize(sorted, 1), KVEntry.schema)
      .write.mode(SaveMode.Overwrite)
      .option("parquet.bloom.filter.enabled#key", "true")
      .parquet(dir)
    val meta = FileMeta(dir, level = 0,
      Hex.encode(sorted.head.getAs[Array[Byte]](0)),
      Hex.encode(sorted.last.getAs[Array[Byte]](0)),
      rows.size.toLong, baseVersion)
    manifest.commit(st => st.copy(
      files = st.files :+ meta,
      blobFiles = st.blobFiles ++ blobMeta))
    maybeCompact()
  }

  /** Bulk ingest: a whole DataFrame `(key binary, value binary[, expiresAt
    * long])` appended as one generation — the scale path (a streaming
    * micro-batch or a load job). The whole batch shares one commit version
    * (like the reference stamping one ts per Set, `kv/db.go:78`);
    * intra-batch duplicate keys resolve by the deterministic tie-break in
    * [[resolved]]. Blob ids come from `monotonically_increasing_id`
    * (unique, shuffle-free) over a reserved id block.
    */
  def write(df: DataFrame): Unit = {
    val spark0 = spark
    var baseVersion = 0L
    var baseBlob = 0L
    manifest.commit { st =>
      baseVersion = st.nextVersion; baseBlob = st.nextBlobId
      // Blob-id block sized for monotonically_increasing_id's
      // (partitionId << 33 | offset) layout: supports 4096 input partitions
      // per batch. Ids are opaque; gaps are fine.
      st.copy(nextVersion = st.nextVersion + 1, nextBlobId = st.nextBlobId + (1L << 45))
    }
    val withExp =
      if (df.columns.contains("expiresAt")) df.withColumn("expiresAt", coalesce(col("expiresAt"), lit(0L)))
      else df.withColumn("expiresAt", lit(0L))
    val withCols = withExp
      .withColumn("version", lit(baseVersion))
      .withColumn("tombstone", col("value").isNull)
      .withColumn("blobId",
        when(length(col("value")) >= options.valueThreshold,
          lit(baseBlob) + monotonically_increasing_id()).otherwise(lit(null).cast("long")))
    val blobDir = newSegmentDir("blobs")
    val blobDf = withCols.filter(col("blobId").isNotNull).select(col("blobId"), col("value"))
    blobDf.write.mode(SaveMode.Overwrite).parquet(blobDir)
    // row count from parquet footers — no second scan of the input
    val blobCount = spark0.read.schema(KVEntry.blobSchema).parquet(blobDir).count()
    val dataDir = newSegmentDir("data")
    withCols.select(
        col("key"),
        when(col("blobId").isNotNull, lit(null).cast("binary")).otherwise(col("value")).as("value"),
        col("version"), col("expiresAt"), col("tombstone"), col("blobId"))
      .repartitionByRange(options.rangePartitions, col("key"))
      .sortWithinPartitions("key")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.bloom.filter.enabled#key", "true")
      .parquet(dataDir)
    val metas = segmentFileMetas(dataDir, level = 0, baseVersion)
    manifest.commit(st => st.copy(
      files = st.files ++ metas,
      blobFiles = if (blobCount > 0) st.blobFiles :+ BlobFileMeta(blobDir, blobCount)
                  else st.blobFiles))
    maybeCompact()
  }

  /** Per-parquet-file manifest entries for a freshly written segment dir:
    * one pass groups by `input_file_name` to collect each file's
    * [minKey, maxKey] + row count. Range-partitioned output thus gets
    * per-FILE pruning from the manifest (the reference's per-SST
    * `[minKey,maxKey]` search, `kv/lsm/level_handler.go:45-64`) before
    * parquet footers are even opened.
    */
  private def segmentFileMetas(dir: String, level: Int, baseVersion: Long): Vector[FileMeta] =
    spark.read.schema(KVEntry.schema).parquet(dir)
      .groupBy(input_file_name().as("path"))
      .agg(min(col("key")).as("mn"), max(col("key")).as("mx"), count(lit(1)).as("n"))
      .collect()
      .map(r => FileMeta(r.getString(0), level,
        Hex.encode(r.getAs[Array[Byte]](1)), Hex.encode(r.getAs[Array[Byte]](2)),
        r.getLong(3), baseVersion))
      .toVector

  // ----------------------------------------------------------------- read path

  private def readSegments(paths: Seq[String]): DataFrame =
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], KVEntry.schema)
    else spark.read.schema(KVEntry.schema).parquet(paths: _*)

  private def blobTable(): DataFrame = {
    val st = manifest.load()
    if (st.blobFiles.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], KVEntry.blobSchema)
    else spark.read.schema(KVEntry.blobSchema).parquet(st.blobFiles.map(_.path): _*)
  }

  /** Raw union of live segments (all versions, tombstones included). */
  def rawLog(): DataFrame = readSegments(manifest.load().liveDataPaths)

  /** The LWW-resolved view BEFORE visibility filters: one row per key —
    * the newest version, whether live, deleted, or expired.
    * (Reference merge iterator semantics, `kv/lsm/iterator.go:303-366`.)
    */
  def resolved(df: DataFrame): DataFrame = {
    // version desc is the LWW order; the remaining columns are a
    // deterministic tie-break for intra-batch duplicate keys (same version).
    val w = Window.partitionBy(col("key")).orderBy(
      col("version").desc, xxhash64(col("value")).desc, col("blobId").desc_nulls_last,
      col("expiresAt").desc, col("tombstone").desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def visible(df: DataFrame, asOfUnixSec: Long): DataFrame =
    df.filter(!col("tombstone") &&
      (col("expiresAt") === 0L || col("expiresAt") > asOfUnixSec))

  /** The merge-on-read user view: `(key, value, version, expiresAt)` with
    * blob values resolved. This is what every read operator composes over.
    */
  def view(asOfUnixSec: Long = System.currentTimeMillis() / 1000): DataFrame = {
    val base = visible(resolved(rawLog()), asOfUnixSec)
    val blobs = blobTable().withColumnRenamed("value", "__blobValue")
    base.join(blobs, Seq("blobId"), "left")
      .select(col("key"),
        coalesce(col("value"), col("__blobValue")).as("value"),
        col("version"), col("expiresAt"))
  }

  /** Point lookup (reference `Get`, `kv/db.go:89-118`). Manifest min/max
    * pruning narrows to the few segments whose range covers the key; the
    * parquet bloom filter + row-group stats prune inside each segment.
    */
  def get(key: Array[Byte]): Option[Array[Byte]] = {
    val hex = Hex.encode(key)
    val st = manifest.load()
    val candidates = st.files.filter(f => f.minKeyHex <= hex && hex <= f.maxKeyHex)
    if (candidates.isEmpty) return None
    val hit = resolved(readSegments(candidates.map(_.path)).filter(col("key") === lit(key)))
    val row = visible(hit, System.currentTimeMillis() / 1000).head(1)
    row.headOption.map { r =>
      if (r.isNullAt(r.fieldIndex("blobId"))) r.getAs[Array[Byte]]("value")
      else {
        val id = r.getAs[Long]("blobId")
        blobTable().filter(col("blobId") === id).head().getAs[Array[Byte]]("value")
      }
    }
  }

  /** Ordered scan (reference `NewIterator`, `kv/iterator.go:19-79`), with
    * range and prefix options. Prefix is implemented binary-safe via the
    * [prefix, prefixSuccessor) range trick so it pushes down to parquet as
    * two comparisons (the reference declared prefix but never enforced it,
    * `kv/utils/iterator.go:16-19` — we implement it for real).
    */
  def scan(
      from: Option[Array[Byte]] = None,
      until: Option[Array[Byte]] = None,
      prefix: Option[Array[Byte]] = None,
      ascending: Boolean = true): DataFrame = {
    var df = view()
    from.foreach(f => df = df.filter(col("key") >= lit(f)))
    until.foreach(u => df = df.filter(col("key") < lit(u)))
    prefix.foreach { p =>
      df = df.filter(col("key") >= lit(p))
      GraftDB.prefixSuccessor(p).foreach(s => df = df.filter(col("key") < lit(s)))
    }
    df.orderBy(if (ascending) col("key").asc else col("key").desc)
  }

  // ------------------------------------------------------------ lifecycle jobs

  private def maybeCompact(): Unit = {
    val st = manifest.load()
    if (st.files.count(_.level == 0) >= options.compactTriggerFiles) compact()
  }

  /** Leveled compaction: THE natural Spark job (reference
    * `compactBuildTables`, `kv/lsm/compact.go:239-447`). Inputs are the
    * level-0 generations plus every level-1 file whose key range overlaps
    * them (the reference's L0->Lbase merge): LWW-resolve -> drop tombstones
    * and expired entries -> range-partition + key-sort -> write level-1
    * files with per-file manifest stats; atomically swap the manifest.
    * Non-overlapping level-1 files are untouched — write amplification is
    * bounded by the overlap, not the table size. The reference's parallel
    * subcompactions become range-partition tasks.
    */
  def compact(): Unit = compactInputs { st =>
    val l0 = st.files.filter(_.level == 0)
    if (l0.isEmpty) Vector.empty
    else l0 ++ st.files.filter(f => f.level >= 1 && l0.exists(z => overlaps(z, f)))
  }

  /** Full rewrite of every live segment (the reference's Lmax->Lmax
    * self-compaction role): reclaims all shadowed versions and dead rows.
    */
  def majorCompact(): Unit = compactInputs(_.files)

  private def overlaps(a: FileMeta, b: FileMeta): Boolean =
    !(a.maxKeyHex < b.minKeyHex || b.maxKeyHex < a.minKeyHex)

  private def compactInputs(pick: ManifestState => Vector[FileMeta]): Unit = {
    val st0 = manifest.load()
    val inputs = pick(st0)
    if (inputs.isEmpty) return
    val now = System.currentTimeMillis() / 1000
    val compacted = visible(resolved(readSegments(inputs.map(_.path))), now)
    val outDir = newSegmentDir("data")
    compacted
      .repartitionByRange(options.rangePartitions, col("key"))
      .sortWithinPartitions("key")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.bloom.filter.enabled#key", "true")
      .parquet(outDir)
    val maxVersion = inputs.map(_.createdVersion).max
    val newMetas = segmentFileMetas(outDir, level = 1, maxVersion)
    manifest.commit { st =>
      val remaining = st.files.filterNot(f => inputs.exists(_.path == f.path))
      st.copy(files = newMetas ++ remaining)
    }
    // Old segment dirs stay on disk until vacuum() — snapshot readers may
    // still hold them (replaces the reference's iterator refcounts,
    // kv/vlog_gc.go:364-390).
  }

  /** Blob GC (reference vlog GC, `kv/vlog_gc.go`): exact live-set via a
    * semi-join (cheap at Spark scale — no sampling heuristics needed),
    * rewrite survivors, swap manifest. Returns (liveBlobs, deadBlobs).
    */
  def gcBlobs(): (Long, Long) = {
    val st0 = manifest.load()
    if (st0.blobFiles.isEmpty) return (0L, 0L)
    val liveRefs = resolved(readSegments(st0.liveDataPaths))
      .filter(!col("tombstone") && col("blobId").isNotNull)
      .select(col("blobId"))
    val blobs = blobTable()
    val total = blobs.count()
    val live = blobs.join(liveRefs, Seq("blobId"), "left_semi")
    val liveCount = live.count()
    val dead = total - liveCount
    if (total == 0 || dead.toDouble / total < options.gcDiscardRatio) return (liveCount, dead)
    val outDir = newSegmentDir("blobs")
    if (liveCount > 0) live.write.mode(SaveMode.Overwrite).parquet(outDir)
    manifest.commit(st => st.copy(
      blobFiles = if (liveCount > 0) Vector(BlobFileMeta(outDir, liveCount)) else Vector.empty))
    (liveCount, dead)
  }

  /** Typed Dataset view of the resolved live entries — the compile-time-
    * checked API surface (SURVEY §1.4: `Dataset[T]` where type safety
    * helps, `DataFrame` where schema is dynamic).
    */
  def entries(): org.apache.spark.sql.Dataset[ResolvedEntry] = {
    val spark0 = spark
    import spark0.implicits._
    view().as[ResolvedEntry]
  }

  /** Pull-based ordered iteration over the live view (reference
    * `NewIterator` consumption shape): rows stream to the caller one
    * partition at a time — no full collect.
    */
  def iterator(ascending: Boolean = true): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    scan(ascending = ascending).toLocalIterator().asScala
  }

  /** Sampling estimate of the dead-blob ratio — parity with the reference's
    * GC sampler (`kv/vlog_gc.go:255-346`, ~1% of entries): exact counting
    * via semi-join is affordable at Spark scale (see [[gcBlobs]]), but on a
    * 100 TB blob table a 1% sample answers "is GC worth running?" with a
    * fraction of the I/O.
    */
  def estimateDeadBlobRatio(fraction: Double = 0.01, seed: Long = 42L): Double = {
    val st = manifest.load()
    if (st.blobFiles.isEmpty) return 0.0
    val sampled = blobTable().sample(withReplacement = false, fraction, seed)
    val liveRefs = resolved(readSegments(st.liveDataPaths))
      .filter(!col("tombstone") && col("blobId").isNotNull)
      .select(col("blobId"))
    val counts = sampled.join(liveRefs, Seq("blobId"), "left_anti").count().toDouble
    val total = sampled.count().toDouble
    if (total == 0) 0.0 else counts / total
  }

  /** Delete segment dirs no longer referenced by the manifest (orphan
    * cleanup, reference `kv/file/manifest.go:227-243`). Call when no
    * snapshot readers are active.
    */
  def vacuum(): Unit = {
    val st = manifest.load()
    // normalize: manifest paths may be segment DIRS (batchSet) or
    // individual part-FILES with a file: scheme (per-file metas)
    def norm(p: String): String = p.replaceFirst("^file:/+", "/")
    val live = (st.files.map(_.path) ++ st.blobFiles.map(_.path)).map(norm)
    for (kind <- Seq("data", "blobs")) {
      val dir = new java.io.File(s"$rootDir/$kind")
      Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
        val seg = f.getPath
        val inUse = live.exists(p => p == seg || p.startsWith(seg + "/"))
        if (!inUse) deleteRecursively(f)
      }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  def stats(): Map[String, Long] = {
    val st = manifest.load()
    Map(
      "dataSegments" -> st.files.size.toLong,
      "level0Segments" -> st.files.count(_.level == 0).toLong,
      "blobSegments" -> st.blobFiles.size.toLong,
      "rows" -> st.files.map(_.rows).sum,
      "nextVersion" -> st.nextVersion)
  }
}

object GraftDB {
  /** Smallest byte string strictly greater than every string with `p` as a
    * prefix; None when p is all-0xff (scan to end of keyspace).
    */
  def prefixSuccessor(p: Array[Byte]): Option[Array[Byte]] = {
    val out = p.clone()
    var i = out.length - 1
    while (i >= 0) {
      if ((out(i) & 0xff) != 0xff) {
        out(i) = (out(i) + 1).toByte
        return Some(java.util.Arrays.copyOf(out, i + 1))
      }
      i -= 1
    }
    None
  }
}

/** Unsigned lexicographic byte ordering == Go `bytes.Compare` == Spark
  * BinaryType ordering — keeps driver-side batch sorting consistent with
  * executor-side comparisons.
  */
object UnsignedBytesOrdering extends Ordering[Array[Byte]] {
  def compare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val cmp = (a(i) & 0xff) - (b(i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    a.length - b.length
  }
}
