package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.expressions.HashExpressions

/** Persisted, appendable MinHash-LSH near-duplicate index — the streaming
  * complement to [[Dedup.minhashLshPairs]]: pay the corpus shingle/band
  * scan once, then ask "which already-collected documents is this new
  * batch a near-duplicate of" without recomputing anything over the
  * corpus. This is dedup-at-ingest against the full collection history —
  * the check a training-data pipeline wants BEFORE a document enters the
  * corpus, where the batch operator can only compare what it sees in one
  * pass. (The reference's analog is the LSM point-lookup a Set performs
  * through memtable and levels before placing a key.)
  *
  * Layout under `indexDir` (the text/IVF index contract: stage dirs,
  * then ONE atomic manifest swap; readers never see a torn batch):
  *
  *   MANIFEST.json    {numBands, rowsPerBand, shingleK, numBuckets,
  *                     bands[], shingles[], appliedTags[], tagHighWater}
  *   bands-<uuid>/pb=N/     (bh, id) — one row per (doc, band key),
  *                     partitioned by pb = pmod(bh, numBuckets): a probe
  *                     batch's band keys hash to a bounded pb set, so
  *                     the candidate scan PRUNES to those partitions
  *   shingles-<uuid>/ps=N/  (id, sh) — each doc's sorted-distinct
  *                     shingle set, stored ONCE (not per band row),
  *                     partitioned by ps = pmod(xxhash64(id), numBuckets)
  *                     so the verification scan prunes to the candidate
  *                     ids' partitions
  *
  * Probes verify candidates with EXACT merge-scan Jaccard over the
  * stored shingle sets — the same verification as the batch operator, so
  * the probe's (pair, jaccard) output is exact, not a signature estimate
  * (only candidate RECALL is approximate, gated like every LSH family
  * member). Corpus contract: append-only NEW doc ids, replays fenced by
  * the numeric batch-tag high-water (the text index's contract).
  */
object NearDupIndex {

  /** `nDocs` counts every doc ever indexed, `nDeleted` the tombstoned
    * subset (live = nDocs - nDeleted — the text-index stats contract);
    * `tombs` are ps-partitioned id tables so probes prune the
    * subtraction scan exactly like the shingle verification scan.
    * Pre-delete manifests load with the defaults (0/0/empty) and keep
    * working; their counts start tracking from the first new mutation.
    */
  private[llmops] final case class NearDupManifest(
      numBands: Int,
      rowsPerBand: Int,
      shingleK: Int,
      numBuckets: Int,
      bands: Vector[String],
      shingles: Vector[String],
      appliedTags: Vector[String] = Vector.empty,
      tagHighWater: Long = -1L,
      tombs: Vector[String] = Vector.empty,
      nDocs: Long = 0L,
      nDeleted: Long = 0L)

  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
  private val lock = new Object

  private def numericTag(t: String): Option[Long] =
    if (t.nonEmpty && t.length <= 18 && t.forall(c => c >= '0' && c <= '9'))
      Some(java.lang.Long.parseLong(t))
    else None

  private def tagApplied(m: NearDupManifest, tag: String): Boolean =
    numericTag(tag) match {
      case Some(v) => v <= m.tagHighWater ||
        m.appliedTags.exists(numericTag(_).contains(v))
      case None => m.appliedTags.contains(tag)
    }

  private def recordTag(m: NearDupManifest, tag: String): NearDupManifest =
    numericTag(tag) match {
      case Some(v) => m.copy(tagHighWater = math.max(m.tagHighWater, v))
      case None => m.copy(appliedTags = m.appliedTags :+ tag)
    }

  // stamp cache (size+mtime revalidation via one getFileStatus — the
  // GraftDB/text/IVF manifest pattern): repeated probes on an unchanged
  // index skip the JSON re-parse; every commit changes the file stamp so
  // foreign writers are still seen. `manifestParses` counts ACTUAL
  // parses so a spec can pin the cache.
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, NearDupManifest)]()
  private[llmops] val manifestParses = new java.util.concurrent.atomic.AtomicLong(0L)

  /** `fresh = true` bypasses the stamp cache — the correctness-critical
    * read for the optimistic commit/vacuum guards, where a same-length
    * same-mtime-window foreign commit must still be seen.
    */
  private[llmops] def readManifest(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, fresh: Boolean = false): Option[NearDupManifest] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/MANIFEST.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = try Some(fs.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None => manifestCache.remove(indexDir); None
      case Some(s) =>
        val cached = manifestCache.get(indexDir)
        if (!fresh && cached != null &&
            cached._1 == s.getLen && cached._2 == s.getModificationTime)
          Some(cached._3)
        else {
          val in = fs.open(p)
          val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          val m = org.json4s.jackson.Serialization.read[NearDupManifest](text)
          manifestParses.incrementAndGet()
          manifestCache.put(indexDir, (s.getLen, s.getModificationTime, m))
          Some(m)
        }
    }
  }

  /** Swap to `next` only if the manifest still reads as `expected` — the
    * optimistic cross-process guard shared by every index family here.
    */
  private def commitIfUnchanged(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, expected: Option[NearDupManifest], next: NearDupManifest): Unit = {
    // guard read bypasses the stamp cache — see readManifest's `fresh`
    if (readManifest(spark, indexDir, fresh = true) != expected)
      throw new IllegalStateException(
        s"concurrent near-dup-index mutation on $indexDir — aborting; " +
          "staged dirs are unreferenced and reclaimed by vacuumNearDupIndex")
    val dst = new org.apache.hadoop.fs.Path(s"$indexDir/MANIFEST.json")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/MANIFEST.json.tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(org.json4s.jackson.Serialization.write(next).getBytes("UTF-8"))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(dst.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // drop, don't update: the next read restamps from the renamed file
    manifestCache.remove(indexDir)
  }

  private val bandSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bh", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("pb", org.apache.spark.sql.types.IntegerType)))
  private val shingleSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sh", org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)),
    org.apache.spark.sql.types.StructField("ps", org.apache.spark.sql.types.IntegerType)))

  private val tombSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ps", org.apache.spark.sql.types.IntegerType)))

  private def tombIds(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      m: NearDupManifest): DataFrame =
    if (m.tombs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        tombSchema).select(col("id"))
    else readRoots(spark, indexDir, m.tombs, tombSchema).select(col("id"))

  /** Stage one batch's band root + shingle root; returns the staged dirs
    * and the batch's indexed doc count. Docs with zero shingles (empty
    * text) are indexable by neither side and are skipped — they can
    * never near-duplicate anything.
    */
  private def stageBatch(docs: DataFrame, indexDir: String, m: NearDupManifest,
      idCol: String, textCol: String): Option[(String, String, Long)] = {
    val spark = docs.sparkSession
    val sh = docs.select(col(idCol).cast("long").as("id"),
        Text.shingles(col(textCol), m.shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    val n = sh.count()
    if (n == 0) return None
    val bDir = s"bands-${java.util.UUID.randomUUID}"
    sh.select(col("id"),
        explode(HashExpressions.minhash_bands(col("sh"), m.numBands, m.rowsPerBand)).as("bh"))
      .withColumn("pb", pmod(col("bh"), lit(m.numBuckets.toLong)).cast("int"))
      .repartition(col("pb"))
      .write.mode("overwrite").partitionBy("pb").parquet(s"$indexDir/$bDir")
    val sDir = s"shingles-${java.util.UUID.randomUUID}"
    sh.withColumn("ps", pmod(xxhash64(col("id")), lit(m.numBuckets.toLong)).cast("int"))
      .repartition(col("ps"))
      .write.mode("overwrite").partitionBy("ps").parquet(s"$indexDir/$sDir")
    Some((bDir, sDir, n))
  }

  /** Build a fresh index over `docs` (replacing any prior manifest at
    * `indexDir`; superseded dirs wait for [[vacuumNearDupIndex]]).
    * Band/row/shingle parameters fix the recall-vs-cost trade exactly as
    * in [[Dedup.minhashLshPairs]]; `numBuckets` is the probe's partition-
    * pruning granularity (the text index's sizing contract).
    */
  def buildNearDupIndex(
      docs: DataFrame,
      indexDir: String,
      numBands: Int = 8,
      rowsPerBand: Int = 4,
      shingleK: Int = 3,
      numBuckets: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = lock.synchronized {
    require(numBands > 0 && rowsPerBand > 0 && shingleK > 0 && numBuckets > 0,
      "buildNearDupIndex: all parameters must be positive")
    val spark = docs.sparkSession
    val m0 = readManifest(spark, indexDir)
    val empty = NearDupManifest(numBands, rowsPerBand, shingleK, numBuckets,
      Vector.empty, Vector.empty)
    val next = stageBatch(docs, indexDir, empty, idCol, textCol) match {
      case Some((bDir, sDir, n)) =>
        empty.copy(bands = Vector(bDir), shingles = Vector(sDir), nDocs = n)
      case None => empty // empty corpus: a legitimate streaming start state
    }
    commitIfUnchanged(spark, indexDir, m0, next)
  }

  /** Append a batch of NEW documents. Returns false (writing nothing)
    * for an empty/zero-shingle batch or a replayed `batchTag` (numeric
    * tags fence by high-water — the streaming micro-batch contract).
    */
  def appendToNearDupIndex(
      indexDir: String,
      docs: DataFrame,
      batchTag: Option[String] = None,
      idCol: String = "doc_id",
      textCol: String = "text"): Boolean = lock.synchronized {
    val spark = docs.sparkSession
    val m = readManifest(spark, indexDir).getOrElse(throw new IllegalStateException(
      s"appendToNearDupIndex: no readable index manifest at $indexDir"))
    if (batchTag.exists(tagApplied(m, _))) return false
    stageBatch(docs, indexDir, m, idCol, textCol) match {
      case None => false
      case Some((bDir, sDir, n)) =>
        val next = m.copy(bands = m.bands :+ bDir, shingles = m.shingles :+ sDir,
          nDocs = m.nDocs + n)
        try commitIfUnchanged(spark, indexDir, Some(m),
          batchTag.fold(next)(recordTag(next, _)))
        catch { case e: IllegalStateException =>
          val fs = new org.apache.hadoop.fs.Path(indexDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          for (d <- Seq(bDir, sDir))
            fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$d"), true)
          throw e
        }
        true
    }
  }

  private def readRoots(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      roots: Seq[String], schema: org.apache.spark.sql.types.StructType): DataFrame =
    roots.map(r => spark.read.schema(schema).parquet(s"$indexDir/$r"))
      .reduce(_.unionByName(_))

  /** Tombstone `ids`: the docs stop appearing as `dup_id` in every later
    * probe, immediately and exactly; the physical band/shingle rows stay
    * until [[compactNearDupIndex]] purges them (the text/IVF delete
    * contract — reads subtract, ONLY the fold rewrites). Ids not in the
    * index (or already dead) are ignored. Returns the number of docs
    * newly deleted; writes nothing when that is zero.
    *
    * Cost shape: the delete batch's id-hash buckets prune the shingle
    * scan (membership check), the tomb table is ps-partitioned so probes
    * prune their subtraction scan the same way — delete cost follows the
    * batch, never the corpus.
    */
  def deleteFromNearDupIndex(
      indexDir: String,
      ids: DataFrame,
      idCol: String = "doc_id"): Long = lock.synchronized {
    val spark = ids.sparkSession
    val m = readManifest(spark, indexDir).getOrElse(throw new IllegalStateException(
      s"deleteFromNearDupIndex: no readable index manifest at $indexDir"))
    val delIds = ids.select(col(idCol).cast("long").as("id")).distinct()
    val delPs = delIds
      .select(pmod(xxhash64(col("id")), lit(m.numBuckets.toLong)).cast("int").as("ps"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (m.shingles.isEmpty) return 0L // empty index: nothing to delete
    val victims0 = readRoots(spark, indexDir, m.shingles, shingleSchema)
      .filter(col("ps").isin(delPs: _*))
      .join(delIds, Seq("id"), "left_semi")
      .select(col("id"), col("ps"))
    val victims = if (m.tombs.isEmpty) victims0
      else victims0.join(tombIds(spark, indexDir, m), Seq("id"), "left_anti")
    val tDir = s"tombs-${java.util.UUID.randomUUID}"
    victims.repartition(col("ps"))
      .write.mode("overwrite").partitionBy("ps").parquet(s"$indexDir/$tDir")
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = spark.read.schema(tombSchema).parquet(s"$indexDir/$tDir").count()
    if (n == 0) { // nothing newly deleted: drop the stage, swap nothing
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$tDir"), true)
      return 0L
    }
    try commitIfUnchanged(spark, indexDir, Some(m),
      m.copy(tombs = m.tombs :+ tDir, nDeleted = m.nDeleted + n))
    catch { case e: IllegalStateException =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$tDir"), true)
      throw e
    }
    n
  }

  /** Which indexed documents is each probe doc a near-duplicate of?
    * Returns `(probe_id, dup_id, jaccard)`, jaccard EXACT (merge-scan
    * over stored shingle sets, 6dp) and >= `threshold`; self-pairs
    * (probe id == indexed id) are dropped so an already-ingested batch
    * can be probed.
    *
    * Plan shape (the 100 TB path): the probe batch's band keys and
    * shingles are small and BROADCAST; the index band scan PRUNES to the
    * probe keys' pb partitions (driver-collected, like the text index's
    * term buckets); the verification scan prunes to the candidate ids'
    * ps partitions. Nothing corpus-sized shuffles. `maxBucketSize` drops
    * degenerate index buckets (members still reachable via their other
    * bands — [[Dedup.minhashLshPairs]]'s skew guard).
    */
  def probeNearDupIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      probe: DataFrame,
      threshold: Double,
      maxBucketSize: Int = 5000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val m = readManifest(spark, indexDir).getOrElse(throw new IllegalStateException(
      s"probeNearDupIndex: no readable index manifest at $indexDir"))
    val psh = probe.select(col(idCol).cast("long").as("probe_id"),
        Text.shingles(col(textCol), m.shingleK).as("psh"))
      .filter(size(col("psh")) > 0)
    val pbands = psh.select(col("probe_id"),
      explode(HashExpressions.minhash_bands(col("psh"), m.numBands, m.rowsPerBand)).as("bh"))
    if (m.bands.isEmpty)
      return pbands.limit(0).select(col("probe_id"),
        col("probe_id").as("dup_id"), lit(0.0).as("jaccard"))
    // bounded driver-side metadata, like the text index's term buckets
    val pbs = pbands.select(pmod(col("bh"), lit(m.numBuckets.toLong)).cast("int").as("pb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    // the skew cap only needs sizes of buckets the probe actually TOUCHES:
    // semi-join the pruned scan down to the probe's band keys first, so
    // the count aggregation runs over the matched slice instead of every
    // bucket in the pruned partitions. At bench scale this is noise (the
    // probe is job-overhead-bound); at corpus scale the difference is a
    // probe-bounded aggregation vs a corpus-bounded one.
    val matched = readRoots(spark, indexDir, m.bands, bandSchema)
      .filter(col("pb").isin(pbs: _*))
      .join(broadcast(pbands.select(col("bh")).distinct()), Seq("bh"), "left_semi")
    val small = matched.groupBy(col("bh")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize).select(col("bh"))
    val candidates0 = matched.join(small, Seq("bh"))
      .join(broadcast(pbands), Seq("bh"))
      .filter(col("probe_id") =!= col("id"))
      .select(col("probe_id"), col("id").as("dup_id")).distinct()
    // candidate ps partitions drive BOTH pruned scans below (the
    // tombstone subtraction and the shingle verification — dupPs from
    // the pre-subtraction set is a superset for the latter, still pruned)
    val dupPs = candidates0
      .select(pmod(xxhash64(col("dup_id")), lit(m.numBuckets.toLong)).cast("int").as("ps"))
      .distinct().collect().map(_.getInt(0)).toSeq
    // tombstoned docs stop matching IMMEDIATELY (physical purge waits
    // for the fold); the dead-id scan prunes to the candidates' buckets
    val candidates = if (m.tombs.isEmpty) candidates0
      else candidates0.join(
        readRoots(spark, indexDir, m.tombs, tombSchema)
          .filter(col("ps").isin(dupPs: _*)).select(col("id").as("dup_id")),
        Seq("dup_id"), "left_anti")
    val idxSh = readRoots(spark, indexDir, m.shingles, shingleSchema)
      .filter(col("ps").isin(dupPs: _*))
      .select(col("id").as("dup_id"), col("sh"))
    candidates
      .join(idxSh, Seq("dup_id"))
      .join(broadcast(psh), Seq("probe_id"))
      .withColumn("jaccard",
        round(HashExpressions.jaccard_sorted(col("psh"), col("sh")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("probe_id"), col("dup_id"), col("jaccard"))
  }

  /** Fold append roots to one root per side — the small-files compaction
    * (roots accumulate one per streaming micro-batch; queries union all
    * of them) — and PURGE tombstoned docs physically (the rewrite is the
    * only place dead rows leave disk; until it runs, probes subtract).
    * Append-only rows with fenced replays mean a plain rewrite is exact.
    * Returns true when a fold happened.
    */
  def compactNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Boolean = lock.synchronized {
    readManifest(spark, indexDir) match {
      case Some(m) if m.bands.size > 1 || m.shingles.size > 1 ||
          m.tombs.nonEmpty || m.appliedTags.exists(numericTag(_).isDefined) =>
        val dead = tombIds(spark, indexDir, m)
        val bDir = s"bands-${java.util.UUID.randomUUID}"
        readRoots(spark, indexDir, m.bands, bandSchema)
          .join(dead, Seq("id"), "left_anti")
          .repartition(col("pb"))
          .write.mode("overwrite").partitionBy("pb").parquet(s"$indexDir/$bDir")
        val sDir = s"shingles-${java.util.UUID.randomUUID}"
        readRoots(spark, indexDir, m.shingles, shingleSchema)
          .join(dead, Seq("id"), "left_anti")
          .repartition(col("ps"))
          .write.mode("overwrite").partitionBy("ps").parquet(s"$indexDir/$sDir")
        val numeric = m.appliedTags.flatMap(numericTag)
        try commitIfUnchanged(spark, indexDir, Some(m), m.copy(
          bands = Vector(bDir), shingles = Vector(sDir),
          appliedTags = m.appliedTags.filter(numericTag(_).isEmpty),
          tagHighWater = (m.tagHighWater +: numeric).max,
          tombs = Vector.empty,
          nDocs = m.nDocs - m.nDeleted, nDeleted = 0L))
        catch { case e: IllegalStateException =>
          val fs = new org.apache.hadoop.fs.Path(indexDir)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          for (d <- Seq(bDir, sDir))
            fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$d"), true)
          throw e
        }
        true
      case _ => false
    }
  }

  /** The auto-compaction policy (the text/IVF `maintain` contract): fold
    * when append roots pile past `foldRootsAbove`, or when the dead
    * fraction crosses `deadRatio` (tombstones make every probe pay a
    * subtraction scan — past the threshold the one-off rewrite is
    * cheaper than carrying them). Returns true when a fold ran.
    */
  def maintainNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, foldRootsAbove: Int = 4,
      deadRatio: Double = 0.25): Boolean = lock.synchronized {
    readManifest(spark, indexDir) match {
      case Some(m) if m.bands.size > foldRootsAbove ||
          (m.nDeleted > 0 && m.nDeleted >= deadRatio * math.max(1L, m.nDocs)) =>
        compactNearDupIndex(spark, indexDir)
      case _ => false
    }
  }

  /** Delete dirs the manifest no longer references (crashed stages,
    * superseded roots). Same age-grace contract as the other indexes:
    * dirs younger than `minAgeMs` are spared for in-flight cross-process
    * stages. Returns the number of directories removed.
    */
  def vacuumNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, minAgeMs: Long = 600000L): Int = lock.synchronized {
    readManifest(spark, indexDir) match {
      case None => 0
      case Some(m) =>
        val root = new org.apache.hadoop.fs.Path(indexDir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val live = (m.bands ++ m.shingles ++ m.tombs).toSet
        val cutoff = System.currentTimeMillis() - minAgeMs
        val stale = fs.listStatus(root).filter { st =>
          val n = st.getPath.getName
          st.isDirectory && (n.startsWith("bands-") || n.startsWith("shingles-") ||
              n.startsWith("tombs-")) &&
            !live.contains(n) && st.getModificationTime <= cutoff
        }
        if (readManifest(spark, indexDir, fresh = true) != Some(m))
          throw new IllegalStateException(
            s"concurrent near-dup-index mutation on $indexDir during vacuum — aborting")
        stale.foreach(st => fs.delete(st.getPath, true))
        stale.length
    }
  }
}
