package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.StructType

/** One closed gap-session: emitted when the inactivity gap elapses past
  * the watermark (or when a newer event proves the gap closed).
  */
final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

/** Open-session state carried between micro-batches by
  * [[EventStream.sessionizeStream]].
  */
final case class OpenSession(startMs: Long, endMs: Long, n: Long)

/** One surviving unit from [[EventStream.dedupUnitsStream]] — the
  * globally-first occurrence of its `unit` text across the stream so far.
  */
final case class UnitRow(doc_id: Long, pos: Long, unit: String)

/** One closed fixed-step bucket from [[EventStream.resampleStream]] —
  * emitted once the watermark passes the bucket end; gap buckets carry
  * `n_events = 0` and the forward-filled value.
  */
final case class ResampleRow(
    key: Long, bucket_ms: Long, n_events: Long,
    sum_value: Double, last_value: Double)

/** Per-bucket partial carried in [[EventStream.resampleStream]] state:
  * count, per-row-rounded cents sum (the batch operator's decimal(18,2)
  * discipline), and the in-bucket last observation by (ts, tie).
  */
final case class BucketPartial(
    n: Long, sumCents: Long, lastTs: Long, lastTie: Long, lastVal: Double)

/** Open state per key for [[EventStream.resampleStream]]: the last
  * emitted bucket index, the carried forward-fill value, and the still
  * incomplete buckets. Bounded: one carry + at most the buckets inside
  * the watermark delay.
  */
final case class OpenBuckets(
    lastEmitted: Long, hasCarry: Boolean, carryVal: Double,
    open: Map[Long, BucketPartial])

/** One closed bucket from [[EventStream.interpolateStream]]: an anchor
  * (observed, `n_events > 0`, exact value) or a gap row linearly blended
  * between its two enclosing anchors.
  */
final case class InterpRow(
    key: Long, bucket_ms: Long, n_events: Long, interp_value: Double)

/** State per key for [[EventStream.interpolateStream]]: the last emitted
  * ANCHOR (gap rows behind it blend against the next anchor, so the
  * previous anchor is all the history interpolation ever needs) plus the
  * still incomplete buckets — bounded exactly like [[OpenBuckets]].
  */
final case class InterpState(
    hasPrev: Boolean, prevBucket: Long, prevVal: Double,
    open: Map[Long, BucketPartial])

/** One buffered event in [[EventStream.funnelStream]] state — held until
  * the watermark passes its timestamp, because the funnel's frontier fold
  * is order-sensitive and an earlier event may still arrive.
  */
final case class FunnelPending(tsMs: Long, tie: Long, bits: Long)

/** Per-key state for [[EventStream.funnelStream]]: the committed stage
  * frontier (Long.MinValue = stage not reached) plus the
  * still-inside-watermark pending buffer. The frontier is permanent —
  * a funnel's history never un-happens — so state is one fixed-size row
  * per key plus a watermark-bounded buffer.
  */
final case class FunnelState(frontier: Seq[Long], pending: Seq[FunnelPending])

/** One frontier advance from [[EventStream.funnelStream]] (Update mode):
  * the key's committed stage timestamps after folding every event the
  * watermark has sealed, emitted only when a stage completed this batch.
  * `n_complete` is monotone per key — the latest update is the current
  * funnel position.
  */
final case class FunnelUpdate(key: Long, stage_ts: Seq[Option[Long]], n_complete: Int)

/** One closed maximal island from [[EventStream.coalesceIntervalsStream]] —
  * emitted once the watermark proves no future interval can start inside
  * it.
  */
final case class IslandRow(key: Long, island_start: Long, island_end: Long, n_merged: Long)

/** Per-key state for [[EventStream.coalesceIntervalsStream]]: the open
  * island (hasOpen=false = none) plus the still-inside-watermark pending
  * intervals, buffered because the island fold is order-sensitive in the
  * start column.
  */
final case class CoalesceState(
    hasOpen: Boolean, startMs: Long, endMs: Long, n: Long,
    pending: Seq[(Long, Long)])

/** Pending event for [[EventStream.ewmaStream]]: buffered until the
  * watermark seals its order slot (the recurrence is order-sensitive).
  */
final case class EwmaPending(tsMs: Long, tie: Long, x: Double)

/** Per-key state for [[EventStream.ewmaStream]]: the committed carry
  * `s` (meaningful once `started`) plus the watermark-bounded pending
  * buffer. The carry is permanent — smoothing never forgets — so state
  * is one fixed-size row per key plus the buffer.
  */
final case class EwmaState(started: Boolean, s: Double, pending: Seq[EwmaPending])

/** One sealed observation from [[EventStream.ewmaStream]] (Append mode):
  * the event and its committed smoothed value, emitted exactly once,
  * when the watermark passes the event's timestamp.
  */
final case class EwmaRow(key: Long, ts_ms: Long, tie: Long, value: Double, ewma: Double)

/** Per-key state for [[EventStream.twaStream]]: the committed running
  * integral — last sealed sample (the zero-order hold), first-sample
  * timestamp, the hold-weighted sum, the observation count — plus the
  * watermark-bounded pending buffer.
  */
final case class TwaState(
    started: Boolean, lastTs: Long, lastV: Double, minTs: Long,
    wsum: Double, n: Long, pending: Seq[EwmaPending])

/** One sealed observation from [[EventStream.twaStream]] (Append mode):
  * the key's RUNNING time-weighted average after folding this event —
  * the latest row per key equals the batch
  * [[graft.operators.Resample.timeWeightedAvg]] verdict over the same
  * prefix.
  */
final case class TwaRow(key: Long, ts_ms: Long, n_obs: Long, span_ms: Long, twa: Double)

/** Per-key state for [[EventStream.decayStream]]: the committed score
  * and the timestamp it was committed at (decay is computed lazily
  * against the next sealed arrival), plus the watermark-bounded
  * pending buffer.
  */
final case class DecayState(
    started: Boolean, lastTs: Long, s: Double, pending: Seq[EwmaPending])

/** One sealed observation from [[EventStream.decayStream]] (Append
  * mode): the key's time-decayed running score after folding this
  * event.
  */
final case class DecayRow(key: Long, ts_ms: Long, tie: Long, value: Double, decayed: Double)

/** Per-key state for [[EventStream.holtStream]]: the committed level and
  * trend (meaningful once `started`) plus the watermark-bounded pending
  * buffer — the 2-state generalization of [[EwmaState]].
  */
final case class HoltState(
    started: Boolean, l: Double, b: Double, pending: Seq[EwmaPending])

/** One sealed observation from [[EventStream.holtStream]] (Append mode):
  * the event with its committed level and trend; `level + k*trend` is
  * the k-step-ahead forecast as of this observation.
  */
final case class HoltRow(
    key: Long, ts_ms: Long, tie: Long, value: Double,
    level: Double, trend: Double)

/** Per-key state for [[EventStream.cusumStream]]: the committed high and
  * low cumulative sums plus the watermark-bounded pending buffer.
  */
final case class CusumState(hi: Double, lo: Double, pending: Seq[EwmaPending])

/** One sealed observation from [[EventStream.cusumStream]] (Append
  * mode): the event with its committed two-sided CUSUM values and the
  * breach verdict.
  */
final case class CusumRow(
    key: Long, ts_ms: Long, tie: Long, value: Double,
    cusum_high: Double, cusum_low: Double, breach: Boolean)

/** Pending change-log row for [[EventStream.scd2Stream]]: buffered until
  * the watermark seals its position in the `(ts, tie)` event order.
  */
final case class Scd2Pending(tsMs: Long, tie: Long, attr: Option[String])

/** Per-key state for [[EventStream.scd2Stream]]: the OPEN version — the
  * batch builder's `is_current` row, held until an attribute change
  * closes it — plus the standard sealed-order buffer.
  */
final case class Scd2State(
    started: Boolean, attr: Option[String], version: Long,
    validFrom: Long, nEvents: Long, pending: Seq[Scd2Pending])

/** One CLOSED version from [[EventStream.scd2Stream]] (Append mode) —
  * exactly the batch [[graft.operators.Scd.scd2]] row with
  * `is_current = false`.
  */
final case class Scd2Row(
    key: Long, attr: Option[String], version: Long,
    valid_from: Long, valid_to: Long, n_events: Long)

/** Pending row for [[EventStream.asofStream]]: one event of EITHER side
  * (side 0 = right/reference, side 1 = left/probe — the batch
  * union-window tag), buffered until the watermark seals its position
  * in the `(ts, side, tie)` merge order.
  */
final case class AsofPending(
    tsMs: Long, side: Int, tie: Long, payload: Option[String])

/** Per-key state for [[EventStream.asofStream]]: the CARRIED right row
  * (the latest sealed reference at-or-before the fold cursor — the
  * streaming twin of the batch `last(payload, ignoreNulls)` window
  * carry) plus the standard sealed-order buffer. `carryTs = None`
  * means no reference has sealed yet.
  */
final case class AsofState(
    carryTs: Option[Long], carryTie: Long, carryPayload: Option[String],
    pending: Seq[AsofPending])

/** One matched left row from [[EventStream.asofStream]] (Append mode):
  * the batch [[graft.operators.KVOps.asofJoinBackward]] output row —
  * `asof_*` NULL when no reference at-or-before exists (or the match
  * is older than the tolerance).
  */
final case class AsofRow(
    key: Long, ts_ms: Long, tie: Long,
    asof_ts_ms: Option[Long], asof_payload: Option[String])

/** Per-key state for [[EventStream.asofForwardStream]]: sealed
  * references still inside some live probe's forward window, probes
  * waiting for their window to resolve, and the standard sealed-order
  * buffer — all bounded by the tolerance window.
  */
final case class AsofFwdState(
    refs: Seq[AsofPending], waiting: Seq[AsofPending],
    pending: Seq[AsofPending])

/** Per-key state for [[EventStream.dedupFirstStream]]: the best (smallest
  * `(ts, tie)`) candidate seen so far, and whether the key's canonical
  * row has already been emitted (after which every arrival is a
  * suppressed duplicate).
  */
final case class DedupState(
    emitted: Boolean, bestTs: Long, bestTie: Long, bestValue: Double)

/** The one emitted row per distinct key from [[EventStream.dedupFirstStream]]
  * (Append mode): the canonical first row by `(ts, tie)` event order.
  */
final case class DedupRow(key: Long, ts_ms: Long, tie: Long, value: Double)

/** Per-key state for [[EventStream.newVsReturningStream]]: the smallest
  * period bucket ever seen, the buckets awaiting their seal (watermark
  * has not passed their start), and the buckets already emitted.
  */
final case class NewVsState(
    minBucket: Long, pending: Seq[Long], sealedBuckets: Seq[Long])

/** One row per distinct (key, bucket) from
  * [[EventStream.newVsReturningStream]] (Append mode): `is_new` iff the
  * bucket is the key's earliest ever.
  */
final case class NewVsRow(key: Long, bucket: Long, is_new: Boolean)

/** [[EventStream.heavyHittersStream]] state and emission: the running
  * Misra–Gries summary per key — at most k (item, count) counters plus
  * the stream length `n`; `err = (n - sum(counts)) / (k+1)` bounds
  * every estimate from above exactly as in the batch aggregate.
  */
final case class HHState(n: Long, items: Seq[(String, Long)])
final case class HHUpdate(
    key: Long, n: Long, err: Long, items: Seq[(String, Long)])

/** [[EventStream.corpusReportStream]] state and emission: the running
  * per-source integer sums (the batch [[graft.llmops.Curation.corpusReport]]
  * aggregates — every one an integer, so the stateful fold is
  * association-free and EXACTLY equals the batch GROUP BY under any
  * arrival order/batching), plus the derived 6dp averages/share
  * recomputed per emission from the exact integers.
  */
final case class CRState(
    nDocs: Long, nTokens: Long, nChars: Long, nCode: Long,
    nRepl: Long, nCtrl: Long, nLatin: Long)
final case class CRUpdate(
    source: Option[String], n_docs: Long, n_tokens: Long, n_chars: Long,
    n_code_docs: Long, n_repl_chars: Long, n_ctrl_chars: Long,
    n_latin_docs: Long, avg_tokens: Double, avg_chars: Double,
    latin_share: Double)

/** [[EventStream.pipelineCleanStream]] emission: one surviving cleaned
  * document — the unit a streaming curation pipeline sinks to storage
  * (and feeds onward to [[EventStream.corpusReportStream]] in a second
  * query: Spark allows one arbitrary-stateful operator per query, so
  * the dedup and the report run as two chained queries, which is also
  * the operationally right split — the corpus sink and the dashboard
  * have different lifecycles).
  */
final case class E2ERow(
    doc_id: Long, lang: Option[String], source: Option[String],
    clean_text: String)

/** [[EventStream.quantilesStream]] state: the KLL compactor stack — per
  * level the retained values (weight 2^level), plus the stream length
  * and the accumulated worst-case rank-error bound, exactly the batch
  * [[graft.functions.expressions.KLLBuffer]] fields. O(k log n) per key,
  * forever — never the O(n) value multiset exact quantiles would need.
  */
final case class QSState(n: Long, errBound: Long, levels: Seq[Seq[Double]])
final case class QSUpdate(
    key: Long, n: Long, bound: Long, qs: Seq[Double])

/** [[EventStream.prioritySampleStream]] state: the running top-(k+1)
  * (priority, id) pairs per key plus the stream length — O(k) per key,
  * forever. k+1 (not k) so the tau threshold the batch estimator uses
  * is always emittable.
  */
final case class PSampleState(n: Long, pairs: Seq[(Double, Long)])

/** One [[EventStream.prioritySampleStream]] emission: the key's current
  * exact priority sample — ids with their priorities (best-first), the
  * tau threshold, and how many rows contributed.
  */
final case class PSampleUpdate(
    key: Long, n: Long, tau: Double, ids: Seq[Long], priorities: Seq[Double])

/** One buffered event for [[EventStream.attributionStream]]: a touch
  * (`isConv = false`, `channel` set) or a conversion (`isConv = true`,
  * `value` set). Touch rows are retained in state only inside the
  * lookback of the watermark.
  */
final case class AttrPending(
    tsMs: Long, tie: Long, isConv: Boolean, channel: String, value: Double)

/** [[EventStream.attributionStream]] state: sealed in-window touches
  * (fold-ordered by (ts, tie)) + the watermark-bounded pending buffer.
  */
final case class AttrState(touches: Seq[AttrPending], pending: Seq[AttrPending])

/** One credit cell from [[EventStream.attributionStream]] (Append mode):
  * a conversion's credit to one channel under one model — final at
  * emission; rolling up by (model, channel) reproduces the batch
  * operator's cells.
  */
final case class AttrCredit(
    key: Long, conv_id: Long, model: String, channel: String,
    credit: Double, n_touches: Long)

/** Structured Streaming surface: the real version of the reference's
  * WAL -> memtable -> flush pipeline (`kv/db.go:191-285`, SURVEY §2.3 B1/P4).
  * A micro-batch IS a flushed L0 generation; checkpointing replaces the WAL
  * replay and head-checkpoint machinery (B12).
  */
object EventStream {

  /** Transformation shared by batch and streaming: tumbling-window per-type
    * aggregates with a watermark for late data. Defined once so the batch
    * oracle and the streaming query are literally the same plan.
    */
  def windowedAgg(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    wm.groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Read a parquet events directory as a stream (file source — each new
    * file is a micro-batch, the L0-append analog).
    */
  def readEventsStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)

  /** Run the windowed aggregation as a streaming query into an in-memory
    * sink and block until all available input is processed. Returns the
    * result table name.
    */
  def runToMemory(stream: DataFrame, name: String): StreamingQuery = {
    val q = windowedAgg(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming ingestion into a GraftDB: each micro-batch appended as one
    * generation via foreachBatch — the exact group-commit shape of the
    * reference's write pipeline (`kv/db.go:224-285`).
    */
  def ingestToDb(stream: DataFrame, db: graft.core.GraftDB, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => db.write(batch) }
      .start()

  /** Streaming embedding ingest into a persisted IVF index: each
    * micro-batch appends through [[graft.llmops.Similarity.appendToIvfIndex]]
    * — staged-then-sealed (crash-safe), with the drift trigger deciding
    * per batch whether the coarse quantizer still covers the incoming
    * distribution (a drifted batch re-fits the index as its own new
    * generation). The streaming checkpoint gives at-least-once batch
    * delivery; a replayed batch re-appends its rows — ANN probe semantics
    * tolerate the duplicates (same id, same vector: they rank adjacently),
    * and the next drift re-fit collapses them (`dropDuplicates` on the id
    * in the rebuild). A replay also re-folds the batch's drift statistics;
    * that bias is bounded (mean distance is unchanged, only the weight
    * doubles) and likewise resets at the next re-fit. This is the "index
    * keeps up with the corpus" path a training-data pipeline runs beside
    * [[ingestToDb]].
    */
  def ingestToIvfIndex(
      stream: DataFrame,
      indexDir: String,
      checkpoint: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      refitFactor: Double = 4.0,
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llmops.Similarity.appendToIvfIndex(
          batch.sparkSession, indexDir, batch,
          idCol = idCol, vecCol = vecCol, refitFactor = refitFactor)
        // periodic maintenance keeps the sealed-batch count bounded over
        // a long-lived stream (compactEvery 0 = caller-managed): minor
        // folds cost only the appends since the last fold, and the
        // size-ratio policy schedules the occasional major so total
        // rewrite work stays O(log growth) per row — never a corpus
        // rewrite per fold cycle. Superseded dirs still wait for an
        // explicit vacuum so in-flight readers are never pulled out
        // from under.
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.llmops.Similarity.maintainIvfIndex(batch.sparkSession, indexDir)
        ()
      }
      .start()

  /** CDC-style streaming maintenance of a persisted IVF index — the
    * vector twin of [[ingestCdcToTextIndex]]: per micro-batch, "set" rows
    * append through [[graft.llmops.Similarity.appendToIvfIndex]] (staged
    * then sealed; ANN probes tolerate an at-least-once replay's duplicate
    * rows until a fold collapses them) and "del" ids tombstone through
    * [[graft.llmops.Similarity.deleteFromIvfIndex]] (idempotent — a
    * replayed delete writes nothing). Deletes win over same-batch sets of
    * the same id; the stream must be per-key ordered. `compactEvery` as
    * in [[ingestToIvfIndex]] — maintenance rewrites purge tombstones.
    */
  def ingestCdcToIvfIndex(
      stream: DataFrame,
      indexDir: String,
      checkpoint: String,
      opCol: String = "op",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      refitFactor: Double = 4.0,
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ops = batch.persist()
        try {
          val adds = ops.filter(col(opCol) === "set")
          if (!adds.isEmpty)
            graft.llmops.Similarity.appendToIvfIndex(
              batch.sparkSession, indexDir, adds,
              idCol = idCol, vecCol = vecCol, refitFactor = refitFactor)
          graft.llmops.Similarity.deleteFromIvfIndex(
            batch.sparkSession, indexDir,
            ops.filter(col(opCol) === "del").select(col(idCol)), idCol = idCol)
        } finally ops.unpersist()
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.llmops.Similarity.maintainIvfIndex(batch.sparkSession, indexDir)
        ()
      }
      .start()

  /** Streaming document ingest into a persisted inverted text index:
    * each micro-batch appends through
    * [[graft.llmops.Search.appendToTextIndex]] — staged-then-sealed
    * (crash-safe), and EXACTLY-once: the micro-batch id is passed as the
    * append's batch tag, so a checkpoint replay of an already-sealed
    * batch is a no-op instead of double-counting its term frequencies
    * (BM25's df/nDocs are exact counts — unlike the IVF probe, duplicate
    * rows would corrupt every score, so replays must be fenced, not
    * tolerated). The tag is the bare NUMERIC batch id: Structured
    * Streaming batch ids increase monotonically, so the index fences them
    * with a single high-water mark — O(1) manifest state at any stream
    * lifetime, instead of one remembered tag per micro-batch (see
    * [[graft.llmops.Search.TextIndexManifest]]). The index must exist
    * (`buildTextIndex`, possibly over an empty corpus) before the stream
    * starts.
    *
    * `compactEvery` > 0 runs [[graft.llmops.Search.maintainTextIndex]]
    * every that many micro-batches — without it a year of 1-minute
    * batches means ~500k roots unioned per query. Maintenance is a MINOR
    * fold (cost proportional to the data appended since the last fold —
    * prior fold products are never re-read) plus a size-ratio-scheduled
    * occasional MAJOR fold, so total rewrite work stays O(log growth)
    * per row over the stream's lifetime. Folds are bit-identical and
    * crash-safe (stage-then-swap), and replays are harmless: a fold
    * carries no tag, so re-running it after a checkpoint replay just
    * folds again. Superseded roots wait for an explicit
    * `vacuumTextIndex`.
    */
  def ingestToTextIndex(
      stream: DataFrame,
      indexDir: String,
      checkpoint: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llmops.Search.appendToTextIndex(
          indexDir, batch, batchTag = Some(batchId.toString),
          idCol = idCol, textCol = textCol)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.llmops.Search.maintainTextIndex(batch.sparkSession, indexDir)
        ()
      }
      .start()

  /** CDC-style streaming maintenance of a persisted text index: each
    * micro-batch carries interleaved document upserts and deletions
    * (`opCol` = "set" | "del"), replayed the way the reference replays
    * its WAL of Set/Del entries into the LSM. Per batch, the "set" rows
    * append through [[graft.llmops.Search.appendToTextIndex]] (sealed
    * exactly-once under the numeric batch tag) and the "del" ids then
    * tombstone through [[graft.llmops.Search.deleteFromTextIndex]] —
    * which is idempotent (already-dead and unknown ids are no-ops), so a
    * checkpoint replay of a half-applied batch CONVERGES: the re-run
    * append is fenced by the tag, the re-run delete deletes nothing new.
    *
    * Within one batch "del" wins over "set" of the same id (appends apply
    * first, then deletes — WAL order for a set followed by its delete).
    * The stream must be per-key ordered (the standard partition-by-key
    * CDC contract): a delete arriving BEFORE its document would no-op
    * and the late document would then resurrect. `compactEvery` as in
    * [[ingestToTextIndex]] — maintenance majors also purge accumulated
    * tombstones once they cross the dead-ratio.
    */
  def ingestCdcToTextIndex(
      stream: DataFrame,
      indexDir: String,
      checkpoint: String,
      opCol: String = "op",
      idCol: String = "doc_id",
      textCol: String = "text",
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ops = batch.persist()
        try {
          graft.llmops.Search.appendToTextIndex(
            indexDir, ops.filter(col(opCol) === "set"),
            batchTag = Some(batchId.toString), idCol = idCol, textCol = textCol)
          graft.llmops.Search.deleteFromTextIndex(
            indexDir, ops.filter(col(opCol) === "del").select(col(idCol)), idCol = idCol)
        } finally ops.unpersist()
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.llmops.Search.maintainTextIndex(batch.sparkSession, indexDir)
        ()
      }
      .start()

  /** Streaming near-duplicate detection at ingest: every micro-batch is
    * appended to a persisted [[graft.llmops.NearDupIndex]] (sealed
    * exactly-once under the numeric batch tag) and then PROBED against
    * it, writing each batch doc's near-duplicates — across the whole
    * collection history AND within the batch — to `pairsOut` as
    * `(probe_id, dup_id, jaccard)`. This is the dedup-vs-everything-
    * collected-so-far check [[dedupStream]]'s watermark-bounded exact
    * dedup cannot do. Probing AFTER the append makes a checkpoint replay
    * emit the identical pair set again (the append itself is fenced), so
    * `pairsOut` is at-least-once with idempotent content — dedupe by
    * (probe_id, dup_id) downstream.
    */
  def ingestToNearDupIndex(
      stream: DataFrame,
      indexDir: String,
      checkpoint: String,
      pairsOut: String,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.llmops.NearDupIndex
        NearDupIndex.appendToNearDupIndex(indexDir, batch,
          batchTag = Some(batchId.toString), idCol = idCol, textCol = textCol)
        NearDupIndex.probeNearDupIndex(batch.sparkSession, indexDir, batch,
            threshold, idCol = idCol, textCol = textCol)
          .write.mode("append").parquet(pairsOut)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          // the POLICY, not a forced fold: folds when roots pile up or
          // (with interleaved deletes) the dead fraction crosses the
          // threshold — the text/IVF CDC-ingest contract
          NearDupIndex.maintainNearDupIndex(batch.sparkSession, indexDir)
        ()
      }
      .start()

  /** CDC-style streaming maintenance of the near-dup index — the
    * [[ingestCdcToTextIndex]] contract applied to dedup-at-ingest: each
    * micro-batch carries interleaved upserts and deletions (`opCol` =
    * "set" | "del"); "set" rows append (fenced exactly-once by the
    * numeric batch tag) and then the "del" ids tombstone — so within one
    * batch "del" wins over "set" of the same id, and a checkpoint replay
    * converges (the re-run append is fenced, the re-run delete is
    * idempotent). The "set" rows are probed AFTER the deletes apply:
    * a new doc whose only near-dup died in the same batch reports no
    * pair — the collection-history answer at the batch boundary.
    * Per-key ordering is the caller's CDC contract, as in the text form.
    */
  def ingestCdcToNearDupIndex(
      stream: DataFrame,
      indexDir: String,
      checkpoint: String,
      pairsOut: String,
      threshold: Double,
      opCol: String = "op",
      idCol: String = "doc_id",
      textCol: String = "text",
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.llmops.NearDupIndex
        val ops = batch.persist()
        try {
          val sets = ops.filter(col(opCol) === "set")
          val dels = ops.filter(col(opCol) === "del").select(col(idCol))
          NearDupIndex.appendToNearDupIndex(indexDir, sets,
            batchTag = Some(batchId.toString), idCol = idCol, textCol = textCol)
          NearDupIndex.deleteFromNearDupIndex(indexDir, dels, idCol = idCol)
          // del wins on BOTH sides: a set+del'd doc is tombstoned in the
          // index (subtracted as dup_id) and excluded from the probe too
          NearDupIndex.probeNearDupIndex(batch.sparkSession, indexDir,
              sets.join(dels, Seq(idCol), "left_anti"),
              threshold, idCol = idCol, textCol = textCol)
            .write.mode("append").parquet(pairsOut)
        } finally ops.unpersist()
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          NearDupIndex.maintainNearDupIndex(batch.sparkSession, indexDir)
        ()
      }
      .start()

  /** Streaming exact dedup for ingest pipelines: keep the first row per
    * `keyCol`, dropping re-arrivals within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — key-only dedup with
    * watermark-evicted state). At 100 TB/day the state holds only the
    * horizon's keys, not history. (Exactly the dedup-at-ingest a
    * training-data pipeline runs before the heavier MinHash near-dup
    * pass; the batch dual is `Dedup.exactSurvivors`.)
    */
  def dedupStream(docs: DataFrame, keyCol: String,
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    docs.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCol)

  /** Streaming paragraph/unit keep-first dedup — the streaming dual of
    * the batch [[graft.llmops.Dedup.unitDedupKeepFirst]] (and of the
    * oracled `pipeline_paragraph_dedup` row): each distinct unit string
    * passes through EXACTLY ONCE across the whole stream history and
    * every later copy is dropped. Within one micro-batch the winner is
    * the minimum `(doc_id, pos)` (the batch operator's deterministic
    * rule); across micro-batches the earlier batch wins (arrival order —
    * the firehose semantics a stream can honestly offer).
    *
    * State per distinct unit is ONE boolean keyed by the unit text,
    * `NoTimeout` — keep-first against all history is unbounded by
    * definition, so state grows with corpus vocabulary of units; at
    * cluster scale this is what the RocksDB state store is for, and the
    * key is the unit STRING (not a hash), so the dedup is exact — a
    * 64-bit hash key would silently merge colliding units at
    * billion-unit cardinality. Emits surviving `(doc_id, pos, unit)`
    * rows; reassemble docs downstream with
    * [[graft.llmops.Dedup.dedupUnitsAndReassemble]]'s aggregation or
    * accept the unit stream as-is.
    */
  def dedupUnitsStream(docs: DataFrame, delimRe: String = "\\n+",
      idCol: String = "doc_id", textCol: String = "text"): Dataset[UnitRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val units = graft.llmops.Dedup.splitUnits(docs, delimRe, idCol, textCol)
      .as[(Long, Long, String)]
    units.groupByKey(_._3)
      .flatMapGroupsWithState[Boolean, UnitRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (unit: String, rows: Iterator[(Long, Long, String)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            val w = rows.minBy(r => (r._1, r._2))
            state.update(true)
            Iterator.single(UnitRow(w._1, w._2, unit))
          }
      }
  }

  /** Stream-stream interval join (the enrichment shape: attribute each
    * purchase to the same user's clicks in the preceding `windowMs`).
    * Works identically on batch frames — define the plan once, oracle it
    * in batch, run it on streams.
    *
    * In streaming mode BOTH sides are stateful: Spark buffers each side's
    * rows in the state store until the other side can no longer produce a
    * match, and it derives that eviction bound FROM the join condition —
    * which is why the time-interval predicate is part of the join instead
    * of a post-filter. With the `2 hours` watermark, a buffered click is
    * dropped once the purchase-side watermark passes click_ts + windowMs;
    * state is bounded by the horizon's row rate, never by history.
    */
  def enrichJoin(clicks: DataFrame, purchases: DataFrame,
      windowMs: Long = 600000L, watermark: String = "2 hours"): DataFrame = {
    def wm(df: DataFrame) = if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val c = wm(clicks).select(col("event_id").as("click_id"),
      col("user_id").as("click_user"), col("ts").as("click_ts"))
    val p = wm(purchases).select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("purchase_ts"))
    p.join(c,
        col("click_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMs MILLISECOND"))
      .select(col("purchase_id"), col("user_id"), col("click_id"))
  }

  /** Gap-based sessionization with CUSTOM state — the streaming dual of
    * the oracled batch `q_session_windows` query (same gap semantics),
    * via `flatMapGroupsWithState` (SURVEY §1: KeyValueGroupedDataset
    * custom state):
    *
    *  - state per user = the open session (start, end, count);
    *  - events extend the session while within `gapMs`, otherwise the old
    *    session is emitted closed and a new one opens;
    *  - an `EventTimeTimeout` fires once the watermark passes
    *    session end + gap, emitting the final session — no state leak for
    *    users that go quiet (the state store holds only OPEN sessions).
    *
    * Works identically on a batch Dataset except that trailing open
    * sessions are unemitted (batch has no timeout); callers flush those
    * with a terminal batch or use the batch query.
    */
  def sessionizeStream(events: DataFrame, gapMs: Long = 300000L,
      watermark: String = "2 hours"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1).flatMapGroupsWithState[OpenSession, Session](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
       state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(Session(user, s.startMs, s.endMs, s.n))
        } else {
          // micro-batch rows arrive unordered; sort before folding
          val ts = rows.map(_._2.getTime).toArray
          java.util.Arrays.sort(ts)
          var closed = List.empty[Session]
          var cur = state.getOption
          ts.foreach { t =>
            cur match {
              case Some(s) if t - s.endMs <= gapMs =>
                cur = Some(OpenSession(s.startMs, math.max(s.endMs, t), s.n + 1))
              case Some(s) =>
                closed ::= Session(user, s.startMs, s.endMs, s.n)
                cur = Some(OpenSession(t, t, 1))
              case None =>
                cur = Some(OpenSession(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // timeout must be in the watermark's future or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(s.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
          }
          closed.reverse.iterator
        }
    }
  }

  /** Streaming funnel — the streaming dual of the oracled batch
    * [[graft.operators.Analytics.funnelStages]] (q_funnel): per key, the
    * ordered stage frontier maintained incrementally as events arrive,
    * emitted (Update mode) whenever a stage completes. Exactness over
    * out-of-order arrival is the whole design: the fold is
    * order-sensitive, so events are BUFFERED until the watermark seals
    * their timestamp, then folded in (ts, tie) order with the batch
    * semantics verbatim — same-event stage cascade, `>=` frontier gates,
    * horizon bound against stage 0 — so the committed frontier equals
    * the batch operator over the sealed prefix (EventStreamSpec proves
    * batch == stream).
    *
    * Stage membership rides a BITS column (bit i = event satisfies stage
    * i, build with [[graft.operators.Analytics.stageBits]]) so arbitrary
    * Column predicates — overlapping included — cross the typed-state
    * boundary. State per key: one fixed-size frontier forever (funnel
    * history never un-happens; dropping a completed key would let a new
    * stage-0 event restart it) plus the watermark-bounded pending
    * buffer. An event-time timeout drains buffered events for keys that
    * go quiet once the watermark passes them.
    *
    * Input columns: `key` long, `ts` timestamp, `tie` long, `bits` long.
    */
  def funnelStream(
      events: DataFrame,
      nStages: Int,
      horizonMs: Option[Long] = None,
      watermark: String = "10 minutes"): Dataset[FunnelUpdate] = {
    require(nStages >= 1 && nStages <= 62,
      "funnelStream: nStages must be in [1, 62] (bits column)")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("bits").cast("long"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
    typed.groupByKey(_._1).flatMapGroupsWithState[FunnelState, FunnelUpdate](
      OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)],
       state: GroupState[FunnelState]) =>
        val prior = state.getOption.getOrElse(
          FunnelState(Seq.fill(nStages)(Long.MinValue), Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(r => FunnelPending(r._2.getTime, r._3, r._4))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        val frontier = prior.frontier.toArray
        var changed = false
        // the batch fold, verbatim: events in (ts, tie) order, each event
        // visiting stages in order (a single event may cascade several)
        ripe.sortBy(p => (p.tsMs, p.tie)).foreach { p =>
          var i = 0
          while (i < nStages) {
            if (frontier(i) == Long.MinValue && ((p.bits >> i) & 1L) == 1L) {
              val prevOk = i == 0 ||
                (frontier(i - 1) != Long.MinValue && p.tsMs >= frontier(i - 1))
              val horizonOk = i == 0 || horizonMs.forall(h =>
                frontier(0) != Long.MinValue && p.tsMs - frontier(0) <= h)
              if (prevOk && horizonOk) { frontier(i) = p.tsMs; changed = true }
            }
            i += 1
          }
        }
        state.update(FunnelState(frontier.toSeq, hold))
        if (hold.nonEmpty)
          state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        if (changed)
          Iterator.single(FunnelUpdate(key,
            frontier.map(v => if (v == Long.MinValue) None else Some(v)).toSeq,
            frontier.count(_ != Long.MinValue)))
        else Iterator.empty
    }
  }

  /** Streaming interval coalescing — the streaming dual of the oracled
    * batch gaps-and-islands ([[graft.operators.Intervals.coalesce]],
    * q_interval_coalesce): per key, overlapping-or-touching closed
    * intervals merge into maximal islands, emitted (Append mode) once
    * CLOSED — the watermark has passed the island's end, so no
    * non-late interval can start inside it and the island can never
    * grow again. [[sessionizeStream]] is the point-events special case
    * of this; here whole `[s, e]` intervals arrive.
    *
    * Exactness over out-of-order arrival rides the [[funnelStream]]
    * discipline: the island fold sorts by the START column, so
    * intervals buffer in state until the watermark (on `ts` = the
    * interval start) seals them, then fold in (s, e) order with the
    * batch rule verbatim (`s <= open.end` merges, else a new island).
    * State per key: one open island + the watermark-bounded pending
    * buffer. Event-time timeouts close islands for keys that go quiet.
    *
    * Input columns: `key` long, `ts` timestamp (the interval START —
    * also the watermark column), `end_ms` long. NULL-bounded intervals
    * are dropped, as in the batch operator.
    */
  def coalesceIntervalsStream(
      intervals: DataFrame,
      watermark: String = "10 minutes"): Dataset[IslandRow] = {
    val spark = intervals.sparkSession
    import spark.implicits._
    val typed = intervals
      .withWatermark("ts", watermark)
      .filter(col("ts").isNotNull && col("end_ms").isNotNull)
      .select(col("key").cast("long"), col("ts"), col("end_ms").cast("long"))
      .as[(Long, java.sql.Timestamp, Long)]
    typed.groupByKey(_._1).flatMapGroupsWithState[CoalesceState, IslandRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
       state: GroupState[CoalesceState]) =>
        val prior = state.getOption.getOrElse(
          CoalesceState(hasOpen = false, 0L, 0L, 0L, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++ rows.map(r => (r._2.getTime, r._3))
        val (ripe, hold) = pending.partition(_._1 <= wm)
        var open: Option[(Long, Long, Long)] =
          if (prior.hasOpen) Some((prior.startMs, prior.endMs, prior.n)) else None
        val closed = Seq.newBuilder[IslandRow]
        ripe.sortBy(identity).foreach { case (s, e) =>
          open match {
            case Some((os, oe, n)) if s <= oe =>
              open = Some((os, math.max(oe, e), n + 1))
            case Some((os, oe, n)) =>
              closed += IslandRow(key, os, oe, n)
              open = Some((s, e, 1L))
            case None =>
              open = Some((s, e, 1L))
          }
        }
        // the open island can never grow once the watermark passes its
        // end: any interval starting at-or-before it would now be late
        open match {
          case Some((os, oe, n)) if wm > oe =>
            closed += IslandRow(key, os, oe, n)
            open = None
          case _ => ()
        }
        if (open.isEmpty && hold.isEmpty) state.remove()
        else {
          state.update(CoalesceState(open.isDefined,
            open.map(_._1).getOrElse(0L), open.map(_._2).getOrElse(0L),
            open.map(_._3).getOrElse(0L), hold))
          val wake = (open.map(_._2 + 1).toSeq ++ hold.map(_._1)).min
          state.setTimeoutTimestamp(math.max(wake, wm + 1))
        }
        closed.result().iterator
    }
  }

  /** Streaming EWMA — the streaming dual of the oracled batch segmented
    * scan ([[graft.operators.Resample.ewma]], q_ewma): per key, each
    * observation's smoothed value `s_i = (1-alpha) * s_{i-1} + alpha *
    * x_i` (s_1 = x_1), emitted (Append mode) exactly once — when the
    * watermark passes the event's timestamp, sealing its slot in the
    * `(ts, tie)` total order so no non-late arrival can change it.
    *
    * Exactness over out-of-order arrival rides the [[funnelStream]]
    * discipline: events buffer in state until sealed, then fold in
    * `(ts, tie)` order with the batch recurrence VERBATIM (same
    * sequential float associativity, same 6dp HALF_UP rounding on
    * emit), so stream output == batch output row for row. State per
    * key: the committed carry (one double — smoothing never forgets)
    * plus the watermark-bounded pending buffer; event-time timeouts
    * flush sealed-but-quiet keys.
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column),
    * `tie` long, `value` double.
    */
  def ewmaStream(
      events: DataFrame,
      alpha: Double,
      watermark: String = "10 minutes"): Dataset[EwmaRow] = {
    require(alpha > 0 && alpha <= 1, "ewmaStream: alpha must be in (0, 1]")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1).flatMapGroupsWithState[EwmaState, EwmaRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
       state: GroupState[EwmaState]) =>
        val prior = state.getOption.getOrElse(EwmaState(started = false, 0.0, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(r => EwmaPending(r._2.getTime, r._3, r._4))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        var started = prior.started
        var s = prior.s
        val out = ripe.sortBy(p => (p.tsMs, p.tie)).map { p =>
          s = if (started) (1 - alpha) * s + alpha * p.x else p.x
          started = true
          EwmaRow(key, p.tsMs, p.tie, p.x,
            BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        if (!started && hold.isEmpty) state.remove()
        else {
          state.update(EwmaState(started, s, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming Holt linear-trend smoothing — the streaming dual of the
    * oracled batch [[graft.operators.Resample.holt]] (q_holt): per key,
    * each sealed observation folds the 2-state recurrence `l' = alpha*x
    * + (1-alpha)*(l + b); b' = beta*(l' - l) + (1-beta)*b` (init `l=x,
    * b=0`) in `(ts, tie)` order — the [[ewmaStream]] discipline with a
    * two-double carry, same 6dp HALF_UP rounding, so stream == batch row
    * for row.
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column),
    * `tie` long, `value` double.
    */
  def holtStream(
      events: DataFrame,
      alpha: Double,
      beta: Double,
      watermark: String = "10 minutes"): Dataset[HoltRow] = {
    require(alpha > 0 && alpha <= 1, "holtStream: alpha must be in (0, 1]")
    require(beta >= 0 && beta <= 1, "holtStream: beta must be in [0, 1]")
    val spark = events.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1).flatMapGroupsWithState[HoltState, HoltRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
       state: GroupState[HoltState]) =>
        val prior = state.getOption.getOrElse(
          HoltState(started = false, 0.0, 0.0, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(r => EwmaPending(r._2.getTime, r._3, r._4))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        var started = prior.started
        var l = prior.l
        var b = prior.b
        val out = ripe.sortBy(p => (p.tsMs, p.tie)).map { p =>
          if (!started) { l = p.x; b = 0.0; started = true }
          else {
            val l2 = alpha * p.x + (1 - alpha) * (l + b)
            b = beta * (l2 - l) + (1 - beta) * b
            l = l2
          }
          HoltRow(key, p.tsMs, p.tie, p.x, r6(l), r6(b))
        }
        if (!started && hold.isEmpty) state.remove()
        else {
          state.update(HoltState(started, l, b, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming time-decayed score — the streaming dual of the oracled
    * batch [[graft.operators.Resample.decayedSum]] (q_decay): per key,
    * each sealed observation emits `s = exp(-ln2 * dt / halfLifeMs) *
    * s_prev + w` with `dt` measured against the true predecessor (the
    * sealed-order buffer guarantees it even under out-of-order
    * arrival). Decay is applied LAZILY at the next fold — the committed
    * state is `(score, committed-at ts)`, two numbers per key, so a
    * silent key costs nothing and reads of the emitted stream decay
    * downstream if they need "as of now" values. Same (ts, tie) fold
    * order and 6dp HALF_UP rounding as the batch form, so stream ==
    * batch row for row.
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column),
    * `tie` long, `value` double (the weight).
    */
  def decayStream(
      events: DataFrame,
      halfLifeMs: Long,
      watermark: String = "10 minutes"): Dataset[DecayRow] = {
    require(halfLifeMs > 0, "decayStream: halfLifeMs must be positive")
    val lambda = math.log(2.0) / halfLifeMs
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1).flatMapGroupsWithState[DecayState, DecayRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
       state: GroupState[DecayState]) =>
        val prior = state.getOption.getOrElse(
          DecayState(started = false, 0L, 0.0, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(r => EwmaPending(r._2.getTime, r._3, r._4))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        var st = prior
        val out = ripe.sortBy(p => (p.tsMs, p.tie)).map { p =>
          val s =
            if (!st.started) p.x
            else math.exp(-lambda * (p.tsMs - st.lastTs)) * st.s + p.x
          st = DecayState(started = true, p.tsMs, s, Nil)
          DecayRow(key, p.tsMs, p.tie, p.x,
            BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        if (!st.started && hold.isEmpty) state.remove()
        else {
          state.update(st.copy(pending = hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming CUSUM drift monitor — the streaming dual of the oracled
    * batch [[graft.operators.Resample.cusum]] (q_cusum): per key, each
    * sealed observation folds `hi' = max(0, hi + (x - target - slack))`
    * and `lo' = max(0, lo + (target - slack - x))` in `(ts, tie)` order
    * and emits both sides plus the breach verdict. Committed state is
    * two doubles per key (the [[ewmaStream]] discipline); same 6dp
    * HALF_UP rounding as the batch form, so stream == batch row for
    * row — the alerting form: run against the live stream, with the
    * batch chart as the backfill/audit twin.
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column),
    * `tie` long, `value` double.
    */
  def cusumStream(
      events: DataFrame,
      target: Double,
      slack: Double,
      threshold: Double,
      watermark: String = "10 minutes"): Dataset[CusumRow] = {
    require(slack >= 0 && threshold > 0,
      "cusumStream: slack >= 0, threshold > 0")
    val spark = events.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1).flatMapGroupsWithState[CusumState, CusumRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
       state: GroupState[CusumState]) =>
        val prior = state.getOption.getOrElse(CusumState(0.0, 0.0, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(r => EwmaPending(r._2.getTime, r._3, r._4))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        var hi = prior.hi
        var lo = prior.lo
        val out = ripe.sortBy(p => (p.tsMs, p.tie)).map { p =>
          hi = math.max(0.0, hi + (p.x - target - slack))
          lo = math.max(0.0, lo + (target - slack - p.x))
          val (rh, rl) = (r6(hi), r6(lo))
          CusumRow(key, p.tsMs, p.tie, p.x, rh, rl,
            rh > threshold || rl > threshold)
        }
        if (hi == 0.0 && lo == 0.0 && ripe.isEmpty && hold.isEmpty)
          state.remove()
        else {
          state.update(CusumState(hi, lo, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming SCD Type-2 history builder — the streaming dual of the
    * oracled batch [[graft.operators.Scd.scd2]] (q_scd2): per key,
    * sealed rows fold in `(ts, tie)` EVENT order; a (null-safe)
    * attribute change CLOSES the open version and emits it with
    * `valid_to` = the new version's `valid_from` — the batch builder's
    * `is_current = false` row, value for value (Scd2StreamSpec pins the
    * parity). No-op updates extend the open version's `n_events`
    * without emitting; the OPEN version is the state itself (Append
    * mode cannot retract, so the current row surfaces only when a later
    * change closes it — the live dimension read stays with the batch
    * builder or the state store).
    *
    * State cost: four scalars + the open attribute per key, plus the
    * sealed-order buffer for rows still inside the watermark — the
    * [[ewmaStream]] discipline, sharded across executors by the
    * groupByKey exchange at scale.
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column),
    * `tie` long, `attr` string (nullable — a NULL attr equals a NULL
    * attr and does NOT reopen, matching the batch struct `<=>`).
    */
  def scd2Stream(
      events: DataFrame,
      watermark: String = "10 minutes"): Dataset[Scd2Row] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("attr").cast("string"))
      .as[(Long, java.sql.Timestamp, Long, Option[String])]
    typed.groupByKey(_._1).flatMapGroupsWithState[Scd2State, Scd2Row](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Option[String])],
       state: GroupState[Scd2State]) =>
        val prior = state.getOption.getOrElse(
          Scd2State(started = false, None, 0L, 0L, 0L, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(r => Scd2Pending(r._2.getTime, r._3, r._4))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        var st = prior
        val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Row]
        ripe.sortBy(p => (p.tsMs, p.tie)).foreach { p =>
          if (!st.started)
            st = Scd2State(started = true, p.attr, 1L, p.tsMs, 1L, Nil)
          else if (st.attr == p.attr) // Option equality = the batch <=>
            st = st.copy(nEvents = st.nEvents + 1)
          else {
            out += Scd2Row(key, st.attr, st.version, st.validFrom,
              p.tsMs, st.nEvents)
            st = Scd2State(started = true, p.attr, st.version + 1L,
              p.tsMs, 1L, Nil)
          }
        }
        if (!st.started && hold.isEmpty) state.remove()
        else {
          state.update(st.copy(pending = hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming BACKWARD as-of join — the streaming dual of the oracled
    * batch [[graft.operators.KVOps.asofJoinBackward]] (q_asof /
    * graft_asof): for every LEFT (probe) event, attach the payload of
    * the latest RIGHT (reference) event with the same key and
    * `rightTs <= leftTs`, NULL when none exists or the match is older
    * than `toleranceMs` — prices onto trades, deploys onto errors,
    * config versions onto requests, as the events arrive.
    *
    * Both sides union into ONE keyed stream tagged `side` (0 = right,
    * 1 = left) — the batch union-window trick carried over: state never
    * holds a join buffer of right HISTORY, only the single latest
    * sealed reference, because backward as-of is a carry, not a join.
    * The sealed-order fold (the [[scd2Stream]] discipline) buffers rows
    * inside the watermark, and once the watermark passes them replays
    * in `(ts, side, tie)` order: a right row overwrites the carry
    * (side 0 sorts first, so an equal-timestamp reference matches its
    * probe — the batch INCLUSIVE bound; equal-timestamp references
    * resolve to the largest `tie`, the batch `rightOrderCol` rule), a
    * left row emits with the current carry. Out-of-order arrival
    * within the watermark cannot change the output (AsofStreamSpec
    * pins batch ≡ stream on shuffled histories).
    *
    * State cost: ONE carried reference + the sealed-order buffer per
    * key. The carry never expires on its own — a reference matches
    * probes arbitrarily far in the future, exactly like the batch
    * window carry; `toleranceMs` bounds match STALENESS in the output,
    * and keys whose stream ends simply hold one row of state (sharded
    * by the groupByKey exchange at scale).
    *
    * Input columns — left: `key` long, `ts` timestamp, `tie` long;
    * right: `key` long, `ts` timestamp, `tie` long, `payload` string
    * (nullable). The watermark applies to the unioned stream, so both
    * sides share one lateness budget, as one stream-stream watermark
    * would. Engine caveat inherited by every watermark-ed stateful
    * operator here: Spark's late filter drops rows AT the watermark
    * (sealed means final), and the initial watermark is 0 — an event
    * timestamped exactly epoch 0 is late before the stream starts.
    */
  def asofStream(
      left: DataFrame,
      right: DataFrame,
      watermark: String = "10 minutes",
      toleranceMs: Option[Long] = None): Dataset[AsofRow] = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.select(col("key").cast("long"), col("ts"),
      lit(1).as("side"), col("tie").cast("long"),
      lit(null).cast("string").as("payload"))
    val r = right.select(col("key").cast("long"), col("ts"),
      lit(0).as("side"), col("tie").cast("long"),
      col("payload").cast("string"))
    val typed = l.unionByName(r)
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Int, Long, Option[String])]
    val tol = toleranceMs
    typed.groupByKey(_._1).flatMapGroupsWithState[AsofState, AsofRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Int, Long, Option[String])],
       state: GroupState[AsofState]) =>
        val prior = state.getOption.getOrElse(AsofState(None, 0L, None, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(e => AsofPending(e._2.getTime, e._3, e._4, e._5))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        var st = prior
        val out = scala.collection.mutable.ArrayBuffer.empty[AsofRow]
        ripe.sortBy(p => (p.tsMs, p.side, p.tie)).foreach { p =>
          if (p.side == 0)
            st = st.copy(carryTs = Some(p.tsMs), carryTie = p.tie,
              carryPayload = p.payload)
          else {
            val inTol = st.carryTs.exists(ct =>
              tol.forall(t => p.tsMs - ct <= t))
            out += AsofRow(key, p.tsMs, p.tie,
              if (inTol) st.carryTs else None,
              if (inTol) st.carryPayload else None)
          }
        }
        if (st.carryTs.isEmpty && hold.isEmpty) state.remove()
        else {
          state.update(st.copy(pending = hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming FORWARD as-of join — the dual of the batch
    * [[graft.operators.KVOps.asofJoinForward]] with a tolerance: for
    * every LEFT probe, the EARLIEST RIGHT reference with
    * `probeTs <= refTs <= probeTs + toleranceMs` (equal-timestamp
    * references break toward the SMALLEST `tie`, the batch forward
    * rule), or NULLs once the watermark proves none can arrive —
    * "what happens next": the next error after each deploy, the next
    * purchase after each click.
    *
    * The tolerance is REQUIRED here where batch leaves it optional:
    * an unbounded forward match would hold every probe (and state)
    * forever awaiting a reference that may never come; the bound is
    * what makes the wait — and the state — finite. Emission timing:
    * a probe emits the moment a sealed in-window reference exists
    * (sealed references are complete up to the watermark, so the
    * earliest sealed candidate IS the earliest candidate), or the
    * moment the watermark passes `probeTs + tolerance` (every
    * still-unsealed reference is provably later). State per key:
    * waiting probes + references inside some live window + the
    * sealed-order buffer — all tolerance-bounded, unlike
    * [[asofStream]]'s single everlasting carry.
    *
    * Input columns match [[asofStream]] (left: key/ts/tie; right:
    * key/ts/tie/payload); one shared watermark over the union.
    */
  def asofForwardStream(
      left: DataFrame,
      right: DataFrame,
      toleranceMs: Long,
      watermark: String = "10 minutes"): Dataset[AsofRow] = {
    require(toleranceMs >= 0, "asofForwardStream: tolerance must be >= 0")
    val spark = left.sparkSession
    import spark.implicits._
    val l = left.select(col("key").cast("long"), col("ts"),
      lit(1).as("side"), col("tie").cast("long"),
      lit(null).cast("string").as("payload"))
    val r = right.select(col("key").cast("long"), col("ts"),
      lit(0).as("side"), col("tie").cast("long"),
      col("payload").cast("string"))
    val typed = l.unionByName(r)
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Int, Long, Option[String])]
    typed.groupByKey(_._1).flatMapGroupsWithState[AsofFwdState, AsofRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Int, Long, Option[String])],
       state: GroupState[AsofFwdState]) =>
        val prior = state.getOption.getOrElse(AsofFwdState(Nil, Nil, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(e => AsofPending(e._2.getTime, e._3, e._4, e._5))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        val refs = (prior.refs ++ ripe.filter(_.side == 0))
          .sortBy(p => (p.tsMs, p.tie))
        val out = scala.collection.mutable.ArrayBuffer.empty[AsofRow]
        val waiting = ((prior.waiting ++ ripe.filter(_.side == 1))
          .sortBy(p => (p.tsMs, p.tie))).filter { p =>
          refs.find(rf => rf.tsMs >= p.tsMs &&
              rf.tsMs - p.tsMs <= toleranceMs) match {
            case Some(rf) =>
              out += AsofRow(key, p.tsMs, p.tie, Some(rf.tsMs), rf.payload)
              false
            case None if wm > p.tsMs + toleranceMs =>
              out += AsofRow(key, p.tsMs, p.tie, None, None); false
            case None => true
          }
        }
        // a reference can still matter only to a waiting probe's window
        // or to a future probe (whose ts is >= the watermark — Spark
        // drops later-than-late input below it)
        val keepFrom = (waiting.map(_.tsMs) :+ wm).min
        val keptRefs = refs.filter(_.tsMs >= keepFrom)
        if (waiting.isEmpty && hold.isEmpty && keptRefs.isEmpty) state.remove()
        else {
          state.update(AsofFwdState(keptRefs, waiting, hold))
          // always schedule a wake-up: waiting probes resolve at their
          // window end, held rows at their seal point, and a refs-only
          // state (references at the exact watermark edge) folds once
          // more so the next advance prunes it to empty and removes —
          // no timeout would leave it behind forever on a quiet key
          val next = (waiting.map(_.tsMs + toleranceMs + 1) ++
            hold.map(_.tsMs)).reduceOption(_ min _).getOrElse(wm + 1)
          state.setTimeoutTimestamp(math.max(next, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming heavy hitters — the streaming dual of the gated batch
    * [[graft.functions.expressions.MisraGries]] aggregate
    * (q_heavy_hitters_gate): per key, the k-counter Misra–Gries summary
    * maintained in state and re-emitted (Update mode) whenever the key
    * sees data. NO watermark buffering on purpose: the sketch's
    * guarantees — `est <= true <= est + err` and containment of every
    * item above n/(k+1) — hold for ANY fold order (that is the theorem
    * the batch gate certifies), so arrival order only perturbs WHICH
    * sub-threshold items ride along, never the contract. State per key:
    * at most k counters + one long, forever — the streaming profiler's
    * price for top-items over an unbounded stream that exact counting
    * would need unbounded state for.
    *
    * Input columns: `key` long, `item` string.
    */
  def heavyHittersStream(
      events: DataFrame,
      k: Int): Dataset[HHUpdate] = {
    require(k > 0, "heavyHittersStream: k must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("key").cast("long"), col("item").cast("string"))
      .as[(Long, String)]
    typed.groupByKey(_._1).mapGroupsWithState[HHState, HHUpdate](
      GroupStateTimeout.NoTimeout) {
      (key: Long, rows: Iterator[(Long, String)], state: GroupState[HHState]) =>
        val buf = new graft.functions.expressions.MGBuffer(k)
        state.getOption.foreach { st =>
          buf.n = st.n
          st.items.foreach { case (item, c) => buf.counts.put(item, c) }
        }
        rows.foreach { r => if (r._2 != null) buf.update(r._2) }
        val items = buf.counts.entrySet().toArray(
            Array.empty[java.util.Map.Entry[String, Long]])
          .sortBy(e => (-e.getValue, e.getKey))
          .map(e => (e.getKey, e.getValue)).toSeq
        state.update(HHState(buf.n, items))
        HHUpdate(key, buf.n, (buf.n - buf.retained) / (k + 1), items)
    }
  }

  /** Streaming ingest twin of the batch `pipeline_e2e` composite's
    * corpus-producing stages: C4-inspired line cleaning, the
    * encoding/script audit gate on the CLEANED text plus a kept-line
    * floor (all stateless narrow maps — the same expressions as the
    * batch plan), exact keep-first dedup per clean-text fingerprint,
    * and the temperature-mix keep filter against a STATIC
    * [[graft.llmops.Curation.temperatureRates]] fit (the fit/apply
    * split's purpose). Emits the surviving cleaned documents (Append
    * mode) — the stream a curation pipeline sinks as its corpus.
    *
    * Dedup semantics a stream can honestly offer: within one
    * micro-batch the winner is the MIN doc_id (the batch operator's
    * deterministic rule — so single-batch delivery reproduces the
    * batch pipeline exactly, spec-proved); across micro-batches the
    * earlier batch wins (arrival order). State per distinct cleaned
    * document is ONE boolean keyed by the md5 fingerprint string,
    * `NoTimeout` — keep-first against all history is unbounded by
    * definition; at cluster scale the RocksDB state store carries it.
    *
    * Input columns: idCol long-castable, langCol/sourceCol/textCol
    * string.
    */
  def pipelineCleanStream(
      docs: DataFrame,
      rates: Seq[(Option[String], Double)],
      minKeptLines: Int = 8,
      encScoreFloor: Double = 0.9,
      expectScript: String = "latin",
      idCol: String = "doc_id",
      langCol: String = "lang",
      sourceCol: String = "source",
      textCol: String = "text"): Dataset[E2ERow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rates.forall { case (_, f) => f >= 0.0 && f <= 1.0 },
      "pipelineCleanStream: rates must be in [0, 1]")
    val cleaned = graft.functions.Text.withC4LineClean(docs, col(textCol))
    val gated = graft.functions.Text.withScriptProfile(
        graft.functions.Text.withEncodingQuality(cleaned, col("clean_text")),
        col("clean_text"))
      .filter(col("n_kept") >= minKeptLines &&
        col("enc_score") >= encScoreFloor &&
        col("script_pred") === expectScript)
      .select(col(idCol).cast("long").as("doc_id"),
        col(langCol).cast("string").as("lang"),
        col(sourceCol).cast("string").as("source"),
        col("clean_text"),
        graft.functions.Text.fingerprint(col("clean_text")).as("__fp"))
      .as[(Long, Option[String], Option[String], String, String)]
    val deduped = gated.groupByKey(_._5)
      .flatMapGroupsWithState[Boolean, E2ERow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String,
         rows: Iterator[(Long, Option[String], Option[String], String, String)],
         state: GroupState[Boolean]) =>
          if (state.getOption.contains(true)) Iterator.empty
          else {
            state.update(true)
            val w = rows.minBy(_._1)
            Iterator.single(E2ERow(w._1, w._2, w._3, w._4))
          }
      }
    // the mix keep filter is a stateless narrow map over the survivor
    // stream — Append mode end to end
    graft.llmops.Curation.applyStratumRates(deduped.toDF(), "lang", rates)
      .as[E2ERow]
  }

  /** Streaming corpus health report — the streaming dual of the batch
    * [[graft.llmops.Curation.corpusReport]] dashboard: per SOURCE, the
    * running integer sums (docs, nonempty tokens, chars, code-routed
    * docs, U+FFFD chars, control chars, Latin-argmax docs) with the
    * derived 6dp averages/share re-emitted whenever the source sees
    * data (Update mode). The per-row signals are the SAME expressions
    * as the batch plan ([[graft.llmops.Curation.corpusSignals]] — one
    * narrow map before the stateful fold), and every folded value is
    * an INTEGER, so the stream's final state equals the batch GROUP BY
    * EXACTLY under any arrival order or batching (the integer-sum
    * discipline is what makes this dual trivial — no merge-order
    * float drift to reconcile; spec-proved through MemoryStream).
    * NULL source is a group of its own (Option key — the batch keys
    * NULL too; silent group loss is a bias bug). State per source:
    * seven longs, forever.
    *
    * Input columns: `sourceCol` string, `textCol` string.
    */
  def corpusReportStream(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): Dataset[CRUpdate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sig = graft.llmops.Curation.corpusSignals(docs, textCol)
      .select(col(sourceCol).cast("string"), col("__cr_toks"),
        col("__cr_chars"), col("__cr_code"), col("__cr_repl"),
        col("__cr_ctrl"), col("__cr_latdoc"))
      .as[(Option[String], Long, Long, Long, Long, Long, Long)]
    sig.groupByKey(_._1).mapGroupsWithState[CRState, CRUpdate](
      GroupStateTimeout.NoTimeout) {
      (source: Option[String],
       rows: Iterator[(Option[String], Long, Long, Long, Long, Long, Long)],
       state: GroupState[CRState]) =>
        var st = state.getOption.getOrElse(CRState(0L, 0L, 0L, 0L, 0L, 0L, 0L))
        rows.foreach { r =>
          st = CRState(st.nDocs + 1L, st.nTokens + r._2, st.nChars + r._3,
            st.nCode + r._4, st.nRepl + r._5, st.nCtrl + r._6,
            st.nLatin + r._7)
        }
        state.update(st)
        CRUpdate(source, st.nDocs, st.nTokens, st.nChars, st.nCode,
          st.nRepl, st.nCtrl, st.nLatin,
          r6(st.nTokens.toDouble / st.nDocs),
          r6(st.nChars.toDouble / st.nDocs),
          r6(st.nLatin.toDouble / st.nDocs))
    }
  }

  /** Streaming quantiles — the streaming dual of the gated batch
    * [[graft.functions.expressions.QuantileSketch]] aggregate
    * (q_quantiles_sketch_gate), closing the profiler's last
    * batch-only family (heavy hitters and HLL profiles already had
    * streaming twins; percentiles did not — exact
    * [[graft.operators.Rank.quantilesDisc]] is a 3-pass batch plan no
    * stream can incrementalize). Per key, the KLL compactor stack is
    * maintained in state and the current quantile answers re-emitted
    * (Update mode) whenever the key sees data. NO watermark buffering
    * on purpose: the sketch's carried bound — every answer's true rank
    * within `bound` of `max(1, ceil(p*n))` — holds for ANY fold order
    * (the theorem the batch gate certifies), so arrival order only
    * perturbs WHICH retained values answer, never the contract.
    * State per key: O(k log n) doubles, forever.
    *
    * Input columns: `key` long, `value` double.
    */
  def quantilesStream(
      events: DataFrame,
      probs: Seq[Double],
      k: Int): Dataset[QSUpdate] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "quantilesStream: probs must be in [0, 1]")
    require(k >= 8, "quantilesStream: k must be >= 8")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("key").cast("long"), col("value").cast("double"))
      .as[(Long, java.lang.Double)]
    typed.groupByKey(_._1).mapGroupsWithState[QSState, QSUpdate](
      GroupStateTimeout.NoTimeout) {
      (key: Long, rows: Iterator[(Long, java.lang.Double)],
       state: GroupState[QSState]) =>
        val buf = new graft.functions.expressions.KLLBuffer(k)
        state.getOption.foreach { st =>
          buf.n = st.n
          buf.errBound = st.errBound
          st.levels.zipWithIndex.foreach { case (lvl, h) =>
            while (buf.levels.size <= h)
              buf.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
            buf.levels(h) ++= lvl
          }
        }
        rows.foreach { r => if (r._2 != null) buf.update(r._2.doubleValue()) }
        state.update(QSState(buf.n, buf.errBound,
          buf.levels.map(_.toSeq).toSeq))
        if (buf.n == 0L) QSUpdate(key, 0L, 0L, Nil)
        else QSUpdate(key, buf.n, buf.bound, buf.quantiles(probs))
    }
  }

  /** Streaming priority sample — the streaming dual of the oracled batch
    * [[graft.llmops.Curation.prioritySample]] (pipeline_priority_sample):
    * per key, the running EXACT fixed-size weighted sample without
    * replacement. Unlike the sketch twins (heavy hitters, quantiles),
    * the stream here is not an approximation of the batch answer — the
    * priority `w/u` is a pure function of (id, weight) and a top-k of a
    * set is order-independent, so after any prefix of the stream the
    * emission IS the batch sample of exactly the rows seen so far
    * (PrioritySampleStreamSpec proves bit-parity under shuffled
    * delivery and across restarts). NO watermark buffering needed for
    * the same reason. State per key: k+1 (priority, id) pairs + one
    * long, forever.
    *
    * Input columns: `key` long (stratum), `doc_id` long, `w` positive
    * numeric weight. A null/non-positive weight fails the query loudly
    * (the batch operator's plan-guard contract — silent drops would
    * bias every later sample), and so does a non-long-castable
    * `doc_id` (same guard, same column-over failure mode).
    */
  def prioritySampleStream(
      docs: DataFrame,
      k: Int): Dataset[PSampleUpdate] = {
    require(k > 0, "prioritySampleStream: k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // priority computed as the SAME column expression the batch
    // operator uses (bit-identical md5 bits + one rounded division);
    // doc_id carries the batch operator's id plan-guard — a
    // non-long-castable id would otherwise decode-fail (or silently
    // skew the sample) instead of naming the offending value
    val typed = docs
      .select(col("key").cast("long"),
        graft.llmops.Curation.guardedLongId(col("doc_id"), "doc_id",
          "prioritySampleStream").as("doc_id"),
        col("w").cast("double"),
        graft.llmops.Curation.priorityKey(col("doc_id"), col("w")).as("pri"))
      .as[(Long, Long, java.lang.Double, java.lang.Double)]
    typed.groupByKey(_._1).mapGroupsWithState[PSampleState, PSampleUpdate](
      GroupStateTimeout.NoTimeout) {
      (key: Long, rows: Iterator[(Long, Long, java.lang.Double, java.lang.Double)],
       state: GroupState[PSampleState]) =>
        val buf = new graft.functions.expressions.TopKByBuffer(k + 1)
        var n = 0L
        state.getOption.foreach { st =>
          n = st.n
          st.pairs.foreach { case (s, i) => buf.insert(s, i) }
        }
        rows.foreach { r =>
          if (r._3 == null || r._3.doubleValue() <= 0.0)
            throw new IllegalArgumentException(
              s"prioritySampleStream: weight must be a positive numeric " +
                s"value, got ${r._3} for doc_id ${r._2}")
          buf.insert(r._4.doubleValue(), r._2)
          n += 1
        }
        val pairs = buf.sortedPairs.toSeq
        state.update(PSampleState(n, pairs))
        val (sample, tail) = pairs.splitAt(k)
        PSampleUpdate(key, n,
          tail.headOption.map(_._1).getOrElse(0.0),
          sample.map(_._2), sample.map(_._1))
    }
  }

  /** Streaming multi-touch attribution — the streaming dual of the
    * oracled batch [[graft.operators.Analytics.attribution]]
    * (q_attribution): per entity, touches accumulate; once the
    * watermark seals a conversion's timestamp its in-window touch set
    * is COMPLETE (a still-unsealed touch has ts > wm >= conv ts, so it
    * is not strictly-before), and the three models' credits emit FINAL
    * (Append mode) — one row per (conversion, model, channel), the
    * pre-aggregation grain whose (model, channel) roll-up equals the
    * batch operator's cells float-for-float (same value*cnt/n op
    * order; EventStreamSpec proves batch == stream).
    *
    * Out-of-order exactness rides the funnel-frontier discipline:
    * events buffer until the watermark seals them, then fold in
    * (ts, tie) order, so a conversion reads its touch window only
    * after every earlier-ts touch folded — same-instant touches are
    * excluded exactly as the batch `[cts-L, cts)` window does.
    *
    * State per key: the sealed touches within the lookback of the
    * watermark — a touch at or below wm - lookback can never serve a
    * future sealed conversion (its ts would need to exceed wm), so the
    * buffer prunes every batch — plus the watermark-bounded pending
    * buffer. Event-time timeouts drain quiet keys.
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column),
    * `tie` long, `is_conv` boolean, `channel` string (touches),
    * `value` double (conversions).
    */
  def attributionStream(
      events: DataFrame,
      lookbackMs: Long,
      watermark: String = "10 minutes"): Dataset[AttrCredit] = {
    require(lookbackMs > 0, "attributionStream: lookbackMs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"), col("tie").cast("long"),
        col("is_conv").cast("boolean"),
        coalesce(col("channel"), lit("")).cast("string"),
        coalesce(col("value"), lit(0.0)).cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Boolean, String, Double)]
    typed.groupByKey(_._1).flatMapGroupsWithState[AttrState, AttrCredit](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long,
       rows: Iterator[(Long, java.sql.Timestamp, Long, Boolean, String, Double)],
       state: GroupState[AttrState]) =>
        val prior = state.getOption.getOrElse(AttrState(Nil, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(r => AttrPending(r._2.getTime, r._3, r._4, r._5, r._6))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        var touches = prior.touches
        val out = scala.collection.mutable.ArrayBuffer.empty[AttrCredit]
        ripe.sortBy(p => (p.tsMs, p.tie)).foreach { p =>
          if (!p.isConv) touches = touches :+ p
          else {
            // fold order keeps `touches` (ts, tie)-sorted; the window
            // filter preserves it, so head/last are first/last touch
            val w = touches.filter(t =>
              t.tsMs >= p.tsMs - lookbackMs && t.tsMs < p.tsMs)
            if (w.nonEmpty) {
              val n = w.size.toLong
              out += AttrCredit(key, p.tie, "first_touch", w.head.channel,
                p.value, n)
              out += AttrCredit(key, p.tie, "last_touch", w.last.channel,
                p.value, n)
              w.groupBy(_.channel).toSeq.sortBy(_._1).foreach { case (ch, g) =>
                out += AttrCredit(key, p.tie, "linear", ch,
                  p.value * g.size / n, n)
              }
            }
          }
        }
        touches = touches.filter(_.tsMs > wm - lookbackMs)
        if (touches.isEmpty && hold.isEmpty) state.remove()
        else {
          state.update(AttrState(touches, hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming exact keep-first deduplication in EVENT order — per key (a content hash upstream), emit
    * EXACTLY ONE row, the canonical first by `(ts, tie)` EVENT order —
    * not arrival order, so stream == batch row for row even when the
    * first row arrives late. The candidate is sealed once the watermark
    * strictly passes its timestamp (any still-admissible arrival then
    * has `ts >= wm > best.ts` and cannot beat it); after emission the
    * state shrinks to a 4-field emitted marker that suppresses every
    * later duplicate.
    *
    * State cost: one small record per DISTINCT key, forever — the
    * irreducible price of exact global dedup (matching the batch
    * semantics; `dropDuplicatesWithinWatermark` trades that for
    * within-window-only suppression). At 100 TB the same operator runs
    * with the key space sharded across executors by the groupByKey
    * exchange, and RocksDB state backing holds the distinct-key set.
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column),
    * `tie` long, `value` double.
    */
  def dedupFirstStream(
      events: DataFrame,
      watermark: String = "10 minutes"): Dataset[DedupRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1).flatMapGroupsWithState[DedupState, DedupRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
       state: GroupState[DedupState]) =>
        val prior = state.getOption
        if (prior.exists(_.emitted)) {
          // canonical row already out: everything arriving is a duplicate
          Iterator.empty
        } else {
          val wm = state.getCurrentWatermarkMs()
          val best = rows.foldLeft(prior) { (acc, r) =>
            val cand = DedupState(emitted = false, r._2.getTime, r._3, r._4)
            acc match {
              case Some(b) if b.bestTs < cand.bestTs
                || (b.bestTs == cand.bestTs && b.bestTie <= cand.bestTie) => acc
              case _ => Some(cand)
            }
          }
          best match {
            case Some(b) if b.bestTs < wm =>
              state.update(b.copy(emitted = true))
              Iterator.single(DedupRow(key, b.bestTs, b.bestTie, b.bestValue))
            case Some(b) =>
              state.update(b)
              // EventTimeTimeout fires when wm > timestamp: exactly the
              // strict-seal condition
              state.setTimeoutTimestamp(math.max(b.bestTs, wm + 1))
              Iterator.empty
            case None => Iterator.empty
          }
        }
    }
  }

  /** Streaming new-vs-returning labels — the streaming dual of
    * q_new_vs_returning's per-(key, period-bucket) tagging: each
    * distinct (key, bucket) emits EXACTLY ONCE, `is_new` iff the bucket
    * is the key's earliest ever. Sealed-order exactness: a bucket seals
    * only when the watermark passes its START — by then every event
    * with an earlier timestamp has either arrived or been dropped as
    * late, so "no smaller bucket exists for this key" is a fact, not a
    * race, and the label equals the batch rule
    * (`bucket == min(bucket) over key`) on all watermark-admitted data.
    * Buckets seal in bucket order, so an already-emitted label can
    * never be invalidated by later arrivals (anything that could lower
    * the min is below the watermark and dropped before reaching the
    * state function).
    *
    * State per key: min bucket + pending buckets + sealed buckets —
    * grows with the key's distinct ACTIVE buckets, not its event count
    * (a real deployment prunes sealedBuckets below its retention
    * horizon; dropped-late re-arrivals are the only thing the set
    * guards against).
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column).
    */
  def newVsReturningStream(
      events: DataFrame,
      periodMs: Long = 604800000L,
      watermark: String = "10 minutes"): Dataset[NewVsRow] = {
    require(periodMs > 0, "newVsReturningStream: periodMs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1).flatMapGroupsWithState[NewVsState, NewVsRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp)],
       state: GroupState[NewVsState]) =>
        val prior = state.getOption
          .getOrElse(NewVsState(Long.MaxValue, Seq.empty, Seq.empty))
        val known = prior.pending.toSet ++ prior.sealedBuckets.toSet
        val fresh = rows.map(r => Math.floorDiv(r._2.getTime, periodMs))
          .toSet.diff(known)
        val minSeen = (prior.minBucket +: fresh.toSeq).min
        val wm = state.getCurrentWatermarkMs()
        val (ripe, still) = (prior.pending ++ fresh).sorted
          .partition(b => b * periodMs <= wm)
        state.update(
          NewVsState(minSeen, still, prior.sealedBuckets ++ ripe))
        if (still.nonEmpty)
          state.setTimeoutTimestamp(math.max(still.head * periodMs, wm + 1))
        ripe.map(b => NewVsRow(key, b, b == minSeen)).iterator
    }
  }

  /** Streaming time-weighted average — the streaming dual of the
    * oracled batch [[graft.operators.Resample.timeWeightedAvg]]
    * (q_twa): per key, each sealed observation emits the RUNNING
    * zero-order-hold mean over the history so far (`sum(v_i * hold_i) /
    * span`; a single-sample or zero-span prefix reports the last value,
    * exactly the batch rule). Sealed-order exactness rides the
    * [[funnelStream]] discipline — events buffer until the watermark
    * passes their timestamp, then fold in `(ts, tie)` order, so the
    * hold times are computed against the true predecessor even under
    * out-of-order arrival. State per key: four numbers (the committed
    * integral) plus the watermark-bounded pending buffer.
    *
    * Telescoping makes stream == batch on every prefix: the batch form
    * weighs each sample by its `lead` hold (the final sample holds 0),
    * which is exactly this fold's `wsum` after the final seal —
    * EventStreamSpec compares the latest row per key against the batch
    * operator bit-for-bit (same 6dp HALF_UP rounding).
    *
    * Input columns: `key` long, `ts` timestamp (the watermark column),
    * `tie` long, `value` double.
    */
  def twaStream(
      events: DataFrame,
      watermark: String = "10 minutes"): Dataset[TwaRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
    typed.groupByKey(_._1).flatMapGroupsWithState[TwaState, TwaRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
       state: GroupState[TwaState]) =>
        val prior = state.getOption.getOrElse(
          TwaState(started = false, 0L, 0.0, 0L, 0.0, 0L, Nil))
        val wm = state.getCurrentWatermarkMs()
        val pending = prior.pending ++
          rows.map(r => EwmaPending(r._2.getTime, r._3, r._4))
        val (ripe, hold) = pending.partition(_.tsMs <= wm)
        var st = prior
        val out = ripe.sortBy(p => (p.tsMs, p.tie)).map { p =>
          st =
            if (!st.started)
              TwaState(started = true, p.tsMs, p.x, p.tsMs, 0.0, 1L, Nil)
            else
              TwaState(started = true, p.tsMs, p.x, st.minTs,
                st.wsum + (p.tsMs - st.lastTs) * st.lastV, st.n + 1, Nil)
          val span = st.lastTs - st.minTs
          val twa = if (span == 0) st.lastV else st.wsum / span
          TwaRow(key, p.tsMs, st.n, span,
            BigDecimal(twa).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        if (!st.started && hold.isEmpty) state.remove()
        else {
          state.update(st.copy(pending = hold))
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.max(hold.map(_.tsMs).min, wm + 1))
        }
        out.iterator
    }
  }

  /** Streaming resample with gap-fill — the streaming dual of the
    * oracled batch `q_resample` ([[graft.operators.Resample]]): per key,
    * one row per fixed `stepMs` bucket from the key's first observation,
    * emitted CLOSED once the watermark passes the bucket end; buckets
    * nobody observed emit with zero counts and the last value carried
    * forward, exactly like the batch grid.
    *
    * State per key (`flatMapGroupsWithState`, EventTimeTimeout) is
    * BOUNDED: the forward-fill carry plus the buckets still inside the
    * watermark delay — gap runs are emitted, never stored, and a bucket
    * leaves the state the moment it closes. The per-invocation emission
    * List is bounded by the batch operator's `maxBuckets` gap guard: a
    * run of that many consecutive gap-fill rows raises loudly instead
    * of building a multi-million-row emission in one trigger. Determinism matches the
    * batch operator observation for observation: in-bucket last by
    * (ts, tie), sums accumulated as per-row HALF_UP cents (the
    * decimal(18,2) ingest cast).
    *
    * Trailing buckets past the final watermark stay unemitted (streams
    * have no end) — the [[sessionizeStream]] caveat; EventStreamSpec
    * flushes them with sentinel events when comparing against the batch
    * plan.
    *
    * Input columns: `key` long, `ts` timestamp, `tie` long, `value`
    * double.
    */
  def resampleStream(
      events: DataFrame,
      stepMs: Long,
      watermark: String = "10 minutes",
      maxBuckets: Long = 1 << 22): Dataset[ResampleRow] = {
    require(stepMs > 0, "resampleStream: stepMs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]

    def cents(v: Double): Long =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .underlying.unscaledValue.longValue

    typed.groupByKey(_._1).flatMapGroupsWithState[OpenBuckets, ResampleRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
       state: GroupState[OpenBuckets]) =>
        val prior = state.getOption.getOrElse(
          OpenBuckets(Long.MinValue, hasCarry = false, 0.0, Map.empty))
        // fold this micro-batch's rows into the open buckets
        var open = prior.open
        rows.foreach { case (_, ts, tie, v) =>
          val t = ts.getTime
          val b = math.floorDiv(t, stepMs)
          val p = open.get(b) match {
            case Some(p0) =>
              val takes = t > p0.lastTs || (t == p0.lastTs && tie > p0.lastTie)
              BucketPartial(p0.n + 1, p0.sumCents + cents(v),
                if (takes) t else p0.lastTs,
                if (takes) tie else p0.lastTie,
                if (takes) v else p0.lastVal)
            case None => BucketPartial(1L, cents(v), t, tie, v)
          }
          open = open.updated(b, p)
        }
        // the grid starts at the key's first observed bucket
        val first = if (prior.lastEmitted != Long.MinValue) prior.lastEmitted
          else if (open.nonEmpty) open.keys.min - 1 else Long.MinValue
        // a bucket b is closed once the watermark reaches (b+1)*step;
        // gaps only emit up to the last KNOWN bucket (the batch grid
        // ends at the last observation)
        val wm = state.getCurrentWatermarkMs()
        val completeUpTo = math.floorDiv(wm, stepMs) - 1
        val emitUpTo =
          if (open.isEmpty) Long.MinValue
          else math.min(completeUpTo, open.keys.max)
        var out = List.empty[ResampleRow]
        var carry = (prior.hasCarry, prior.carryVal)
        var last = first
        if (first != Long.MinValue && emitUpTo != Long.MinValue) {
          var g = first + 1
          // the batch operator's gap guard, measured where the memory
          // actually lives: consecutive gap-fill rows built inside THIS
          // group invocation (a long dark period seals in one watermark
          // jump, so the run and the gap coincide in the blowup case)
          var fill = 0L
          while (g <= emitUpTo) {
            open.get(g) match {
              case Some(p) =>
                out ::= ResampleRow(key, g * stepMs, p.n, p.sumCents / 100.0, p.lastVal)
                carry = (true, p.lastVal)
                fill = 0L
                open -= g
              case None if carry._1 =>
                fill += 1
                if (maxBuckets > 0 && fill >= maxBuckets)
                  throw new IllegalStateException(
                    s"resampleStream: key $key gap spans >= $maxBuckets " +
                      s"buckets of $stepMs ms after bucket ${g - fill} — " +
                      "widen stepMs or bound the time range")
                out ::= ResampleRow(key, g * stepMs, 0L, 0.0, carry._2)
              case None => // before the first observation: nothing
            }
            last = g
            g += 1
          }
        }
        val next = OpenBuckets(last, carry._1, carry._2, open)
        if (open.isEmpty && !next.hasCarry) state.remove()
        else {
          state.update(next)
          if (open.nonEmpty)
            // wake when the earliest pending bucket closes
            state.setTimeoutTimestamp(
              math.max((open.keys.min + 1) * stepMs, wm + 1))
          // carry-only state sets no timeout: the grid is fully emitted
          // up to the last observation, and only a future event (which
          // wakes the group by itself) can extend it
        }
        out.reverse.iterator
    }
  }

  /** Streaming LINEAR interpolation resample — the streaming dual of the
    * oracled batch [[graft.operators.Resample.resampleInterpolate]]
    * (q_interpolate), closing the resample family's last batch-only
    * form (forward fill has [[resampleStream]]). Per key, one row per
    * fixed `stepMs` bucket: anchors (observed buckets) emit their exact
    * in-bucket last-by-(ts, tie) value; gap rows blend
    * `prev + (next - prev) * f` — which means a gap row can only emit
    * once its NEXT anchor is sealed, so emission walks sealed anchors
    * in order and flushes each anchor's preceding gap run with it. The
    * blend uses the identical operation order as the batch operator, so
    * sealed emissions are bit-equal to the batch grid (spec-proved).
    *
    * State per key is BOUNDED: the one previous anchor (all the history
    * interpolation needs) + the buckets still inside the watermark
    * delay. Emission per invocation is bounded too: a gap spanning
    * `maxBuckets` buckets raises loudly BEFORE its run is built (the
    * batch twin's guard — a months-dark key at a small `stepMs` would
    * otherwise materialize a multi-million-row List in one trigger).
    * Trailing buckets past the final watermark stay unemitted
    * (streams have no end) — the [[resampleStream]] caveat.
    *
    * Input columns: `key` long, `ts` timestamp, `tie` long, `value`
    * double.
    */
  def interpolateStream(
      events: DataFrame,
      stepMs: Long,
      watermark: String = "10 minutes",
      maxBuckets: Long = 1 << 22): Dataset[InterpRow] = {
    require(stepMs > 0, "interpolateStream: stepMs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("key").cast("long"), col("ts"),
        col("tie").cast("long"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]

    typed.groupByKey(_._1).flatMapGroupsWithState[InterpState, InterpRow](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
       state: GroupState[InterpState]) =>
        val prior = state.getOption.getOrElse(
          InterpState(hasPrev = false, 0L, 0.0, Map.empty))
        var open = prior.open
        rows.foreach { case (_, ts, tie, v) =>
          val t = ts.getTime
          val b = math.floorDiv(t, stepMs)
          val p = open.get(b) match {
            case Some(p0) =>
              val takes = t > p0.lastTs || (t == p0.lastTs && tie > p0.lastTie)
              BucketPartial(p0.n + 1, 0L,
                if (takes) t else p0.lastTs,
                if (takes) tie else p0.lastTie,
                if (takes) v else p0.lastVal)
            case None => BucketPartial(1L, 0L, t, tie, v)
          }
          open = open.updated(b, p)
        }
        // an anchor is sealed once the watermark passes its bucket end;
        // sealed anchors emit in order, each flushing the gap run since
        // the previous anchor with the linear blend
        val wm = state.getCurrentWatermarkMs()
        val completeUpTo = math.floorDiv(wm, stepMs) - 1
        var prev = (prior.hasPrev, prior.prevBucket, prior.prevVal)
        var out = List.empty[InterpRow]
        open.keys.filter(_ <= completeUpTo).toSeq.sorted.foreach { b =>
          val p = open(b)
          if (prev._1) {
            // the batch twin's gap guard (Resample.resampleInterpolate):
            // a sealed anchor after a long dark period would otherwise
            // materialize the whole gap run as one in-memory emission
            // inside this group invocation — raise before building it.
            // Counted as FILL ROWS (b - prev - 1), the same boundary as
            // the batch twin and resampleStream: a gap of exactly
            // maxBuckets - 1 fill rows succeeds on both, so the
            // stream/batch parity contract holds at the cap itself
            if (maxBuckets > 0 && b - prev._2 - 1 >= maxBuckets)
              throw new IllegalStateException(
                s"interpolateStream: key $key gap spans >= $maxBuckets " +
                  s"buckets of $stepMs ms after bucket ${prev._2} — widen " +
                  "stepMs or bound the time range")
            var g = prev._2 + 1
            while (g < b) {
              // the batch operator's exact parenthesization:
              // prev + (next - prev) * ((g - a) / (b - a))
              val frac = (g - prev._2).toDouble / (b - prev._2).toDouble
              out ::= InterpRow(key, g * stepMs, 0L,
                prev._3 + (p.lastVal - prev._3) * frac)
              g += 1
            }
          }
          out ::= InterpRow(key, b * stepMs, p.n, p.lastVal)
          prev = (true, b, p.lastVal)
          open -= b
        }
        state.update(InterpState(prev._1, prev._2, prev._3, open))
        if (open.nonEmpty)
          state.setTimeoutTimestamp(
            math.max((open.keys.min + 1) * stepMs, wm + 1))
        // anchor-only state keeps no timeout: the grid is complete up to
        // the last sealed anchor; only a future event extends it
        out.reverse.iterator
    }
  }

  /** Streaming maintenance of a persisted aggregate view
    * ([[graft.operators.AggView]]): each micro-batch folds into the view
    * as one O(delta) partial-agg append, exactly-once under the numeric
    * batch tag (a checkpoint replay re-offers the same batchId and the
    * fence drops it), with the shared auto-fold policy keeping the root
    * count flat. The streaming dual of the reference's
    * WAL -> memtable -> L0 pipeline, applied to GROUP BY state instead
    * of KV pairs.
    */
  /** Streaming refresh of an incremental JOIN view from a FACT stream:
    * each micro-batch folds in as one O(Δ) append, exactly-once under
    * the numeric batch tag (checkpoint replays converge).
    */
  def ingestFactsToJoinView(
      stream: DataFrame,
      viewDir: String,
      checkpoint: String,
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.JoinView.appendFactsToJoinView(
          viewDir, batch, batchTag = Some(batchId.toString))
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.operators.JoinView.maintainJoinView(batch.sparkSession, viewDir)
        ()
      }
      .start()

  /** Streaming DIMENSION CDC into an incremental JOIN view: each
    * micro-batch of `(op, keys..., payload...)` rows applies as ONE
    * atomic generation + bucket repair — sets upsert, dels tombstone,
    * and a mixed batch stays a single exactly-once unit (two tagged
    * calls would fence each other out; see applyDimCdcToJoinView).
    */
  def ingestDimCdcToJoinView(
      stream: DataFrame,
      viewDir: String,
      checkpoint: String,
      opCol: String = "op",
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.JoinView.applyDimCdcToJoinView(
          viewDir,
          batch.withColumn("__delete", col(opCol) === "del").drop(opCol),
          batchTag = Some(batchId.toString))
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.operators.JoinView.maintainJoinView(batch.sparkSession, viewDir)
        ()
      }
      .start()

  def ingestToAggView(
      stream: DataFrame,
      viewDir: String,
      checkpoint: String,
      compactEvery: Int = 0): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.AggView.appendToAggView(
          viewDir, batch, batchTag = Some(batchId.toString))
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.operators.AggView.maintainAggView(batch.sparkSession, viewDir)
        ()
      }
      .start()
}
