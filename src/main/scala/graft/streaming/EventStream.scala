package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

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
}
