package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured Streaming shape of the reference's incremental-ingest
  * semantics (SURVEY.md §2.9): the scraper's checkpoint/resume + seen-keys
  * dedup loop (scraper.py:543-621) maps to a file source with
  * checkpointing and watermarked streaming dedup; its per-keyword append
  * accumulation maps to windowed aggregation.
  *
  * At scale this is the ingest path: files land, micro-batches pick them
  * up (maxFilesPerTrigger bounds rework ≡ the reference's rate limiting),
  * state is bounded by the watermark (≡ the 200k seen_keys cap).
  */
object EventsStream {

  /** The events table schema with ts as LongType nanos (how the parquet
    * file presents under nanosAsLong) — declared, not inferred, as
    * readStream requires. */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over events parquet files: a directory, a glob, or
    * a single file (the file source needs a directory basePath, so a bare
    * file path is wrapped in a one-element glob character class). */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val hasGlob = path.exists("*?[{".contains(_))
    val src =
      if (!hasGlob && new java.io.File(path).isFile)
        path.dropRight(1) + s"[${path.last}]"
      else path
    spark.readStream
      .schema(eventsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  }

  /** D2/S8 — streaming incremental dedup across restarts: watermarked
    * dropDuplicatesWithinWatermark on the event key; state is bounded by
    * the watermark horizon (the scalable analogue of the reference's
    * 200k-cap seen_keys set). */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Windowed aggregation (1-hour tumbling) with watermark — the
    * streaming twin of StarQueries.qEventsHourly. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run a streaming query to completion over the files already in `dir`
    * (Trigger.AvailableNow — batch-finite, checkpointed), collecting to an
    * in-memory table. Returns the result.
    *
    * Output mode: Append for row streams; use Complete for aggregations
    * that must emit EVERY window at end-of-stream (in Append mode, windows
    * newer than the final watermark stay in state and never emit). */
  def runAvailableNow(
      spark: SparkSession, query: DataFrame, name: String,
      checkpoint: String, mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = query.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(300000)
    if (!finished) {
      q.stop()
      throw new IllegalStateException(
        s"streaming query $name did not finish within 300s — result would be partial")
    }
    spark.table(name)
  }
}
