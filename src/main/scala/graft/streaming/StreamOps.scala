package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference is fully batch
  * (SURVEY §2.8); the one order-insensitive aggregation that maps to a
  * stream is the co-occurrence count (A6) → watermarked windowed counts.
  * Provided both as a batch-window query (oracle-checkable) and a
  * readStream pipeline (smoke-tested with the memory sink).
  */
object StreamOps {

  /** Tumbling-window counts per event_type — batch form (same plan shape
    * Catalyst produces for the streaming variant). */
  def windowedCountsBatch(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events.groupBy(
        window(col("ts"), windowLen).getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        cast2(sum(col("value").cast("decimal(18,6)"))).as("sum_value"))

  private def cast2(c: org.apache.spark.sql.Column) = c.cast("double")

  /** Streaming variant: parquet source → watermark → windowed counts →
    * memory sink, driven synchronously (processAllAvailable) so tests are
    * deterministic. */
  def windowedCountsStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      queryName: String): Unit = {
    val events = spark.readStream.schema(schema).parquet(dir)
      // parquet micros read as TIMESTAMP_NTZ; event-time watermarks require
      // TIMESTAMP (session UTC ⇒ identical instants)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
