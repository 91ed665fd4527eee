package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Structured Streaming surface (SURVEY.md §2.8 streaming; the reference's
  * implied-but-unwritten incremental path — content hashes "for change
  * detection" at indexing_agent.py:28-31 and an unused watchdog dependency).
  *
  * The windowed aggregation is the canonical streaming shape: file source →
  * event-time tumbling window → stateful agg. Run here against the static
  * events parquet through the memory sink so the result is a deterministic
  * batch-comparable DataFrame (the oracle runs the batch-equivalent SQL).
  * On a real cluster the same plan runs continuously with a watermark.
  */
object StreamOps {

  private val counter = new AtomicInteger(0)

  /** Tumbling 6-hour count per event type, executed as a streaming query. */
  def streamedEventsWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = Tables.eventsRaw(spark, sfDir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000")))
    val agg = stream
      .groupBy(window(col("ts_t"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val qname = s"graft_stream_win_${counter.incrementAndGet()}"
    val q = agg.writeStream.outputMode("complete").format("memory").queryName(qname).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(qname)
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"))
      .orderBy("bucket", "event_type")
  }

  def duckStreamedEventsWindow: String =
    s"""SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       |       event_type, count(*)::BIGINT AS n
       |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin
}
