package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver testdata (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read the
  * tables they need through these helpers so the scan is a plain parquet
  * relation Catalyst can push filters/column-pruning into.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** events with the FILE's own ts type — the driver has written this
    * table two ways across rounds: TIMESTAMP(NANOS) (reads as INT64 nanos
    * under `spark.sql.legacy.parquet.nanosAsLong`, which our builders set)
    * and plain timestamp[us] (reads as TIMESTAMP_NTZ). Streaming sources
    * need THIS schema to read the files; everything else goes through
    * [[eventsRaw]]'s normalized form. */
  def eventsFileSchema(spark: SparkSession, sfDir: String): org.apache.spark.sql.types.StructType =
    table(spark, sfDir, "events").schema

  /** Normalize `ts` to INT64 epoch NANOS whatever the file holds, so every
    * downstream `ts div 1000` (= epoch micros = DuckDB `epoch_us(ts)`)
    * keeps working across driver testdata regenerations. Timestamp files
    * convert via unix_micros at the session timezone, which every graft
    * builder pins to UTC — the same interpretation DuckDB's `epoch_us`
    * gives a naive timestamp. */
  def tsToNanos(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType => df
    case _ => df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
  }

  /** Events with `ts` as INT64 epoch nanos (the round-1..5 file contract,
    * now enforced by [[tsToNanos]] rather than assumed of the file). */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    tsToNanos(table(spark, sfDir, "events"))

  /** Events normalized for event-time work: `ts_us` exact epoch micros
    * (nanos floor-divided, matching DuckDB's epoch_us truncation) and
    * `ts_t` as a proper TimestampType column for time windows. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, sfDir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
}
