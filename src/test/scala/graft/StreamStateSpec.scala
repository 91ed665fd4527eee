package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** mapGroupsWithState across micro-batch boundaries: the events table is
  * split by time into two parquet files and streamed one file per trigger,
  * so every user active in both halves REQUIRES the keyed state to carry
  * between batches. Totals must equal the batch groupBy regardless of the
  * batch split.
  */
class StreamStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("keyed state carries across micro-batches; totals equal batch agg") {
    import spark.implicits._
    val ev = Tables.eventsRaw(spark, TestSpark.sf).cache()
    val midTs = ev.stat.approxQuantile("ts", Array(0.5), 0.0)(0).toLong

    val dir = Files.createTempDirectory("graft_stream_state").toFile
    dir.deleteOnExit()
    ev.filter(col("ts") <= midTs).coalesce(1)
      .write.parquet(s"${dir.getAbsolutePath}/batch1.parquet")
    ev.filter(col("ts") > midTs).coalesce(1)
      .write.parquet(s"${dir.getAbsolutePath}/batch2.parquet")

    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.getAbsolutePath)
    val got = StreamOps.streamedUserTotalsOf(stream, "graft_stream_state_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val want = ev.filter(col("user_id") < 20)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        min(expr("ts div 1000")).as("first_us"),
        max(expr("ts div 1000")).as("last_us"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)

    // both halves are non-empty, so at least one user truly spanned batches
    val h1 = spark.read.parquet(s"${dir.getAbsolutePath}/batch1.parquet").count()
    val h2 = spark.read.parquet(s"${dir.getAbsolutePath}/batch2.parquet").count()
    assert(h1 > 0 && h2 > 0)
    ev.unpersist()
  }
}
