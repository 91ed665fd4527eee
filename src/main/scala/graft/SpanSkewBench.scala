package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured crossover for [[graft.operators.Dedup.spanCoverage]]'s
  * `skewSafe` fallback (SCALE.md): times the window form vs the
  * groupBy+semi-join form on (a) the real sf documents (Zipfian span
  * frequencies — the window form's home turf) and (b) a synthetic
  * head-span corpus where one boilerplate span appears in 50% of docs —
  * the documented single-window-task hazard the fallback exists for.
  * This is the offline pass a deployment runs on a corpus sample to pick
  * the variant before a full run.
  *
  * Usage: runMain graft.SpanSkewBench <sfDir> [headDocs]
  */
object SpanSkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val headDocs = args.lift(1).map(_.toInt).getOrElse(20000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!sys.env.get("SPARK_GRAFT_REWRITE").contains("0"))
      graft.plans.TopKPerKey.enableRewrite(spark)
    import spark.implicits._

    // synthetic head-span corpus: one 5-token boilerplate span in 50% of
    // docs plus per-doc-unique filler — all of the span's occurrence mass
    // lands on ONE window task under the default form
    val boiler = "all rights reserved contact the publisher"
    val skewed = spark.range(1, headDocs + 1).toDF("doc_id")
      .select(col("doc_id"), concat(
        when(col("doc_id") % 2 === 0, lit(boiler + " ")).otherwise(lit("")),
        concat_ws(" ", (0 until 40).map(j =>
          concat(lit("u"), col("doc_id"), lit(s"w$j"))): _*)).as("text"))
      .localCheckpoint() // materialize: time the operator, not the generator

    val corpora = Seq(
      ("documents(" + sfDir + ")", Tables.documents(spark, sfDir)),
      (s"head-span synthetic ($headDocs docs, 50% boilerplate)", skewed))
    for ((label, corpus) <- corpora; skewSafe <- Seq(false, true); rep <- 1 to 4) {
      val t0 = System.nanoTime()
      val c = graft.operators.Dedup.spanCoverage(corpus, 5, skewSafe)
        .queryExecution.toRdd.count()
      println(f"[spanskew] $label skewSafe=$skewSafe rep$rep: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
