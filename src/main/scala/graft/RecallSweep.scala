package graft

import org.apache.spark.sql.SparkSession

/** Parameter sweep for the ANN recall trade (SCALE.md): runs
  * [[graft.operators.KnnRecall.annRecall]] across (bits, nprobe) settings
  * and prints one line per (config, variant). This is the offline tuning
  * pass a deployment runs on a query sample before committing an index
  * layout — bits/nprobe trade probe cost (candidate fraction) for recall.
  *
  * Usage: runMain graft.RecallSweep <sfDir>
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // harness-default plans (round-4 review): the sweep informs layout
    // decisions, so it must run the same rewrite default as Verify/Bench
    if (!sys.env.get("SPARK_GRAFT_REWRITE").contains("0"))
      graft.plans.TopKPerKey.enableRewrite(spark)
    val index = Tables.embeddings(spark, sfDir)
    for (bits <- Seq(2, 4, 6); nprobe <- Seq(2, 4, 8)) {
      val rows = graft.operators.KnnRecall
        .annRecall(index, k = 10, nQueries = 16,
          bits = bits, numCentroids = 16, nprobe = nprobe)
        .collect()
      rows.foreach { r =>
        println(f"bits=$bits nprobe=$nprobe variant=${r.getString(0)}%-15s " +
          f"returned=${r.getLong(1)}%4d hits=${r.getLong(2)}%4d recall=${r.getDouble(4)}%.4f")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
