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
    // banded multi-table trade: recall AND mean per-query candidate
    // fraction (the pruning the recall is paid for) per (bandBits, tables)
    // with bandBits × tables ≤ dim(64). More tables → recall; wider bands
    // → pruning.
    {
      import org.apache.spark.sql.functions._
      import graft.functions.VectorFns.signBucketAt
      val nQ = 16
      val n = index.count()
      for ((b, l) <- Seq((8, 8), (6, 10), (4, 16), (3, 21), (2, 32))) {
        val rows = graft.operators.KnnRecall
          .annRecall(index, k = 10, nQueries = nQ,
            bits = 4, numCentroids = 16, nprobe = 4, bandBits = b, bandTables = l)
          .collect().filter(_.getString(0) == "lsh_banded")
        val ebands = index.select(col("vec_id"),
          posexplode(array((0 until l).map(t =>
            signBucketAt(col("embedding"), t * b, b)): _*)).as(Seq("bt", "bucket")))
        val qbands = index.filter(col("vec_id") < nQ)
          .select(col("vec_id").as("qid"),
            posexplode(array((0 until l).map(t =>
              signBucketAt(col("embedding"), t * b, b)): _*)).as(Seq("pt", "pbucket")))
        val nCand = ebands.join(broadcast(qbands),
            col("bt") === col("pt") && col("bucket") === col("pbucket") &&
              col("vec_id") =!= col("qid"))
          .select("qid", "vec_id").distinct().count()
        val frac = nCand.toDouble / (nQ.toDouble * (n - 1))
        rows.foreach { r =>
          println(f"bandBits=$b tables=$l%2d variant=lsh_banded    " +
            f"recall=${r.getDouble(4)}%.4f cand_frac=$frac%.4f")
        }
        spark.sharedState.cacheManager.clearCache()
      }
    }
    // quantized-variant trade: candidate-pool multiple vs recall for SQ8
    // (bandwidth-compressed) and PQ (8 B/vector) — the knob a deployment
    // turns is how many approximate-ranked candidates get the exact
    // re-rank, so the sweep is over candMultiple at the default geometry.
    for (cm <- Seq(1, 2, 4, 8)) {
      val rows = graft.operators.KnnRecall
        .annRecall(index, k = 10, nQueries = 16,
          bits = 4, numCentroids = 16, nprobe = 4, sqCandMultiple = cm)
        .collect().filter(r => Set("sq8", "pq", "pq_trained")(r.getString(0)))
      rows.foreach { r =>
        println(f"candMultiple=$cm variant=${r.getString(0)}%-10s " +
          f"returned=${r.getLong(1)}%4d hits=${r.getLong(2)}%4d recall=${r.getDouble(4)}%.4f")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
