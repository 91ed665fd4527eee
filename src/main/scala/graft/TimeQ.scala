package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!sys.env.get("SPARK_GRAFT_REWRITE").contains("0"))
      graft.plans.TopKPerKey.enableRewrite(spark)
    for (n <- args.drop(1); rep <- 1 to 6) {
      val t0 = System.nanoTime()
      // toRdd.count(): full final projection (plain count() lets Catalyst
      // prune projection columns); clearCache: each rep builds its own
      // caches, so reps after the first measure the plan, not the cache
      val c = SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[timeq] $n rep$rep: ${(System.nanoTime()-t0)/1e9}%.2f s ($c rows)")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
