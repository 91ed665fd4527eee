package graft

import org.apache.spark.sql.SparkSession

/** Driver-side planning-cost measurement (round-13): for each query, the
  * time to build the executed plan (analysis + optimization + physical
  * planning, no job run) vs one full materialization. Queries whose plans
  * are literal-expanded (wide aggregates, unrolled band tables) can spend
  * a large fraction of every Bench rep inside Catalyst on the driver —
  * that time is plan-shape cost, reducible by shrinking the tree. */
object PlanTimeProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!sys.env.get("SPARK_GRAFT_REWRITE").contains("0"))
      graft.plans.TopKPerKey.enableRewrite(spark)
    names.foreach { n =>
      try {
        // warm rep (codegen compile, artifact ensure)
        SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.executedPlan // forces analysis+optimize+plan
        val tPlan = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val tTotal = tPlan + (System.nanoTime() - t1) / 1e9
        spark.sharedState.cacheManager.clearCache()
        println(f"[plantime] $n plan=$tPlan%.2f total=$tTotal%.2f frac=${tPlan / tTotal}%.2f")
      } catch { case e: Throwable =>
        println(s"[plantime] $n FAILED: ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
