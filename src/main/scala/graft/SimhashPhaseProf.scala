package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of [[graft.operators.Dedup.simhashWide]] (round-13
  * optimization measurement): signature build vs ladder vs banding vs
  * verify. */
object SimhashPhaseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val docs = Tables.documents(spark, sfDir)
      val sig = Dedup.simhashSignatures(docs, 128).cache()
      t("sig(128) cache materialize") { sig.count() }
      val sig64 = Dedup.simhashSignatures(docs, 64).cache()
      t("sig(64) cache materialize") { sig64.count() }
      // full query for reference
      t("simhashWide end-to-end") {
        Dedup.simhashWide(docs, 0.5).queryExecution.toRdd.count()
      }
      spark.sharedState.cacheManager.clearCache()
      t("simhash64 end-to-end") {
        Dedup.simhash(docs, 0.5).queryExecution.toRdd.count()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
