package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-budget ngram dedup at explicit budgets — the round-10
  * verdict's task #1 demonstration harness. The budget bounds CANDIDATE
  * GENERATION at O(budget·n) by construction (round-10's answer to the
  * percentile caps' structural 9e9-candidate failure on saturated
  * vocabularies), and this round's sf10 run adjudicated the rest of the
  * pipeline: the exact-Jaccard verify carries ~2·mean_shingles join rows
  * PER CANDIDATE (~92 at the sf10 corpus' 46 shingles/doc), so
  * end-to-end scratch is budget·n·mean_sh rows — LINEAR in both knobs,
  * and sized to the DEPLOYMENT: budget 256 ≈ 23.5k verify rows/doc is
  * routine for a 1000-executor cluster (per-node work divides by the
  * cluster) but exceeds one 77 GB-scratch node at n=500k, where
  * budget 16 (≈1.5k verify rows/doc, 5.6e8 total) completes. That knob
  * is the difference from the percentile caps, whose volume was O(n²)
  * at ANY setting.
  *
  * Usage: runMain graft.NgramBudgetProf <sfDir> [budgets=16] [threshold=0.5]
  */
object NgramBudgetProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val budgets = args.lift(1).getOrElse("16").split(",").map(_.toInt).toSeq
    val threshold = args.lift(2).getOrElse("0.5").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    for (b <- budgets) {
      val t0 = System.nanoTime()
      val (out, handles) = graft.operators.Dedup
        .ngramJaccardBudgetWith(docs, threshold, candidateBudget = b)
      val agg = out.agg(count(lit(1)).as("pairs"),
        coalesce(round(avg("jaccard"), 4), lit(0.0)).as("mean_jac")).head()
      println(f"[ngrambudget] $sfDir budget=$b pairs=${agg.getLong(0)} " +
        f"mean_jac=${agg.getDouble(1)} wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
      handles.foreach(_.unpersist())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
