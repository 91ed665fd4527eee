package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for [[graft.operators.Dedup.ngramJaccardCappedAdaptive]]
  * two decades up (round-9 verdict #4: the sf10 run spilled past ~70 GB of
  * disk — is the blowup candidate VOLUME (structural: the derived cap admits
  * too much fan-out) or spill hygiene?).
  *
  * The key diagnostic is computed WITHOUT running the self-join: the
  * inverted-index join emits exactly Σ_{s: df≤cap} df·(df−1)/2 ordered
  * candidate rows, a single aggregate over the df histogram. Comparing that
  * prediction across keepPct configs (and against the corpus' shingle count)
  * says whether the candidate volume itself is the spill — before paying for
  * it. For each keepPct it reports: derived cap, rare/freq partition rows,
  * predicted candidate rows, then (if `run`) distinct surviving pairs and 2
  * warm wall reps of the full query. This is the offline pass a deployment
  * runs on a corpus sample to size keepPct before a full run (the
  * PhashProf pattern).
  *
  * Usage: runMain graft.NgramProf <sfDir> [keepPct,keepPct,...] [run=1]
  */
object NgramProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keeps = args.lift(1).getOrElse("99").split(",").map(_.toInt).toSeq
    val run = args.lift(2).forall(_ == "1")
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
    // the operator's own shingle relation (distinct (doc_id, s) rows)
    val rows = graft.functions.TextFns.shingleRowsOf(docs, 3).distinct().cache()
    val t0 = System.nanoTime()
    val hist = rows.groupBy("s").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n")).cache()
    val base = hist.agg(
      sum(col("n")).as("distinct_shingles"),
      sum(col("n") * col("df")).as("shingle_rows"),
      max(col("df")).as("max_df")).head()
    println(f"[ngramprof] corpus: ${base.getLong(1)} shingle rows, " +
      f"${base.getLong(0)} distinct shingles, max df ${base.getLong(2)}, " +
      f"hist ${(System.nanoTime() - t0) / 1e9}%.1f s")

    for (k <- keeps) {
      // in-plan cap derivation (mirror of ngramJaccardCappedAdaptive)
      val wH = graft.functions.BoundedWindow.boundedGlobal(col("df"), asc("df"))
      val cum = hist.withColumn("cum", sum("n").over(wH))
      val tot = hist.agg(sum("n").as("t"))
      val cap = cum.crossJoin(broadcast(tot))
        .filter(col("cum") * 100 >= lit(k) * col("t"))
        .agg(min("df").as("cap")).head().getLong(0)
      // predicted inverted-index join output: Σ_{df≤cap} n·df·(df−1)/2
      val pred = hist.agg(
        sum(when(col("df") <= cap, col("n") * col("df") * (col("df") - 1) / 2)
          .otherwise(lit(0L))).as("cand"),
        sum(when(col("df") <= cap, col("n") * col("df")).otherwise(lit(0L)))
          .as("rare_rows"),
        sum(when(col("df") > cap, col("n") * col("df")).otherwise(lit(0L)))
          .as("freq_rows")).head()
      println(f"[ngramprof] keepPct=$k cap=$cap rare=${pred.getAs[Number]("rare_rows").longValue()} " +
        f"freq=${pred.getAs[Number]("freq_rows").longValue()} " +
        f"predicted_candidates=${pred.getAs[Number]("cand").doubleValue()}%.3g")
      if (run) {
        for (rep <- 1 to 2) {
          val t1 = System.nanoTime()
          val (out, handles) = graft.operators.Dedup
            .ngramJaccardCappedAdaptiveWith(docs, 0.5, k)
          val n = out.count()
          println(f"[ngramprof] keepPct=$k rep$rep: $n pairs, " +
            f"${(System.nanoTime() - t1) / 1e9}%.1f s")
          handles.foreach(_.unpersist())
        }
      }
    }
    rows.unpersist(); hist.unpersist()
    spark.stop()
  }
}
