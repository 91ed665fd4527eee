package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the adaptive-capped ngram pipeline (round-13
  * optimization measurement): where do q_dedup_ngram_adaptive's ~13 s at
  * sf0.1 go — shingle caches, cap derivation, candidate join, or verify? */
object NgramPhaseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val documents = Tables.documents(spark, sfDir)
      // mirror dfShinglesWith(skewSafe = true)
      val rows = graft.functions.TextFns.shingleRowsOf(documents, 3)
        .distinct().cache()
      t("rows cache materialize") { rows.count() }
      val dfr = rows.groupBy("s").agg(count(lit(1)).as("df"))
      val joined = rows.join(dfr.hint("merge"), "s").cache()
      t("joined cache materialize") { joined.count() }
      // mirror ngramJaccardCappedAdaptiveWith cap derivation
      val hist = joined.select(col("s"), col("df")).distinct()
        .groupBy("df").agg(count(lit(1)).as("n"))
      val wH = graft.functions.BoundedWindow.boundedGlobal(col("df"), asc("df"))
      val cum = hist.withColumn("cum", sum("n").over(wH))
      val tot = hist.agg(sum("n").as("t"))
      val cap = cum.crossJoin(broadcast(tot))
        .filter(col("cum") * 100 >= lit(99) * col("t"))
        .agg(min("df").as("cap"))
      t("cap derivation (head)") { println("  cap=" + cap.head()) }
      // mirror cappedInterWith over the derived cap
      val shDf = joined.crossJoin(broadcast(cap))
      val rare = shDf.filter(col("df") <= col("cap"))
      val freq = shDf.filter(col("df") > col("cap"))
      val iRare = rare.select(col("doc_id").as("d1"), col("s")).hint("merge")
        .join(rare.select(col("doc_id").as("d2"), col("s")).hint("merge"), "s")
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("i_r"))
        .cache()
      t("iRare self-join + cache") { iRare.count() }
      val iFreq = iRare.select(col("d1"), col("d2"))
        .join(freq.select(col("doc_id").as("d1"), col("s")).hint("merge"), "d1")
        .join(freq.select(col("doc_id").as("d2"), col("s")).hint("merge"), Seq("d2", "s"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("i_f"))
      t("iFreq alone (noop)") {
        iFreq.write.format("noop").mode("overwrite").save()
      }
      if (rep == 1) {
        println("  iRare pairs=" + iRare.count() +
          " rareRows=" + rare.count() + " freqRows=" + freq.count())
        println(iFreq.queryExecution.executedPlan.toString.take(4000))
      }
      val inter = iRare.join(iFreq, Seq("d1", "d2"), "left")
        .select(col("d1"), col("d2"),
          (col("i_r") + coalesce(col("i_f"), lit(0L))).as("i"))
      val sizes = shDf.groupBy("doc_id").agg(count(lit(1)).as("n"))
      t("sizes alone (noop)") {
        sizes.write.format("noop").mode("overwrite").save()
      }
      val out = inter
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")).hint("merge"), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")).hint("merge"), "d2")
        .withColumn("jaccard", col("i").cast("double") / (col("n1") + col("n2") - col("i")))
        .filter(col("jaccard") >= 0.5)
        .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(asc("d1"), asc("d2"))
      t("verify tail (toRdd.count)") { out.queryExecution.toRdd.count() }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
