package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Graph-search knob sweep (the PhashProf pattern): recall@k and warm
  * wall per (beam, hops) over the stored k-NN graph — the measured basis
  * for the defaults (beam=8, hops=3). Usage:
  *   runMain graft.GraphProf [sfDir] [beams] [hopss] [nQueries]
  */
object GraphProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val beams = args.lift(1).getOrElse("4,8,16").split(",").map(_.toInt).toSeq
    val hopss = args.lift(2).getOrElse("1,2,3,4").split(",").map(_.toInt).toSeq
    val nQ = args.lift(3).getOrElse("16").toInt
    val gk = args.lift(4).getOrElse("8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.embeddings(spark, sfDir)
    var t0 = System.nanoTime()
    val g = graft.sources.GraphLayout.ensure(spark, e, sfDir, k = gk)
    println(f"[graphprof] graph artifact: ${g.count()} edges, " +
      f"build+count ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val queries = e.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    for (beam <- beams; hops <- hopss) {
      // warm rep: min of 2 runs, recall from the same report the gate uses
      var best = Double.MaxValue
      var recall = 0.0
      for (_ <- 1 to 2) {
        t0 = System.nanoTime()
        val row = graft.operators.NnDescent
          .graphRecall(e, g, queries, k = 10, beam = beam, hops = hops)
          .head()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        recall = row.getAs[Double]("recall")
        spark.sharedState.cacheManager.clearCache()
      }
      println(f"[graphprof] beam=$beam%2d hops=$hops recall@10=$recall%.4f warm=${best}%.2f s")
    }
    spark.stop()
  }
}
