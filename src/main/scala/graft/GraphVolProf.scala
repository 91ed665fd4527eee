package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NN-descent candidate-volume profiler — the round-10 verdict's task #2
  * instrumentation: the graph build's init stage (banded sign-LSH
  * all-pairs within buckets) is the newest quadratic-risk surface (band
  * occupancy × neighbor-of-neighbor fan-out), and this prints, per
  * scale dir, the numbers that adjudicate it:
  *
  *   - n, in-plan band bits, band-bucket occupancy (max, p99, mean) and
  *     the exact init-candidate volume Σ c·(c−1) over the (t, bkey)
  *     histogram (the [[graft.operators.Dedup.simhashWide]] occupancy
  *     discipline applied to the graph init);
  *   - the MEASURED per-stage candidate counts from the build itself
  *     (knnGraph's prof sink): init after distinct, then each
  *     refinement round's neighbor-of-neighbor ∪ current volume, which
  *     the reverse-cap bounds at ~4k² per node;
  *   - edges and wall for the full build.
  *
  * Usage: runMain graft.GraphVolProf <sfDir> [k=16] [tables=4] [rounds=2]
  */
object GraphVolProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).getOrElse("16").toInt
    val tables = args.lift(2).getOrElse("4").toInt
    val rounds = args.lift(3).getOrElse("2").toInt
    val targetOcc = 16
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
    val n = e.count()
    val bits = math.max(2, math.min(graft.operators.NnDescent.Block,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / targetOcc)) - 1))
    // occupancy histogram of the init band buckets (narrow: signs only)
    val sg = e.select(col("vec_id"),
      graft.functions.VectorFns.signBucketAt(col("embedding"), 0,
        tables * graft.operators.NnDescent.Block).as("sgn"))
    val occ = sg.select(explode(expr(s"sequence(0, ${tables - 1})")).as("t"), col("sgn"))
      .select(col("t"), expr(
        s"substring(sgn, t * ${graft.operators.NnDescent.Block} + 1, $bits)").as("bkey"))
      .groupBy("t", "bkey").agg(count(lit(1)).as("c"))
    val stats = occ.agg(
      max("c").as("max_occ"),
      expr("percentile(c, 0.99)").as("p99_occ"),
      avg("c").as("mean_occ"),
      sum(expr("c * (c - 1)")).as("init_vol_directed")).head()
    println(f"[graphvol] $sfDir n=$n bits=$bits " +
      f"max_occ=${stats.getLong(0)} p99_occ=${stats.getDouble(1)}%.0f " +
      f"mean_occ=${stats.getDouble(2)}%.1f " +
      f"init_vol(Σc(c-1))=${stats.getLong(3)}")

    val sink = scala.collection.mutable.Buffer.empty[(String, Long)]
    val t0 = System.nanoTime()
    val g = graft.operators.NnDescent.knnGraph(e, k, tables, rounds,
      targetOcc, prof = sink)
    val edges = g.count()
    val wall = (System.nanoTime() - t0) / 1e9
    sink.foreach { case (stage, c) =>
      println(f"[graphvol] $sfDir stage=$stage%-7s cand=$c%12d (${c.toDouble / n}%.1f/node)")
    }
    println(f"[graphvol] $sfDir edges=$edges build_wall=$wall%.1f s " +
      f"(k=$k tables=$tables rounds=$rounds)")
    spark.stop()
  }
}
