package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-bucket occupancy decomposition for the SimHash dedup family — the
  * [[NgramProf]] pattern applied to signature banding. The band self-join
  * emits exactly Σ_buckets c·(c−1)/2 candidate rows (before the DISTINCT
  * and the hamming cut), a single aggregate over the per-(band, bkey)
  * occupancy histogram — computable without paying for the join. Run it
  * per geometry to compare the 64-bit (4×16 fixed) and width-parameterized
  * ([[graft.operators.Dedup.simhashWide]], bits in-plan) entries' candidate
  * volumes at any scale: the signature agg is linear either way, so the
  * candidate count IS the scale difference. This is the offline sizing
  * pass a deployment runs before choosing a width/occupancy config.
  *
  * Usage: runMain graft.SimhashProf <sfDir> [width,width,...]
  * (width 64 = the fixed 4×16 entry's geometry; others derive bits via the
  * simhashWide clamp — reported alongside.)
  */
object SimhashProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val widths = args.lift(1).getOrElse("64,128").split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup

    val docs = Tables.documents(spark, sfDir).cache()
    val n = docs.count()
    println(s"[simhashprof] $sfDir corpus n=$n")

    for (w <- widths) {
      val tSig = System.nanoTime()
      val sig = Dedup.simhashSignatures(docs, w).cache()
      sig.count()
      println(f"[simhashprof] width=$w signature agg " +
        f"${(System.nanoTime() - tSig) / 1e9}%.1f s")
      // geometry: 64 = the fixed entry (4×16); wider = simhashWide's
      // in-plan clamp(16, 32, floor(log2(n/64)))  — plus, for wide
      // signatures, the HEADROOM geometries (bits past the clamp's
      // current choice) the 64-bit signature structurally cannot reach
      val clampBits =
        if (w == 64) 16
        else math.max(16, math.min(32,
          64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / 64)) - 1))
      val bitChoices =
        if (w == 64) Seq(16)
        else (Seq(clampBits) ++ Seq(20, 24, 32).filter(_ > clampBits)).distinct
      for (bits <- bitChoices) {
        val t0 = System.nanoTime()
        val nBands = w / bits
        val occ = sig.select(col("simhash"),
            explode(sequence(lit(0), lit(nBands - 1))).as("band"))
          .select(col("band"), expr(s"substring(simhash, band * $bits + 1, $bits)").as("bkey"))
          .groupBy("band", "bkey").agg(count(lit(1)).as("c"))
          .cache()
        val agg = occ.agg(
          sum(expr("c * (c - 1) DIV 2")).as("cand"),
          max("c").as("maxc"),
          count(lit(1)).as("buckets")).head()
        val top = occ.orderBy(desc("c")).limit(3).collect()
          .map(r => s"${r.getLong(2)}").mkString(",")
        val tag = if (bits == clampBits || w == 64) "clamped" else "headroom"
        println(f"[simhashprof] width=$w bits=$bits bands=$nBands ($tag) " +
          f"buckets=${agg.getLong(2)} max_occ=${agg.getLong(1)} top3=[$top] " +
          f"predicted_candidates=${agg.getLong(0)} " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
        occ.unpersist()
      }
      sig.unpersist()
    }
    spark.stop()
  }
}
