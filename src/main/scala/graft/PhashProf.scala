package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition + parameter sweep for
  * [[graft.operators.Multimodal.phashDedupOf]] one decade up (round-8
  * verdict #4: 192 s warm at sf1 vs 0.75 s at sf0.1 — which stage carries
  * it, and do corpus-relative knobs bound it?). For each (targetOccupancy,
  * lenBucket) config it reports: derived band bits, band-collision rows
  * (pre-distinct), distinct candidates, verified pairs, top band-bucket
  * occupancy, and 2 warm wall-clock reps of the full query. This is the
  * offline pass a deployment runs on a corpus sample to size the band
  * geometry before a full run (the SpanSkewBench pattern).
  *
  * Usage: runMain graft.PhashProf <sfDir> [occ,occ,...] [lb,lb,...]
  */
object PhashProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val occs = args.lift(1).getOrElse("64").split(",").map(_.toInt).toSeq
    val lbs = args.lift(2).getOrElse("64").split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Multimodal

    val docs = Tables.documents(spark, sfDir)
    var t0 = System.nanoTime()
    val sig = graft.sources.PhashLayout.ensure(spark, docs, sfDir)
    val nDocs = sig.count()
    println(f"[phashprof] sig artifact: $nDocs docs, build+count ${(System.nanoTime() - t0) / 1e9}%.1f s")

    for (occ <- occs; lb <- lbs) {
      // mirror the operator's internal band construction for the counts
      val nb = sig.agg(count(lit(1)).as("n"))
        .select(greatest(lit(8), least(lit(16),
          length(bin(expr(s"n DIV $occ"))) - 1)).cast("int").as("bits"))
      val bits = nb.head().getInt(0)
      val bands = sig.crossJoin(broadcast(nb))
        .select(col("doc_id"), expr(s"plen DIV $lb").as("lb0"),
          explode(expr("sequence(0, 64 DIV bits - 1)")).as("band"),
          col("bits"), col("phash"))
        .select(col("doc_id"), col("band"),
          expr("substring(phash, band * bits + 1, bits)").as("bkey"),
          explode(expr("array(lb0, lb0 + CAST(1 AS BIGINT))")).as("lbk"))
      val occStats = bands.groupBy("band", "bkey", "lbk").agg(count(lit(1)).as("c"))
        .agg(max("c").as("max"), sum(col("c") * col("c")).as("sumsq")).head()
      val collisions = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.lbk") === col("y.lbk") && col("x.doc_id") < col("y.doc_id"))
        .count()
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.lbk") === col("y.lbk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct().count()
      val walls = (1 to 2).map { _ =>
        val t = System.nanoTime()
        val n = Multimodal.phashDedupOf(sig, maxHamming = 13,
          targetOccupancy = occ, lenBucket = lb).count()
        (n, (System.nanoTime() - t) / 1e9)
      }
      println(f"[phashprof] occ=$occ%5d lb=$lb%5d bits=$bits%2d " +
        f"maxBucket=${occStats.getLong(0)}%7d collisions=$collisions%12d " +
        f"cand=$cand%12d pairs=${walls.head._1}%9d " +
        f"wall=${walls.map(w => f"${w._2}%.1f").mkString("/")} s")
    }
    spark.stop()
  }
}
