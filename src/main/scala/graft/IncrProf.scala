package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the round-9 incremental-dedup claim: probing the persisted
  * [[graft.sources.SignatureLayout]] must beat re-signing the corpus per
  * ingest batch, and the gap must WIDEN with corpus size (the probe does
  * O(batch + probe) work; the re-sign does O(corpus)). Times, per rep:
  *
  *   - probe: [[graft.operators.Dedup.minhashProbeIndexWith]] over the
  *     stored bands/shingles/sizes (corpus side = pure parquet reads);
  *   - resign: [[graft.operators.Dedup.minhashAgainstWith]] over the raw
  *     corpus text (the pre-round-9 upsert shape).
  *
  * Usage: runMain graft.IncrProf <sfDir> [reps] [batchMod]
  *
  * batchMod (default 10) sets the batch slice doc_id % batchMod == 7 —
  * mod 10 prices the "batch grows with the corpus" decade series; a
  * LARGER mod at a larger sf holds the ABSOLUTE batch size fixed and
  * isolates the corpus-side scaling term alone (round-10: mod 100 at
  * sf10 ≙ the same ~5k-doc batch as mod 10 at sf1).
  */
object IncrProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val batchMod = args.lift(2).map(_.toInt).getOrElse(10)
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
    import graft.sources.{PairsLayout, SignatureLayout}

    val threshold = 0.8
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % batchMod =!= 7)
    val batch = docs.filter(col("doc_id") % batchMod === 7)
    val dir = PairsLayout.dirFor(s"$sfDir#incrprof$batchMod", threshold)

    var t0 = System.nanoTime()
    PairsLayout.writeIndexed(spark, corpus, dir, threshold)
    println(f"[incrprof] $sfDir writeIndexed(corpus=${corpus.count()}) " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s; batch=${batch.count()}")

    for (rep <- 1 to reps) {
      t0 = System.nanoTime()
      val (probed, hp) = Dedup.minhashProbeIndexWith(batch,
        SignatureLayout.readBands(spark, dir),
        SignatureLayout.readShingles(spark, dir),
        SignatureLayout.readSizes(spark, dir), threshold)
      val nP = probed.count()
      val tP = (System.nanoTime() - t0) / 1e9
      hp.foreach(_.unpersist(blocking = true))

      t0 = System.nanoTime()
      val (resigned, hr) = Dedup.minhashAgainstWith(batch, corpus, threshold)
      val nR = resigned.count()
      val tR = (System.nanoTime() - t0) / 1e9
      hr.foreach(_.unpersist(blocking = true))
      println(f"[incrprof] rep$rep probe=$tP%.2f s ($nP pairs)  " +
        f"resign=$tR%.2f s ($nR pairs)  speedup=${tR / tP}%.1fx")
    }
    spark.stop()
  }
}
