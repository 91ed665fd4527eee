package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what [[graft.sources.PairsLayout.compact]] buys: after K
  * ingest batches each relation holds base + K delta files per bucket,
  * so a probe pays K× the file-open/footer cost and K-way bucket-local
  * merges; compaction rewrites to one file per bucket. Prints per-rel
  * parquet file counts and warm probe times before/after compaction —
  * the probe is a HELD-OUT batch (doc_id % 10 == 3, never ingested), so
  * the measured work is pure index-read + join, identical rows both
  * sides.
  *
  * Usage: runMain graft.CompactProf <sfDir> [upserts=8] [reps=3]
  */
object CompactProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val upserts = args.lift(1).map(_.toInt).getOrElse(8)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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
    val base = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 3)
    val probeBatch = docs.filter(col("doc_id") % 10 === 3).cache()
    val dir = PairsLayout.dirFor(s"$sfDir#compactprof$upserts", threshold)

    var t0 = System.nanoTime()
    PairsLayout.writeIndexed(spark, base, dir, threshold)
    println(f"[compactprof] $sfDir writeIndexed(base=${base.count()}) " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    for (k <- 0 until upserts)
      PairsLayout.upsert(spark, dir,
        // DIV, not `/`: long / long is DOUBLE division in Spark (CLAUDE.md)
        docs.filter(col("doc_id") % 10 === 7 &&
          expr(s"(doc_id DIV 10) % $upserts") === k),
        threshold)
    println(f"[compactprof] $upserts upserts ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def files(rel: String): Int = {
      val d = new java.io.File(s"$dir/$rel").listFiles
      if (d == null) 0 else d.count(_.getName.endsWith(".parquet"))
    }
    def probeMin(): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      for (_ <- 1 to reps) {
        val t = System.nanoTime()
        val (probed, h) = Dedup.minhashProbeIndexWith(probeBatch,
          SignatureLayout.readBands(spark, dir),
          SignatureLayout.readShingles(spark, dir),
          SignatureLayout.readSizes(spark, dir), threshold)
        n = probed.count()
        best = math.min(best, (System.nanoTime() - t) / 1e9)
        h.foreach(_.unpersist(blocking = true))
      }
      (best, n)
    }

    val fB = Seq("bands", "shingles", "sizes", "pairs").map(r => r -> files(r))
    val (tB, nB) = probeMin()
    println(f"[compactprof] BEFORE files=${fB.map(p => s"${p._1}:${p._2}").mkString(" ")} " +
      f"probe=$tB%.2f s ($nB pairs)")

    t0 = System.nanoTime()
    PairsLayout.compact(spark, dir)
    println(f"[compactprof] compact ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val fA = Seq("bands", "shingles", "sizes", "pairs").map(r => r -> files(r))
    val (tA, nA) = probeMin()
    println(f"[compactprof] AFTER  files=${fA.map(p => s"${p._1}:${p._2}").mkString(" ")} " +
      f"probe=$tA%.2f s ($nA pairs)")
    require(nA == nB, s"compaction changed the probe result: $nB -> $nA")
    println(f"[compactprof] probe speedup ${tB / tA}%.2fx")
    spark.stop()
  }
}
