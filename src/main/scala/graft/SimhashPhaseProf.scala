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
    // Pre-r13 per-bit-column signature aggregation, reconstructed HERE
    // (profiler-only — never in a query path) so the round-13 lane-pack
    // can be A/B'd at the scale it targets (r13 verdict #7: the claimed
    // agg-buffer win measured flat at sf0.1; demonstrate at sf1 on the
    // 128-bit path or record the negative result).
    def unpackedSignatureOf(documents: org.apache.spark.sql.DataFrame,
                            width: Int): org.apache.spark.sql.DataFrame = {
      import graft.functions.TextFns.{md5Chunk16, simhashFromSums, tokens}
      val nChunks = width / 16
      val nBlocks = (nChunks + 7) / 8
      val tok = documents.select(col("doc_id"), explode(tokens(col("text"))).as("t"))
        .select(col("doc_id") +: (0 until nBlocks).map(b =>
          (if (b == 0) md5(col("t"))
           else md5(concat(col("t"), lit(s"#$b")))).as(s"m$b")): _*)
        .select(col("doc_id") +: (0 until nChunks).map(c =>
          md5Chunk16(col(s"m${c / 8}"), c % 8).as(s"c$c")): _*)
      def bit(i: Int) = shiftright(col(s"c${i / 16}"), 15 - (i % 16))
        .bitwiseAND(lit(1)).cast("long")
      val sums = (0 until width).map(i => sum(bit(i) * 2 - 1).as(s"s$i"))
      val agg = tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      agg.select(col("doc_id"),
        simhashFromSums((0 until width).map(i => col(s"s$i"))).as("simhash"))
    }
    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val docs = Tables.documents(spark, sfDir)
      // lane-pack A/B: signature agg ONLY, noop-sunk (guide §1.4), both
      // widths — the packed form halves hash-agg buffer slots/updates
      t("sig(128) packed agg (noop)") {
        Dedup.simhashSignatures(docs, 128)
          .write.format("noop").mode("overwrite").save()
      }
      t("sig(128) per-bit-column agg (noop)") {
        unpackedSignatureOf(docs, 128)
          .write.format("noop").mode("overwrite").save()
      }
      t("sig(64) packed agg (noop)") {
        Dedup.simhashSignatures(docs, 64)
          .write.format("noop").mode("overwrite").save()
      }
      t("sig(64) per-bit-column agg (noop)") {
        unpackedSignatureOf(docs, 64)
          .write.format("noop").mode("overwrite").save()
      }
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
