package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the incremental pair-artifact maintenance chain
  * (round-13 optimization measurement): where do q_pairs_incremental /
  * q_pairs_compact go — the 90%-slice writeIndexed, the batch upsert, the
  * compact, or the read-back? */
object PairsPhaseProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.PairsLayout
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to reps) {
      println(s"=== rep $rep ===")
      val docs = Tables.documents(spark, sfDir)
      val d = PairsLayout.dirFor(s"$sfDir#phaseprof", 0.8)
      val old = docs.filter(col("doc_id") % 10 =!= 7)
      val batch = docs.filter(col("doc_id") % 10 === 7)
      t("writeIndexed (90% slice)") {
        PairsLayout.writeIndexed(spark, old, d, 0.8)
      }
      t("upsert (10% batch)") {
        PairsLayout.upsert(spark, d, batch, 0.8)
      }
      // batch pipeline alone (noop): within-batch minhash+verify — the
      // baseline to subtract from the probe phase below
      t("batch pipeline alone (noop)") {
        import graft.operators.Dedup
        val a = Dedup.minhashArtifactsWith(batch, 0.8)
        try a.pairs.write.format("noop").mode("overwrite").save()
        finally a.handles.foreach(_.unpersist())
      }
      // probe-only isolation (noop sink): the minhashAgainst candidate
      // join + verify against the three STORED relations — the corpus
      // term VERDICT r13 #8 asks to measure, separated from the batch's
      // own pipeline and the staged writes (which overlap concurrently
      // inside upsert). Uses a fresh batch slice so the artifact state
      // is untouched.
      t("probe-only vs stored index (noop)") {
        import graft.sources.SignatureLayout
        import graft.operators.Dedup
        val a = Dedup.minhashArtifactsWith(batch, 0.8)
        try {
          Dedup.probeIndex(a.shingles, a.bands,
            SignatureLayout.readBands(spark, d),
            SignatureLayout.readShingles(spark, d),
            SignatureLayout.readSizes(spark, d), 0.8)
            .write.format("noop").mode("overwrite").save()
        } finally a.handles.foreach(_.unpersist())
      }
      t("compact") {
        PairsLayout.compact(spark, d)
      }
      t("read + orderBy (toRdd.count)") {
        PairsLayout.read(spark, d).orderBy(asc("d1"), asc("d2"))
          .queryExecution.toRdd.count()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
