package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** mapGroupsWithState across micro-batch boundaries: the events table is
  * split by time into two parquet files and streamed one file per trigger,
  * so every user active in both halves REQUIRES the keyed state to carry
  * between batches. Totals must equal the batch groupBy regardless of the
  * batch split.
  */
class StreamStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("foreachBatch parquet sink: production path equals the memory-sink result") {
    // The memory sink in the q_stream_* harness entries buffers results on
    // the driver — fine for bounded oracle outputs, not the cluster shape.
    // Prove the production sink (foreachBatch → parquet append, the
    // streamingReindex pattern) yields the identical result for the same
    // dedup pipeline.
    val out = Files.createTempDirectory("graft_fb_sink").toString
    val ckpt = Files.createTempDirectory("graft_fb_ckpt").toString
    val q = StreamOps.dedupedDocsStream(spark, TestSpark.sf)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val viaParquet = spark.read.parquet(out)
      .groupBy("lang").agg(count(lit(1)).as("n_unique"))
      .orderBy("lang").collect().toSeq
    val viaMemory = StreamOps.streamedDedupCounts(spark, TestSpark.sf).collect().toSeq
    assert(viaParquet == viaMemory && viaParquet.nonEmpty)
  }

  test("streamed decontamination equals the batch operator row for row") {
    val streamed = StreamOps.streamedDecontam(spark, TestSpark.sf).collect().toSeq
    val batch = graft.operators.CorpusOps.decontaminate(Tables.documents(spark, TestSpark.sf))
      .collect().toSeq
    assert(streamed == batch)
    spark.sharedState.cacheManager.clearCache()
  }

  test("keyed state carries across micro-batches; totals equal batch agg") {
    import spark.implicits._
    val ev = Tables.eventsRaw(spark, TestSpark.sf).cache()
    val midTs = ev.stat.approxQuantile("ts", Array(0.5), 0.0)(0).toLong

    val dir = Files.createTempDirectory("graft_stream_state").toFile
    dir.deleteOnExit()
    ev.filter(col("ts") <= midTs).coalesce(1)
      .write.parquet(s"${dir.getAbsolutePath}/batch1.parquet")
    ev.filter(col("ts") > midTs).coalesce(1)
      .write.parquet(s"${dir.getAbsolutePath}/batch2.parquet")

    val schema = ev.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.getAbsolutePath)
    val got = StreamOps.streamedUserTotalsOf(stream, "graft_stream_state_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val want = ev.filter(col("user_id") < 20)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        min(expr("ts div 1000")).as("first_us"),
        max(expr("ts div 1000")).as("last_us"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)

    // both halves are non-empty, so at least one user truly spanned batches
    val h1 = spark.read.parquet(s"${dir.getAbsolutePath}/batch1.parquet").count()
    val h2 = spark.read.parquet(s"${dir.getAbsolutePath}/batch2.parquet").count()
    assert(h1 > 0 && h2 > 0)
    ev.unpersist()
  }

  test("session windows merge across micro-batches; result equals batch recount") {
    val ev = Tables.eventsRaw(spark, TestSpark.sf).cache()

    // batch recount under session_window's >= gap split rule
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(asc("us"), asc("event_id"))
    val want = ev.filter(col("user_id") < 20)
      .withColumn("us", expr("ts div 1000"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") >= 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("sid", sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("start_us"), max("us").as("end_us"), count(lit(1)).as("n"))
      .select("user_id", "start_us", "end_us", "n")
      .orderBy("user_id", "start_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // Split the events INSIDE a multi-event session: its partial halves
    // arrive in different triggers, so equality below requires the
    // session_window state operator to MERGE state across micro-batches,
    // not just union emitted rows.
    val straddler = want.find(s => s._4 >= 2 && s._3 > s._2)
    assert(straddler.isDefined, "corpus must contain a multi-event session")
    val cutNs = (straddler.get._2 + straddler.get._3) / 2 * 1000L
    val dir = Files.createTempDirectory("graft_stream_sess").toFile
    dir.deleteOnExit()
    ev.filter(col("ts") <= cutNs).coalesce(1)
      .write.parquet(s"${dir.getAbsolutePath}/batch1.parquet")
    ev.filter(col("ts") > cutNs).coalesce(1)
      .write.parquet(s"${dir.getAbsolutePath}/batch2.parquet")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.getAbsolutePath)
    val got = StreamOps.streamedSessionsOf(stream, "graft_stream_sess_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(got.nonEmpty && got.toSeq == want.toSeq)
    ev.unpersist()
  }

  test("stream-stream join buffers one side across micro-batches") {
    // views arrive in batch 1, purchases ONLY in batch 2: every matched pair
    // requires the views to still sit in join state when batch 2 processes.
    // The huge watermark keeps the test about state-carry, not lateness;
    // the production path (q_stream_join) runs the same core with 2 hours.
    val ev = Tables.eventsRaw(spark, TestSpark.sf)
      .withColumn("ts_t", timestamp_micros(expr("ts div 1000"))).cache()
    val dir = Files.createTempDirectory("graft_stream_join").toFile
    dir.deleteOnExit()
    ev.filter(col("event_type") === "view").coalesce(1)
      .write.parquet(s"${dir.getAbsolutePath}/batch1.parquet")
    ev.filter(col("event_type") === "purchase").coalesce(1)
      .write.parquet(s"${dir.getAbsolutePath}/batch2.parquet")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(dir.getAbsolutePath)
    val got = StreamOps.viewPurchaseJoinOf(stream, "graft_stream_join_spec", "3650 days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts_t").as("vt"), col("event_id").as("vi"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts_t").as("pt"), col("event_id").as("pi"))
    val want = v.join(p, expr("vu = pu AND pt >= vt AND pt <= vt + interval 1 hour"))
      .groupBy(col("vu").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("vi")).as("nv"), countDistinct(col("pi")).as("np"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(want.nonEmpty) // the corpus really contains view→purchase pairs
    assert(got.toSeq == want.toSeq)
    ev.unpersist()
  }

  test("watermarked append-mode window: only watermark-closed windows emit; late data dropped") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("ts_t"), col("event_type")).orderBy("ts_t").cache()
    val n = ev.count()
    val rows = ev.collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_wm").toFile
    dir.deleteOnExit()
    def writeBatch(rs: Seq[org.apache.spark.sql.Row], path: String): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rs), ev.schema)
        .coalesce(1).write.parquet(path)
    // batch1 = newest 80% (advances the watermark); batch2 re-sends some of
    // the OLDEST rows after newer data was seen — i.e. genuinely late events
    val (early, recent) = rows.splitAt((n * 0.2).toInt)
    writeBatch(recent.toSeq, s"${dir.getAbsolutePath}/b1.parquet")
    writeBatch(early.take(10).toSeq, s"${dir.getAbsolutePath}/b2.parquet")

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").option("recursiveFileLookup", "true")
      .parquet(dir.getAbsolutePath)
    val agg = stream
      .withWatermark("ts_t", "1 hour")
      .groupBy(window(col("ts_t"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("graft_wm_spec").start()
    try q.processAllAvailable() finally q.stop()
    val emitted = spark.table("graft_wm_spec")
    // append mode emits ONLY windows the watermark has closed — never more
    // than the total window count, and every emitted window is final
    assert(emitted.count() > 0)
    val complete = ev.groupBy(window(col("ts_t"), "6 hours"), col("event_type")).count()
    assert(emitted.count() <= complete.count())
    ev.unpersist()
  }

  test("streaming re-index picks up files appearing mid-stream and replaces changed ones") {
    import java.nio.file.{Files => JF}
    val watch = JF.createTempDirectory("graft_watch").toFile
    val index = JF.createTempDirectory("graft_stream_idx").toFile
    watch.deleteOnExit(); index.deleteOnExit()
    JF.writeString(new java.io.File(watch, "a.py").toPath,
      "def alpha():\n    return 1\n\nclass Alpha:\n    pass\n")

    val q = StreamOps.streamingReindex(spark, watch.getAbsolutePath, index.getAbsolutePath)
    try {
      q.processAllAvailable()
      val after1 = spark.read.parquet(s"${index.getAbsolutePath}/code_elements")
      assert(after1.filter(col("file_path") === "a.py").count() >= 2)

      // a new file appears while the query is RUNNING — next batch must index it
      JF.writeString(new java.io.File(watch, "b.py").toPath,
        "def beta():\n    return 2\n")
      q.processAllAvailable()
      val after2 = spark.read.parquet(s"${index.getAbsolutePath}/code_elements")
      assert(after2.filter(col("file_path") === "b.py").count() >= 1)
      assert(after2.filter(col("file_path") === "a.py").count() >= 2)

      // a trained layout present during streaming is kept CURRENT as new
      // files arrive (Spark's file source delivers additions only — the
      // same-path replace branch of upsertSearchLayout is unit-tested in
      // IndexBuildSpec): after the next batch the layout covers every
      // element and the exhaustive probe equals the exact flagship search
      graft.sources.IndexBuild.writeSearchLayout(spark, index.getAbsolutePath,
        numCentroids = 2, iters = 1)
      JF.writeString(new java.io.File(watch, "c.py").toPath,
        "def gamma():\n    return 3\n")
      q.processAllAvailable()
      val els = spark.read.parquet(s"${index.getAbsolutePath}/code_elements")
      val cells = spark.read.parquet(s"${index.getAbsolutePath}/vector_layout/cells")
      assert(cells.filter(col("name") === "gamma").count() == 1)
      assert(cells.count() == els.count())
      val exact = graft.sources.IndexBuild.searchIndex(spark,
        index.getAbsolutePath, "gamma three", 3).collect().map(_.toString).toSeq
      val probed = graft.sources.IndexBuild.searchIndexIvf(spark,
        index.getAbsolutePath, "gamma three", 3, nprobe = 2)
        .collect().map(_.toString).toSeq
      assert(probed == exact)
    } finally q.stop()
  }

  test("streaming frozen-vocabulary BPE apply is batch-split invariant and equals the batch path") {
    import java.nio.file.{Files => JF}
    val docs = Tables.documents(spark, TestSpark.sf)
    val merges = graft.operators.Bpe
      .learn(docs.filter(col("doc_id") % 2 === 0), iters = 4)
      .localCheckpoint(true)
    val ho = docs.filter(col("doc_id") % 2 =!= 0)
    val batch = graft.operators.Bpe.applyMerges(ho, merges, iters = 4)
      .collect().map(_.toString).toSeq
    // split the held-out corpus into TWO parquet files and stream them one
    // per trigger: two genuine micro-batches through the sink, words
    // straddling the split must still profile identically
    val srcDir = JF.createTempDirectory("graft_bpe_split").toString
    ho.filter(col("doc_id") % 4 === 1).write.parquet(s"$srcDir/p1")
    ho.filter(col("doc_id") % 4 === 3).write.parquet(s"$srcDir/p2")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val streamed = graft.streaming.StreamOps
      .streamedBpeApplyOf(stream, merges, iters = 4)
      .collect().map(_.toString).toSeq
    assert(streamed == batch,
      "per-batch partials through the sink must reproduce the one-shot profile")
  }

  test("streaming frozen-model NB scoring across forced micro-batches equals the batch classifier") {
    import java.nio.file.{Files => JF}
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, TestSpark.sf)
    val batch = TextAnalysis.nbClassify(docs).collect().map(_.toString).toSeq
    spark.catalog.clearCache()
    val (st, classes) = graft.sources.NbLayout
      .ensureModel(spark, docs, TestSpark.sf, testMod = 5, buckets = 1024)
    // two parquet files + maxFilesPerTrigger=1: two genuine micro-batches;
    // per-doc classification must be invariant to the split
    val te = docs.filter(col("doc_id") % 5 === 0)
    val srcDir = JF.createTempDirectory("graft_nb_split").toString
    te.filter(col("doc_id") % 2 === 0).write.parquet(s"$srcDir/p1")
    te.filter(col("doc_id") % 2 =!= 0).write.parquet(s"$srcDir/p2")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(srcDir)
    val streamed = graft.streaming.StreamOps
      .streamedNbClassifyOf(stream,
        st.localCheckpoint(true), classes.localCheckpoint(true), buckets = 1024)
      .collect().map(_.toString).toSeq
    assert(streamed == batch,
      "per-batch scoring against the frozen model must reproduce the batch classifier")
  }

  test("streamed quantile partials across forced micro-batches reproduce the one-shot sketch") {
    import graft.operators.Sketches
    val docs = Tables.documents(spark, TestSpark.sf)
    val srcDir = Files.createTempDirectory("graft_stream_ddq_src").toFile
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    try {
      docs.filter(col("doc_id") % 10 === 7).coalesce(1)
        .write.parquet(s"${srcDir.getAbsolutePath}/b1.parquet")
      docs.filter(col("doc_id") % 10 === 3).coalesce(1)
        .write.parquet(s"${srcDir.getAbsolutePath}/b2.parquet")
      val outDir = Files.createTempDirectory("graft_stream_ddq_out").toString
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir.getAbsolutePath)
      val q = stream.writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Sketches.ddHistPartials(b).write.mode("append").parquet(outDir)
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      val base = Sketches.ddHistPartials(
        docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 3))
      val merged = base.unionByName(
          spark.read.schema("lang STRING, b BIGINT, sub BIGINT, c BIGINT")
            .parquet(outDir))
        .groupBy("lang", "b", "sub").agg(sum("c").as("c"))
      val streamed = Sketches.ddQuantilesOf(merged, "").orderBy("lang")
        .collect().map(_.toString).toSeq
      val full = Sketches.ddQuantilesOf(Sketches.ddHistPartials(docs), "")
        .orderBy("lang").collect().map(_.toString).toSeq
      rm(new java.io.File(outDir))
      assert(streamed == full,
        "sum-merged micro-batch histograms must equal the one-shot sketch")
    } finally rm(srcDir)
  }

  test("streamed HLL registers across forced micro-batches reproduce the full-corpus sketch") {
    import graft.operators.Sketches
    val docs = Tables.documents(spark, TestSpark.sf)
    val srcDir = Files.createTempDirectory("graft_stream_hll_src").toFile
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    try {
      docs.filter(col("doc_id") % 10 === 7).coalesce(1)
        .write.parquet(s"${srcDir.getAbsolutePath}/b1.parquet")
      docs.filter(col("doc_id") % 10 === 3).coalesce(1)
        .write.parquet(s"${srcDir.getAbsolutePath}/b2.parquet")
      val outDir = Files.createTempDirectory("graft_stream_hll_out").toString
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir.getAbsolutePath)
      val q = stream.writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Sketches.hllRegisters(b).write.mode("append").parquet(outDir)
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      val base = Sketches.hllRegisters(
        docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 3))
      val merged = base.unionByName(
          spark.read.schema("lang STRING, b INT, m_j INT").parquet(outDir))
        .groupBy("lang", "b").agg(max("m_j").as("m_j"))
      val streamed = Sketches.hllEstimateOf(merged).orderBy("lang")
        .collect().map(_.toString).toSeq
      val full = Sketches.hllEstimateOf(Sketches.hllRegisters(docs))
        .orderBy("lang").collect().map(_.toString).toSeq
      rm(new java.io.File(outDir))
      assert(streamed == full,
        "max-merged micro-batch registers must equal the one-shot sketch")
    } finally rm(srcDir)
  }

  test("streaming drift report equals the batch drift report row for row") {
    val streamed = StreamOps.streamedDrift(spark, TestSpark.sf).collect().map(_.toString).toSeq
    val batch = graft.operators.TextAnalysis.driftReport(
      Tables.documents(spark, TestSpark.sf)).collect().map(_.toString).toSeq
    spark.catalog.clearCache()
    assert(streamed == batch, "micro-batch partial counts must reproduce the one-shot report")
  }

  test("streamed pair-artifact maintenance across forced micro-batches equals full-corpus pipeline") {
    val threshold = 0.5 // sf0.001 has few 0.8-pairs; match PairsLayoutSpec's fixture
    val docs = Tables.documents(spark, TestSpark.sf)
    val srcDir = Files.createTempDirectory("graft_stream_pairs_src").toFile
    srcDir.deleteOnExit()
    val artDir = Files.createTempDirectory("graft_stream_pairs_art").toString
    try {
      // two ingest slices as separate files + maxFilesPerTrigger=1: the
      // SECOND micro-batch must probe an index containing the first's
      // appended signatures — the cross-micro-batch half of the contract
      docs.filter(col("doc_id") % 10 === 7).coalesce(1)
        .write.parquet(s"${srcDir.getAbsolutePath}/b1.parquet")
      docs.filter(col("doc_id") % 10 === 3).coalesce(1)
        .write.parquet(s"${srcDir.getAbsolutePath}/b2.parquet")
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir.getAbsolutePath)
      val base = docs.filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 10 =!= 3)
      val got = StreamOps.streamedPairsMaintenanceOf(spark, base, stream, artDir, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = graft.operators.Dedup.nearDupPairs(docs, threshold)
        .orderBy("d1", "d2")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      spark.catalog.clearCache()
      assert(want.exists(p => p._1 % 10 == 7 || p._2 % 10 == 7),
        "fixture vacuous: no near-dup pair touches micro-batch 1")
      assert(want.exists(p => p._1 % 10 == 3 || p._2 % 10 == 3),
        "fixture vacuous: no near-dup pair touches micro-batch 2")
      assert(got == want)
      // periodic in-stream compaction (compactEvery=1: compact after EVERY
      // micro-batch — the most adversarial cadence: batch 2 probes an
      // index batch 1 just compacted) must not change the artifact
      val artDir2 = Files.createTempDirectory("graft_stream_pairs_cpt").toString
      try {
        val stream2 = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1")
          .option("recursiveFileLookup", "true")
          .parquet(srcDir.getAbsolutePath)
        val got2 = StreamOps.streamedPairsMaintenanceOf(spark, base, stream2,
            artDir2, threshold, compactEvery = 1)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        spark.catalog.clearCache()
        assert(got2 == want, "in-stream compaction changed the artifact")
      } finally {
        def rm2(f: java.io.File): Unit = {
          val cs = f.listFiles(); if (cs != null) cs.foreach(rm2); f.delete(); ()
        }
        rm2(new java.io.File(artDir2))
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(artDir)); rm(srcDir)
    }
  }
}
