package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.operators.Dedup

/** Persisted near-dup PAIR artifact — the materialize-once seam the whole
  * dup-graph report family reads (round-6 verdict #1). The MinHash
  * signature + verify pipeline ([[Dedup.nearDupPairsWith]]) runs ONCE per
  * corpus snapshot and lands as a bare (d1, d2) parquet relation; every
  * consumer — degree/triangle/centrality reports, connected components,
  * the leakage-safe split, ad-hoc keep/drop policies — then reads a
  * pair-cardinality table (≪ corpus) instead of re-running a corpus-scale
  * signature pipeline per report. Same production shape as
  * [[VectorLayout]]: trainer/etl writes the artifact offline, queries only
  * scan it.
  *
  * Freshness contract: [[ensure]] REBUILDS the artifact on its first touch
  * in each JVM (per-process memo) — a run can never read a previous
  * corpus snapshot's pairs (the harness regenerates testdata between
  * rounds), while every later consumer in the same run gets the pure read.
  * A deployment with a durable snapshot id would key the directory by that
  * id instead and skip the rebuild; the memo is the snapshot id this
  * harness has.
  *
  * Restriction contract (inherited from [[Dedup.nearDupPairs]]): pair
  * membership depends only on the two docs, so consumers on a FILTERED
  * corpus semi-join both endpoints against their subset — no recompute.
  */
object PairsLayout {

  /** Artifact directories this JVM has already (re)built — see the
    * freshness contract above. */
  private val built = new BuildLatch

  /** Deterministic artifact dir for a (corpus dir, banding params) key,
    * under the repo-local `out/artifacts` root. */
  def dirFor(sfDir: String, threshold: Double,
             seeds: Int = 8, rowsPerBand: Int = 2): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|$threshold|$seeds|$rowsPerBand".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"out/artifacts/pairs-$h"
  }

  /** Run the pair pipeline once and persist `$dir/pairs` (d1, d2). The
    * shingle scratch cached inside the pipeline is released by handle
    * after the write — the `-With` lifecycle, nothing leaks. */
  def write(spark: SparkSession, documents: DataFrame, dir: String,
            threshold: Double, seeds: Int = 8, rowsPerBand: Int = 2): Unit = {
    val (m, handles) = Dedup.minhashWith(documents, threshold, seeds, rowsPerBand)
    try m.select("d1", "d2").write.mode(SaveMode.Overwrite).parquet(s"$dir/pairs")
    finally handles.foreach(_.unpersist())
  }

  /** [[write]] + the persisted SIGNATURE index ([[SignatureLayout]]) from
    * the SAME shingle pass — the base an incremental artifact needs so
    * later [[upsert]]s probe stored state instead of re-signing the
    * corpus (round-8 verdict #2). Report-only artifacts ([[ensure]]
    * consumers) keep the cheaper pairs-only [[write]]. */
  def writeIndexed(spark: SparkSession, documents: DataFrame, dir: String,
                   threshold: Double, seeds: Int = 8, rowsPerBand: Int = 2): Unit = {
    val a = Dedup.minhashArtifactsWith(documents, threshold, seeds, rowsPerBand)
    try {
      // a rewritten snapshot invalidates all per-batch maintenance state:
      // batch commit markers (an old marker would make [[upsert]] skip a
      // batch the NEW snapshot never saw) and any streaming checkpoint
      // keyed to the previous base
      val conf = spark.sparkContext.hadoopConfiguration
      Seq("_batches", "_checkpoint").foreach { d =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$d")
        val fs = p.getFileSystem(conf)
        if (fs.exists(p)) { fs.delete(p, true); () }
      }
      // pairs write concurrent with the three signature-relation writes
      // (disjoint paths; shared cached subtrees are BlockManager-safe)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val pairsWrite = Future {
        a.pairs.select("d1", "d2")
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/pairs")
      }
      // drain the detached pairs future before ANY exception can leave
      // this section (round-13 ADVICE): an orphaned writer racing a
      // same-JVM retry's Overwrite on the same path can commit both
      // attempts' part files
      val sigs = scala.util.Try(SignatureLayout.write(spark, dir, a.bands, a.shingles))
      Await.ready(pairsWrite, Duration.Inf)
      sigs.get
      Await.result(pairsWrite, Duration.Inf)
    } finally a.handles.foreach(_.unpersist())
  }

  /** Pure read of a persisted pair relation. Deliberately uncached: the
    * relation keeps its natural parquet-stat size estimate (small at test
    * scale → broadcast where correct, big at 100 TB → shuffle join), the
    * round-4 curation lesson. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    // self-heal a compaction swap that crashed between its two renames
    SignatureLayout.recoverPath(spark,
      new java.io.File(s"$dir/pairs").getAbsolutePath)
    spark.read.parquet(s"$dir/pairs")
  }

  /** Build-once-per-run + read: the form the report queries use. */
  def ensure(spark: SparkSession, documents: DataFrame, sfDir: String,
             threshold: Double, seeds: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val dir = dirFor(sfDir, threshold, seeds, rowsPerBand)
    built.onceIfAbsent(dir) {
      // add only AFTER a successful write: a failed build must retry on
      // the next touch, not hand out a missing/partial artifact
      write(spark, documents, dir, threshold, seeds, rowsPerBand)
    }
    read(spark, dir)
  }

  /** Incremental maintenance (round-7 verdict #6): fold a NEW ingest batch
    * into a persisted pair artifact WITHOUT re-signing the corpus. Pair
    * membership is a per-pair property — band keys and Jaccard depend only
    * on the two docs — so the unioned corpus' pair set decomposes exactly:
    *
    *   pairs(corpus ∪ batch) = pairs(corpus)            [the artifact]
    *                         ∪ pairs(batch × corpus)    [[Dedup.minhashProbeIndexWith]]
    *                         ∪ pairs(batch × batch)     [[Dedup.minhash]]
    *
    * The first term is already on disk; the second probes the PERSISTED
    * signature index ([[SignatureLayout]], written by [[writeIndexed]])
    * with the batch's bands — the corpus is never re-read, re-shingled,
    * or re-signed (round-8 verdict #2: the previous shape took a live
    * corpus relation and redid its whole signature pipeline per batch);
    * the third is the batch-internal quadratic, bounded by the ingest
    * batch size. The batch's OWN signatures are then appended, so the
    * NEXT batch probes an up-to-date index — per-batch work stays
    * O(batch + probe) forever. The appended rows make the artifact EQUAL
    * to a full rebuild on the unioned corpus — not approximately: the
    * q_pairs_incremental gate checks the incrementally-built artifact
    * against the full-corpus oracle, and PairsLayoutSpec pins a TWO-batch
    * upsert chain against [[write]] on the union.
    *
    * One shingle pass per batch: the probe reuses the bands/shingles the
    * within-batch pipeline builds. Cross pairs are least/greatest-
    * normalized to the artifact's d1 < d2 contract; batch and corpus
    * doc_ids must be disjoint (the ingest contract — a re-ingested id
    * goes through delete-then-upsert upstream). Scratch caches released
    * by handle. Commit order: stage everything (Spark jobs), then rename
    * signatures, then pairs, then the batch's commit MARKER last.
    *
    * Idempotence / recovery contract (round-9 ADVICE #1 — the previous
    * scaladoc claimed a benign crash window it did not have):
    *   - A batch whose marker `_batches/<key>` exists is SKIPPED outright —
    *     at-least-once redelivery (a streaming replay after restart, a
    *     retried ingest job) costs nothing and appends nothing. `batchId`
    *     should be the caller's durable batch key (foreachBatch batchId);
    *     the default derives an order-independent content digest of the
    *     batch's doc_ids (one tiny aggregate job).
    *   - A RE-RUN of a batch whose previous attempt crashed MID-COMMIT
    *     (marker absent, some renames done) REPLACES, never duplicates:
    *     every delta file is committed under the batch's md5-keyed name
    *     prefix and [[SignatureLayout.moveInto]] deletes that prefix's
    *     live files before renaming — so re-running any half-committed
    *     relation converges to exactly one copy of the delta. The probe
    *     additionally anti-joins the batch's own doc_ids OFF the stored
    *     corpus side (broadcast anti — map-side, a no-op on the clean
    *     path), so half-appended signatures never self-pair or inflate an
    *     intersection count while the delta is being recomputed.
    *   - Only after ALL four relations commit does the marker appear; a
    *     deployment that wants a stronger contract (concurrent writers,
    *     readers isolated from mid-commit states) puts a table format
    *     with atomic commit under this seam (the [[IndexBuild]] swap
    *     note); the commit ORDER and marker-last rule survive that swap. */
  def upsert(spark: SparkSession, dir: String, batch: DataFrame,
             threshold: Double, seeds: Int = 8, rowsPerBand: Int = 2,
             batchId: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions.{broadcast, col, count, expr, greatest, least, lit}
    // phase marks (profiler-only, env-guarded — the upsertStored pattern)
    val dbg = sys.env.contains("SPARK_GRAFT_PAIRS_DEBUG")
    var tdbg = System.nanoTime()
    def mark(what: String): Unit = {
      if (dbg) println(f"[pairs_upsert] $what ${(System.nanoTime() - tdbg) / 1e9}%.2f s")
      tdbg = System.nanoTime()
    }
    // file-count discipline (round-9 ADVICE #4): batch deltas are sized to
    // the BATCH, not session parallelism — a long-running ingest appending
    // 32 files × 4 relations per micro-batch degrades probe read planning;
    // periodic compaction (rewrite via [[writeIndexed]]) is the production
    // answer for multi-year ingest histories
    val n = math.max(1, spark.sparkContext.defaultParallelism / 4)
    val id = batchId.getOrElse {
      // bit_xor: order-independent AND overflow-free (sum of hashes trips
      // ANSI long-overflow on real batches); count disambiguates rare
      // xor-cancelling id sets
      val r = batch.agg(expr("bit_xor(xxhash64(doc_id))").as("h"),
        count(lit(1)).as("c")).head()
      if (r.isNullAt(0)) s"empty-0" else f"${r.getLong(0)}%016x-${r.getLong(1)}"
    }
    mark("batch id digest")
    // md5-keyed prefix: collision-free across distinct batch ids, stable
    // across re-runs of the SAME id, and free of filesystem-hostile chars
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    val prefix = s"b$key"
    val conf = spark.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_batches/$key")
    val mfs = marker.getFileSystem(conf)
    if (mfs.exists(marker)) return // batch fully committed — replay no-op
    val a = Dedup.minhashArtifactsWith(batch, threshold, seeds, rowsPerBand)
    try {
      // crash-rerun probe guard: batch docs excluded from the corpus side
      // (broadcast anti — map-side filter, no-op on the clean path)
      val ids = batch.select(col("doc_id"))
      def noBatch(df: DataFrame): DataFrame =
        df.join(broadcast(ids), Seq("doc_id"), "left_anti")
      val cross = Dedup.probeIndex(a.shingles, a.bands,
        noBatch(SignatureLayout.readBands(spark, dir)),
        noBatch(SignatureLayout.readShingles(spark, dir)),
        noBatch(SignatureLayout.readSizes(spark, dir)), threshold)
      // stage the failure-prone Spark writes first — pairs delta concurrent
      // with the signature-delta staging (round-13: disjoint stage paths,
      // independent jobs; sequential submission idled the cluster in each
      // small job's stage tail — the writeIndexed/compact lesson applied
      // to the upsert's staging phase)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val pairsStage = Future {
        cross.select(
            least(col("batch_doc"), col("corpus_doc")).as("d1"),
            greatest(col("batch_doc"), col("corpus_doc")).as("d2"))
          .unionByName(a.pairs.select(col("d1"), col("d2")))
          .repartition(n)
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/stage_pairs")
      }
      // signature deltas stage BUCKETED (bucket-aligned files are the
      // price of the exchange-free probe; a batch touches only its
      // non-empty buckets, and compaction-by-rewrite bounds the history).
      // stageAppend failure must still DRAIN the pairs future before
      // propagating (round-13 ADVICE: an orphaned stage_pairs writer
      // racing a retry's Overwrite commits both attempts' files, and the
      // finally-unpersist below would yank its cached subtrees mid-job)
      val staged = scala.util.Try(
        SignatureLayout.stageAppend(spark, dir, a.bands, a.shingles))
      Await.ready(pairsStage, Duration.Inf)
      staged.get
      Await.result(pairsStage, Duration.Inf)
      mark("stage (probe + batch pipeline + 4 staged writes)")
      // ...then commit by batch-keyed rename: signatures, pairs, marker
      // LAST (replace-on-rerun semantics — see the recovery contract)
      SignatureLayout.commitAppend(spark, dir, prefix)
      SignatureLayout.moveInto(spark, s"$dir/stage_pairs", s"$dir/pairs", prefix)
      mfs.mkdirs(marker.getParent)
      mfs.create(marker, true).close()
      mark("commit renames + marker")
    } finally a.handles.foreach(_.unpersist())
  }

  /** Compact the artifact: bound the file counts a long-running ingest
    * accumulates — every [[upsert]] appends a batch-keyed delta to `pairs`
    * and to each signature bucket, and nothing before this call ever
    * removed one. Rewrites `pairs` to a bounded file count via the same
    * set-aside/swap-in protocol as the signature relations (content-
    * preserving, so a crash between relations is benign — see
    * [[SignatureLayout.compact]], which this delegates to for
    * bands/shingles/sizes and their optional re-bucketing; pass
    * `buckets > 0` to re-bucket in the same pass). Batch markers are
    * preserved: a replayed batch after compaction still no-ops.
    * Pairs-only artifacts ([[write]] consumers, no signature index) get
    * just the pairs rewrite. */
  def compact(spark: SparkSession, dir: String, buckets: Int = 0): Unit = {
    import org.apache.spark.sql.functions.col
    val shp = new org.apache.hadoop.fs.Path(
      new java.io.File(s"$dir/shingles").getAbsolutePath)
    val f = shp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pairs rewrite concurrent with the signature-relation rewrites
    // (disjoint paths, independent swaps — the SignatureLayout.compact
    // concurrency note)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val pairsRewrite = Future {
      val n = math.max(1, spark.sparkContext.defaultParallelism / 4)
      spark.read.parquet(s"$dir/pairs")
        .repartition(n, col("d1"))
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/compact_pairs")
      SignatureLayout.swapIn(spark, s"$dir/pairs", s"$dir/compact_pairs")
    }
    // same drain-before-propagate discipline as upsert's staging section
    val sigs = scala.util.Try(
      if (f.exists(shp)) SignatureLayout.compact(spark, dir, buckets))
    Await.ready(pairsRewrite, Duration.Inf)
    sigs.get
    Await.result(pairsRewrite, Duration.Inf)
  }

  /** Unconditional rebuild + read-back — the bench entry that PRICES the
    * artifact build (q_pairs_artifact), so the fast read-side report
    * entries never hide the pipeline cost. */
  def rebuild(spark: SparkSession, documents: DataFrame, sfDir: String,
              threshold: Double, seeds: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val dir = dirFor(sfDir, threshold, seeds, rowsPerBand)
    built.always(dir) {
      write(spark, documents, dir, threshold, seeds, rowsPerBand)
    }
    read(spark, dir)
  }
}
