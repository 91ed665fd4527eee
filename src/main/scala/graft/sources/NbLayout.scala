package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted Naive-Bayes model — the trained-family artifact treatment
  * ([[EmbedLayout]] / [[CentroidLayout]] precedent) applied to
  * [[graft.operators.TextAnalysis.nbClassify]]: training is one corpus
  * pass (tokenize + one partial-agged groupBy), which at 100 TB is THE
  * cost, so it is paid at ingest and stored; scoring then reads two
  * bounded relations and never touches the train corpus again.
  *
  * What is stored is the SUFFICIENT STATISTICS, not the derived scores:
  *  - `model/counts` (cls, b, c) — observed (class, bucket) occurrence
  *    counts, ≤ classes × buckets rows;
  *  - `model/docs`   (cls, ndc)  — per-class train doc counts (the prior);
  *  - `model/applied/<batchId>`  — empty marker per merged ingest batch.
  * Raw counts merge under addition, so [[upsert]] makes incremental
  * re-training O(batch tokenize + bounded merge) — the same maintenance
  * contract as the MinHash signature index — while the quantized-log score
  * table stays a cheap derived view
  * ([[graft.operators.TextAnalysis.nbModelOf]]).
  *
  * Commit protocol: everything (merged counts, merged docs, carried-over
  * + new batch markers) is staged under `model_stage/` and swapped in as
  * ONE directory rename pair ([[SignatureLayout.swapIn]]) — a crash leaves
  * either the old model or the new one, never counts from one and priors
  * from the other, and the marker set always matches the counts beside
  * it. A replayed batch (Structured Streaming's at-least-once
  * foreachBatch, a retried ingest job) hits its marker and merges
  * nothing twice.
  *
  * Both relations are written `coalesce(1)` on purpose: bounded rows that
  * feed broadcasts, not parallel readers (the [[EmbedLayout]]
  * ensureThresholds precedent — contrast its corpus-cardinality relations,
  * which are repartitioned to session parallelism).
  */
object NbLayout {

  private val built = new BuildLatch

  def dirFor(sfDir: String, testMod: Int, buckets: Int): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|nb|$testMod|$buckets".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"out/artifacts/nb-$h"
  }

  private def fs(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(new java.io.File(p).getAbsolutePath)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** Train on the `doc_id % testMod != 0` split and persist the counts.
    * One tokenize pass: the feature relation is consumed exactly once
    * (into the counts groupBy); the prior comes from a cheap documents
    * re-scan, not a second tokenize. */
  def write(spark: SparkSession, documents: DataFrame, dir: String,
            testMod: Int, buckets: Int): Unit = {
    val train = documents.filter(col("doc_id") % testMod =!= 0)
    stageAndSwap(spark, dir, graft.operators.TextAnalysis.nbCounts(
      graft.operators.TextAnalysis.nbFeatRows(train, buckets), train),
      carryMarkers = false, newMarker = None)
  }

  /** Merge one ingest batch of TRAIN-side documents into the stored model:
    * tokenize the batch, union its (cls, b) / (cls) partials with the
    * stored bounded relations, re-aggregate (bounded work), swap. Keyed on
    * `batchId`: a batch whose marker is already inside the live model is
    * skipped entirely, so at-least-once replay merges nothing twice. */
  def upsert(spark: SparkSession, batchDocs: DataFrame, dir: String,
             buckets: Int, batchId: String): Unit = {
    val (f, marker) = fs(spark, s"$dir/model/applied/$batchId")
    if (f.exists(marker)) return
    val (bc, bn) = graft.operators.TextAnalysis.nbCounts(
      graft.operators.TextAnalysis.nbFeatRows(batchDocs, buckets), batchDocs)
    val mc = readCounts(spark, dir).unionByName(bc)
      .groupBy("cls", "b").agg(sum("c").as("c"))
    val mn = readDocs(spark, dir).unionByName(bn)
      .groupBy("cls").agg(sum("ndc").as("ndc"))
    stageAndSwap(spark, dir, (mc, mn), carryMarkers = true, Some(batchId))
  }

  private def stageAndSwap(spark: SparkSession, dir: String,
                           rel: (DataFrame, DataFrame),
                           carryMarkers: Boolean,
                           newMarker: Option[String]): Unit = {
    val (cnt, nd) = rel
    // stage the failure-prone Spark writes first
    cnt.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/model_stage/counts")
    nd.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/model_stage/docs")
    val (f, appliedStage) = fs(spark, s"$dir/model_stage/applied")
    f.mkdirs(appliedStage)
    if (carryMarkers) {
      val (_, appliedLive) = fs(spark, s"$dir/model/applied")
      if (f.exists(appliedLive))
        f.listStatus(appliedLive).foreach { s =>
          f.createNewFile(new org.apache.hadoop.fs.Path(appliedStage, s.getPath.getName)); ()
        }
    }
    newMarker.foreach { id =>
      f.createNewFile(new org.apache.hadoop.fs.Path(appliedStage, id)); ()
    }
    SignatureLayout.swapIn(spark, s"$dir/model", s"$dir/model_stage")
  }

  def readCounts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/model/counts")

  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/model/docs")

  /** Build-once-per-run + derived (score table, class totals) read — the
    * scoring-side entry point. */
  def ensureModel(spark: SparkSession, documents: DataFrame, sfDir: String,
                  testMod: Int, buckets: Int): (DataFrame, DataFrame) = {
    val dir = dirFor(sfDir, testMod, buckets)
    built.onceIfAbsent(dir) {
      write(spark, documents, dir, testMod, buckets)
    }
    graft.operators.TextAnalysis.nbModelOf(
      readCounts(spark, dir), readDocs(spark, dir))
  }
}
