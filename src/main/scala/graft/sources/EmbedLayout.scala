package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Embedder

/** Persisted per-document EMBEDDING artifact — the PairsLayout move applied
  * to the embed-dedup/outlier family (round-7 verdict #1): the corpus is
  * tokenized + hashed ONCE per snapshot and lands as two parquet relations,
  *
  *   - `hist`: (doc_id, lang, bucket, cnt) — the sparse integer histogram
  *     ([[Embedder.bucketHistogram]] with lang carried), read by the
  *     centroid/outlier family;
  *   - `emb`:  (doc_id, embedding) — the dense `array<double>` form, read
  *     by the cosine near-dup family and any ANN consumer.
  *
  * This is the shape the reference itself uses — embeddings are computed at
  * index time and stored beside the documents
  * (/root/reference/coding_agent/tools/indexing_agent.py:353-361), never
  * re-encoded per query. At 100 TB the embed pass is the single most
  * expensive map-side computation in the engine; running it inside every
  * dedup/outlier query re-prices it per report, while the artifact prices
  * it once at ingest (the bench entry `q_embed_artifact` keeps that price
  * visible).
  *
  * The dense relation is derived FROM the persisted sparse relation (read
  * back, grouped, densified) — one tokenize pass total, and the two
  * artifacts can never diverge.
  *
  * Freshness and caching contracts are [[PairsLayout]]'s verbatim: rebuild
  * on first touch per JVM (the harness regenerates testdata between
  * rounds); reads deliberately uncached so parquet stats keep join
  * planning honest at every scale.
  */
object EmbedLayout {

  private val built = new BuildLatch

  def dirFor(sfDir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|embed|${Embedder.Dim}".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"out/artifacts/embed-$h"
  }

  /** One tokenize pass → both relations.
    *
    * Both writes are REPARTITIONED to the session's parallelism first: at
    * test scale AQE coalesces the small aggregation output to ONE file,
    * and a one-file artifact makes every downstream self-join read one
    * partition — the whole pair-verify then runs single-threaded (measured
    * 12×: q_dedup_embed 1.4 s cached → 16.6 s over the coalesced
    * artifact). A production artifact is many files naturally; writing at
    * session parallelism mirrors that layout instead of silently
    * serializing the readers. */
  def write(spark: SparkSession, documents: DataFrame, dir: String): Unit = {
    val n = spark.sparkContext.defaultParallelism
    Embedder.bucketHistogram(documents, carry = Seq("lang"))
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/hist")
    spark.read.parquet(s"$dir/hist")
      .groupBy("doc_id")
      .agg(collect_list(struct(col("bucket"), col("cnt"))).as("bc"))
      .select(col("doc_id"),
        graft.functions.VecExprs.sparseToDense(col("bc"), Embedder.Dim).as("embedding"))
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/emb")
  }

  def readHist(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/hist")

  def readEmb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/emb")

  private def ensured(spark: SparkSession, documents: DataFrame, sfDir: String): String = {
    val dir = dirFor(sfDir)
    built.onceIfAbsent(dir) {
      write(spark, documents, dir)
    }
    dir
  }

  /** Build-once-per-run + sparse read — the outlier-family entry point. */
  def ensureHist(spark: SparkSession, documents: DataFrame, sfDir: String): DataFrame =
    readHist(spark, ensured(spark, documents, sfDir))

  /** Build-once-per-run + dense read — the cosine-family entry point. */
  def ensureEmb(spark: SparkSession, documents: DataFrame, sfDir: String): DataFrame =
    readEmb(spark, ensured(spark, documents, sfDir))

  /** Persisted balanced sign-LSH bit thresholds (j, t) for an `nBits`
    * hyperplane layout — the corpus statistic
    * [[graft.operators.Dedup.balancedThresholds]] derives, stored BESIDE
    * the embedding artifact (round-8 verdict #3: recomputing them per
    * query was a full posexplode histogram pass over n×nBits
    * projections). Built on demand per (artifact, nBits), once per JVM;
    * single file on purpose — nBits rows that feed a broadcast array, not
    * a parallel reader. */
  def ensureThresholds(spark: SparkSession, documents: DataFrame,
                       sfDir: String, nBits: Int): DataFrame = {
    val dir = ensured(spark, documents, sfDir)
    val p = s"$dir/lshth$nBits"
    built.onceIfAbsent(p) {
      import graft.functions.VecExprs.dotc
      val e = readEmb(spark, dir)
        .withColumn("nrm", sqrt(dotc(col("embedding"), col("embedding"))))
      graft.operators.Dedup.balancedThresholds(e, nBits)
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(p)
    }
    spark.read.parquet(p)
  }

  /** Unconditional rebuild + dense read-back — the bench entry that PRICES
    * the embed pass (q_embed_artifact), so the fast read-side consumers
    * never hide the ingest cost. */
  def rebuild(spark: SparkSession, documents: DataFrame, sfDir: String): DataFrame = {
    val dir = dirFor(sfDir)
    built.always(dir) {
      write(spark, documents, dir)
    }
    readEmb(spark, dir)
  }

  /** Unconditional rebuild + per-doc INTEGER digest of the sparse relation
    * (nnz, token total, first/second moments over (bucket, cnt)) — the
    * driver-gate form of [[rebuild]]: the external comparator is
    * scalar-only (it cannot hash array cells), so the gated entry prices
    * the identical build but projects an exact integer witness instead of
    * the raw `array<double>` column. */
  def rebuildDigest(spark: SparkSession, documents: DataFrame, sfDir: String): DataFrame = {
    rebuild(spark, documents, sfDir)
    readHist(spark, dirFor(sfDir))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("nnz"),
        sum("cnt").as("total_cnt"),
        sum(col("bucket") * col("cnt")).as("dot_digest"),
        sum(col("cnt") * col("cnt")).as("sq_digest"))
      .orderBy("doc_id")
  }
}
