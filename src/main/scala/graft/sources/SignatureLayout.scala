package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Persisted MinHash SIGNATURE index — the corpus-side state that makes
  * incremental near-dup maintenance O(batch), round-8 verdict #2. Three
  * parquet relations under a pair-artifact dir:
  *
  *   - `bands`    (doc_id, band, bkey) — the LSH band index the ingest
  *     probe equijoins (new × old candidates);
  *   - `shingles` (doc_id, s)          — the distinct shingle rows the
  *     candidate-first exact-Jaccard verify intersects;
  *   - `sizes`    (doc_id, n)          — per-doc shingle counts for the
  *     Jaccard denominator (persisted so a probe never re-aggregates the
  *     corpus-scale shingle relation per batch).
  *
  * Before this layout existed, [[PairsLayout.upsert]] re-shingled and
  * re-signed the WHOLE corpus on every ingest batch — the one operator
  * that runs most often did O(corpus) work per call. With it, a batch
  * costs one batch-side shingle pass plus joins whose corpus sides are
  * pure parquet reads.
  *
  * All three relations are written REPARTITIONED to session parallelism
  * (the one-file-artifact lesson, [[EmbedLayout.write]]: a coalesced
  * single-file artifact serializes every downstream reader — measured
  * 12×) and read back UNCACHED so parquet stats keep join planning honest
  * at every scale (the round-4 curation lesson). Production layout note:
  * bucketing `shingles` by doc_id and `bands` by bkey
  * ([[IndexBuild.writeBucketed]] precedent) makes probe + verify
  * co-located and corpus-shuffle-free; the plain layout here costs one
  * corpus-side shuffle in the verify join — still ≪ the re-sign it
  * replaces.
  *
  * Append protocol ([[stageAppend]]/[[commitAppend]]): batch deltas are
  * staged to `stage_*` temp dirs by Spark jobs FIRST (the failure-prone
  * part), then committed by cheap per-file renames — so a failed Spark
  * job never leaves a half-appended live relation. The caller
  * ([[PairsLayout.upsert]]) commits pairs LAST: a crash inside the
  * rename window can leave signatures ahead of pairs (a re-run of the
  * batch then re-probes against its own signatures and self-pairs are
  * dropped by the probe's `d1 =!= d2`), never pairs ahead of signatures.
  * A real deployment puts a table format with atomic commit under this
  * seam ([[IndexBuild]] swap scaladoc); the ORDER here is the part that
  * must survive that swap.
  */
object SignatureLayout {

  private val Rels = Seq("bands", "shingles", "sizes")

  /** Overwrite the signature index from a build pass' band + shingle
    * relations (sizes derived here — one aggregate over the cached
    * shingle relation the caller already holds). */
  def write(spark: SparkSession, dir: String,
            bands: DataFrame, shingles: DataFrame): Unit = {
    val n = spark.sparkContext.defaultParallelism
    bands.repartition(n).write.mode(SaveMode.Overwrite).parquet(s"$dir/bands")
    shingles.repartition(n).write.mode(SaveMode.Overwrite).parquet(s"$dir/shingles")
    shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/sizes")
  }

  def readBands(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/bands")
  def readShingles(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/shingles")
  def readSizes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/sizes")

  /** Stage a batch's signature deltas to `stage_*` temp dirs (runs the
    * Spark jobs; commits nothing live). Batch doc_ids must be disjoint
    * from the stored corpus' — the [[PairsLayout.upsert]] ingest
    * contract. */
  def stageAppend(spark: SparkSession, dir: String,
                  bands: DataFrame, shingles: DataFrame): Unit = {
    val n = spark.sparkContext.defaultParallelism
    bands.repartition(n).write.mode(SaveMode.Overwrite).parquet(s"$dir/stage_bands")
    shingles.repartition(n).write.mode(SaveMode.Overwrite).parquet(s"$dir/stage_shingles")
    shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/stage_sizes")
  }

  /** Commit previously staged deltas into the live relations — per-file
    * renames only, no Spark jobs. */
  def commitAppend(spark: SparkSession, dir: String): Unit =
    Rels.foreach(r => moveInto(spark, s"$dir/stage_$r", s"$dir/$r"))

  /** Move every data file of a staged parquet dir into the live dir and
    * drop the stage. File names carry per-job UUIDs so cross-job
    * collisions cannot occur; rename failure is reported by RETURN VALUE
    * (round-4 review lesson), so each one is checked. */
  private[sources] def moveInto(spark: SparkSession, stage: String, live: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(stage)
    val dst = new org.apache.hadoop.fs.Path(live)
    val fs = src.getFileSystem(conf)
    if (!fs.exists(dst)) fs.mkdirs(dst)
    fs.listStatus(src).filter(_.getPath.getName.startsWith("part-")).foreach { f =>
      val to = new org.apache.hadoop.fs.Path(dst, f.getPath.getName)
      if (!fs.rename(f.getPath, to))
        throw new java.io.IOException(s"append commit: rename ${f.getPath} -> $to failed")
    }
    fs.delete(src, true)
  }
}
