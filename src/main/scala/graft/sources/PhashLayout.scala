package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.operators.Multimodal

/** Persisted perceptual-signature artifact: (doc_id, phash, plen), one row
  * per payload ([[Multimodal.phashSignatures]]). Same production shape as
  * [[EmbedLayout]] — a deployment signs each asset once at ingest (the
  * signature is 64 bits + a length; the payload itself can be cold
  * storage), and every perceptual-dedup report reads the signature
  * relation. Freshness/caching contracts are [[PairsLayout]]'s. */
object PhashLayout {

  private val built = new BuildLatch

  /** Width (block rows) is part of the artifact key: a deployment that
    * re-signs at blockhash-128/256 when a length bucket approaches ~4M
    * docs (the 64-bit occupancy ceiling, SCALE.md) keeps both artifacts
    * addressable during the migration. */
  def dirFor(sfDir: String, width: Int = 64): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|phash|$width".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"out/artifacts/phash-$h"
  }

  /** Repartitioned to session parallelism before the write — a one-file
    * artifact serializes the downstream band self-join (the EmbedLayout
    * write contract; measured 3× on q_phash_dedup). */
  def write(spark: SparkSession, documents: DataFrame, dir: String,
            width: Int = 64): Unit =
    Multimodal.phashSignatures(documents, width)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/sig")

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/sig")

  def ensure(spark: SparkSession, documents: DataFrame, sfDir: String,
             width: Int = 64): DataFrame = {
    val dir = dirFor(sfDir, width)
    built.onceIfAbsent(dir) {
      write(spark, documents, dir, width)
    }
    read(spark, dir)
  }

  /** Unconditional rebuild + read-back — the pricing entry
    * (q_phash_artifact). */
  def rebuild(spark: SparkSession, documents: DataFrame, sfDir: String,
              width: Int = 64): DataFrame = {
    val dir = dirFor(sfDir, width)
    built.always(dir) {
      write(spark, documents, dir, width)
    }
    read(spark, dir)
  }
}
