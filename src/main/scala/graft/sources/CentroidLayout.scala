package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persisted TRAINED-centroid artifacts — Lloyd training amortized across
  * every trained-path query (round-6 ADVICE #3 / round-7 verdict #5, done
  * now that the artifact pattern is proven by [[PairsLayout]] /
  * [[EmbedLayout]]): `train` (k-means centroids (cid, ce, cn)) and `pq`
  * (per-subspace PQ codebooks (sub, cid, ce)) each run ONCE per corpus
  * snapshot and land as k-row / m·k-row parquet relations every consumer
  * reads. A deployment trains offline on a schedule ([[VectorLayout]]'s
  * `stats` is the retrain trigger); re-training inside every query priced
  * the trainer per execution — honest for the gate, wrong for production.
  *
  * Exactness: training ends in decimal-sum → double divisions, and double
  * arrays round-trip parquet bit-exactly, so stored ≡ in-memory training
  * (spec-pinned in KMeansSpec) and every oracle — which re-trains in SQL —
  * is unaffected.
  *
  * Freshness and caching contracts are [[PairsLayout]]'s: rebuild on first
  * touch per JVM; reads uncached (k-row relations — their consumers
  * broadcast them by construction). */
object CentroidLayout {

  private val built = new BuildLatch

  def dirFor(sfDir: String, kind: String, params: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|$kind|$params".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"out/artifacts/cent-$kind-$h"
  }

  /** Build-once-per-run k-means centroids ([[graft.operators.KMeans.train]]
    * contract: (cid, ce, cn)). */
  def ensureTrain(spark: SparkSession, index: DataFrame, sfDir: String,
                  k: Int = 16, iters: Int = 3): DataFrame = {
    val dir = dirFor(sfDir, "train", s"$k|$iters")
    built.onceIfAbsent(dir) {
      graft.operators.KMeans.train(index, k, iters)
        .write.mode(SaveMode.Overwrite).parquet(dir)
    }
    spark.read.parquet(dir)
  }

  /** Unconditional retrain + read-back — the pricing entry (q_kmeans). */
  def rebuildTrain(spark: SparkSession, index: DataFrame, sfDir: String,
                   k: Int = 16, iters: Int = 3): DataFrame = {
    val dir = dirFor(sfDir, "train", s"$k|$iters")
    built.always(dir) {
      graft.operators.KMeans.train(index, k, iters)
        .write.mode(SaveMode.Overwrite).parquet(dir)
    }
    spark.read.parquet(dir)
  }

  /** Build-once-per-run PQ codebooks ([[graft.operators.KMeans.trainPq]]
    * contract: (sub, cid, ce)). */
  def ensurePq(spark: SparkSession, index: DataFrame, sfDir: String,
               m: Int = 8, dsub: Int = 8, k: Int = 16, iters: Int = 3): DataFrame = {
    val dir = dirFor(sfDir, "pq", s"$m|$dsub|$k|$iters")
    built.onceIfAbsent(dir) {
      graft.operators.KMeans.trainPq(index, m, dsub, k, iters)
        .write.mode(SaveMode.Overwrite).parquet(dir)
    }
    spark.read.parquet(dir)
  }
}
