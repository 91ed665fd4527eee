package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VecExprs.dotc
import graft.operators.{KMeans, Knn}

/** Persisted trained-IVF vector index — the production seam the trainer
  * feeds: [[KMeans.train]] once per corpus snapshot, write the centroid
  * table beside the cells PARTITIONED BY cluster, and probe with static
  * partition pruning so an nprobe-of-C query reads nprobe/C of the files.
  * This is the artifact [[Knn.topKIvf]]'s scaladoc promises ("a deployment
  * runs this offline and writes the result partitionBy(cluster)"), with
  * the trained centroids persisted so queries never re-derive them —
  * before this seam, [[Knn.topKIvfWith]] retrained per query.
  *
  * Scale shape: `write` is the offline job (T training scans + one layout
  * write); `search` reads the k-row centroid table, ranks it against the
  * query (driver-side collect of nprobe cluster ids — facade-surface
  * collect, k-bounded by construction, the [[graft.Graft]] tolerance), and
  * scans ONLY the probed partitions: the `isin` filter on the partition
  * column is STATIC pruning, visible as `PartitionFilters` in the scan
  * node (spec-asserted), so file-level skipping grows with the corpus
  * while probe cost stays ~nprobe/C of it.
  *
  * Float discipline: centroids round-trip through parquet doubles
  * (lossless), and `search` evaluates the same raw-cosine tree as
  * [[Knn.topKIvfWith]] — spec-proven to return the identical ranking to
  * the in-memory trained path. */
object VectorLayout {

  /** Train and persist: `$dir/centroids` (cid, ce, cn) and `$dir/cells`
    * (vec_id, label, ed, nrm, cluster=partition). */
  def write(spark: SparkSession, index: DataFrame, dir: String,
            numCentroids: Int = 16, iters: Int = 3): Unit = {
    KMeans.train(index, numCentroids, iters)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    // assign against the PERSISTED centroids — the stored artifact is the
    // single source of truth; an in-memory copy could drift from what a
    // later search reads
    val cent = spark.read.parquet(s"$dir/centroids")
    Knn.ivfAssignWith(index, cent)
      .write.mode(SaveMode.Overwrite).partitionBy("cluster")
      .parquet(s"$dir/cells")
  }

  /** Probe the persisted layout: rank the stored centroids against the
    * query, statically prune to the top-`nprobe` cells, exact-rank within
    * them. Output matches [[Knn.topKIvfWith]]: (vec_id, label, cluster,
    * sim). */
  def search(spark: SparkSession, dir: String, queryVec: DataFrame, k: Int,
             nprobe: Int = 4, excludeId: Option[Long] = None): DataFrame = {
    val cent = spark.read.parquet(s"$dir/centroids")
    val q = queryVec.select(col("qv").cast("array<double>").as("qe"))
      .withColumn("qn", sqrt(dotc(col("qe"), col("qe"))))
    val probeIds = cent.crossJoin(broadcast(q))
      .withColumn("qsim", dotc(col("ce"), col("qe")) / (col("cn") * col("qn")))
      .orderBy(desc("qsim"), asc("cid"))
      .limit(nprobe)
      .select("cid")
      .collect().map(_.getLong(0)).toSeq
    val cells = spark.read.parquet(s"$dir/cells")
      .filter(col("cluster").isin(probeIds: _*))
    val candidates = excludeId
      .map(id => cells.filter(col("vec_id") =!= id)).getOrElse(cells)
    candidates
      .crossJoin(broadcast(q))
      .withColumn("sim_raw", dotc(col("ed"), col("qe")) / (col("nrm") * col("qn")))
      .orderBy(desc("sim_raw"), asc("vec_id"))
      .limit(k)
      // cluster comes back as a PARTITION column, which Spark's directory
      // inference types IntegerType — cast restores the LongType contract
      // shared with Knn.topKIvfWith (review finding: a union of the two
      // paths' outputs would otherwise fail analysis)
      .select(col("vec_id"), col("label"), col("cluster").cast("long").as("cluster"),
        round(col("sim_raw"), 6).as("sim"))
  }
}
