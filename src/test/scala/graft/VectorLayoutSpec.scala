package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{KMeans, Knn}
import graft.sources.VectorLayout

/** Persisted trained-IVF layout: the stored artifact must return the
  * identical ranking to the in-memory trained path, and the probe must
  * actually prune at the partition level (the point of the layout). */
class VectorLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, TestSpark.sf)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_vlayout").toString
    VectorLayout.write(spark, emb, d, numCentroids = 8, iters = 2)
    d
  }

  test("persisted-layout search returns the identical ranking to the in-memory trained path") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val viaLayout = VectorLayout.search(spark, dir, q, k = 10, nprobe = 3,
      excludeId = Some(0L)).collect().map(_.toString).toSeq
    val memory = Knn.topKIvfWith(emb, KMeans.train(emb, k = 8, iters = 2), q,
      k = 10, nprobe = 3, excludeId = Some(0L))
    val viaMemory = memory.collect().map(_.toString).toSeq
    assert(viaLayout == viaMemory)
    // schema parity too: the partition-column read infers cluster as INT
    // unless the projection restores the LongType contract
    assert(VectorLayout.search(spark, dir, q, k = 10, nprobe = 3,
      excludeId = Some(0L)).schema == memory.schema)
  }

  test("probe scan carries a static PartitionFilter on cluster (file-level pruning)") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val plan = VectorLayout.search(spark, dir, q, k = 10, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      s"expected a cluster PartitionFilter in:\n$plan")
  }

  test("stored centroids round-trip exactly (the artifact IS the truth the search reads)") {
    val stored = spark.read.parquet(s"$dir/centroids")
      .orderBy("cid").collect().map(_.toString).toSeq
    val trained = KMeans.train(emb, k = 8, iters = 2)
      .orderBy("cid").collect().map(_.toString).toSeq
    assert(stored == trained)
  }
}
