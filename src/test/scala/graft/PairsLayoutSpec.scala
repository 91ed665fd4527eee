package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.sources.PairsLayout

/** The persisted near-dup pair artifact must be indistinguishable from the
  * recompute pipeline: identical pair set, and every OfPairs report over
  * the artifact identical to its recompute facade (round-6 verdict #1's
  * equivalence requirement). */
class PairsLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, TestSpark.sf)
  private val threshold = 0.5 // sf0.001 has few 0.8-pairs; 0.5 exercises more graph

  private lazy val artifact = {
    val p = PairsLayout.ensure(spark, docs, TestSpark.sf, threshold)
    spark.sharedState.cacheManager.clearCache() // release the build's scratch
    p
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("artifact pair set == recompute pair set") {
    val stored = rows(artifact.orderBy("d1", "d2"))
    val fresh = rows(Dedup.nearDupPairs(docs, threshold).orderBy("d1", "d2"))
    spark.sharedState.cacheManager.clearCache()
    assert(stored.nonEmpty, "fixture produced no pairs — threshold too high for the spec to prove anything")
    assert(stored == fresh)
  }

  test("degree report over the artifact == recompute facade") {
    val a = rows(Dedup.degreeOfPairs(artifact))
    val b = rows(Dedup.dupDegree(docs, threshold))
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
  }

  test("triangle census over the artifact == recompute facade") {
    val a = rows(Dedup.trianglesOfPairs(artifact))
    val b = rows(Dedup.dupTriangles(docs, threshold))
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
  }

  test("pagerank over the artifact == recompute facade") {
    val a = rows(Dedup.pagerankOfPairs(artifact))
    val b = rows(Dedup.dupPagerank(docs, threshold))
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
  }

  test("clusters over the artifact == recompute facade") {
    val a = rows(Dedup.clustersOfPairs(artifact))
    val b = rows(Dedup.clusters(docs, threshold))
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
  }

  test("leakage split over the artifact == recompute facade") {
    val a = rows(Dedup.leakageSplitOfPairs(docs, artifact))
    val b = rows(Dedup.leakageSplit(docs, threshold))
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
  }

  test("incremental upsert ≡ full rebuild on the unioned corpus") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_pairs_incr").toString
    try {
      val old = docs.filter(col("doc_id") % 10 =!= 7)
      val batch = docs.filter(col("doc_id") % 10 === 7)
      PairsLayout.write(spark, old, dir, threshold)
      PairsLayout.upsert(spark, dir, batch, old, threshold)
      spark.sharedState.cacheManager.clearCache()
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("d1", "d2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val incr = pairs(PairsLayout.read(spark, dir))
      val full = pairs(Dedup.nearDupPairs(docs, threshold))
      spark.sharedState.cacheManager.clearCache()
      // vacuity guard: the fixture must have pairs touching the batch
      // slice, or the test proves only the base build
      assert(full.exists(p => p._1 % 10 == 7 || p._2 % 10 == 7),
        "fixture vacuous: no near-dup pair touches the batch slice")
      assert(incr == full)
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("-With facades return every cache they create (library lifecycle)") {
    for ((label, mk) <- Seq[(String, () => (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]))](
        ("dupDegreeWith", () => Dedup.dupDegreeWith(docs, threshold)),
        ("dupTrianglesWith", () => Dedup.dupTrianglesWith(docs, threshold)),
        ("dupPagerankWith", () => Dedup.dupPagerankWith(docs, threshold)),
        ("leakageSplitWith", () => Dedup.leakageSplitWith(docs, threshold)))) {
      spark.sharedState.cacheManager.clearCache()
      val (out, handles) = mk()
      out.collect()
      handles.foreach(_.unpersist(blocking = true))
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$label leaked a cache entry after releasing its handles")
    }
  }
}
