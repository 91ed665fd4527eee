package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, Dedup, Multimodal}
import graft.sources.{EmbedLayout, PhashLayout}

/** The persisted per-doc embedding / perceptual-signature artifacts must be
  * indistinguishable from the in-query recompute pipelines (round-7
  * verdict #1's equivalence requirement — the PairsLayoutSpec contract
  * applied to the round-8 artifacts). */
class ArtifactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, TestSpark.sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("embed artifact: dense relation == in-memory Embedder.embed") {
    val art = rows(EmbedLayout.ensureEmb(spark, docs, TestSpark.sf).orderBy("doc_id"))
    val mem = rows(graft.functions.Embedder.embed(docs).orderBy("doc_id"))
    spark.sharedState.cacheManager.clearCache()
    assert(art.nonEmpty && art == mem)
  }

  test("cosine dedup over the artifact == recompute facade") {
    val a = rows(Dedup.embedCosineOf(
      EmbedLayout.ensureEmb(spark, docs, TestSpark.sf), threshold = 0.8))
    val b = rows(Dedup.embedCosine(docs, threshold = 0.8))
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
    val aa = rows(Dedup.embedCosineAdaptiveOf(
      EmbedLayout.ensureEmb(spark, docs, TestSpark.sf), threshold = 0.8))
    val bb = rows(Dedup.embedCosineAdaptive(docs, threshold = 0.8))
    spark.sharedState.cacheManager.clearCache()
    assert(aa == bb)
  }

  test("stored LSH thresholds == per-query recompute; dedup over them == recompute path") {
    import graft.functions.VecExprs.dotc
    val stored = EmbedLayout.ensureThresholds(spark, docs, TestSpark.sf, nBits = 128)
      .orderBy("j")
    val e = EmbedLayout.ensureEmb(spark, docs, TestSpark.sf)
      .withColumn("nrm", sqrt(dotc(col("embedding"), col("embedding"))))
    val fresh = Dedup.balancedThresholds(e, nBits = 128).orderBy("j")
    val a = rows(stored)
    val b = rows(fresh)
    spark.sharedState.cacheManager.clearCache()
    assert(a.size == 128, s"expected 128 thresholds, got ${a.size}")
    assert(a == b)
    // and the full dedup queries agree whether thresholds are stored or derived
    val emb = EmbedLayout.ensureEmb(spark, docs, TestSpark.sf)
    val thr = EmbedLayout.ensureThresholds(spark, docs, TestSpark.sf, nBits = 128)
    val withStored = rows(Dedup.embedCosineOf(emb, threshold = 0.8, thresholds = Some(thr)))
    val withFresh = rows(Dedup.embedCosineOf(emb, threshold = 0.8))
    spark.sharedState.cacheManager.clearCache()
    assert(withStored == withFresh)
  }

  test("outlier report over the hist artifact == recompute facade") {
    val a = rows(CorpusOps.embeddingOutliersOf(
      EmbedLayout.ensureHist(spark, docs, TestSpark.sf), k = 5))
    val b = rows(CorpusOps.embeddingOutliers(docs, k = 5))
    spark.sharedState.cacheManager.clearCache()
    assert(a.nonEmpty && a == b)
  }

  test("phash artifact: signature relation == in-memory phashSignatures; dedup over it == facade") {
    val art = rows(PhashLayout.ensure(spark, docs, TestSpark.sf).orderBy("doc_id"))
    val mem = rows(Multimodal.phashSignatures(docs).orderBy("doc_id"))
    assert(art.nonEmpty && art == mem)
    val a = rows(Multimodal.phashDedupOf(PhashLayout.ensure(spark, docs, TestSpark.sf)))
    val b = rows(Multimodal.phashDedup(docs))
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
  }

  test("NB model artifact: stored sufficient statistics == in-plan model; scoring over it == batch classifier") {
    import graft.operators.TextAnalysis
    import graft.sources.NbLayout
    val (stA, clA) = NbLayout.ensureModel(spark, docs, TestSpark.sf, testMod = 5, buckets = 1024)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val (stB, clB) = TextAnalysis.nbModel(
      TextAnalysis.nbFeatRows(train, 1024), train)
    assert(rows(stA.orderBy("cls", "b")) == rows(stB.orderBy("cls", "b")))
    assert(rows(clA.orderBy("cls")) == rows(clB.orderBy("cls")))
    val viaStore = rows(TextAnalysis.nbScore(
      TextAnalysis.nbFeatRows(docs.filter(col("doc_id") % 5 === 0), 1024),
      stA, clA, 1024))
    val batch = rows(TextAnalysis.nbClassify(docs))
    spark.sharedState.cacheManager.clearCache()
    assert(viaStore.nonEmpty && viaStore == batch)
  }

  test("NB upsert: count merge == full retrain; batch replay merges nothing twice") {
    import graft.sources.NbLayout
    import java.nio.file.{Files => JF}
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val base = train.filter(col("doc_id") % 3 =!= 1)
    val delta = train.filter(col("doc_id") % 3 === 1)
    val incDir = JF.createTempDirectory("graft_nb_inc").toString
    val fullDir = JF.createTempDirectory("graft_nb_full").toString
    // write()'s internal testMod filter is a no-op on already-train-side rows
    NbLayout.write(spark, base, incDir, testMod = 5, buckets = 1024)
    NbLayout.upsert(spark, delta, incDir, buckets = 1024, batchId = "b1")
    NbLayout.write(spark, train, fullDir, testMod = 5, buckets = 1024)
    def cnt(d: String) = rows(NbLayout.readCounts(spark, d).orderBy("cls", "b"))
    def nds(d: String) = rows(NbLayout.readDocs(spark, d).orderBy("cls"))
    assert(cnt(incDir).nonEmpty && cnt(incDir) == cnt(fullDir))
    assert(nds(incDir) == nds(fullDir))
    // at-least-once replay: the marker short-circuits the second merge
    NbLayout.upsert(spark, delta, incDir, buckets = 1024, batchId = "b1")
    assert(cnt(incDir) == cnt(fullDir) && nds(incDir) == nds(fullDir))
  }
}
