package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{KMeans, Knn}

/** Lloyd k-means trainer properties on sf0.001 (see KMeans scaladoc):
  * objective monotonicity, structural contract, and trained-layout
  * drop-in equivalence under exhaustive probing. */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, TestSpark.sf)

  /** Σ over cells of n_vecs · mean_csim — the spherical k-means objective
    * (total member→centroid cosine), reconstructed from the stats report. */
  private def objective(stats: org.apache.spark.sql.DataFrame): Double =
    stats.select(sum(col("n_vecs").cast("double") * col("mean_csim")))
      .collect()(0).getDouble(0)

  test("Lloyd rounds are monotone in the spherical objective (0 -> 1 -> 3 iters)") {
    val e = emb
    val o0 = objective(KMeans.stats(e, KMeans.train(e, k = 8, iters = 0)))
    val o1 = objective(KMeans.stats(e, KMeans.train(e, k = 8, iters = 1)))
    val o3 = objective(KMeans.stats(e, KMeans.train(e, k = 8, iters = 3)))
    // each assignment+mean-update round cannot decrease total cosine; the
    // 6-decimal rounding in the report bounds the tolerance
    assert(o1 >= o0 - 1e-4, s"round 1 decreased the objective: $o0 -> $o1")
    assert(o3 >= o1 - 1e-4, s"round 3 decreased the objective: $o1 -> $o3")
  }

  test("trained centroid relation keeps the (cid, ce, cn) contract: k rows, ids stable, norms positive") {
    val cent = KMeans.train(emb, k = 8, iters = 2).collect()
    assert(cent.length == 8)
    assert(cent.map(_.getAs[Long]("cid")).sorted.toSeq == (0L until 8L))
    assert(cent.forall(_.getAs[Double]("cn") > 0.0))
    assert(cent.forall(_.getAs[scala.collection.Seq[Double]]("ce").length == 64))
  }

  test("CentroidLayout stored artifacts ≡ in-memory training, bit-exactly (k-means AND PQ)") {
    // decimal-sum → double means round-trip parquet exactly, so the
    // persisted trained layout is indistinguishable from retraining —
    // the invariant that lets every trained-path query read the artifact
    val e = emb
    def keyed(rows: Array[org.apache.spark.sql.Row], key: org.apache.spark.sql.Row => String) =
      rows.map(r => key(r) -> r.toString).sortBy(_._1).toSeq
    val memT = keyed(KMeans.train(e, k = 16, iters = 3).collect(),
      _.getAs[Long]("cid").toString)
    val artT = keyed(graft.sources.CentroidLayout
      .ensureTrain(spark, e, TestSpark.sf, k = 16, iters = 3).collect(),
      _.getAs[Long]("cid").toString)
    assert(artT == memT)
    val memP = keyed(KMeans.trainPq(e, m = 8, dsub = 8, k = 16, iters = 3).collect(),
      r => s"${r.getAs[Int]("sub")}|${r.getAs[Long]("cid")}")
    val artP = keyed(graft.sources.CentroidLayout
      .ensurePq(spark, e, TestSpark.sf, m = 8, dsub = 8, k = 16, iters = 3).collect(),
      r => s"${r.getAs[Int]("sub")}|${r.getAs[Long]("cid")}")
    assert(artP == memP)
  }

  test("trained PQ codebook keeps the (sub, cid, ce) contract: m·k rows of dsub-length entries") {
    val cent = KMeans.trainPq(emb, m = 8, dsub = 8, k = 8, iters = 2).collect()
    assert(cent.length == 8 * 8)
    assert(cent.forall(_.getAs[scala.collection.Seq[Double]]("ce").length == 8))
    val perSub = cent.groupBy(_.getAs[Int]("sub")).view.mapValues(_.length).toMap
    assert(perSub.values.forall(_ == 8) && perSub.keySet == (0 until 8).toSet)
  }

  test("trained PQ with a saturating candidate pool reproduces exact top-k") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val exact = Knn.topK(emb, q, 10, excludeId = Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    // candMultiple large enough that the ADC pool covers the whole corpus:
    // approximation then bounds candidate loss only, so the exact re-rank
    // must recover the exact ranking bit-for-bit
    val viaPq = Knn.topKPqTrained(emb, q, k = 10, iters = 2,
      candMultiple = 200, excludeId = Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(viaPq == exact)
  }

  test("trained IVF with exhaustive probes reproduces exact top-k (drop-in contract)") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val exact = Knn.topK(emb, q, 10, excludeId = Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val cent = KMeans.train(emb, k = 8, iters = 2)
    val trained = Knn.topKIvfWith(emb, cent, q, k = 10, nprobe = 8, excludeId = Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(trained == exact,
      "probing every trained cell must recover the exact ranking")
  }

  test("farthest-first seeds: deterministic, distinct, spread wider than the lowest-id seeds") {
    val s1 = KMeans.seedsFarthest(emb, k = 8).collect().map(_.toString).toSeq
    val s2 = KMeans.seedsFarthest(emb, k = 8).collect().map(_.toString).toSeq
    assert(s1 == s2 && s1.length == 8)
    // seed contract: cids are 0..k-1 in pick order
    val cids = KMeans.seedsFarthest(emb, k = 8).select("cid")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(cids == (0L until 8L))
    // the spread property the traversal exists for: the max pairwise
    // cosine among farthest-first seeds is lower than among the first-k
    // baseline seeds (seeds are spread out, not adjacent ids)
    def maxPairSim(cent: org.apache.spark.sql.DataFrame): Double = {
      val a = cent.select(col("cid").as("i"), col("ce").as("ea"), col("cn").as("na"))
      val b = cent.select(col("cid").as("j"), col("ce").as("eb"), col("cn").as("nb"))
      a.crossJoin(b).filter(col("i") < col("j"))
        .select(max(graft.functions.VecExprs.dotc(col("ea"), col("eb"))
          / (col("na") * col("nb"))).as("m"))
        .head().getDouble(0)
    }
    val baseline = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("ce"))
      .withColumn("cn", sqrt(graft.functions.VecExprs.dotc(col("ce"), col("ce"))))
    assert(maxPairSim(KMeans.seedsFarthest(emb, k = 8)) < maxPairSim(baseline))
    // and the full trained run stays a valid centroid relation
    val cent = KMeans.trainFarthest(emb, k = 8, iters = 2)
    assert(cent.count() == 8)
  }
}
