package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{VecExprs, VectorFns}

/** The codegen DotProduct must agree exactly with the interpreted HOF
  * formulation (and therefore with the DuckDB oracle's list_transform sum). */
class VecExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("codegen dot == HOF dot, bit-for-bit, on real embeddings") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").limit(200)
    val mismatch = e.select(
        VecExprs.dotc(col("embedding"), col("embedding")).as("a"),
        VectorFns.dotHof(col("embedding"), col("embedding")).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(mismatch == 0)
  }

  test("cosine of a vector with itself is 1 (normalized inputs)") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").limit(50)
    val bad = e.select(VectorFns.cosine(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }

  test("dot handles nulls and empty arrays") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))
    ).toDF("a", "b")
    val rows = df.select(VecExprs.dotc(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("BestCentroid == declarative argmax (window formulation), and ties break low") {
    import spark.implicits._
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").limit(300)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ed"))
      .withColumn("nrm", sqrt(VecExprs.dotc(col("ed"), col("ed"))))
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("ed").as("ce"), col("nrm").as("cn"))
    val centArr = broadcast(cent.agg(collect_list(struct(col("cid"), col("ce"), col("cn"))).as("cents")))
    val viaExpr = e.crossJoin(centArr)
      .select(col("vec_id"), VecExprs.bestCentroid(col("cents"), col("ed"), col("nrm")).as("cluster"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("csim"), asc("cid"))
    val viaWindow = e.crossJoin(cent)
      .withColumn("csim", VecExprs.dotc(col("ed"), col("ce")) / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cluster"))
    assert(viaExpr.join(viaWindow, "vec_id")
      .filter(viaExpr("cluster") =!= viaWindow("cluster")).count() == 0)
    // exact tie between duplicated centroids -> lowest cid wins
    val tied = Seq((Seq(1.0, 0.0), 1.0)).toDF("ed", "nrm")
      .crossJoin(Seq(Seq((5L, Seq(1.0, 0.0), 1.0), (2L, Seq(1.0, 0.0), 1.0)))
        .toDF("cents"))
    assert(tied.select(VecExprs.bestCentroid(col("cents"), col("ed"), col("nrm")))
      .head().getLong(0) == 2L)
  }

  test("RpProject == the literal expression tree it replaced, bit-for-bit") {
    // the round-6 q_knn_rp fix: one codegen node must reproduce the exact
    // left-associated Σ_d v_d·s(j,d) the rdim×dim literal tree computed
    val signs = Array(Array(1.0, -1.0, 1.0), Array(-1.0, -1.0, 1.0))
    val literal = (vec: org.apache.spark.sql.Column) =>
      array(signs.map(row => row.zipWithIndex.map { case (s, d) =>
        element_at(vec, d + 1) * lit(s)
      }.reduce(_ + _)): _*)
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").limit(100)
      .withColumn("ed", col("embedding").cast("array<double>"))
    val mismatch = e.select(
        VecExprs.rpProject(col("ed"), signs).as("a"),
        literal(col("ed")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(mismatch == 0)
    // short input projects its prefix, no crash
    import spark.implicits._
    val short = Seq(Seq(2.0)).toDF("ed")
      .select(VecExprs.rpProject(col("ed"), signs)).head().getSeq[Double](0)
    assert(short == Seq(2.0, -2.0))
  }

  test("interpreted eval (no codegen) matches codegen result") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").limit(50)
      val mismatch = e.select(
          VecExprs.dotc(col("embedding"), col("embedding")).as("a"),
          VectorFns.dotHof(col("embedding"), col("embedding")).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(mismatch == 0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
