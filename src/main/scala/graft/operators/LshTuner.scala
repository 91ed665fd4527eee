package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytic banding S-curve for the engine's LSH schemes — the planning
  * companion to the EMPIRICAL [[Dedup.dedupRecall]] / [[KnnRecall]]
  * measurements: P(candidate | per-row agreement probability s) =
  * 1 − (1 − s^r)^b for a (b bands × r rows) scheme. For minhash, s is the
  * pair's Jaccard similarity (per-hash collision probability); for banded
  * sign-LSH, s is the per-bit agreement probability 1 − θ/π. A deployment
  * reads the curve to pick (b, r) for a target threshold BEFORE paying for
  * an empirical recall run on a sample — the two queries answer
  * "what should the scheme catch?" and "what did it catch?" respectively,
  * and SCALE.md's banded-LSH table shows them agreeing (analytic 0.88 vs
  * measured 0.925 at the 4×16 default).
  *
  * Float discipline: `pow()` is NOT correctly rounded and differs between
  * java.lang.Math and libm — so the curve is built from literal
  * multiplication chains (s^r and (1−s^r)^b as left-associated products,
  * identical expression trees in both engines) over an integer grid
  * s = i/20. No data tables are read; the plan is a 19-row range cross a
  * 2-row config list.
  */
object LshTuner {

  /** The engine's band geometries: ([[Dedup.minhash]] 8 seeds → 4 bands × 2
    * rows; [[Knn.topKLshBanded]] 16 tables × 4 bits). */
  private val Schemes = Seq(("minhash_4x2", 4, 2), ("signlsh_16x4", 16, 4))

  def sCurve(spark: SparkSession): DataFrame = {
    val grid = spark.range(1, 20).select(col("id").cast("int").as("i"))
    Schemes.map { case (name, b, r) =>
      val s = col("i").cast("double") / lit(20.0)
      val sr = Seq.fill(r)(s).reduce(_ * _)
      val q = lit(1.0) - sr
      val qb = Seq.fill(b)(q).reduce(_ * _)
      grid.select(
        lit(name).as("scheme"),
        lit(b).as("bands"),
        lit(r).as("rows_per_band"),
        round(s, 6).as("s"),
        round(lit(1.0) - qb, 6).as("p_detect"))
    }.reduce(_ unionByName _).orderBy("scheme", "s")
  }

  /** DuckDB mirror — the same literal product chains over the same grid. */
  def duckSCurveSql: String = {
    val branches = Schemes.map { case (name, b, r) =>
      val sr = Seq.fill(r)("s").reduce((a, c) => s"($a * $c)")
      val q = s"(1.0 - $sr)"
      val qb = Seq.fill(b)(q).reduce((a, c) => s"($a * $c)")
      s"""SELECT '$name' AS scheme, $b::INTEGER AS bands, $r::INTEGER AS rows_per_band,
         |       round(s, 6) AS s, round(1.0 - $qb, 6) AS p_detect FROM g""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH grid AS (SELECT unnest(generate_series(1, 19)) AS i),
       |g AS (SELECT i, i::DOUBLE / 20.0 AS s FROM grid)
       |$branches
       |ORDER BY scheme, s""".stripMargin
  }
}
