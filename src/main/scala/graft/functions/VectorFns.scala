package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType columns as pure higher-order-function
  * expressions — everything stays inside Catalyst/whole-stage-codegen and is
  * reproducible 1:1 in the DuckDB oracle (`list_transform`/`list_sum`).
  *
  * Capability mirrored from the reference's vector search core
  * (/root/reference/coding_agent/tools/vector_search_tool.py:42-63 — ANN
  * distance ranking), re-expressed as exact distributed computation; see
  * SURVEY.md §1.3 for the metric decision (cosine, not Chroma's 1−L2²).
  *
  * All arithmetic is done in DOUBLE regardless of the storage type (testdata
  * embeddings are float32) so Spark and the oracle agree bit-for-bit modulo
  * final rounding.
  */
object VectorFns {

  /** Elementwise-product sum in double precision, sequential accumulation.
    * Codegen'd (see [[VecExprs.DotProduct]]); `dotHof` is the interpreted
    * HOF formulation kept for cross-checking the custom expression. */
  def dot(a: Column, b: Column): Column = VecExprs.dotc(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; assumes non-zero vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sign-bit bucket over the first `bits` dimensions (1-indexed like
    * DuckDB lists): "1011…" string. A deterministic SimHash-family LSH key —
    * vectors in the same bucket are candidate near-neighbors, so a
    * bucket-equijoin replaces the all-pairs cross join at scale.
    */
  def signBucket(emb: Column, bits: Int): Column = signBucketAt(emb, 0, bits)

  /** [[signBucket]] over dimensions [offset+1, offset+bits] — one hash
    * table of a banded multi-table LSH family: table t reads its own
    * disjoint dimension band, so the L tables are independent sign-LSH
    * keys over (approximately) independent coordinates. Sign bits ARE the
    * hash bits here, so disjoint bands play the role L independent random
    * hyperplane sets play in the classical construction — without a
    * per-table projection matrix to mirror into the oracle. */
  def signBucketAt(emb: Column, offset: Int, bits: Int): Column =
    concat((offset + 1 to offset + bits).map(i =>
      when(element_at(emb, i) > 0f, "1").otherwise("0")): _*)

  /** DuckDB oracle fragment: dot product of two list expressions in DOUBLE,
    * sequential accumulation, 1-indexed — mirrors [[dot]] exactly. */
  def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> (($a)[i]::DOUBLE) * (($b)[i]::DOUBLE)))"

  def duckNorm(a: String): String = s"sqrt(${duckDot(a, a)})"

  def duckCosine(a: String, b: String): String =
    s"(${duckDot(a, b)} / (${duckNorm(a)} * ${duckNorm(b)}))"

  def duckSignBucket(emb: String, bits: Int): String = duckSignBucketAt(emb, 0, bits)

  def duckSignBucketAt(emb: String, offset: Int, bits: Int): String =
    (offset + 1 to offset + bits).map(i =>
      s"CASE WHEN ($emb)[$i] > 0 THEN '1' ELSE '0' END").mkString("concat(", ", ", ")")

  /** DuckDB oracle fragment: the SQ8 code-book CTEs mirroring
    * [[graft.operators.Knn.sq8Scales]]/`sq8Codes` — per-dim scale
    * `127/max|v_d|` (0 for a dead dim), codes `floor(v·scale)` in row form
    * (vec_id, d, c), and per-vector code norms. All sums are over
    * integer-valued doubles, so accumulation order cannot matter — the
    * property that lets the approximate ranking be oracle-compared at all.
    * Literals are ::DOUBLE-forced (DuckDB types bare decimals as DECIMAL
    * and would run decimal arithmetic where Spark runs double). Emits CTE
    * bodies named `sq8_sc`, `sq8_codes`, `sq8_cn` for interpolation after
    * a `WITH`. */
  def duckSq8Ctes(table: String): String =
    s"""sq8_sc AS (
       |  SELECT d, CASE WHEN mx > 0 THEN 127.0::DOUBLE / mx ELSE 0.0::DOUBLE END AS scale
       |  FROM (SELECT d, max(abs(CAST(embedding[d] AS DOUBLE))) AS mx
       |        FROM $table CROSS JOIN (
       |          SELECT unnest(generate_series(1,
       |            (SELECT len(embedding) FROM $table LIMIT 1))) AS d) dims
       |        GROUP BY d) t),
       |sq8_codes AS (
       |  SELECT vec_id, d, floor(CAST(embedding[d] AS DOUBLE) * scale) AS c
       |  FROM $table CROSS JOIN sq8_sc),
       |sq8_cn AS (SELECT vec_id, sqrt(sum(c*c)) AS cn FROM sq8_codes GROUP BY vec_id)""".stripMargin
}
