package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text primitives shared by the dedup / text-analysis
  * operators, each with its exact DuckDB mirror for the oracle.
  *
  * Everything reduces to integer counts and md5 strings, so Spark and the
  * oracle agree bit-for-bit (no float tokenizer ambiguity anywhere).
  *
  * Capability family mandated by BASELINE.json ("dedup, similarity search,
  * text analysis" extensions); the reference's own text handling is the
  * chunker/enumerate surface (SURVEY.md §2.2).
  */
object TextFns {

  /** Lowercase word tokens: non-alphanumeric runs collapse to a single
    * separator; empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(regexp_replace(lower(text), "[^a-z0-9]+", " "), " "), t => t =!= "")

  def duckTokens(text: String): String =
    s"list_filter(string_split(regexp_replace(lower($text), '[^a-z0-9]+', ' ', 'g'), ' '), t -> t <> '')"

  /** Word n-gram shingles (space-joined). Empty when fewer than n tokens —
    * guarded because Spark's `sequence` would generate a DESCENDING range
    * for start > stop while DuckDB's generate_series returns empty. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    ).otherwise(array().cast("array<string>"))

  def duckShingles(toks: String, n: Int): String = {
    val parts = (0 until n).map(j => s"($toks)[i + $j]").mkString(" || ' ' || ")
    s"CASE WHEN len($toks) >= $n THEN list_transform(generate_series(1, len($toks) - ${n - 1}), i -> $parts) ELSE [] END"
  }

  /** MinHash value for one seed: min over shingles of md5("seed:shingle").
    * Aggregation-side: `min(md5(concat('s:', shingle)))` per doc. */
  def minhashCol(shingle: Column, seed: Int): Column =
    md5(concat(lit(s"$seed:"), shingle))

  def duckMinhash(shingle: String, seed: Int): String =
    s"md5('$seed:' || $shingle)"

  /** 16-bit SimHash from the high bit of each md5 hex nibble of each token:
    * bit i set iff sum over tokens of (+1 if nibble i ≥ 8 else −1) > 0.
    * Pure string ops — identical in DuckDB.  `bitSums` are the per-token
    * ±1 contributions; aggregate with sum() then [[simhashFromSums]].
    */
  def nibbleHigh(tokenMd5: Column, i: Int): Column =
    when(substring(tokenMd5, i + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)

  def duckNibbleHigh(tokenMd5: String, i: Int): String =
    s"CASE WHEN substr($tokenMd5, ${i + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END"

  /** Assemble the simhash bit string from 16 summed contributions. */
  def simhashFromSums(sums: Seq[Column]): Column =
    concat(sums.map(s => when(s > 0, "1").otherwise("0")): _*)

  def duckSimhashFromSums(sums: Seq[String]): String =
    sums.map(s => s"CASE WHEN $s > 0 THEN '1' ELSE '0' END").mkString("concat(", ", ", ")")
}
