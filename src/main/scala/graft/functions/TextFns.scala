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

  /** Scala-side twin of [[tokens]]' emptiness test: true iff `s` yields at
    * least one token. Query-text entry points guard on this — an
    * untokenizable query would embed to nothing and silently return zero
    * hits on the Spark side while the SQL mirror emits k NULL-sim rows
    * (round-4 review); failing loudly keeps the two in contract. */
  def tokenizable(s: String): Boolean =
    s != null && s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.nonEmpty

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

  /** Row form of [[shingles]]: one (doc_id, s) row per n-gram, via
    * posexplode + lead() sliding window instead of building the shingle
    * ARRAY with `transform` — higher-order-function lambdas evaluate
    * INTERPRETED (outside whole-stage codegen), which made the array form
    * the shared hot-spot of the whole dedup family. The window's
    * doc_id-partitioned sort is the natural 100 TB shape (tokens co-located
    * per doc); emits the exact same shingle strings as the array form. */
  def shingleRowsOf(documents: org.apache.spark.sql.DataFrame, n: Int): org.apache.spark.sql.DataFrame =
    shingleRowsOfTokens(tokenRowsOf(documents), n)

  /** (doc_id, i, t0) positional token rows — the shared base relation for
    * token counts and shingle generation. Callers that derive several
    * n-gram widths (or counts + shingles) from the same corpus should
    * build this ONCE and cache it, instead of re-tokenizing the parquet
    * scan per branch. */
  def tokenRowsOf(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    documents.select(org.apache.spark.sql.functions.col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("i", "t0")))

  /** [[shingleRowsOf]] over a pre-built [[tokenRowsOf]] relation. `carry`
    * names the columns kept alongside `s` (default doc_id; the per-language
    * sketches carry lang instead) — ONE definition of the lead-window
    * shingle contract for every consumer. */
  def shingleRowsOfTokens(tok: org.apache.spark.sql.DataFrame, n: Int,
                          carry: Seq[String] = Seq("doc_id")): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("i")
    val withLeads = (1 until n).foldLeft(tok) { (df, j) =>
      df.withColumn(s"t$j", lead(col("t0"), j).over(w))
    }
    withLeads
      .filter(col(s"t${n - 1}").isNotNull)
      .select(carry.map(col) :+
        concat_ws(" ", (0 until n).map(j => col(s"t$j")): _*).as("s"): _*)
  }

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

  /** SimHash bit extraction. The token md5's leading 64 bits are read as
    * four 16-bit integer chunks ([[md5Chunk16]], hex chars 4c+1..4c+4);
    * bit i of the signature is bit 15-(i%16) of chunk i/16, and the signed
    * ±1 contribution is pure integer shift/mask arithmetic — identical in
    * both engines, and measurably cheaper than the substring+IN-list
    * string test it replaced (interleaved A/B on q_dedup_simhash at
    * sf0.1: ~6.0 s → ~5.2 s end-to-end, ~13%; the signature agg is only
    * part of that plan, so the per-expression saving is larger than the
    * headline). Aggregate the contributions with sum() then
    * [[simhashFromSums]]. */
  def md5Chunk16(tokenMd5: Column, c: Int): Column =
    conv(substring(tokenMd5, 4 * c + 1, 4), 16, 10).cast("int")

  def duckMd5Chunk16(tokenMd5: String, c: Int): String =
    s"('0x' || substr($tokenMd5, ${4 * c + 1}, 4))::BIGINT"

  /** ±1 contribution of within-chunk bit k (0 = msb) of a 16-bit chunk. */
  def simhashBitFromChunk(chunk: Column, k: Int): Column =
    shiftright(chunk, 15 - k).bitwiseAND(lit(1)) * 2 - 1

  def duckSimhashBitFromChunk(chunk: String, k: Int): String =
    s"((($chunk >> ${15 - k}) & 1) * 2 - 1)"

  /** Assemble the simhash bit string from the summed contributions. */
  def simhashFromSums(sums: Seq[Column]): Column =
    concat(sums.map(s => when(s > 0, "1").otherwise("0")): _*)

  def duckSimhashFromSums(sums: Seq[String]): String =
    sums.map(s => s"CASE WHEN $s > 0 THEN '1' ELSE '0' END").mkString("concat(", ", ", ")")

  /** Hamming distance between two equal-length bit strings, as a 64-term
    * position-compare sum (codegen-friendly; runs only on LSH candidate
    * pairs, never all-pairs). */
  def hammingDist(s1: Column, s2: Column, bits: Int): Column =
    (0 until bits).map(i =>
      when(substring(s1, i + 1, 1) =!= substring(s2, i + 1, 1), 1).otherwise(0))
      .reduce(_ + _).cast("long")

  /** DuckDB mirror of [[hammingDist]]. Past 64 terms the positional CASE
    * chain trips DuckDB's binder recursion limit (128 nested binary adds),
    * so wide signatures use the native `hamming()` string distance —
    * identical integer semantics (count of differing positions). The ≤64
    * chain is kept as-is: it is the long-gated form. */
  def duckHamming(s1: String, s2: String, bits: Int): String =
    if (bits > 64) s"hamming($s1, $s2)"
    else (0 until bits).map(i =>
      s"(CASE WHEN substr($s1, ${i + 1}, 1) <> substr($s2, ${i + 1}, 1) THEN 1 ELSE 0 END)")
      .mkString(" + ")
}
