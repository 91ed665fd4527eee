package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed pretraining-data flow the
  * individual operators exist for: quality gate → exact-duplicate removal
  * (keep lowest id per content hash) → MinHash near-duplicate removal
  * (keep-first policy: the lower id of every colliding pair survives) →
  * per-language survivor statistics.
  *
  * Each stage consumes the previous stage's (doc_id, lang, text) relation,
  * so at cluster scale the pipeline is three successively smaller keyed
  * shuffles followed by a tiny per-language aggregate; nothing rescans the
  * raw corpus twice. Stage survivor counts are reported per language so the
  * funnel is observable (a silent filter is a wrong filter at 100 TB).
  */
object Curation {

  /** Returns (lang, n_raw, n_quality, n_exact, n_kept, tokens_kept). */
  def curate(documents: DataFrame, minQuality: Double,
             nearDupThreshold: Double): DataFrame = {
    val qual = TextAnalysis.quality(documents)
      .select(col("doc_id"), col("quality_score"), col("n_tokens"))
    val base = documents.select(col("doc_id"), col("lang"), col("text"))

    val pass1 = base.join(
      qual.filter(col("quality_score") >= minQuality).select("doc_id"), "doc_id")

    val wHash = Window.partitionBy(md5(col("text")))
    val pass2 = pass1
      .withColumn("keeper", min("doc_id").over(wHash))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper")

    val pairs = Dedup.minhash(pass2.select("doc_id", "text"), nearDupThreshold)
    val kept = pass2.join(
      pairs.select(col("d2").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")

    def stage(df: DataFrame, cname: String) =
      df.groupBy("lang").agg(count(lit(1)).as(cname))
    stage(base, "n_raw")
      .join(stage(pass1, "n_quality"), Seq("lang"), "left")
      .join(stage(pass2, "n_exact"), Seq("lang"), "left")
      .join(kept.join(qual, "doc_id").groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_tokens").as("tokens_kept")),
        Seq("lang"), "left")
      .select(col("lang"),
        col("n_raw"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
      .orderBy("lang")
  }

  def duckCurate(table: String, minQuality: Double, nearDupThreshold: Double): String =
    s"""WITH qual AS (${TextAnalysis.duckQuality(table)}),
       |base AS (SELECT doc_id, lang, text FROM $table),
       |pass1 AS (SELECT b.doc_id, b.lang, b.text FROM base b
       |          JOIN qual ON qual.doc_id = b.doc_id
       |          WHERE qual.quality_score >= $minQuality),
       |k AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM pass1),
       |pass2 AS (SELECT p.* FROM pass1 p JOIN k ON k.doc_id = p.doc_id AND k.doc_id = k.keeper),
       |pairs AS (${Dedup.duckMinhashSql("pass2", nearDupThreshold)}),
       |kept AS (SELECT * FROM pass2 WHERE doc_id NOT IN (SELECT d2 FROM pairs)),
       |s_raw AS (SELECT lang, count(*)::BIGINT AS n_raw FROM base GROUP BY lang),
       |s_q AS (SELECT lang, count(*)::BIGINT AS n_quality FROM pass1 GROUP BY lang),
       |s_e AS (SELECT lang, count(*)::BIGINT AS n_exact FROM pass2 GROUP BY lang),
       |s_k AS (SELECT kept.lang, count(*)::BIGINT AS n_kept,
       |               CAST(sum(qual.n_tokens) AS BIGINT) AS tokens_kept
       |        FROM kept JOIN qual ON qual.doc_id = kept.doc_id GROUP BY kept.lang)
       |SELECT s_raw.lang, n_raw,
       |       coalesce(n_quality, 0) AS n_quality,
       |       coalesce(n_exact, 0) AS n_exact,
       |       coalesce(n_kept, 0) AS n_kept,
       |       coalesce(tokens_kept, 0) AS tokens_kept
       |FROM s_raw
       |LEFT JOIN s_q USING (lang) LEFT JOIN s_e USING (lang) LEFT JOIN s_k ON s_k.lang = s_raw.lang
       |ORDER BY lang""".stripMargin
}
