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
  *
  * Cache lifecycle: [[curate]]'s `pass2` cache lives as long as the
  * returned lazy plan — same contract as [[Dedup]]'s header: the harness
  * clears session caches per query; a library caller clears them once the
  * accounting is materialized. [[curateKept]] is eager and releases its
  * own cache.
  */
object Curation {

  /** Shared funnel core: returns (base, pass1, pass2, kept, qual).
    *
    * `pairs`: optionally a pre-materialized CORPUS-LEVEL near-dup pair
    * relation ([[Dedup.nearDupPairs]] — the compute-once artifact a
    * production pipeline shares between cluster canonicalization and
    * curation). Pair membership is a per-pair property (signature bands
    * and Jaccard depend only on the two docs), so corpus pairs semi-joined
    * to pass2 on BOTH endpoints ≡ pairs computed on pass2 directly — the
    * equivalence is spec-asserted, not assumed. CALLER CONTRACT: when
    * `pairs` is provided, `nearDupThreshold` is NOT consulted — the pair
    * relation carries no threshold to validate against, so accounting is
    * labeled by whatever threshold the caller used to build the pairs.
    * Passing pairs built at a different threshold than the one named in
    * the call silently reports the pairs' threshold, not the argument.
    *
    * Cache discipline (measured, round 4): ONLY `pass2` is cached — it
    * feeds the expensive near-dup pipeline plus two accounting consumers.
    * `qual` is deliberately NOT cached although two consumers read it:
    * caching it would give its join build sides (doc-cardinality id sets)
    * a tiny pre-materialization estimate and plan locked-in broadcasts of
    * corpus-sized relations at scale, which then forces `hint("merge")`
    * pins that measurably slow the funnel at sf0.1 (4.5 s vs 2.8 s with
    * natural parquet-stat estimates, which pick broadcast while small and
    * SMJ when big — no lock-in hazard without a cache). Recomputing the
    * quality projection twice is the cheaper side of that trade at every
    * scale. `pass2`'s own join appearances are all safe with the cache:
    * it is the PROBE side of the kept anti-join (build side is the tiny
    * pair-graph id set) and a pure aggregate input elsewhere.
    */
  private def funnel(documents: DataFrame, minQuality: Double,
                     nearDupThreshold: Double, pairs: Option[DataFrame])
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
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
      .cache()

    val ndPairs = pairs match {
      case Some(p) =>
        p.select(col("d1"), col("d2"))
          .join(pass2.select(col("doc_id").as("d1")).hint("merge"), Seq("d1"), "left_semi")
          .join(pass2.select(col("doc_id").as("d2")).hint("merge"), Seq("d2"), "left_semi")
      case None => Dedup.nearDupPairs(pass2.select("doc_id", "text"), nearDupThreshold)
    }
    val kept = pass2.join(
      ndPairs.select(col("d2").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    (base, pass1, pass2, kept, qual)
  }

  /** Returns (lang, n_raw, n_quality, n_exact, n_kept, tokens_kept). */
  def curate(documents: DataFrame, minQuality: Double,
             nearDupThreshold: Double, pairs: Option[DataFrame] = None): DataFrame = {
    val (base, pass1, pass2, kept, qual) = funnel(documents, minQuality, nearDupThreshold, pairs)
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

  /** The kept-doc RELATION half of the funnel plus its cache handles —
    * the composition seam [[graft.Graft.prepareTrainingSet]] consumes
    * (the `-With` convention: caller owns the release; FacadeSpec asserts
    * the cache manager is empty after the facade returns). Returns
    * (kept docs (doc_id, lang, text), handles). */
  def keptWith(documents: DataFrame, minQuality: Double,
               nearDupThreshold: Double, pairs: Option[DataFrame] = None)
      : (DataFrame, Seq[DataFrame]) = {
    val (_, _, pass2, kept, _) = funnel(documents, minQuality, nearDupThreshold, pairs)
    (kept, Seq(pass2))
  }

  /** The kept-corpus WRITER — the artifact half the accounting report
    * describes: the same predicate chain as [[curate]], written as a
    * bucketed parquet table (bucketed by doc_id: downstream doc-keyed
    * joins — shingles, embeddings, pack-sequences — co-locate without a
    * shuffle). Returns the per-language accounting of the rows actually
    * written, read back FROM THE TABLE, so the report and the artifact
    * cannot diverge (spec-asserted against [[curate]]'s n_kept).
    */
  def curateKept(documents: DataFrame, minQuality: Double,
                 nearDupThreshold: Double, outDir: String, tableName: String,
                 buckets: Int = 8, pairs: Option[DataFrame] = None): DataFrame = {
    val spark = documents.sparkSession
    val (_, _, pass2, kept, _) = funnel(documents, minQuality, nearDupThreshold, pairs)
    try {
      kept.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .option("path", s"$outDir/$tableName")
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .saveAsTable(tableName)
    } finally {
      // the write materialized everything the cache was for: release the
      // corpus-cardinality scratch before returning (library callers have
      // no harness cleanup; clustersOfPairs/streamedDecontam precedent)
      pass2.unpersist(); ()
    }
    spark.table(tableName)
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
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
