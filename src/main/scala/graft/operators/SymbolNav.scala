package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns.{duckTokens, tokens}

/** Relational def/ref navigation (SURVEY.md §2.6 L2-L3). The reference
  * proxies an external language server
  * (/root/reference/coding_agent/tools/lsp_tool.py:280-342); the declared
  * relational analog is: a `defs` table (first occurrence of a symbol in
  * corpus order = its definition site) equi-joined against all token
  * occurrences (`refs`). Executed distributed: token explode is map-side,
  * the def resolution is one window, the ref count one aggregation.
  */
object SymbolNav {

  /** Token occurrences: (token, doc_id, pos) — the "usages" relation. */
  private def occurrences(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "token")))

  /** L2+L3 for a watchlist of symbols: definition site (first occurrence in
    * (doc_id, pos) order) plus reference counts and spread. */
  def defsAndRefs(documents: DataFrame, symbols: Seq[String]): DataFrame = {
    val occ = occurrences(documents)
      .filter(col("token").isin(symbols: _*))
    val w = Window.partitionBy("token").orderBy(asc("doc_id"), asc("pos"))
    occ
      .withColumn("rn", row_number().over(w))
      .groupBy("token")
      .agg(
        min(when(col("rn") === 1, col("doc_id"))).as("def_doc"),
        min(when(col("rn") === 1, col("pos"))).cast("long").as("def_pos"),
        (count(lit(1)) - 1).cast("long").as("n_refs"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("token")
  }

  def duckDefsAndRefs(table: String, symbols: Seq[String]): String = {
    // quote-escaped, and an empty watchlist yields FALSE instead of the
    // unparseable `IN ()` — matching the Spark side's empty-isin result
    // (round-4 review)
    val lst =
      if (symbols.isEmpty) "SELECT NULL WHERE FALSE"
      else symbols.map(s => s"'${s.replace("'", "''")}'").mkString(", ")
    s"""WITH occ AS (SELECT doc_id,
       |                    unnest(${duckTokens("text")}) AS token,
       |                    unnest(generate_series(0, len(${duckTokens("text")}) - 1)) AS pos
       |             FROM $table),
       |f AS (SELECT * FROM occ WHERE token IN ($lst)),
       |r AS (SELECT token, doc_id, pos,
       |             row_number() OVER (PARTITION BY token ORDER BY doc_id, pos) AS rn
       |      FROM f)
       |SELECT token,
       |       min(CASE WHEN rn = 1 THEN doc_id END) AS def_doc,
       |       CAST(min(CASE WHEN rn = 1 THEN pos END) AS BIGINT) AS def_pos,
       |       (count(*) - 1)::BIGINT AS n_refs,
       |       count(DISTINCT doc_id)::BIGINT AS n_docs
       |FROM r GROUP BY token ORDER BY token""".stripMargin
  }
}
