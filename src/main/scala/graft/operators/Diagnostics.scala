package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-line diagnostics rule engine (SURVEY.md §2.5; reference
  * /root/reference/coding_agent/tools/lsp_tool.py:97-278): a dispatcher
  * picks a ruleset by file kind (D1), per-line predicates emit
  * warnings/errors (D2-D4), and a per-file aggregation builds the report
  * (D5). The shadow-workspace validation (D6, lsp_tool.py:344-373) is the
  * same pipeline run over proposed content with `valid = error_count == 0`.
  *
  * Documents stand in for files; their 10-token chunks are the "lines"
  * (single-line corpus). Rules are pure `when()` predicates — the whole
  * engine is one generate → filter → aggregate program, embarrassingly
  * parallel over doc_id.
  *
  * Rulesets (thresholds tuned to this corpus, structure faithful to the
  * reference): "py"-style rules for lang=en (print-call, wildcard-import
  * analog), "js"-style for lang=de (console.log analog), generic rules for
  * every doc (long line, trailing whitespace analog, short doc).
  */
object Diagnostics {

  private val LongLine = 70

  /** Per-line rule evaluation over chunk-lines. Returns one row per emitted
    * message: (doc_id, line_no, severity, message).
    *
    * All rules evaluate in ONE pass: per line, an array of
    * when(cond, struct(severity, message)) entries is built, nulls filtered,
    * and the survivors exploded — the chunker/join subtree executes once,
    * not once per rule (a union-of-filters re-reads the input per branch),
    * and the whole rule bank stays inside one codegen stage.
    */
  def lineDiagnostics(documents: DataFrame): DataFrame = {
    val lines = Chunkers.textChunks(documents)
      .join(documents.select("doc_id", "lang"), "doc_id")
      .select(col("doc_id"), col("lang"), col("chunk_idx").as("line_no"), col("content").as("line"))
    def rule(cond: Column, severity: String, msg: Column): Column =
      when(cond, struct(lit(severity).as("severity"), msg.as("message")))
    val ruleBank = array(
      rule(length(col("line")) > LongLine, "warning",
        concat(lit(s"Line exceeds $LongLine characters ("), length(col("line")), lit(")"))),
      rule(col("lang") === "en" && col("line").contains("key"), "warning",
        lit("py: suspicious call marker 'key'")),
      rule(col("lang") === "de" && col("line").contains("merge"), "warning",
        lit("js: suspicious call marker 'merge'")),
      // no regex backreferences anywhere: DuckDB's RE2 lacks them, so the
      // oracle could not mirror a \1-style repeated-word rule
      rule(col("line").contains("slow") && col("line").contains("fast"),
        "error", lit("Contradictory speed markers")))
    lines
      .select(col("doc_id"), col("line_no"),
        explode(filter(ruleBank, x => x.isNotNull)).as("r"))
      .select(col("doc_id"), col("line_no"),
        col("r.severity").as("severity"), col("r.message").as("message"))
  }

  /** D5: per-document report with severity counts and a deterministic
    * message digest. `valid` is the D6 shadow-workspace verdict. */
  def report(documents: DataFrame): DataFrame =
    lineDiagnostics(documents)
      .groupBy("doc_id")
      .agg(
        sum(when(col("severity") === "error", 1).otherwise(0)).cast("long").as("error_count"),
        sum(when(col("severity") === "warning", 1).otherwise(0)).cast("long").as("warning_count"),
        concat_ws("; ",
          transform(
            array_sort(collect_list(struct(col("line_no"), col("severity"), col("message")))),
            x => concat(x.getField("line_no"), lit(":"), x.getField("severity"),
              lit(":"), x.getField("message")))).as("messages"))
      .withColumn("valid", (col("error_count") === 0).cast("boolean"))
      .orderBy("doc_id")

  /** D6: shadow-workspace validation (lsp_tool.py:344-373) — run the full
    * rule pipeline on PROPOSED content as a one-row virtual document; no
    * filesystem copy is needed because the engine's diagnostics are a pure
    * function of (lang, content). `valid` = zero error-severity findings
    * (the reference's uppercase-"ERROR" substring scan almost always
    * returned true — SURVEY.md §2.9#6; we count from the structured
    * severity column instead). */
  def validate(spark: org.apache.spark.sql.SparkSession, lang: String,
               content: String): Boolean = {
    import spark.implicits._
    val proposed = Seq((0L, lang, content)).toDF("doc_id", "lang", "text")
    val rows = report(proposed).collect()
    rows.isEmpty || rows.head.getAs[Boolean]("valid")
  }

  def duckReport(table: String): String =
    s"""WITH ch AS (${Chunkers.duckTextChunks(table).replace("ORDER BY doc_id, chunk_idx", "")}),
       |ln AS (SELECT c.doc_id, d.lang, c.chunk_idx AS line_no, c.content AS line
       |       FROM ch c JOIN $table d ON d.doc_id = c.doc_id),
       |msg AS (
       |  SELECT doc_id, line_no, 'warning' AS severity,
       |         'Line exceeds $LongLine characters (' || length(line) || ')' AS message
       |  FROM ln WHERE length(line) > $LongLine
       |  UNION ALL
       |  SELECT doc_id, line_no, 'warning', 'py: suspicious call marker ''key'''
       |  FROM ln WHERE lang = 'en' AND contains(line, 'key')
       |  UNION ALL
       |  SELECT doc_id, line_no, 'warning', 'js: suspicious call marker ''merge'''
       |  FROM ln WHERE lang = 'de' AND contains(line, 'merge')
       |  UNION ALL
       |  SELECT doc_id, line_no, 'error', 'Contradictory speed markers'
       |  FROM ln WHERE contains(line, 'slow') AND contains(line, 'fast'))
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN severity = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
       |  CAST(sum(CASE WHEN severity = 'warning' THEN 1 ELSE 0 END) AS BIGINT) AS warning_count,
       |  string_agg(line_no || ':' || severity || ':' || message, '; '
       |             ORDER BY line_no, severity, message) AS messages,
       |  (sum(CASE WHEN severity = 'error' THEN 1 ELSE 0 END) = 0) AS valid
       |FROM msg GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
