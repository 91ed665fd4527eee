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

  // ---------------------------------------------------------------------------
  // The reference's REAL rule banks (lsp_tool.py:141-156 python, :202-230
  // js/ts, :250-267 generic), over (file_path, ext, line_no, line) rows.
  // Same single-pass array-of-structs shape as the corpus analog above.
  // Deviations, declared: the ast.parse syntax check and the pyflakes
  // subprocess (lsp_tool.py:133-180) need a Python runtime — out of scope;
  // the error channel they fed is kept live by a relational
  // syntax-plausibility check instead ([[syntaxDiagnostics]]: per-file
  // delimiter-balance + triple-quote-parity aggregates, error severity); and
  // trim() strips spaces where Python's str.strip() strips all whitespace
  // (identical on this corpus, and identical between Spark and DuckDB, which
  // is what the oracle requires).
  // ---------------------------------------------------------------------------

  private val JsExts = Seq("js", "ts", "tsx", "jsx")

  /** D2/D3/D4 per-line rules, dispatched on `ext` (the reference's
    * `get_diagnostics` file-extension dispatch, lsp_tool.py:97-115).
    * Input: (file_path, ext, line_no, line). Output one row per finding:
    * (file_path, line_no, severity, message). */
  def codeLineDiagnostics(lines: DataFrame): DataFrame = {
    val l = col("line")
    val sl = trim(col("line"))
    val isPy = col("ext") === "py"
    val isJs = col("ext").isin(JsExts: _*)
    val isGeneric = !isPy && !isJs
    def rule(cond: Column, severity: String, msg: Column): Column =
      when(cond, struct(lit(severity).as("severity"), msg.as("message")))
    val semiCount = size(split(sl, ";", -1)) - 1
    val ruleBank = array(
      // python: lsp_tool.py:146-156
      rule(isPy && sl.startsWith("import ") && !sl.contains(" as ") && sl.contains("*"),
        "warning", lit("Wildcard import detected")),
      rule(isPy && l.contains("print(") && !sl.startsWith("#"),
        "warning", lit("print() statement found (consider logging)")),
      // long-line >120 appears in BOTH the py and js banks with the same text
      rule((isPy || isJs) && length(l) > 120,
        "warning", concat(lit("Line too long ("), length(l), lit(" chars)"))),
      // js/ts: lsp_tool.py:205-230
      rule(isJs && l.contains("console.log(") && !sl.startsWith("//"),
        "warning", lit("console.log() found")),
      rule(isJs && sl.endsWith(";") && semiCount > 1,
        "warning", lit("Multiple statements on one line")),
      rule(isJs && sl =!= "" && !sl.startsWith("//") && !sl.startsWith("/*") &&
        !sl.endsWith(";") && !sl.endsWith("{") && !sl.endsWith("}") && !sl.endsWith(",") &&
        !sl.contains("if (") && !sl.contains("for (") && !sl.contains("while ("),
        "warning", lit("Missing semicolon?")),
      // generic: lsp_tool.py:253-260
      rule(isGeneric && length(l) > 200,
        "warning", concat(lit("Very long line ("), length(l), lit(" chars)"))),
      rule(isGeneric && rtrim(l) =!= l, "warning", lit("Trailing whitespace")))
    lines
      .select(col("file_path"), col("line_no"),
        explode(filter(ruleBank, x => x.isNotNull)).as("r"))
      .select(col("file_path"), col("line_no"),
        col("r.severity").as("severity"), col("r.message").as("message"))
  }

  /** Error-severity syntax-plausibility check (round-2 verdict #3): a
    * relational stand-in for the reference's `ast.parse` error path
    * (lsp_tool.py:133-139), which needs a Python runtime. A file whose net
    * delimiter balance — Σ opens − Σ closes per `()`/`[]`/`{}` pair — is
    * nonzero, or (python) whose `\"\"\"` count is odd, cannot parse; both
    * are pure per-file aggregates over the line relation, so the check is
    * one map-side counting pass plus the same keyed aggregation the report
    * already pays. Scoped to code files (py + js family), like the
    * reference's parser-backed checks. This is what makes `error_count` and
    * `valid=false` carry real signal: the line-rule banks are warning-only.
    * Input: (file_path, ext, line_no, line); output rows at line_no 0. */
  def syntaxDiagnostics(lines: DataFrame): DataFrame = {
    val l = col("line")
    def cnt(s: String): Column = length(l) - length(replace(l, lit(s), lit("")))
    val isPy = col("ext") === "py"
    val isJs = col("ext").isin(JsExts: _*)
    val agg = lines.filter(isPy || isJs)
      .groupBy(col("file_path"), col("ext"))
      .agg(
        sum(cnt("(") - cnt(")")).as("paren"),
        sum(cnt("[") - cnt("]")).as("bracket"),
        sum(cnt("{") - cnt("}")).as("brace"),
        sum((cnt("\"\"\"") / lit(3)).cast("long")).as("tq"))
    def rule(cond: Column, msg: Column): Column =
      when(cond, struct(lit("error").as("severity"), msg.as("message")))
    val bank = array(
      rule(col("paren") =!= 0 || col("bracket") =!= 0 || col("brace") =!= 0,
        concat(lit("Syntax error: unbalanced delimiters (paren="), col("paren"),
          lit(", bracket="), col("bracket"), lit(", brace="), col("brace"), lit(")"))),
      rule(col("ext") === "py" && col("tq") % 2 =!= 0,
        lit("Syntax error: unterminated triple-quoted string")))
    agg
      .select(col("file_path"), lit(0L).as("line_no"),
        explode(filter(bank, x => x.isNotNull)).as("r"))
      .select(col("file_path"), col("line_no"),
        col("r.severity").as("severity"), col("r.message").as("message"))
  }

  /** File-level generic checks (lsp_tool.py:262-267): empty file, missing
    * trailing newline — independent predicates, both can fire. Input:
    * (file_path, ext, content). line_no 0 sorts them ahead of line findings. */
  def codeFileDiagnostics(files: DataFrame): DataFrame = {
    val isGeneric = !(col("ext") === "py") && !col("ext").isin(JsExts: _*)
    def rule(cond: Column, msg: String): Column =
      when(cond, struct(lit("warning").as("severity"), lit(msg).as("message")))
    val bank = array(
      rule(isGeneric && trim(col("content")) === "", "File is empty"),
      rule(isGeneric && !col("content").endsWith("\n"), "File doesn't end with newline"))
    files
      .select(col("file_path"), lit(0L).as("line_no"),
        explode(filter(bank, x => x.isNotNull)).as("r"))
      .select(col("file_path"), col("line_no"),
        col("r.severity").as("severity"), col("r.message").as("message"))
  }

  /** D5 over real files: per-file report with the severity counts and sorted
    * message digest. */
  def codeReport(diag: DataFrame): DataFrame =
    diag
      .groupBy("file_path")
      .agg(
        sum(when(col("severity") === "error", 1).otherwise(0)).cast("long").as("error_count"),
        sum(when(col("severity") === "warning", 1).otherwise(0)).cast("long").as("warning_count"),
        concat_ws("; ",
          transform(
            array_sort(collect_list(struct(col("line_no"), col("severity"), col("message")))),
            x => concat(x.getField("line_no"), lit(":"), x.getField("severity"),
              lit(":"), x.getField("message")))).as("messages"))
      .withColumn("valid", (col("error_count") === 0).cast("boolean"))
      .orderBy("file_path")

  /** Fixture entry: (file_path, content) rows — real files, real newlines. */
  def codeDiagnostics(files: DataFrame): DataFrame = {
    val withExt = files.withColumn("ext",
      regexp_extract(col("file_path"), "\\.([^.]+)$", 1))
    // NOT cached although two branches read it: this is the per-call
    // facade path (getDiagnostics/validateCode run it once per proposed
    // edit), and an un-unpersisted cache per call leaks block-manager
    // entries across an agent loop; recomputing a single file's line
    // explode is trivially cheap. The corpus-scale oracle path
    // (codeReportFromDocs) caches instead — the harness clears per query.
    val lines = withExt
      .select(col("file_path"), col("ext"),
        posexplode(split(col("content"), "\n", -1)).as(Seq("idx", "line")))
      .select(col("file_path"), col("ext"),
        (col("idx") + 1).cast("long").as("line_no"), col("line"))
    codeReport(codeLineDiagnostics(lines)
      .unionByName(codeFileDiagnostics(withExt))
      .unionByName(syntaxDiagnostics(lines)))
  }

  /** Documents-as-files view for the oracle: each text chunk is a "line",
    * doc_id mod 3 picks the extension, and a deterministic decoration makes
    * every rule reachable on this corpus (print(, console.log, trailing
    * whitespace, wildcard import, multi-statement). Mirrored verbatim in
    * [[duckCodeReport]]. */
  def docsAsFiles(documents: DataFrame): DataFrame = {
    val ch = Chunkers.textChunks(documents)
    val ext = when(col("doc_id") % 3 === 0, "py")
      .when(col("doc_id") % 3 === 1, "js")
      .otherwise("txt")
    val m = col("chunk_idx") % 6
    val line = when(m === 0, concat(lit("print(\""), col("content"), lit("\")")))
      .when(m === 1, concat(lit("console.log(\""), col("content"), lit("\");")))
      .when(m === 2, concat(col("content"), lit("  ")))
      .when(m === 3, lit("import *"))
      .when(m === 4, lit("const a = 1; const b = 2;"))
      // every 7th doc gets one unclosed paren on its m=5 lines, so the
      // error-severity syntax channel (syntaxDiagnostics) fires on a
      // deterministic minority of code files and valid=false is observable
      // in the oracle gate — not just in unit fixtures
      .otherwise(when(col("doc_id") % 7 === 0, concat(lit("( "), col("content")))
        .otherwise(col("content")))
    ch.select(col("doc_id"), col("chunk_idx"), ext.as("ext"), line.as("line"))
      .select(concat(lit("doc_"), col("doc_id"), lit("."), col("ext")).as("file_path"),
        col("ext"), (col("chunk_idx") + 1).as("line_no"), col("line"))
  }

  /** q_diagnostics_code: the real rule banks over the documents-as-files
    * view. Chunk-joined lines never end in a newline, so every generic file
    * carries the missing-trailing-newline warning — the file-level rule is
    * exercised, deterministically, on both engines. */
  def codeReportFromDocs(documents: DataFrame): DataFrame = {
    // cached: three union branches read it (the chunker's interpreted
    // transform makes recompute the expensive part); consumers are filters
    // and unions — no join build side, so no estimate hazard
    val v = docsAsFiles(documents).cache()
    val fileLevel = v.filter(col("ext") === "txt").select("file_path").distinct()
      .select(col("file_path"), lit(0L).as("line_no"),
        lit("warning").as("severity"),
        lit("File doesn't end with newline").as("message"))
    codeReport(codeLineDiagnostics(v)
      .unionByName(fileLevel)
      .unionByName(syntaxDiagnostics(v)))
  }

  def duckCodeReport(table: String): String = {
    val js = "('js','ts','tsx','jsx')"
    val code = "('py','js','ts','tsx','jsx')"
    s"""WITH ch AS (${Chunkers.duckTextChunks(table).replace("ORDER BY doc_id, chunk_idx", "")}),
       |v AS (SELECT 'doc_' || doc_id || '.' || ext AS file_path, ext,
       |             chunk_idx + 1 AS line_no, line
       |      FROM (SELECT doc_id, chunk_idx,
       |              CASE WHEN doc_id % 3 = 0 THEN 'py'
       |                   WHEN doc_id % 3 = 1 THEN 'js' ELSE 'txt' END AS ext,
       |              CASE WHEN chunk_idx % 6 = 0 THEN 'print("' || content || '")'
       |                   WHEN chunk_idx % 6 = 1 THEN 'console.log("' || content || '");'
       |                   WHEN chunk_idx % 6 = 2 THEN content || '  '
       |                   WHEN chunk_idx % 6 = 3 THEN 'import *'
       |                   WHEN chunk_idx % 6 = 4 THEN 'const a = 1; const b = 2;'
       |                   WHEN doc_id % 7 = 0 THEN '( ' || content
       |                   ELSE content END AS line
       |            FROM ch)),
       |msg AS (
       |  SELECT file_path, line_no, 'warning' AS severity, 'Wildcard import detected' AS message
       |  FROM v WHERE ext = 'py' AND starts_with(trim(line), 'import ')
       |           AND NOT contains(trim(line), ' as ') AND contains(trim(line), '*')
       |  UNION ALL
       |  SELECT file_path, line_no, 'warning', 'print() statement found (consider logging)'
       |  FROM v WHERE ext = 'py' AND contains(line, 'print(') AND NOT starts_with(trim(line), '#')
       |  UNION ALL
       |  SELECT file_path, line_no, 'warning', 'Line too long (' || length(line) || ' chars)'
       |  FROM v WHERE ext IN $code AND length(line) > 120
       |  UNION ALL
       |  SELECT file_path, line_no, 'warning', 'console.log() found'
       |  FROM v WHERE ext IN $js AND contains(line, 'console.log(')
       |           AND NOT starts_with(trim(line), '//')
       |  UNION ALL
       |  SELECT file_path, line_no, 'warning', 'Multiple statements on one line'
       |  FROM v WHERE ext IN $js AND ends_with(trim(line), ';')
       |           AND len(string_split(trim(line), ';')) - 1 > 1
       |  UNION ALL
       |  SELECT file_path, line_no, 'warning', 'Missing semicolon?'
       |  FROM v WHERE ext IN $js AND trim(line) <> ''
       |           AND NOT starts_with(trim(line), '//') AND NOT starts_with(trim(line), '/*')
       |           AND NOT ends_with(trim(line), ';') AND NOT ends_with(trim(line), '{')
       |           AND NOT ends_with(trim(line), '}') AND NOT ends_with(trim(line), ',')
       |           AND NOT contains(trim(line), 'if (') AND NOT contains(trim(line), 'for (')
       |           AND NOT contains(trim(line), 'while (')
       |  UNION ALL
       |  SELECT file_path, line_no, 'warning', 'Very long line (' || length(line) || ' chars)'
       |  FROM v WHERE ext NOT IN $code AND length(line) > 200
       |  UNION ALL
       |  SELECT file_path, line_no, 'warning', 'Trailing whitespace'
       |  FROM v WHERE ext NOT IN $code AND rtrim(line) <> line
       |  UNION ALL
       |  SELECT DISTINCT file_path, 0 AS line_no, 'warning', 'File doesn''t end with newline'
       |  FROM v WHERE ext NOT IN $code
       |  UNION ALL
       |  SELECT file_path, 0 AS line_no, 'error',
       |         'Syntax error: unbalanced delimiters (paren=' || paren ||
       |         ', bracket=' || bracket || ', brace=' || brace || ')'
       |  FROM (SELECT file_path,
       |          sum((length(line) - length(replace(line, '(', ''))) -
       |              (length(line) - length(replace(line, ')', '')))) AS paren,
       |          sum((length(line) - length(replace(line, '[', ''))) -
       |              (length(line) - length(replace(line, ']', '')))) AS bracket,
       |          sum((length(line) - length(replace(line, '{', ''))) -
       |              (length(line) - length(replace(line, '}', '')))) AS brace
       |        FROM v WHERE ext IN $code GROUP BY file_path)
       |  WHERE paren <> 0 OR bracket <> 0 OR brace <> 0
       |  UNION ALL
       |  SELECT file_path, 0 AS line_no, 'error', 'Syntax error: unterminated triple-quoted string'
       |  FROM (SELECT file_path,
       |          sum((length(line) - length(replace(line, '${"\"\"\""}', ''))) // 3) AS tq
       |        FROM v WHERE ext = 'py' GROUP BY file_path)
       |  WHERE tq % 2 <> 0)
       |SELECT file_path,
       |  CAST(sum(CASE WHEN severity = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
       |  CAST(sum(CASE WHEN severity = 'warning' THEN 1 ELSE 0 END) AS BIGINT) AS warning_count,
       |  string_agg(line_no || ':' || severity || ':' || message, '; '
       |             ORDER BY line_no, severity, message) AS messages,
       |  (sum(CASE WHEN severity = 'error' THEN 1 ELSE 0 END) = 0) AS valid
       |FROM msg GROUP BY file_path ORDER BY file_path""".stripMargin
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
