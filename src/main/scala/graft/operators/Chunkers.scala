package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns.{duckTokens, tokens}

/** Chunking operators — the reference's structure-producing flatMaps
  * (SURVEY.md §2.2): fixed-size text chunking
  * (/root/reference/coding_agent/tools/indexing_agent.py:290-312
  * `_simple_text_chunks`, 50-line blocks) and markdown section splitting
  * (:242-288 `_parse_markdown`, leading prose → "Introduction").
  *
  * The testdata documents are single-line word streams, so the fixed-size
  * unit is TOKENS (10-token chunks ≙ the reference's 50-line blocks) and the
  * markdown variant derives heading markers deterministically first. Both are
  * pure relational programs (no UDFs): chunking is a slice-transform over
  * the token array, sectioning is a running-sum window — shapes that scale
  * as map-side work + one keyed aggregation.
  */
object Chunkers {

  val ChunkTokens = 10

  /** C6 analog: fixed-size token chunks. One output row per chunk:
    * (doc_id, chunk_idx, name, element_type, content, n_tokens, hash) —
    * hash is the reference's content hash C7
    * (indexing_agent.py:28-31 `md5(name:type:content)`). */
  def textChunks(documents: DataFrame): DataFrame =
    documents
      .withColumn("t", tokens(col("text")))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), ceil(size(col("t")) / lit(ChunkTokens.toDouble)).cast("int")),
          c => struct(
            c.as("cidx"),
            array_join(slice(col("t"), (c - 1) * ChunkTokens + 1, lit(ChunkTokens)), " ").as("content"),
            size(slice(col("t"), (c - 1) * ChunkTokens + 1, lit(ChunkTokens))).as("n_tokens"))
        )).as("ch"))
      .select(
        col("doc_id"),
        (col("ch.cidx") - 1).cast("long").as("chunk_idx"),
        concat(lit("chunk_"), (col("ch.cidx") - 1)).as("name"),
        lit("text_chunk").as("element_type"),
        col("ch.content"),
        col("ch.n_tokens").cast("long").as("n_tokens"))
      .withColumn("hash", md5(concat_ws(":", col("name"), col("element_type"), col("content"))))
      .orderBy("doc_id", "chunk_idx")

  def duckTextChunks(table: String): String =
    s"""WITH tk AS (SELECT doc_id, ${duckTokens("text")} AS t FROM $table),
       |ex AS (SELECT doc_id, t,
       |              unnest(generate_series(1, CAST(ceil(len(t) / ${ChunkTokens}.0) AS INT))) AS c
       |       FROM tk WHERE len(t) > 0),
       |ch AS (SELECT doc_id, (c - 1)::BIGINT AS chunk_idx,
       |              'chunk_' || (c - 1) AS name, 'text_chunk' AS element_type,
       |              array_to_string(t[((c-1)*$ChunkTokens+1):(c*$ChunkTokens)], ' ') AS content,
       |              len(t[((c-1)*$ChunkTokens+1):(c*$ChunkTokens)])::BIGINT AS n_tokens
       |       FROM ex)
       |SELECT doc_id, chunk_idx, name, element_type, content, n_tokens,
       |       md5(name || ':' || element_type || ':' || content) AS hash
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  /** Deterministic pseudo-markdown: heading markers injected before the
    * marker words, so the section chunker has real work on this corpus. */
  private val markerWords = Seq("table", "stream")

  private def mdText(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    markerWords.foldLeft(c)((acc, w) =>
      call_function("replace", acc, lit(s" $w "), lit(s"\n# $w\n")))

  private def duckMdText(c: String): String =
    markerWords.foldLeft(c)((acc, w) => s"replace($acc, ' $w ', chr(10) || '# $w' || chr(10))")

  /** C5 analog: markdown section chunker. Splits on '#'-heading lines; the
    * prose before the first heading becomes section "Introduction"
    * (indexing_agent.py:242-288); sections with empty content are dropped.
    * Output: (doc_id, section_idx, heading, n_lines, content). */
  def markdownSections(documents: DataFrame): DataFrame = {
    val lines = documents
      .select(col("doc_id"), posexplode(split(mdText(col("text")), "\n")).as(Seq("pos", "line")))
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    val sec = lines
      .withColumn("hdr", when(col("line").startsWith("# "), expr("substring(line, 3)")))
      .withColumn("section_idx",
        sum(when(col("hdr").isNotNull, 1).otherwise(0)).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    sec
      .groupBy("doc_id", "section_idx")
      .agg(
        coalesce(max(col("hdr")), lit("Introduction")).as("heading"),
        sum(when(col("hdr").isNull && col("line") =!= "", 1).otherwise(0)).cast("long").as("n_lines"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("hdr").isNull && col("line") =!= "",
              struct(col("pos"), col("line"))))),
            x => x.getField("line"))).as("content"))
      .filter(col("content") =!= "")
      .select(col("doc_id"), col("section_idx"), col("heading"), col("n_lines"), col("content"))
      .orderBy("doc_id", "section_idx")
  }

  def duckMarkdownSections(table: String): String =
    s"""WITH md AS (SELECT doc_id, ${duckMdText("text")} AS m FROM $table),
       |ln AS (SELECT doc_id,
       |              unnest(string_split(m, chr(10))) AS line,
       |              unnest(generate_series(1, len(string_split(m, chr(10))))) AS pos
       |       FROM md),
       |sec AS (SELECT doc_id, pos, line,
       |               CASE WHEN starts_with(line, '# ') THEN substr(line, 3) END AS hdr,
       |               CAST(sum(CASE WHEN starts_with(line, '# ') THEN 1 ELSE 0 END)
       |                    OVER (PARTITION BY doc_id ORDER BY pos
       |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS section_idx
       |        FROM ln),
       |g AS (SELECT doc_id, section_idx,
       |             coalesce(max(hdr), 'Introduction') AS heading,
       |             CAST(sum(CASE WHEN hdr IS NULL AND line <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_lines,
       |             coalesce(string_agg(CASE WHEN hdr IS NULL AND line <> '' THEN line END,
       |                                 chr(10) ORDER BY pos), '') AS content
       |      FROM sec GROUP BY doc_id, section_idx)
       |SELECT doc_id, section_idx, heading, n_lines, content
       |FROM g WHERE content <> '' ORDER BY doc_id, section_idx""".stripMargin
}
