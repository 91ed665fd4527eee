package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interchange-format sources/sinks: JSONL and CSV round-trips over the
  * documents table, each gated by a per-language 48-bit text checksum so
  * the oracle catches any escaping/quoting infidelity (quotes, commas,
  * newlines, unicode) the format layer might introduce — the property a
  * training-data pipeline actually needs from its interchange formats,
  * not just "a file was written".
  *
  * Scale shape: both writers are embarrassingly parallel (one file per
  * partition, no shuffle); both readers take an EXPLICIT schema — schema
  * inference is a second full pass over the data plus a type-drift
  * hazard (a numeric-looking string column flips type on the corpus
  * where every value happens to be numeric), so the seam never infers.
  * The aggregate after read-back is one keyed agg with map-side
  * partials. Scratch files live in a temp dir deleted after the result
  * materializes (`localCheckpoint` before cleanup — the
  * streamedDecontam ordering discipline).
  */
object Formats {

  /** Per-language accounting + text checksum of a documents relation —
    * the shared round-trip gate: 48 bits/doc of md5, BIGINT-exact far
    * beyond any corpus row count. */
  private def fidelityAgg(docs: DataFrame): DataFrame =
    docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum("n_chars").as("sum_chars"),
      min("doc_id").as("min_id"),
      max("doc_id").as("max_id"),
      sum(conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long")).as("text_checksum"))
      .orderBy("lang")

  private def roundtrip(spark: SparkSession, sfDir: String, format: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val outDir = java.nio.file.Files.createTempDirectory(s"graft_$format").toString
    try {
      val w = docs.coalesce(4).write.mode("overwrite")
      val r = spark.read.schema(docs.schema)
      format match {
        case "json" => w.json(outDir)
        case "csv"  => w.option("header", "true").csv(outDir)
        case "orc"  => w.orc(outDir)
      }
      val back = format match {
        case "json" => r.json(outDir)
        // multiLine: a quoted field containing a raw newline is ONE row —
        // without it the reader splits mid-field (spec-caught on hostile
        // content; this corpus has no newlines, so only the spec sees it).
        // Trade-off documented: multiLine CSV files are not splittable
        // per-line, so at scale prefer many moderate files (the writer's
        // one-file-per-partition shape) over one giant CSV.
        case "csv"  => r.option("header", "true").option("multiLine", "true").csv(outDir)
        // columnar like parquet: schema travels with the file, but the
        // explicit schema stays — the seam's contract is uniform
        case "orc"  => r.orc(outDir)
      }
      fidelityAgg(back).localCheckpoint()
    } finally deleteRecursively(new java.io.File(outDir))
  }

  /** JSONL (one object per line — the standard training-data interchange
    * format) write → explicit-schema read → fidelity gate. */
  def jsonlRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    roundtrip(spark, sfDir, "json")

  /** CSV (quoted, with header) write → explicit-schema read → fidelity
    * gate; quoting fidelity is exactly what the checksum pins. */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    roundtrip(spark, sfDir, "csv")

  /** ORC (the other columnar interchange format Spark ships natively)
    * write → read → fidelity gate. */
  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame =
    roundtrip(spark, sfDir, "orc")

  /** The oracle never sees the scratch files: a FAITHFUL round-trip is
    * row-identical to the parquet table, so the mirror aggregates the
    * table directly — any format-layer corruption shows up as a checksum
    * mismatch against this. */
  def duckRoundtrip(table: String): String =
    s"""SELECT lang, count(*)::BIGINT AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       min(doc_id) AS min_id, max(doc_id) AS max_id,
       |       CAST(sum(('0x' || substr(md5(text), 1, 12))::BIGINT) AS BIGINT) AS text_checksum
       |FROM $table GROUP BY lang ORDER BY lang""".stripMargin

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
  }
}
