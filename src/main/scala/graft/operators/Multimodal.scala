package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads with typed metadata,
  * decode-stub feature extraction, and frame sampling (BASELINE.json
  * extension — the image/audio libraries are not in this container, so the
  * decode is a clearly-marked deterministic stand-in while the Spark-side
  * schema / partitioning / batch shape is real).
  *
  * The payload is derived deterministically from the documents table (the
  * driver testdata carries no true binary column): bytes = UTF-8 of the
  * text, metadata from doc fields. Feature extraction runs per-partition
  * over an iterator — the exact seam where a real decoder (JNI/FFI or
  * vectorized Arrow batch) would slot in.
  */
object Multimodal {

  /** Typed record for the decoded-asset features. */
  case class AssetFeatures(doc_id: Long, byte_len: Long, width: Int, height: Int,
                           mean_byte: Double, n_frames: Int)

  /** "images" relation: binary payload + typed metadata columns. */
  def assets(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      ((col("doc_id") * 7) % 48 + 1).cast("int").as("height"),
      lit("image/fake").as("mime"))

  /** SQL-expressible feature projection (oracle-checkable): byte length,
    * payload digest, and a "frame sample" digest (first 16 bytes). The
    * oracle hashes the VARCHAR form — DuckDB's md5 is VARCHAR-only — which
    * is byte-identical here because the corpus is ASCII. */
  def features(documents: DataFrame): DataFrame =
    assets(documents)
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        col("width"), col("height"),
        md5(col("payload")).as("payload_md5"),
        md5(expr("substring(payload, 1, 16)")).as("frame_md5"))
      .orderBy("doc_id")

  def duckFeatures(table: String): String =
    s"""SELECT doc_id, octet_length(text::BLOB)::BIGINT AS byte_len,
       |       (n_chars % 64 + 1)::INT AS width,
       |       ((doc_id * 7) % 48 + 1)::INT AS height,
       |       md5(text) AS payload_md5,
       |       md5(substring(text, 1, 16)) AS frame_md5
       |FROM $table ORDER BY doc_id""".stripMargin

  /** Modality tag for the batch planner: deterministic stand-in for a real
    * mime column (the testdata carries none). */
  private def modalityCol = expr(
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")

  /** Decode-batch planner — the shaping step in front of any batched
    * decoder (`mapInPandas` / Arrow UDF / FFI): assign assets to
    * fixed-byte-capacity decode batches PER MODALITY, greedy in doc_id
    * order (the deterministic ingestion-order stand-in), and emit
    * per-batch accounting (asset count, payload bytes, doc range). A
    * decoder then maps one batch → one UDF invocation with a bounded
    * memory footprint; capacity is the knob that matches batch bytes to
    * executor headroom.
    *
    * The per-modality running byte offset is the SAME two-phase
    * distributed prefix sum as [[CorpusOps.packSequences]] (per-bucket
    * totals → prefix over the tiny bucket relation, here additionally
    * partitioned by modality → broadcast offsets + within-bucket windows);
    * batch_no = offset DIV capacity. All integer arithmetic — exact in
    * both engines.
    */
  def decodeBatches(documents: DataFrame, capacityBytes: Long = 4096,
                    bucketSize: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = assets(documents)
      .select(modalityCol.as("modality"), col("doc_id"),
        octet_length(col("payload")).cast("long").as("bytes"))
      .withColumn("bkt", expr(s"doc_id DIV $bucketSize"))
    val btot = d.groupBy("modality", "bkt").agg(sum("bytes").as("bbytes"))
    val wB = Window.partitionBy("modality").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = btot.withColumn("boffset", coalesce(sum("bbytes").over(wB), lit(0L)))
    val wD = Window.partitionBy("modality", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(boff.select(col("modality"), col("bkt"), col("boffset"))),
        Seq("modality", "bkt"))
      .withColumn("offset", col("boffset") + coalesce(sum("bytes").over(wD), lit(0L)))
      .withColumn("batch_no", expr(s"offset DIV $capacityBytes"))
      .groupBy("modality", "batch_no")
      .agg(count(lit(1)).as("n_assets"),
        sum("bytes").cast("long").as("batch_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("modality", "batch_no")
  }

  /** DuckDB mirror of [[decodeBatches]] — single-scan per-modality cumsum
    * (the oracle need not be distributed, only row-identical). */
  def duckDecodeBatches(table: String, capacityBytes: Long = 4096): String =
    s"""WITH d AS (SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       |                  doc_id, octet_length(text::BLOB)::BIGINT AS bytes
       |           FROM $table),
       |c AS (SELECT modality, doc_id, bytes,
       |             CAST(coalesce(sum(bytes) OVER (PARTITION BY modality ORDER BY doc_id
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
       |      FROM d)
       |SELECT modality, "offset" // $capacityBytes AS batch_no,
       |       count(*)::BIGINT AS n_assets, CAST(sum(bytes) AS BIGINT) AS batch_bytes,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2 ORDER BY modality, batch_no""".stripMargin

  /** Frame sampling: 1 asset → N frame rows (the video shape). Frames are
    * fixed 32-byte payload slices, capped at `maxFrames` per asset — at
    * cluster scale this generator is map-side (explode, no shuffle) and the
    * per-frame digest is where a real frame decoder would hook in. */
  def frameSamples(documents: DataFrame, maxFrames: Int = 4): DataFrame =
    assets(documents)
      .select(col("doc_id"),
        // empty-payload guard: Spark's sequence(1, 0) yields a DESCENDING
        // [1, 0] while DuckDB's generate_series(1, 0) is empty — same hazard
        // TextFns.shingles guards against. Empty payload → zero frame rows.
        expr(s"""explode(transform(
          case when octet_length(payload) > 0
               then sequence(1, least($maxFrames, cast(ceil(octet_length(payload) / 32.0) as int)))
               else array() end,
          i -> struct(i as frame_no,
                      md5(substring(payload, (i - 1) * 32 + 1, 32)) as frame_md5)))""").as("f"))
      .select(col("doc_id"), col("f.frame_no").cast("long").as("frame_no"), col("f.frame_md5"))
      .orderBy("doc_id", "frame_no")

  def duckFrameSamples(table: String, maxFrames: Int = 4): String =
    s"""SELECT doc_id, CAST(i AS BIGINT) AS frame_no,
       |       md5(substring(text, (i - 1) * 32 + 1, 32)) AS frame_md5
       |FROM (SELECT doc_id, text,
       |             unnest(generate_series(1, least($maxFrames,
       |                    CAST(ceil(octet_length(text::BLOB) / 32.0) AS INT)))) AS i
       |      FROM $table)
       |ORDER BY doc_id, frame_no""".stripMargin

  /** Resize-stub: metadata-level resize (halved dims, clamped ≥1) plus the
    * stub "pixel" statistic recomputed over the proportionally truncated
    * payload — the schema/partitioning shape of a real resize (map-side,
    * output dims derived, payload transformed). */
  def resizeStub(documents: DataFrame, factor: Int = 2): Dataset[AssetFeatures] = {
    val spark = documents.sparkSession
    import spark.implicits._
    assets(documents)
      .select("doc_id", "payload", "width", "height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, payload, w, h) =>
          val (rw, rh) = (math.max(1, w / factor), math.max(1, h / factor))
          val keep = math.max(1, payload.length / (factor * factor))
          val slice = payload.take(keep)
          val mean = if (slice.isEmpty) 0.0
            else slice.map(b => (b & 0xff).toDouble).sum / slice.length
          AssetFeatures(id, slice.length.toLong, rw, rh, mean,
            math.max(1, slice.length / math.max(1, rw * rh)))
        }
      }
  }

  /** Decode-stub over mapPartitions — the per-partition iterator seam a real
    * image decoder would occupy. STUB: "decoding" reads byte statistics from
    * the payload instead of pixels; deterministic and schema-faithful.
    * Exercised by the ScalaTest suite (not oracle-SQL-expressible as a
    * mapPartitions op; the SQL-projection twin [[features]] is the oracle
    * surface).
    */
  def decodeFeatures(documents: DataFrame): Dataset[AssetFeatures] = {
    val spark = documents.sparkSession
    import spark.implicits._
    assets(documents)
      .select("doc_id", "payload", "width", "height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, payload, w, h) =>
          // STUB decode: a real implementation would decode pixels here.
          val mean = if (payload.isEmpty) 0.0
            else payload.map(b => (b & 0xff).toDouble).sum / payload.length
          val frames = math.max(1, payload.length / math.max(1, w * h))
          AssetFeatures(id, payload.length.toLong, w, h, mean, frames)
        }
      }
  }
}
