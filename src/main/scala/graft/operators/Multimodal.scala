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

  /** Perceptual 64-bit signature of the binary payload — the blockhash
    * construction (Yang et al.'s block mean value hash, the pHash-family
    * member that is pure integer arithmetic): split the payload into 64
    * equal byte-blocks, bit i = 1 iff block i's mean byte value exceeds
    * the whole-payload mean. Robust the way a perceptual hash must be —
    * a local edit perturbs a few blocks' means, flipping only the bits
    * whose block sits near the global mean, so near-identical payloads
    * land within a small hamming radius. The mean comparison is the exact
    * integer cross-product `bsum·len > tsum·blen` (never a double), so
    * both engines compute identical bits; blocks a short payload leaves
    * empty read as '0' in BOTH engines via the same 64-term pivot.
    *
    * A real image pipeline computes the same signature over DECODED
    * luminance blocks behind the [[decodeFeatures]] seam; byte blocks are
    * the deterministic stand-in this container can gate (the Multimodal
    * header contract), and every downstream shape — banding, candidate
    * join, hamming verify — is the production one.
    *
    * Scale shape: char rows are a map-side explode (no shuffle), blocks
    * and totals are two partial-agged aggregations keyed by doc, and the
    * output is one 64-char string per doc — the artifact a deployment
    * persists beside the asset table ([[graft.sources.PhashLayout]]).
    *
    * Char rows are the LINEAR `posexplode(split(text, ''))` form — the
    * generator walks the string once and hands each char to its row. The
    * first cut used `explode(sequence(1, len))` + `substring(text, pos, 1)`,
    * which re-seeks the string per generated row: O(len) per row, O(len²)
    * per document — measured as the dominant cost of the whole phash
    * pipeline one decade up (minutes per execution at sf1; the same
    * array-HOF-shaped trap the TextFns shingle row form exists to avoid).
    * Block index arithmetic is forced to BIGINT before the multiply so a
    * multi-GB payload cannot overflow the 32-bit position counter. */
  def phashSignatures(documents: DataFrame, width: Int = 64): DataFrame = {
    // width = number of block rows over the SAME payload (blockhash-128/
    // 256 style, round-9 verdict #5): a 64-bit signature caps band
    // discrimination at 4×16 bits, so past ~4M docs per length bucket
    // occupancy grows linearly again — the scale path is a LONGER
    // signature, not band arithmetic. Multiple of 32 so the hamming
    // verify's integer-half conversion stays chunk-aligned.
    require(width > 0 && width % 32 == 0, s"signature width $width must be a positive multiple of 32")
    val charRows = documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"),
        posexplode(split(col("text"), "")).as(Seq("pos0", "ch")))
      // Spark's split keeps a trailing "" element (Java split, limit -1);
      // DuckDB's range-based mirror never generates it — drop it here.
      .filter(col("ch") =!= "")
      .select(col("doc_id"), col("len"),
        expr(s"(CAST(pos0 AS BIGINT) * $width) DIV len").as("blk"),
        ascii(col("ch")).cast("long").as("code"))
    val blocks = charRows
      .groupBy("doc_id", "blk")
      .agg(sum("code").as("bsum"), count(lit(1)).as("blen"))
    val totals = blocks.groupBy("doc_id")
      .agg(sum("bsum").as("tsum"), sum("blen").as("len"))
    val bits = blocks.join(totals, "doc_id")
      .withColumn("bit",
        when(col("bsum") * col("len") > col("tsum") * col("blen"), lit("1"))
          .otherwise(lit("0")))
    bits.groupBy("doc_id")
      .agg(concat((0 until width).map(k =>
        coalesce(max(when(col("blk") === k, col("bit"))), lit("0"))): _*).as("phash"),
        max("len").as("plen"))
  }

  /** Perceptual near-dup pairs over the payload signatures — the simhash
    * candidate shape on bytes (round-6 verdict #6): 4×16-bit bands over
    * [[phashSignatures]], candidates share any band, verified by full
    * 64-bit hamming ≤ `maxHamming`. No content-level verify follows — the
    * payload is opaque binary by contract, so the perceptual hash IS the
    * content proxy (the published pHash-dedup shape); `psim` = 1 − h/64
    * is the reported similarity. Signature relation cached: the band
    * self-join reads it on both sides (the simhash precedent; harness
    * clears per query).
    *
    * Band geometry is CORPUS-RELATIVE (the embedCosineAdaptive lesson,
    * applied unchanged): a fixed 8-bit band key has only 256 values, so
    * bucket occupancy grows linearly with the corpus and the self-join
    * quadratically — the sf1 gate measured ~39M candidate pairs at 50k
    * docs before any mitigation. Band bits derive IN-PLAN as
    * `clamp(minBits, maxBits, floor(log2(n / targetOccupancy)))` with the
    * exact `length(bin(x)) - 1` integer log (engine-identical), and the
    * band count is `64 DIV bits` — at the gate scales the clamp floor
    * keeps the measured recall-bearing split (8 bands × 8 bits: true
    * near-dups land at h = 10-13, random pairs center near 32, clean-band
    * probability ≈ 0.8 at h = 13), while a 100× corpus widens bands and
    * prunes harder (the standard LSH recall-for-occupancy trade; `maxBits`
    * is the deployment's recall floor). The second key component is the
    * payload-length bucket (width 64 bytes; each doc emits its own bucket
    * AND the next one, so any pair within |len diff| < 64 still meets —
    * symmetric double emission). Pairs further apart in length than one
    * bucket are dropped BY CONTRACT — payloads differing by 64+ bytes
    * are not perceptual near-dups at these payload sizes. Candidate loss
    * is the only approximation: hamming is verified exactly, so false
    * positives cannot occur. */
  def phashDedup(documents: DataFrame, maxHamming: Int = 13,
                 width: Int = 64): DataFrame =
    phashDedupOf(phashSignatures(documents, width), maxHamming, width = width)

  /** [[phashDedup]] core over a prebuilt (doc_id, phash, plen) signature
    * relation — the pure-read path over the persisted
    * [[graft.sources.PhashLayout]] artifact. Deliberately uncached: a
    * parquet-backed signature relation keeps honest scan stats (the
    * PairsLayout rule), and the two band-join sides re-scan a one-row-per-
    * doc, 64-char-string relation — re-reading it is cheaper than the
    * broadcast-lock-in exposure a cache would create. */
  def phashDedupOf(sig: DataFrame, maxHamming: Int = 13,
                   targetOccupancy: Int = 64, minBits: Int = 8,
                   maxBits: Int = 16, lenBucket: Int = 64,
                   width: Int = 64): DataFrame = {
    require(width > 0 && width % 32 == 0, s"signature width $width must be a positive multiple of 32")
    val nb = sig.agg(count(lit(1)).as("n"))
      .select(greatest(lit(minBits), least(lit(maxBits),
        length(bin(expr(s"n DIV $targetOccupancy"))) - 1)).cast("int").as("bits"))
    // narrow band rows: the signature string does NOT ride the band
    // shuffle — the verify join-back below re-reads it from the artifact.
    // Band count = width DIV bits: doubling the signature width doubles
    // the band count at equal bits — the recall knob a longer signature
    // buys — or doubles the bit budget at equal band count (the
    // occupancy knob); both derive from `width` here.
    val bands = sig.crossJoin(broadcast(nb))
      .select(col("doc_id"), col("phash"), col("bits"),
        expr(s"plen DIV $lenBucket").as("lb0"),
        explode(expr(s"sequence(0, $width DIV bits - 1)")).as("band"))
      .select(col("doc_id"), col("band"),
        expr("substring(phash, band * bits + 1, bits)").as("bkey"),
        explode(expr("array(lb0, lb0 + CAST(1 AS BIGINT))")).as("lb"))
    // Candidate-first (the CLAUDE.md verify rule): DISTINCT (d1, d2)
    // BEFORE the 64-term hamming — a pair can collide in up to
    // 2·nbands band rows (double length-probe emission), and the first
    // cut evaluated hamming per collision (38.6M evaluations for ~14M
    // distinct pairs at sf1). The signature join-back reads the narrow
    // persisted relation with honest stats (broadcast at test scale,
    // doc-id shuffle join at corpus scale).
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.lb") === col("y.lb") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // hamming via two 32-bit integer halves + bit_count(xor): the bit
    // string converts ONCE per doc (map-side, 2 convs over the narrow
    // signature relation), and the per-pair work is two xor+popcounts —
    // the 64-term substring-compare form allocated 128 single-char
    // strings per candidate and measured ~2× the whole query at sf1's
    // ~14M pairs. Values are identical integers, so the oracle keeps the
    // positional-compare mirror unchanged.
    val chunks = width / 32
    val s = sig.select(col("doc_id") +: (0 until chunks).map(i =>
      conv(substring(col("phash"), i * 32 + 1, 32), 2, 10).cast("long").as(s"h$i")): _*)
    val ham = (0 until chunks).map(i =>
        bit_count(col(s"a$i").bitwiseXOR(col(s"b$i"))))
      .reduce(_ + _).cast("long")
    cand
      .join(s.select(col("doc_id").as("d1") +:
        (0 until chunks).map(i => col(s"h$i").as(s"a$i")): _*), "d1")
      .join(s.select(col("doc_id").as("d2") +:
        (0 until chunks).map(i => col(s"h$i").as(s"b$i")): _*), "d2")
      .select(col("d1"), col("d2"), ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .withColumn("psim", round(lit(1.0) - col("hamming") / lit(width.toDouble), 6))
      .orderBy(asc("d1"), asc("d2"))
  }

  /** Shared signature CTE chain of the DuckDB mirrors — ends in
    * `sig(doc_id, phash, plen)`, matching [[phashSignatures]] bit for bit. */
  def duckPhashSigCtes(table: String, width: Int = 64): String = {
    val pivot = (0 until width).map(k =>
      s"coalesce(max(CASE WHEN blk = $k THEN bit END), '0')")
      .mkString("concat(", ", ", ")")
    s"""ch AS (SELECT doc_id, len(text)::BIGINT AS l,
       |                   unnest(range(1, len(text) + 1)) AS pos, text
       |            FROM $table WHERE len(text) > 0),
       |cr AS (SELECT doc_id, l, ((pos - 1) * $width) // l AS blk,
       |              ascii(substr(text, pos::INT, 1))::BIGINT AS code FROM ch),
       |blocks AS (SELECT doc_id, blk, CAST(sum(code) AS BIGINT) AS bsum,
       |                  count(*)::BIGINT AS blen
       |           FROM cr GROUP BY doc_id, blk),
       |tot AS (SELECT doc_id, CAST(sum(bsum) AS BIGINT) AS tsum,
       |               CAST(sum(blen) AS BIGINT) AS len
       |        FROM blocks GROUP BY doc_id),
       |bits AS (SELECT b.doc_id, b.blk,
       |                CASE WHEN b.bsum * t.len > t.tsum * b.blen
       |                     THEN '1' ELSE '0' END AS bit
       |         FROM blocks b JOIN tot t USING (doc_id)),
       |sig AS MATERIALIZED (SELECT b.doc_id, $pivot AS phash, max(t.len) AS plen
       |        FROM bits b JOIN tot t USING (doc_id) GROUP BY b.doc_id)""".stripMargin
  }

  /** DuckDB mirror of [[phashDedup]] — same integer block bits, 64-term
    * pivot signature, corpus-relative band derivation, hamming verify. */
  def duckPhashDedup(table: String, maxHamming: Int = 13,
                     targetOccupancy: Int = 64, minBits: Int = 8,
                     maxBits: Int = 16, width: Int = 64): String = {
    import graft.functions.TextFns.duckHamming
    s"""WITH ${duckPhashSigCtes(table, width)},
       |nb AS (SELECT CAST(greatest($minBits, least($maxBits,
       |               length(bin(count(*) // $targetOccupancy)) - 1)) AS INT) AS bits
       |       FROM sig),
       |br AS (SELECT s.doc_id, s.phash, s.plen, nb.bits,
       |              unnest(range(0, $width // nb.bits)) AS band
       |       FROM sig s, nb),
       |bands AS (SELECT doc_id, phash, band,
       |                 substr(phash, (band * bits + 1)::INT, bits) AS bkey,
       |                 plen // 64 + probe AS lb
       |          FROM br, (SELECT unnest([0, 1]) AS probe)),
       |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
       |                x.phash AS p1, y.phash AS p2
       |         FROM bands x JOIN bands y
       |         ON x.band = y.band AND x.bkey = y.bkey AND x.lb = y.lb
       |            AND x.doc_id < y.doc_id),
       |h AS (SELECT d1, d2, (${duckHamming("p1", "p2", width)})::BIGINT AS hamming
       |      FROM cand)
       |SELECT d1, d2, hamming, round(1.0 - hamming / $width.0, 6) AS psim
       |FROM h WHERE hamming <= $maxHamming ORDER BY d1, d2""".stripMargin
  }

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
