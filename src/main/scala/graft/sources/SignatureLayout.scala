package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Persisted MinHash SIGNATURE index — the corpus-side state that makes
  * incremental near-dup maintenance O(batch), round-8 verdict #2. Three
  * relations under a pair-artifact dir:
  *
  *   - `bands`    (doc_id, band, bkey) — the LSH band index the ingest
  *     probe equijoins (new × old candidates);
  *   - `shingles` (doc_id, s)          — the distinct shingle rows the
  *     candidate-first exact-Jaccard verify intersects;
  *   - `sizes`    (doc_id, n)          — per-doc shingle counts for the
  *     Jaccard denominator (persisted so a probe never re-aggregates the
  *     corpus-scale shingle relation per batch).
  *
  * Before this layout existed, [[PairsLayout.upsert]] re-shingled and
  * re-signed the WHOLE corpus on every ingest batch — the one operator
  * that runs most often did O(corpus) work per call. With it, a batch
  * costs one batch-side shingle pass plus joins whose corpus sides are
  * pure reads.
  *
  * BUCKETED layout (round-9 verdict #3): all three relations are Hive-
  * style bucketed tables, CLUSTERED BY their probe join keys EXACTLY —
  * `bands` by (band, bkey), `shingles` by (doc_id, s), `sizes` by
  * (doc_id) — so every corpus-side join in the probe arrives
  * PRE-PARTITIONED and plans with NO corpus-side Exchange: the candidate
  * equijoin on (band, bkey), the verify intersection on (d2, s), the
  * denominator join on d2. Exact keys, not a subset, deliberately:
  * `spark.sql.requireAllClusterKeysForCoPartition` defaults true, so a
  * subset-key bucketing (bkey alone, doc_id alone) is IGNORED for join
  * co-partitioning and the Exchange comes back — plan-verified the hard
  * way (exchanges=14 with subset keys, corpus scans exchange-free with
  * exact keys; the PairsLayoutSpec plan test pins this). The shuffle
  * this deletes was the measured ~4×/decade growth term in the probe
  * (SCALE.md round-9 table) — the batch side still exchanges, but it is
  * O(batch). Bucket-local sorts remain (append batches mean multiple
  * files per bucket); the Exchange write+read of the corpus relation is
  * the term that mattered. Tables are EXTERNAL (explicit LOCATION):
  * [[readRel]] re-registers the DDL in a fresh JVM's in-memory catalog
  * from the layout's own metadata file, so the on-disk artifact — not
  * the catalog — is the durable state. At 100 TB the bucket count scales
  * with the corpus (a layout parameter, default 32 to match local[32]);
  * a deployment re-buckets at the same cadence it compacts.
  *
  * Append protocol ([[stageAppend]]/[[commitAppend]]): batch deltas are
  * staged by Spark jobs FIRST (the failure-prone part) as bucketed files
  * in `stage_*` dirs, then committed by cheap per-file renames that KEEP
  * the `_NNNNN` bucket suffix Spark parses from bucketed file names (the
  * staged bucket assignment stays valid — same hash, same count) and
  * adopt the caller's batch-keyed prefix, so a crashed re-run REPLACES
  * its own delta instead of duplicating it. The caller
  * ([[PairsLayout.upsert]]) commits in the order signatures → pairs →
  * per-batch marker and owns the recovery contract — see its idempotence
  * scaladoc (round-9 ADVICE #1; the earlier claim that `d1 =!= d2` alone
  * made re-runs benign was wrong: it drops only identical-doc self-pairs,
  * not duplicate appends). A real deployment puts a table format with
  * atomic commit under this seam ([[IndexBuild]] swap scaladoc); the
  * commit ORDER and marker-last rule are the parts that must survive
  * that swap.
  */
object SignatureLayout {

  /** (relation, bucket columns) — each relation clusters on EXACTLY the
    * join keys its probe-side consumer uses (see the co-partitioning
    * note above). */
  private val Rels = Seq(
    "bands" -> Seq("band", "bkey"),
    "shingles" -> Seq("doc_id", "s"),
    "sizes" -> Seq("doc_id"))

  /** Bucket count for a NEW layout. Matches local[32]; a deployment sizes
    * this to the corpus (buckets ≈ corpus / healthy-partition-size). */
  private val DefaultBuckets = 32

  private def tableName(dir: String, rel: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(dir).getAbsolutePath.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"graft_sig_${h}_$rel"
  }

  private def absPath(dir: String, rel: String): String =
    new java.io.File(s"$dir/$rel").getAbsolutePath

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Await EVERY concurrent relation write, then rethrow the first
    * failure (round-13 ADVICE): `futures.foreach(Await.result)` rethrows
    * on the first failed relation while sibling futures keep staging in
    * the background — a same-JVM retry then races DROP TABLE / fs.delete
    * / Overwrite against the orphaned writer on the same path. Draining
    * everything first means no detached writer ever outlives the call. */
  private[sources] def drainAll(writes: Seq[scala.concurrent.Future[_]]): Unit = {
    import scala.concurrent.Await
    import scala.concurrent.duration.Duration
    val rs = writes.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    rs.collectFirst { case scala.util.Failure(e) => throw e }
    ()
  }

  /** Serialized bucket spec — count AND columns, so a layout written
    * under a different column spec can never be re-declared wrongly (a
    * mis-declared CLUSTERED BY silently mis-joins: rows land in buckets
    * by the WRITER's hash, the reader assumes its own). */
  private def specString(buckets: Int): String =
    buckets + ";" + Rels.map { case (r, cs) => s"$r:${cs.mkString(",")}" }.mkString(";")

  /** Buckets of an existing layout, from its `_graft_buckets` sidecar
    * (underscore prefix — invisible to parquet scans). Absent for
    * pre-bucketing layouts → 0 → plain-parquet fallback reads. Loudly
    * rejects a layout whose recorded bucket COLUMNS differ from this
    * build's [[Rels]] — the fix is a rewrite via [[write]], never a
    * reinterpretation. */
  private def storedBuckets(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(absPath(dir, "_graft_buckets"))
    val f = fs(spark, p)
    if (!f.exists(p)) 0
    else {
      val in = f.open(p)
      val raw = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      val b = raw.takeWhile(_ != ';').toInt
      require(raw == specString(b),
        s"signature layout at $dir was bucketed as '$raw', this build expects " +
          s"'${specString(b)}' — rewrite the layout (SignatureLayout.write)")
      b
    }
  }

  /** Overwrite the signature index from a build pass' band + shingle
    * relations (sizes derived here — one aggregate over the cached
    * shingle relation the caller already holds). */
  def write(spark: SparkSession, dir: String,
            bands: DataFrame, shingles: DataFrame,
            buckets: Int = DefaultBuckets): Unit = {
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfs = Map("bands" -> bands, "shingles" -> shingles, "sizes" -> sizes)
    // concurrent like [[compact]]: independent writers on disjoint paths;
    // the shared cached shingle subtree is safe under concurrent first
    // touch (BlockManager's per-block locking — worst case a bounded
    // duplicate partition compute on the first materialization)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = Rels.map { case (rel, bcols) => Future {
      val t = tableName(dir, rel)
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val live = new org.apache.hadoop.fs.Path(absPath(dir, rel))
      val f = fs(spark, live)
      if (f.exists(live)) { f.delete(live, true); () }
      // repartition by the bucket columns with numPartitions == buckets:
      // HashPartitioning and the bucket-id function are the same murmur3
      // pmod, so each task holds exactly one bucket — one file per bucket
      // per snapshot, not tasks × buckets
      dfs(rel).repartition(buckets, bcols.map(col): _*)
        .write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", absPath(dir, rel))
        .bucketBy(buckets, bcols.head, bcols.tail: _*).sortBy(bcols.head, bcols.tail: _*)
        .saveAsTable(t)
    }}
    drainAll(writes)
    val meta = new org.apache.hadoop.fs.Path(absPath(dir, "_graft_buckets"))
    val out = fs(spark, meta).create(meta, true)
    try out.write(specString(buckets).getBytes("UTF-8")) finally out.close()
  }

  /** Register the external bucketed table in THIS JVM's catalog if absent
    * (the artifact on disk is the durable state; the in-memory catalog is
    * per-process), and return it. Falls back to a plain parquet read when
    * the dir predates the bucketed layout. */
  private def readRel(spark: SparkSession, dir: String, rel: String): DataFrame = {
    recoverRel(spark, dir, rel) // self-heal a crashed compaction swap
    val b = storedBuckets(spark, dir)
    if (b == 0) spark.read.parquet(s"$dir/$rel")
    else {
      val t = tableName(dir, rel)
      if (!spark.catalog.tableExists(t)) {
        val bcols = Rels.toMap.apply(rel).mkString(", ")
        val schema = spark.read.parquet(s"$dir/$rel").schema.toDDL
        spark.sql(
          s"""CREATE TABLE $t ($schema) USING parquet
             |CLUSTERED BY ($bcols) SORTED BY ($bcols) INTO $b BUCKETS
             |LOCATION '${absPath(dir, rel)}'""".stripMargin)
      }
      spark.table(t)
    }
  }

  def readBands(spark: SparkSession, dir: String): DataFrame = readRel(spark, dir, "bands")
  def readShingles(spark: SparkSession, dir: String): DataFrame = readRel(spark, dir, "shingles")
  def readSizes(spark: SparkSession, dir: String): DataFrame = readRel(spark, dir, "sizes")

  /** Stage a batch's signature deltas as BUCKETED files under `stage_*`
    * (runs the Spark jobs; commits nothing live). Bucket count mirrors the
    * live layout, so the staged files' bucket ids stay valid after the
    * rename-commit. Batch doc_ids must be disjoint from the stored
    * corpus' — the [[PairsLayout.upsert]] ingest contract. */
  def stageAppend(spark: SparkSession, dir: String,
                  bands: DataFrame, shingles: DataFrame): Unit = {
    val b = math.max(1, storedBuckets(spark, dir))
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfs = Map("bands" -> bands, "shingles" -> shingles, "sizes" -> sizes)
    // concurrent like [[write]] (round-13: the sequential form left most
    // cores idle in each small batch-sized job's stage tail — the same
    // measured finding that made write/compact concurrent in round 12);
    // disjoint stage paths, shared cached shingle subtree BlockManager-safe
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = Rels.map { case (rel, bcols) => Future {
      val st = tableName(dir, s"stage_$rel")
      spark.sql(s"DROP TABLE IF EXISTS $st")
      val stagePath = new org.apache.hadoop.fs.Path(absPath(dir, s"stage_$rel"))
      val f = fs(spark, stagePath)
      if (f.exists(stagePath)) { f.delete(stagePath, true); () }
      dfs(rel).repartition(b, bcols.map(col): _*)
        .write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", absPath(dir, s"stage_$rel"))
        .bucketBy(b, bcols.head, bcols.tail: _*).sortBy(bcols.head, bcols.tail: _*)
        .saveAsTable(st)
      // external table: dropping frees the name, files stay staged
      spark.sql(s"DROP TABLE $st")
    }}
    drainAll(writes)
  }

  /** Commit previously staged deltas into the live relations under the
    * batch's file-name prefix — per-file renames only, no Spark jobs. */
  def commitAppend(spark: SparkSession, dir: String, prefix: String): Unit =
    Rels.foreach { case (rel, _) =>
      moveInto(spark, s"$dir/stage_$rel", s"$dir/$rel", prefix)
      val t = tableName(dir, rel)
      if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
    }

  /** Compact the three signature relations — the maintenance pass the
    * append protocol's scaladoc promises (round-9 ADVICE #4): every
    * [[stageAppend]] adds per-batch delta files to each bucket, so a
    * long-running ingest grows the per-bucket file count without bound,
    * degrading probe read planning and widening the bucket-local sorts.
    * Compaction rewrites each relation to ONE file per bucket and —
    * because "a deployment re-buckets at the same cadence it compacts"
    * (layout scaladoc) — optionally re-buckets: pass `buckets > 0` to
    * change the bucket count as part of the same rewrite.
    *
    * Content-preserving by construction (rows in == rows out, spec-pinned
    * probe ≡ pre-compaction), which makes the crash contract simple:
    * each relation swaps independently (stage → rename live aside →
    * rename stage in → drop old), and ANY mix of compacted and
    * uncompacted relations is still correct. The only unsafe window is
    * between the two renames of one relation — the live dir is absent —
    * and [[recoverRel]] (run on entry here AND by every [[readRel]])
    * restores the set-aside dir, so a crashed compaction self-heals on
    * the next touch. Re-bucketing additionally drops the `_graft_buckets`
    * sidecar FIRST and rewrites it LAST: between the two, readers fall
    * back to plain parquet scans — correct, just exchange-paying — so a
    * crash mid-re-bucket can never mis-declare bucket ids (a wrong
    * CLUSTERED BY silently mis-joins; a missing one only costs a
    * shuffle). Batch markers under `_batches` are untouched: compaction
    * changes FILES, not batch history — a replayed batch still no-ops on
    * its marker. Single concurrent writer, as everywhere in this layout;
    * a table format with atomic commit subsumes all of this (the
    * [[IndexBuild]] swap note). */
  def compact(spark: SparkSession, dir: String, buckets: Int = 0): Unit = {
    Rels.foreach { case (rel, _) => recoverRel(spark, dir, rel) }
    val stored = storedBuckets(spark, dir)
    val b = if (buckets > 0) buckets else math.max(stored, DefaultBuckets)
    val rebucket = b != stored
    val metaP = new org.apache.hadoop.fs.Path(absPath(dir, "_graft_buckets"))
    if (rebucket && fs(spark, metaP).exists(metaP)) {
      // plain-read fallback window opens; also retire this JVM's table
      // registrations (they carry the OLD bucket declaration)
      fs(spark, metaP).delete(metaP, false)
      Rels.foreach { case (rel, _) =>
        spark.sql(s"DROP TABLE IF EXISTS ${tableName(dir, rel)}") }
    }
    // the three relation rewrites are independent single-writer jobs on
    // disjoint paths/table names — submit them CONCURRENTLY (Spark's
    // scheduler interleaves their stages across the same executor pool;
    // measured ~2× on q_pairs_compact's wall, where the sequential form
    // left most of the 32 cores idle during each small rewrite's tail).
    // Each relation still stages + swaps independently, so the crash
    // contract above is unchanged — any mix of compacted and uncompacted
    // relations remains correct whatever order the futures land in.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val rewrites = Rels.map { case (rel, bcols) => Future {
      val src = spark.read.parquet(s"$dir/$rel")
      val st = tableName(dir, s"compact_$rel")
      spark.sql(s"DROP TABLE IF EXISTS $st")
      val stagePath = new org.apache.hadoop.fs.Path(absPath(dir, s"compact_$rel"))
      val f = fs(spark, stagePath)
      if (f.exists(stagePath)) { f.delete(stagePath, true); () }
      src.repartition(b, bcols.map(col): _*)
        .write.mode(SaveMode.Overwrite).format("parquet")
        .option("path", absPath(dir, s"compact_$rel"))
        .bucketBy(b, bcols.head, bcols.tail: _*).sortBy(bcols.head, bcols.tail: _*)
        .saveAsTable(st)
      spark.sql(s"DROP TABLE $st")
      swapIn(spark, s"$dir/$rel", s"$dir/compact_$rel")
      val t = tableName(dir, rel)
      if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
    }}
    drainAll(rewrites)
    if (rebucket) {
      val out = fs(spark, metaP).create(metaP, true)
      try out.write(specString(b).getBytes("UTF-8")) finally out.close()
    }
  }

  /** Restore a relation whose compaction crashed between its two renames
    * (live dir absent, `_old` set-aside present). Idempotent no-op
    * otherwise. */
  private def recoverRel(spark: SparkSession, dir: String, rel: String): Unit =
    recoverPath(spark, absPath(dir, rel))

  private[sources] def recoverPath(spark: SparkSession, livePath: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(livePath)
    val old = new org.apache.hadoop.fs.Path(livePath + "_old")
    val f = fs(spark, live)
    if (!f.exists(live) && f.exists(old)) {
      if (!f.rename(old, live))
        throw new java.io.IOException(s"compaction recovery: rename $old -> $live failed")
    }
  }

  /** Replace `live` with `stage` by two renames; the set-aside old dir is
    * dropped only after the new one is in place. */
  private[sources] def swapIn(spark: SparkSession, live: String, stage: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val livep = new org.apache.hadoop.fs.Path(live)
    val stagep = new org.apache.hadoop.fs.Path(stage)
    val oldp = new org.apache.hadoop.fs.Path(live + "_old")
    val f = livep.getFileSystem(conf)
    if (f.exists(oldp)) { f.delete(oldp, true); () }
    if (f.exists(livep) && !f.rename(livep, oldp))
      throw new java.io.IOException(s"compaction: set-aside $livep -> $oldp failed")
    if (!f.rename(stagep, livep))
      throw new java.io.IOException(s"compaction: swap-in $stagep -> $livep failed")
    f.delete(oldp, true)
  }

  /** Bucket-id suffix of a staged bucketed file name
    * (`part-00000-<uuid>_00012.c000.snappy.parquet` → `_00012`), empty
    * for non-bucketed files (the pairs relation). The suffix must survive
    * the rename: Spark parses a file's bucket id from the trailing
    * `_NNNNN` group. */
  private val BucketSuffix = "_(\\d+)\\.".r

  /** Move every data file of a staged parquet dir into the live dir under
    * batch-keyed names `<prefix>-<i>[_<bucket>].parquet` and drop the
    * stage.
    *
    * The rename TARGET names are what make a batch commit IDEMPOTENT
    * (round-9 ADVICE #1): any live files already carrying this batch's
    * prefix — a previous attempt that crashed between commit and marker —
    * are deleted first, so a re-run REPLACES its batch's delta instead of
    * appending it twice. Prefixes are md5-derived by the caller
    * ([[PairsLayout.upsert]]), so distinct batches can never collide and
    * no glob metacharacters reach the filesystem. Rename failure is
    * reported by RETURN VALUE (round-4 review lesson), so each one is
    * checked. */
  private[sources] def moveInto(spark: SparkSession, stage: String, live: String,
                                prefix: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(stage)
    val dst = new org.apache.hadoop.fs.Path(live)
    val f = src.getFileSystem(conf)
    if (!f.exists(dst)) f.mkdirs(dst)
    f.listStatus(dst).filter(_.getPath.getName.startsWith(s"$prefix-")).foreach { s =>
      if (!f.delete(s.getPath, false))
        throw new java.io.IOException(s"append commit: replace-delete ${s.getPath} failed")
    }
    f.listStatus(src).filter(_.getPath.getName.startsWith("part-")).zipWithIndex
      .foreach { case (s, i) =>
        val bucket = BucketSuffix.findFirstMatchIn(s.getPath.getName)
          .map(m => s"_${m.group(1)}").getOrElse("")
        val to = new org.apache.hadoop.fs.Path(dst, s"$prefix-$i$bucket.parquet")
        if (!f.rename(s.getPath, to))
          throw new java.io.IOException(s"append commit: rename ${s.getPath} -> $to failed")
      }
    f.delete(src, true)
  }
}
