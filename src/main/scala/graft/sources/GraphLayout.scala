package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted k-NN-graph artifact ([[graft.operators.NnDescent.knnGraph]]
  * output (vec_id, nbr, rn, sim)) — the navigable-graph half of the
  * ChromaDB/HNSW parity story: the reference's vector store queries a
  * prebuilt in-memory graph; here the graph is a parquet relation built
  * once per corpus snapshot and walked by
  * [[graft.operators.NnDescent.graphSearch]].
  *
  * Round-11 layout (round-10 verdict #6 + ADVICE #4), two relations per
  * artifact dir:
  *
  *   - `graph` (vec_id, nbr, rn, sim) — a Hive-bucketed external table
  *     CLUSTERED BY (vec_id), the [[SignatureLayout]] precedent: every
  *     stored-side join keyed by vec_id (search hop expansion, upsert
  *     hop refinement, old-list re-cut) arrives PRE-PARTITIONED. At test
  *     scale the beam side broadcasts and the bucketing is latent; the
  *     moment a query batch or ingest batch outgrows the broadcast
  *     threshold the planner's fallback is SMJ/shuffled-hash, and the
  *     bucketing is what keeps the corpus-scale side exchange-free (the
  *     measured ~3×/decade signature-probe lesson, SCALE.md).
  *   - `signs` (vec_id, sgn) — the full-width sign-LSH strings the graph
  *     was banded with. Query-time seeding and per-batch upsert banding
  *     probe THIS narrow relation instead of re-scanning the wide
  *     embedding column per search (ADVICE #4: the walk was "hops tiny
  *     jobs" but its seeding was a corpus scan). Band bits stay derived
  *     in-plan from the count of this relation — same value, same
  *     oracle, as the recompute path.
  *
  * Contracts are [[CentroidLayout]]'s: `ensure` builds once per JVM run,
  * `rebuild` is the unconditional pricing path (q_knn_graph), reads stay
  * uncached (the probe joins a tiny beam against it — honest stats keep
  * the broadcast direction right). The stored `sim` column is the display
  * rounding; the search re-scores against the query exactly, so rounding
  * never reaches ranking arithmetic. */
object GraphLayout {

  private val built = new BuildLatch

  /** Bucket count for new artifacts — matches local[32]; a deployment
    * sizes this to the corpus like SignatureLayout's default. */
  private val Buckets = 32

  /** Sidecar guarding the bucket declaration (a mis-declared CLUSTERED
    * BY silently mis-joins). Absent → pre-r11 plain-parquet artifact →
    * fallback reads. */
  private val Spec = s"$Buckets;graph:vec_id;vectors:vec_id"

  def dirFor(sfDir: String, k: Int, tables: Int, rounds: Int): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|knngraph2|$k|$tables|$rounds".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"out/artifacts/knngraph-$h"
  }

  // ------------------------------------------------- bucketed-rel helpers

  private def tableName(path: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(path).getAbsolutePath.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"graft_graph_$h"
  }

  private def absPath(p: String): String = new java.io.File(p).getAbsolutePath

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeSpec(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(absPath(s"$dir/_graft_buckets"))
    val out = fs(spark, p).create(p, true)
    try out.write(Spec.getBytes("UTF-8")) finally out.close()
  }

  private def hasSpec(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(absPath(s"$dir/_graft_buckets"))
    val f = fs(spark, p)
    if (!f.exists(p)) false
    else {
      val in = f.open(p)
      val raw = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      require(raw == Spec,
        s"graph layout at $dir was bucketed as '$raw', this build expects " +
          s"'$Spec' — rewrite the artifact")
      true
    }
  }

  /** Write `df` as a bucketed-by-(vec_id) external table at `path`
    * (repartition to one bucket per task — same murmur3 pmod as the
    * bucket-id function, so one file per bucket per snapshot), then drop
    * the table name: the files are the durable state, [[readBucketed]]
    * re-registers in any JVM. `sortCols` must start with vec_id. */
  private def stageBucketed(spark: SparkSession, df: DataFrame, path: String,
                            sortCols: Seq[String]): Unit = {
    val t = tableName(path)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val p = new org.apache.hadoop.fs.Path(absPath(path))
    val f = fs(spark, p)
    if (f.exists(p)) { f.delete(p, true); () }
    df.repartition(Buckets, col("vec_id"))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", absPath(path))
      .bucketBy(Buckets, "vec_id").sortBy(sortCols.head, sortCols.tail: _*)
      .saveAsTable(t)
    spark.sql(s"DROP TABLE $t")
  }

  /** Register (if needed) and read the bucketed external table at `path`;
    * plain-parquet fallback when the artifact predates the bucketed
    * layout (no sidecar in `specDir`). */
  private def readBucketed(spark: SparkSession, specDir: String, path: String,
                           sortCols: Seq[String]): DataFrame = {
    SignatureLayout.recoverPath(spark, absPath(path))
    if (!hasSpec(spark, specDir)) spark.read.parquet(path)
    else {
      val t = tableName(path)
      if (!spark.catalog.tableExists(t)) {
        val schema = spark.read.parquet(path).schema.toDDL
        spark.sql(
          s"""CREATE TABLE $t ($schema) USING parquet
             |CLUSTERED BY (vec_id) SORTED BY (${sortCols.mkString(", ")})
             |INTO $Buckets BUCKETS
             |LOCATION '${absPath(path)}'""".stripMargin)
      }
      spark.table(t)
    }
  }

  private def refresh(spark: SparkSession, path: String): Unit = {
    val t = tableName(path)
    if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
  }

  // ------------------------------------------------------ static artifact

  private def writeArt(spark: SparkSession, index: DataFrame, dir: String,
                       k: Int, tables: Int, rounds: Int): Unit = {
    // independent relations on disjoint paths → concurrent Futures (the
    // PairsLayout.compact / SignatureLayout.write precedent: sequential
    // submission leaves cores idle in each small job's stage tail); the
    // cheap signs write hides entirely under the graph build
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = Seq(
      Future(stageBucketed(spark,
        graft.operators.NnDescent.knnGraph(index, k, tables, rounds),
        s"$dir/graph", Seq("vec_id", "rn"))),
      Future(graft.operators.NnDescent.signsOf(index, tables)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/signs")))
    writes.foreach(Await.result(_, Duration.Inf))
    writeSpec(spark, dir)
  }

  /** (graph, signs) — the pair every stored-artifact consumer wants: the
    * bucketed graph for hop joins, the narrow sign relation for seed
    * probes. */
  def ensureArt(spark: SparkSession, index: DataFrame, sfDir: String,
                k: Int = 8, tables: Int = 4,
                rounds: Int = 2): (DataFrame, DataFrame) = {
    val dir = dirFor(sfDir, k, tables, rounds)
    built.onceIfAbsent(dir) {
      writeArt(spark, index, dir, k, tables, rounds)
    }
    (readBucketed(spark, dir, s"$dir/graph", Seq("vec_id", "rn")),
      spark.read.parquet(s"$dir/signs"))
  }

  def ensure(spark: SparkSession, index: DataFrame, sfDir: String,
             k: Int = 8, tables: Int = 4, rounds: Int = 2): DataFrame =
    ensureArt(spark, index, sfDir, k, tables, rounds)._1

  /** Unconditional rebuild + read-back — the pricing entry (q_knn_graph). */
  def rebuild(spark: SparkSession, index: DataFrame, sfDir: String,
              k: Int = 8, tables: Int = 4, rounds: Int = 2): DataFrame = {
    val dir = dirFor(sfDir, k, tables, rounds)
    built.always(dir) {
      writeArt(spark, index, dir, k, tables, rounds)
    }
    readBucketed(spark, dir, s"$dir/graph", Seq("vec_id", "rn"))
  }

  // ------------------------------------------ streaming maintenance layout

  /** Base snapshot for continuous maintenance: the graph, the vectors it
    * was built from (each [[upsertStored]] needs the accumulated old
    * vectors to rescore re-cut lists), and their sign strings (so a
    * batch's banding probes a narrow stored relation instead of
    * re-projecting the corpus — ADVICE #4 applied to the ingest path).
    * Graph and vectors are bucketed by vec_id; signs are a plain
    * append-able relation. Deleting the dir first also invalidates any
    * streaming checkpoint beneath it (the PairsLayout.writeIndexed
    * convention). */
  def writeBase(spark: SparkSession, old: DataFrame, dir: String,
                k: Int = 8, tables: Int = 4, rounds: Int = 2): Unit = {
    val p = new org.apache.hadoop.fs.Path(absPath(dir))
    val f = fs(spark, p)
    if (f.exists(p)) { f.delete(p, true); () }
    // three independent relations, disjoint paths → concurrent (writeArt
    // note); crash contract unchanged — the dir was deleted above, so any
    // partial mix is rebuilt on the next writeBase
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = Seq(
      Future(stageBucketed(spark,
        graft.operators.NnDescent.knnGraph(old, k, tables, rounds),
        s"$dir/graph", Seq("vec_id", "rn"))),
      Future(stageBucketed(spark, old.select("vec_id", "embedding"),
        s"$dir/vectors", Seq("vec_id"))),
      Future(graft.operators.NnDescent.signsOf(old, tables)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/signs")))
    writes.foreach(Await.result(_, Duration.Inf))
    writeSpec(spark, dir)
  }

  /** One micro-batch of graph maintenance against the STORED artifact:
    * read graph + accumulated vectors + signs (bucketed/narrow — the
    * corpus embedding column is never re-scanned, and vec_id-keyed
    * stored sides arrive pre-partitioned), place the batch
    * ([[graft.operators.NnDescent.graphUpsertWith]] — the base graph is
    * never rebuilt), stage-write the updated graph and swap it in
    * (crash-recovered by the [[SignatureLayout]] rename protocol), then
    * append the batch's vectors (bucket-suffixed files — the staged
    * bucket ids stay valid under rename) and signs under the batch's
    * file prefix so the next micro-batch sees them. Replay safety is
    * [[graft.operators.NnDescent.graphUpsertWith]]'s anti-join guards:
    * a batch re-applied after a crash between the graph swap and the
    * checkpoint commit (or after its vector append) reduces to a valid
    * upsert, never duplicate lists. NOTE the graph relation is O(n·k)
    * rows and is REWRITTEN per batch — unlike the append-only pairs
    * artifact; honest cost of an artifact whose per-row content (every
    * node's top-k) is corpus-dependent. */
  def upsertStored(spark: SparkSession, dir: String, batch: DataFrame,
                   batchId: String, k: Int = 8, tables: Int = 4,
                   targetOcc: Int = 16): Unit = {
    val oldVecs = readBucketed(spark, dir, s"$dir/vectors", Seq("vec_id"))
    val oldSigns = spark.read.parquet(s"$dir/signs")
    val g = readBucketed(spark, dir, s"$dir/graph", Seq("vec_id", "rn"))
      .select(col("vec_id").as("a"), col("nbr").as("b"))
    stageBucketed(spark,
      graft.operators.NnDescent
        .graphUpsertWith(oldVecs, g, batch.select("vec_id", "embedding"),
          k, tables, targetOcc, oldSigns = Some(oldSigns)),
      s"$dir/graph_stage", Seq("vec_id", "rn"))
    SignatureLayout.swapIn(spark, s"$dir/graph", s"$dir/graph_stage")
    refresh(spark, s"$dir/graph")
    // batch vectors: bucketed stage + suffix-preserving rename append
    stageBucketed(spark, batch.select("vec_id", "embedding"),
      s"$dir/vec_stage", Seq("vec_id"))
    SignatureLayout.moveInto(spark, s"$dir/vec_stage", s"$dir/vectors", batchId)
    refresh(spark, s"$dir/vectors")
    // batch signs: plain append under the same idempotent prefix
    graft.operators.NnDescent
      .signsOf(batch.select("vec_id", "embedding"), tables)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/sign_stage")
    SignatureLayout.moveInto(spark, s"$dir/sign_stage", s"$dir/signs",
      s"$batchId-sg")
  }

  def readGraph(spark: SparkSession, dir: String): DataFrame =
    // self-heals a swap that crashed between its two renames (live dir
    // absent, `_old` set-aside present) — the PairsLayout.read contract,
    // via readBucketed's recoverPath
    readBucketed(spark, dir, s"$dir/graph", Seq("vec_id", "rn"))
}
