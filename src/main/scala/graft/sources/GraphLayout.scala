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
  * Contracts are [[CentroidLayout]]'s: `ensure` builds once per JVM run,
  * `rebuild` is the unconditional pricing path (q_knn_graph), reads stay
  * uncached (the probe joins a tiny beam against it — honest stats keep
  * the broadcast direction right). The stored `sim` column is the display
  * rounding; the search re-scores against the query exactly, so rounding
  * never reaches ranking arithmetic. */
object GraphLayout {

  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def dirFor(sfDir: String, k: Int, tables: Int, rounds: Int): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|knngraph|$k|$tables|$rounds".getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    s"out/artifacts/knngraph-$h"
  }

  def ensure(spark: SparkSession, index: DataFrame, sfDir: String,
             k: Int = 8, tables: Int = 4, rounds: Int = 2): DataFrame = {
    val dir = dirFor(sfDir, k, tables, rounds)
    built.synchronized {
      if (!built.contains(dir)) {
        graft.operators.NnDescent.knnGraph(index, k, tables, rounds)
          .write.mode(SaveMode.Overwrite).parquet(dir)
        built.add(dir)
      }
    }
    spark.read.parquet(dir)
  }

  /** Unconditional rebuild + read-back — the pricing entry (q_knn_graph). */
  def rebuild(spark: SparkSession, index: DataFrame, sfDir: String,
              k: Int = 8, tables: Int = 4, rounds: Int = 2): DataFrame = {
    val dir = dirFor(sfDir, k, tables, rounds)
    built.synchronized {
      graft.operators.NnDescent.knnGraph(index, k, tables, rounds)
        .write.mode(SaveMode.Overwrite).parquet(dir)
      built.add(dir)
    }
    spark.read.parquet(dir)
  }

  // ------------------------------------------ streaming maintenance layout

  /** Base snapshot for continuous maintenance: the graph AND the vectors
    * it was built from, side by side — each [[upsertStored]] needs the
    * accumulated old vectors to rescore re-cut lists. Deleting the dir
    * first also invalidates any streaming checkpoint beneath it (the
    * PairsLayout.writeIndexed convention). */
  def writeBase(spark: SparkSession, old: DataFrame, dir: String,
                k: Int = 8, tables: Int = 4, rounds: Int = 2): Unit = {
    val p = new org.apache.hadoop.fs.Path(new java.io.File(dir).getAbsolutePath)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) { f.delete(p, true); () }
    graft.operators.NnDescent.knnGraph(old, k, tables, rounds)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/graph")
    old.select("vec_id", "embedding")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vectors")
  }

  /** One micro-batch of graph maintenance against the STORED artifact:
    * read graph + accumulated vectors, place the batch
    * ([[graft.operators.NnDescent.graphUpsertWith]] — the base graph is
    * never rebuilt), stage-write the updated graph and swap it in
    * (crash-recovered by the [[SignatureLayout]] rename protocol), then
    * append the batch's vectors under the batch's file prefix so the
    * next micro-batch sees them. NOTE the graph relation is O(n·k) rows
    * and is REWRITTEN per batch — unlike the append-only pairs artifact;
    * honest cost of an artifact whose per-row content (every node's
    * top-k) is corpus-dependent. */
  def upsertStored(spark: SparkSession, dir: String, batch: DataFrame,
                   batchId: String, k: Int = 8, tables: Int = 4,
                   targetOcc: Int = 16): Unit = {
    SignatureLayout.recoverPath(spark, s"$dir/graph")
    val oldVecs = spark.read.parquet(s"$dir/vectors")
    val g = spark.read.parquet(s"$dir/graph")
      .select(col("vec_id").as("a"), col("nbr").as("b"))
    graft.operators.NnDescent
      .graphUpsertWith(oldVecs, g, batch.select("vec_id", "embedding"),
        k, tables, targetOcc)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/graph_stage")
    SignatureLayout.swapIn(spark, s"$dir/graph", s"$dir/graph_stage")
    batch.select("vec_id", "embedding")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/vec_stage")
    SignatureLayout.moveInto(spark, s"$dir/vec_stage", s"$dir/vectors", batchId)
  }

  def readGraph(spark: SparkSession, dir: String): DataFrame = {
    // self-heal a swap that crashed between its two renames (live dir
    // absent, `_old` set-aside present) — the PairsLayout.read contract
    SignatureLayout.recoverPath(spark,
      new java.io.File(s"$dir/graph").getAbsolutePath)
    spark.read.parquet(s"$dir/graph")
  }
}
