package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet // optional: run just these queries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the window-top-k auto-rewrite (graft.plans.TopKPerKey.Rewrite) is ON
    // by default since round 4 (decision record in SCALE.md): the full gate
    // passes under it and the heap prune replaces WindowGroupLimit's local
    // sorts. SPARK_GRAFT_REWRITE=0 is the off-switch.
    if (!sys.env.get("SPARK_GRAFT_REWRITE").contains("0"))
      graft.plans.TopKPerKey.enableRewrite(spark)
    new java.io.File(outDir).mkdirs()
    def deleteRecursively(f: java.io.File): Unit = {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
      f.delete(); ()
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        // stale-dump guard (round-4 review, and a real incident this
        // round): a query failing BEFORE its write used to leave the
        // previous run's parquet intact, and the oracle compare would
        // silently PASS on stale data — delete first, so a failure leaves
        // a missing dir the checker reports as an error
        deleteRecursively(new java.io.File(s"$outDir/$name"))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[verify] $name failed: $e")
          e.getStackTrace.take(4).foreach(f => System.err.println(s"[verify]   at $f"))
        }
        // release any subtree a query cached for intra-query reuse: caches
        // are per-query scratch, never cross-query state (executor memory
        // must stay flat across the 41-query run)
        spark.sharedState.cacheManager.clearCache()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Fail LOUDLY (round-9 verdict #3): the per-query catch above is right
    // for the driver's full-gate sweep (the checker reports each missing
    // dir), but a targeted `only` run — the sf10 campaign shape — used to
    // exit 0 after an ENOSPC'd query and its runbook log read as a pass.
    // Any failure now prints a final FAILED line; a NAMED run also exits
    // nonzero so shell runbooks (`&& echo ok`) cannot misrecord it.
    if (failed.nonEmpty) {
      System.err.println(s"[verify] FAILED: ${failed.mkString(",")}")
      if (only.nonEmpty) sys.exit(1)
    }
  }
}
