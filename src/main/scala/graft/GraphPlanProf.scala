package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan probe for the bucketed graph artifact (round-10 verdict #6's
  * "Done" check): prints the hop-join plan of
  * [[graft.operators.NnDescent.graphSearch]]'s expansion step against
  * the stored graph, twice —
  *
  *   1. default planner: the ≤beam-row side broadcasts, the stored side
  *      streams (no Exchange anywhere — the test-scale reality);
  *   2. broadcast DISABLED (autoBroadcastJoinThreshold = -1, the
  *      corpus-scale shape where the probe side outgrows the broadcast
  *      budget): the join falls back to shuffle — and the bucketed scan
  *      is what keeps the STORED side exchange-free (only the beam side
  *      exchanges). Against an UNBUCKETED copy of the same relation the
  *      probe also prints the counter-plan, which exchanges the stored
  *      side too — the measured ~3×/decade signature-probe term.
  *
  * Usage: runMain graft.GraphPlanProf [sfDir]
  */
object GraphPlanProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.embeddings(spark, sfDir)
    val (g, _) = graft.sources.GraphLayout.ensureArt(spark, e, sfDir, k = 16)
    val beam = e.select(col("vec_id")).orderBy(asc("vec_id")).limit(8)
    def hopPlan(graph: org.apache.spark.sql.DataFrame): String = {
      val hop = graph.select(col("vec_id"), col("nbr")).join(beam, "vec_id")
      hop.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    }
    println("=== hop join, default planner (beam broadcasts) ===")
    val p1 = hopPlan(g)
    println(p1)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    println("=== hop join, broadcast disabled (corpus-scale fallback) ===")
    val p2 = hopPlan(g)
    println(p2)
    // counter-plan: same relation, unbucketed
    val flat = g.sparkSession.read
      .parquet(graft.sources.GraphLayout.dirFor(sfDir, 16, 4, 2) + "/graph")
    println("=== counter-plan: UNBUCKETED stored side, broadcast disabled ===")
    println(hopPlan(flat))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val _ = (p1, p2)
    spark.stop()
  }
}
