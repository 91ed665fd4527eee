package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VecExprs.{bestCentroid, dotc}

/** Distributed Lloyd k-means over the embedding column — the trainer the
  * quantization family's scaladocs point at ("a deployment trains k-means
  * offline and swaps the codebook", [[Knn.pqCodes]]; "re-train or split",
  * [[Knn.ivfStats]]). The reference never trains its index either (ChromaDB
  * default HNSW, /root/reference/coding_agent/tools/indexing_agent.py:61-72);
  * this engine closes its own documented gap instead: IVF and PQ can now run
  * on TRAINED structures, with the recall shift measured (SCALE.md), not
  * asserted.
  *
  * Algorithm: spherical assignment (argmax cosine, lowest-cid tiebreak — the
  * IDENTICAL [[graft.functions.BestCentroid]] semantics the IVF layout uses,
  * so a trained centroid relation is drop-in for [[Knn.topKIvfWith]]), then
  * per-cluster mean update; `iters` fixed rounds, deterministic init = the
  * `k` lowest-vec_id vectors (the same rule as the untrained
  * [[Knn.ivfAssign]] baseline, which makes trained-vs-untrained recall a
  * controlled comparison).
  *
  * Float discipline (the engine-exactness argument): per-dim cluster sums go
  * through order-free DECIMAL(38,12) (the eventStats/ivfStats moments
  * pattern — double addition is partition-order-sensitive, decimal is not);
  * the mean is `CAST(sum AS DOUBLE) / CAST(n AS DOUBLE)` — one IEEE division
  * of two deterministic operands — so the trained centroids, every
  * subsequent assignment, and the final report are bit-identical in Spark
  * and DuckDB. Empty clusters keep their previous centroid (left join +
  * coalesce), mirrored exactly in the oracle.
  *
  * Scale shape: each round is ONE corpus pass — a broadcast cross join of a
  * k-row centroid array (codegen'd BestCentroid, no per-row join fan-out)
  * feeding a posexplode→groupBy(cluster, d) partial-agged sum of k·dims
  * groups; no corpus-keyed window, no self-join, no driver collect. The
  * k-row centroid relation is `localCheckpoint(eager)`ed per round: without
  * the cut, round t's plan embeds round t-1's TWICE (assignment + the
  * empty-cluster fallback join), and lineage re-evaluation doubles per
  * round — O(2^T) corpus scans; with it, training is exactly T scans, the
  * textbook distributed-Lloyd cost. The checkpoint materializes k rows —
  * trivially small — and is an EAGER, self-contained step, so it follows the
  * StreamOps start()/stop() precedent (never mutates session conf, never
  * caches a corpus-cardinality relation; no broadcast-lock-in exposure
  * because only the k-row side is ever a build side).
  */
object KMeans {

  /** Train `k` centroids for `iters` Lloyd rounds.
    * Returns (cid: long, ce: array<double>, cn: double) — the
    * [[Knn.topKIvfWith]]/[[Knn.ivfAssignWith]] centroid-relation contract. */
  def train(index: DataFrame, k: Int = 16, iters: Int = 3): DataFrame = {
    val e = index.select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("ed"))
      .withColumn("nrm", sqrt(dotc(col("ed"), col("ed"))))
    var cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("ed").as("ce"), col("nrm").as("cn"))
    for (_ <- 1 to iters) {
      val centArr = broadcast(
        cent.agg(collect_list(struct(col("cid"), col("ce"), col("cn"))).as("cents")))
      val asg = e.crossJoin(centArr)
        .withColumn("cluster", bestCentroid(col("cents"), col("ed"), col("nrm")))
      // Per-(cluster, dim) decimal sums; count(*) per (cluster, d) equals the
      // cluster's row count because every member contributes every dim.
      val upd = asg
        .select(col("cluster"), posexplode(col("ed")).as(Seq("d", "v")))
        .groupBy("cluster", "d")
        .agg(sum(col("v").cast("decimal(38,12)")).as("s"), count(lit(1)).as("n"))
        .withColumn("m", col("s").cast("double") / col("n").cast("double"))
        .groupBy("cluster")
        .agg(sort_array(collect_list(struct(col("d"), col("m")))).as("dm"))
        // k-row relation: the interpreted transform lambda runs k times over
        // dims-length arrays — the sq8Scales bounded-HOF exemption.
        .select(col("cluster").as("ucid"),
          transform(col("dm"), x => x.getField("m")).as("uce"))
      cent = cent.join(upd, col("cid") === col("ucid"), "left")
        .select(col("cid"), coalesce(col("uce"), col("ce")).as("ce"))
        .withColumn("cn", sqrt(dotc(col("ce"), col("ce"))))
        .localCheckpoint(true)
    }
    cent
  }

  /** Post-training report — [[Knn.ivfStats]] over the TRAINED layout plus
    * the training objective: per-cell fill, mean/min member→centroid cosine
    * (order-free decimal sums), and the centroid norm (a trained spherical
    * centroid's norm < 1 measures cell spread directly). Deterministic
    * ORDER BY cluster. */
  def stats(index: DataFrame, cent: DataFrame): DataFrame = {
    val assigned = Knn.ivfAssignWith(index, cent)
    val cells = assigned
      .join(broadcast(cent), col("cluster") === col("cid"))
      .withColumn("csim",
        dotc(col("ed"), col("ce")) / (col("nrm") * col("cn")))
      .groupBy("cluster").agg(
        count(lit(1)).as("n_vecs"),
        sum(col("csim").cast("decimal(28,12)")).as("simsum"),
        min(col("csim")).as("mn"),
        min(col("cn")).as("cnorm"))
    cells.select(col("cluster"), col("n_vecs"),
      round(col("simsum").cast("double") / col("n_vecs").cast("double"), 6).as("mean_csim"),
      round(col("mn"), 6).as("min_csim"),
      round(col("cnorm"), 6).as("centroid_norm"))
      .orderBy(asc("cluster"))
  }

  /** DuckDB mirror of [[train]]: the CTE chain `cent0 … cent$iters`, each
    * round = proven q_knn_ivf assignment CTEs against the previous round's
    * centroids + the decimal-sum mean update + the empty-cluster coalesce.
    * The caller composes `cent$iters` exactly where the untrained mirrors
    * use their `cent` CTE. */
  def duckTrainCtes(table: String, k: Int = 16, iters: Int = 3): String = {
    import graft.functions.VectorFns.duckCosine
    val init =
      s"""cent0 AS (SELECT vec_id AS cid, list_transform(embedding, x -> x::DOUBLE) AS ce
         |          FROM $table WHERE vec_id < $k)""".stripMargin
    val rounds = (1 to iters).map { t =>
      val p = s"cent${t - 1}"
      s"""asg$t AS (SELECT e.vec_id, e.embedding, c.cid,
         |               row_number() OVER (PARTITION BY e.vec_id
         |                 ORDER BY ${duckCosine("e.embedding", "c.ce")} DESC, c.cid) AS crn
         |        FROM $table e CROSS JOIN $p c),
         |a$t AS (SELECT vec_id, embedding, cid AS cluster FROM asg$t WHERE crn = 1),
         |x$t AS (SELECT cluster, generate_subscripts(embedding, 1) AS d, unnest(embedding) AS v
         |        FROM a$t),
         |u$t AS (SELECT cluster, d, sum(CAST(v::DOUBLE AS DECIMAL(38,12))) AS s, count(*) AS n
         |        FROM x$t GROUP BY cluster, d),
         |uc$t AS (SELECT cluster AS cid,
         |                list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY d) AS ce
         |         FROM u$t GROUP BY cluster),
         |cent$t AS (SELECT p.cid, COALESCE(u.ce, p.ce) AS ce
         |           FROM $p p LEFT JOIN uc$t u ON p.cid = u.cid)""".stripMargin
    }
    (init +: rounds).mkString(",\n")
  }

  /** DuckDB mirror of [[stats]] over [[duckTrainCtes]]'s final centroids. */
  def duckStatsSql(table: String, k: Int = 16, iters: Int = 3): String = {
    import graft.functions.VectorFns.{duckCosine, duckNorm}
    s"""WITH ${duckTrainCtes(table, k, iters)},
       |cent AS (SELECT cid, ce, ${duckNorm("ce")} AS cn FROM cent$iters),
       |fasg AS (SELECT e.vec_id, e.embedding, c.cid,
       |               row_number() OVER (PARTITION BY e.vec_id
       |                 ORDER BY ${duckCosine("e.embedding", "c.ce")} DESC, c.cid) AS crn
       |        FROM $table e CROSS JOIN cent c),
       |fa AS (SELECT vec_id, embedding, cid AS cluster FROM fasg WHERE crn = 1),
       |w AS (SELECT fa.cluster, ${duckCosine("fa.embedding", "c.ce")} AS csim, c.cn
       |      FROM fa JOIN cent c ON fa.cluster = c.cid),
       |cells AS (SELECT cluster, count(*)::BIGINT AS n_vecs,
       |                 sum(CAST(csim AS DECIMAL(28,12))) AS simsum,
       |                 min(csim) AS mn, min(cn) AS cnorm
       |          FROM w GROUP BY cluster)
       |SELECT cluster, n_vecs,
       |       round(CAST(simsum AS DOUBLE) / n_vecs::DOUBLE, 6) AS mean_csim,
       |       round(mn, 6) AS min_csim,
       |       round(cnorm, 6) AS centroid_norm
       |FROM cells ORDER BY cluster""".stripMargin
  }
}
