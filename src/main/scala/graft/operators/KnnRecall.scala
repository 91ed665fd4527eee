package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VecExprs.dotc
import graft.functions.VectorFns.{duckCosine, duckSignBucket, signBucket}

/** Recall accounting for the approximate-nearest-neighbor paths — the
  * measurement the production ANN story needs and the reference never took
  * (it delegates to ChromaDB's HNSW and reports whatever comes back,
  * /root/reference/coding_agent/tools/vector_search_tool.py:42-46; recall is
  * never quantified there).
  *
  * For a fixed deterministic query set (`vec_id < nQueries`, self excluded
  * everywhere), each ANN variant's top-k is compared as a SET of
  * (qid, vec_id) pairs against the exact top-k: one output row per variant
  * with returned/hit/expected counts and recall@k. Everything is integer
  * counts until the final divide, so the result is engine-exact and
  * oracle-gated like any other query — recall claims in SCALE.md are
  * measurements, not assertions.
  *
  * Scale shape: each variant is its own sub-linear probe plan (the same
  * plans [[Knn.topKLsh]] / [[Knn.topKLshMultiprobe]] / [[Knn.topKIvf]] run
  * per query, batched per-qid via a rank window); the exact side is the
  * [[Knn.multiTopK]] batch kernel. The set-intersection join runs on
  * ≤ nQueries·k rows per side — driver-free, broadcast-safe by cardinality
  * construction. At 100 TB this is the query you run on a SAMPLE of queries
  * to pick (bits, nprobe) before committing a layout; the per-variant
  * parameters here mirror the engine's query defaults exactly.
  *
  * Cache lifecycle: the exact-baseline pair set is `.cache()`d and lives
  * as long as the returned lazy plan — same contract as [[Dedup]]'s
  * header: the harness clears session caches per query; a library caller
  * clears them once the recall row is materialized.
  */
object KnnRecall {

  /** The engine's own raw-cosine tree ([[Knn.sim]]) — shared, not copied,
    * so the recall query scores exactly what the search operators execute. */
  private def sim(e1: Column, n1: Column, e2: Column, n2: Column): Column =
    Knn.sim(e1, n1, e2, n2)

  /** Per-qid top-k of `scored` (columns qid, vec_id, sim_raw) as bare
    * (qid, vec_id) pairs — ordering matches every kNN oracle (raw sim desc,
    * vec_id tiebreak). */
  private def topPairs(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("sim_raw"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
  }

  /** One row per ANN variant: (variant, n_returned, n_hits, n_expected,
    * recall) — recall@k vs the exact top-k over the same query set. */
  def annRecall(index: DataFrame, k: Int, nQueries: Int,
                bits: Int, numCentroids: Int, nprobe: Int,
                bandBits: Int = 4, bandTables: Int = 16,
                sqCandMultiple: Int = 4,
                pqM: Int = 8, pqDsub: Int = 8, pqNcent: Int = 16,
                centTOpt: Option[DataFrame] = None,
                centPqTOpt: Option[DataFrame] = None): DataFrame = {
    import graft.functions.VectorFns.signBucketAt
    val q = index.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qe"))
      .withColumn("qn", sqrt(dotc(col("qe"), col("qe"))))
      .withColumn("qbucket", signBucket(col("qe"), bits))

    val e = index
      .withColumn("ed", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(dotc(col("ed"), col("ed"))))

    // exact baseline: the multiTopK batch kernel's scoring subtree
    val exact = topPairs(
      Knn.multiScored(index, q.select(col("qid"), col("qe").as("qv"))), k)
      .cache() // referenced twice: intersection probe + expected-count agg

    // sign-LSH: candidates share the query's home bucket
    val lsh = topPairs(
      e.withColumn("bucket", signBucket(col("ed"), bits))
        .join(broadcast(q), col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    // multi-probe LSH: home bucket + every hamming-1 shell — the SHARED
    // flip construction ([[Knn.bitFlips]]), so the measured probe set is
    // definitionally the executed one
    val flips = Knn.bitFlips(col("qbucket"), bits)
    val probes = q.select(col("qid"), col("qe"), col("qn"),
      explode(array(col("qbucket") +: flips: _*)).as("pbucket"))
    val mp = topPairs(
      e.withColumn("bucket", signBucket(col("ed"), bits))
        .join(broadcast(probes), col("bucket") === col("pbucket") && col("vec_id") =!= col("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    // IVF: per-qid top-nprobe centroid shortlist, then probe those clusters
    val cent = e.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), col("ed").as("ce"), col("nrm").as("cn"))
    val assigned = Knn.ivfAssign(index, numCentroids)
    val wProbe = Window.partitionBy("qid").orderBy(desc("qsim"), asc("cid"))
    val iprobes = cent.crossJoin(broadcast(q.select(col("qid"), col("qe"), col("qn"))))
      .withColumn("qsim", sim(col("ce"), col("cn"), col("qe"), col("qn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("cid").as("pcid"), col("qe"), col("qn"))
    val ivf = topPairs(
      assigned.join(broadcast(iprobes),
          col("cluster") === col("pcid") && col("vec_id") =!= col("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    // IVF over TRAINED centroids (3 Lloyd rounds, [[KMeans.train]]):
    // identical probe/assign construction as the untrained ivf row, only
    // the centroid relation differs — the controlled comparison that
    // measures what training buys at the same (numCentroids, nprobe).
    // persisted trained centroids when provided (CentroidLayout.ensure*) —
    // stored ≡ in-memory training bit-exactly, so the measured recall rows
    // are unchanged; None retrains in-query
    val centT = centTOpt.getOrElse(KMeans.train(index, numCentroids, iters = 3))
    val assignedT = Knn.ivfAssignWith(index, centT)
    val iprobesT = centT.crossJoin(broadcast(q.select(col("qid"), col("qe"), col("qn"))))
      .withColumn("qsim", sim(col("ce"), col("cn"), col("qe"), col("qn")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("cid").as("pcid"), col("qe"), col("qn"))
    val ivfT = topPairs(
      assignedT.join(broadcast(iprobesT),
          col("cluster") === col("pcid") && col("vec_id") =!= col("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    // banded multi-table: candidate ids from ANY-band collision (the
    // [[Knn.topKLshBanded]] construction over the same disjoint dimension
    // bands), then candidate-first exact re-rank — measured against the
    // same exact top-k as every other variant
    val qbands = q.select(col("qid"),
      posexplode(array((0 until bandTables).map(t =>
        signBucketAt(col("qe"), t * bandBits, bandBits)): _*)).as(Seq("pt", "pbucket")))
    val ebands = e.select(col("vec_id"),
      posexplode(array((0 until bandTables).map(t =>
        signBucketAt(col("ed"), t * bandBits, bandBits)): _*)).as(Seq("bt", "bucket")))
    val bandCand = ebands
      .join(broadcast(qbands), col("bt") === col("pt") && col("bucket") === col("pbucket")
        && col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct()
    val banded = topPairs(
      bandCand
        .join(e.select(col("vec_id"), col("ed"), col("nrm")), Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qe"), col("qn"))), Seq("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    // SQ8: whole-index ranking over int8 codes, top-(k·candMultiple)
    // candidates per qid, exact re-rank — the shared [[Knn.sq8Scales]] /
    // [[Knn.sq8Codes]] construction, so the measured code book is the
    // executed one. The quantized dot is integer-valued, hence the
    // candidate boundary is engine-exact.
    val scales = Knn.sq8Scales(index)
    val eq = Knn.sq8Codes(e.select(col("vec_id"), col("ed")), scales)
    val qq = Knn.sq8Codes(q.select(col("qid"), col("qe").as("ed")), scales)
      .select(col("qid"), col("code").as("qcode"), col("cnq").as("qcnq"))
    val wSq = Window.partitionBy("qid").orderBy(desc("simq_raw"), asc("vec_id"))
    val sqCand = eq
      .join(broadcast(qq), col("vec_id") =!= col("qid"))
      .withColumn("simq_raw", sim(col("code"), col("cnq"), col("qcode"), col("qcnq")))
      .withColumn("crn", row_number().over(wSq))
      .filter(col("crn") <= k * sqCandMultiple)
      .select(col("qid"), col("vec_id"))
    val sq8 = topPairs(
      sqCand
        .join(e.select(col("vec_id"), col("ed"), col("nrm")), Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qe"), col("qn"))), Seq("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    // IVF × SQ8 composition ([[Knn.topKIvfSq8]] batched per qid): the
    // quantized ranking restricted to each query's probed clusters, same
    // full-index code book, exact re-rank — measures the composed recall
    // (cluster misses ∪ quantization boundary error) beside its factors.
    // wSq reused: the quantized-candidate tiebreak is ONE definition for
    // both the sq8 and ivf_sq8 variants — they cannot silently diverge
    val isCand = eq
      .join(assigned.select(col("vec_id"), col("cluster")), Seq("vec_id"))
      .join(broadcast(iprobes.select(col("qid"), col("pcid"))),
        col("cluster") === col("pcid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(qq), Seq("qid"))
      .withColumn("simq_raw", sim(col("code"), col("cnq"), col("qcode"), col("qcnq")))
      .withColumn("crn", row_number().over(wSq))
      .filter(col("crn") <= k * sqCandMultiple)
      .select(col("qid"), col("vec_id"))
    val ivfSq = topPairs(
      isCand
        .join(e.select(col("vec_id"), col("ed"), col("nrm")), Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qe"), col("qn"))), Seq("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    // PQ/ADC: codes assigned once ([[Knn.pqCodes]]), each query's ADC
    // table joined on (sub, cid), per-(qid, vec) approximate dot as the
    // fixed-order pivot sum — the same construction [[Knn.topKPq]] runs,
    // batched over the query set.
    val codes = Knn.pqCodes(index, pqM, pqDsub, pqNcent)
    val centPq = e.filter(col("vec_id") < pqNcent)
      .select(col("vec_id").as("cid"), col("ed").as("ced"),
        explode(array((0 until pqM).map(lit(_)): _*)).as("sub"))
    val pdot = (1 to pqDsub).map { i =>
      element_at(col("qe"), (col("sub") * pqDsub + i).cast("int")) *
        element_at(col("ced"), (col("sub") * pqDsub + i).cast("int"))
    }.reduce(_ + _)
    val qtab = centPq.crossJoin(broadcast(q.select(col("qid"), col("qe"))))
      .withColumn("pdot", pdot)
      .select(col("qid"), col("sub"), col("cid"), col("pdot"))
    val pqPivots = (0 until pqM).map(s =>
      max(when(col("sub") === s, col("pdot"))).as(s"p$s"))
    val wPq = Window.partitionBy("qid").orderBy(desc("adot"), asc("vec_id"))
    val pqCand = codes.join(broadcast(qtab), Seq("sub", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id").agg(pqPivots.head, pqPivots.tail: _*)
      .withColumn("adot", (0 until pqM).map(s => col(s"p$s")).reduce(_ + _))
      .withColumn("crn", row_number().over(wPq))
      .filter(col("crn") <= k * sqCandMultiple)
      .select(col("qid"), col("vec_id"))
    val pq = topPairs(
      pqCand
        .join(e.select(col("vec_id"), col("ed"), col("nrm")), Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qe"), col("qn"))), Seq("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    // PQ over a TRAINED codebook ([[KMeans.trainPq]], 3 Lloyd rounds per
    // subspace) — same ADC/pivot construction as the untrained pq row,
    // only the codebook differs: the controlled comparison measuring the
    // recall the trained codebook buys ("the curve shifts left" claim in
    // SCALE.md, now a gated number).
    val centPqT = centPqTOpt.getOrElse(KMeans.trainPq(index, pqM, pqDsub, pqNcent, iters = 3))
    val partsPq = KMeans.pqParts(index, pqM, pqDsub)
    val codesT = KMeans.pqAssignWith(partsPq, centPqT, pqDsub)
      .select(col("vec_id"), col("sub"), col("cid"))
    val pdotT = (1 to pqDsub).map { i =>
      element_at(col("qe"), (col("sub") * pqDsub + i).cast("int")) *
        element_at(col("ce"), i)
    }.reduce(_ + _)
    val qtabT = centPqT.crossJoin(broadcast(q.select(col("qid"), col("qe"))))
      .withColumn("pdot", pdotT)
      .select(col("qid"), col("sub"), col("cid"), col("pdot"))
    val pqCandT = codesT.join(broadcast(qtabT), Seq("sub", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id").agg(pqPivots.head, pqPivots.tail: _*)
      .withColumn("adot", (0 until pqM).map(s => col(s"p$s")).reduce(_ + _))
      .withColumn("crn", row_number().over(wPq))
      .filter(col("crn") <= k * sqCandMultiple)
      .select(col("qid"), col("vec_id"))
    val pqT = topPairs(
      pqCandT
        .join(e.select(col("vec_id"), col("ed"), col("nrm")), Seq("vec_id"))
        .join(broadcast(q.select(col("qid"), col("qe"), col("qn"))), Seq("qid"))
        .withColumn("sim_raw", sim(col("ed"), col("nrm"), col("qe"), col("qn"))), k)

    val ann = lsh.withColumn("variant", lit("lsh"))
      .unionByName(mp.withColumn("variant", lit("lsh_multiprobe")))
      .unionByName(banded.withColumn("variant", lit("lsh_banded")))
      .unionByName(ivf.withColumn("variant", lit("ivf")))
      .unionByName(ivfT.withColumn("variant", lit("ivf_trained")))
      .unionByName(ivfSq.withColumn("variant", lit("ivf_sq8")))
      .unionByName(sq8.withColumn("variant", lit("sq8")))
      .unionByName(pq.withColumn("variant", lit("pq")))
      .unionByName(pqT.withColumn("variant", lit("pq_trained")))

    val nExpected = exact.agg(count(lit(1)).as("n_expected"))
    ann.join(exact.withColumn("hit", lit(1L)), Seq("qid", "vec_id"), "left")
      .groupBy("variant")
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .crossJoin(broadcast(nExpected))
      .withColumn("recall",
        round(col("n_hits").cast("double") / col("n_expected").cast("double"), 6))
      .select(col("variant"), col("n_returned"), col("n_hits"),
        col("n_expected"), col("recall"))
      .orderBy("variant")
  }

  /** Literal dsub-term PQ distance / partial-dot / pivot fragments —
    * the same fixed index order as the Spark expressions, so the trees
    * are identical (see [[Knn.pqCodes]] float discipline). */
  private def pqDistTerms(dsub: Int): String =
    (1 to dsub).map(i =>
      s"(e.embedding[c.sub*$dsub+$i]::DOUBLE - c.ced[c.sub*$dsub+$i]::DOUBLE)" +
        s" * (e.embedding[c.sub*$dsub+$i]::DOUBLE - c.ced[c.sub*$dsub+$i]::DOUBLE)")
      .mkString(" + ")

  private def pqPdotTerms(dsub: Int): String =
    (1 to dsub).map(i =>
      s"(q.qv[c.sub*$dsub+$i]::DOUBLE * c.ced[c.sub*$dsub+$i]::DOUBLE)").mkString(" + ")

  private def pqPivotCols(m: Int): String =
    (0 until m).map(s => s"max(CASE WHEN sub = $s THEN pdot END)").mkString(" + ")


  /** DuckDB mirror of [[annRecall]]. */
  def duckAnnRecall(table: String, k: Int, nQueries: Int,
                    bits: Int, numCentroids: Int, nprobe: Int,
                    bandBits: Int = 4, bandTables: Int = 16,
                    sqCandMultiple: Int = 4,
                    pqM: Int = 8, pqDsub: Int = 8, pqNcent: Int = 16): String = {
    import graft.functions.VectorFns.{duckSignBucketAt, duckSq8Ctes}
    val cosEQ = duckCosine("e.embedding", "q.qv")
    val bandBranches = (0 until bandTables).map { t =>
      s"""SELECT q.qid, e.vec_id FROM $table e JOIN q
         |          ON ${duckSignBucketAt("e.embedding", t * bandBits, bandBits)}
         |           = ${duckSignBucketAt("q.qv", t * bandBits, bandBits)}
         |          AND e.vec_id <> q.qid""".stripMargin
    }.mkString("\n          UNION\n          ")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv,
       |                  ${duckSignBucket("embedding", bits)} AS qbucket
       |           FROM $table WHERE vec_id < $nQueries),
       |ex AS (SELECT qid, vec_id FROM (
       |         SELECT q.qid, e.vec_id,
       |                row_number() OVER (PARTITION BY q.qid
       |                  ORDER BY $cosEQ DESC, e.vec_id) AS rn
       |         FROM $table e CROSS JOIN q WHERE e.vec_id <> q.qid) t
       |       WHERE rn <= $k),
       |lsh AS (SELECT qid, vec_id FROM (
       |          SELECT q.qid, e.vec_id,
       |                 row_number() OVER (PARTITION BY q.qid
       |                   ORDER BY $cosEQ DESC, e.vec_id) AS rn
       |          FROM $table e JOIN q
       |          ON ${duckSignBucket("e.embedding", bits)} = q.qbucket
       |          AND e.vec_id <> q.qid) t
       |        WHERE rn <= $k),
       |probes AS (
       |  SELECT qid, qv, qbucket AS pbucket FROM q
       |  UNION ALL
       |  SELECT qid, qv,
       |         concat(substr(qbucket, 1, i - 1),
       |                CASE WHEN substr(qbucket, i, 1) = '1' THEN '0' ELSE '1' END,
       |                substr(qbucket, i + 1)) AS pbucket
       |  FROM q CROSS JOIN (SELECT unnest(generate_series(1, $bits)) AS i)),
       |mp AS (SELECT qid, vec_id FROM (
       |         SELECT p.qid, e.vec_id,
       |                row_number() OVER (PARTITION BY p.qid
       |                  ORDER BY ${duckCosine("e.embedding", "p.qv")} DESC, e.vec_id) AS rn
       |         FROM $table e JOIN probes p
       |         ON ${duckSignBucket("e.embedding", bits)} = p.pbucket
       |         AND e.vec_id <> p.qid) t
       |       WHERE rn <= $k),
       |cent AS (SELECT vec_id AS cid, embedding AS ce FROM $table WHERE vec_id < $numCentroids),
       |asg AS (SELECT e.vec_id, e.embedding, c.cid,
       |               row_number() OVER (PARTITION BY e.vec_id
       |                 ORDER BY ${duckCosine("e.embedding", "c.ce")} DESC, c.cid) AS crn
       |        FROM $table e CROSS JOIN cent c),
       |a AS (SELECT vec_id, embedding, cid AS cluster FROM asg WHERE crn = 1),
       |iprobes AS (SELECT qid, qv, pcid FROM (
       |              SELECT q.qid, q.qv, c.cid AS pcid,
       |                     row_number() OVER (PARTITION BY q.qid
       |                       ORDER BY ${duckCosine("c.ce", "q.qv")} DESC, c.cid) AS prn
       |              FROM cent c CROSS JOIN q) t
       |            WHERE prn <= $nprobe),
       |ivf AS (SELECT qid, vec_id FROM (
       |          SELECT p.qid, a.vec_id,
       |                 row_number() OVER (PARTITION BY p.qid
       |                   ORDER BY ${duckCosine("a.embedding", "p.qv")} DESC, a.vec_id) AS rn
       |          FROM a JOIN iprobes p ON a.cluster = p.pcid
       |          WHERE a.vec_id <> p.qid) t
       |        WHERE rn <= $k),
       |${KMeans.duckTrainCtes(table, numCentroids, 3)},
       |centt AS (SELECT cid, ce FROM cent3),
       |${KMeans.duckAssignCtes(table, "centt", "asgt", "ta")},
       |iprobest AS (SELECT qid, qv, pcid FROM (
       |              SELECT q.qid, q.qv, c.cid AS pcid,
       |                     row_number() OVER (PARTITION BY q.qid
       |                       ORDER BY ${duckCosine("c.ce", "q.qv")} DESC, c.cid) AS prn
       |              FROM centt c CROSS JOIN q) t
       |            WHERE prn <= $nprobe),
       |ivft AS (SELECT qid, vec_id FROM (
       |          SELECT p.qid, ta.vec_id,
       |                 row_number() OVER (PARTITION BY p.qid
       |                   ORDER BY ${duckCosine("ta.embedding", "p.qv")} DESC, ta.vec_id) AS rn
       |          FROM ta JOIN iprobest p ON ta.cluster = p.pcid
       |          WHERE ta.vec_id <> p.qid) t
       |        WHERE rn <= $k),
       |bcand AS ($bandBranches),
       |banded AS (SELECT qid, vec_id FROM (
       |             SELECT c.qid, c.vec_id,
       |                    row_number() OVER (PARTITION BY c.qid
       |                      ORDER BY ${duckCosine("e.embedding", "q.qv")} DESC, c.vec_id) AS rn
       |             FROM bcand c JOIN $table e USING (vec_id) JOIN q USING (qid)) t
       |           WHERE rn <= $k),
       |${duckSq8Ctes(table)},
       |sq8_q AS (SELECT vec_id AS qid, d, c FROM sq8_codes WHERE vec_id < $nQueries),
       |sq8_qn AS (SELECT qid, sqrt(sum(c*c)) AS qcn FROM sq8_q GROUP BY qid),
       |sq8_ad AS (SELECT sq8_q.qid, sq8_codes.vec_id, sum(sq8_codes.c * sq8_q.c) AS qdot
       |           FROM sq8_codes JOIN sq8_q USING (d)
       |           WHERE sq8_codes.vec_id <> sq8_q.qid
       |           GROUP BY sq8_q.qid, sq8_codes.vec_id),
       |sq8_cand AS (SELECT qid, vec_id FROM (
       |               SELECT a.qid, a.vec_id,
       |                      row_number() OVER (PARTITION BY a.qid
       |                        ORDER BY a.qdot / (c.cn * n.qcn) DESC, a.vec_id) AS crn
       |               FROM sq8_ad a JOIN sq8_cn c USING (vec_id)
       |               JOIN sq8_qn n ON a.qid = n.qid) t
       |             WHERE crn <= ${k * sqCandMultiple}),
       |sq8 AS (SELECT qid, vec_id FROM (
       |          SELECT c.qid, c.vec_id,
       |                 row_number() OVER (PARTITION BY c.qid
       |                   ORDER BY ${duckCosine("e.embedding", "q.qv")} DESC, c.vec_id) AS rn
       |          FROM sq8_cand c JOIN $table e USING (vec_id) JOIN q USING (qid)) t
       |        WHERE rn <= $k),
       |is_cand AS (SELECT qid, vec_id FROM (
       |              SELECT a2.qid, a2.vec_id,
       |                     row_number() OVER (PARTITION BY a2.qid
       |                       ORDER BY a2.qdot / (c.cn * n.qcn) DESC, a2.vec_id) AS crn
       |              FROM sq8_ad a2
       |              JOIN a ON a.vec_id = a2.vec_id
       |              JOIN iprobes p ON p.qid = a2.qid AND a.cluster = p.pcid
       |              JOIN sq8_cn c ON c.vec_id = a2.vec_id
       |              JOIN sq8_qn n ON a2.qid = n.qid) t
       |            WHERE crn <= ${k * sqCandMultiple}),
       |ivfsq AS (SELECT qid, vec_id FROM (
       |            SELECT c.qid, c.vec_id,
       |                   row_number() OVER (PARTITION BY c.qid
       |                     ORDER BY ${duckCosine("e.embedding", "q.qv")} DESC, c.vec_id) AS rn
       |            FROM is_cand c JOIN $table e USING (vec_id) JOIN q USING (qid)) t
       |          WHERE rn <= $k),
       |pq_subs AS (SELECT unnest(generate_series(0, ${pqM - 1})) AS sub),
       |pq_cent AS (SELECT s.sub, e.vec_id AS cid, e.embedding AS ced
       |            FROM $table e CROSS JOIN pq_subs s WHERE e.vec_id < $pqNcent),
       |pq_codes AS (SELECT vec_id, sub, cid FROM (
       |               SELECT e.vec_id, c.sub, c.cid,
       |                      row_number() OVER (PARTITION BY e.vec_id, c.sub
       |                        ORDER BY (${pqDistTerms(pqDsub)}) ASC, c.cid) AS rn
       |               FROM $table e CROSS JOIN pq_cent c) t
       |             WHERE rn = 1),
       |pq_qtab AS (SELECT q.qid, c.sub, c.cid, (${pqPdotTerms(pqDsub)}) AS pdot
       |            FROM pq_cent c CROSS JOIN q),
       |pq_adot AS (SELECT qt.qid, pc.vec_id, (${pqPivotCols(pqM)}) AS adot
       |            FROM pq_codes pc JOIN pq_qtab qt USING (sub, cid)
       |            WHERE pc.vec_id <> qt.qid GROUP BY qt.qid, pc.vec_id),
       |pq_cand AS (SELECT qid, vec_id FROM (
       |              SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
       |                ORDER BY adot DESC, vec_id) AS crn FROM pq_adot) t
       |            WHERE crn <= ${k * sqCandMultiple}),
       |pq AS (SELECT qid, vec_id FROM (
       |         SELECT c.qid, c.vec_id,
       |                row_number() OVER (PARTITION BY c.qid
       |                  ORDER BY ${duckCosine("e.embedding", "q.qv")} DESC, c.vec_id) AS rn
       |         FROM pq_cand c JOIN $table e USING (vec_id) JOIN q USING (qid)) t
       |       WHERE rn <= $k),
       |${KMeans.duckTrainPqCtes(table, pqM, pqDsub, pqNcent, 3)},
       |pqt_tcent AS (SELECT sub, cid, ce FROM pqt_cent3),
       |pqt_codes AS (SELECT vec_id, sub, cid FROM (
       |               SELECT p.vec_id, p.sub, c.cid,
       |                      row_number() OVER (PARTITION BY p.vec_id, p.sub
       |                        ORDER BY (${KMeans.pqTrainedDistSql(pqDsub)}) ASC, c.cid) AS rn
       |               FROM pqt_parts p JOIN pqt_tcent c USING (sub)) t
       |             WHERE rn = 1),
       |pqt_qtab AS (SELECT q.qid, c.sub, c.cid, (${KMeans.pqTrainedPdotSql(pqDsub)}) AS pdot
       |             FROM pqt_tcent c CROSS JOIN q),
       |pqt_adot AS (SELECT qt.qid, pc.vec_id, (${pqPivotCols(pqM)}) AS adot
       |             FROM pqt_codes pc JOIN pqt_qtab qt USING (sub, cid)
       |             WHERE pc.vec_id <> qt.qid GROUP BY qt.qid, pc.vec_id),
       |pqt_cand AS (SELECT qid, vec_id FROM (
       |               SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
       |                 ORDER BY adot DESC, vec_id) AS crn FROM pqt_adot) t
       |             WHERE crn <= ${k * sqCandMultiple}),
       |pqt AS (SELECT qid, vec_id FROM (
       |          SELECT c.qid, c.vec_id,
       |                 row_number() OVER (PARTITION BY c.qid
       |                   ORDER BY ${duckCosine("e.embedding", "q.qv")} DESC, c.vec_id) AS rn
       |          FROM pqt_cand c JOIN $table e USING (vec_id) JOIN q USING (qid)) t
       |        WHERE rn <= $k),
       |ann AS (SELECT 'lsh' AS variant, qid, vec_id FROM lsh
       |        UNION ALL SELECT 'lsh_multiprobe', qid, vec_id FROM mp
       |        UNION ALL SELECT 'lsh_banded', qid, vec_id FROM banded
       |        UNION ALL SELECT 'ivf', qid, vec_id FROM ivf
       |        UNION ALL SELECT 'ivf_trained', qid, vec_id FROM ivft
       |        UNION ALL SELECT 'ivf_sq8', qid, vec_id FROM ivfsq
       |        UNION ALL SELECT 'sq8', qid, vec_id FROM sq8
       |        UNION ALL SELECT 'pq', qid, vec_id FROM pq
       |        UNION ALL SELECT 'pq_trained', qid, vec_id FROM pqt),
       |m AS (SELECT a.variant, count(*) AS n_returned,
       |             sum(CASE WHEN e.qid IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
       |      FROM ann a LEFT JOIN ex e ON e.qid = a.qid AND e.vec_id = a.vec_id
       |      GROUP BY a.variant),
       |nexp AS (SELECT count(*) AS n_expected FROM ex)
       |SELECT m.variant, CAST(m.n_returned AS BIGINT) AS n_returned,
       |       CAST(m.n_hits AS BIGINT) AS n_hits,
       |       CAST(n.n_expected AS BIGINT) AS n_expected,
       |       round(CAST(m.n_hits AS DOUBLE) / CAST(n.n_expected AS DOUBLE), 6) AS recall
       |FROM m CROSS JOIN nexp n ORDER BY m.variant""".stripMargin
  }
}
