package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Embedder
import graft.functions.TextFns.{duckTokens, tokens}
import graft.functions.VectorFns.{duckCosine, duckDot}
import graft.functions.VecExprs.dotc

/** Retrieval-surface operators the reference's vector-search tool implies
  * but does not ship: hybrid lexical+vector fusion and diversity reranking.
  *
  * Reference anchor: `semantic_search`
  * (/root/reference/coding_agent/tools/vector_search_tool.py:33-79) is a
  * pure vector ranking; production retrieval over the same index pairs it
  * with a lexical scorer (BM25) and fuses by reciprocal rank — the standard
  * upgrade every vector-DB user makes first — and then diversifies the head
  * of the list (MMR, Carbonell & Goldstein 1998) so near-duplicate chunks
  * don't crowd out coverage. Both are expressed here as declarative plans
  * over the SAME statistics the rest of the engine already derives, and
  * both are oracle-gated end to end.
  */
object Retrieval {

  // ------------------------------------------------------------ hybrid RRF

  /** Hybrid retrieval: BM25 top-`poolN` ∪ hashing-embedder cosine
    * top-`poolN`, fused by reciprocal-rank fusion
    * `rrf = Σ_lists 1/(60 + rank)` (Cormack et al. 2009's k0=60), top-`k`
    * of the fused list.
    *
    * One tokenize pass feeds BOTH branches (the cached token relation —
    * the bm25 cache discipline, now shared): the lexical branch aggregates
    * tf/dl/df from it, the vector branch folds the same rows into the
    * hashing-embedder bucket histogram. The query embeds through the
    * IDENTICAL path at query time (E1's index-time ≡ query-time contract).
    *
    * 100 TB shape: both branches are keyed aggregations plus a broadcast
    * of the tiny query side; each ranking is `orderBy+limit`
    * (TakeOrderedAndProject — per-partition k, driver merges k·p rows,
    * never a global sort); the per-doc norm attaches via a window over the
    * doc-keyed histogram (≤ Dim rows per group — skew-free by
    * construction) instead of a groupBy+join-back, so no corpus-cardinality
    * aggregate ever becomes a join build side. The fusion join touches
    * 2·poolN rows.
    *
    * Float discipline: the vector dot product and both norms accumulate
    * INTEGER counts (sum of cnt·qcnt / cnt² as BIGINT) — one double
    * division and one sqrt at the end, so cosine is bit-identical to the
    * oracle by construction, not by summation-order luck. RRF adds two
    * fixed-order double terms. Ranks are ints; ties break on doc_id.
    */
  def hybridRrf(documents: DataFrame, terms: Seq[String],
                poolN: Int = 20, k: Int = 10): DataFrame = {
    val spark = documents.sparkSession
    val toks = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("t")).cache()

    // lexical branch: raw BM25 scores, rank the top poolN
    val lex = rankHead(TextAnalysis.bm25Scored(toks, terms),
      "score_raw", poolN, "lex_rn")

    // vector branch: histogram cosine against the embedded query text
    // ([[vecScored]] — per-doc norm via a doc-keyed window, no join-back)
    val vec = rankHead(vecScored(toks, terms), "sim_raw", poolN, "vec_rn")

    // reciprocal-rank fusion over the two poolN-row heads
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(1.0) / (lit(60) + col("lex_rn")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("vec_rn")), lit(0.0)))
      .orderBy(desc("rrf_raw"), asc("doc_id"))
      .limit(k)
      .select(col("doc_id"),
        coalesce(col("lex_rn"), lit(0L)).as("lex_rn"),
        coalesce(col("vec_rn"), lit(0L)).as("vec_rn"),
        round(col("rrf_raw"), 6).as("rrf"))
  }

  /** (doc_id, sim_raw) embedder-cosine scores of the query text over the
    * shared token relation — the hybrid's vector branch, factored so the
    * metrics query ranks the SAME scores the fusion consumes. */
  private def vecScored(toks: DataFrame, terms: Seq[String]): DataFrame = {
    val spark = toks.sparkSession
    val dh = toks
      .select(col("doc_id"), Embedder.bucket(col("t")).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
    val dn = sqrt(sum(col("cnt") * col("cnt"))
      .over(Window.partitionBy("doc_id")).cast("double"))
    val qtoks = spark.range(1)
      .select(explode(tokens(lit(terms.mkString(" ")))).as("t"))
    val qh = qtoks.select(Embedder.bucket(col("t")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("qcnt"))
    val qn = qh.agg(sqrt(sum(col("qcnt") * col("qcnt")).cast("double")).as("qn"))
    dh.withColumn("dn", dn)
      .join(broadcast(qh), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("qcnt")).as("dt"), max("dn").as("dn"))
      .crossJoin(broadcast(qn))
      .select(col("doc_id"), (col("dt") / (col("dn") * col("qn"))).as("sim_raw"))
  }

  /** Top-`n` of `scored` by (`scoreCol` desc, doc_id) with a 1-based rank
    * column. The limit runs FIRST (TakeOrderedAndProject); the survivors
    * are then ranked WITHOUT a global window — coalesce(1) + in-partition
    * sort + monotonically_increasing_id over the ≤n rows (partition 0 →
    * ids 0..n−1 in sort order, identical to row_number) — so the plan
    * never carries an empty-partition-spec WindowExec and the "moving all
    * data to a single partition" warning can only ever flag a REAL
    * regression in bench tails (round-10 hygiene note). */
  private def rankHead(scored: DataFrame, scoreCol: String, n: Int,
                       rankName: String): DataFrame =
    scored.orderBy(desc(scoreCol), asc("doc_id")).limit(n)
      .coalesce(1).sortWithinPartitions(desc(scoreCol), asc("doc_id"))
      .withColumn(rankName, (monotonically_increasing_id() + 1).cast("long"))
      .select("doc_id", rankName)

  /** DuckDB mirror of [[hybridRrf]] — same statistics, same fixed-order
    * float arithmetic, same k0=60 fusion. */
  def duckHybridRrf(table: String, terms: Seq[String],
                    poolN: Int = 20, k: Int = 10): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val pivot = terms.map(t =>
      s"coalesce(max(CASE WHEN t = '$t' THEN contrib END), 0.0)").mkString("\n      + ")
    val qlit = s"'${terms.mkString(" ")}'"
    s"""WITH tk AS MATERIALIZED (SELECT doc_id, unnest(${duckTokens("text")}) AS t FROM $table),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tk GROUP BY doc_id),
       |st AS (SELECT count(*)::BIGINT AS n_docs,
       |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tk
       |       WHERE t IN ($inList) GROUP BY 1, 2),
       |df AS (SELECT t, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY t),
       |c AS (SELECT tf.doc_id, tf.t,
       |        ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
       |        (tf.tf * 2.2::DOUBLE) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS contrib
       |      FROM tf JOIN df USING (t) CROSS JOIN st JOIN dl ON dl.doc_id = tf.doc_id),
       |lexs AS (SELECT doc_id, $pivot AS score_raw FROM c GROUP BY doc_id),
       |lex AS (SELECT doc_id, row_number() OVER (ORDER BY score_raw DESC, doc_id) AS lex_rn
       |        FROM lexs ORDER BY score_raw DESC, doc_id LIMIT $poolN),
       |dh AS (SELECT doc_id, ${Embedder.duckBucket("t")} AS bucket, count(*)::BIGINT AS cnt
       |       FROM tk GROUP BY 1, 2),
       |qh AS (SELECT ${Embedder.duckBucket("t")} AS bucket, count(*)::BIGINT AS qcnt
       |       FROM (SELECT unnest(${duckTokens(qlit)}) AS t) GROUP BY 1),
       |qn AS (SELECT sqrt(CAST(sum(qcnt*qcnt) AS DOUBLE)) AS qn FROM qh),
       |dn AS (SELECT doc_id, sqrt(CAST(sum(cnt*cnt) AS DOUBLE)) AS dn FROM dh GROUP BY doc_id),
       |vs AS (SELECT dh.doc_id, sum(dh.cnt * qh.qcnt)::BIGINT / (max(dn.dn) * max(qn.qn)) AS sim_raw
       |       FROM dh JOIN qh USING (bucket) JOIN dn USING (doc_id) CROSS JOIN qn
       |       GROUP BY dh.doc_id),
       |vec AS (SELECT doc_id, row_number() OVER (ORDER BY sim_raw DESC, doc_id) AS vec_rn
       |        FROM vs ORDER BY sim_raw DESC, doc_id LIMIT $poolN),
       |fused AS (
       |  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id, lex.lex_rn, vec.vec_rn,
       |         coalesce(1.0::DOUBLE / (60 + lex.lex_rn), 0.0) +
       |         coalesce(1.0::DOUBLE / (60 + vec.vec_rn), 0.0) AS rrf_raw
       |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
       |SELECT doc_id, coalesce(lex_rn, 0)::BIGINT AS lex_rn,
       |       coalesce(vec_rn, 0)::BIGINT AS vec_rn, round(rrf_raw, 6) AS rrf
       |FROM fused ORDER BY rrf_raw DESC, doc_id LIMIT $k""".stripMargin
  }

  // ------------------------------------------------------------------ MMR

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998):
    * greedy-select `k` of the cosine top-`poolN`, each step maximizing
    * `lam·sim(q,c) − (1−lam)·max_{s∈S} sim(c,s)` (ties → lowest vec_id).
    * Output: (step, vec_id, mmr) — the diversified head in pick order,
    * `mmr` = the score at selection time (step 1 = plain query cosine).
    *
    * Shape: candidate generation is the DISTRIBUTED part (corpus scan +
    * TakeOrderedAndProject top-poolN); selection is inherently sequential,
    * so it runs as `k−1` tiny jobs over eagerly-checkpointed ≤poolN-row
    * state (the k-means loop discipline — without the per-step
    * localCheckpoint the t-th step would re-evaluate the whole prefix,
    * O(2^k) corpus scans). Pairwise sims are poolN² rows computed once.
    * At 100 TB only the pool build touches the corpus; everything after
    * is O(poolN²) on the driver-adjacent partitions.
    *
    * Float discipline: `mu = 1.0 − lam` is computed ONCE here and embedded
    * verbatim in the oracle ([[duckMmrRerank]] takes the same doubles and
    * prints them with Double.toString round-trip exactness) — `1.0 − 0.7`
    * is NOT the literal `0.3` in IEEE754, so the complement must never be
    * re-derived on the SQL side.
    */
  def mmrRerank(index: DataFrame, queryVec: DataFrame,
                poolN: Int = 30, k: Int = 8, lam: Double = 0.7,
                excludeId: Option[Long] = Some(0L)): DataFrame = {
    val mu = 1.0 - lam
    val filtered = excludeId.map(id => index.filter(col("vec_id") =!= id))
      .getOrElse(index)
    val q = queryVec.select(col("qv").cast("array<double>").as("qe"))
      .withColumn("qn", sqrt(dotc(col("qe"), col("qe"))))
    val pool = filtered
      .withColumn("ed", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(dotc(col("ed"), col("ed"))))
      .crossJoin(broadcast(q))
      .withColumn("simq", Knn.sim(col("ed"), col("nrm"), col("qe"), col("qn")))
      .orderBy(desc("simq"), asc("vec_id")).limit(poolN)
      .select(col("vec_id"), col("ed"), col("nrm"), col("simq"))
      .localCheckpoint(true)
    val pw = pool.select(col("vec_id").as("ai"), col("ed").as("ae"), col("nrm").as("an"))
      .join(pool.select(col("vec_id").as("bi"), col("ed").as("be"), col("nrm").as("bn")),
        col("ai") =!= col("bi"))
      .select(col("ai"), col("bi"),
        Knn.sim(col("ae"), col("an"), col("be"), col("bn")).as("s"))
      .localCheckpoint(true)
    var sel = pool.orderBy(desc("simq"), asc("vec_id")).limit(1)
      .select(lit(1L).as("step"), col("vec_id"), col("simq").as("score"))
      .localCheckpoint(true)
    for (t <- 2 to k) {
      val picked = sel.select(col("vec_id").as("bi"))
      val next = pool.join(picked.withColumnRenamed("bi", "vec_id"),
          Seq("vec_id"), "left_anti")
        .join(pw.join(picked, "bi").groupBy("ai").agg(max("s").as("mx")),
          col("vec_id") === col("ai"))
        .withColumn("sc", lit(lam) * col("simq") - lit(mu) * col("mx"))
        .orderBy(desc("sc"), asc("vec_id")).limit(1)
        .select(lit(t.toLong).as("step"), col("vec_id"), col("sc").as("score"))
      sel = sel.union(next).localCheckpoint(true)
    }
    sel.select(col("step"), col("vec_id"), round(col("score"), 6).as("mmr"))
      .orderBy("step")
  }

  // ---------------------------------------------------- retrieval metrics

  /** IR-quality measurement of the retrieval surface — the q_knn_recall
    * analog for rankers: MRR@k and nDCG@k (binary gains) of the lexical
    * (BM25), vector (embedder cosine) and hybrid (RRF) rankings against
    * a RANKER-INDEPENDENT relevance set: documents containing ALL query
    * terms. Using either ranker's own ordering as ground truth would
    * score that ranker 1.0 by construction; term-containment is the
    * neutral oracle both rankers approximate.
    *
    * Float discipline: the DCG discounts `1/log2(i+1)` are CONSTANTS per
    * rank position, computed once in Scala and embedded as literals on
    * both sides (Double.toString round-trip) — no runtime logarithm
    * anywhere; DCG and IDCG are fixed-order literal-pivot sums, MRR is
    * one exact division by an integer rank. */
  def retrievalMetrics(documents: DataFrame, terms: Seq[String],
                       k: Int = 10, poolN: Int = 20): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("t")).cache()
    val rel = toks.filter(col("t").isin(terms: _*))
      .select("doc_id", "t").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("nt"))
      .filter(col("nt") === terms.size)
      .select(col("doc_id"), lit(1L).as("hit"))
    val nRel = rel.agg(count(lit(1)).as("n_rel"))
    val lexS = TextAnalysis.bm25Scored(toks, terms)
    val vecS = vecScored(toks, terms)
    val fused = rankHead(lexS, "score_raw", poolN, "lex_rn")
      .join(rankHead(vecS, "sim_raw", poolN, "vec_rn"), Seq("doc_id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(1.0) / (lit(60) + col("lex_rn")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("vec_rn")), lit(0.0)))
    val c = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    def metricsOf(ranked: DataFrame, name: String): DataFrame = {
      val h = ranked.join(rel, Seq("doc_id"), "left")
        .withColumn("hit", coalesce(col("hit"), lit(0L)))
      val dcg = (1 to k).map(i =>
        coalesce(max(when(col("rn") === i && col("hit") === 1, lit(c(i - 1)))),
          lit(0.0))).reduceLeft(_ + _)
      val idcg = (1 to k).map(i =>
        when(lit(i) <= col("n_rel"), lit(c(i - 1))).otherwise(lit(0.0)))
        .reduceLeft(_ + _)
      h.agg(sum(col("hit")).as("hits"), dcg.as("dcg"),
          coalesce(lit(1.0) / min(when(col("hit") === 1, col("rn"))), lit(0.0))
            .as("mrr_raw"))
        .crossJoin(broadcast(nRel))
        .select(lit(name).as("variant"), col("n_rel"), col("hits"),
          round(col("mrr_raw"), 6).as("mrr"),
          round(col("dcg") / idcg, 6).as("ndcg"))
    }
    metricsOf(rankHead(lexS, "score_raw", k, "rn"), "lexical")
      .unionByName(metricsOf(rankHead(vecS, "sim_raw", k, "rn"), "vector"))
      .unionByName(metricsOf(rankHead(fused, "rrf_raw", k, "rn"), "hybrid"))
      .orderBy("variant")
  }

  /** DuckDB mirror of [[retrievalMetrics]]. */
  def duckRetrievalMetrics(table: String, terms: Seq[String],
                           k: Int = 10, poolN: Int = 20): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val pivot = terms.map(t =>
      s"coalesce(max(CASE WHEN t = '$t' THEN contrib END), 0.0)").mkString("\n      + ")
    val qlit = s"'${terms.mkString(" ")}'"
    val c = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val dcg = (1 to k).map(i =>
      s"coalesce(max(CASE WHEN rn = $i AND hit = 1 THEN ${c(i - 1)}::DOUBLE END), 0.0)")
      .mkString("\n       |      + ")
    val idcg = (1 to k).map(i =>
      s"(CASE WHEN $i <= n_rel THEN ${c(i - 1)}::DOUBLE ELSE 0.0 END)")
      .mkString("\n       |      + ")
    def variantSelect(src: String, name: String): String =
      s"""SELECT '$name' AS variant, n_rel, hits, round(mrr_raw, 6) AS mrr,
         |       round(dcg / ($idcg), 6) AS ndcg
         |FROM (SELECT sum(hit)::BIGINT AS hits,
         |      $dcg AS dcg,
         |      coalesce(1.0::DOUBLE / min(CASE WHEN hit = 1 THEN rn END), 0.0) AS mrr_raw
         |      FROM (SELECT r.rn, CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |            FROM $src r LEFT JOIN rel ON rel.doc_id = r.doc_id))
         |CROSS JOIN nrel""".stripMargin
    s"""WITH tk AS MATERIALIZED (SELECT doc_id, unnest(${duckTokens("text")}) AS t FROM $table),
       |rel AS (SELECT doc_id FROM (
       |  SELECT doc_id, count(DISTINCT t) AS nt FROM tk WHERE t IN ($inList) GROUP BY doc_id)
       |  WHERE nt = ${terms.size}),
       |nrel AS (SELECT count(*)::BIGINT AS n_rel FROM rel),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tk GROUP BY doc_id),
       |st AS (SELECT count(*)::BIGINT AS n_docs,
       |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tk
       |       WHERE t IN ($inList) GROUP BY 1, 2),
       |df AS (SELECT t, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY t),
       |c AS (SELECT tf.doc_id, tf.t,
       |        ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
       |        (tf.tf * 2.2::DOUBLE) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS contrib
       |      FROM tf JOIN df USING (t) CROSS JOIN st JOIN dl ON dl.doc_id = tf.doc_id),
       |lexs AS (SELECT doc_id, $pivot AS score_raw FROM c GROUP BY doc_id),
       |dh AS (SELECT doc_id, ${Embedder.duckBucket("t")} AS bucket, count(*)::BIGINT AS cnt
       |       FROM tk GROUP BY 1, 2),
       |qh AS (SELECT ${Embedder.duckBucket("t")} AS bucket, count(*)::BIGINT AS qcnt
       |       FROM (SELECT unnest(${duckTokens(qlit)}) AS t) GROUP BY 1),
       |qn AS (SELECT sqrt(CAST(sum(qcnt*qcnt) AS DOUBLE)) AS qn FROM qh),
       |dn AS (SELECT doc_id, sqrt(CAST(sum(cnt*cnt) AS DOUBLE)) AS dn FROM dh GROUP BY doc_id),
       |vs AS (SELECT dh.doc_id, sum(dh.cnt * qh.qcnt)::BIGINT / (max(dn.dn) * max(qn.qn)) AS sim_raw
       |       FROM dh JOIN qh USING (bucket) JOIN dn USING (doc_id) CROSS JOIN qn
       |       GROUP BY dh.doc_id),
       |lexp AS (SELECT doc_id, row_number() OVER (ORDER BY score_raw DESC, doc_id) AS lex_rn
       |         FROM lexs ORDER BY score_raw DESC, doc_id LIMIT $poolN),
       |vecp AS (SELECT doc_id, row_number() OVER (ORDER BY sim_raw DESC, doc_id) AS vec_rn
       |         FROM vs ORDER BY sim_raw DESC, doc_id LIMIT $poolN),
       |fused AS (SELECT coalesce(lexp.doc_id, vecp.doc_id) AS doc_id,
       |         coalesce(1.0::DOUBLE / (60 + lexp.lex_rn), 0.0) +
       |         coalesce(1.0::DOUBLE / (60 + vecp.vec_rn), 0.0) AS rrf_raw
       |  FROM lexp FULL OUTER JOIN vecp ON lexp.doc_id = vecp.doc_id),
       |lexk AS (SELECT doc_id, row_number() OVER (ORDER BY score_raw DESC, doc_id) AS rn
       |         FROM lexs ORDER BY score_raw DESC, doc_id LIMIT $k),
       |veck AS (SELECT doc_id, row_number() OVER (ORDER BY sim_raw DESC, doc_id) AS rn
       |         FROM vs ORDER BY sim_raw DESC, doc_id LIMIT $k),
       |hybk AS (SELECT doc_id, row_number() OVER (ORDER BY rrf_raw DESC, doc_id) AS rn
       |         FROM fused ORDER BY rrf_raw DESC, doc_id LIMIT $k)
       |SELECT * FROM (
       |${variantSelect("lexk", "lexical")}
       |UNION ALL
       |${variantSelect("veck", "vector")}
       |UNION ALL
       |${variantSelect("hybk", "hybrid")})
       |ORDER BY variant""".stripMargin
  }

  // ------------------------------------------------------------- snippets

  /** Passage/snippet extraction: for the BM25 top-`topDocs` documents,
    * the best window of ≤`window` tokens — the one containing the most
    * query-term occurrences (ties → earliest window). The relational
    * analog of the reference's result-content formatting
    * (vector_search_tool.py truncates blindly at 200 chars; a retrieval
    * surface should show the matching passage instead).
    *
    * Candidate-first: positions are exploded ONLY for the `topDocs`
    * already-ranked documents (broadcast semi-join), never the corpus.
    * The per-position hit count is a ROWS-frame running window — token
    * positions are gap-free, so ROWS ≡ RANGE and both engines agree.
    * All scoring is integer; text slicing happens once per winning row.
    */
  def snippets(documents: DataFrame, terms: Seq[String],
               topDocs: Int = 5, window: Int = 15): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("t")).cache()
    val top = TextAnalysis.bm25Scored(toks, terms)
      .orderBy(desc("score_raw"), asc("doc_id")).limit(topDocs)
      .select("doc_id")
    val pos = documents.join(broadcast(top), "doc_id")
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .select(col("doc_id"), col("ts"),
        posexplode(col("ts")).as(Seq("pos", "t")))
    val hitW = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(window - 1), 0)
    val ranked = pos
      .withColumn("hits",
        sum(when(col("t").isin(terms: _*), 1L).otherwise(0L)).over(hitW))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(desc("hits"), asc("pos"))))
      .filter(col("rn") === 1)
    ranked.select(
      col("doc_id"),
      greatest(col("pos") - (window - 1), lit(0)).cast("long").as("start"),
      col("hits"),
      concat_ws(" ", slice(col("ts"),
        greatest(col("pos") - (window - 1), lit(0)) + 1,
        col("pos") - greatest(col("pos") - (window - 1), lit(0)) + 1)).as("snippet"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[snippets]] — parallel unnest zips token/position,
    * same ROWS-frame window, 1-indexed inclusive list slice. */
  def duckSnippets(table: String, terms: Seq[String],
                   topDocs: Int = 5, window: Int = 15): String = {
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val pivot = terms.map(t =>
      s"coalesce(max(CASE WHEN t = '$t' THEN contrib END), 0.0)").mkString("\n      + ")
    s"""WITH tk AS MATERIALIZED (SELECT doc_id, unnest(${duckTokens("text")}) AS t FROM $table),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tk GROUP BY doc_id),
       |st AS (SELECT count(*)::BIGINT AS n_docs,
       |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tk
       |       WHERE t IN ($inList) GROUP BY 1, 2),
       |df AS (SELECT t, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY t),
       |c AS (SELECT tf.doc_id, tf.t,
       |        ln((st.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
       |        (tf.tf * 2.2::DOUBLE) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS contrib
       |      FROM tf JOIN df USING (t) CROSS JOIN st JOIN dl ON dl.doc_id = tf.doc_id),
       |lexs AS (SELECT doc_id, $pivot AS score_raw FROM c GROUP BY doc_id),
       |topd AS (SELECT doc_id FROM lexs ORDER BY score_raw DESC, doc_id LIMIT $topDocs),
       |ts AS (SELECT d.doc_id, ${duckTokens("d.text")} AS ts FROM $table d JOIN topd USING (doc_id)),
       |pos AS (SELECT doc_id, ts, unnest(ts) AS t,
       |               generate_subscripts(ts, 1) - 1 AS pos FROM ts),
       |h AS (SELECT doc_id, ts, pos,
       |        sum(CASE WHEN t IN ($inList) THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY doc_id ORDER BY pos
       |                ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW) AS hits
       |      FROM pos),
       |b AS (SELECT doc_id, ts, pos, hits,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, pos) AS rn
       |      FROM h)
       |SELECT doc_id, greatest(pos - ${window - 1}, 0)::BIGINT AS start,
       |       hits::BIGINT AS hits,
       |       array_to_string(ts[greatest(pos - ${window - 1}, 0) + 1 : pos + 1], ' ') AS snippet
       |FROM b WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------- PRF query expansion

  /** Pseudo-relevance-feedback query expansion (Rocchio-style): take the
    * BM25 top-`fbDocs` for the seed terms, mine the `expandN` most
    * frequent non-seed terms of length ≥ 4 from them, then re-rank the
    * corpus with the expanded bag under an INTEGER scoring function —
    * `score(d) = Σ_t tf(t,d) · w(t)`, `w(t) = floor(log2(n_docs div
    * df_t)) + 1` (the `length(bin(x))−1` exact-floor-log2 identity,
    * +1 so ubiquitous terms still count matches).
    *
    * The expanded term set is DYNAMIC, which rules out the fixed-order
    * float pivot bm25 uses — so the second pass is integer-exact instead:
    * any summation order gives the same BIGINT, which is what makes a
    * dynamic-bag scorer oracle-matchable at all.
    *
    * Shape: feedback mining touches `fbDocs` documents (semi-join), the
    * re-rank is one broadcast of ≤ seeds+expandN terms against the token
    * relation, one keyed aggregation, TakeOrderedAndProject.
    */
  def prfExpand(documents: DataFrame, seeds: Seq[String],
                fbDocs: Int = 5, expandN: Int = 5, k: Int = 10): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("t")).cache()
    val nDocs = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .agg(count(lit(1)).as("n_docs"))
    val top = TextAnalysis.bm25Scored(toks, seeds)
      .orderBy(desc("score_raw"), asc("doc_id")).limit(fbDocs)
      .select("doc_id")
    val expansion = toks.join(broadcast(top), "doc_id")
      .filter(!col("t").isin(seeds: _*) && length(col("t")) >= 4)
      .groupBy("t").agg(count(lit(1)).as("ftf"))
      .orderBy(desc("ftf"), asc("t")).limit(expandN)
      .select("t")
    val bag = expansion.select("t")
      .union(toks.sparkSession.createDataset(seeds)(
        org.apache.spark.sql.Encoders.STRING).toDF("t"))
      .distinct()
    val df = toks.join(broadcast(bag), "t")
      .groupBy("t").agg(countDistinct("doc_id").as("df"))
    val w = df.crossJoin(broadcast(nDocs))
      .select(col("t"),
        length(bin(expr("n_docs DIV df"))).cast("long").as("w"))
    toks.join(broadcast(w), "t")
      .groupBy("doc_id").agg(sum(col("w")).as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(k)
  }

  /** DuckDB mirror of [[prfExpand]] — `n_docs // df` then
    * `length(bin(x))` keeps the weight integer-exact on both engines
    * (Spark long `/` is double; `//` is DuckDB's integer division). */
  def duckPrfExpand(table: String, seeds: Seq[String],
                    fbDocs: Int = 5, expandN: Int = 5, k: Int = 10): String = {
    val inList = seeds.map(t => s"'$t'").mkString(", ")
    val pivot = seeds.map(t =>
      s"coalesce(max(CASE WHEN t = '$t' THEN contrib END), 0.0)").mkString("\n      + ")
    val seedRows = seeds.map(t => s"('$t')").mkString(", ")
    s"""WITH tk AS MATERIALIZED (SELECT doc_id, unnest(${duckTokens("text")}) AS t FROM $table),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tk GROUP BY doc_id),
       |nd AS (SELECT count(*)::BIGINT AS n_docs FROM dl),
       |st AS (SELECT count(*)::BIGINT AS n_docs,
       |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, t, count(*)::BIGINT AS tf FROM tk
       |       WHERE t IN ($inList) GROUP BY 1, 2),
       |sdf AS (SELECT t, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY t),
       |c AS (SELECT tf.doc_id, tf.t,
       |        ln((st.n_docs - sdf.df + 0.5) / (sdf.df + 0.5) + 1.0) *
       |        (tf.tf * 2.2::DOUBLE) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS contrib
       |      FROM tf JOIN sdf USING (t) CROSS JOIN st JOIN dl ON dl.doc_id = tf.doc_id),
       |lexs AS (SELECT doc_id, $pivot AS score_raw FROM c GROUP BY doc_id),
       |topd AS (SELECT doc_id FROM lexs ORDER BY score_raw DESC, doc_id LIMIT $fbDocs),
       |exp AS (SELECT t FROM tk JOIN topd USING (doc_id)
       |        WHERE t NOT IN ($inList) AND length(t) >= 4
       |        GROUP BY t ORDER BY count(*) DESC, t LIMIT $expandN),
       |bag AS (SELECT DISTINCT t FROM (SELECT t FROM exp UNION ALL
       |        SELECT t FROM (VALUES $seedRows) s(t))),
       |bdf AS (SELECT t, count(DISTINCT doc_id)::BIGINT AS df
       |        FROM tk JOIN bag USING (t) GROUP BY t),
       |w AS (SELECT t, length(bin(n_docs // df))::BIGINT AS w
       |      FROM bdf CROSS JOIN nd)
       |SELECT tk.doc_id, sum(w.w)::BIGINT AS score
       |FROM tk JOIN w USING (t)
       |GROUP BY tk.doc_id ORDER BY score DESC, tk.doc_id LIMIT $k""".stripMargin
  }

  /** DuckDB mirror of [[mmrRerank]]: the greedy loop as a recursive CTE.
    * The recursive term is joins + GROUP BY + a rank window — NOT nested
    * correlated scalar subqueries, which DuckDB mis-evaluates inside
    * recursion (measured: picked a different row with a NaN score). */
  def duckMmrRerank(table: String, poolN: Int = 30, k: Int = 8,
                    lam: Double = 0.7, excludeId: Long = 0L): String = {
    val mu = 1.0 - lam
    val cos = duckCosine("e.embedding", "q.qv")
    val cospp = s"(${duckDot("a.e", "b.e")} / (a.n * b.n))"
    s"""WITH RECURSIVE
       |q AS (SELECT embedding AS qv FROM $table WHERE vec_id = $excludeId),
       |pool AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding AS e, sqrt(${duckDot("e.embedding", "e.embedding")}) AS n,
       |         $cos AS simq
       |  FROM $table e CROSS JOIN q WHERE e.vec_id <> $excludeId
       |  ORDER BY simq DESC, e.vec_id LIMIT $poolN),
       |pw AS MATERIALIZED (
       |  SELECT a.vec_id AS ai, b.vec_id AS bi, $cospp AS s
       |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
       |sel(step, ids, picked, score) AS (
       |  SELECT 1, [p.vec_id], p.vec_id, p.simq
       |  FROM (SELECT vec_id, simq FROM pool ORDER BY simq DESC, vec_id LIMIT 1) p
       |  UNION ALL
       |  SELECT step + 1, list_append(ids, vid), vid, sc
       |  FROM (
       |    SELECT step, ids, vid, sc,
       |           row_number() OVER (ORDER BY sc DESC, vid) AS rn
       |    FROM (
       |      SELECT sel.step, sel.ids, p.vec_id AS vid,
       |             ${lam}::DOUBLE * p.simq - ${mu}::DOUBLE * max(pw.s) AS sc
       |      FROM sel
       |      JOIN pool p ON NOT list_contains(sel.ids, p.vec_id)
       |      JOIN pw ON pw.ai = p.vec_id AND list_contains(sel.ids, pw.bi)
       |      WHERE sel.step < $k
       |      GROUP BY sel.step, sel.ids, p.vec_id, p.simq))
       |  WHERE rn = 1
       |)
       |SELECT step::BIGINT AS step, picked AS vec_id, round(score, 6) AS mmr
       |FROM sel ORDER BY step""".stripMargin
  }
}
