package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns.{duckShingles, duckTokens}

/** Distributed cardinality sketches — the approximate-statistics layer a
  * 100 TB pipeline runs where exact `count(distinct)` stops being viable
  * (corpus-wide vocabulary/shingle cardinality needs a shuffle of every
  * distinct value; a sketch needs a CONSTANT-size state per group).
  *
  * Engine-exactness is the design constraint (every operator here is
  * oracle-gated like any other query): the hash is md5 — same bytes on
  * both engines — register updates are integer max-aggregations, and the
  * final harmonic-mean estimate is a FIXED-ORDER float expression over a
  * literal register list (the BM25 pivot trick), so both engines evaluate
  * the identical expression tree on identical integers. No randomness, no
  * platform-dependent hashing, no accumulation-order dependence anywhere.
  *
  * Scale shape: one linear pass → groupBy (group, register) max — map-side
  * partial max, 16·|groups| rows out — then one |groups|-row pivot. The
  * exact count carried alongside at test scale is the honesty column (the
  * measured error is part of the contract); a deployment drops it.
  *
  * Cache lifecycle: the shared shingle relations here are `.cache()`d and
  * live as long as the returned lazy plan — same contract as [[Dedup]]'s
  * header: the harness clears session caches per query; a library caller
  * clears them once results are materialized.
  */
object Sketches {

  private val M = 16 // registers (bucket nibble = first hex char)
  private val Alpha = 0.673 // standard HLL bias constant for m=16

  /** HyperLogLog distinct-shingle estimate per language, with the exact
    * count and relative error alongside: (lang, m, est, exact, err_frac).
    *
    * Register math (all integer): h = md5(shingle); bucket = first hex
    * nibble (16 registers); the next 15 hex chars are a 60-bit positive
    * int x, and the rank is the 1-based position of its highest set bit
    * from the top: rho = 61 - length(bin(x)) (+1 when x = 0 cannot occur:
    * md5 of distinct shingles hitting 60 zero bits has probability 2^-60,
    * and the oracle would catch the discrepancy anyway — the expression
    * still clamps it into range via greatest()).
    */
  /** (lang, s) shingle rows with the language carried (TextFns'
    * [[graft.functions.TextFns.shingleRowsOf]] keeps only doc_id) — shared
    * by the per-language sketches; posexplode + lead row form per the
    * interpreted-HOF rule (the array-transform form measured 12× slower on
    * q_kmv_distinct at sf0.1). */
  private def langShingleRows(documents: DataFrame, n: Int): DataFrame =
    graft.functions.TextFns.shingleRowsOfTokens(
      documents.select(col("lang"), col("doc_id"),
        posexplode(graft.functions.TextFns.tokens(col("text"))).as(Seq("i", "t0"))),
      n, carry = Seq("lang"))

  def hllDistinctShingles(documents: DataFrame, n: Int = 3): DataFrame = {
    // cached: the register branch and the exact-count honesty branch both
    // read it (only aggregates consume it — no join-side estimate hazard;
    // harness clears the cache after every query)
    val rows = langShingleRows(documents, n).cache()
    val h = md5(col("s"))
    val x = conv(substring(h, 2, 15), 16, 10).cast("long")
    val reg = rows
      .withColumn("b", conv(substring(h, 1, 1), 16, 10).cast("int"))
      .withColumn("rho", greatest(lit(1), lit(61) - length(bin(x))))
      .groupBy("lang", "b").agg(max("rho").as("m_j"))
    // pivot the 16 registers into literal columns (fixed order); absent
    // registers are 0 (the HLL empty-register value)
    val regCols = (0 until M).map(j =>
      coalesce(max(when(col("b") === j, col("m_j"))), lit(0)).as(s"r$j"))
    val pivoted = reg.groupBy("lang").agg(regCols.head, regCols.tail: _*)
    // fixed-order harmonic sum + zero-register count, as literal chains
    val harm: Column = (0 until M).map(j =>
      pow(lit(2.0), -col(s"r$j"))).reduceLeft(_ + _)
    val zeros: Column = (0 until M).map(j =>
      when(col(s"r$j") === 0, 1).otherwise(0): Column).reduceLeft(_ + _)
    val eRaw = lit(Alpha) * lit(M) * lit(M) / harm
    // small-range correction (linear counting) when registers are sparse
    val est = when(zeros > 0 && eRaw <= lit(2.5 * M),
      lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double"))).otherwise(eRaw)
    val exact = rows.select(col("lang"), col("s")).distinct()
      .groupBy("lang").agg(count(lit(1)).as("exact"))
    pivoted
      .withColumn("est_raw", est)
      .join(exact, "lang")
      .select(col("lang"), lit(M).cast("long").as("m"),
        round(col("est_raw"), 6).as("est"), col("exact"),
        round(abs(col("est_raw") - col("exact").cast("double")) / col("exact").cast("double"), 6)
          .as("err_frac"))
      .orderBy("lang")
  }

  /** Bloom-filter decontamination — the constant-size variant of
    * [[CorpusOps.decontaminate]]: instead of broadcasting the benchmark's
    * full shingle SET (MBs today, GBs for a big eval union), broadcast a
    * Bloom filter of it and probe every training shingle with `kHash`
    * md5-derived bit positions. A shingle is a *maybe-hit* iff all k bits
    * are set; exact overlap (the set semi-join, still cheap at test scale)
    * rides along as the honesty columns, so every emitted row carries its
    * own false-positive accounting — same contract as the HLL sketch above
    * (est + exact + error in one oracle-gated row). The filter size m =
    * |bench shingles| × `bitsPerElement` is DERIVED IN-PLAN from the data
    * (round-5; the round-4 fixed m saturated at sf0.1), so the fill
    * fraction — reported per row as (m_bits, n_set_bits, fill_frac) — is
    * scale-stable by construction: ≈ 1 − exp(−kHash/bitsPerElement) ≈ 0.22
    * at the 12-bits/element default, at EVERY corpus scale.
    *
    * Engine-exactness: bit positions are integer arithmetic on md5 hex
    * prefixes (`conv(substr(md5('bloomJ:' || s), 1, 8), 16, 10) % m`), m is
    * an exact integer product, the filter is the DISTINCT set of set-bit
    * positions, and probing counts matched positions per shingle —
    * identical integer trees both engines.
    *
    * Scale shape: bits relation ≤ k·|bench shingles| rows but at most m
    * distinct values — broadcast by construction (that is the POINT: m
    * grows with the EVAL SUITE, never the corpus, and the probe is a
    * map-side join however big the corpus side grows). The probe explodes
    * k rows per training shingle — rows, not array lambdas, per the
    * HOF-interpreted rule — then one keyed count per (doc, s).
    */
  def bloomDecontam(documents: DataFrame,
                    benchMod: Int = CorpusOps.DefaultBenchMod,
                    n: Int = CorpusOps.DefaultShingleN,
                    bitsPerElement: Int = 12, kHash: Int = 3): DataFrame = {
    import graft.functions.TextFns.shingleRowsOf
    // m is DERIVED FROM THE DATA, in-plan: |bench shingles| × bits/element
    // (~12 bits/elt ≈ 0.1% fp at k=3). A fixed m was the round-4 shape and
    // saturated one scale factor up (sf0.1: fill → 1, fp column → noise);
    // deriving it pins the fill fraction across scale factors instead —
    // the filter grows WITH the eval suite, which is the actual deployment
    // contract (the suite is the small side; its size is known at build).
    // All integer, so both engines compute the identical m.
    def pos(j: Int): Column =
      conv(substring(md5(concat(lit(s"bloom$j:"), col("s"))), 1, 8), 16, 10)
        .cast("long") % col("m")
    val bench = documents.filter(col("doc_id") % benchMod === 0)
    val train = documents.filter(col("doc_id") % benchMod =!= 0)
    // cached: the bit build and the exact-hits semi-join both read it, and
    // both consumers are explicit broadcast() sides - no lock-in hazard
    val bsh = shingleRowsOf(bench, n).select(col("s")).distinct().cache()
    // cached: probed twice (bloom rows + exact honesty semi-join), same
    // lifecycle as decontaminate's corpus relation (harness clears/query)
    val tsh = shingleRowsOf(train, n).distinct().cache()
    // greatest(…, 1): an empty benchmark slice must yield an empty result,
    // not a divide-by-zero (Spark's % 0 is null, DuckDB's is an ERROR —
    // the guard keeps the mirrors in contract on that edge)
    val mB = broadcast(
      bsh.agg(greatest(count(lit(1)) * bitsPerElement, lit(1L)).cast("long").as("m")))
    val bits = bsh.crossJoin(mB)
      .select(explode(array((0 until kHash).map(pos): _*)).as("b")).distinct()
    val nSet = broadcast(bits.agg(count(lit(1)).cast("long").as("n_set_bits")))
    val probe = tsh.crossJoin(mB).select(col("doc_id"), col("s"),
      explode(array((0 until kHash).map(pos): _*)).as("b"))
    val bloomHits = probe.join(broadcast(bits), "b")
      .groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
      .filter(col("c") === kHash)
      .groupBy("doc_id").agg(count(lit(1)).as("bloom_hits"))
    val exactHits = tsh.join(broadcast(bsh), "s")
      .groupBy("doc_id").agg(count(lit(1)).as("exact_hits"))
    val sizes = tsh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    // hint("merge"): all three are cached-tsh-derived doc-cardinality
    // aggregates - the jaccardTail pin rule (doc-keyed, the cheap
    // high-cardinality case, not the embedCosine bucket-join exception)
    bloomHits
      .join(sizes.hint("merge"), "doc_id")
      .join(exactHits.hint("merge"), Seq("doc_id"), "left")
      .crossJoin(mB).crossJoin(nSet)
      .select(col("doc_id"), col("n_shingles"), col("bloom_hits"),
        coalesce(col("exact_hits"), lit(0L)).as("exact_hits"),
        (col("bloom_hits") - coalesce(col("exact_hits"), lit(0L))).as("false_pos"),
        // filter-level honesty: the derived size and how full it ran —
        // fill ≈ 1 − exp(−k·n/m) ≈ 0.22 at 12 bits/elt, scale-stable now
        col("m").as("m_bits"), col("n_set_bits"),
        round(col("n_set_bits").cast("double") / col("m").cast("double"), 6)
          .as("fill_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[bloomDecontam]] — m derived in the same CTE chain. */
  def duckBloomDecontam(table: String,
                        benchMod: Int = CorpusOps.DefaultBenchMod,
                        n: Int = CorpusOps.DefaultShingleN,
                        bitsPerElement: Int = 12, kHash: Int = 3): String = {
    def pos(j: Int) = s"('0x' || substr(md5('bloom$j:' || s), 1, 8))::BIGINT % m"
    val posList = (0 until kHash).map(pos).mkString("[", ", ", "]")
    s"""WITH tk AS (SELECT doc_id, ${duckTokens("text")} AS t FROM $table),
       |sh AS (SELECT DISTINCT doc_id, s
       |       FROM (SELECT doc_id, unnest(${duckShingles("t", n)}) AS s FROM tk)),
       |bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % $benchMod = 0),
       |tsh AS (SELECT doc_id, s FROM sh WHERE doc_id % $benchMod <> 0),
       |mm AS (SELECT greatest(count(*) * $bitsPerElement, 1)::BIGINT AS m FROM bsh),
       |bits AS (SELECT DISTINCT unnest($posList) AS b FROM bsh CROSS JOIN mm),
       |nset AS (SELECT count(*)::BIGINT AS n_set_bits FROM bits),
       |probe AS (SELECT doc_id, s, unnest($posList) AS b FROM tsh CROSS JOIN mm),
       |maybe AS (SELECT doc_id, s FROM probe JOIN bits USING (b)
       |          GROUP BY doc_id, s HAVING count(*) = $kHash),
       |bloom AS (SELECT doc_id, count(*)::BIGINT AS bloom_hits FROM maybe GROUP BY doc_id),
       |ex AS (SELECT doc_id, count(*)::BIGINT AS exact_hits
       |       FROM tsh JOIN bsh USING (s) GROUP BY doc_id),
       |sizes AS (SELECT doc_id, count(*)::BIGINT AS n_shingles FROM tsh GROUP BY doc_id)
       |SELECT b.doc_id, sizes.n_shingles, b.bloom_hits,
       |       coalesce(ex.exact_hits, 0)::BIGINT AS exact_hits,
       |       (b.bloom_hits - coalesce(ex.exact_hits, 0))::BIGINT AS false_pos,
       |       mm.m AS m_bits, nset.n_set_bits,
       |       round(nset.n_set_bits::DOUBLE / mm.m::DOUBLE, 6) AS fill_frac
       |FROM bloom b JOIN sizes USING (doc_id) LEFT JOIN ex USING (doc_id)
       |CROSS JOIN mm CROSS JOIN nset
       |ORDER BY doc_id""".stripMargin
  }

  /** KMV (k-minimum-values) distinct-shingle estimate per language — the
    * bottom-k companion to [[hllDistinctShingles]]: keep the k smallest
    * 60-bit hash values per group; if the k-th smallest is x_k, the
    * distinct count is ≈ (k−1)·2⁶⁰/x_k (the k-th order statistic of
    * uniforms estimator, Bar-Yossef et al. 2002). Two properties HLL lacks:
    * the state IS a uniform sample of the distinct values (usable for
    * downstream estimation), and two sketches merge by taking the bottom-k
    * of their union — the distributed-combine shape.
    *
    * Engine-exactness: hashes are 60-bit integers from md5 hex (exact in
    * both engines), the bottom-k is a rank window with the deterministic
    * (hash, shingle) tiebreak, and the estimate is one double division of
    * two exact integers — identical trees both sides. Exact count and
    * relative error ride along as the honesty columns.
    *
    * Scale shape: distinct (lang, shingle) agg (linear, map-side partials)
    * → per-lang bottom-k rank window (k·|langs| survivors; the window is
    * the [[graft.plans.TopKPerKey]] rewrite's target shape when enabled)
    * → one |langs|-row projection. State per group is k hashes — constant.
    */
  def kmvDistinctShingles(documents: DataFrame, n: Int = 3, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached: the bottom-k branch and the exact-count honesty branch both
    // read the distinct relation (aggregate/window consumers only — no
    // join-side estimate hazard; harness clears per query)
    val sh = langShingleRows(documents, n)
      .distinct()
      .cache()
      .withColumn("x", conv(substring(md5(col("s")), 2, 15), 16, 10).cast("long"))
    val w = Window.partitionBy("lang").orderBy(asc("x"), asc("s"))
    val bottomK = sh.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
    val exact = sh.groupBy("lang").agg(count(lit(1)).as("exact"))
    bottomK
      .groupBy("lang").agg(max(when(col("rn") === k, col("x"))).as("xk"),
        count(lit(1)).as("n_kept"))
      .join(exact, "lang")
      // est_raw projected ONCE (the hll/est-CTE form): est and err_frac
      // must be the same tree or the exactness contract silently splits
      .withColumn("est_raw",
        // fewer than k distinct values → the sketch holds them all: exact
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976L).cast("double")
            / col("xk").cast("double")))
      .select(col("lang"), lit(k).cast("long").as("k"),
        round(col("est_raw"), 6).as("est"),
        col("exact"),
        round(abs(col("est_raw") - col("exact").cast("double"))
          / col("exact").cast("double"), 6).as("err_frac"))
      .orderBy("lang")
  }

  /** DuckDB mirror of [[kmvDistinctShingles]]. */
  def duckKmvDistinctShingles(table: String, n: Int = 3, k: Int = 64): String =
    s"""WITH tk AS (SELECT lang, ${duckTokens("text")} AS t FROM $table),
       |sh AS (SELECT DISTINCT lang, s
       |       FROM (SELECT lang, unnest(${duckShingles("t", n)}) AS s FROM tk)),
       |hx AS (SELECT lang, s, ('0x' || substr(md5(s), 2, 15))::BIGINT AS x FROM sh),
       |r AS (SELECT lang, x, row_number() OVER (PARTITION BY lang ORDER BY x, s) AS rn FROM hx),
       |bk AS (SELECT lang, max(CASE WHEN rn = $k THEN x END) AS xk, count(*) AS n_kept
       |       FROM r WHERE rn <= $k GROUP BY lang),
       |ex AS (SELECT lang, count(*)::BIGINT AS exact FROM sh GROUP BY lang),
       |e AS (SELECT bk.lang, ex.exact,
       |             CASE WHEN bk.n_kept < $k THEN CAST(bk.n_kept AS DOUBLE)
       |                  ELSE ${(k - 1).toDouble} * 1152921504606846976::DOUBLE / CAST(bk.xk AS DOUBLE) END AS est_raw
       |      FROM bk JOIN ex USING (lang))
       |SELECT lang, ${k}::BIGINT AS k, round(est_raw, 6) AS est, exact,
       |       round(abs(est_raw - CAST(exact AS DOUBLE)) / CAST(exact AS DOUBLE), 6) AS err_frac
       |FROM e ORDER BY lang""".stripMargin

  /** Default probe set for [[cmsCounts]] — frequent corpus tokens plus one
    * deliberately-absent token, whose nonzero estimate (when buckets
    * collide) is the CMS overestimate property on display. Declared once so
    * the operator and its oracle can never drift. */
  val CmsProbes: Seq[String] = Seq("spark", "table", "stream", "vector", "query", "zzzabsent")

  private val CmsDepth = 4 // hash rows
  private val CmsWidth = 256 // counters per row

  /** Count-Min sketch point-frequency estimates for a fixed probe-token
    * list, exact counts alongside — the constant-state answer to "how often
    * does token t occur corpus-wide" when the vocabulary is too large to
    * groupBy (the HLL contract, for frequencies instead of cardinality).
    *
    * Sketch build is ONE linear pass: each token emits `CmsDepth` (row,
    * bucket) keys — generated as rows via explode, not array lambdas (the
    * HOF-interpreted rule) — and the groupBy partials cap at depth×width
    * = 1024 counters per map task, so the shuffle is constant-size no
    * matter the corpus. Estimates read `min_j counter[j][hash_j(t)]`
    * (missing bucket = 0) for the literal probe list; `exact` and
    * `overest = est - exact` are the honesty columns (CMS never
    * underestimates — the spec gates that).
    *
    * Engine-exactness: buckets are integer arithmetic on md5 hex halves;
    * counters and mins are integer — identical trees both engines. The
    * `CmsDepth` row hashes derive from ONE md5 per token via the standard
    * two-hash composition `bucket_j = (h1 + j·h2) mod w` (Kirsch &
    * Mitzenmacher 2006) — measured 2× on the sketch build at sf0.1 vs one
    * md5 per (token, row).
    */
  def cmsCounts(documents: DataFrame, probes: Seq[String] = CmsProbes): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    def h(tok: Column, off: Int): Column =
      conv(substring(md5(tok), off, 8), 16, 10).cast("long")
    def bucket(tok: Column, j: Column): Column =
      (h(tok, 1) + j.cast("long") * h(tok, 9)) % CmsWidth
    val tok = documents.select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
    // h1/h2 projected BEFORE the depth explode: one md5 per token, not one
    // per (token, row) — the whole point of the two-hash composition
    val sk = tok
      .select(h(col("t"), 1).as("h1"), h(col("t"), 9).as("h2"))
      .select(col("h1"), col("h2"),
        explode(array((0 until CmsDepth).map(j => lit(j)): _*)).as("j"))
      .select(col("j"), ((col("h1") + col("j").cast("long") * col("h2")) % CmsWidth).as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
    val pr = probes.flatMap(t => (0 until CmsDepth).map(j => (t, j))).toDF("token", "j")
      .withColumn("b", bucket(col("token"), col("j")))
    val est = pr.join(sk, Seq("j", "b"), "left")
      .groupBy("token").agg(min(coalesce(col("c"), lit(0L))).as("est"))
    val exact = tok.filter(col("t").isin(probes: _*))
      .groupBy(col("t").as("token")).agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("token"), "left")
      .select(col("token"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"),
        (col("est") - coalesce(col("exact"), lit(0L))).as("overest"))
      .orderBy("token")
  }

  /** DuckDB mirror of [[cmsCounts]]. */
  def duckCmsCounts(table: String, probes: Seq[String] = CmsProbes): String = {
    def bucket(tokExpr: String, jExpr: String) =
      s"((('0x' || substr(md5($tokExpr), 1, 8))::BIGINT + $jExpr * ('0x' || substr(md5($tokExpr), 9, 8))::BIGINT) % $CmsWidth)"
    val jList = (0 until CmsDepth).mkString("[", ", ", "]")
    // quote-escaped: probes is a public parameter (round-4 review)
    val probeValues = probes.map(t => s"('${t.replace("'", "''")}')").mkString(", ")
    val probeIn = probes.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH tok AS (SELECT unnest(${duckTokens("text")}) AS t FROM $table),
       |sk AS (SELECT j, ${bucket("t", "j")} AS b, count(*)::BIGINT AS c
       |       FROM tok, unnest($jList) AS u(j) GROUP BY 1, 2),
       |pr AS (SELECT token, j, ${bucket("token", "j")} AS b
       |       FROM (VALUES $probeValues) t(token), unnest($jList) AS u(j)),
       |est AS (SELECT token, min(coalesce(c, 0))::BIGINT AS est
       |        FROM pr LEFT JOIN sk USING (j, b) GROUP BY token),
       |ex AS (SELECT t AS token, count(*)::BIGINT AS exact FROM tok
       |       WHERE t IN ($probeIn) GROUP BY t)
       |SELECT est.token, est.est, coalesce(ex.exact, 0)::BIGINT AS exact,
       |       (est.est - coalesce(ex.exact, 0))::BIGINT AS overest
       |FROM est LEFT JOIN ex USING (token) ORDER BY token""".stripMargin
  }

  /** DuckDB mirror of [[hllDistinctShingles]]. */
  def duckHllDistinctShingles(table: String, n: Int = 3): String = {
    val harm = (0 until M).map(j => s"pow(2.0, -r$j)").mkString(" + ")
    val zeros = (0 until M).map(j => s"(CASE WHEN r$j = 0 THEN 1 ELSE 0 END)").mkString(" + ")
    val regCols = (0 until M).map(j =>
      s"coalesce(max(CASE WHEN b = $j THEN m_j END), 0) AS r$j").mkString(",\n       |       ")
    s"""WITH tk AS (SELECT lang, doc_id, ${duckTokens("text")} AS t FROM $table),
       |sh AS (SELECT lang, unnest(${duckShingles("t", n)}) AS s FROM tk),
       |hx AS (SELECT lang, s, md5(s) AS h FROM sh),
       |rr AS (SELECT lang,
       |              ('0x' || substr(h, 1, 1))::BIGINT AS b,
       |              greatest(1, 61 - length(bin(('0x' || substr(h, 2, 15))::BIGINT))) AS rho
       |       FROM hx),
       |reg AS (SELECT lang, b, max(rho) AS m_j FROM rr GROUP BY 1, 2),
       |pv AS (SELECT lang,
       |       $regCols
       |       FROM reg GROUP BY lang),
       |e AS (SELECT lang,
       |             $Alpha::DOUBLE * $M * $M / ($harm) AS e_raw,
       |             ($zeros) AS zeros
       |      FROM pv),
       |est AS (SELECT lang,
       |               CASE WHEN zeros > 0 AND e_raw <= ${2.5 * M}
       |                    THEN ${M.toDouble} * ln(${M.toDouble} / CAST(zeros AS DOUBLE))
       |                    ELSE e_raw END AS est_raw
       |        FROM e),
       |ex AS (SELECT lang, count(*)::BIGINT AS exact
       |       FROM (SELECT DISTINCT lang, s FROM sh) GROUP BY lang)
       |SELECT est.lang, ${M}::BIGINT AS m, round(est_raw, 6) AS est, ex.exact,
       |       round(abs(est_raw - CAST(ex.exact AS DOUBLE)) / CAST(ex.exact AS DOUBLE), 6) AS err_frac
       |FROM est JOIN ex ON ex.lang = est.lang ORDER BY est.lang""".stripMargin
  }

  /** HLL MERGEABILITY demonstration — THE property that makes a sketch a
    * 100 TB operator: per-(lang, source) partial registers (what each
    * ingest shard would ship) merged by register-wise max must yield the
    * IDENTICAL estimate as registers computed directly over the union.
    * `max` over a union is the max of per-shard maxes, so the merged and
    * direct register vectors are equal integers, the two estimate
    * expressions are the same tree over the same inputs, and
    * `merged_eq_direct` is an exact boolean — gate-checked per lang, not
    * asserted in prose. At cluster scale this is the map-side-combine
    * shape: shards never exchange shingles, only 16-int register vectors.
    */
  def hllMergeShingles(documents: DataFrame, n: Int = 3): DataFrame = {
    val rows = graft.functions.TextFns.shingleRowsOfTokens(
      documents.select(col("lang"), col("source"), col("doc_id"),
        posexplode(graft.functions.TextFns.tokens(col("text"))).as(Seq("i", "t0"))),
      n, carry = Seq("lang", "source")).cache()
    val h = md5(col("s"))
    val x = conv(substring(h, 2, 15), 16, 10).cast("long")
    val rr = rows
      .withColumn("b", conv(substring(h, 1, 1), 16, 10).cast("int"))
      .withColumn("rho", greatest(lit(1), lit(61) - length(bin(x))))
    val part = rr.groupBy("lang", "source", "b").agg(max("rho").as("m_j"))
    val merged = part.groupBy("lang", "b").agg(max("m_j").as("m_j"))
    val direct = rr.groupBy("lang", "b").agg(max("rho").as("m_j"))
    def estOf(reg: DataFrame, name: String): DataFrame = {
      val regCols = (0 until M).map(j =>
        coalesce(max(when(col("b") === j, col("m_j"))), lit(0)).as(s"r$j"))
      val p = reg.groupBy("lang").agg(regCols.head, regCols.tail: _*)
      val harm: Column = (0 until M).map(j =>
        pow(lit(2.0), -col(s"r$j"))).reduceLeft(_ + _)
      val zeros: Column = (0 until M).map(j =>
        when(col(s"r$j") === 0, 1).otherwise(0): Column).reduceLeft(_ + _)
      val eRaw = lit(Alpha) * lit(M) * lit(M) / harm
      val est = when(zeros > 0 && eRaw <= lit(2.5 * M),
        lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double"))).otherwise(eRaw)
      p.select(col("lang"), est.as(name))
    }
    estOf(merged, "em").join(estOf(direct, "ed"), "lang")
      .select(col("lang"), lit(M).cast("long").as("m"),
        round(col("em"), 6).as("est_merged"),
        round(col("ed"), 6).as("est_direct"),
        (col("em") === col("ed")).as("merged_eq_direct"))
      .orderBy("lang")
  }

  /** (lang, b, m_j) HLL registers over shingles — the mergeable partial
    * state a shard (or micro-batch) ships; max-merge them and feed
    * [[hllEstimateOf]]. */
  private[graft] def hllRegisters(documents: DataFrame, n: Int = 3): DataFrame = {
    val rows = langShingleRows(documents, n)
    val h = md5(col("s"))
    val x = conv(substring(h, 2, 15), 16, 10).cast("long")
    rows
      .withColumn("b", conv(substring(h, 1, 1), 16, 10).cast("int"))
      .withColumn("rho", greatest(lit(1), lit(61) - length(bin(x))))
      .groupBy("lang", "b").agg(max("rho").as("m_j"))
  }

  /** (lang, m, est) from a register relation — the estimate tail every
    * HLL query shares (fixed-order pivot + harmonic sum + linear-counting
    * correction). */
  private[graft] def hllEstimateOf(reg: DataFrame): DataFrame = {
    val regCols = (0 until M).map(j =>
      coalesce(max(when(col("b") === j, col("m_j"))), lit(0)).as(s"r$j"))
    val p = reg.groupBy("lang").agg(regCols.head, regCols.tail: _*)
    val harm: Column = (0 until M).map(j =>
      pow(lit(2.0), -col(s"r$j"))).reduceLeft(_ + _)
    val zeros: Column = (0 until M).map(j =>
      when(col(s"r$j") === 0, 1).otherwise(0): Column).reduceLeft(_ + _)
    val eRaw = lit(Alpha) * lit(M) * lit(M) / harm
    val est = when(zeros > 0 && eRaw <= lit(2.5 * M),
      lit(M.toDouble) * log(lit(M.toDouble) / zeros.cast("double"))).otherwise(eRaw)
    p.select(col("lang"), lit(M).cast("long").as("m"), round(est, 6).as("est"))
  }

  /** DuckDB mirror of register-build + estimate WITHOUT the exact-count
    * honesty columns — the oracle for consumers whose whole point is
    * never re-touching the corpus (q_stream_hll). */
  def duckHllEstOnly(table: String, n: Int = 3): String = {
    val harm = (0 until M).map(j => s"pow(2.0, -r$j)").mkString(" + ")
    val zeros = (0 until M).map(j => s"(CASE WHEN r$j = 0 THEN 1 ELSE 0 END)").mkString(" + ")
    val regCols = (0 until M).map(j =>
      s"coalesce(max(CASE WHEN b = $j THEN m_j END), 0) AS r$j").mkString(",\n       |       ")
    s"""WITH tk AS (SELECT lang, ${duckTokens("text")} AS t FROM $table),
       |sh AS (SELECT lang, unnest(${duckShingles("t", n)}) AS s FROM tk),
       |rr AS (SELECT lang,
       |              ('0x' || substr(md5(s), 1, 1))::BIGINT AS b,
       |              greatest(1, 61 - length(bin(('0x' || substr(md5(s), 2, 15))::BIGINT))) AS rho
       |       FROM sh),
       |reg AS (SELECT lang, b, max(rho) AS m_j FROM rr GROUP BY 1, 2),
       |pv AS (SELECT lang,
       |       $regCols
       |       FROM reg GROUP BY lang),
       |e AS (SELECT lang,
       |             $Alpha::DOUBLE * $M * $M / ($harm) AS e_raw,
       |             ($zeros) AS zeros
       |      FROM pv)
       |SELECT lang, ${M}::BIGINT AS m,
       |       round(CASE WHEN zeros > 0 AND e_raw <= ${2.5 * M}
       |                  THEN ${M.toDouble} * ln(${M.toDouble} / CAST(zeros AS DOUBLE))
       |                  ELSE e_raw END, 6) AS est
       |FROM e ORDER BY lang""".stripMargin
  }

  /** KMV MERGEABILITY — the bottom-k companion to [[hllMergeShingles]]:
    * per-(lang, source) bottom-k value sets unioned and re-ranked must
    * yield the IDENTICAL k-th minimum (hence estimate) as the direct
    * bottom-k over all distinct shingles. Sound because every globally
    * bottom-k value is, within its own source, smaller than fewer than k
    * values — so it survives that source's cut and reaches the merged
    * pool. Shards ship ≤k (value, hash) rows each, never shingles. */
  def kmvMergeShingles(documents: DataFrame, n: Int = 3, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = graft.functions.TextFns.shingleRowsOfTokens(
      documents.select(col("lang"), col("source"), col("doc_id"),
        posexplode(graft.functions.TextFns.tokens(col("text"))).as(Seq("i", "t0"))),
      n, carry = Seq("lang", "source"))
      .distinct().cache()
      .withColumn("x", conv(substring(md5(col("s")), 2, 15), 16, 10).cast("long"))
    val ws = Window.partitionBy("lang", "source").orderBy(asc("x"), asc("s"))
    val partBk = sh.withColumn("prn", row_number().over(ws)).filter(col("prn") <= k)
      .select("lang", "s", "x").distinct()
    val direct = sh.select("lang", "s", "x").distinct()
    def estOf(src: DataFrame, name: String): DataFrame = {
      val w = Window.partitionBy("lang").orderBy(asc("x"), asc("s"))
      src.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .groupBy("lang").agg(max(when(col("rn") === k, col("x"))).as("xk"),
          count(lit(1)).as("n_kept"))
        .select(col("lang"),
          when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976L).cast("double")
              / col("xk").cast("double")).as(name))
    }
    estOf(partBk, "em").join(estOf(direct, "ed"), "lang")
      .select(col("lang"), lit(k).cast("long").as("k"),
        round(col("em"), 6).as("est_merged"),
        round(col("ed"), 6).as("est_direct"),
        (col("em") === col("ed")).as("merged_eq_direct"))
      .orderBy("lang")
  }

  /** DuckDB mirror of [[kmvMergeShingles]]. */
  def duckKmvMergeShingles(table: String, n: Int = 3, k: Int = 64): String = {
    def estCtes(src: String, p: String): String =
      s"""${p}r AS (SELECT lang, x, row_number() OVER (PARTITION BY lang ORDER BY x, s) AS rn
         |      FROM $src),
         |${p}e AS (SELECT lang,
         |      CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
         |           ELSE ${(k - 1).toDouble} * 1152921504606846976::DOUBLE
         |                / CAST(max(CASE WHEN rn = $k THEN x END) AS DOUBLE) END AS est_raw
         |      FROM ${p}r WHERE rn <= $k GROUP BY lang)""".stripMargin
    s"""WITH tk AS (SELECT lang, source, ${duckTokens("text")} AS t FROM $table),
       |sh AS (SELECT DISTINCT lang, source, s
       |       FROM (SELECT lang, source, unnest(${duckShingles("t", n)}) AS s FROM tk)),
       |hx AS (SELECT lang, source, s, ('0x' || substr(md5(s), 2, 15))::BIGINT AS x FROM sh),
       |pr AS (SELECT lang, source, s, x,
       |              row_number() OVER (PARTITION BY lang, source ORDER BY x, s) AS prn
       |       FROM hx),
       |pool AS (SELECT DISTINCT lang, s, x FROM pr WHERE prn <= $k),
       |dct AS (SELECT DISTINCT lang, s, x FROM hx),
       |${estCtes("pool", "m")},
       |${estCtes("dct", "d")}
       |SELECT me.lang, ${k}::BIGINT AS k,
       |       round(me.est_raw, 6) AS est_merged,
       |       round(de.est_raw, 6) AS est_direct,
       |       (me.est_raw = de.est_raw) AS merged_eq_direct
       |FROM me JOIN de ON de.lang = me.lang ORDER BY me.lang""".stripMargin
  }

  /** DuckDB mirror of [[hllMergeShingles]]. */
  def duckHllMergeShingles(table: String, n: Int = 3): String = {
    def estCtes(src: String, p: String): String = {
      val regCols = (0 until M).map(j =>
        s"coalesce(max(CASE WHEN b = $j THEN m_j END), 0) AS r$j").mkString(",\n       |       ")
      val harm = (0 until M).map(j => s"pow(2.0, -r$j)").mkString(" + ")
      val zeros = (0 until M).map(j => s"(CASE WHEN r$j = 0 THEN 1 ELSE 0 END)").mkString(" + ")
      s"""${p}pv AS (SELECT lang,
         |       $regCols
         |       FROM $src GROUP BY lang),
         |${p}e AS (SELECT lang,
         |             $Alpha::DOUBLE * $M * $M / ($harm) AS e_raw,
         |             ($zeros) AS zeros
         |      FROM ${p}pv),
         |${p}est AS (SELECT lang,
         |               CASE WHEN zeros > 0 AND e_raw <= ${2.5 * M}
         |                    THEN ${M.toDouble} * ln(${M.toDouble} / CAST(zeros AS DOUBLE))
         |                    ELSE e_raw END AS est_raw
         |        FROM ${p}e)""".stripMargin
    }
    s"""WITH tk AS (SELECT lang, source, ${duckTokens("text")} AS t FROM $table),
       |sh AS (SELECT lang, source, unnest(${duckShingles("t", n)}) AS s FROM tk),
       |rr AS (SELECT lang, source,
       |              ('0x' || substr(md5(s), 1, 1))::BIGINT AS b,
       |              greatest(1, 61 - length(bin(('0x' || substr(md5(s), 2, 15))::BIGINT))) AS rho
       |       FROM sh),
       |part AS (SELECT lang, source, b, max(rho) AS m_j FROM rr GROUP BY 1, 2, 3),
       |mrg AS (SELECT lang, b, max(m_j) AS m_j FROM part GROUP BY 1, 2),
       |dct AS (SELECT lang, b, max(rho) AS m_j FROM rr GROUP BY 1, 2),
       |${estCtes("mrg", "m")},
       |${estCtes("dct", "d")}
       |SELECT mest.lang, ${M}::BIGINT AS m,
       |       round(mest.est_raw, 6) AS est_merged,
       |       round(dest.est_raw, 6) AS est_direct,
       |       (mest.est_raw = dest.est_raw) AS merged_eq_direct
       |FROM mest JOIN dest ON dest.lang = mest.lang ORDER BY mest.lang""".stripMargin
  }

  // ------------------------------------------------------ quantile sketch

  /** Mergeable QUANTILE sketch over per-doc token counts, per language —
    * the DDSketch/HdrHistogram family (Masson et al., VLDB 2019) in its
    * dyadic form: bucket a value x ≥ 1 by (b, sub) where b = floor(log2 x)
    * (`length(bin(x)) − 1`, the engine-exact quantized-log trick) and
    * sub = (4x DIV 2^b) − 4 ∈ {0..3} — four linear sub-buckets per
    * octave, i.e. DDSketch with γ = 2^(1/4) ≈ 1.19. A quantile estimate
    * is the lower bound of the bucket where the cumulative count crosses
    * the rank (all-integer crossing test, `cum·100 ≥ pct·n`), so the
    * estimate under-reports by at most the bucket width: relative error
    * ≤ 25% guaranteed, ≤ 12.5% expected — and the whole sketch is
    * ~4·log2(max) integers per group.
    *
    * Why it exists: exact percentiles need a per-group SORT of every
    * value (or Spark's `percentile`, which buffers the group); this
    * histogram is one linear pass → (lang, bucket) counts — map-side
    * partial, CONSTANT state, and MERGEABLE BY ADDITION, which is the
    * property the gate checks: shard partials per source, sum-merge
    * them, and assert the merged quantiles equal the direct
    * single-pass quantiles (`merged_eq_direct`, the [[hllMergeShingles]]
    * contract — counts are exact integers so merge-exactness is
    * structural, and that structural exactness is precisely what makes
    * the sketch a distributed-aggregation shape: micro-batches,
    * executors, and days of a feed all ship addable histograms).
    *
    * Engine-exact by construction: bucket ids are integer arithmetic;
    * bucket lower bounds `(4 + sub)·2^b / 4.0` are dyadic rationals
    * (exact in IEEE754 on both engines); the crossing test is integer.
    * Output: (lang, n_docs, q50, q90, q99, merged_eq_direct). */
  def ddQuantileLengths(documents: DataFrame): DataFrame = {
    val lens = documents.select(col("lang"), col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("x"))
      .filter(col("x") >= 1)
    val withBuckets = lens
      .withColumn("b", (length(bin(col("x"))) - 1).cast("long"))
      .withColumn("p2", expr("cast(pow(2, b) as long)"))
      .withColumn("sub", expr("x * 4 DIV p2 - 4"))
    val part = withBuckets.groupBy("lang", "source", "b", "sub")
      .agg(count(lit(1)).as("c"))
    val merged = part.groupBy("lang", "b", "sub").agg(sum("c").as("c"))
    val direct = withBuckets.groupBy("lang", "b", "sub")
      .agg(count(lit(1)).as("c"))
    ddQuantilesOf(merged, "_m").join(ddQuantilesOf(direct, "_d"), "lang")
      .select(col("lang"), col("n_m").as("n_docs"),
        col("q50_m").as("q50"), col("q90_m").as("q90"), col("q99_m").as("q99"),
        (col("q50_m") === col("q50_d") && col("q90_m") === col("q90_d") &&
          col("q99_m") === col("q99_d") && col("n_m") === col("n_d"))
          .as("merged_eq_direct"))
      .orderBy("lang")
  }

  /** (lang, b, sub, c) addable histogram partials over per-doc token
    * counts — the mergeable state a shard/micro-batch ships
    * ([[graft.streaming.StreamOps]]'s quantile maintenance); sum-merge
    * and feed [[ddQuantilesOf]]. */
  private[graft] def ddHistPartials(documents: DataFrame): DataFrame =
    documents.select(col("lang"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("x"))
      .filter(col("x") >= 1)
      .withColumn("b", (length(bin(col("x"))) - 1).cast("long"))
      .withColumn("p2", expr("cast(pow(2, b) as long)"))
      .withColumn("sub", expr("x * 4 DIV p2 - 4"))
      .groupBy("lang", "b", "sub").agg(count(lit(1)).as("c"))

  /** The quantile crossing tail over a (lang, b, sub, c) histogram —
    * bounded relation (|langs| × ~4·log2(max_len) rows, the
    * BoundedWindow shape). Output columns carry `suffix` so the
    * merge-gate join of [[ddQuantileLengths]] can compare two tails. */
  private[graft] def ddQuantilesOf(hist: DataFrame, suffix: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(asc("b"), asc("sub"))
    val cum = hist
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")))
      // cast-to-double explicitly: expr()'s bare `4.0` literal is
      // DecimalType in Spark (the mirror of the DuckDB decimal-literal
      // rule) and would type the whole column DECIMAL
      .withColumn("rep",
        expr("cast((4 + sub) * cast(pow(2, b) as long) as double) / cast(4 as double)"))
    cum.groupBy("lang").agg(
      max("n").as(s"n$suffix"),
      min(when(col("cum") * 100 >= lit(50) * col("n"), col("rep"))).as(s"q50$suffix"),
      min(when(col("cum") * 100 >= lit(90) * col("n"), col("rep"))).as(s"q90$suffix"),
      min(when(col("cum") * 100 >= lit(99) * col("n"), col("rep"))).as(s"q99$suffix"))
  }

  /** DuckDB mirror of the STREAMED quantile maintenance
    * ([[graft.streaming.StreamOps]]): because histogram merge is exact
    * by addition, streamed ≡ one single-pass sketch over the full
    * corpus — the oracle is just the direct tail, no merge-gate
    * columns. */
  def duckDdQuantileStream(table: String): String =
    s"""WITH lens AS (SELECT lang, source,
       |                CAST(len(${duckTokens("text")}) AS BIGINT) AS x
       |              FROM $table),
       |bk AS (SELECT lang, source, x,
       |              CAST(length(bin(x)) - 1 AS BIGINT) AS b,
       |              x * 4 // CAST(power(2, CAST(length(bin(x)) - 1 AS BIGINT)) AS BIGINT) - 4 AS sub
       |       FROM lens WHERE x >= 1),
       |dct AS (SELECT lang, b, sub, count(*)::BIGINT AS c FROM bk GROUP BY 1, 2, 3),
       |dcum AS (SELECT lang, b, sub, c,
       |         CAST(sum(c) OVER (PARTITION BY lang ORDER BY b, sub) AS BIGINT) AS cum,
       |         CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n,
       |         (4 + sub) * CAST(power(2, b) AS BIGINT) / 4.0 AS rep
       |       FROM dct)
       |SELECT lang, max(n) AS n_docs,
       |       min(CASE WHEN cum * 100 >= 50 * n THEN rep END) AS q50,
       |       min(CASE WHEN cum * 100 >= 90 * n THEN rep END) AS q90,
       |       min(CASE WHEN cum * 100 >= 99 * n THEN rep END) AS q99
       |FROM dcum GROUP BY lang ORDER BY lang""".stripMargin

  /** DuckDB mirror of [[ddQuantileLengths]] — same dyadic buckets,
    * integer crossing test, shard-partial merge gate. */
  def duckDdQuantileLengths(table: String): String = {
    def qCtes(src: String, p: String): String =
      s"""${p}cum AS (SELECT lang, b, sub, c,
         |         CAST(sum(c) OVER (PARTITION BY lang ORDER BY b, sub) AS BIGINT) AS cum,
         |         CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n,
         |         (4 + sub) * CAST(power(2, b) AS BIGINT) / 4.0 AS rep
         |       FROM $src),
         |${p}q AS (SELECT lang, max(n) AS n,
         |             min(CASE WHEN cum * 100 >= 50 * n THEN rep END) AS q50,
         |             min(CASE WHEN cum * 100 >= 90 * n THEN rep END) AS q90,
         |             min(CASE WHEN cum * 100 >= 99 * n THEN rep END) AS q99
         |      FROM ${p}cum GROUP BY lang)""".stripMargin
    s"""WITH lens AS (SELECT lang, source,
       |                CAST(len(${duckTokens("text")}) AS BIGINT) AS x
       |              FROM $table),
       |bk AS (SELECT lang, source, x,
       |              CAST(length(bin(x)) - 1 AS BIGINT) AS b,
       |              x * 4 // CAST(power(2, CAST(length(bin(x)) - 1 AS BIGINT)) AS BIGINT) - 4 AS sub
       |       FROM lens WHERE x >= 1),
       |part AS (SELECT lang, source, b, sub, count(*)::BIGINT AS c
       |         FROM bk GROUP BY 1, 2, 3, 4),
       |mrg AS (SELECT lang, b, sub, CAST(sum(c) AS BIGINT) AS c FROM part GROUP BY 1, 2, 3),
       |dct AS (SELECT lang, b, sub, count(*)::BIGINT AS c FROM bk GROUP BY 1, 2, 3),
       |${qCtes("mrg", "m")},
       |${qCtes("dct", "d")}
       |SELECT mq.lang, mq.n AS n_docs, mq.q50, mq.q90, mq.q99,
       |       (mq.q50 = dq.q50 AND mq.q90 = dq.q90 AND mq.q99 = dq.q99
       |        AND mq.n = dq.n) AS merged_eq_direct
       |FROM mq JOIN dq ON dq.lang = mq.lang ORDER BY mq.lang""".stripMargin
  }
}
