package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Byte-pair-encoding vocabulary learning (Sennrich et al. 2016) — the
  * tokenizer-training operator a training-data pipeline runs before the
  * token-counting / packing stages that already consume a learned
  * vocabulary ([[TextAnalysis]]'s BPE-ish token regex stands in for
  * exactly this artifact). The reference has no tokenizer training at all;
  * this is a scale-first formulation of the standard algorithm.
  *
  * Semantics (classic word-level BPE): corpus → (word, freq) once; each
  * word starts as its character sequence with `</w>` appended to the final
  * character (the end-of-word marker, so "low" and "lower" learn different
  * finals). Each round: count adjacent symbol pairs weighted by word
  * frequency (overlapping occurrences count, the standard convention),
  * take the single most frequent pair (tiebreak: lexicographic on both
  * symbols — a strict total order, so the learned vocabulary is
  * deterministic), and merge its occurrences LEFTMOST-GREEDY
  * non-overlapping within every word ("aaaa" + merge (a,a) → "aa","aa",
  * never three overlapping pairs).
  *
  * Leftmost-greedy without sequential scans: a match flag per position,
  * gaps-and-islands run grouping (`pos − row_number` over matched rows),
  * then keep matches at EVEN offset from their run start — overlapping
  * matches are only possible inside runs of a repeated symbol, where
  * even-parity selection IS the leftmost-greedy answer. Every step is a
  * word-partitioned window (a partition = one word's symbols, bounded by
  * word length) or an integer aggregation — engine-exact, no floats
  * anywhere.
  *
  * Scale shape: the corpus is read ONCE into the (word, freq) relation —
  * Heaps' law makes everything after vocabulary-cardinality, the same
  * state-minimization every production BPE trainer uses. Per round: one
  * lead-window pass for pair counts (partial-agged groupBy), a global
  * top-1 via orderBy+limit (TakeOrderedAndProject — never an unpartitioned
  * rank window), a 1-row broadcast of the chosen pair, and the
  * merge-rebuild windows. The symbol state is `localCheckpoint(eager)`ed
  * per round — it feeds both the round's pair count and the merge, and
  * unbounded lineage would re-evaluate the whole prefix per round (the
  * [[KMeans.train]] discipline; state is vocab·avg_word_len rows).
  */
object Bpe {

  private val Marker = "</w>"
  private val wWord = Window.partitionBy("word").orderBy("pos")

  /** Initial symbol state: (word, freq, pos, sym). */
  private[graft] def initialSyms(documents: DataFrame): DataFrame = {
    val charAt = col("word").substr(col("pos"), lit(1))
    documents
      .select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .withColumn("sym",
        when(col("pos") === length(col("word")), concat(charAt, lit(Marker)))
          .otherwise(charAt))
      .select("word", "freq", "pos", "sym")
  }

  /** One training pass: returns (final symbol state, per-round best pairs
    * (b1, b2, pair_count) in round order). Shared by [[learn]] and
    * [[vocabProfile]] so the learned vocabulary and its application can
    * never diverge. */
  private def trainState(documents: DataFrame, iters: Int): (DataFrame, Seq[DataFrame]) = {
    var syms = initialSyms(documents).localCheckpoint(true)
    val bests = (1 to iters).map { _ =>
      val paired = syms.withColumn("nxt", lead(col("sym"), 1).over(wWord))
      val best = paired.filter(col("nxt").isNotNull)
        .groupBy("sym", "nxt").agg(sum(col("freq")).as("pair_count"))
        .orderBy(desc("pair_count"), asc("sym"), asc("nxt"))
        .limit(1)
        .select(col("sym").as("b1"), col("nxt").as("b2"), col("pair_count"))
        // LAZY checkpoint (round-13): the 1-row best feeds the merge AND
        // the output, but eager cost one extra JOB per round — lazy, it
        // materializes inside the syms-checkpoint job below (the merge's
        // broadcast build reads it first) and the output union reads the
        // checkpointed row; its plan reads the PREVIOUS syms checkpoint,
        // so laziness cannot re-derive a stale state
        .localCheckpoint(false)
      syms = mergeOne(syms, best.select("b1", "b2")).localCheckpoint(true)
      best
    }
    (syms, bests)
  }

  /** Apply ONE merge (a 1-row (b1, b2) relation) to the symbol state —
    * the leftmost-greedy run-parity rebuild, shared by training and
    * [[applyMerges]] so learned and applied semantics cannot diverge.
    * `private[graft]` for the generative spec (BpeSpec compares full
    * symbol states against a sequential reference — the profile view
    * cannot distinguish greedy from non-greedy on symmetric runs). */
  private[graft] def mergeOne(syms: DataFrame, best: DataFrame): DataFrame = {
    val paired = syms.withColumn("nxt", lead(col("sym"), 1).over(wWord))
    // collapse `best` to EXACTLY one row (nulls when empty): the naive
    // crossJoin against a 0-row best silently annihilated the whole
    // symbol state (round-6 advice #1 — applyMerges called past the
    // learned list's rounds, or a degenerate corpus round with no
    // adjacent pairs). With the null row, `m` is false everywhere and
    // the round is a structural no-op — frozen-list replay degrades
    // safely. Contract unchanged otherwise: `best` carries ≤ 1 row.
    // min over ONE struct (not independent min(b1)/min(b2)): if the
    // ≤ 1-row contract were ever violated, the independent form could
    // fabricate a (b1, b2) pair that was never a merge — the struct min
    // still yields a REAL pair (round-7 ADVICE).
    val best1 = best.agg(min(struct(col("b1"), col("b2"))).as("b"))
      .select(col("b.b1").as("b1"), col("b.b2").as("b2"))
    val flagged = paired.crossJoin(broadcast(best1))
      .withColumn("m", coalesce(col("nxt").isNotNull &&
        col("sym") === col("b1") && col("nxt") === col("b2"), lit(false)))
    // leftmost-greedy: runs of consecutive matched positions, keep even
    // offsets from the run start
    val sel = flagged
      .withColumn("mrn",
        when(col("m"), row_number().over(
          Window.partitionBy("word", "m").orderBy("pos"))))
      .withColumn("grp", when(col("m"), col("pos") - col("mrn")))
      .withColumn("sel", col("m") &&
        (col("pos") - min(col("pos")).over(Window.partitionBy("word", "grp"))) % 2 === 0)
    sel
      .withColumn("prev_sel",
        coalesce(lag(col("sel"), 1).over(wWord), lit(false)))
      .filter(!col("prev_sel"))
      .withColumn("sym2", when(col("sel"), concat(col("sym"), col("nxt")))
        .otherwise(col("sym")))
      .select(col("word"), col("freq"),
        row_number().over(wWord).as("pos"), col("sym2").as("sym"))
  }

  /** Tokenize a NEW corpus under a FIXED learned merge list — the
    * production apply path (train on a snapshot, tokenize every later
    * batch with the frozen vocabulary). `merges` is [[learn]]'s output;
    * round t applies its `it = t` row (a merge pair absent from the new
    * corpus is a no-op round, as it should be). Output: the same
    * (sym, n_words, total_freq) profile as [[vocabProfile]], over the new
    * corpus. */
  def applyMerges(documents: DataFrame, merges: DataFrame, iters: Int,
                  topN: Int = 30): DataFrame =
    profileOf(applyState(documents, merges, iters), topN)

  /** The raw post-merge symbol state (word, freq, pos, sym) under a frozen
    * merge list — the per-batch seam [[graft.streaming.StreamOps]]'s
    * streaming tokenizer aggregates through its sink: merge application is
    * per-word, so a batch-split corpus merges identically and the profile
    * is recoverable from per-batch (sym, word, Σfreq) partials. */
  private[graft] def applyState(documents: DataFrame, merges: DataFrame,
                                iters: Int): DataFrame = {
    var syms = initialSyms(documents).localCheckpoint(true)
    (1 to iters).foreach { t =>
      val best = merges.filter(col("it") === t)
        .select(col("s1").as("b1"), col("s2").as("b2"))
      syms = mergeOne(syms, best).localCheckpoint(true)
    }
    syms
  }

  private def profileOf(syms: DataFrame, topN: Int): DataFrame =
    syms.groupBy("sym")
      .agg(countDistinct(col("word")).as("n_words"), sum(col("freq")).as("total_freq"))
      .orderBy(desc("total_freq"), asc("sym"))
      .limit(topN)

  /** Learn `iters` merges. Output: one row per round,
    * (it, s1, s2, merged, pair_count), ordered by it. */
  def learn(documents: DataFrame, iters: Int): DataFrame = {
    val (_, bests) = trainState(documents, iters)
    val rows = bests.zipWithIndex.map { case (best, i) =>
      best.select(lit(i + 1).as("it"), col("b1").as("s1"), col("b2").as("s2"),
        concat(col("b1"), col("b2")).as("merged"), col("pair_count"))
    }
    // iters = 0 (baseline-vocabulary probe through Graft.trainTokenizer):
    // an empty merge list, not empty.reduce (review finding)
    if (rows.isEmpty)
      documents.sparkSession.emptyDataFrame
        .select(lit(0).as("it"), lit("").as("s1"), lit("").as("s2"),
          lit("").as("merged"), lit(0L).as("pair_count"))
        .limit(0)
    else rows.reduce(_ unionByName _).orderBy("it")
  }

  /** Corpus token profile under the learned vocabulary — the artifact
    * check that the merges actually compress the corpus they were trained
    * on. Output: top `topN` symbols by corpus frequency,
    * (sym, n_words, total_freq). */
  def vocabProfile(documents: DataFrame, iters: Int, topN: Int = 30): DataFrame = {
    val (syms, _) = trainState(documents, iters)
    profileOf(syms, topN)
  }

  // ------------------------------------------------------------- oracle

  /** Lead-pair CTE: `$name` = `$from` plus the nxt column. */
  private def pairCte(name: String, from: String): String =
    s"""$name AS (SELECT word, freq, pos, sym,
       |              lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
       |       FROM $from)""".stripMargin

  /** The ONE merge-CTE generator (flag → run parity → rebuild) — shared by
    * the training and apply chains exactly as the Spark side shares
    * [[mergeOne]], so learned and applied oracle semantics cannot diverge
    * (review finding: the block used to exist twice, prefix-renamed). */
  private def mergeCtes(pairs: String, best: String,
                        fN: String, gN: String, selN: String, outN: String): String =
    s"""$fN AS (SELECT p.word, p.freq, p.pos, p.sym, p.nxt,
       |               (p.nxt IS NOT NULL AND p.sym = b.b1 AND p.nxt = b.b2) AS m
       |        FROM $pairs p CROSS JOIN $best b),
       |$gN AS (SELECT *, CASE WHEN m THEN pos - row_number()
       |                 OVER (PARTITION BY word, m ORDER BY pos) END AS grp
       |        FROM $fN),
       |$selN AS (SELECT *, m AND (pos - min(pos) OVER (PARTITION BY word, grp)) % 2 = 0 AS sel
       |          FROM $gN),
       |$outN AS (SELECT word, freq,
       |               row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
       |               CASE WHEN sel THEN sym || nxt ELSE sym END AS sym
       |        FROM (SELECT *, coalesce(lag(sel) OVER (PARTITION BY word ORDER BY pos), false) AS prev_sel
       |              FROM $selN) t
       |        WHERE NOT prev_sel)""".stripMargin

  /** Per-round CTE block against `$prev`: produces `best$t` and `s$t` —
    * the same pair-count / top-1 / run-parity merge as [[trainState]]. */
  private def roundCtes(t: Int, prev: String): String =
    s"""${pairCte(s"p$t", prev)},
       |best$t AS (SELECT sym AS b1, nxt AS b2, sum(freq)::BIGINT AS pair_count
       |           FROM p$t WHERE nxt IS NOT NULL
       |           GROUP BY sym, nxt
       |           ORDER BY pair_count DESC, b1, b2 LIMIT 1),
       |${mergeCtes(s"p$t", s"best$t", s"f$t", s"g$t", s"sel$t", s"s$t")}""".stripMargin

  private def baseCtes(table: String, iters: Int): String = {
    val tok = TextFns.duckTokens("text")
    val init =
      s"""w AS (SELECT t AS word, count(*)::BIGINT AS freq
         |      FROM (SELECT unnest($tok) AS t FROM $table) u
         |      GROUP BY t),
         |s0 AS (SELECT word, freq, i AS pos,
         |              CASE WHEN i = length(word)
         |                   THEN substr(word, i, 1) || '$Marker'
         |                   ELSE substr(word, i, 1) END AS sym
         |       FROM (SELECT word, freq, unnest(generate_series(1, length(word))) AS i
         |             FROM w) c)""".stripMargin
    (init +: (1 to iters).map(t => roundCtes(t, s"s${t - 1}"))).mkString(",\n")
  }

  /** DuckDB mirror of [[learn]]. */
  def duckLearnSql(table: String, iters: Int): String = {
    val union = (1 to iters).map(t =>
      s"SELECT $t::INTEGER AS it, b1 AS s1, b2 AS s2, b1 || b2 AS merged, pair_count FROM best$t")
      .mkString("\nUNION ALL\n")
    s"""WITH ${baseCtes(table, iters)}
       |$union
       |ORDER BY it""".stripMargin
  }

  /** DuckDB mirror of [[vocabProfile]]. */
  def duckVocabProfileSql(table: String, iters: Int, topN: Int = 30): String =
    s"""WITH ${baseCtes(table, iters)}
       |SELECT sym, count(DISTINCT word)::BIGINT AS n_words, sum(freq)::BIGINT AS total_freq
       |FROM s$iters
       |GROUP BY sym ORDER BY total_freq DESC, sym LIMIT $topN""".stripMargin

  /** Apply-round CTE block: `a_s$t` from `a_s${t-1}` merged against the
    * TRAIN chain's `best$t` — no pair counting, the frozen-vocabulary
    * replay through the SHARED [[mergeCtes]] generator. */
  private def applyRoundCtes(t: Int): String =
    s"""${pairCte(s"ap$t", s"a_s${t - 1}")},
       |${mergeCtes(s"ap$t", s"best$t", s"af$t", s"ag$t", s"asel$t", s"a_s$t")}""".stripMargin

  /** DuckDB mirror of [[applyMerges]]: train on `trainTable`, tokenize
    * `applyTable` under the learned merges. Both may be subquery
    * expressions, e.g. doc_id-parity halves of one table. */
  def duckApplySql(trainTable: String, applyTable: String, iters: Int,
                   topN: Int = 30): String = {
    val applyInit =
      s"""aw AS (SELECT t AS word, count(*)::BIGINT AS freq
         |       FROM (SELECT unnest(${TextFns.duckTokens("text")}) AS t FROM $applyTable) u
         |       GROUP BY t),
         |a_s0 AS (SELECT word, freq, i AS pos,
         |              CASE WHEN i = length(word)
         |                   THEN substr(word, i, 1) || '$Marker'
         |                   ELSE substr(word, i, 1) END AS sym
         |       FROM (SELECT word, freq, unnest(generate_series(1, length(word))) AS i
         |             FROM aw) c)""".stripMargin
    val applies = (1 to iters).map(applyRoundCtes).mkString(",\n")
    s"""WITH ${baseCtes(trainTable, iters)},
       |$applyInit,
       |$applies
       |SELECT sym, count(DISTINCT word)::BIGINT AS n_words, sum(freq)::BIGINT AS total_freq
       |FROM a_s$iters
       |GROUP BY sym ORDER BY total_freq DESC, sym LIMIT $topN""".stripMargin
  }
}
