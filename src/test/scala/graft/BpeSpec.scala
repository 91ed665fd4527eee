package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE trainer semantics on adversarial synthetic corpora (repeated-symbol
  * runs are where overlap handling and tiebreaks either hold or silently
  * corrupt the vocabulary) plus corpus-level invariants on sf0.001. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private def docs = Tables.documents(spark, TestSpark.sf)

  test("leftmost-greedy merge on a repeated-symbol run: aaaa -> aa,aa never overlaps") {
    val corpus = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = Bpe.learn(corpus, iters = 1).collect()
    // word 'aaaa' = a,a,a,a</w>: pair (a,a) occurs at pos 1-2 and 2-3
    // (overlapping occurrences both count: 2 per word, freq 2 -> 4)
    assert(m.length == 1)
    assert(m(0).getAs[String]("merged") == "aa" && m(0).getAs[Long]("pair_count") == 4L)
  }

  test("tie between candidate pairs resolves lexicographically (deterministic vocabulary)") {
    val corpus = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = Bpe.learn(corpus, iters = 2).collect().sortBy(_.getAs[Int]("it"))
    // after merging (a,a): word = aa, a, a</w>; pairs (aa,a) and (a,a</w>)
    // both have weight 2 -> the s1-then-s2 tiebreak must pick (a, a</w>)
    assert(m(1).getAs[String]("s1") == "a" && m(1).getAs[String]("s2") == s"a</w>")
  }

  test("each merge round strictly shrinks the corpus symbol count (compression invariant)") {
    def totalSyms(iters: Int): Long =
      Bpe.vocabProfile(docs, iters, topN = 1000000)
        .agg(sum(col("total_freq"))).collect()(0).getLong(0)
    val t0 = totalSyms(0)
    val t2 = totalSyms(2)
    val t4 = totalSyms(4)
    assert(t2 < t0, s"2 merge rounds did not compress: $t0 -> $t2")
    assert(t4 < t2, s"rounds 3-4 did not compress: $t2 -> $t4")
  }

  test("applying the learned list back to the training corpus reproduces the training profile") {
    val merges = Bpe.learn(docs, iters = 3)
    val applied = Bpe.applyMerges(docs, merges, iters = 3).collect().map(_.toString).toSeq
    val trained = Bpe.vocabProfile(docs, iters = 3).collect().map(_.toString).toSeq
    assert(applied == trained,
      "frozen-list application must replay training's merge semantics exactly")
  }

  test("zero merge rounds yields an empty merge list with the full schema (facade probe path)") {
    val m = Bpe.learn(docs, iters = 0)
    assert(m.columns.toSeq == Seq("it", "s1", "s2", "merged", "pair_count"))
    assert(m.count() == 0)
  }

  test("learned merge list is deterministic across runs") {
    val a = Bpe.learn(docs, iters = 3).collect().map(_.toString).toSeq
    val b = Bpe.learn(docs, iters = 3).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
