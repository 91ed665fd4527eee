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

  test("applying MORE rounds than the learned list holds is a no-op tail, not annihilation") {
    // round-6 advice #1: the crossJoin against an empty per-round best
    // used to delete the entire symbol state; now an absent merge row is
    // a structural no-op and frozen-list replay degrades safely
    val merges = Bpe.learn(docs, iters = 2)
    val exact = Bpe.applyMerges(docs, merges, iters = 2).collect().map(_.toString).toSeq
    val over = Bpe.applyMerges(docs, merges, iters = 5).collect().map(_.toString).toSeq
    assert(over.nonEmpty && over == exact,
      "rounds past the learned list must leave the symbol state unchanged")
  }

  test("run-parity merge equals the sequential leftmost-greedy reference on random words") {
    // the window formulation's whole claim is equivalence to the textbook
    // sequential scan — checked on FULL symbol states (profiles cannot
    // distinguish greedy [aa, a] from non-greedy [a, aa] on "aaa")
    def refMerge(syms: List[String], b1: String, b2: String): List[String] = syms match {
      case x :: y :: rest if x == b1 && y == b2 => (x + y) :: refMerge(rest, b1, b2)
      case x :: rest => x :: refMerge(rest, b1, b2)
      case Nil => Nil
    }
    val rnd = new scala.util.Random(42)
    // binary alphabet maximizes repeated-symbol runs — the adversarial case
    val words = (1 to 80).map(_ =>
      (1 to (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
      .distinct
    val corpus = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val initial = Bpe.initialSyms(corpus)
    for ((b1, b2) <- Seq(("a", "a"), ("b", "b"), ("a", "b"),
                         ("a", "a</w>"), ("b", "a</w>"))) {
      val best = Seq((b1, b2)).toDF("b1", "b2")
      val merged = Bpe.mergeOne(initial, best)
        .collect()
        .groupBy(_.getAs[String]("word"))
        .map { case (w, rows) =>
          w -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[String]("sym")).toList
        }
      words.foreach { w =>
        val chars = w.toList.map(_.toString)
        val init = chars.init :+ (chars.last + "</w>")
        assert(merged(w) == refMerge(init, b1, b2),
          s"word '$w' merge ($b1,$b2): got ${merged(w)}, want ${refMerge(init, b1, b2)}")
      }
    }
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
