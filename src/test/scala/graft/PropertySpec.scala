package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Chunkers, CodeElement, Knn}

/** ScalaCheck properties (SURVEY.md §5 strategy): invariants that must hold
  * for EVERY input, not just fixtures — chunk partition/coverage, hash
  * stability, upsert idempotence, top-k monotonicity. Run directly through
  * scalacheck's Test runner (no scalatestplus bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def checkProp(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val text: Gen[String] = Gen.choose(0, 60)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("text chunks partition the token stream: full coverage, no overlap, order kept") {
    import spark.implicits._
    checkProp(forAll(Gen.listOfN(4, text)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val chunks = Chunkers.textChunks(docs).collect()
      texts.zipWithIndex.forall { case (t, i) =>
        val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        val mine = chunks.filter(_.getAs[Long]("doc_id") == i.toLong)
          .sortBy(_.getAs[Long]("chunk_idx"))
        val rejoined = mine.flatMap(_.getAs[String]("content").split(" ").filter(_.nonEmpty)).toSeq
        // concatenating chunks in order reproduces the token stream exactly
        rejoined == toks &&
          // every chunk except possibly the last is exactly full-size
          mine.dropRight(1).forall(_.getAs[Long]("n_tokens") == Chunkers.ChunkTokens.toLong)
      }
    }, n = 10)
  }

  test("shingle rows match a scala reference model over random corpora") {
    import spark.implicits._
    checkProp(forAll(Gen.listOfN(6, Gen.oneOf(text, Gen.const(""), word))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      (2 to 3).forall { n =>
        val got = graft.functions.TextFns.shingleRowsOf(docs, n).collect()
          .groupBy(_.getAs[Long]("doc_id"))
          .map { case (d, rs) => d -> rs.map(_.getAs[String]("s")).sorted.toSeq }
        val want = texts.zipWithIndex.flatMap { case (t, i) =>
          val toks = t.toLowerCase.replaceAll("[^a-z0-9]+", " ").split(" ").filter(_.nonEmpty)
          val sh = toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
          if (sh.isEmpty) None else Some(i.toLong -> sh.sorted)
        }.toMap
        got == want
      }
    }, n = 10)
  }

  test("simhash chunk/shift bit extraction equals the nibble/mask reference model") {
    import spark.implicits._
    // Reference model: bit i of the 64-bit signature prefix is bit
    // 8 >> (i % 4) of hex nibble i/4 — the substring+IN formulation the
    // integer rewrite replaced. Any mismatch on any md5 means the rewrite
    // changed signatures silently.
    checkProp(forAll(word) { w =>
      val row = Seq(w).toDF("t")
        .withColumn("m", md5(col("t")))
        .select((col("m") +:
          (0 until 4).map(c => graft.functions.TextFns.md5Chunk16(col("m"), c).as(s"c$c"))): _*)
        .collect().head
      val hex = row.getString(0)
      (0 until 64).forall { i =>
        val nibble = Integer.parseInt(hex.charAt(i / 4).toString, 16)
        val refBit = if ((nibble & (8 >> (i % 4))) != 0) 1 else -1
        val chunk = row.getInt(1 + i / 16)
        val gotBit = (((chunk >> (15 - i % 16)) & 1) * 2) - 1
        refBit == gotBit
      }
    }, n = 30)
  }

  test("span coverage interval-union sum equals a brute-force position union") {
    import spark.implicits._
    val l = 3
    checkProp(forAll(Gen.listOfN(3, text)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.operators.Dedup.spanCoverage(docs, spanLen = l).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // brute force: materialize every doc's l-gram starts, mark those
      // whose gram appears in another doc, union covered positions
      val toks = texts.map(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
      val grams = toks.map(ts => ts.sliding(l).filter(_.size == l).map(_.mkString(" ")).zipWithIndex.toSeq)
      texts.indices.forall { i =>
        val others = grams.indices.filter(_ != i).flatMap(j => grams(j).map(_._1)).toSet
        val dupStarts = grams(i).filter { case (g, _) => others(g) }.map(_._2)
        val covered = dupStarts.flatMap(s => s until s + l).toSet.size
        got.get(i.toLong).forall { case (nSpans, cov) =>
          nSpans == dupStarts.size && cov == covered.toLong
        }
      }
    }, n = 20)
  }

  test("hash-uniform sampler draw is stable and within [0,1) for random ids") {
    import spark.implicits._
    checkProp(forAll(Gen.listOfN(20, Gen.choose(0L, Long.MaxValue / 2))) { ids =>
      val df = ids.distinct.map(i => (i, "en", "word soup text")).toDF("doc_id", "lang", "text")
      // the deterministic keep-decision must be identical across two plans
      val a = graft.operators.CorpusOps.stratifiedSample(df, 0.5).collect().map(_.toString).toSeq
      val b = graft.operators.CorpusOps.stratifiedSample(df, 0.5).collect().map(_.toString).toSeq
      a == b
    }, n = 5)
  }

  test("native top-k-per-key equals the window formulation on adversarial random data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // small value range forces heavy ties; ids are the unique tiebreak;
    // k sometimes exceeds group sizes; some keys absent from some partitions
    val rows = Gen.listOfN(120,
      for { key <- Gen.choose(0, 5); v <- Gen.choose(0, 3) } yield (key, v))
    checkProp(forAll(rows, Gen.choose(1, 8)) { (data, k) =>
      val df = data.zipWithIndex.map { case ((key, v), id) => (key, v, id.toLong) }
        .toDF("key", "v", "id")
      val viaWindow = df.withColumn("rn",
          row_number().over(Window.partitionBy("key").orderBy(desc("v"), asc("id"))))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      val viaNative = graft.plans.TopKPerKey.perKey(df,
          Seq("key"), Seq(("v", false), ("id", true)), k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      viaNative == viaWindow
    }, n = 8)
  }

  test("native top-k-per-key null ordering matches the window default") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1, Some(5), 1L), (1, None, 2L), (1, Some(7), 3L), (1, None, 4L),
      (2, None, 5L), (2, Some(1), 6L))
      .toDF("key", "v", "id")
    val viaWindow = df.withColumn("rn",
        row_number().over(Window.partitionBy("key").orderBy(desc("v"), asc("id"))))
      .filter(col("rn") <= 2).drop("rn")
      .collect().map(_.toString).toSet
    val viaNative = graft.plans.TopKPerKey.perKey(df,
        Seq("key"), Seq(("v", false), ("id", true)), 2)
      .collect().map(_.toString).toSet
    assert(viaNative == viaWindow)
  }

  test("content hash (C7) is deterministic and input-sensitive") {
    checkProp(forAll(word, word) { (a, b) =>
      def h(s: String) = CodeElement.make(s, "function", "f.py", 1, 2, s"body of $s").hash
      (h(a) == h(a)) && (a == b || h(a) != h(b))
    }, n = 100)
  }

  test("upsert merge is idempotent: applying the same batch twice equals once") {
    import spark.implicits._
    checkProp(forAll(Gen.listOfN(30, Gen.choose(0L, 9L))) { keys =>
      val batch = keys.zipWithIndex.map { case (k, i) => (k, s"v$i", i.toLong) }
        .toDF("id", "payload", "version")
      def lww(df: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(desc("version"), desc("payload"))
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      }
      val once = lww(batch).collect().map(_.toSeq).toSet
      val twice = lww(lww(batch).unionByName(batch)).collect().map(_.toSeq).toSet
      once == twice
    }, n = 10)
  }

  test("SparseToDense equals a scala reference densification for random sparse entries") {
    import spark.implicits._
    import graft.functions.VecExprs
    val dim = 32
    val entriesGen: Gen[List[(Int, Long)]] = for {
      n <- Gen.choose(0, dim)
      buckets <- Gen.pick(n, 0 until dim)
      counts <- Gen.listOfN(n, Gen.choose(1L, 99L))
    } yield buckets.toList.zip(counts)
    checkProp(forAll(entriesGen) { entries =>
      val df = Seq(Tuple1(entries)).toDF("bc")
      val got = df.select(VecExprs.sparseToDense(col("bc"), dim))
        .head().getSeq[Double](0).toList
      val want = (0 until dim).map(b =>
        entries.collectFirst { case (`b`, c) => c.toDouble }.getOrElse(0.0)).toList
      got == want
    }, n = 50)
  }

  test("BestCentroid equals a scala reference argmax for random vectors") {
    import spark.implicits._
    import graft.functions.VecExprs
    val vec: Gen[List[Double]] = Gen.listOfN(6, Gen.choose(0, 9).map(_.toDouble))
      .suchThat(v => v.exists(_ != 0.0))
    val centsGen: Gen[List[(Long, List[Double], Double)]] = Gen.choose(1, 5)
      .flatMap(n => Gen.listOfN(n, vec))
      .map(_.zipWithIndex.map { case (v, i) =>
        (i.toLong, v, math.sqrt(v.map(x => x * x).sum)) })
    checkProp(forAll(vec, centsGen) { (v, cents) =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val df = Seq((v, nrm, cents)).toDF("ed", "nrm", "cents")
      val got = df.select(VecExprs.bestCentroid(col("cents"), col("ed"), col("nrm")))
        .head().getLong(0)
      val want = cents.map { case (cid, ce, cn) =>
        val dot = v.zip(ce).map { case (a, b) => a * b }.sum
        (cid, dot / (nrm * cn))
      }.minBy { case (cid, sim) => (-sim, cid) }._1
      got == want
    }, n = 50)
  }

  test("top-k monotonicity holds for every k: top-k is a prefix of top-(k+1)") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val ranked = Knn.topK(emb, q, 50, excludeId = Some(0L))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    checkProp(forAll(Gen.choose(1, 49)) { k =>
      val topk = Knn.topK(emb, q, k, excludeId = Some(0L))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      ranked.take(k) == topk
    }, n = 8)
  }
}
