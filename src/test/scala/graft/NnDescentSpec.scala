package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Knn, NnDescent}

/** NN-descent k-NN-graph invariants on sf0.001; exact values are gated by
  * the DuckDB oracle at sf0.01 (q_knn_graph). */
class NnDescentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = Tables.embeddings(spark, TestSpark.sf)

  private def recallOf(rounds: Int, k: Int): Double = {
    val g = NnDescent.knnGraph(emb, k = k, rounds = rounds)
      .select(col("vec_id").as("a"), col("nbr").as("b"))
    val exact = Knn.multiTopK(emb,
        emb.select(col("vec_id").as("qid"), col("embedding").as("qv")), k)
      .select(col("qid").as("a"), col("vec_id").as("b"))
    g.join(exact, Seq("a", "b")).count().toDouble / exact.count()
  }

  test("graph shape: <=k neighbors per node, sequential ranks, no self-loops, sims descend") {
    val rows = NnDescent.knnGraph(emb, k = 5, rounds = 1).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (id, g) =>
      val sorted = g.sortBy(_.getAs[Long]("rn"))
      assert(sorted.length <= 5)
      assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to sorted.length))
      assert(sorted.forall(_.getAs[Long]("nbr") != id))
      val sims = sorted.map(_.getAs[Double]("sim")).toSeq
      assert(sims == sims.sorted.reverse)
    }
  }

  test("graph search: sequential ranks, descending sims, finds most of the exact top-k") {
    val g = graft.sources.GraphLayout.ensure(spark, emb, TestSpark.sf, k = 8)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val got = NnDescent.graphSearch(emb, g, q, k = 10).collect()
    assert(got.map(_.getAs[Long]("rank")).toSeq == (1L to got.length))
    val sims = got.map(_.getAs[Double]("sim")).toSeq
    assert(sims == sims.sorted.reverse)
    assert(got.forall(_.getAs[Long]("vec_id") != 0L))
    val exact = Knn.topK(emb, q, 10, excludeId = Some(0L))
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val hit = got.map(_.getAs[Long]("vec_id")).count(exact.contains)
    assert(hit >= 5, s"graph search found only $hit/10 of the exact top-10")
  }

  test("graph upsert: covers all nodes; old-node lists are rank-monotone under insertion") {
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val before = NnDescent.knnGraph(old, k = 8)
      .select(col("vec_id"), col("rn"), col("sim")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rn")) -> r.getAs[Double]("sim"))
      .toMap
    val after = NnDescent.graphUpsert(old, batch, k = 8).collect()
    val ids = after.map(_.getAs[Long]("vec_id")).toSet
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(batchIds.subsetOf(ids), "every inserted node has a neighbor list")
    // rank-r similarity never decreases for old nodes (candidate superset)
    after.filter(r => !batchIds.contains(r.getAs[Long]("vec_id"))).foreach { r =>
      val key = (r.getAs[Long]("vec_id"), r.getAs[Long]("rn"))
      before.get(key).foreach { prev =>
        assert(r.getAs[Double]("sim") >= prev - 1e-9,
          s"old node $key regressed: ${r.getAs[Double]("sim")} < $prev")
      }
    }
  }

  test("filtered graph search: every hit satisfies the predicate and appears in the exact filtered ranking's label set") {
    val g = graft.sources.GraphLayout.ensure(spark, emb, TestSpark.sf, k = 8)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val got = NnDescent.graphSearch(emb, g, q, k = 5, beam = 16,
      pred = Some(col("label") === 3)).collect()
    assert(got.nonEmpty)
    val lab3 = emb.filter(col("label") === 3).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.forall(r => lab3.contains(r.getAs[Long]("vec_id"))))
    assert(got.map(_.getAs[Long]("rank")).toSeq == (1L to got.length))
  }

  test("batched walk is the single walk: multiGraphSearch({0}) equals graphSearch(excludeId=0)") {
    val g = graft.sources.GraphLayout.ensure(spark, emb, TestSpark.sf, k = 8)
    val q1 = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val single = NnDescent.graphSearch(emb, g, q1, k = 10)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    val qm = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val multi = NnDescent.multiGraphSearch(emb, g, qm, k = 10)
      .collect().map(r => (r.getAs[Long]("rn"), r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSeq
    assert(single == multi)
  }

  test("streamed graph maintenance across forced micro-batches equals sequential stored-graph upserts") {
    import graft.streaming.StreamOps
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_graph_src").toFile
    val artDir = java.nio.file.Files.createTempDirectory("graft_stream_graph_art").toString
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    try {
      val b1 = emb.filter(col("vec_id") % 10 === 7)
      val b2 = emb.filter(col("vec_id") % 10 === 3)
      b1.coalesce(1).write.parquet(s"${srcDir.getAbsolutePath}/b1.parquet")
      b2.coalesce(1).write.parquet(s"${srcDir.getAbsolutePath}/b2.parquet")
      val base = emb.filter(col("vec_id") % 10 =!= 7 && col("vec_id") % 10 =!= 3)
      val stream = spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(srcDir.getAbsolutePath)
      val got = StreamOps.streamedGraphMaintenanceOf(spark, base, stream, artDir, k = 8)
        .collect().map(_.toString).toSeq
      // sequential expectation: upsert b1 against the base graph, then b2
      // against the once-updated graph + accumulated vectors — band width
      // FROZEN at the base snapshot for every batch (round-13: the stored
      // artifact records bits in its sidecar at writeBase time), which
      // also pins that the stored-band PRUNED probe is IO-only (the
      // expectation re-keys full signs at the same frozen width)
      val bits = NnDescent.bitsFor(base.count(), 16)
      val g0 = NnDescent.knnGraph(base, k = 8)
        .select(col("vec_id").as("a"), col("nbr").as("b"))
      val g1 = NnDescent.graphUpsertWith(base, g0, b1, k = 8,
        frozenBits = Some(bits))
      val g2 = NnDescent.graphUpsertWith(
        base.unionByName(b1),
        g1.select(col("vec_id").as("a"), col("nbr").as("b")),
        b2, k = 8, frozenBits = Some(bits))
      val want = g2.collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      assert(got == want,
        "micro-batch maintenance must equal sequential stored-graph upserts")
    } finally { rm(srcDir); rm(new java.io.File(artDir)) }
  }

  test("graph artifact self-heals a swap crashed between its two renames") {
    import java.nio.file.{Files, Paths}
    val base = emb.filter(col("vec_id") % 10 =!= 7)
    val dir = Files.createTempDirectory("graft_graph_crash").toString
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    try {
      graft.sources.GraphLayout.writeBase(spark, base, dir, k = 5)
      val before = graft.sources.GraphLayout.readGraph(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      // simulate the unsafe window: live renamed aside, stage lost
      Files.move(Paths.get(s"$dir/graph"), Paths.get(s"$dir/graph_old"))
      val after = graft.sources.GraphLayout.readGraph(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(after == before, "recovery must restore the set-aside graph")
      // and the next upsert runs against the recovered artifact
      Files.move(Paths.get(s"$dir/graph"), Paths.get(s"$dir/graph_old"))
      graft.sources.GraphLayout.upsertStored(spark, dir,
        emb.filter(col("vec_id") % 10 === 7).select("vec_id", "embedding"), "mb-x", k = 5)
      val ids = graft.sources.GraphLayout.readGraph(spark, dir)
        .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
      assert(emb.filter(col("vec_id") % 10 === 7).select("vec_id")
        .collect().map(_.getLong(0)).toSet.subsetOf(ids))
    } finally rm(new java.io.File(dir))
  }

  test("delta upsert ∪ untouched stored lists equals the full upsert") {
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val g0full = NnDescent.knnGraph(old, k = 8)
    val g0 = g0full.select(col("vec_id").as("a"), col("nbr").as("b"))
    val full = NnDescent.graphUpsertWith(old, g0, batch, k = 8)
      .orderBy(col("vec_id"), col("rn"))
      .collect().map(_.toString).toSeq
    val delta = NnDescent.graphUpsertDeltaWith(old, g0, batch, k = 8)
    // the bucket-confined commit's composition: stored lists for untouched
    // ids carried verbatim, delta lists swapped in
    val composed = g0full
      .join(delta.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
      .unionByName(delta)
      .orderBy(col("vec_id"), col("rn"))
      .collect().map(_.toString).toSeq
    assert(composed == full,
      "untouched stored rows + delta must reproduce the full upsert bit-for-bit")
    // and the delta really is confined: strictly fewer lists than the corpus
    val nDelta = delta.select("vec_id").distinct().count()
    assert(nDelta < old.count() + batch.count(),
      s"delta covers $nDelta lists — not confined")
  }

  test("bucket-confined commit self-heals a crash mid-rename (marker + stage present)") {
    import java.nio.file.{Files, Paths}
    val base = emb.filter(col("vec_id") % 10 =!= 7)
    val dir = Files.createTempDirectory("graft_graph_bkcrash").toString
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    try {
      graft.sources.GraphLayout.writeBase(spark, base, dir, k = 5)
      graft.sources.GraphLayout.upsertStored(spark, dir,
        emb.filter(col("vec_id") % 10 === 7).select("vec_id", "embedding"),
        "mb-0", k = 5)
      val want = graft.sources.GraphLayout.readGraph(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      // simulate a crash mid-commit: one committed bucket file moved back
      // into the stage under its original name, marker restored
      val committed = new java.io.File(s"$dir/graph").listFiles()
        .filter(_.getName.startsWith("mb-0g.")).minBy(_.getName)
      val tag = committed.getName.substring(0, committed.getName.indexOf("-part-"))
      val orig = committed.getName.drop(tag.length + 1)
      Files.createDirectories(Paths.get(s"$dir/graph_stage"))
      Files.move(committed.toPath, Paths.get(s"$dir/graph_stage/$orig"))
      Files.write(Paths.get(s"$dir/graph/_graft_replace"),
        tag.getBytes("UTF-8"))
      val got = graft.sources.GraphLayout.readGraph(spark, dir)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, "recovery must finish the interrupted bucket commit")
      assert(!Files.exists(Paths.get(s"$dir/graph/_graft_replace")),
        "marker must be consumed")
      assert(!Files.exists(Paths.get(s"$dir/graph_stage")),
        "stage must be consumed")
    } finally rm(new java.io.File(dir))
  }

  test("frozen-bits upsert equals the in-plan form at snapshot time") {
    val old = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7)
    val bitsBase = NnDescent.bitsFor(old.count(), 16)
    // precondition of the equivalence: the batch doesn't cross a width
    // boundary at this scale (if it ever does, the gate — which pins the
    // frozen form — is the authority, and this spec should shrink `batch`)
    assert(bitsBase == NnDescent.bitsFor(emb.count(), 16),
      "test slices must agree on band width for this equivalence")
    val g0 = NnDescent.knnGraph(old, k = 8)
      .select(col("vec_id").as("a"), col("nbr").as("b"))
    val inPlan = NnDescent.graphUpsertWith(old, g0, batch, k = 8)
      .collect().map(_.toString).toSeq
    val frozen = NnDescent.graphUpsertWith(old, g0, batch, k = 8,
      frozenBits = Some(bitsBase))
      .collect().map(_.toString).toSeq
    assert(frozen == inPlan)
  }

  test("reband rewrites the stored band relation when the corpus crosses a width boundary") {
    import java.nio.file.Files
    // base 64 vectors: bits = clamp(2,16,floor(log2(64/16))) = 2; the full
    // corpus (~hundreds at sf0.001) crosses at least one boundary
    val base = emb.filter(col("vec_id") < 64)
    val rest = emb.filter(col("vec_id") >= 64).select("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_graph_reband").toString
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    try {
      graft.sources.GraphLayout.writeBase(spark, base, dir, k = 5)
      graft.sources.GraphLayout.upsertStored(spark, dir, rest, "mb-0", k = 5)
      val n = emb.count()
      val (before, after) = graft.sources.GraphLayout.rebandStored(spark, dir)
      assert(before == NnDescent.bitsFor(64, 16))
      assert(after == NnDescent.bitsFor(n, 16))
      assert(after > before, s"corpus grew $n/64× but width stayed $before")
      // idempotent once current
      assert(graft.sources.GraphLayout.rebandStored(spark, dir) == (after, after))
      // and the re-banded artifact still maintains: another upsert works
      // against the new width (replay of mb-0 — content unchanged)
      graft.sources.GraphLayout.upsertStored(spark, dir, rest, "mb-1", k = 5)
      val ids = graft.sources.GraphLayout.readGraph(spark, dir)
        .select("vec_id").distinct().count()
      assert(ids == n, "every vector keeps an adjacency list through reband")
    } finally rm(new java.io.File(dir))
  }

  test("batch replay loses no adjacency lists even when its touched-bucket set diverges") {
    import java.nio.file.Files
    val base = emb.filter(col("vec_id") % 10 =!= 7)
    val batch = emb.filter(col("vec_id") % 10 === 7).select("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_graph_replay").toString
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(); ()
    }
    try {
      graft.sources.GraphLayout.writeBase(spark, base, dir, k = 5)
      graft.sources.GraphLayout.upsertStored(spark, dir, batch, "mb-0", k = 5)
      // crash-replay shape: the same batchId re-applied against state that
      // already absorbed it — the recomputed delta (and hence the touched
      // bucket set) can DIVERGE from the first commit's, so buckets touched
      // only by the first commit must keep their content (the r12 ADVICE
      // high: a prefix-wide pre-delete silently dropped them)
      graft.sources.GraphLayout.upsertStored(spark, dir, batch, "mb-0", k = 5)
      val rows = graft.sources.GraphLayout.readGraph(spark, dir).collect()
      val allIds = emb.select("vec_id").collect().map(_.getLong(0)).toSet
      val gotIds = rows.map(_.getAs[Long]("vec_id")).toSet
      assert(gotIds == allIds,
        s"replay lost ${(allIds -- gotIds).size} adjacency lists")
      // and no id carries duplicate lists: ranks are 1..len exactly once
      rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (id, g) =>
        val rns = g.map(_.getAs[Long]("rn")).sorted.toSeq
        assert(rns == (1L to rns.length), s"node $id has duplicate/gapped ranks: $rns")
      }
    } finally rm(new java.io.File(dir))
  }

  test("refinement is monotone: recall never regresses with more rounds") {
    val r0 = recallOf(0, 6)
    val r2 = recallOf(2, 6)
    assert(r2 >= r0)
    assert(r2 > 0.5, s"2-round recall $r2 suspiciously low on a ${emb.count()}-vector corpus")
  }
}
