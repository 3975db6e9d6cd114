package graft.operators

import graft.SparkSpecBase

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("connected components: chains, stars, and isolated pairs") {
    // components: {1,2,3,4} (chain), {10,11,12} (star on 10), {20,21}
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L),
      (21L, 20L)).toDF("a", "b")
    val cc = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("one job per propagation round — convergence rides the checkpoint") {
    val sc = spark.sparkContext
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE splits a query into per-stage jobs, which would make the count
    // nondeterministic; the job-shape property under test is AQE-independent.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("cc-jobcount", "cc job count probe")
    try {
      val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L)).toDF("a", "b")
      // maxDriverEdges = 0 forces the distributed loop — this test pins
      // the LOOP's job shape, which the driver path would short-circuit
      Graph.connectedComponents(edges, "a", "b", maxDriverEdges = 0L)
    } finally {
      sc.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    def jobCount = sc.statusTracker.getJobIdsForGroup("cc-jobcount").length
    var last = -1; var cur = jobCount
    while (cur != last) { Thread.sleep(200); last = cur; cur = jobCount }
    // 1 setup job + 2 per round (the label-broadcast exchange job and the
    // checkpoint job, whose Observation carries the changed-count) = 9.
    // The old separate join+count added its own scan + broadcast job per
    // round (>= 13 on this graph).
    assert(cur <= 9, s"expected <= 9 jobs (setup + 4 rounds x 2), got $cur")
  }

  test("loops run green under a RELIABLE checkpoint dir and match the local-pin results") {
    // VERDICT r13 #2: the loop tier's localCheckpoint default is not
    // fault-tolerant on a preemptible fleet. With spark.graft.checkpointDir
    // set, Ckpt.pin switches every round to reliable checkpoint() — same
    // results, and the rounds actually write to the configured dir.
    val edges = ((1L until 30L).map(i => (i, i + 1)) ++
      Seq((40L, 41L), (41L, 42L))).toDF("a", "b")
    def runAll(): Seq[Map[Long, Long]] = Seq(
      Graph.connectedComponents(edges, "a", "b", maxDriverEdges = 0L)
        .as[(Long, Long)].collect().toMap,
      Graph.connectedComponentsStar(edges, "a", "b")
        .as[(Long, Long)].collect().toMap,
      Graph.kCore(edges, "a", "b", k = 2)
        .as[(Long, Long)].collect().toMap,
      Graph.pageRank(edges, "a", "b", iterations = 4)
        .as[(Long, Long)].collect().toMap,
      Graph.labelPropagation(edges, "a", "b", rounds = 3)
        .as[(Long, Long)].collect().toMap,
      Graph.bfsLayers(edges, "a", "b", Seq(1L), maxHops = 4)
        .as[(Long, Long)].collect().toMap)
    val local = runAll()
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt")
    spark.conf.set(Ckpt.DirConf, dir.toString)
    try {
      val reliable = runAll()
      assert(reliable == local, "reliable-checkpoint loops diverged")
      // the rounds really went through checkpoint(): rdd files exist
      val written = java.nio.file.Files.walk(dir).count()
      assert(written > 1, s"checkpoint dir is empty: $dir")
    } finally {
      spark.conf.unset(Ckpt.DirConf)
    }
  }

  test("reliable-checkpoint storage is bounded: rotation keeps <= 2 live frames") {
    // A 30-node chain forces the star loop through >= 4 rounds, so >= 5
    // pins flow through the loop's rotator; without the round-(N-2)
    // delete, every round's rdd-* checkpoint dir would survive to the
    // end. The bound is the storage contract at 100 TB: an N-hour
    // iterative job holds TWO frames of checkpoint storage, not N rounds'
    // worth (VERDICT r14 #4).
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-rotate")
    spark.conf.set(Ckpt.DirConf, dir.toString)
    try {
      val out = Graph.connectedComponentsStar(chain, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(out.keySet == (1L to 30L).toSet && out.values.toSet == Set(1L))
      import scala.jdk.CollectionConverters._
      def rddDirs = java.nio.file.Files.walk(dir).iterator().asScala
        .count(p => p.getFileName.toString.startsWith("rdd-"))
      assert(rddDirs <= 2, s"rotation left $rddDirs checkpoint frames, expected <= 2")
      assert(rddDirs >= 1, "no reliable checkpoint was written at all")
    } finally spark.conf.unset(Ckpt.DirConf)
  }

  test("star loop resumes from committed round state after a mid-loop crash") {
    // Driver/JVM-kill recovery on top of the executor-loss contract: a
    // crash AFTER round 1's durable commit must resume at round 2 and
    // land on the identical fixpoint (tools/soak_resume.sh runs the same
    // scenario with a real Runtime.halt JVM kill).
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val clean = Graph.connectedComponentsStar(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-resume").toString
    val boom = intercept[RuntimeException] {
      Graph.connectedComponentsStar(chain, "a", "b", resumeDir = Some(dir),
        onRoundCommitted = i => if (i == 1) throw new RuntimeException("boom"))
    }
    assert(boom.getMessage == "boom")
    val rounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    val resumed = Graph.connectedComponentsStar(chain, "a", "b",
        resumeDir = Some(dir), onRoundCommitted = rounds += _)
      .as[(Long, Long)].collect().toMap
    assert(resumed == clean, "resumed run diverged from the clean fixpoint")
    assert(rounds.headOption.contains(2),
      s"expected resume at round 2 (crash committed round 1), got $rounds")
    // storage bound: committing round i drops round i-2
    val live = new java.io.File(dir).listFiles().map(_.getName)
      .count(_.startsWith("round-"))
    assert(live <= 2, s"round-state rotation left $live rounds on disk")
  }

  test("Ckpt.pin honors a conf change to a dir that is a substring of the active one") {
    // The old guard used String.contains: with the active checkpoint dir
    // under <base>/ckpt-old, a conf change to <base>/ckpt (a substring)
    // was silently ignored and frames kept landing in the wrong root
    // (ADVICE r14). The guard now compares the active dir's PARENT for
    // path equality with the configured root.
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt-sub")
    val oldDir = base.resolve("ckpt-old")
    val newDir = base.resolve("ckpt")
    try {
      spark.conf.set(Ckpt.DirConf, oldDir.toString)
      Ckpt.pin(Seq(1L).toDF("x")).collect()
      spark.conf.set(Ckpt.DirConf, newDir.toString)
      Ckpt.pin(Seq(2L).toDF("x")).collect()
      import scala.jdk.CollectionConverters._
      def rddDirsUnder(p: java.nio.file.Path) =
        if (!java.nio.file.Files.isDirectory(p)) 0
        else java.nio.file.Files.walk(p).iterator().asScala
          .count(q => q.getFileName.toString.startsWith("rdd-"))
      assert(rddDirsUnder(newDir) >= 1,
        s"pin ignored the conf change: nothing written under $newDir")
    } finally spark.conf.unset(Ckpt.DirConf)
  }

  test("string CC: driver and distributed paths agree on non-BMP ids (code-point order)") {
    // U+1F600 is the surrogate pair 0xD83D 0xDE00: Scala's default
    // Ordering[String] (UTF-16 code units) ranks it BELOW U+E000/U+FFFF,
    // while Spark's UTF8String binary order (= code points) ranks it
    // ABOVE. The component minimum is contested — both paths must agree
    // on the code-point minimum U+E000.
    val e000 = "\uE000"
    val ffff = "\uFFFF"
    val emoji = "\uD83D\uDE00" // U+1F600
    val edges = Seq((e000, emoji), (ffff, emoji)).toDF("a", "b")
    val driver = Graph.connectedComponents(edges, "a", "b")
      .as[(String, String)].collect().toMap
    val loop = Graph.connectedComponents(edges, "a", "b", maxDriverEdges = 0L)
      .as[(String, String)].collect().toMap
    assert(driver == loop, "driver union-find diverged from distributed loop")
    assert(driver.values.toSet == Set(e000),
      s"expected code-point minimum U+E000, got ${driver.values.toSet.map((s: String) => s.codePoints().toArray.toSeq)}")
  }

  test("large-star/small-star matches min-label on a long chain") {
    // a 30-node chain: diameter 29 — the shape that punishes min-label
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val star = Graph.connectedComponentsStar(chain, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(star.keySet == (1L to 30L).toSet)
    assert(star.values.toSet == Set(1L))
  }

  test("property: star and min-label variants agree on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
      .map(_.filter(e => e._1 != e._2)).suchThat(_.nonEmpty)
    val prop = Prop.forAll(edgeGen) { es =>
      val df = es.toDF("a", "b")
      // driver union-find path (default threshold), distributed loop
      // (threshold 0), and large-star/small-star must all agree
      val a = Graph.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      val loop = Graph.connectedComponents(df, "a", "b", maxDriverEdges = 0L)
        .as[(Long, Long)].collect().toMap
      val b = Graph.connectedComponentsStar(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      a == b && a == loop
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("dedupByPairs keeps exactly one representative per component") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val out = Graph.dedupByPairs(pairs, "a", "b")
      .as[(Long, Long, Boolean)].collect()
    assert(out.count(_._3) == 2) // one keeper per component
    assert(out.filter(_._3).map(_._1).toSet == Set(1L, 7L))
    // every row's representative is itself a kept row
    out.foreach { case (_, rep, _) =>
      assert(out.exists(r => r._1 == rep && r._3))
    }
  }

  test("dedupSurvivors: min id survives each planted cluster, rest intact") {
    // docs 1,2,3 near-identical (one cluster via transitivity), 4,5
    // identical (second cluster), 6 unique, 9 too short for any shingle
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s"),
      (2L, "alpha beta gamma delta epsilon eta", "s"),
      (3L, "alpha beta gamma delta theta eta", "s"),
      (4L, "one two three four five six seven", "s"),
      (5L, "one two three four five six seven", "s"),
      (6L, "completely different text lives here fine", "s"),
      (9L, "tiny", "s")).toDF("doc_id", "text", "source")
    val kept = Dedup.dedupSurvivors(df, "doc_id", "text", "source",
        n = 3, thresholdNum = 1, thresholdDen = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 6L, 9L))
  }

  test("dedupSurvivorsBest: highest quality survives, not min id") {
    // cluster {1,2,3}: doc 2 is the longest -> must survive over min-id 1;
    // cluster {4,5}: equal length -> tie falls back to min id 4
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s", 36L),
      (2L, "alpha beta gamma delta epsilon eta x", "s", 99L),
      (3L, "alpha beta gamma delta theta eta", "s", 32L),
      (4L, "one two three four five six seven", "s", 33L),
      (5L, "one two three four five six seven", "s", 33L),
      (6L, "completely different text lives here fine", "s", 41L))
      .toDF("doc_id", "text", "source", "n_chars")
    val kept = Dedup.dedupSurvivorsBest(df, "doc_id", "text", "source",
        qualityCol = "n_chars", n = 3, thresholdNum = 1, thresholdDen = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L))
  }

  test("dedupByPairsBest: representative is argmax quality within component") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val quality = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0), (10L, 1.0), (11L, 1.0))
      .toDF("id", "q")
    val out = Graph.dedupByPairsBest(pairs, "a", "b", quality, "id", "q")
      .select("id", "representative", "keep")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L))
    assert(out.filter(_._3).map(_._1) == Seq(2L, 10L))
  }

  test("string-keyed components: driver path equals the distributed loop") {
    // the streaming lineage fold keys on main_refco (strings); the
    // adaptive driver path must produce the loop's exact fixpoint
    // (lexicographic min labels)
    val edges = Seq(("kiwi", "apple"), ("apple", "mango"), ("pear", "plum"))
      .toDF("a", "b")
    val driver = Graph.connectedComponents(edges, "a", "b")
      .as[(String, String)].collect().toMap
    val loop = Graph.connectedComponents(edges, "a", "b", maxDriverEdges = 0)
      .as[(String, String)].collect().toMap
    assert(driver == loop, s"driver $driver != loop $loop")
    assert(driver == Map("kiwi" -> "apple", "apple" -> "apple",
      "mango" -> "apple", "pear" -> "pear", "plum" -> "pear"))
  }

  private def mapping(root: String): Map[Long, Long] =
    Graph.readComponents(spark, root)
      .as[(Long, Long)].collect().toMap

  test("updateComponents: batched folds equal one-shot CC; cross-batch merge relabels") {
    val root = java.nio.file.Files.createTempDirectory("graft-ccstore").toString + "/cc"
    // batch 1: component {5, 6}, singleton 9
    Graph.updateComponents(spark, root,
      Seq(5L, 6L, 9L).toDF("id"), "id",
      Seq((5L, 6L)).toDF("a", "b"), "a", "b")
    assert(mapping(root) == Map(5L -> 5L, 6L -> 5L, 9L -> 9L))
    // batch 2: new id 1 links to 6 — the {5,6} class must RELABEL to 1,
    // and old singleton 9 joins via a 9-2 pair
    Graph.updateComponents(spark, root,
      Seq(1L, 2L).toDF("id"), "id",
      Seq((1L, 6L), (9L, 2L)).toDF("a", "b"), "a", "b")
    val twoBatch = mapping(root)
    assert(twoBatch == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 2L -> 2L, 9L -> 2L))
    // equals a one-shot CC over the full edge stream + all ids
    val oneShotRoot = java.nio.file.Files.createTempDirectory("graft-ccone").toString + "/cc"
    Graph.updateComponents(spark, oneShotRoot,
      Seq(5L, 6L, 9L, 1L, 2L).toDF("id"), "id",
      Seq((5L, 6L), (1L, 6L), (9L, 2L)).toDF("a", "b"), "a", "b")
    assert(mapping(oneShotRoot) == twoBatch)
  }

  test("updateComponents: edge endpoints outside batchIds and the store get mapping rows") {
    // id 3 appears ONLY as an edge endpoint (in neither batchIds nor the
    // existing store) yet is its component's minimum: every member must
    // relabel to 3 AND 3 itself must own a mapping row — otherwise
    // surviving rows are labeled by an id with no row (the --components-
    // enabled-after-history case)
    val root = java.nio.file.Files.createTempDirectory("graft-ccep").toString + "/cc"
    Graph.updateComponents(spark, root, Seq(10L, 11L).toDF("id"), "id",
      Seq((10L, 11L)).toDF("a", "b"), "a", "b")
    Graph.updateComponents(spark, root, Seq(12L).toDF("id"), "id",
      Seq((3L, 10L), (12L, 99L)).toDF("a", "b"), "a", "b")
    assert(mapping(root) ==
      Map(3L -> 3L, 10L -> 3L, 11L -> 3L, 12L -> 12L, 99L -> 12L))
  }

  test("updateComponents: a replayed batch is a no-op (idempotent fold)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ccrep").toString + "/cc"
    val ids = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((2L, 3L)).toDF("a", "b")
    Graph.updateComponents(spark, root, ids, "id", edges, "a", "b")
    val first = mapping(root)
    Graph.updateComponents(spark, root, ids, "id", edges, "a", "b")
    assert(mapping(root) == first)
  }

  test("updateComponents: racing writers — the conflicting fold recomputes, no merge lost") {
    // writer B's commit lands between writer A's state read and manifest
    // create; A must re-fold against B's committed mapping (recompute-on-
    // retry), so both batches' merges survive
    val root = java.nio.file.Files.createTempDirectory("graft-ccrace").toString
    Graph.updateComponents(spark, root,
      Seq(1L, 2L, 3L, 4L).toDF("id"), "id",
      Seq((1L, 2L)).toDF("a", "b"), "a", "b")
    var fired = false
    Upsert.beforeManifestCreateHook = Some { (tp, _) =>
      if (!fired && tp == root) {
        fired = true
        Upsert.beforeManifestCreateHook = None
        Graph.updateComponents(spark, root,
          Seq(3L, 4L).toDF("id"), "id",
          Seq((3L, 4L)).toDF("a", "b"), "a", "b")
      }
    }
    // racer links {3,4}; this writer links {2,3} — final must chain all four
    try Graph.updateComponents(spark, root,
      Seq(2L, 3L).toDF("id"), "id",
      Seq((2L, 3L)).toDF("a", "b"), "a", "b")
    finally Upsert.beforeManifestCreateHook = None
    assert(fired, "race hook never fired")
    assert(mapping(root) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      s"a racer's merge was lost: ${mapping(root)}")
  }

  test("8 racing component folds: every writer's merges land") {
    // true thread-level concurrency through the optimistic commit loop:
    // 8 writers each fold one disjoint 3-chain; the final mapping must
    // contain every chain fully merged — any lost fold shows as a
    // missing id or an unmerged chain.
    val root = java.nio.file.Files.createTempDirectory("graft-cc-n8").toString + "/cc"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = 8
    val futs = (0 until writers).map { w =>
      Future {
        val ids = Seq(w * 10L, w * 10L + 1, w * 10L + 2)
        Graph.updateComponents(spark, root, ids.toDF("id"), "id",
          Seq((w * 10L, w * 10L + 1), (w * 10L + 1, w * 10L + 2)).toDF("a", "b"),
          "a", "b")
      }
    }
    futs.foreach(Await.result(_, 120.seconds))
    val m = mapping(root)
    (0 until writers).foreach { w =>
      Seq(0L, 1L, 2L).foreach { i =>
        assert(m.get(w * 10L + i).contains(w * 10L),
          s"writer $w's fold lost: $m")
      }
    }
    assert(m.size == writers * 3)
  }

  test("deleteFromComponents: erased label relabels to next min; replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft-ccdel").toString + "/cc"
    // components {1,2,3} labeled 1, {10,11} labeled 10, singleton 20
    Graph.updateComponents(spark, root,
      Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id"), "id",
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b"), "a", "b")
    // erase the LABEL of the first component and a non-label member of
    // the second — survivors must not keep pointing at the deleted id 1
    Graph.deleteFromComponents(spark, root, Seq(1L, 11L).toDF("id"))
    assert(mapping(root) == Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 20L -> 20L))
    // replayed key list: no-op
    Graph.deleteFromComponents(spark, root, Seq(1L, 11L).toDF("id"))
    assert(mapping(root) == Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 20L -> 20L))
    // erasing a whole component leaves the rest intact
    Graph.deleteFromComponents(spark, root, Seq(2L, 3L).toDF("id"))
    assert(mapping(root) == Map(10L -> 10L, 20L -> 20L))
  }

  test("deleteFromComponents on a missing store is a no-op, not a crash") {
    // an erasure job must not abort over a store this deployment never
    // created (same contract as the IVF / near-dup scrubbers)
    val ghost = java.nio.file.Files.createTempDirectory("graft-ccghost")
      .toString + "/never-created"
    Graph.deleteFromComponents(spark, ghost, Seq(1L).toDF("id"))
    assert(!new java.io.File(ghost).exists())
  }

  test("updateComponents composes with the persisted MinHash index: batches equal one-shot") {
    // the realistic incremental flow: index batch 1, pair batch 2 against
    // the accumulated index, fold both into the component store — final
    // mapping must equal CC over the one-shot all-pairs run
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val b1 = docs.where($"doc_id" % 2 === 0)
    val b2 = docs.where($"doc_id" % 2 === 1)
    val (s1, band1) = Dedup.minHashIndex(b1, "doc_id", "text", n = 3,
      numHashes = 64, bands = 16)
    val p1 = Dedup.minHashPairsAgainstIndex(s1, band1, s1, band1,
        numHashes = 64, threshold = 0.5)
      .where($"batch_id" < $"index_id")
    val root = java.nio.file.Files.createTempDirectory("graft-ccmh").toString + "/cc"
    Graph.updateComponents(spark, root, b1.select("doc_id"), "doc_id",
      p1, "batch_id", "index_id")
    val (s2, band2) = Dedup.minHashIndex(b2, "doc_id", "text", n = 3,
      numHashes = 64, bands = 16)
    val sAll = s1.unionByName(s2); val bandAll = band1.unionByName(band2)
    val p2 = Dedup.minHashPairsAgainstIndex(s2, band2, sAll, bandAll,
        numHashes = 64, threshold = 0.5)
      .where($"batch_id" =!= $"index_id")
    Graph.updateComponents(spark, root, b2.select("doc_id"), "doc_id",
      p2, "batch_id", "index_id")
    val pAll = Dedup.minHashPairsAgainstIndex(sAll, bandAll, sAll, bandAll,
        numHashes = 64, threshold = 0.5)
      .where($"batch_id" < $"index_id")
    val oneShot = Graph.connectedComponents(pAll, "batch_id", "index_id")
      .as[(Long, Long)].collect().toMap
    val incremental = mapping(root)
    // every paired id labels identically; unpaired ids are singletons
    oneShot.foreach { case (id, label) =>
      assert(incremental(id) == label, s"id $id: ${incremental(id)} != $label")
    }
    incremental.filterNot { case (id, _) => oneShot.contains(id) }
      .foreach { case (id, label) => assert(label == id, s"singleton $id -> $label") }
  }

  test("pageRank: hand-computed fixed-point iterations; truncation exact") {
    // 1→2, 2→1, 3→1; scale 1000, damping 850‰, base = 150
    // iter1: r1 = 150 + 850·2000 div 1000 = 1850; r2 = 1000; r3 = 150
    // iter2: r1 = 150 + 850·1150 div 1000 = 150 + 977 = 1127 (977.5 TRUNCATES)
    //        r2 = 150 + 850·1850 div 1000 = 150 + 1572 = 1722; r3 = 150
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r2 = Graph.pageRank(edges, "src", "dst", iterations = 2,
      scale = 1000L).as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 1127L, 2L -> 1722L, 3L -> 150L), r2.toString)
    // zero iterations: every node at scale
    val r0 = Graph.pageRank(edges, "src", "dst", iterations = 0,
      scale = 1000L).as[(Long, Long)].collect().toMap
    assert(r0 == Map(1L -> 1000L, 2L -> 1000L, 3L -> 1000L))
    // mass never exceeds the starting total (truncation + dangling only
    // LOSE mass); a sink-heavy graph still ranks the sink highest
    val star = (2L to 20L).map(i => (i, 1L)).toDF("src", "dst")
    val rs = Graph.pageRank(star, "src", "dst", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(rs.values.sum <= 20L * 1000000L)
    assert(rs(1L) == rs.values.max)
    // duplicate edge rows don't double-count (edge set, not multigraph)
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val rd = Graph.pageRank(dup, "src", "dst", iterations = 3,
      scale = 1000L).as[(Long, Long)].collect().toMap
    val rclean = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      "src", "dst", iterations = 3, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(rd == rclean)
  }

  test("trustRank: hand-computed seeded iterations; unreachable nodes stay 0") {
    // 1→2, 2→3, 4→2; seed {1}; scale 1000, damping 850‰, base = 150
    // init: r1=1000, others 0
    // iter1: r1 = 150 + 0 = 150; r2 = 0 + 850·(1000+0) div 1000 = 850;
    //        r3 = 0 (r2 was 0); r4 = 0 (never seeded, no in-edges)
    // iter2: r1 = 150; r2 = 850·150 div 1000 = 127; r3 = 850·850 div 1000 = 722
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.trustRank(edges, "src", "dst", seeds, "node",
      iterations = 2, scale = 1000L).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 150L, 2L -> 127L, 3L -> 722L, 4L -> 0L), r.toString)
    // component with no trust path: stays at exactly 0 forever
    val twoIslands = Seq((1L, 2L), (5L, 6L), (6L, 5L)).toDF("src", "dst")
    val ri = Graph.trustRank(twoIslands, "src", "dst", seeds, "node",
      iterations = 6, scale = 1000L).as[(Long, Long)].collect().toMap
    assert(ri(5L) == 0L && ri(6L) == 0L, ri.toString)
    // seeds not present in the graph are ignored (vertices come from edges)
    val rg = Graph.trustRank(twoIslands, "src", "dst",
      Seq(1L, 99L).toDF("node"), "node", iterations = 2, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    assert(!rg.contains(99L) && rg.keySet == Set(1L, 2L, 5L, 6L))
  }

  test("trustRank seeded with every vertex equals pageRank") {
    val rnd = new scala.util.Random(5)
    val edges = (1 to 60).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .toDF("src", "dst")
    val allNodes = edges.select(edges("src").as("node"))
      .union(edges.select(edges("dst").as("node"))).distinct()
    val tr = Graph.trustRank(edges, "src", "dst", allNodes, "node",
      iterations = 4).as[(Long, Long)].collect().toMap
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(tr == pr)
  }

  private def tri(edges: Seq[(Long, Long)]): Long =
    Graph.triangleCount(edges.toDF("a", "b"), "a", "b")
      .as[Long].collect().head

  test("triangleCount: hand cases — triangle, star, clique, duplicates, directions") {
    // one triangle + a dangling edge
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) == 1L)
    // a star has no triangles however big the hub
    assert(tri((1L to 50L).map(i => (0L, i))) == 0L)
    // K5 has C(5,3) = 10
    val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    assert(tri(k5) == 10L)
    // duplicate edges, reversed directions and self-loops don't inflate
    assert(tri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 3L), (1L, 2L))) == 1L)
  }

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8) =
    Graph.kCore(edges.toDF("a", "b"), "a", "b", k, rounds)
      .as[(Long, Long)].collect().toMap

  test("kCore: cascading peel — tail removal exposes the next weak node") {
    // triangle {1,2,3} + chain 3-4-5: round 1 peels 5 (deg 1), which
    // drops 4 to deg 1, peeled round 2; the 2-core is the triangle.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(g, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: the triangle itself dies (deg 2 < 3) — empty core.
    assert(core(g, k = 3).isEmpty)
  }

  test("kCore: K4 is a 3-core; K4 minus an edge collapses entirely at k=3") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(core(k4, k = 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // remove (3,4): two deg-2 nodes peel, leaving 1-2 at deg 1 → gone.
    assert(core(k4.filterNot(_ == (3L, 4L)), k = 3).isEmpty)
  }

  test("kCore: duplicates, reversed edges and self-loops don't inflate degrees") {
    val g = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L), (1L, 3L))
    assert(core(g, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: fixed-round semantics — an unconverged chain keeps its fringe") {
    // path of 30 nodes, k=2: each round peels exactly the two current
    // endpoints, so 8 rounds leave 30 − 16 = 14 nodes (endpoints at
    // deg 1 — not yet peeled, by the exactly-`rounds` contract); enough
    // rounds empty it.
    val path = (1L until 30L).map(i => (i, i + 1))
    val eight = core(path, k = 2, rounds = 8)
    assert(eight.size == 14 && eight.values.count(_ == 1L) == 2)
    assert(core(path, k = 2, rounds = 15).isEmpty)
  }

  test("clusteringCoefficient: bowtie hand case; deg<2 excluded; zero-tri nodes") {
    // bowtie {1,2,3} + {3,4,5} with a tail 5-6: node 3 sits in 2
    // triangles at deg 4 → 2000·2 div 12 = 333; pure wing nodes are
    // perfect (1000); node 5 (deg 3, 1 triangle) → 2000 div 6 = 333;
    // node 6 (deg 1) is excluded.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
      (5L, 6L))
    val out = Graph.clusteringCoefficient(g.toDF("a", "b"), "a", "b")
      .select("node", "deg", "n_tri", "coeff_permille")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 2L, 1L, 1000L), (2L, 2L, 1L, 1000L),
      (3L, 4L, 2L, 333L), (4L, 2L, 1L, 1000L),
      (5L, 3L, 1L, 333L)))
    // a pure path has deg-2 nodes with zero triangles → coefficient 0
    val path = Graph.clusteringCoefficient(
        Seq((1L, 2L), (2L, 3L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(path == Set((2L, 2L, 0L, 0L)))
  }

  test("kCore: convergence early-exit equals the full fixed-round run") {
    // converges in 2 rounds; 50 nominal rounds must early-exit to the same set
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(g, k = 2, rounds = 50) == core(g, k = 2, rounds = 8))
    // a graph that IS its own k-core converges in round 1
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(core(k4, k = 3, rounds = 50) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("labelPropagation: bridged cliques split into two communities") {
    // two triangles joined by one bridge 3–10: CC gives ONE component,
    // LPA separates the dense regions (hand-traced sync rounds with the
    // count-desc/label-asc tie-break)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (3L, 10L)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, "a", "b", rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("labelPropagation: fixed rounds pin the bipartite oscillation; junk edges drop") {
    // a 3-path oscillates under synchronous LPA — the fixed horizon
    // makes the output a deterministic function of (graph, rounds);
    // self-loops, duplicates and reversed edges must not change it
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
      .toDF("a", "b")
    val clean = Graph.labelPropagation(edges, "a", "b", rounds = 4)
      .as[(Long, Long)].collect().toMap
    val fromNoisy = Graph.labelPropagation(noisy, "a", "b", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(clean == Map(1L -> 1L, 2L -> 2L, 3L -> 1L)) // hand-traced r4
    assert(fromNoisy == clean)
  }

  test("bfsLayers: min hops from a seed set; horizon cut; absent seeds label 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 7L), (5L, 6L))
      .toDF("a", "b")
    def bfs(seeds: Seq[Long], h: Int): Map[Long, Long] =
      Graph.bfsLayers(edges, "a", "b", seeds, maxHops = h)
        .as[(Long, Long)].collect().toMap
    // single seed, horizon 2: node 4 is 3 hops out → absent
    assert(bfs(Seq(1L), 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // multi-seed: distances are the MIN over seeds (3 is 1 hop from 4)
    assert(bfs(Seq(1L, 4L), 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 7L -> 1L))
    // a seed not present in the graph still labels itself at hop 0
    assert(bfs(Seq(9L), 3) == Map(9L -> 0L))
    // disconnected component only reached from its own seed
    assert(bfs(Seq(5L), 1) == Map(5L -> 0L, 6L -> 1L))
  }

  test("triangleCount agrees with a naive count on a random graph with a hub") {
    val rnd = new scala.util.Random(19)
    val edges = ((1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)) ++
      (1 to 35).map(i => (0L, i.toLong))) // hub node 0
      .filter { case (a, b) => a != b }
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val naive = (for {
      (a, b) <- canon; c <- 0L to 40L
      if canon.contains((b, c)) && canon.contains((a, c)) && b < c
    } yield (a, b, c)).size
    assert(tri(edges) == naive.toLong, s"naive=$naive")
  }
}
