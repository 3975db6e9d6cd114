package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint. Emits ONE JSON line on stdout:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Measurement protocol (round 5): each query is timed over
  * SPARK_GRAFT_REPEAT passes (default 3) and the reported number is the
  * per-query MEDIAN. A single timed pass let one noisy scheduler interval
  * on the host rewrite the whole suite's headline (round 4: a plain
  * lineitem ROLLUP was billed 5.1 s that re-measured at 1.2 s); the median
  * of three is robust to a one-pass outlier and reports steady-state
  * execution, which is what a throughput comparison is about.
  *
  * Warmup: one untimed pass at sf0.001 (compiles every plan's whole-stage
  * codegen cheaply), then one untimed pass at the TARGET sf — AQE re-plans
  * with real statistics at the target scale, so target-sf codegen shapes
  * (skew-join splits, coalesced partitions) are compiled before timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated query filter for profiling single queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // noop sink: forces evaluation of EVERY output column — a count()
    // would let the optimizer prune pure projections to a row count.
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      try fn(spark, dir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e") }

    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1") {
      val warmDirs = Seq("/root/testdata/sf0.001", sfDir).distinct
        .filter(d => new java.io.File(d).isDirectory)
      warmDirs.foreach { d =>
        val t0 = System.nanoTime()
        queries.foreach { case (n, fn) => run(n, fn, d) }
        System.err.println(f"[bench] warmup pass ($d): ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val samples = scala.collection.mutable.Map.empty[String, Vector[Double]]
    // Load signature (round 13): the official and local benches disagreed
    // by ~1.4x two rounds running, and a single post-warmup sample billed
    // passage_spans_shared 26.9 s where a focused run reads 2.3 s. Record
    // host loadavg and cumulative JVM GC time around the run so a verdict
    // can separate code regressions from box noise without a re-run.
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime.max(0L)).sum
    }
    val loadBefore = loadAvg
    val gcBefore = gcMillis
    // Shared-build honesty (round 9, protocol fixed round 13): the warmup
    // passes populate the survivor family's shared caches, silently moving
    // the build cost out of the measured window — so each build is reset
    // and timed as its own labeled entry. Round 12 showed the remaining
    // hole: a SINGLE sample taken right after two full warmup passes (heap
    // and /tmp at their dirtiest) wrote passage_spans_shared at 6x its
    // steady-state cost. Now: GC before every build sample and take the
    // median of `repeat` reset+rebuild passes, the same protocol as every
    // other entry. The final pass leaves the cache populated, so dependent
    // queries below still report incremental cost and the suite total
    // carries the shared cost exactly once.
    def timeShared(name: String, reset: () => Unit, build: () => Unit): Unit = {
      val v = (1 to repeat).map { r =>
        reset(); System.gc()
        val t0 = System.nanoTime()
        build()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-24s $dt%8.2f s  (build pass $r)")
        dt
      }.toVector
      samples(name) = v
    }
    if (queries.contains("dedup_survivors") ||
        queries.contains("dedup_survivors_best"))
      timeShared("cc_shared_build",
        () => SparkEntry.resetSharedCc(), () => SparkEntry.buildSharedCc(spark, sfDir))
    // Same honesty for the passage family: the span table is computed
    // once and shared by dup_passages / dup_passage_clean.
    if (queries.contains("dup_passages") ||
        queries.contains("dup_passage_clean"))
      timeShared("passage_spans_shared",
        () => SparkEntry.resetSharedSpans(), () => SparkEntry.buildSharedSpans(spark, sfDir))
    // And for the fertility monitor's held-out train pass: the even-half
    // BPE merges are session-cached, so bill the one real train here and
    // let tokenizer_fertility report score-only cost.
    if (queries.contains("tokenizer_fertility"))
      timeShared("bpe_fertility_train",
        () => SparkEntry.resetSharedBpeEven(), () => SparkEntry.buildSharedBpeEven(spark, sfDir))
    // And the unigram twin: the even-half unigram vocab is session-cached
    // for unigram_fertility's score-only read.
    if (queries.contains("unigram_fertility"))
      timeShared("unigram_fertility_train",
        () => SparkEntry.resetSharedUnigramEven(),
        () => SparkEntry.buildSharedUnigramEven(spark, sfDir))
    // And for the graph-ANN family: ann_hnsw and hnsw_recall search the
    // identical session-cached layered graph.
    if (queries.contains("ann_hnsw") || queries.contains("hnsw_recall"))
      timeShared("hnsw_edges_shared",
        () => SparkEntry.resetSharedHnswEdges(),
        () => SparkEntry.buildSharedHnswEdges(spark, sfDir))
    // The AutoPlanes gate entry's edge graph (different plane count →
    // different graph than the fixed-shape build above).
    if (queries.contains("ann_hnsw_auto"))
      timeShared("hnsw_auto_edges_shared",
        () => SparkEntry.resetSharedHnswAutoEdges(),
        () => SparkEntry.buildSharedHnswAutoEdges(spark, sfDir))
    // A 200-query × 5-pass suite accumulates dead RDD blocks and shuffle
    // files faster than the ContextCleaner's weak-reference queue drains
    // them (the cleaner only fires when the JVM happens to GC), and the
    // accumulated heap + /tmp page-cache churn inflates the TAIL of the
    // suite — the round-12 full run read trustrank at 13.2 s where a
    // focused run reads 3.6 s. A periodic explicit GC between entries
    // (never inside a timed section) keeps each query's measurement
    // hermetic; the labeled shared builds stay cached because their
    // frames remain strongly referenced.
    var sinceGc = 0
    System.gc() // start the timed loop on a clean heap, not warmup debris
    for (r <- 1 to repeat) queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      run(name, fn, sfDir)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s  (pass $r)")
      samples(name) = samples.getOrElse(name, Vector.empty) :+ dt
      sinceGc += 1
      if (sinceGc >= 25) { sinceGc = 0; System.gc() }
    }
    // Plan fingerprints (VERDICT r13 #6): a stable 64-bit hash of each
    // query's physical plan, persisted next to the samples so the next
    // verdict can tell "the plan changed" from "the box was noisy" without
    // re-deriving either. The hash is taken over the CANONICALIZED plan
    // string with the remaining run-varying tokens normalized: attribute
    // ids (#123), AQE plan ids, and pinned-lineage RDD scan ids (the
    // hnsw/graph loops scan localCheckpoint RDDs whose numbers differ per
    // run). Same code + same data ⇒ same hash across JVMs; a join
    // strategy, exchange, or operator change ⇒ different hash. Computed
    // AFTER the timed loop (construction is untimed; shared caches are
    // warm, so construction-time pins are cheap).
    def planHash(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): String =
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.canonicalized.toString
        val norm = p
          .replaceAll("#\\d+", "#x")
          .replaceAll("plan_id=\\d+", "plan_id=x")
          .replaceAll("\\[id=#x\\]", "")
          .replaceAll("(?i)(existingrdd|logicalrdd|scan rdd)[^\\n]*", "$1")
        java.lang.Long.toHexString(graft.functions.PortableHash.mix64(
          org.apache.spark.unsafe.types.UTF8String.fromString(norm)))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] planHash failed: $e"); "err"
      }
    val planHashes = queries.toSeq.sortBy(_._1)
      .map { case (n, fn) => n -> planHash(fn) }

    def median(xs: Vector[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = samples.keys.map(n => n -> median(samples(n))).toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(full)
    // The driver captures only the TAIL of the output, so a long per-query
    // blob can be cut mid-stream (round 9's bench file lost its total that
    // way). Persist the full JSON to a file the driver can pick up, and
    // print a compact one-line summary AFTER the blob — whatever the
    // truncation window, the total survives. The file additionally carries
    // every raw per-pass sample plus the load signature, so a suspicious
    // median can be audited after the fact: a query whose samples read
    // [2.3, 26.9, 2.4] is box noise, [8.1, 8.3, 8.0] is a code regression.
    try {
      // Locale.ROOT: f-interpolation uses the JVM default locale, so a
      // comma-decimal locale would emit `1,234` and corrupt the JSON
      // (ADVICE r13).
      def num(d: Double, digits: Int): String =
        String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(d))
      val raw = samples.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":[" + v.map(d => num(d, 3)).mkString(",") + "]"
      }.mkString("{", ",", "}")
      val sig = s"""{"loadavg_before":${num(loadBefore, 2)},"loadavg_after":${num(loadAvg, 2)},""" +
        s""""jvm_gc_ms":${gcMillis - gcBefore},"repeat":$repeat}"""
      val plans = planHashes.map { case (k, h) => "\"" + k + "\":\"" + h + "\"" }
        .mkString("{", ",", "}")
      val rich = full.dropRight(1) +
        s""","samples":$raw,"load":$sig,"plans":$plans}"""
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, rich + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
    println(s"""{"metric":"total_compact","total_s":$total,"n":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
