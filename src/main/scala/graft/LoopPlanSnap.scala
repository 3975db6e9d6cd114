package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ckpt
import graft.operators.Ckpt.PinOps
import graft.operators.Graph

/** Round-19 evidence dumper for the ITERATIVE loops (VERDICT r18 #1):
  * the registered queries' `.explain` only shows the segment above the
  * final lineage pin, so the per-round join shape — the thing the
  * partitioning-preserving pin changes — never appears in a plain
  * query dump. This tool renders ONE loop round over the bench
  * pagerank graph with broadcasting DISABLED (the at-scale shape: the
  * |V|-sized per-round table does not broadcast at 100 TB, which is
  * exactly when `Graph.loopTableBroadcasts` flips the loops to
  * `Ckpt.pinByKey`) for both layouts of the loop-invariant edge set:
  *
  *   - `*_round_before.txt` — plain [[Ckpt.pin]] (the r18 layout):
  *     the round's join re-exchanges the pinned edge set.
  *   - `*_round_after.txt` — [[Ckpt.pinByKey]] (the r19 layout): the
  *     declared hash layout satisfies the join's distribution, NO
  *     Exchange on the edge side.
  *
  * The round frames come from the same `Graph.*Round` functions the
  * loops execute, so the dumped shape IS the executed one
  * (PinLayoutSpec asserts the exchange counts; this dump is the
  * reviewable rendering). Usage:
  * `runMain graft.LoopPlanSnap [outDir]` (default plans/r19), reading
  * `$SPARK_GRAFT_SF_DIR` / `$SPARK_GRAFT_CPUS` like the bench.
  */
object LoopPlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxMetadataStringLength", 100000)
      // the at-scale join shape: per-round |V|-tables do not broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(s"$name.txt"), txt)
      System.err.println(s"[loopsnap] wrote $name.txt (${txt.length} chars)")
    }

    // the bench pagerank/communities graph (TierGraph registration)
    val ev = Tables.events(spark, sfDir).select(col("user_id"),
      (get_json_object(col("props"), "$.k").cast("long") + lit(1000000L))
        .as("item"))
    val edges = ev.select(col("user_id").as("src"), col("item").as("dst"))
      .union(ev.select(col("item").as("src"), col("user_id").as("dst")))
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).where(
      col("src").isNotNull && col("dst").isNotNull).distinct().pin()
    val vertices = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().pin()

    // --- pageRank round: eDeg plain pin (before) vs pinByKey (after) ---
    val eDeg0 = e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
    val zeroIn = vertices.join(e.select(col("dst").as("node")).distinct(),
        Seq("node"), "left_anti")
      .select(col("node"), lit(150000L).as("rank")).pin()
    val ranks0 = vertices.withColumn("rank", lit(1000000L)).pin()
    write("pagerank_round_before",
      Graph.pageRankRound(eDeg0.pin(), zeroIn, ranks0, 150000L, 850L))
    write("pagerank_round_after",
      Graph.pageRankRound(Ckpt.pinByKey(eDeg0, "src"), zeroIn, ranks0,
        150000L, 850L))

    // --- LPA round: und plain pin (before) vs pinByKey (after) ---
    val e0 = edges.select(col("src").cast("long").as("u"),
        col("dst").cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
    val und0 = e0.union(e0.select(col("v").as("u"), col("u").as("v"))).distinct()
    val undPlain = und0.pin()
    val labels0 = undPlain.select(col("u").as("node")).distinct()
      .withColumn("label", col("node")).pin()
    write("communities_round_before", Graph.lpaRound(undPlain, labels0))
    write("communities_round_after",
      Graph.lpaRound(Ckpt.pinByKey(und0, "v"), labels0))

    // --- BFS hop: same edge-layout delta ---
    val dist0 = labels0.select(col("node"), lit(0L).as("hops")).pin()
    write("bfs_layers_round_before", Graph.bfsRound(undPlain, dist0))
    write("bfs_layers_round_after",
      Graph.bfsRound(Ckpt.pinByKey(und0, "v"), dist0))
    spark.stop()
  }
}
