package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-19 gate for the partitioning-preserving pin (VERDICT r18 #1):
  * `Ckpt.pinByKey` must (a) declare the enforced hash layout so an
  * equi-join on the key adds NO shuffle on the pinned side, and (b) the
  * iterative loops that switch layouts on `Graph.loopTableBroadcasts`
  * must produce bit-identical output in both modes (the broadcast-mode
  * bench shape and the declared-layout at-scale shape are the SAME
  * algorithm, different physical layout). */
class PinLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  /** Shuffle exchanges in the (initial, pre-AQE-execution) plan. */
  private def shuffles(df: DataFrame): Int = {
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case a: AdaptiveSparkPlanExec => return count(a.executedPlan)
        case _ => 0
      }
      self + p.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private def withThreshold[T](v: String)(body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, prev)
  }

  test("pinByKey declares the enforced layout: join on the key shuffles only the other side") {
    withThreshold("-1") {
      val e = (1 to 5000).map(i => (i % 97L, i.toLong)).toDF("k", "x")
      val other = (0 to 96).map(i => (i.toLong, i * 2L)).toDF("k", "y")
      val plain = Ckpt.pin(e)
      val byKey = Ckpt.pinByKey(e, "k")
      // plain pin loses the layout under AQE: BOTH sides re-exchange
      assert(shuffles(plain.join(other, Seq("k"))) == 2)
      // declared layout: only the non-pinned side moves
      assert(shuffles(byKey.join(other, Seq("k"))) == 1)
      // and a groupBy on the key is exchange-free
      assert(shuffles(byKey.groupBy("k").agg(sum("x"))) == 0)
      // results identical either way
      val a = plain.join(other, Seq("k")).agg(sum($"x" * $"y")).head.getLong(0)
      val b = byKey.join(other, Seq("k")).agg(sum($"x" * $"y")).head.getLong(0)
      assert(a == b)
    }
  }

  test("loops: declared-layout (at-scale) mode equals broadcast-mode output bit for bit") {
    // a graph with hubs, chains and an isolated pair; plus nodes that
    // only ever appear as a destination (zeroIn coverage in pageRank)
    val edges = (
      (1L to 40L).map(i => (i, i % 7 + 100L)) ++      // fan-in hubs
      (1L until 30L).map(i => (i, i + 1)) ++          // chain
      Seq((200L, 201L), (60L, 61L), (61L, 62L))       // tails
    ).toDF("a", "b")
    val seeds = Seq(1L, 3L, 200L).toDF("s")
    def runAll(): Seq[Map[Long, Long]] = Seq(
      Graph.pageRank(edges, "a", "b", iterations = 4)
        .as[(Long, Long)].collect().toMap,
      Graph.trustRank(edges, "a", "b", seeds, "s", iterations = 4)
        .as[(Long, Long)].collect().toMap,
      Graph.labelPropagation(edges, "a", "b", rounds = 3)
        .as[(Long, Long)].collect().toMap,
      Graph.bfsLayers(edges, "a", "b", Seq(1L, 200L), maxHops = 4)
        .as[(Long, Long)].collect().toMap)
    val broadcastMode = runAll() // default threshold: tables broadcast
    val declaredMode = withThreshold("-1")(runAll()) // at-scale layout
    assert(declaredMode == broadcastMode)
    // and the declared layout survives the RELIABLE checkpoint path too
    // (pinByKey's rewrap sits on whatever pin the fault contract picked)
    val dir = java.nio.file.Files.createTempDirectory("graft-pinlayout-ckpt")
    spark.conf.set(Ckpt.DirConf, dir.toString)
    try assert(withThreshold("-1")(runAll()) == broadcastMode)
    finally spark.conf.unset(Ckpt.DirConf)
  }
}
