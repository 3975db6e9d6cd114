package graft.operators

import graft.SparkSpecBase

class CooccurSpec extends SparkSpecBase {
  import spark.implicits._

  test("itemCooccurrence: hand-computed co-counts and overlap coefficient") {
    val ev = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L), (3L, 9L), (3L, 9L)) // duplicate interaction dedups
      .toDF("u", "item")
    val out = Cooccur.itemCooccurrence(ev, "u", "item",
        maxItemsPerUser = 100, minCo = 2L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // co >= 2: (1,2) via u1+u2, (2,3) via u1+u3; degrees 1:2, 2:3, 3:2
    assert(out == Map(
      (1L, 2L) -> ((2L, 1000L)), // 2*1000 div min(2,3)
      (2L, 3L) -> ((2L, 1000L))), out.toString)
  }

  test("itemCooccurrence: the degree cap bounds a hot user's pair fan-out") {
    val hot = (1L to 100L).map(i => (7L, i)).toDF("u", "item")
    val pairs = Cooccur.itemCooccurrence(hot, "u", "item",
      maxItemsPerUser = 10, minCo = 1L)
    assert(pairs.count() == 45L) // C(10,2), not C(100,2) = 4950
    // and the cap is deterministic: same input -> same sampled items
    val again = Cooccur.itemCooccurrence(hot, "u", "item", 10, 1L)
      .select("item_a", "item_b").as[(Long, Long)].collect().toSet
    assert(again == pairs.select("item_a", "item_b")
      .as[(Long, Long)].collect().toSet)
  }

  test("itemCooccurrence: null users/items dropped; uncapped degrees feed the score") {
    val ev = Seq((Some(1L), Some(1L)), (Some(1L), None), (None, Some(2L)),
      (Some(2L), Some(1L)), (Some(2L), Some(3L)), (Some(1L), Some(3L)))
      .toDF("u", "item")
    val out = Cooccur.itemCooccurrence(ev, "u", "item", 100, 2L)
      .as[(Long, Long, Long, Long)].collect()
    // (1,3) co-occurs for u1 and u2 -> co=2, overlap 1000
    assert(out.toSeq == Seq((1L, 3L, 2L, 1000L)), out.toSeq.toString)
  }

  test("basketLift: sessions are the baskets; attraction vs repulsion; distinct presence") {
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // u1: {view,click} then {view}; u2: {view,purchase}; u3: {click}
    // N=4 sessions; singles view=3 click=2 purchase=1
    // (click,view): 1000*1*4 div (2*3) = 666 (repulsion)
    // (purchase,view): 1000*1*4 div (1*3) = 1333 (attraction)
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(5), "click"), (1L, t(5), "click"), // dup: once
      (1L, t(100), "view"),
      (2L, t(0), "view"), (2L, t(2), "purchase"),
      (3L, t(0), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Cooccur.basketLift(ev, gapSeconds = 10, minCount = 1L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("click", "view", 1L, 666L),
      ("purchase", "view", 1L, 1333L)))
  }
}
