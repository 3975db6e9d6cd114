package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[PlanNorm]] against the REAL flapping variants captured from
  * round-15 back-to-back full-suite bench runs — each pair is two
  * renderings of the SAME plan from sessions with different histories,
  * and must normalize byte-identically. */
class PlanNormSpec extends AnyFunSuite {

  test("multi-distinct Expand: gid binding + within-row position flips collapse") {
    // q21_waiting_supplier, observed in runs M vs N: the gid rewrite
    // swapped which Expand row carries the CASE projection AND which
    // column slot it lands in.
    val a = "+- Expand [[none#xL, none#xL, null, 1], [none#xL, null, " +
      "CASE WHEN (R = none#x) THEN none#xL END, 2]], [none#xL, none#xL, none#xL, none#x]"
    val b = "+- Expand [[none#xL, CASE WHEN (R = none#x) THEN none#xL END, " +
      "null, 1], [none#xL, null, none#xL, 2]], [none#xL, none#xL, none#xL, none#x]"
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
  }

  test("multi-distinct HashAggregate: FILTER-group order flips collapse") {
    val a = "+- HashAggregate(keys=[none#xL], functions=[partial_count(none#xL) " +
      "FILTER (WHERE (1 = none#x)), partial_count(none#xL) FILTER (WHERE (2 = none#x))], " +
      "output=[none#xL, none#xL, none#xL])"
    val b = "+- HashAggregate(keys=[none#xL], functions=[partial_count(none#xL) " +
      "FILTER (WHERE (2 = none#x)), partial_count(none#xL) FILTER (WHERE (1 = none#x))], " +
      "output=[none#xL, none#xL, none#xL])"
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
  }

  test("lambda-variable counter and object identity hashes normalize") {
    val a = "Project [filter(split(text#12,  , -1), lambdafunction(NOT " +
      "(lambda x_1#34 = ), lambda x_1#34, false)) AS ws#56]"
    val b = "Project [filter(split(text#999,  , -1), lambdafunction(NOT " +
      "(lambda x_478#77 = ), lambda x_478#77, false)) AS ws#88]"
    assert(PlanNorm.normalize(a) == PlanNorm.normalize(b))
    assert(PlanNorm.normalize("agg(graft.functions.Foo@1c5f6292)") ==
      PlanNorm.normalize("agg(graft.functions.Foo@54519d74)"))
  }

  test("different plans still hash apart") {
    // normalization must not erase REAL differences: operator, column
    // content, and structure survive
    assert(PlanNorm.normalize("+- HashAggregate(keys=[none#1x], functions=[sum(none#2)])") !=
      PlanNorm.normalize("+- HashAggregate(keys=[none#1x], functions=[max(none#2)])"))
    assert(PlanNorm.normalize("+- Expand [[a, null, 1], [b, null, 2]], [o]") !=
      PlanNorm.normalize("+- Expand [[a, null, 1], [c, null, 2]], [o]"))
    // bare-int gid normalization is scoped to the TRAILING row slot
    // (ADVICE r15): a changed integer literal elsewhere in the row is a
    // real plan change and must stay visible...
    assert(PlanNorm.normalize("+- Expand [[a, 5, null, 1]], [o]") !=
      PlanNorm.normalize("+- Expand [[a, 7, null, 1]], [o]"))
    // ...while the trailing gid itself still collapses
    assert(PlanNorm.normalize("+- Expand [[a, null, 1]], [o]") ==
      PlanNorm.normalize("+- Expand [[a, null, 2]], [o]"))
    assert(PlanNorm.normalize("Filter (a > 1)\n+- Scan x") !=
      PlanNorm.normalize("Scan x"))
  }

  test("unbalanced or bracket-free lines pass through untouched") {
    val s = "some line without lists"
    assert(PlanNorm.normalize(s) == s)
    val unbalanced = "+- Expand [[a, b"
    assert(PlanNorm.normalize(unbalanced) == unbalanced)
  }
}
