package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-in set. */
object Joins {

  /** AS-OF join: each left row picks up the payload of the latest right
    * row with `right.ts <= left.ts` within the same key — the canonical
    * time-series enrichment (trade↔quote, event↔latest-state).
    *
    * Spark has no ASOF JOIN; the naive formulation (theta-join on
    * `r.ts <= l.ts` + keep-latest) explodes quadratically per key. This is
    * the scale-safe merge formulation: union both sides tagged, ONE
    * shuffle on the key, per-key sort by (ts, side), and a running
    * `last(_, ignoreNulls)` window carries the most recent right payload
    * forward into each left row. Right rows sort before left rows at equal
    * timestamps, so an exact-tie right row matches (`<=` semantics).
    * O(n log n) per key, no join blow-up, AQE-skew-splittable.
    *
    * @param rightCols payload columns to carry from the right side
    *   (emitted as `asof_<name>`); right rows should be unique per
    *   (key, ts) — pre-dedup with [[Dedup.latestPerKey]] otherwise
    *   (among equal-ts right rows the last in (ts) order wins).
    *
    * The payload rides as ONE struct per right row, and the window carries
    * the latest non-null STRUCT (not each column independently): a matched
    * right row whose payload value is a genuine NULL surfaces that NULL,
    * exactly like SQL ASOF JOIN — per-column `last(ignoreNulls)` would
    * skip it and leak a stale value from an older right row.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val rTagged = right
      .select((keys :+ tsCol).map(col) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
      .withColumn("__side", lit(0))
      .withColumns(leftCols.filterNot((keys :+ tsCol).contains)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    filled.where(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Range join against interval bounds: rows of `facts` matched to the
    * (assumed non-overlapping per key) interval of `dims` containing
    * their `tsCol` — expressed as an as-of join on the interval start
    * followed by an end-bound filter, so it needs ONE shuffle instead of
    * a theta-join. `dims` carries `startCol`/`endCol` (end exclusive). */
  def rangeJoin(facts: DataFrame, dims: DataFrame, keys: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      dimCols: Seq[String]): DataFrame = {
    val asof = asofJoin(facts,
      dims.withColumnRenamed(startCol, tsCol),
      keys, tsCol, dimCols :+ endCol)
    asof.where(col(s"asof_$endCol").isNotNull && col(tsCol) < col(s"asof_$endCol"))
      .drop(s"asof_$endCol")
  }
}
