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

  /** Time-BAND join: every (left, right) pair within the same key whose
    * timestamps differ by at most `bandSeconds` (inclusive both ends) —
    * the many-to-many "what happened around this event" join that
    * [[rangeJoin]]'s non-overlapping-interval contract can't express.
    *
    * Spark plans the naive predicate (`l.key = r.key AND abs(l.ts − r.ts)
    * <= Δ`) as an equi-join on the key with the band as a post-join
    * filter — correct, but a hot key degenerates to its full quadratic
    * pair set before filtering. This is the bucketed formulation the
    * commercial engines' range-join optimization uses: quantize both
    * sides to Δ-wide buckets, explode the LEFT side to its three
    * candidate buckets (b−1, b, b+1), equi-join on (key, bucket), then
    * apply the exact band predicate. A right row within the band is
    * always in one of the three buckets, and its own bucket is unique, so
    * every qualifying pair appears EXACTLY once — no dedup stage. The
    * shuffle key becomes (key, time-bucket): a key hot over a long span
    * now spreads across its time range, the per-bucket candidate set is
    * bounded by the band instead of the key's history, and AQE can split
    * what remains. Cost: the 3× left-side explode — put the smaller /
    * anchor side on the left.
    *
    * Pairs are emitted with all left columns plus each `rightCols` as
    * `band_<name>`; key columns must not collide with payload names.
    */
  def bandJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      lTsCol: String, rTsCol: String, bandSeconds: Long,
      rightCols: Seq[String]): DataFrame = {
    require(bandSeconds > 0, s"bandSeconds must be positive, got $bandSeconds")
    val bandUs = bandSeconds * 1000000L
    // floored integer division (exact at bucket boundaries, any-sign safe;
    // double division would round near the 2^53 mantissa limit)
    def bucket(ts: Column): Column = {
      val us = unix_micros(ts)
      ((us - pmod(us, lit(bandUs))) / lit(bandUs)).cast("long")
    }
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__b0", bucket(col(lTsCol)))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val r = right.select(
      (keys.map(col) :+ col(rTsCol).as("__rts")) ++ rightCols.map(col): _*)
      .withColumn("__b", bucket(col("__rts")))
    l.join(r, keys :+ "__b")
      .where(abs(unix_micros(col(lTsCol)) - unix_micros(col("__rts"))) <= bandUs)
      .select(leftCols.map(col) ++ rightCols.map(c => col(c).as(s"band_$c")): _*)
  }
}
