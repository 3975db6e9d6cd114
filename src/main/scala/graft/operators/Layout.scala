package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * Delta/Iceberg `ZORDER BY` idea for plain Parquet. Sorting a table by
  * the bit-interleaved key of two+ columns makes row-group min/max stats
  * selective on EVERY interleaved column at once — a single-column sort
  * prunes only its leading column, a Z-curve sort prunes all of them
  * (each row group covers a small hyper-rectangle of the key space).
  *
  * The key is built from static shift/mask terms over built-ins —
  * codegen'd, engine-portable (the oracle generates the same term sum as
  * SQL), no UDF, no custom expression.
  */
object Layout {

  /** Morton key: interleave the low `bits` bits of each column
    * (column i contributes bit position `j*n + i` for its bit j).
    * Inputs must be non-negative (bucketize/rank first — raw skewed
    * domains cluster poorly anyway); `n*bits` must fit a long. */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(cols.size * bits <= 63, s"${cols.size} cols x $bits bits > 63")
    cols.zipWithIndex.flatMap { case (c, ci) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * cols.size + ci)
      }
    }.reduce(_ + _)
  }

  /** The SQL form of [[zorderKey]] (same static term expansion), for
    * oracles and external engines. */
  def zorderKeySql(cols: Seq[String], bits: Int): String =
    cols.zipWithIndex.flatMap { case (c, ci) =>
      (0 until bits).map { i =>
        s"((($c >> $i) & 1) << ${i * cols.length + ci})"
      }
    }.mkString(" + ")

  /** Rewrite a frame clustered on the Z-curve of `cols`: range-partition
    * by the key (so files cover disjoint curve segments) and sort within
    * partitions (so row groups inside each file do too). Write the result
    * with ordinary `.write.parquet` — parquet row-group stats do the
    * pruning on read, no special reader needed. */
  def clusterByZOrder(df: DataFrame, cols: Seq[String], bits: Int = 16,
      partitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__z", zorderKey(cols.map(col), bits))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions("__z").drop("__z")
  }
}
