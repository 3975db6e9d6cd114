package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.operators.Upsert

/** SQL mutation face for graft tables (VERDICT r17 #1/#3): the routing
  * behind [[GraftTable]]'s `SupportsDelete` and `SupportsWrite`, so a
  * SQL-only consumer gets the reference's Snowflake DML surface
  * (`embeddings-pipeline.py:294-352` — the reference's MERGE *is* a SQL
  * statement its users run against a first-class table):
  *
  * {{{
  * DELETE FROM cat.db.t WHERE doc_id IN (1, 2, 3);   -- compliance erasure
  * INSERT INTO cat.db.t SELECT ...;                  -- upsert-by-key MERGE
  * }}}
  *
  *  - '''DELETE''' routes to the engine's snapshot-preserving delete
  *    protocols: on the manifest-bucketed layout a predicate over the
  *    table's recorded merge keys (equality / IN, covering every key)
  *    becomes [[Upsert.deleteKeysFromManifestBucketedParquet]] — the
  *    BUCKET-PRUNED rewrite that touches ~|keys|/nBuckets of the table,
  *    the same path `RunErasure` takes; on the snapshot-pointer layout
  *    any translatable predicate becomes [[Upsert.deleteFromParquet]].
  *    Every other shape is REFUSED at analysis (`canDeleteWhere`
  *    false) — a silent full-table rewrite behind a SQL statement is the
  *    one thing a 100 TB table must never do implicitly.
  *  - '''INSERT INTO''' is a MERGE on the table's recorded
  *    `bucket_keys` (append-as-upsert): matched keys take the incoming
  *    row, new keys insert — exactly the semantics every library caller
  *    gets, under the same optimistic commit protocol (concurrent
  *    writers retry; a lost race after retries surfaces as
  *    [[Upsert.CommitConflictException]]). `INSERT OVERWRITE` is
  *    refused (truncation is the vacuum/erasure contract's job).
  *
  * Retention for SQL-driven commits comes from
  * `spark.graft.sql.keepSnapshots` (default 2, so the pre-mutation
  * snapshot stays time-travel-readable; library callers pick their own
  * per-call retention). */
private[sources] object GraftSqlWrite {

  private[sources] def keepSnapshots(spark: SparkSession): Int =
    spark.conf.get("spark.graft.sql.keepSnapshots", "2").toInt

  /** Upper bound on the key-tuple fan-out a DELETE's IN-lists may expand
    * to (cartesian across keys) — beyond this the statement is refused
    * rather than silently exploded. */
  private val MaxDeleteTuples = 100000

  /** The recorded merge layout of a manifest table: (bucket keys,
    * nBuckets) — None when the table is not a key-merged manifest
    * target. */
  private[sources] def mergeLayout(spark: SparkSession, path: String): Option[(Seq[String], Int)] =
    Upsert.manifestBody(spark, path, None).flatMap { body =>
      for {
        keys <- Upsert.parseManifestString(body, "bucket_keys")
        nb <- Upsert.parseManifestLong(body, "nBuckets") if nb > 0
      } yield (keys.split(",").toSeq, nb.toInt)
    }

  // ---- DELETE ----------------------------------------------------------

  /** A runnable delete for the filter conjunction, or None when the
    * shape is not one the engine can execute without an implicit
    * full-table scan. Used VERBATIM by both `canDeleteWhere` (must not
    * promise what `deleteWhere` cannot do) and `deleteWhere`. */
  def deletePlan(spark: SparkSession, path: String,
      filters: Array[Filter]): Option[() => Unit] =
    mergeLayout(spark, path) match {
      case Some((keys, nBuckets)) =>
        keyTuples(spark, path, keys, filters).map { df => () =>
          Upsert.deleteKeysFromManifestBucketedParquet(spark, path, df, keys,
            nBuckets = nBuckets, keepSnapshots = keepSnapshots(spark))
        }
      case None if Upsert.currentSnapshot(spark, path).isDefined =>
        // snapshot-pointer layout: single full rewrite minus the matching
        // rows — the layout is single-writer and small by contract
        val cols = filters.toSeq.map(toColumn)
        if (cols.exists(_.isEmpty) || cols.isEmpty) None
        else Some { () =>
          Upsert.deleteFromParquet(spark, path,
            cols.flatten.reduce(_ && _), keepSnapshots = keepSnapshots(spark))
          ()
        }
      case None => None
    }

  /** Decompose a DELETE predicate into full merge-key tuples. The
    * predicate arrives as a conjunction of filters; each filter is
    * expanded to its set of partial key ASSIGNMENTS (equality / IN / OR
    * / AND over bucket keys — `key = 17 OR key = 18` and
    * `(k1=1 AND k2=2) OR (k1=3 AND k2=4)` both qualify), and the
    * conjunction cross-merges assignment sets, dropping inconsistent
    * combinations — so a contradictory `k = 1 AND k = 2` deletes
    * nothing, soundly. The result is a key-tuple delete only when every
    * surviving assignment covers EVERY key and the expansion stays
    * small; anything else declines (never an implicit table scan). */
  private def keyTuples(spark: SparkSession, path: String,
      keys: Seq[String], filters: Array[Filter]): Option[DataFrame] = {

    // the set of key assignments satisfying one filter, or None when the
    // filter is not expressible as a finite union of key equalities
    def assignments(f: Filter): Option[Seq[Map[String, Any]]] = f match {
      case EqualTo(c, v) if keys.contains(c) && v != null =>
        Some(Seq(Map(c -> v)))
      case In(c, vs) if keys.contains(c) && !vs.contains(null) =>
        Some(vs.toSeq.map(v => Map(c -> v)))
      case Or(l, r) =>
        for (a <- assignments(l); b <- assignments(r)
             if a.size + b.size <= MaxDeleteTuples)
          yield (a ++ b).distinct
      case And(l, r) =>
        for (a <- assignments(l); b <- assignments(r)
             if a.size.toLong * b.size <= MaxDeleteTuples)
          yield mergeConsistent(a, b)
      case _ => None
    }

    val perFilter = filters.toSeq.map(assignments)
    if (perFilter.isEmpty || perFilter.exists(_.isEmpty)) return None
    val combined = perFilter.flatten.reduceLeft { (a, b) =>
      if (a.size.toLong * b.size > MaxDeleteTuples) return None
      mergeConsistent(a, b)
    }
    if (combined.isEmpty)
      return Some(emptyKeyFrame(spark, path, keys)) // contradictory: no-op
    // every surviving assignment must pin EVERY key, or the predicate
    // admits rows outside any finite tuple set
    if (!combined.forall(m => keys.forall(m.contains))) return None
    if (combined.size > MaxDeleteTuples) return None
    val tuples = combined.map(m => keys.map(m)).distinct
    val fields = keys.map(k => StructField(k,
      Literal(combined.head(k)).dataType, nullable = false))
    val raw = spark.createDataFrame(
      java.util.Arrays.asList(tuples.map(Row.fromSeq): _*),
      StructType(fields))
    // cast the literal-typed tuples to the TABLE's key types (an int
    // literal against a bigint key must hash as bigint)
    Some(castToTableKeys(spark, path, keys, raw))
  }

  /** Conjunction of two assignment sets: every consistent pair merges;
    * pairs assigning different values to the same key drop out. */
  private def mergeConsistent(a: Seq[Map[String, Any]],
      b: Seq[Map[String, Any]]): Seq[Map[String, Any]] =
    (for {
      x <- a; y <- b
      if x.keySet.intersect(y.keySet).forall(k => x(k) == y(k))
    } yield x ++ y).distinct

  private def tableKeySchema(spark: SparkSession, path: String,
      keys: Seq[String]): Seq[StructField] = {
    val schema = GraftTableProvider.resolveSchema(spark,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.singletonMap("path", path)))
    keys.map(k => schema.fields.find(_.name == k).getOrElse(
      throw new IllegalStateException(
        s"recorded bucket key '$k' is not a column of $path")))
  }

  private def castToTableKeys(spark: SparkSession, path: String,
      keys: Seq[String], raw: DataFrame): DataFrame = {
    val fields = tableKeySchema(spark, path, keys)
    raw.select(fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  private def emptyKeyFrame(spark: SparkSession, path: String,
      keys: Seq[String]): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](),
      StructType(tableKeySchema(spark, path, keys).map(_.copy(nullable = false))))

  /** Source filter → Column, for the snapshot-layout predicate delete.
    * None = a shape outside the sound subset (never guess). */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) if !vs.contains(null) =>
      Some(col(c).isin(vs.toIndexedSeq: _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case StringStartsWith(c, v) => Some(col(c).startsWith(v))
    case StringEndsWith(c, v) => Some(col(c).endsWith(v))
    case StringContains(c, v) => Some(col(c).contains(v))
    case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(inner) => toColumn(inner).map(not)
    case _ => None
  }

  // ---- INSERT ----------------------------------------------------------

  /** WriteBuilder for `INSERT INTO` (batch: append-as-upsert on the
    * table's recorded merge keys) and `writeStream.format("graft")`
    * (streaming: exactly-once insert-only appends — see
    * [[GraftStreamingAppend]]). Validation happens HERE (builder
    * construction is analysis time), so an unsupported target fails the
    * statement loudly instead of mid-job. */
  def writeBuilder(path: String, info: LogicalWriteInfo): WriteBuilder = {
    val spark = SparkSession.active
    val (keys, nBuckets) = mergeLayout(spark, path).getOrElse(
      throw new UnsupportedOperationException(
        s"graft table $path does not record a merge-key layout " +
          "(bucket_keys) — SQL INSERT is append-as-upsert and needs one; " +
          "write through the library MERGE entry points instead"))
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwrite) throw new UnsupportedOperationException(
                "graft tables refuse INSERT OVERWRITE — truncation is the " +
                  "vacuum/erasure contract's job, not a write-path side effect")
              Upsert.mergeIntoManifestBucketedParquet(spark, path, data,
                keys, nBuckets = nBuckets,
                keepSnapshots = keepSnapshots(spark))
            }
          }
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new GraftStreamingAppend(path, keys, nBuckets, info)
      }
    }
  }
}
