package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Upsert

/** Maintenance procedures for the SQL face (round 18) — the lifecycle
  * operations a table needs beyond DML, reached the way Iceberg/Delta
  * users reach them:
  *
  * {{{
  * CALL cat.system.compact(`table` => 'db.t', zorder => 'a,b')
  * CALL cat.system.vacuum(`table` => 'db.t', keep_snapshots => 2)
  * CALL cat.system.snapshots(`table` => 'db.t')
  * }}}
  *
  * Spark's `Analyzer.ResolveProcedures`/`InvokeProcedures` handle the
  * CALL statement (named/positional args, coercion, defaults); each
  * procedure here routes to the library's existing maintenance entry
  * point ([[Upsert.compactManifestBucketedParquet]], [[Upsert.vacuum]])
  * under the same optimistic commit protocol as every writer, and
  * returns a one-result summary relation (InvokeProcedures executes the
  * call at analysis and serves the returned [[LocalScan]] rows as the
  * statement's result — multi-scan results are not supported by Spark
  * yet, so each procedure returns exactly one).
  *
  * The `table` argument is the catalog-relative identifier string
  * (`db.t`); resolution goes through the SAME registry lookup as a
  * query, so adopted zero-DDL tables work too. */
private[sources] object GraftProcedures {

  /** Namespace the procedures live under: `CALL cat.system.<proc>()`. */
  val Namespace = "system"

  val names: Seq[String] = Seq("compact", "vacuum", "snapshots")

  def load(spark: SparkSession, ident: Identifier,
      resolveTable: String => String): UnboundProcedure = {
    require(ident.namespace.toSeq == Seq(Namespace),
      s"graft procedures live under the '$Namespace' namespace: " +
        s"CALL <cat>.$Namespace.${ident.name}(…)")
    ident.name match {
      case "compact" => new CompactProcedure(spark, resolveTable)
      case "vacuum" => new VacuumProcedure(spark, resolveTable)
      case "snapshots" => new SnapshotsProcedure(spark, resolveTable)
      case other => throw new IllegalArgumentException(
        s"unknown graft procedure '$other' — have: ${names.mkString(", ")}")
    }
  }

  /** One-result relation: what a procedure hands back to
    * InvokeProcedures. */
  private final class ResultScan(schema: StructType,
      rows: Seq[InternalRow], name: String) extends Scan with LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = rows.toArray
    override def description(): String = s"GraftProcedureResult($name)"
  }

  private def result(name: String, schema: StructType,
      rows: Seq[InternalRow]): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](
      new ResultScan(schema, rows, name)).iterator()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def strArg(in: InternalRow, i: Int): Option[String] =
    if (in.isNullAt(i)) None else Some(in.getUTF8String(i).toString)

  /** Files currently referenced by the live manifest — the before/after
    * observability number compact reports. */
  private def liveFileCount(spark: SparkSession, path: String): Long =
    Upsert.manifestBody(spark, path, None)
      .map(b => Upsert.parseManifestEntries(b).values.map(_.size.toLong).sum)
      .getOrElse(0L)

  private abstract class GraftProcedure(spark: SparkSession,
      resolveTable: String => String) extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false // mutates/reads table state
    protected def pathOf(in: InternalRow): String = {
      require(!in.isNullAt(0), s"$name: `table` is required")
      resolveTable(in.getUTF8String(0).toString)
    }
    protected def tableParam: ProcedureParameter =
      ProcedureParameter.in("table", StringType)
        .comment("catalog-relative table identifier, e.g. 'db.t'").build()
  }

  /** OPTIMIZE: bin-pack a manifest-bucketed table's files to a target
    * row count, optionally Z-ORDER clustering and/or re-bucketing —
    * [[Upsert.compactManifestBucketedParquet]] behind `CALL`. */
  private final class CompactProcedure(spark: SparkSession,
      resolveTable: String => String) extends GraftProcedure(spark, resolveTable) {
    override def name(): String = "compact"
    override def description(): String =
      "bin-pack (and optionally Z-ORDER / re-bucket) a graft table's files"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("target_file_rows", LongType)
        .defaultValue("1048576").comment("rows per output file").build(),
      ProcedureParameter.in("zorder", StringType).defaultValue("NULL")
        .comment("comma-separated columns to Z-ORDER cluster (2..4)").build(),
      ProcedureParameter.in("n_buckets", IntegerType).defaultValue("NULL")
        .comment("re-bucket to this count (defaults to keeping the layout)")
        .build(),
      ProcedureParameter.in("keep_snapshots", IntegerType).defaultValue("1")
        .comment("retention for the compaction commit").build())

    override def call(in: InternalRow): java.util.Iterator[Scan] = {
      val path = pathOf(in)
      val targetRows = if (in.isNullAt(1)) 1L << 20 else in.getLong(1)
      val zorder = strArg(in, 2).map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq).getOrElse(Nil)
      val newNb = if (in.isNullAt(3)) None else Some(in.getInt(3))
      val keep = if (in.isNullAt(4)) 1 else in.getInt(4)
      // merge keys come from the table's own recorded layout — a SQL
      // caller never re-states (and can never mis-state) them
      val keys = Upsert.manifestBody(spark, path, None)
        .flatMap(Upsert.parseManifestString(_, "bucket_keys"))
        .map(_.split(",").toSeq).getOrElse(Nil)
      val before = liveFileCount(spark, path)
      Upsert.compactManifestBucketedParquet(spark, path, keys = keys,
        zorderCols = zorder, targetFileRows = targetRows,
        newNBuckets = newNb, keepSnapshots = keep)
      val after = liveFileCount(spark, path)
      result(name(), StructType(Seq(
        StructField("files_before", LongType, nullable = false),
        StructField("files_after", LongType, nullable = false),
        StructField("snapshot", StringType, nullable = true))),
        Seq(InternalRow(before, after,
          Upsert.currentSnapshot(spark, path).map(utf8).orNull)))
    }
  }

  /** Retention + GC: retire snapshots beyond `keep_snapshots` and sweep
    * unreferenced data files — [[Upsert.vacuum]] behind `CALL`. The
    * erasure-horizon operation: after vacuum, deleted rows are gone from
    * every retrievable version. */
  private final class VacuumProcedure(spark: SparkSession,
      resolveTable: String => String) extends GraftProcedure(spark, resolveTable) {
    override def name(): String = "vacuum"
    override def description(): String =
      "retire snapshots beyond the retention and GC unreferenced files"
    override def parameters(): Array[ProcedureParameter] = Array(
      tableParam,
      ProcedureParameter.in("keep_snapshots", IntegerType).defaultValue("1")
        .comment("snapshots to retain (the erasure horizon)").build())

    override def call(in: InternalRow): java.util.Iterator[Scan] = {
      val path = pathOf(in)
      val keep = if (in.isNullAt(1)) 1 else in.getInt(1)
      Upsert.vacuum(spark, path, keepSnapshots = keep)
      val left = Upsert.snapshots(spark, path)
      result(name(), StructType(Seq(
        StructField("snapshots_retained", IntegerType, nullable = false),
        StructField("current", StringType, nullable = true))),
        Seq(InternalRow(left.size, left.lastOption.map(utf8).orNull)))
    }
  }

  /** Time-travel introspection: the committed snapshots a reader can
    * still resolve, oldest first — `VERSION AS OF id` takes the id
    * column. */
  private final class SnapshotsProcedure(spark: SparkSession,
      resolveTable: String => String) extends GraftProcedure(spark, resolveTable) {
    override def name(): String = "snapshots"
    override def description(): String =
      "list the table's retrievable snapshots (oldest first)"
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] = Array(tableParam)

    override def call(in: InternalRow): java.util.Iterator[Scan] = {
      val path = pathOf(in)
      val snaps = Upsert.snapshots(spark, path)
      val current = Upsert.currentSnapshot(spark, path)
      result(name(), StructType(Seq(
        StructField("snapshot", StringType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("is_current", BooleanType, nullable = false))),
        snaps.map { s =>
          val id = s.stripPrefix("snap-").takeWhile(_.isDigit).toLong
          InternalRow(utf8(s), id, current.contains(s))
        })
    }
  }
}
