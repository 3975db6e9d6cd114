package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.operators.Ivf

/** SQL TABLE functions (VERDICT r17 #9 stretch): the engine's persisted
  * ANN indexes reached from a pure-SQL session —
  * {{{
  * SELECT rank, neighbor_id, cos
  * FROM graft_ann_topk('/indexes/embeddings', 5, 8,
  *                     array(CAST(0.12 AS FLOAT), ...));
  * }}}
  * Injected cluster-wide by [[graft.GraftExtensions]]
  * (`injectTableFunction`) and per-session by
  * [[graft.functions.F.registerAll]]. The builder runs at ANALYSIS time
  * on the driver: it loads the index's centroids, routes the literal
  * query vector to its `nprobe` nearest cells, and returns the probe's
  * resolved plan — execution then reads ONLY the probed cells' files,
  * exactly like the library caller ([[Ivf.probeIndex]]). Every argument
  * must be a literal (an index probe for one query vector is a
  * statement-shaped lookup, not a per-row join — use the library API to
  * batch query sets). */
object TableFunctionDefs {

  val all: Seq[(String, String, Seq[Expression] => LogicalPlan)] = Seq(
    ("graft_ann_topk",
      "graft_ann_topk(index_path, k, nprobe, query_vector) - top-k cosine " +
        "neighbors of the literal query_vector from the persisted graft " +
        "IVF index at index_path; output (rank, neighbor_id, cos)",
      annTopK _))

  private def constant(e: Expression, what: String): Any = {
    require(e.foldable,
      s"graft_ann_topk: $what must be a literal (got ${e.sql})")
    val v = e.eval(org.apache.spark.sql.catalyst.expressions.EmptyRow)
    require(v != null, s"graft_ann_topk: $what must not be NULL")
    v
  }

  private def intArg(e: Expression, what: String): Int = constant(e, what) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"graft_ann_topk: $what must be an integer literal, got $other")
  }

  private def annTopK(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4,
      "graft_ann_topk(index_path, k, nprobe, query_vector) takes 4 arguments")
    val path = constant(args(0), "index_path").toString
    val k = intArg(args(1), "k")
    val nprobe = intArg(args(2), "nprobe")
    val elemType = args(3).dataType match {
      case ArrayType(et, _) => et
      case other => throw new IllegalArgumentException(
        s"graft_ann_topk: query_vector must be an array, got ${other.sql}")
    }
    val arr = constant(args(3), "query_vector").asInstanceOf[ArrayData]
    val vec: Seq[Float] = (0 until arr.numElements()).map { i =>
      require(!arr.isNullAt(i), "graft_ann_topk: query_vector has a NULL element")
      elemType match {
        case FloatType => arr.getFloat(i)
        case DoubleType => arr.getDouble(i).toFloat
        case IntegerType => arr.getInt(i).toFloat
        case LongType => arr.getLong(i).toFloat
        case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toFloat
        case other => throw new IllegalArgumentException(
          s"graft_ann_topk: query_vector elements must be numeric, got ${other.sql}")
      }
    }
    val spark = SparkSession.active
    import spark.implicits._
    // query_id −1: a raw query vector has no "self" to exclude, and −1
    // can never collide with a stored neighbor id
    val queries = Seq((-1L, vec)).toDF("vec_id", "embedding")
    Ivf.probeIndex(spark, path, queries, k = k, nprobe = nprobe)
      .select(col("rank"), col("neighbor_id"), col("cos"))
      .queryExecution.analyzed
  }
}
