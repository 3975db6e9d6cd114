package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** `SparkSessionExtensions` injection point — enables the engine's SQL
  * function surface without touching application code:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * after which `SELECT ascii_fold(s), cosine_sim(a, b), simhash64(ws) ...`
  * resolve in plain SQL on any session of the cluster. The same registry
  * can be populated per-session with [[graft.functions.F.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    FunctionDefs.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    // table functions (round 18): the persisted-ANN probe as a SQL TVF
    TableFunctionDefs.all.foreach { case (name, usage, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}
