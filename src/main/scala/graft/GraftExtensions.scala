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
    ext.injectFunction((FunctionIdentifier("ascii_fold"),
      info("ascii_fold", "ascii_fold(str) - Unicode->ASCII transliteration"),
      (es: Seq[Expression]) => AsciiFold(es.head)))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two vectors"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two vectors"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - L2 norm of a vector"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(words) - 64-bit SimHash of a string array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
  }
}
