package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `repetition_stats(words)` — intra-document repetition counters, the
  * Gopher-style quality signals (Rae et al. 2021, "Scaling Language
  * Models", table A1) for catching boilerplate / machine-generated text:
  * a document whose most frequent word bigram covers a large fraction of
  * the text, or whose distinct-word ratio is low, is repetitive junk.
  *
  * Returns a struct of six longs computed in ONE pass over the word array
  * with two open-addressing count maps (words, adjacent bigrams):
  *
  *  - `n_words`, `n_distinct_words`, `top_word_count`
  *  - `n_bigrams`, `n_distinct_bigrams`, `top_bigram_count`
  *
  * Ratios (duplicate-word fraction, top-bigram fraction) are left to the
  * caller as integer arithmetic on these counters so results stay
  * engine-exact for the DuckDB oracle. A HOF formulation
  * (`array_max(transform(array_distinct(bg), d -> size(filter(bg, ...))))`)
  * would be O(n²) interpreted evals per row and `CollapseProject` would
  * inline the bigram alias into every lambda; this is O(n) in a tight
  * JVM loop and stays inside whole-stage codegen.
  *
  * Per-row expression ⇒ no shuffle: at 100 TB this runs map-side inside
  * the scan stage, and unused struct fields are pruned by Catalyst.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with StringArrayInput {

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val wordCounts = new java.util.HashMap[String, Array[Int]](n * 2)
    val bigramCounts = new java.util.HashMap[String, Array[Int]](n * 2)
    var topWord = 0
    var topBigram = 0
    var prev: String = null
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i).toString
      val wc = wordCounts.computeIfAbsent(w, _ => new Array[Int](1))
      wc(0) += 1
      if (wc(0) > topWord) topWord = wc(0)
      if (prev != null) {
        val bc = bigramCounts.computeIfAbsent(prev + " " + w, _ => new Array[Int](1))
        bc(0) += 1
        if (bc(0) > topBigram) topBigram = bc(0)
      }
      prev = w
      i += 1
    }
    InternalRow(n.toLong, wordCounts.size.toLong, topWord.toLong,
      math.max(n - 1, 0).toLong, bigramCounts.size.toLong, topBigram.toLong)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionStats", this,
      classOf[RepetitionStats].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("top_word_count", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("top_bigram_count", LongType, nullable = false)))
}
