package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates (Deequ-style, reduced to the single-pass shape a
  * 100 TB ingest wants): declare named violation predicates, get back one
  * report row per rule with exact violation counts — the go/no-go input
  * for promoting a batch into the merge target.
  *
  * Scale shape: every rule is evaluated in the SAME scan — rows explode
  * to (rule, 0|1) markers (|rules| per row, slim structs) and a map-side
  * partially-aggregated groupBy(rule) sums them, so the exchange carries
  * |rules| rows per map partition regardless of corpus size. NULL
  * predicate results count as non-violations (match SQL WHERE semantics;
  * write an explicit `isNull` rule to gate nulls).
  */
object Validate {

  /** Report: (rule, n_rows, n_violations, violation_permille), one row
    * per rule; permille in integer arithmetic. */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    val marked = df.select(explode(array(rules.map { case (name, pred) =>
      struct(lit(name).as("rule"),
        when(coalesce(pred, lit(false)), 1L).otherwise(0L).as("v"))
    }: _*)).as("r"))
    marked.groupBy(col("r.rule").as("rule"))
      .agg(count(lit(1)).as("n_rows"), sum(col("r.v")).as("n_violations"))
      .withColumn("violation_permille",
        expr("n_violations * 1000 div n_rows"))
  }

  /** Count of key tuples appearing more than once — the uniqueness check
    * [[report]]'s per-row rules can't express. One shuffle on the key
    * (map-side combined). */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .where(col("__c") > 1).count()

  /** Gate: throw if any rule's violation count exceeds its budget
    * (default 0). Returns the report for logging on success. */
  def enforce(df: DataFrame, rules: Seq[(String, Column)],
      budgets: Map[String, Long] = Map.empty): DataFrame = {
    val rep = report(df, rules)
    val bad = rep.where(col("n_violations") >
        coalesce(element_at(
          map(budgets.toSeq.flatMap { case (k, v) =>
            Seq(lit(k), lit(v)) }: _*), col("rule")), lit(0L)))
      .select("rule", "n_violations").collect()
    if (bad.nonEmpty)
      throw new IllegalStateException("data-quality gate failed: " +
        bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
    rep
  }
}
