package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: drop (or flag) training documents that share
  * any word n-gram with an evaluation/test set — the standard guard against
  * benchmark leakage when assembling an LLM training corpus (the reference
  * pipeline has no equivalent; this is part of the beyond-reference
  * LLM-pipeline surface, SURVEY.md §7.5).
  *
  * Scale shape: the benchmark side is small by definition (an eval set),
  * so its distinct shingle set is broadcast and the corpus-side probe is
  * map-side only — the corpus is never shuffled on text. The corpus DOES
  * explode to one row per (doc, shingle) before the probe, but the probe
  * filters that stream in place (no exchange) and only matching
  * (doc, shingle) rows reach the one aggregation shuffle, which is sized
  * by the CONTAMINATION (tiny), not the corpus.
  */
object Decontaminate {

  /** Per-document contamination stats against `benchmark`: every corpus row
    * with `n_overlap` = how many distinct benchmark n-grams it contains and
    * a `contaminated` flag. `n = 3` (13-gram in production; 3 here matches
    * the test corpora's short documents — the operator is n-agnostic).
    */
  def flag(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    val benchShingles = Dedup.withShingles(benchmark, benchTextCol, n)
      .select(explode(col("shingles")).as("shingle")).distinct()
    val corpusShingles = Dedup.withShingles(Par.spread(corpus), textCol, n)
      .select(col(idCol), explode(col("shingles")).as("shingle"))
    val overlaps = corpusShingles
      .join(broadcast(benchShingles), "shingle")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    corpus.join(overlaps, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** The corpus with contaminated documents removed. Same plan as [[flag]]
    * but the overlap side collapses to distinct ids before a LEFT ANTI
    * join, so the only shuffled data is the contaminated id set. */
  def clean(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 3): DataFrame = {
    val benchShingles = Dedup.withShingles(benchmark, benchTextCol, n)
      .select(explode(col("shingles")).as("shingle")).distinct()
    val contaminatedIds = Dedup.withShingles(Par.spread(corpus), textCol, n)
      .select(col(idCol), explode(col("shingles")).as("shingle"))
      .join(broadcast(benchShingles), "shingle")
      .select(idCol).distinct()
    corpus.join(contaminatedIds, Seq(idCol), "left_anti")
  }
}
