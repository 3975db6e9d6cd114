package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** The engine's SQL function surface as `(name, usage, builder)` triples —
  * the single source of truth consumed by both
  * [[graft.GraftExtensions]] (cluster-wide injection via
  * `spark.sql.extensions`) and [[F.registerAll]] (per-session registry).
  *
  * Scalar configuration arguments (hash counts, seeds, vocabularies) must
  * be foldable literals in the SQL call — they parameterize expression
  * construction (permutation tables, hyperplanes, hash sets built once on
  * the driver), not per-row inputs.
  */
object FunctionDefs {

  private def litLong(e: Expression, fn: String, arg: String): Long = {
    require(e.foldable, s"$fn: $arg must be a literal")
    e.eval() match {
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l
      case s: java.lang.Short => s.toLong
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    }
  }

  private def litDouble(e: Expression, fn: String, arg: String): Double = {
    require(e.foldable, s"$fn: $arg must be a literal")
    e.eval() match {
      case d: java.lang.Double => d
      case f: java.lang.Float => f.toDouble
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a numeric literal, got $other")
    }
  }

  private def litStrings(e: Expression, fn: String, arg: String): Seq[String] = {
    require(e.foldable, s"$fn: $arg must be a literal array")
    e.eval() match {
      case a: ArrayData =>
        a.toObjectArray(StringType).map(_.asInstanceOf[UTF8String].toString).toSeq
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an array<string> literal, got $other")
    }
  }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("ascii_fold",
      "ascii_fold(str) - Unicode->ASCII transliteration",
      es => AsciiFold(es.head)),
    ("cjk_unmapped_count",
      "cjk_unmapped_count(str) - CJK ideographs ascii_fold would drop",
      es => CjkUnmappedCount(es.head)),
    ("char_class_census",
      "char_class_census(str) - single-pass ASCII character-class counters",
      es => CharClassCensus(es.head)),
    ("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two vectors",
      es => CosineSim(es(0), es(1))),
    ("dot_product",
      "dot_product(a, b) - dot product of two vectors",
      es => DotProduct(es(0), es(1))),
    ("l2_norm",
      "l2_norm(a) - L2 norm of a vector",
      es => L2Norm(es.head)),
    ("simhash64",
      "simhash64(words) - 64-bit SimHash of a string array",
      es => SimHash64(es.head)),
    ("mix64",
      "mix64(str) - engine-portable 64-bit string hash (poly31 fold + splitmix64)",
      es => Mix64Str(es.head)),
    ("int_log2",
      "int_log2(x) - floor(log2(x)) of a positive bigint; NULL for x <= 0",
      es => IntLog2(es.head)),
    ("bloom_might_contain",
      "bloom_might_contain(bloom, hash64) - probe a hash against a serialized Bloom filter literal",
      es => BloomMightContain(es(0), es(1))),
    ("kll_sketch_agg",
      "kll_sketch_agg(value[, k]) - KLL quantile sketch aggregate (binary)",
      es => KllSketchAgg(es.head,
        if (es.length > 1) litLong(es(1), "kll_sketch_agg", "k").toInt else 200)
        .toAggregateExpression()),
    ("kll_union_agg",
      "kll_union_agg(sketch[, k]) - merge serialized KLL sketches",
      es => KllUnionAgg(es.head,
        if (es.length > 1) litLong(es(1), "kll_union_agg", "k").toInt else 200)
        .toAggregateExpression()),
    ("kll_quantile",
      "kll_quantile(sketch, rank) - INCLUSIVE quantile value from a KLL sketch",
      es => org.apache.spark.sql.catalyst.expressions.GetArrayItem(
        KllQuantiles(es(0), Seq(litDouble(es(1), "kll_quantile", "rank"))),
        org.apache.spark.sql.catalyst.expressions.Literal(0))),
    ("freq_sketch_agg",
      "freq_sketch_agg(item[, maxMapSize]) - frequent-items (Misra-Gries) sketch aggregate (binary)",
      es => FreqSketchAgg(es.head,
        if (es.length > 1) litLong(es(1), "freq_sketch_agg", "maxMapSize").toInt else 256)
        .toAggregateExpression()),
    ("freq_union_agg",
      "freq_union_agg(sketch[, maxMapSize]) - merge serialized frequent-items sketches",
      es => FreqUnionAgg(es.head,
        if (es.length > 1) litLong(es(1), "freq_union_agg", "maxMapSize").toInt else 256)
        .toAggregateExpression()),
    ("freq_top_items",
      "freq_top_items(sketch, minCount) - frequent items at a count threshold (no false negatives)",
      es => FreqTopItems(es(0), litLong(es(1), "freq_top_items", "minCount"))),
    ("word_shingles",
      "word_shingles(words, n) - distinct word n-gram shingles",
      es => WordShingles(es(0), litLong(es(1), "word_shingles", "n").toInt)),
    ("minhash_sig",
      "minhash_sig(shingles, numHashes[, seed]) - MinHash signature",
      es => MinHashSig(es(0), litLong(es(1), "minhash_sig", "numHashes").toInt,
        if (es.length > 2) litLong(es(2), "minhash_sig", "seed") else 42L)),
    ("minhash_bands",
      "minhash_bands(sig, bands) - LSH band hashes of a MinHash signature",
      es => MinHashBands(es(0), litLong(es(1), "minhash_bands", "bands").toInt)),
    ("count_in_set",
      "count_in_set(words, vocab) - count of elements in a literal vocabulary",
      es => CountInSet(es(0), litStrings(es(1), "count_in_set", "vocab"))),
    ("poly_fingerprint",
      "poly_fingerprint(words[, wordMul, docMul, mod]) - polynomial rolling-hash fingerprint",
      es => PolyFingerprint(es(0),
        if (es.length > 1) litLong(es(1), "poly_fingerprint", "wordMul") else 31L,
        if (es.length > 2) litLong(es(2), "poly_fingerprint", "docMul") else 131L,
        if (es.length > 3) litLong(es(3), "poly_fingerprint", "mod") else 1000000007L)),
    ("srp_bucket",
      "srp_bucket(vec, planes, seed, dim) - sign-random-projection LSH bucket id",
      es => SrpBucket(es(0), litLong(es(1), "srp_bucket", "planes").toInt,
        litLong(es(2), "srp_bucket", "seed"),
        litLong(es(3), "srp_bucket", "dim").toInt)),
    ("random_project",
      "random_project(vec, outDim, seed, dim) - fixed-point ±1 JL projection to outDim longs",
      es => RandomProject(es(0), litLong(es(1), "random_project", "outDim").toInt,
        litLong(es(2), "random_project", "seed"),
        litLong(es(3), "random_project", "dim").toInt)))
}
