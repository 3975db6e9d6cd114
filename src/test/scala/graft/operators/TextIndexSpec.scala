package graft.operators

import graft.SparkSpecBase

/** Persisted inverted index: every surface must agree with the
  * from-scratch scorer bit for bit — the index is an access path, never
  * a different answer. */
class TextIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark merge dup scan dup"),
    (2L, "window column spark"),
    (3L, "dup dup dup merge"),
    (4L, "scan scan window"),
    (5L, "column column column dup")).toDF("doc_id", "text")

  private val qs = Seq(1L -> Seq("dup", "merge"), 2L -> Seq("window"))

  private def served(root: String) =
    TextIndex.query(spark, root, qs, k = 3)
      .as[(Long, Long, Long)].collect().toSet

  private def scanned(docs: org.apache.spark.sql.DataFrame) =
    TextAnalysis.bm25TopK(docs, "doc_id", "text", qs, k = 3)
      .as[(Long, Long, Long)].collect().toSet

  test("index-served scores equal the from-scratch scorer") {
    val root = java.nio.file.Files.createTempDirectory("graft-ti1").toString
    TextIndex.buildIndex(spark, root, corpus, nShards = 4)
    assert(served(root) == scanned(corpus))
    assert(served(root).nonEmpty)
  }

  test("incremental add equals a full rebuild of the union") {
    val root = java.nio.file.Files.createTempDirectory("graft-ti2").toString
    val (b1, b2) = (corpus.where($"doc_id" <= 3), corpus.where($"doc_id" > 3))
    TextIndex.buildIndex(spark, root, b1, nShards = 4)
    TextIndex.addToIndex(spark, root, b2)
    assert(served(root) == scanned(corpus))
  }

  test("deleteFromIndex equals a rebuild without the ids; df/avgdl shift too") {
    val root = java.nio.file.Files.createTempDirectory("graft-ti3").toString
    TextIndex.buildIndex(spark, root, corpus, nShards = 4)
    TextIndex.deleteFromIndex(spark, root, Seq(1L, 4L).toDF("doc_id"))
    assert(served(root) == scanned(corpus.where(!$"doc_id".isin(1L, 4L))))
    // the erased ids are gone from both tables, not just unscored
    assert(IndexStore.read(spark, s"$root/postings")
      .where($"doc_id".isin(1L, 4L)).count() == 0)
    assert(IndexStore.read(spark, s"$root/doclen")
      .where($"doc_id".isin(1L, 4L)).count() == 0)
  }

  test("compactIndex collapses appended fragments; results unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft-ti5").toString
    TextIndex.buildIndex(spark, root, corpus.where($"doc_id" <= 2), nShards = 4)
    (3L to 5L).foreach(i =>
      TextIndex.addToIndex(spark, root, corpus.where($"doc_id" === i)))
    val before = served(root)
    def files = graft.operators.Upsert
      .readBucketManifest(spark, s"$root/postings").values.map(_.size).sum
    val fragmented = files
    graft.RunMaintain.run(spark, Array("textindex-compact", root))
    assert(files < fragmented, s"no collapse: $fragmented -> $files")
    assert(served(root) == before && before == scanned(corpus))
  }

  test("RunErasure --text-index scrubs the postings alongside the target") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ti6").toString
    val (target, root) = (s"$dir/table", s"$dir/idx")
    Upsert.mergeIntoParquet(spark, target,
      corpus.withColumnRenamed("doc_id", "main_refco"), Seq("main_refco"))
    TextIndex.buildIndex(spark, root, corpus, nShards = 4)
    val keys = java.nio.file.Files.createTempDirectory("graft-ti6k")
      .resolve("keys").toString
    Seq(2L, 5L).toDF("main_refco").write.parquet(keys)
    graft.RunErasure.run(spark, Array(target, keys, "--key-col", "main_refco",
      "--text-index", root))
    assert(Upsert.readTarget(spark, target).count() == 3)
    assert(IndexStore.read(spark, s"$root/postings")
      .where($"doc_id".isin(2L, 5L)).count() == 0)
    assert(served(root) == scanned(corpus.where(!$"doc_id".isin(2L, 5L))))
  }

  test("queries touching a single shard still see whole-corpus statistics") {
    // one-term query: only that term's shard loads, but N/avgdl/df come
    // from doclen + the shard's full postings — equality with the
    // scanner proves the pruned read is statistically complete
    val root = java.nio.file.Files.createTempDirectory("graft-ti4").toString
    TextIndex.buildIndex(spark, root, corpus, nShards = 8)
    // "merge" (df 2 of 5) carries idf bits; an all-common term would
    // Lucene-clamp to zero rows on both sides
    val one = Seq(9L -> Seq("merge"))
    val idx = TextIndex.query(spark, root, one, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    val scan = TextAnalysis.bm25TopK(corpus, "doc_id", "text", one, k = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(idx == scan && idx.nonEmpty)
  }
}
