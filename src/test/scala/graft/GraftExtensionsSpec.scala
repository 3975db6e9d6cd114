package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface resolves through SparkSessionExtensions injection — a
  * fresh SparkSession (sharing the test JVM's SparkContext but configured
  * only via the extensions class) runs the custom expressions in plain
  * SQL. `withExtensions` is the per-session equivalent of the
  * `spark.sql.extensions=graft.GraftExtensions` static conf (which only
  * applies at SparkContext creation and so can't be exercised in a shared
  * test JVM). The shared session is restored afterwards, never stopped. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injection enables the SQL surface") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[1]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = spark.sql(
        """SELECT ascii_fold('Café Ñandú') AS folded,
          |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
          |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
          |  l2_norm(array(3.0D, 4.0D)) AS norm,
          |  simhash64(array('a', 'b')) = simhash64(array('a', 'b')) AS stable
          |""".stripMargin).collect().head
      assert(row.getString(0) == "Cafe Nandu")
      assert(row.getDouble(1) == 1.0)
      assert(row.getDouble(2) == 11.0)
      assert(row.getDouble(3) == 5.0)
      assert(row.getBoolean(4))

      // the full signature/LSH surface resolves and agrees with the
      // Column-API expressions it mirrors
      val row2 = spark.sql(
        """SELECT
          |  word_shingles(array('a', 'b', 'c', 'a', 'b'), 2) AS sh,
          |  minhash_sig(array('x y', 'y z'), 4) AS sig,
          |  minhash_sig(array('x y', 'y z'), 4, 42L) AS sig_seeded,
          |  minhash_bands(minhash_sig(array('x y', 'y z'), 4), 2) AS bands,
          |  count_in_set(array('the', 'cat', 'the'), array('the', 'a')) AS n_stop,
          |  poly_fingerprint(array('ab', 'c')) AS fp,
          |  srp_bucket(array(1.0D, -2.0D), 4, 42L, 2) AS bucket,
          |  random_project(array(1.0D, -2.0D), 4, 7L, 2) AS projected
          |""".stripMargin).collect().head
      assert(row2.getSeq[String](0) == Seq("a b", "b c", "c a")) // distinct
      val sig = row2.getSeq[Long](1)
      assert(sig.length == 4 && sig == row2.getSeq[Long](2))
      assert(row2.getSeq[Long](3).length == 2)
      assert(row2.getLong(4) == 2L)
      // poly_fingerprint: ((0*31+97)*31+98) % p = 3105, (3105*131 + 99) % p
      assert(row2.getLong(5) == (3105L * 131L + 99L) % 1000000007L)
      locally {
        import spark.implicits._
        val viaColumn = Seq(Tuple1(Seq(1.0, -2.0))).toDF("v")
          .select(graft.functions.F.srpBucket(org.apache.spark.sql.functions.col("v"),
            4, 42L, 2)).collect().head.getLong(0)
        assert(row2.getLong(6) == viaColumn)
      }
      locally {
        val signs = graft.functions.RandomProject.signs(4, 2, 7L)
        val s = 1L << 20
        val want = (0 until 4).map(j => signs(2 * j) * s + signs(2 * j + 1) * (-2 * s))
        assert(row2.getSeq[Long](7) == want)
      }
      locally {
        val cc = spark.sql(
          "SELECT char_class_census('Ab1 .x') AS c").collect().head
          .getStruct(0)
        assert((0 until 6).map(cc.getLong) == Seq(6L, 3L, 1L, 1L, 1L, 0L))
      }
      // table function (round 18): the persisted-ANN probe from pure SQL.
      // Tiny 2-D index, full probe ⇒ exact: nearest to (1,0) is vec 1,
      // then vec 3 (cos √2/2 beats vec 2's 0).
      locally {
        import spark.implicits._
        val idx = java.nio.file.Files
          .createTempDirectory("graft-ext-tvf").toString + "/idx"
        val corpus = Seq(
          (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
          (3L, Seq(1f, 1f)), (4L, Seq(-1f, 0f)))
          .toDF("vec_id", "embedding")
        graft.operators.Ivf.buildIndex(spark, idx, corpus,
          trainOn = corpus, nlist = 2, iters = 1)
        val rows = spark.sql(
          s"""SELECT rank, neighbor_id
             |FROM graft_ann_topk('$idx', 2, 2,
             |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))
             |ORDER BY rank""".stripMargin)
          .as[(Long, Long)].collect().toSeq
        assert(rows == Seq((1L, 1L), (2L, 3L)), rows.toString)
        // non-literal arguments are refused loudly
        val e = intercept[Exception] {
          spark.sql(s"SELECT * FROM graft_ann_topk('$idx', 2, 2, " +
            "array(CAST(rand() AS FLOAT)))").collect()
        }
        assert(e.getMessage.contains("literal"), e.getMessage)
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
