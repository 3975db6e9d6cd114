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
