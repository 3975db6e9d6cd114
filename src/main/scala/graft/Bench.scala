package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated query filter for profiling single queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Untimed warmup at the smallest scale factor: compiles every plan's
    // whole-stage codegen and JITs the hot loops, so the timed pass below
    // measures steady-state execution at the target sf, not Janino + JIT
    // compilation (which dominated cold first-query times ~10x).
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1") {
      val warmDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmDir).isDirectory) {
        val t0 = System.nanoTime()
        queries.foreach { case (_, fn) =>
          try fn(spark, warmDir).write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => () }
        }
        System.err.println(f"[bench] warmup pass (sf0.001): ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    }
    // Repeat > 1 separates JVM/codegen warmup from steady state (profiling
    // aid; the driver uses the default single pass).
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    var results = Map.empty[String, Double]
    for (r <- 1 to repeat) results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: forces evaluation of EVERY output column — a count()
      // would let the optimizer prune pure projections to a row count.
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s  (pass $r)")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
