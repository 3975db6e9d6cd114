package graft

class GraftConfSpec extends SparkSpecBase {

  test("scale profile applies runtime confs and sizes shuffle partitions") {
    val priorShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val priorOverwrite = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      GraftConf.applyScaleProfile(spark)
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "dynamic")
      assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ==
        GraftConf.shufflePartitionsFor(spark.sparkContext.defaultParallelism))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", priorShuffle)
      priorOverwrite match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
