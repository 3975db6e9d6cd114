package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("zorderKey: hand-checked bit interleave") {
    // a=5 (101), b=3 (011), bits=3: z = a0 + 2*b0 + 4*a1 + 8*b1 + 16*a2
    //   = 1 + 2 + 0 + 8 + 16 = 27
    val z = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zorderKey(Seq(col("a"), col("b")), 3).as("z"))
      .as[Long].head()
    assert(z == 27L)
    // single column degenerates to the identity on the low bits
    val id = Seq(Tuple1(11L)).toDF("a")
      .select(Layout.zorderKey(Seq(col("a")), 4).as("z")).as[Long].head()
    assert(id == 11L)
  }

  test("zorderKey: quadrant property — low halves stay in the low curve range") {
    val df = (0L until 200L).map(i => (i * 131 % 32768, i * 31 % 32768))
      .toDF("a", "b")
    val zs = df.select(Layout.zorderKey(Seq(col("a"), col("b")), 16).as("z"))
      .as[Long].collect()
    // both dims < 2^15 => every interleaved bit >= 30 is zero
    assert(zs.forall(z => z >= 0 && z < (1L << 30)))
  }

  test("property: the Morton key is a bijection — deinterleave inverts it") {
    def deinterleave(z: Long, n: Int, bits: Int): Seq[Long] =
      (0 until n).map { ci =>
        (0 until bits).map(i => ((z >> (i * n + ci)) & 1L) << i).sum
      }
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val a = rnd.nextInt(1 << 16).toLong
      val b = rnd.nextInt(1 << 16).toLong
      val c = rnd.nextInt(1 << 16).toLong
      val z2 = Seq((a, b)).toDF("a", "b")
        .select(Layout.zorderKey(Seq(col("a"), col("b")), 16).as("z"))
        .as[Long].head()
      assert(deinterleave(z2, 2, 16) == Seq(a, b), s"2-col roundtrip $a,$b")
      val z3 = Seq((a, b, c)).toDF("a", "b", "c")
        .select(Layout.zorderKey(Seq(col("a"), col("b"), col("c")), 16).as("z"))
        .as[Long].head()
      assert(deinterleave(z3, 3, 16) == Seq(a, b, c), s"3-col roundtrip")
    }
  }

  test("zorderKeySql mirrors the Column form exactly") {
    val df = (0L until 100L).map(i => (i * 7919 % 65536, i * 104729 % 65536))
      .toDF("a", "b")
    df.createOrReplaceTempView("zt")
    val viaCol = df.select(Layout.zorderKey(Seq(col("a"), col("b")), 16).as("z"))
      .as[Long].collect().toSeq
    val viaSql = spark.sql(
      s"SELECT ${Layout.zorderKeySql(Seq("a", "b"), 16)} AS z FROM zt")
      .as[Long].collect().toSeq
    assert(viaCol == viaSql)
  }

  test("clusterByZOrder preserves content and orders files by curve range") {
    val df = (0L until 1000L).map(i => (i, i * 131 % 256, i * 31 % 256))
      .toDF("id", "x", "y")
    val clustered = Layout.clusterByZOrder(df, Seq("x", "y"), bits = 8,
      partitions = 4)
    assert(clustered.columns.toSeq == Seq("id", "x", "y"))
    assert(clustered.select("id").as[Long].collect().toSet ==
      (0L until 1000L).toSet)
    // partitions hold disjoint, ordered z-ranges (range partitioning)
    val ranges = clustered
      .withColumn("z", Layout.zorderKey(Seq(col("x"), col("y")), 8))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("p").select("lo", "hi").as[(Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "overlapping z ranges")
      case _ =>
    }
  }
}
