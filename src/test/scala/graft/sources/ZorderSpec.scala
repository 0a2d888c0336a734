package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSpec {

  test("zorder rewrite preserves content exactly") {
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val out = Lake.zorderWrite(src, "target/test_zorder_content",
      "l_orderkey", "l_partkey")
    assert(out.count() == src.count())
    assert(out.exceptAll(src).isEmpty && src.exceptAll(out).isEmpty)
  }

  test("zorder clusters BOTH dimensions' per-file ranges; a sort only one") {
    val src = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val files = 8

    def perFileRangeShare(df: org.apache.spark.sql.DataFrame, c: String): Double = {
      val g = df.agg((max(col(c)) - min(col(c))).cast("double")).head.getDouble(0)
      val per = df.withColumn("__f", input_file_name())
        .groupBy("__f")
        .agg(((max(col(c)) - min(col(c))).cast("double") / g).as("share"))
        .agg(avg("share")).head.getDouble(0)
      per
    }

    val z = Lake.zorderWrite(src, "target/test_zorder_files",
      "l_orderkey", "l_partkey", files = files)
    val zA = perFileRangeShare(z, "l_orderkey")
    val zB = perFileRangeShare(z, "l_partkey")

    // single-column sort baseline: leading dim clusters tightly, the
    // second dimension's per-file range stays ~the full domain
    src.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet("target/test_sorted_files")
    val s = spark.read.parquet("target/test_sorted_files")
    val sB = perFileRangeShare(s, "l_partkey")

    assert(zA < 0.7, s"zorder per-file l_orderkey range share $zA")
    assert(zB < 0.7, s"zorder per-file l_partkey range share $zB")
    assert(sB > 0.9, s"sorted baseline should NOT cluster l_partkey, got $sB")
  }

  test("zorder handles a constant column without dividing by zero") {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("a", "b")
    val out = Lake.zorderWrite(df, "target/test_zorder_const", "a", "b",
      files = 2)
    assert(out.count() == 3)
  }
}
