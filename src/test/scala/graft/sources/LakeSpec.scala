package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {

  test("compact collapses a fragmented lake dir without losing rows") {
    val dir = s"/root/repo/target/graft_io/compact_test"
    val li = Tables.lineitem(spark, sf)
    li.repartition(64).write.mode("overwrite").parquet(dir) // fragment: 64 files
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles > 30)
    val expected = li.count()
    val files = Lake.compact(spark, dir, targetRowsPerFile = expected / 2 + 1)
    assert(files == 2)
    assert(parquetFiles <= 2)
    assert(spark.read.parquet(dir).count() == expected)
  }

  test("stratified sample respects per-stratum proportions roughly") {
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.Stats.stratifiedSample(docs, "lang",
      Map("en" -> 0.5, "fr" -> 0.0), seed = 42)
    val langs = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!langs.contains("fr"))
    assert(!langs.keySet.exists(l => l != "en")) // unlisted strata default 0
    val enTotal = docs.filter(col("lang") === "en").count()
    assert(langs.getOrElse("en", 0L) > 0 && langs("en") < enTotal)
  }
}
