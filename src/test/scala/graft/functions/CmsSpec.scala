package graft.functions

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {

  import spark.implicits._

  private val depth = 5
  private val width = 2048

  test("cms estimates are one-sided: exact <= estimate <= exact + eps*N") {
    // zipf-ish synthetic: item i appears ~1000/i times; exact counts
    // are recomputed HERE — the operator is sketch-only and never
    // collects a value-cardinality frame
    val rows = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"item_$i"))
    val df = rows.toDF("v")
    val n = rows.size
    val exact = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val out = Stats.cmsFrequencies(df, "v", exact.keys.toSeq.sorted,
      depth, width).collect()
    assert(out.length == exact.size)
    val eps = math.E / width
    out.foreach { r =>
      val (v, est) = (r.getAs[String]("value"), r.getAs[Long]("estimate"))
      assert(est >= exact(v), s"$v: CMS can never undercount")
      assert(est <= exact(v) + math.ceil(3 * eps * n).toLong,
        s"$v: est=$est exact=${exact(v)} blows the eps bound")
    }
  }

  test("sketches merge cell-wise: sketch(A union B) == merge(sketch(A), sketch(B))") {
    val a = (1 to 500).map(i => s"k${i % 37}").toDF("v")
    val b = (1 to 700).map(i => s"k${i % 53}").toDF("v")
    def sk(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(CmsAggregator.cms(depth, width)(xxhash64(col("v"))).as("sk"))
        .head().getAs[scala.collection.Seq[Long]]("sk").toArray
    val whole = sk(a.unionAll(b))
    val merged = CmsAggregator.merge(sk(a), sk(b))
    assert(whole.sameElements(merged),
      "per-partition sketches must add to the whole-corpus sketch")
  }

  test("sketch is partitioning-invariant (deterministic seeds)") {
    val df = (1 to 1000).map(i => s"t${i % 19}").toDF("v")
    def sk(d: org.apache.spark.sql.DataFrame): Array[Long] =
      d.agg(CmsAggregator.cms(depth, width)(xxhash64(col("v"))).as("sk"))
        .head().getAs[scala.collection.Seq[Long]]("sk").toArray
    assert(sk(df).sameElements(sk(df.repartition(13))))
  }

  test("cmsFrequencies on a low-cardinality column is exact in practice") {
    val ev = graft.Tables.events(spark, sf)
    val exact = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    val out = Stats.cmsFrequencies(ev, "event_type",
      exact.keys.toSeq.sorted, depth, width).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("estimate") == exact(r.getAs[String]("value")),
        s"5 keys in 2048 cells should not collide: $r")
    }
    // an absent probe reads hash-collision mass only (≥ 0, ≤ εN bound)
    val ghost = Stats.cmsFrequencies(ev, "event_type", Seq("__absent__"),
      depth, width).collect().head.getAs[Long]("estimate")
    assert(ghost >= 0L && ghost <= math.ceil(
      3 * math.E / width * ev.count()).toLong, s"ghost=$ghost")
  }
}
