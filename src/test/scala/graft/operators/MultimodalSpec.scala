package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    assert(media.schema("payload").dataType == BinaryType)
    val kinds = media.toDF().select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(media.count() == Tables.documents(spark, sf).count())
  }

  test("feature extraction is deterministic, unit-normalized, right-dimensional") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq)
    a.foreach { f =>
      assert(f.features.length == Multimodal.FeatureDim)
      assert(math.abs(f.features.sum - 1.0) < 1e-9) // histogram normalized
    }
  }

  test("featureSummary exposes stable columnar projections") {
    val out = Multimodal.featureSummary(spark, Tables.documents(spark, sf)).collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("feature_sum") - 1.0) < 1e-5)
      assert(r.getAs[Int]("n_bytes") > 0)
    }
  }
}
