package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.G mm_features).
  *
  * Media assets ride through the engine as opaque `binary` payloads with
  * a typed metadata struct — schema, partitioning and batch shape are the
  * real, tested parts. The decode step is a clearly marked STUB: this
  * container ships no image/audio codecs, so `decodeStub` computes a
  * deterministic fake feature vector (byte histogram + moments). A real
  * deployment swaps `decodeStub` for a codec call (JNI/ONNX/…) without
  * touching anything else: the `mapPartitions` boundary already gives
  * per-partition batching (amortized codec init, the Scala analog of a
  * Pandas-UDF batch), and features stay columnar downstream.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      n_bytes: Int, source: String)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Double])

  val FeatureDim = 16

  /** Synthesize a media table from `documents`: the text bytes stand in
    * for an encoded asset (deterministic, schema-faithful). */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    documents
      .select(
        col("doc_id").as("media_id"),
        // deterministic kind assignment, 3 modalities
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        length(col("text")).cast("int").as("n_bytes"),
        col("source"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic byte-histogram features standing in for
    * a real codec. Swap this function for the real decode. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) % FeatureDim) += 1.0
      i += 1
    }
    val n = math.max(1, payload.length).toDouble
    var j = 0
    while (j < FeatureDim) { hist(j) /= n; j += 1 }
    hist
  }

  /** Feature extraction over per-partition batches: codec init happens
    * once per partition (the expensive part for real decoders), rows
    * stream through without materializing the partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.n_bytes, decodeStub(r.payload))
      }
    }
  }

  /** Driver-contract projection: stable scalar summary of the features. */
  def featureSummary(spark: SparkSession, documents: DataFrame): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(documents))
    feats.toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        round(aggregate(col("features"), lit(0.0), (a, x) => a + x), 6)
          .as("feature_sum"),
        round(element_at(col("features"), 1), 6).as("f0"))
  }
}
