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

  /** Frame sampling for video payloads: the payload is treated as a
    * sequence of fixed-size encoded frames (STUB stand-in for a real
    * demuxer — same swap-point contract as decodeStub) and up to
    * `nSample` frames are taken at evenly spaced indices. The Spark-side
    * substance is the shape: one output row per sampled frame, the
    * payload sliced ROW-LOCALLY via substr on the binary column — pure
    * codegen'd Columns, no shuffle, no UDF; a real demuxer replaces the
    * fixed-stride slicing only. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
                   nSample: Int = 4): DataFrame = {
    val nFrames = ceil(col("n_bytes") / lit(frameBytes.toDouble)).cast("int")
    media.filter(col("kind") === "video" && col("n_bytes") > 0)
      .withColumn("__n", nFrames)
      .withColumn("__take", least(lit(nSample), col("__n")))
      .withColumn("frame_idx", explode(transform(
        sequence(lit(0), col("__take") - 1),
        i => floor(i * col("__n") / col("__take")).cast("int"))))
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1,
          lit(frameBytes)).as("frame"))
  }

  /** STUB resampler — stride-samples bytes down to `targetBytes`,
    * standing in for pixel-grid resampling. Swap for a real codec. */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] =
    if (payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        out(i) = payload((i.toLong * payload.length / targetBytes).toInt)
        i += 1
      }
      out
    }

  /** Resize over per-partition batches (same amortized-codec-init
    * boundary as extractFeatures); metadata follows the new payload. */
  def resizeMedia(media: Dataset[MediaRow], targetBytes: Int = 64): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map { r =>
        val p = resizeStub(r.payload, targetBytes)
        r.copy(payload = p, n_bytes = p.length)
      }
    }
  }

  /** Driver-contract projection of sampleFrames: md5 of each sampled
    * frame — a stable scalar stand-in for the binary frame payload. */
  def frameSummary(documents: DataFrame): DataFrame =
    sampleFrames(mediaFromDocuments(documents).toDF())
      .select(col("media_id"), col("frame_idx"),
        md5(col("frame")).as("frame_md5"))

  /** Driver-contract projection of resizeMedia: byte counts before and
    * after plus a payload digest — the stable scalar view of the resize
    * plumbing (stub resampler, real batching boundary). */
  def resizeSummary(documents: DataFrame, targetBytes: Int = 64): DataFrame = {
    val media = mediaFromDocuments(documents)
    resizeMedia(media, targetBytes).toDF()
      .join(media.toDF().select(col("media_id"),
        col("n_bytes").as("orig_bytes")), "media_id")
      .select(col("media_id"), col("kind"), col("orig_bytes"), col("n_bytes"),
        md5(col("payload")).as("payload_md5"))
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

  /** Windowed AUDIO energy + silence detection — the VAD-shaped pass an
    * audio curation pipeline runs before transcription (drop silent
    * assets, trim dead air). The payload is read as unsigned 8-bit PCM
    * centered at 128 (the STUB decode — a real codec swaps in at the
    * hex-pair step only, same contract as decodeStub), cut into
    * `frameBytes`-sample windows ROW-LOCALLY, and each window scores
    * RMS energy; per asset: window count, silent-window share, mean and
    * peak RMS.
    *
    * Spark shape: explode to one row per window (rows ∝ duration), the
    * window slice is `substr` on the binary column, and the RMS sum is
    * an `aggregate` HOF over the window's hex pairs — pure Columns end
    * to end, no UDF, no shuffle until the per-asset rollup (map-side
    * combined). The hex-pair decode keeps byte math engine-portable. */
  def audioEnergy(media: DataFrame, frameBytes: Int = 64,
                  silenceRms: Double = 4.0): DataFrame = {
    val framed = media.filter(col("kind") === "audio" && col("n_bytes") > 0)
      .withColumn("__nw",
        ceil(col("n_bytes") / lit(frameBytes.toDouble)).cast("int"))
      .withColumn("win", explode(sequence(lit(0), col("__nw") - 1)))
      .withColumn("__hex", hex(col("payload")
        .substr(col("win") * frameBytes + 1, lit(frameBytes))))
    val nS = (length(col("__hex")) / 2).cast("int")
    val sumSq = aggregate(
      sequence(lit(1), nS), lit(0.0),
      (acc, i) => acc + pow(
        conv(col("__hex").substr(i * 2 - 1, lit(2)), 16, 10)
          .cast("double") - 128.0, 2))
    framed
      .withColumn("rms", sqrt(sumSq / nS))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("rms") < silenceRms, 1L).otherwise(0L)).as("n_silent"),
        round(avg("rms"), 4).as("avg_rms"),
        round(max("rms"), 4).as("peak_rms"))
      .withColumn("silence_ratio",
        round(col("n_silent") / col("n_windows"), 4))
  }

  /** Driver-contract projection of [[audioEnergy]] over the synthesized
    * media table's audio slice. */
  def audioEnergySummary(documents: DataFrame): DataFrame =
    audioEnergy(mediaFromDocuments(documents).toDF())

  /** Perceptual-hash near-dup detection for media payloads: each asset
    * gets a 64-bit content hash whose Hamming distance tracks payload
    * similarity, and pairs within `maxHamming` surface through the SAME
    * banded machinery as text SimHash (4×16-bit chunks, identical-
    * sketch collapse, bucket caps) — so media dedup scales exactly like
    * text dedup: sketches row-local in the scan, only 8-byte chunk keys
    * shuffle.
    *
    * The hash derivation is the STUB stand-in (same swap-point contract
    * as decodeStub): SimHash over sliding byte-window shingles of the
    * base64-armored payload — near-identical payloads agree on most
    * windows, so their sketches land within a small Hamming distance. A
    * real deployment swaps this column for a decoded-domain DCT pHash
    * (image) or chromaprint (audio); banding, capping, pairing and the
    * CC/canonical stages downstream are unchanged. */
  def phashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    // base64 then re-space into fixed 4-char (3-byte) tokens: the shingle
    // pipeline is word-oriented, and arbitrary binary has no delimiters
    val asDocs = media.select(
      col("media_id").as("doc_id"),
      regexp_replace(base64(col("payload")), "(.{4})", "$1 ").as("text"))
    SketchDedup.simhashPairs(asDocs, n = 3, maxHamming = maxHamming)
      .select(col("d1").as("m1"), col("d2").as("m2"), col("hamming"))
  }

  /** Driver-contract projection: media near-dup pairs on the synthetic
    * media table (whose payloads inherit the documents' near-dups). */
  def phashSummary(documents: DataFrame, maxHamming: Int = 3): DataFrame =
    phashPairs(mediaFromDocuments(documents).toDF(), maxHamming)

  /** SCENE-CUT detection over sampled video frames — the shot-boundary
    * pass a video curation pipeline runs before captioning/sampling
    * (one keyframe per SHOT beats fixed-stride frames): consecutive
    * sampled frames get the same 64-bit content sketch family as
    * [[phashPairs]] (stub stand-in for a decoded-domain pHash — the
    * swap point is the sketch column only), and a transition whose
    * sketch Hamming distance ≥ `cutHamming` is a cut. Per asset:
    * transition count, cut count, mean/peak inter-frame distance.
    *
    * Spark shape: frames are [[sampleFrames]]' row-local slices; the
    * sketch is the codegen'd SimHash expression; adjacency is ONE lag
    * window keyed by asset (frames-per-asset-sized partitions);
    * distance is `bit_count(xor)` — no pair join anywhere. */
  def sceneCuts(media: DataFrame, frameBytes: Int = 256, nSample: Int = 8,
                cutHamming: Int = 12): DataFrame = {
    import graft.plans.{ShingleHashes, SimHashFromHashes}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.expressions.Window
    val txt = regexp_replace(base64(col("frame")), "(.{4})", "$1 ")
    val sk = ColumnBridge.column(SimHashFromHashes(
      ShingleHashes(ColumnBridge.expression(txt), 3)))
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    sampleFrames(media, frameBytes, nSample)
      .withColumn("sk", sk)
      .withColumn("prev_sk", lag("sk", 1).over(w))
      .filter(col("prev_sk").isNotNull)
      .withColumn("hamming",
        bit_count(col("sk").bitwiseXOR(col("prev_sk"))))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_transitions"),
        sum(when(col("hamming") >= cutHamming, 1L).otherwise(0L))
          .as("n_cuts"),
        round(avg("hamming"), 4).as("avg_hamming"),
        max("hamming").as("peak_hamming"))
  }

  /** Driver-contract projection of [[sceneCuts]] over the synthesized
    * media table's video slice. */
  def sceneCutSummary(documents: DataFrame): DataFrame =
    sceneCuts(mediaFromDocuments(documents).toDF())

  case class InferredRow(media_id: Long, kind: String, batch_size: Int,
                         score: Double)

  /** BATCHED model inference over media — the GPU/accelerator serving
    * shape (a model call amortizes over a batch; calling it per row
    * throws away 10-100× throughput): `mapPartitions` + `grouped(
    * batchSize)` turns each partition's iterator into full `batchSize`
    * slices (only the partition tail runs short), the model executes
    * once per SLICE, and every output row records the batch it rode in
    * — the audit column that makes the batching testable. The model is
    * the contract-sanctioned STUB (deterministic payload moment); a
    * real deployment swaps `stubModel` for an ONNX/Triton/JNI session
    * created ONCE per partition (that init amortization is exactly what
    * the mapPartitions boundary buys — same swap-point contract as
    * decodeStub). Lazy iterators end-to-end: a partition never
    * materializes beyond one batch. */
  def batchInfer(media: DataFrame, batchSize: Int = 32): Dataset[InferredRow] = {
    implicit val enc = Encoders.product[InferredRow]
    implicit val encIn = Encoders.product[MediaRow]
    // stub model: one "forward pass" per batch — mean payload byte per
    // row, deterministic and cheap (the swap point is this function)
    def stubModel(batch: Seq[MediaRow]): Seq[Double] =
      batch.map(r =>
        if (r.payload.isEmpty) 0.0
        else math.rint(r.payload.map(_ & 0xff).sum.toDouble /
          r.payload.length * 1e4) / 1e4)
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val scores = stubModel(batch)
        batch.zip(scores).map { case (r, s) =>
          InferredRow(r.media_id, r.kind, batch.size, s)
        }
      }
    }
  }

  /** Driver-contract projection of [[batchInfer]]: per-kind score
    * rollup plus the batch-shape audit (full batches vs tails). */
  def batchInferSummary(documents: DataFrame,
                        batchSize: Int = 32): DataFrame = {
    val inf = batchInfer(
      mediaFromDocuments(documents).toDF().repartition(8, col("media_id")),
      batchSize)
    inf.toDF().groupBy("kind")
      .agg(count(lit(1)).as("n"),
        round(avg("score"), 4).as("mean_score"),
        sum(when(col("batch_size") === batchSize, 1L).otherwise(0L))
          .as("rows_in_full_batches"))
  }
}
