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

  // ---------------------------------------------------------------- WAV

  /** Decoded PCM audio: sample rate, source channel count, and the
    * MONO-mixed 16-bit samples (multi-channel frames average with
    * integer truncation — deterministic, no float resampling). */
  case class WavPcm(sampleRate: Int, channels: Int,
                    samples: Array[Short])

  /** REAL pure-JVM RIFF/WAVE PCM16 decoder — the codec swap-in the
    * decodeStub contract promised (r9): parses the RIFF container
    * (chunk walk with even-byte padding, not a fixed 44-byte assume),
    * accepts format 1 (PCM) at 16 bits/sample, little-endian, any
    * channel count, and returns None for anything malformed rather
    * than throwing — a curation pipeline meets truncated and
    * mislabeled assets as a matter of course, and a poison asset must
    * not kill the task. ~60 lines, zero external jars. */
  def decodeWav(bytes: Array[Byte]): Option[WavPcm] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = (u16(o).toLong | (u16(o + 2).toLong << 16)) & 0xFFFFFFFFL
    if (bytes.length < 12) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
      bytes(10) != 'V' || bytes(11) != 'E') return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, ch, rate, bits
    var data: Option[(Int, Int)] = None          // offset, byte length
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val sz = math.min(u32(off + 4), Int.MaxValue.toLong).toInt
      val body = off + 8
      if (id == "fmt " && body + 16 <= bytes.length)
        fmt = Some((u16(body), u16(body + 2), u32(body + 4).toInt,
          u16(body + 14)))
      else if (id == "data" && data.isEmpty)
        data = Some((body, math.max(0, math.min(sz, bytes.length - body))))
      // a declared size reaching past the buffer can only be the last
      // (truncated or malformed) chunk: stop the walk instead of
      // advancing — body + sz would overflow Int on a hostile size
      // (e.g. 0xFFFFFFF0), slip the loop guard as a negative offset,
      // and throw from the id read, violating the poison-asset
      // contract (returns None / keeps what was parsed, never throws)
      if (sz > bytes.length - body) off = bytes.length
      else off = body + sz + (sz & 1) // chunks pad to even offsets
    }
    (fmt, data) match {
      case (Some((1, ch, rate, 16)), Some((o, len)))
          if ch >= 1 && rate > 0 =>
        val frameBytes = 2 * ch
        val nFrames = len / frameBytes
        val mono = new Array[Short](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0L
          var c = 0
          while (c < ch) {
            val b = o + f * frameBytes + 2 * c
            acc += ((bytes(b) & 0xFF) | (bytes(b + 1) << 8)).toShort
            c += 1
          }
          mono(f) = (acc / ch).toShort
          f += 1
        }
        Some(WavPcm(rate, ch, mono))
      case _ => None
    }
  }

  /** Build a PCM16 mono/interleaved WAV byte array — the encoder twin
    * of [[decodeWav]], used by the synthetic media source and the
    * planted-file specs (a decoder verified only against its own
    * encoder is weak, so the spec ALSO hand-builds headers). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int = 8000,
                     channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def w32(o: Int, v: Long): Unit = { var i = 0; while (i < 4) {
      out(o + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 } }
    def w16(o: Int, v: Int): Unit = { out(o) = (v & 0xFF).toByte
      out(o + 1) = ((v >> 8) & 0xFF).toByte }
    def tag(o: Int, s: String): Unit = { var i = 0; while (i < 4) {
      out(o + i) = s.charAt(i).toByte; i += 1 } }
    tag(0, "RIFF"); w32(4, 36L + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16L); w16(20, 1); w16(22, channels)
    w32(24, sampleRate); w32(28, sampleRate.toLong * channels * 2)
    w16(32, channels * 2); w16(34, 16)
    tag(36, "data"); w32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      w16(44 + 2 * i, samples(i) & 0xFFFF); i += 1
    }
    out
  }

  /** Media source whose audio payloads are WELL-FORMED PCM16 WAVs: the
    * document text deterministically synthesizes the sample stream
    * (each byte maps to a signed 16-bit amplitude), so the contract
    * surface drives [[decodeWav]]'s REAL header-parse + little-endian
    * sample path — not the hex-pair stand-in — while staying exactly
    * reproducible on any engine. Non-audio kinds keep the raw-text
    * payload (their decoders are still stubs). */
  def wavMediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    mediaFromDocuments(documents).map { r =>
      if (r.kind != "audio") r
      else {
        val samples = new Array[Short](r.payload.length)
        var i = 0
        while (i < samples.length) {
          samples(i) = (((r.payload(i) & 0xFF) - 128) * 256).toShort
          i += 1
        }
        val wav = encodeWavPcm16(samples)
        r.copy(payload = wav, n_bytes = wav.length)
      }
    }
  }

  /** [[audioEnergy]] over REAL WAV payloads: decode via [[decodeWav]]
    * at the per-partition codec boundary, window the mono samples, RMS
    * on full-scale-normalized amplitude (|s|/32768 → silence threshold
    * is a fraction of full scale), per-asset rollup. Same output
    * schema as the stub path; undecodable payloads drop (counted
    * nowhere — a production pipeline would route them to a quarantine
    * sink, which dq_expect models elsewhere). Rows out of the flatMap
    * are (asset, window) — duration-proportional, never collected. */
  def audioEnergyWav(media: Dataset[MediaRow], frameSamples: Int = 64,
                     silenceRms: Double = 0.02): DataFrame = {
    implicit val enc =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
        Encoders.scalaDouble)
    media.filter(col("kind") === "audio")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodeWav(r.payload) match {
            case Some(w) if w.samples.nonEmpty =>
              w.samples.grouped(frameSamples).zipWithIndex.map {
                case (win, i) =>
                  var ss = 0.0
                  var j = 0
                  while (j < win.length) {
                    val v = win(j) / 32768.0; ss += v * v; j += 1
                  }
                  (r.media_id, i, math.sqrt(ss / win.length))
              }
            case _ => Iterator.empty
          }
        }
      }
      .toDF("media_id", "win", "rms")
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("rms") < silenceRms, 1L).otherwise(0L)).as("n_silent"),
        round(avg("rms"), 4).as("avg_rms"),
        round(max("rms"), 4).as("peak_rms"))
      .withColumn("silence_ratio",
        round(col("n_silent") / col("n_windows"), 4))
  }

  /** Driver-contract projection: [[audioEnergyWav]] — the REAL decode
    * path — over the WAV-synthesizing media source (r9; the hex-pair
    * stub path keeps its own spec as the fallback contract). */
  def audioEnergySummary(documents: DataFrame): DataFrame =
    audioEnergyWav(wavMediaFromDocuments(documents))

  /** AUDIO DECIMATION summary — the sample-rate-reduction pass every
    * audio curation pipeline runs before feature extraction (a 48 kHz
    * asset carries 3× the bytes of the 16 kHz a speech model ingests;
    * decimation with a boxcar anti-alias mean is the cheapest correct
    * downsample): decode the WAV, average each consecutive `factor`
    * samples (the trailing partial group averages its actual length),
    * and report per asset the in/out sample counts, the decimated RMS
    * on full-scale-normalized amplitude, and the energy RATIO vs the
    * original RMS — the aliasing audit number (a ratio far under 1
    * means the asset's energy lived above the new Nyquist and
    * decimation destroyed it).
    *
    * Same per-partition codec-boundary shape as [[audioEnergyWav]];
    * output is asset-bounded. The SQL twin replays the byte→sample
    * map and the integer group means exactly. */
  def audioDecimateSummary(documents: DataFrame, factor: Int = 4)
      : DataFrame = {
    implicit val enc =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
    wavMediaFromDocuments(documents)
      .filter(col("kind") === "audio")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodeWav(r.payload) match {
            case Some(w) if w.samples.nonEmpty =>
              val in = w.samples
              var ssIn = 0.0
              var i = 0
              while (i < in.length) {
                val v = in(i) / 32768.0; ssIn += v * v; i += 1
              }
              val out = in.grouped(factor).map { g =>
                var sum = 0L; var j = 0
                while (j < g.length) { sum += g(j); j += 1 }
                sum.toDouble / g.length
              }.toArray
              var ssOut = 0.0
              var k = 0
              while (k < out.length) {
                val v = out(k) / 32768.0; ssOut += v * v; k += 1
              }
              Iterator.single((r.media_id, in.length.toLong,
                out.length.toLong, math.sqrt(ssIn / in.length),
                math.sqrt(ssOut / out.length)))
            case _ => Iterator.empty
          }
        }
      }
      .toDF("media_id", "n_in", "n_out", "rms_in", "rms_out")
      .select(col("media_id"), col("n_in"), col("n_out"),
        round(col("rms_out"), 4).as("rms_out"),
        round(col("rms_out") / col("rms_in"), 4).as("energy_ratio"))
  }

  /** Decoded image: grayscale pixels row-major TOP-DOWN (the decoder
    * un-flips BMP's bottom-up row order). */
  case class BmpImage(width: Int, height: Int, gray: Array[Int])

  /** REAL pure-JVM 24-bit uncompressed BMP decoder — [[decodeWav]]'s
    * image twin (r9): parses BITMAPFILEHEADER + BITMAPINFOHEADER,
    * accepts biBitCount=24 / BI_RGB only, honors the 4-byte row
    * padding and the bottom-up (positive height) vs top-down (negative)
    * row order, reads pixels at the header's declared data offset
    * (not a fixed 54 assume), and returns None for anything malformed
    * rather than throwing — same poison-asset contract as the WAV
    * path. Grayscale = (r+g+b)/3 integer mean (our synthetic assets
    * write equal channels, so the mean is exact). */
  def decodeBmp(bytes: Array[Byte]): Option[BmpImage] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long =
      (u16(o).toLong | (u16(o + 2).toLong << 16)) & 0xFFFFFFFFL
    if (bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOff = u32(10)
    if (u32(14) != 40L) return None            // BITMAPINFOHEADER only
    val w = u32(18).toInt
    val hRaw = u32(22).toInt                    // signed: <0 = top-down
    if (u16(26) != 1 || u16(28) != 24) return None
    if (u32(30) != 0L) return None              // BI_RGB (uncompressed)
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || w > (1 << 20) || h > (1 << 20)) return None
    val rowSize = ((3 * w + 3) / 4) * 4
    if (dataOff < 54 || dataOff + rowSize.toLong * h > bytes.length)
      return None
    val gray = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val fileRow = if (bottomUp) h - 1 - y else y
      val base = dataOff.toInt + fileRow * rowSize
      var x = 0
      while (x < w) {
        val b = bytes(base + 3 * x) & 0xFF
        val g = bytes(base + 3 * x + 1) & 0xFF
        val r = bytes(base + 3 * x + 2) & 0xFF
        gray(y * w + x) = (r + g + b) / 3
        x += 1
      }
      y += 1
    }
    Some(BmpImage(w, h, gray))
  }

  /** Encoder twin of [[decodeBmp]]: standard bottom-up 24-bit BMP with
    * equal RGB channels from the gray array — used by the synthetic
    * media source and the planted-file specs (the specs ALSO
    * hand-build headers; an encoder-only-verified decoder is weak). */
  def encodeBmp24(width: Int, height: Int, gray: Array[Int])
      : Array[Byte] = {
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataLen = rowSize * height
    val out = new Array[Byte](54 + dataLen)
    def w32(o: Int, v: Long): Unit = { var i = 0; while (i < 4) {
      out(o + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 } }
    def w16(o: Int, v: Int): Unit = { out(o) = (v & 0xFF).toByte
      out(o + 1) = ((v >> 8) & 0xFF).toByte }
    out(0) = 'B'; out(1) = 'M'
    w32(2, 54L + dataLen); w32(10, 54L)
    w32(14, 40L); w32(18, width.toLong); w32(22, height.toLong)
    w16(26, 1); w16(28, 24); w32(30, 0L); w32(34, dataLen.toLong)
    var y = 0
    while (y < height) {
      val base = 54 + (height - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < width) {
        val g = (gray(y * width + x) & 0xFF).toByte
        out(base + 3 * x) = g; out(base + 3 * x + 1) = g
        out(base + 3 * x + 2) = g
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resample in the DECODED pixel grid — the real
    * resize the stride-over-encoded-bytes [[resizeStub]] stood in for:
    * out(x,y) ← in(⌊x·w/w'⌋, ⌊y·h/h'⌋). */
  def resizeNearest(img: BmpImage, w2: Int, h2: Int): BmpImage = {
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      val sy = y * img.height / h2
      var x = 0
      while (x < w2) {
        out(y * w2 + x) = img.gray(sy * img.width + x * img.width / w2)
        x += 1
      }
      y += 1
    }
    BmpImage(w2, h2, out)
  }

  /** Media source whose image payloads are WELL-FORMED 24-bit BMPs:
    * dims derive from the id (8+id%5 × 6+id%4) and each pixel's gray
    * level is a text byte at a stride-13 position — deterministic from
    * the document alone (the corpus is ASCII, so byte algebra ≡ char
    * algebra and any engine can replay the pixel values without
    * touching BMP bytes). Non-image kinds pass through. */
  def bmpMediaFromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    mediaFromDocuments(documents).map { r =>
      if (r.kind != "image" || r.payload.isEmpty) r
      else {
        val w = (8 + r.media_id % 5).toInt
        val h = (6 + r.media_id % 4).toInt
        val gray = Array.tabulate(w * h) { p =>
          r.payload((p * 13) % r.payload.length) & 0xFF
        }
        val bmp = encodeBmp24(w, h, gray)
        r.copy(payload = bmp, n_bytes = bmp.length)
      }
    }
  }

  /** Driver-contract surface for the REAL image path: encode → decode
    * → nearest-neighbor HALVE → checksum, per image asset. The decode
    * and resize run on actual BMP bytes at the per-partition codec
    * boundary; the output is pixel ALGEBRA (dims, encoded size, Σ gray
    * of the resized image) that an independent engine replays from the
    * deterministic synthesis without parsing a single byte — the
    * round-trip proves the codec, the checksum proves the pixels. */
  case class BmpSummary(media_id: Long, width: Int, height: Int,
                        out_w: Int, out_h: Int, bmp_bytes: Int,
                        checksum: Long)

  def bmpResizeSummary(documents: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[BmpSummary]
    bmpMediaFromDocuments(documents)
      .filter(col("kind") === "image")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          decodeBmp(r.payload).map { img =>
            val small = resizeNearest(img,
              math.max(1, img.width / 2), math.max(1, img.height / 2))
            var cs = 0L
            var i = 0
            while (i < small.gray.length) { cs += small.gray(i); i += 1 }
            BmpSummary(r.media_id, img.width, img.height, small.width,
              small.height, r.n_bytes, cs)
          }
        }
      }
      .toDF()
  }

  /** Perceptual-hash near-dup detection for media payloads: each asset
    * gets a 60-bit content hash whose Hamming distance tracks payload
    * similarity, and pairs within `maxHamming` surface through the SAME
    * banded machinery as text SimHash (4×16-bit chunks, identical-
    * sketch collapse, bucket caps) — so media dedup scales exactly like
    * text dedup: sketches row-local in the scan, only 8-byte chunk keys
    * shuffle.
    *
    * The hash derivation is the STUB stand-in (same swap-point contract
    * as decodeStub): two-poly SimHash (r12 — SQL-replayable, the
    * mm_phash oracle flip) over sliding byte-window shingles of the
    * base64-armored payload — near-identical payloads agree on most
    * windows, so their sketches land within a small Hamming distance. A
    * real deployment swaps this column for a decoded-domain DCT pHash
    * (image) or chromaprint (audio); banding, capping, pairing and the
    * CC/canonical stages downstream are unchanged. */
  def phashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    import graft.plans.{ShinglePolyHashes, SimHash60FromHashes}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // base64 then re-space into fixed 4-char (3-byte) tokens: the shingle
    // pipeline is word-oriented, and arbitrary binary has no delimiters.
    // Spark's base64() MIME-chunks with \r\n every 76 chars — strip to
    // canonical RFC 4648 (what DuckDB's to_base64 emits) so the oracle
    // replays the exact token stream
    val asDocs = media.select(
      col("media_id").as("doc_id"),
      regexp_replace(regexp_replace(base64(col("payload")), "[\\r\\n]", ""),
        "(.{4})", "$1 ").as("text"))
    // 60-bit two-poly SimHash (r12 flip): the sketch column is the
    // documented swap point; the poly family makes the sketch — and
    // with it the whole banded pair set — DuckDB-replayable. The r13
    // oracle (OracleSql.mmPhash) replays the CAPPED BANDED pairing
    // itself — band keys, bucket cap, hamming re-check — not a
    // brute-force hamming sweep, so engine and twin share the exact
    // candidate-generation path end to end.
    val sk = ColumnBridge.column(SimHash60FromHashes(
      ShinglePolyHashes(ColumnBridge.expression(col("text")), 3)))
    val sims = Scale.fanOut(asDocs, Seq("doc_id"))
      .select(col("doc_id"), sk.as("sim"))
      .filter(col("sim").isNotNull)
    SketchDedup.simhashPairsFromSims(sims, maxHamming = maxHamming)
      .select(col("d1").as("m1"), col("d2").as("m2"),
        col("hamming").cast("long").as("hamming"))
  }

  /** Driver-contract projection: media near-dup pairs on the synthetic
    * media table (whose payloads inherit the documents' near-dups). */
  def phashSummary(documents: DataFrame, maxHamming: Int = 3): DataFrame =
    phashPairs(mediaFromDocuments(documents).toDF(), maxHamming)

  /** SCENE-CUT detection over sampled video frames — the shot-boundary
    * pass a video curation pipeline runs before captioning/sampling
    * (one keyframe per SHOT beats fixed-stride frames): consecutive
    * sampled frames get the same 60-bit content sketch family as
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
    import graft.plans.{ShinglePolyHashes, SimHash60FromHashes}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.expressions.Window
    // strip base64()'s MIME \r\n chunking → canonical RFC 4648 (see
    // phashPairs — keeps the oracle's to_base64 replay exact)
    val txt = regexp_replace(
      regexp_replace(base64(col("frame")), "[\\r\\n]", ""), "(.{4})", "$1 ")
    // 60-bit two-poly SimHash (r12 flip): the sketch column was always
    // the documented swap point, and the poly family makes frame
    // sketches, hamming lags and cut counts all DuckDB-replayable —
    // mm_scenecut is hash-checked end to end (oracleSql entry)
    val sk = ColumnBridge.column(SimHash60FromHashes(
      ShinglePolyHashes(ColumnBridge.expression(txt), 3)))
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    sampleFrames(media, frameBytes, nSample)
      .withColumn("sk", sk)
      .withColumn("prev_sk", lag("sk", 1).over(w))
      .filter(col("prev_sk").isNotNull)
      .withColumn("hamming",
        bit_count(col("sk").bitwiseXOR(col("prev_sk"))).cast("long"))
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
