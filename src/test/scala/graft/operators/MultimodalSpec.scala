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

  test("sampleFrames slices the payload row-locally at even strides") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).toDF()
    val frames = Multimodal.sampleFrames(media, frameBytes = 256, nSample = 4)
      .collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.getAs[Long]("media_id"))
    val payloads = media.filter(org.apache.spark.sql.functions.col("kind") === "video")
      .collect().map(r => r.getAs[Long]("media_id") -> r.getAs[Array[Byte]]("payload")).toMap
    byMedia.foreach { case (id, fs) =>
      assert(fs.length <= 4)
      fs.foreach { f =>
        val idx = f.getAs[Int]("frame_idx")
        val frame = f.getAs[Array[Byte]]("frame")
        val expected = payloads(id).slice(idx * 256, idx * 256 + 256)
        assert(frame.sameElements(expected), s"frame $idx of media $id is not the payload slice")
      }
      // evenly spaced and strictly increasing
      val idxs = fs.map(_.getAs[Int]("frame_idx")).sorted
      assert(idxs.distinct.length == idxs.length)
    }
  }

  test("resizeMedia bounds payloads and keeps metadata consistent") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))
    val resized = Multimodal.resizeMedia(media, targetBytes = 64).collect()
    resized.foreach { r =>
      assert(r.payload.length <= 64)
      assert(r.n_bytes == r.payload.length)
    }
    // deterministic
    val again = Multimodal.resizeMedia(media, targetBytes = 64).collect()
    assert(resized.map(_.payload.toSeq).toSeq == again.map(_.payload.toSeq).toSeq)
  }

  test("featureSummary exposes stable columnar projections") {
    val out = Multimodal.featureSummary(spark, Tables.documents(spark, sf)).collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("feature_sum") - 1.0) < 1e-5)
      assert(r.getAs[Int]("n_bytes") > 0)
    }
  }

  test("resizeSummary reports shrunk payloads against original sizes") {
    val out = Multimodal.resizeSummary(Tables.documents(spark, sf), 64).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("n_bytes") <= 64)
      assert(r.getAs[Int]("n_bytes") <= r.getAs[Int]("orig_bytes"))
      assert(r.getAs[String]("payload_md5").length == 32)
    }
  }

  test("audioEnergy: silent and loud PCM windows score exact RMS; silence flagged") {
    import spark.implicits._
    // 8-bit PCM centered at 128, frameBytes=4: window RMS is exact
    val silent = Array.fill(4)(128.toByte)                 // rms 0
    val loud = Array[Byte](28.toByte, 228.toByte, 28.toByte, 228.toByte) // |dev|=100 → rms 100
    val mid = Array.fill(4)(131.toByte)                    // rms 3 (< threshold 4 → silent)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", silent ++ loud, 8, "s"),
      Multimodal.MediaRow(2L, "audio", mid ++ loud ++ loud, 12, "s"),
      Multimodal.MediaRow(3L, "video", loud, 4, "s") // wrong kind: excluded
    ).toDF()
    val out = Multimodal.audioEnergy(media, frameBytes = 4, silenceRms = 4.0)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(!out.contains(3L))
    val a = out(1L)
    assert(a.getAs[Long]("n_windows") == 2 && a.getAs[Long]("n_silent") == 1)
    assert(a.getAs[Double]("avg_rms") == 50.0 &&
      a.getAs[Double]("peak_rms") == 100.0)
    assert(a.getAs[Double]("silence_ratio") == 0.5)
    val b = out(2L)
    assert(b.getAs[Long]("n_windows") == 3 && b.getAs[Long]("n_silent") == 1)
    assert(b.getAs[Double]("peak_rms") == 100.0)
    // ragged tail: a 6-byte payload gets a 2-sample second window, RMS
    // still exact over the actual samples
    val ragged = Seq(Multimodal.MediaRow(9L, "audio",
      silent ++ Array[Byte](28.toByte, 228.toByte), 6, "s")).toDF()
    val r9 = Multimodal.audioEnergy(ragged, frameBytes = 4).collect().head
    assert(r9.getAs[Long]("n_windows") == 2 &&
      r9.getAs[Double]("peak_rms") == 100.0)
  }

  test("decodeWav: hand-built RIFF headers decode; malformed payloads return None") {
    // hand-assembled 44-byte header + 4 mono PCM16 samples — NOT built
    // with encodeWavPcm16, so the decoder is checked against the spec,
    // not against its own encoder
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Long) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val samples = Seq(1000, -1000, 32767, -32768)
    val hand: Array[Byte] =
      "RIFF".getBytes ++ le32(36 + 8) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(8) ++ samples.flatMap(le16(_)).toArray
    val w = Multimodal.decodeWav(hand).get
    assert(w.sampleRate == 8000 && w.channels == 1)
    assert(w.samples.toSeq == Seq[Short](1000, -1000, 32767, -32768))
    // a LIST chunk before data must be walked over, not tripped on
    val withList: Array[Byte] =
      "RIFF".getBytes ++ le32(36 + 12 + 8) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "LIST".getBytes ++ le32(4) ++ "INFO".getBytes ++
      "data".getBytes ++ le32(8) ++ samples.flatMap(le16(_)).toArray
    assert(Multimodal.decodeWav(withList).get.samples.length == 4)
    // stereo mixes to mono by integer mean
    val st: Array[Byte] =
      "RIFF".getBytes ++ le32(36 + 8) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
      le32(32000) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(8) ++
      Seq(100, 300, -100, -301).flatMap(le16(_)).toArray
    assert(Multimodal.decodeWav(st).get.samples.toSeq ==
      Seq[Short](200, -200), "integer mean, truncation toward zero")
    // malformed: wrong magic, truncated, 8-bit, float format → None
    assert(Multimodal.decodeWav("not a wav at all".getBytes).isEmpty)
    assert(Multimodal.decodeWav(hand.take(30)).isEmpty)
    val eightBit = hand.clone(); eightBit(34) = 8
    assert(Multimodal.decodeWav(eightBit).isEmpty)
    val floatFmt = hand.clone(); floatFmt(20) = 3
    assert(Multimodal.decodeWav(floatFmt).isEmpty)
    // round-trip through the encoder twin
    val rt = Multimodal.decodeWav(Multimodal.encodeWavPcm16(
      samples.map(_.toShort).toArray, 44100)).get
    assert(rt.sampleRate == 44100 &&
      rt.samples.toSeq == samples.map(_.toShort))
  }

  test("audioEnergyWav: planted loud/silent WAV scores exact RMS through the real decoder") {
    import spark.implicits._
    // 128 samples: 64 at constant ±8192 amplitude (RMS = 0.25 of full
    // scale exactly), then 64 of silence — with frameSamples=64 that is
    // one loud window and one silent window
    val loud = Array.tabulate[Short](64)(i =>
      (if (i % 2 == 0) 8192 else -8192).toShort)
    val wav = Multimodal.encodeWavPcm16(loud ++ Array.fill[Short](64)(0))
    val junk = "RIFFnot really a wav".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", wav, wav.length, "s"),
      Multimodal.MediaRow(2L, "audio", junk, junk.length, "s"),
      Multimodal.MediaRow(3L, "image", wav, wav.length, "s")).toDS()
    val out = Multimodal.audioEnergyWav(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out.keySet == Set(1L),
      "undecodable audio drops; non-audio kinds never enter")
    val r = out(1L)
    assert(r.getAs[Long]("n_windows") == 2 &&
      r.getAs[Long]("n_silent") == 1)
    assert(r.getAs[Double]("peak_rms") == 0.25,
      s"constant ±8192 is exactly quarter full scale: $r")
    assert(r.getAs[Double]("silence_ratio") == 0.5)
    // the contract surface: synthesized WAVs decode end-to-end
    val docs = Seq((1L, "hello wav world", "web"), (4L, "abc", "web"))
      .toDF("doc_id", "text", "source")
    val surf = Multimodal.audioEnergySummary(docs).collect()
    assert(surf.length == 2, "doc_id%3==1 (1 and 4) are the audio kinds")
    assert(surf.forall(_.getAs[Long]("n_windows") == 1L))
  }

  test("sceneCuts: one planted shot boundary, zero intra-shot distance") {
    import spark.implicits._
    // video = 4 identical A-frames then 4 identical B-frames (64 B each):
    // 7 transitions, exactly ONE with nonzero sketch distance (the cut)
    val a = "A" * 64; val b = "qz7!kw9#mv2$xr5%" * 4
    val payload = (a * 4 + b * 4).getBytes("UTF-8")
    val media = Seq(Multimodal.MediaRow(1L, "video", payload,
      payload.length, "s")).toDF()
    val out = Multimodal.sceneCuts(media, frameBytes = 64, nSample = 8)
      .collect().head
    assert(out.getAs[Long]("n_transitions") == 7)
    assert(out.getAs[Long]("n_cuts") == 1,
      s"expected exactly the A→B boundary: $out")
    assert(out.getAs[Long]("peak_hamming") >= 12L)
    // a static video (all frames identical) has zero cuts everywhere
    val still = Seq(Multimodal.MediaRow(2L, "video",
      (a * 8).getBytes("UTF-8"), a.length * 8, "s")).toDF()
    val s0 = Multimodal.sceneCuts(still, frameBytes = 64, nSample = 8)
      .collect().head
    assert(s0.getAs[Long]("n_cuts") == 0 &&
      s0.getAs[Double]("avg_hamming") == 0.0)
  }

  test("skewKurt: symmetric data has ~0 skew; moments are finite per group") {
    import spark.implicits._
    val sym = (1 to 101).map(i => ("g", i.toDouble)).toDF("k", "x")
    val s = Stats.skewKurt(sym, "k", "x").collect().head
    assert(math.abs(s.getAs[Double]("skew")) < 1e-6)
    // uniform distribution has negative excess kurtosis (~ -1.2)
    assert(s.getAs[Double]("kurt") < 0.0)
    Stats.skewKurt(Tables.lineitem(spark, sf), "l_returnflag", "l_quantity")
      .collect().foreach { r =>
        assert(!r.getAs[Double]("skew").isNaN && !r.getAs[Double]("kurt").isNaN)
      }
    // exact hand values on {1,2,3}: m2=2/3, m3=0, m4=2/3 → skew 0,
    // excess kurt (2/3)/(4/9) − 3 = −1.5 — and the decimal power-sum
    // path is partitioning-invariant bit-for-bit (r8 oracle flip)
    val tiny = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("k", "x")
    val t = Stats.skewKurt(tiny, "k", "x").collect().head
    assert(t.getAs[Double]("skew") == 0.0 &&
      t.getAs[Double]("kurt") == -1.5)
    val big = (1 to 500).map(i => ("g", (i % 37) * 0.37)).toDF("k", "x")
    assert(Stats.skewKurt(big, "k", "x").collect().toSeq ==
      Stats.skewKurt(big.repartition(11), "k", "x").collect().toSeq)
  }

  test("phashPairs finds exact copies and near-identical payloads, not unrelated ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf)).toDF()
      .select("media_id", "payload")
    // plant: 9001 = exact copy of id 1's payload; 9002 = id 1's payload
    // with a one-byte corruption. WHICH byte matters: a single flipped
    // byte rewrites ~5 shingles and the sketch moves only where bit
    // votes were marginal, so the hamming of any FIXED position is a
    // data-luck draw (the r12 poly-family flip measured position L/2 at
    // d=6 on sf0.001 where XXH64 happened to give ≤3). The spec
    // therefore picks the first stride position whose measured distance
    // is within the radius — near-dup-within-radius IS detected is the
    // operator's contract; which corruptions stay within radius is not.
    val base = media.filter(col("media_id") === 1L)
      .head().getAs[Array[Byte]]("payload")
    import graft.plans.{ShinglePolyHashes, SimHash60FromHashes}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val skCol = ColumnBridge.column(SimHash60FromHashes(ShinglePolyHashes(
      ColumnBridge.expression(regexp_replace(regexp_replace(
        base64(col("payload")), "[\\r\\n]", ""), "(.{4})", "$1 ")), 3)))
    val cands = (0 until base.length by math.max(1, base.length / 16))
      .map { pos =>
        val c = base.clone; c(pos) = '#'.toByte; (pos.toLong, c) }
    val sks = cands.toDF("pos", "payload").withColumn("sk", skCol)
      .collect().map(r => r.getAs[Long]("pos") -> r.getAs[Long]("sk")).toMap
    val baseSk = Seq((0L, base)).toDF("pos", "payload")
      .withColumn("sk", skCol).head().getAs[Long]("sk")
    val inRadius = cands.map(_._1).find(p =>
      java.lang.Long.bitCount(sks(p) ^ baseSk) <= 3 && sks(p) != baseSk)
    assert(inRadius.nonEmpty,
      "no single-byte corruption lands within hamming 3 — implausible")
    // locality floor (r12 ADVICE): picking the first in-radius position
    // must not be the ONLY thing the sketch family clears — a family
    // whose locality collapsed would still pass the find() above by
    // luck. Require a minimum fraction of ALL probed positions to stay
    // within a LOOSE radius (8 of 60 bits): one corrupted byte rewrites
    // ~5 of ~len/3 shingles, so the vast majority of bit votes must
    // hold. Measured on the poly60 family at sf0.001: all 16 positions
    // land at hamming ≤ 6.
    val within8 = cands.map(_._1)
      .count(p => java.lang.Long.bitCount(sks(p) ^ baseSk) <= 8)
    assert(within8 * 2 >= cands.length,
      s"sketch locality regressed: only $within8/${cands.length} " +
        "single-byte corruptions stay within hamming 8")
    val corrupted = base.clone
    corrupted(inRadius.get.toInt) = '#'.toByte
    val planted = media.unionByName(
      Seq((9001L, base), (9002L, corrupted)).toDF("media_id", "payload"))
    val pairs = Multimodal.phashPairs(planted, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("m1"), r.getAs[Long]("m2"),
        r.getAs[Long]("hamming")))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 9001L && p._3 == 0L),
      s"exact copy not found in ${pairs.length} pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 9002L),
      s"corrupted near-copy not found in ${pairs.length} pairs")
  }

  test("winsorize clips to the band, marks only true outliers, preserves rows") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val w = Stats.winsorize(li, "l_returnflag", "l_extendedprice", 0.05, 0.95)
      .cache()
    assert(w.count() == li.count())
    // clipped fraction per group ~10% (two 5% tails)
    val frac = w.groupBy("l_returnflag")
      .agg((sum(when(col("clipped"), 1).otherwise(0)) / count(lit(1))).as("f"))
      .collect().map(_.getAs[Double]("f"))
    frac.foreach(f => assert(f > 0.05 && f < 0.15, s"clip fraction $f"))
    // unclipped rows keep their value; clipped rows land on a boundary
    // (boundary = min/max of the winsorized values per group)
    val bad = w.filter(!col("clipped") &&
      col("value_w") =!= round(col("l_extendedprice"), 4))
    assert(bad.isEmpty)
    w.unpersist()
  }

  test("hllMergeProfile: per-group and union-merged estimates track exact counts") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val est = Stats.hllMergeProfile(li, "l_returnflag", "l_partkey")
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_nd").toDouble).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = li.agg(countDistinct(col("l_partkey"))).head.getLong(0)
    exact.foreach { case (g, nd) =>
      assert(math.abs(est(g) - nd) <= math.max(2.0, 0.05 * nd),
        s"group $g: hll ${est(g)} vs exact $nd")
    }
    // the '__all__' estimate comes from MERGING the per-group sketches,
    // and must still track the exact global distinct count
    assert(math.abs(est("__all__") - exactAll) <= math.max(2.0, 0.05 * exactAll),
      s"merged ${est("__all__")} vs exact $exactAll")
  }

  test("batchInfer: full batches except the partition tail, scores deterministic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 10 rows in ONE partition with batchSize 4 → batches of 4, 4, 2
    val media = (1L to 10L).map(i =>
      Multimodal.MediaRow(i, "image", s"payload$i".getBytes("UTF-8"),
        8, "s")).toDF().repartition(1)
    val rows = Multimodal.batchInfer(media, batchSize = 4).collect()
    assert(rows.length == 10)
    val sizes = rows.map(_.batch_size).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(sizes == Map(4 -> 8, 2 -> 2),
      s"two full batches + one tail expected: $sizes")
    // stub scores: deterministic mean payload byte, replayed exactly
    val again = Multimodal.batchInfer(media, batchSize = 4).collect()
    assert(rows.map(r => r.media_id -> r.score).toMap ==
      again.map(r => r.media_id -> r.score).toMap)
    // a row's score is independent of which batch it rides in
    val other = Multimodal.batchInfer(media, batchSize = 3).collect()
    assert(rows.map(r => r.media_id -> r.score).toMap ==
      other.map(r => r.media_id -> r.score).toMap,
      "batching is a throughput concern — it must never change results")
  }

  test("decodeBmp: hand-built headers decode with row un-flip and " +
      "padding; malformed payloads return None") {
    // hand-built 2x2 bottom-up 24-bit BMP (NOT via the encoder): rows
    // padded to 8 bytes; file rows [bottom: 10,20][top: 30,40] must
    // read back top-down as 30,40,10,20
    def u(vs: Int*): Array[Byte] = vs.map(_.toByte).toArray
    val hdr = u('B', 'M') ++ u(70, 0, 0, 0) ++ u(0, 0, 0, 0) ++
      u(54, 0, 0, 0) ++ u(40, 0, 0, 0) ++ u(2, 0, 0, 0) ++
      u(2, 0, 0, 0) ++ u(1, 0) ++ u(24, 0) ++ u(0, 0, 0, 0) ++
      u(16, 0, 0, 0) ++ Array.fill[Byte](16)(0)
    val rows = u(10, 10, 10, 20, 20, 20, 0, 0) ++
      u(30, 30, 30, 40, 40, 40, 0, 0)
    val img = Multimodal.decodeBmp(hdr ++ rows).get
    assert(img.width == 2 && img.height == 2)
    assert(img.gray.toSeq == Seq(30, 40, 10, 20), s"${img.gray.toSeq}")
    // malformed: wrong magic, truncated pixels, 8bpp, compressed
    assert(Multimodal.decodeBmp(u('B', 'A') ++ (hdr ++ rows).drop(2)).isEmpty)
    assert(Multimodal.decodeBmp(hdr ++ rows.dropRight(4)).isEmpty)
    val bpp8 = (hdr ++ rows).clone(); bpp8(28) = 8
    assert(Multimodal.decodeBmp(bpp8).isEmpty)
    val rle = (hdr ++ rows).clone(); rle(30) = 1
    assert(Multimodal.decodeBmp(rle).isEmpty)
  }

  test("encodeBmp24 round-trips through decodeBmp; nearest-neighbor " +
      "resize picks the expected source pixels") {
    val gray = Array(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12) // 4x3
    val img = Multimodal.decodeBmp(Multimodal.encodeBmp24(4, 3, gray)).get
    assert(img.width == 4 && img.height == 3 &&
      img.gray.toSeq == gray.toSeq, s"${img.gray.toSeq}")
    // halve to 2x1: out(x,0) <- in(2x, 0): pixels 1, 3
    val half = Multimodal.resizeNearest(img, 2, 1)
    assert(half.gray.toSeq == Seq(1, 3), s"${half.gray.toSeq}")
    // identity resize returns the image unchanged
    assert(Multimodal.resizeNearest(img, 4, 3).gray.toSeq == gray.toSeq)
  }

  test("bmpResizeSummary: real decode over the synthesized BMP lake, " +
      "checksum matches a hand computation") {
    import spark.implicits._
    val docs = Seq((3L, "abcdef", "en", "s0", 6),
      (6L, "qrstuv", "en", "s1", 6))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.bmpResizeSummary(docs).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // doc 3: w=8+3=11, h=6+3=9 -> out 5x4; doc 6: w=9, h=8 -> 4x4
    assert(out(3L).getAs[Int]("width") == 11 &&
      out(3L).getAs[Int]("height") == 9 &&
      out(3L).getAs[Int]("out_w") == 5 && out(3L).getAs[Int]("out_h") == 4)
    // hand-replay doc 6's checksum: gray(p) = text byte at (p*13)%6
    val t = "qrstuv".getBytes("US-ASCII")
    val cs = (for { y <- 0 until 4; x <- 0 until 4 } yield {
      val p = (y * 8 / 4) * 9 + (x * 9 / 4)
      t((p * 13) % 6) & 0xFF
    }).map(_.toLong).sum
    assert(out(6L).getAs[Long]("checksum") == cs, s"${out(6L)}")
    // encoded size honors the 4-byte row padding: doc 6 rowSize 28
    assert(out(6L).getAs[Int]("bmp_bytes") == 54 + 28 * 8)
  }
}
