package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/
  * audio/video payloads ride as opaque `binary` columns with typed
  * metadata; decode / feature-extraction / resize / frame-sampling
  * run as batched per-partition transforms.
  *
  * The SPARK side — schema, partitioning, batch shape, encoders — is
  * real and tested. The codec itself is a clearly-marked DETERMINISTIC
  * STUB (`fakeDecode`): no image/audio libraries exist in this
  * container, and at cluster scale the decode step is an external
  * concern (native lib or model-server RPC) slotted into the same
  * `mapPartitions` seam. In PySpark the identical seam is
  * `mapInPandas` with arrow batches; `mapPartitions` + grouped
  * iterators is the Scala-native equivalent, preserving the
  * batch-amortized call shape without ever materializing a partition
  * in memory.
  */
object Multimodal {

  /** One media row: payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int, n_frames: Int)

  final case class MediaFeature(media_id: Long, kind: String, frame: Int,
                                feature: Array[Float])

  /** Batch size for the decode/extract seam — amortizes per-call
    * overhead (JNI / RPC) without holding a whole partition.
    */
  val extractBatchSize = 64

  /** STUB ─ deterministic fake decode: derives a `dim`-wide float
    * feature from the payload bytes + frame index via a rolling hash.
    * Replace the body with a real codec / model call; the signature
    * and batching contract are the real interface.
    */
  def fakeDecode(bytes: Array[Byte], frame: Int, dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L + frame * 2654435761L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
      out(d) = ((h % 2000L) / 1000.0f); d += 1
    }
    out
  }

  /** Synthesize a media table from the `documents` table (text bytes
    * as payload) — stands in for a real binary source; keeps the
    * pipeline runnable on the driver-provided testdata only.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"),
      (pmod(col("doc_id"), lit(8)) * 64 + 256).cast("int").as("width"),
      (pmod(col("doc_id"), lit(4)) * 64 + 256).cast("int").as("height"),
      when(col("doc_id") % 3 === 2, pmod(col("doc_id"), lit(10)) + 2)
        .otherwise(lit(1)).cast("int").as("n_frames")
    ).as[MediaRow]
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `everyNth`). Narrow explode — no shuffle; at scale the payload
    * column is projected ONLY into the extract stage (column pruning
    * keeps it out of unrelated scans).
    */
  def sampleFrames(media: Dataset[MediaRow], everyNth: Int): DataFrame =
    media.toDF().select(
      col("media_id"), col("kind"), col("bytes"),
      explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
        lit(everyNth))).as("frame"))

  /** Feature extraction over the decode seam: per partition, pull rows
    * in `extractBatchSize` groups, "decode" each batch, emit features.
    * The grouped-iterator shape is what a real model-server client
    * needs (one RPC per batch), and it streams — constant memory per
    * partition.
    */
  def extractFeatures(sampled: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    import sampled.sparkSession.implicits._
    sampled.select("media_id", "kind", "bytes", "frame")
      .as[(Long, String, Array[Byte], Int)]
      .mapPartitions { rows =>
        rows.grouped(extractBatchSize).flatMap { batch =>
          // one "model call" per batch — the stub decodes each member
          batch.iterator.map { case (id, kind, bytes, frame) =>
            MediaFeature(id, kind, frame, fakeDecode(bytes, frame, dim))
          }
        }
      }
  }

  /** Resize metadata transform: pure column arithmetic (the actual
    * pixel resize lives behind the same decode seam).
    */
  def resizeMeta(media: Dataset[MediaRow], maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    media.toDF().withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
      .drop("bytes")
  }

  /** End-to-end: documents → media → sampled frames → features, ready
    * to join back to embeddings/text features by media_id.
    */
  def featurePipeline(docs: DataFrame, everyNth: Int = 2, dim: Int = 16): DataFrame = {
    import docs.sparkSession.implicits._
    extractFeatures(sampleFrames(syntheticMedia(docs), everyNth), dim)
      .toDF()
      .withColumn("feat_norm",
        round(sqrt(aggregate(col("feature"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 6))
  }

  /** Content fingerprint of a decoded frame: md5 over the feature
    * vector rendered as micro-unit longs (engine-portable rounding —
    * the same rendering every oracle-facing float takes).
    */
  def frameFingerprint(featureCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(array_join(transform(featureCol,
      x => round(x.cast("double") * 1000000).cast("long").cast("string")), ","))

  /** Cross-media duplicate-frame detection — the media twin of text
    * exact dedup (repeated intros, stock footage, re-uploads): a
    * frame whose decoded-feature fingerprint appears in ≥ `minMedia`
    * DISTINCT media is a duplicate; per media report the sampled
    * frame count, duplicate count, and fraction.
    *
    * Scale: decode runs once at the mapPartitions batch seam; the
    * fingerprint groupBy is one shuffle on a 32-char key; the mark
    * join's output is bounded by frame count (no pair explosion, the
    * q106 argument). With a REAL codec the fingerprint becomes a
    * perceptual hash at the same seam — the plan does not change.
    */
  def frameDedup(docs: DataFrame, everyNth: Int = 2, dim: Int = 16,
                 minMedia: Long = 2): DataFrame = {
    val frames = extractFeatures(sampleFrames(syntheticMedia(docs), everyNth), dim)
      .toDF()
      .select(col("media_id"), col("frame"),
        frameFingerprint(col("feature")).as("fp"))
    val hot = frames.groupBy("fp")
      .agg(count_distinct(col("media_id")).as("n_media"))
      .filter(col("n_media") >= minMedia).select("fp")
    val marked = frames.join(hot, "fp")
      .groupBy("media_id").agg(count(lit(1)).as("n_dup_frames"))
    frames.groupBy("media_id").agg(count(lit(1)).as("n_frames"))
      .join(marked, Seq("media_id"), "left")
      .select(col("media_id"), col("n_frames"),
        coalesce(col("n_dup_frames"), lit(0L)).as("n_dup_frames"),
        round(coalesce(col("n_dup_frames"), lit(0L)).cast("double") /
          col("n_frames"), 6).as("dup_frac"))
  }

  /** Content-defined chunking over the raw BINARY payload — the media
    * twin of the token-level CDC splitter (Corpus.cdcChunks / q102):
    * a chunk boundary opens after byte position i whenever the
    * md5-hex7 hash of the w-byte window starting at i divides
    * `divisor`. Byte-shift-robust by construction (an inserted prefix
    * moves every offset but reproduces the same downstream chunk
    * hashes), which is what makes the chunk-hash dictionary a
    * cross-upload dedup key for opaque payloads (re-encoded uploads,
    * watermarked copies, trailing-metadata variants).
    *
    * Output: one row per chunk — (media_id, chunk_id, offset 1-based,
    * n_bytes, chunk_hash, hash_refs = corpus-wide occurrences of the
    * hash). Runs on BinaryType end-to-end (`substring` slices bytes,
    * `md5` hashes them); no string conversion of the payload.
    *
    * Scale: the per-byte boundary scan is a narrow map (explode +
    * windowed prefix-sum PARTITIONED by media), one chunk rollup, one
    * join back to the payload for the chunk hash, one hash-keyed
    * window over chunk rows. Same cost class as the token CDC —
    * nothing leaves the executor except chunk rows.
    */
  def cdcChunkBytes(media: DataFrame, w: Int = 8, divisor: Int = 32,
                    idCol: String = "media_id",
                    bytesCol: String = "bytes"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2 && divisor >= 2,
      s"cdcChunkBytes: need w >= 2, divisor >= 2; got w=$w divisor=$divisor")
    val m = media.select(col(idCol).cast("long").as("media_id"),
      col(bytesCol).cast("binary").as("bytes"))
      .withColumn("n", octet_length(col("bytes")).cast("long"))
      .where(col("n") > 0)
    val flagged = m
      .select(col("media_id"), col("n"), col("bytes"),
        explode(sequence(lit(1L), col("n"))).as("pos"))
      .select(col("media_id"), col("pos"),
        when(col("pos") <= col("n") - (w - 1) &&
            conv(substring(md5(expr(s"substring(bytes, pos, $w)")), 1, 7),
              16, 10).cast("long") % divisor === 0, 1L)
          .otherwise(0L).as("flag"))
    val chunks = flagged
      .withColumn("chunk_id", coalesce(
        sum("flag").over(Window.partitionBy("media_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy("media_id", "chunk_id")
      .agg(min("pos").as("offset"), count(lit(1)).as("n_bytes"))
    val hashed = chunks
      .join(m.select(col("media_id"), col("bytes")), Seq("media_id"))
      .select(col("media_id"), col("chunk_id"), col("offset"), col("n_bytes"),
        md5(expr("substring(bytes, offset, n_bytes)")).as("chunk_hash"))
    hashed.withColumn("hash_refs",
      count(lit(1)).over(Window.partitionBy("chunk_hash")).cast("long"))
  }

  /** Per-frame energy over the raw BINARY payload — the decode half
    * of VAD-style (voice-activity-detection) segmentation. The
    * payload is cut into fixed `frameBytes`-byte frames; each byte
    * becomes a small signed STUB sample (`signedByte % 7 − 3`, Java
    * remainder semantics — [[wavFrameEnergy]] is the PROVEN real-PCM
    * swap at this seam; the frame/energy plumbing is the durable
    * part, shared via [[segmentRuns]]), and the frame's
    * energy is the integer sum of squared samples — exact in any
    * engine, no float drift.
    *
    * The byte is decoded POSITIONALLY via the payload's hex
    * expansion (`conv(substr(hex(bytes), 2·pos−1, 2), 16, 10)`),
    * never through a string cast — `CAST(binary AS STRING)` would
    * mangle every byte ≥ 0x80 into U+FFFD. Bytes 0x80–0xFF are
    * re-signed to the Java byte range (−128…−1) so the distributed
    * result matches a scalar `Array[Byte]` replay exactly
    * (MultimodalSpec pins this on a non-ASCII payload). The q337
    * DuckDB oracle replays the math character-wise on the staged
    * text, which is valid precisely because that text is all-ASCII
    * (one character = one byte = one non-negative sample).
    *
    * Scale: one narrow per-byte explode (linear in payload bytes, the
    * q291 cost class) and one (media, frame)-keyed rollup. Nothing
    * global. The hex expansion is computed once per payload before
    * the explode; per exploded row only a 2-char substring remains.
    */
  def frameEnergy(media: DataFrame, frameBytes: Int = 16,
                  idCol: String = "media_id",
                  bytesCol: String = "bytes"): DataFrame = {
    require(frameBytes >= 1, s"frameEnergy: frameBytes >= 1, got $frameBytes")
    val m = media.select(col(idCol).cast("long").as("media_id"),
        col(bytesCol).cast("binary").as("bytes"))
      .withColumn("n", octet_length(col("bytes")).cast("long"))
      .where(col("n") > 0)
      .select(col("media_id"), hex(col("bytes")).as("h"), col("n"))
    val u = conv(substring(col("h"), (col("pos") * 2 - 1).cast("int"),
        lit(2)), 16, 10).cast("long")
    val signed = when(u >= 128L, u - 256L).otherwise(u)
    m.select(col("media_id"), col("h"),
        explode(sequence(lit(1L), col("n"))).as("pos"))
      .select(col("media_id"),
        expr(s"(pos - 1) div $frameBytes").as("frame"),
        (signed % 7 - 3).as("v"))
      .groupBy("media_id", "frame")
      .agg(sum(col("v") * col("v")).as("energy"))
  }

  /** The shared run-merge half of VAD segmentation: given per-frame
    * energies `(media_id, frame, energy)` from ANY decoder (the stub
    * byte mapper of [[frameEnergy]], the real PCM16 path of
    * [[wavFrameEnergy]], or a future codec at the same seam), mark
    * each frame active iff energy ≥ `threshold` and merge consecutive
    * same-state frames into segments. Output: one row per segment —
    * (media_id, seg_id 0-based, active, start_frame, n_frames,
    * energy). Decoders change; this operator is the durable part.
    *
    * Scale: a lag + running sum PARTITIONED by media (frame count
    * per media is linear in its payload — no global window), then
    * one (media, segment) rollup.
    */
  def segmentRuns(frameEnergies: DataFrame, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fe = frameEnergies.withColumn("active", col("energy") >= threshold)
    val w = Window.partitionBy("media_id").orderBy("frame")
    fe.withColumn("chg",
        when(lag(col("active"), 1).over(w).isNull ||
          lag(col("active"), 1).over(w) =!= col("active"), 1L)
          .otherwise(0L))
      .withColumn("seg_id",
        sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1L)
      .groupBy("media_id", "seg_id")
      .agg(min("active").as("active"), min("frame").as("start_frame"),
        count(lit(1)).as("n_frames"), sum("energy").as("energy"))
  }

  /** Energy-run segmentation (the VAD / silence-trimming shape) over
    * the stub byte decoder: [[frameEnergy]] then [[segmentRuns]].
    * Feeding a real decoder's frame energies through the same
    * run-merge gives speech segments for ASR corpus prep — see
    * [[wavSegments]] for the proven PCM16 path.
    */
  def energySegments(media: DataFrame, frameBytes: Int = 16,
                     threshold: Long = 40L,
                     idCol: String = "media_id",
                     bytesCol: String = "bytes"): DataFrame =
    segmentRuns(frameEnergy(media, frameBytes, idCol, bytesCol), threshold)

  /** Deterministic REAL WAV/PCM16 containers staged from a roster —
    * canonical 44-byte RIFF header (PCM format 1, mono, 16-bit,
    * sample rate 8/12/16 kHz by id) followed by little-endian signed
    * 16-bit samples alternating 32-sample LOUD blocks (full-range
    * multiplicative-hash values) and QUIET blocks (the same values
    * attenuated 64×) — so downstream energy segmentation has real
    * speech-like structure to find. Assembled as hex text and
    * unhex'd: every container byte round-trips through a genuine
    * BinaryType column, which is what lets [[wavSegments]] PROVE the
    * documented codec seam (Multimodal decode stubs) instead of
    * asserting it.
    *
    * Scale: two narrow per-media projections (the sample array is
    * materialized in its OWN projection before the hex-render
    * transform — the HOF re-inline rule); no explode, no shuffle.
    */
  def syntheticWav(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def le16(c: String) =
      s"concat(lpad(hex(($c) % 256), 2, '0'), " +
        s"lpad(hex(($c) div 256 % 256), 2, '0'))"
    def le32(c: String) =
      s"concat(lpad(hex(($c) % 256), 2, '0'), " +
        s"lpad(hex(($c) div 256 % 256), 2, '0'), " +
        s"lpad(hex(($c) div 65536 % 256), 2, '0'), " +
        s"lpad(hex(($c) div 16777216 % 256), 2, '0'))"
    docs.select(col(idCol).cast("long").as("media_id"))
      .withColumn("sr", lit(8000L) + (col("media_id") % 3) * 4000L)
      .withColumn("ns", lit(96L) + (col("media_id") % 5) * 32L)
      .withColumn("u16", expr(
        """transform(sequence(CAST(1 AS BIGINT), ns), t -> pmod(
          |  CASE WHEN ((t - 1) div 32) % 2 = 1
          |    THEN ((media_id * 131 + t * 17) % 65536) div 64 - 512
          |    ELSE (media_id * 131 + t * 17) % 65536 - 32768 END,
          |  65536))""".stripMargin))
      .withColumn("hdr", concat(
        lit("52494646"),                         // "RIFF"
        expr(le32("36 + 2 * ns")),
        lit("57415645666D7420"),                 // "WAVE" + "fmt "
        expr(le32("16")), expr(le16("1")), expr(le16("1")),
        expr(le32("sr")), expr(le32("2 * sr")),
        expr(le16("2")), expr(le16("16")),
        lit("64617461"),                         // "data"
        expr(le32("2 * ns"))))
      .select(col("media_id"), unhex(concat(col("hdr"), expr(
        """array_join(transform(u16, u -> concat(
          |  lpad(hex(u % 256), 2, '0'),
          |  lpad(hex(u div 256), 2, '0'))), '')""".stripMargin)))
        .as("bytes"))
  }

  /** Parse the canonical 44-byte RIFF/WAVE/PCM header from the raw
    * BINARY payload — positional little-endian field decode over the
    * hex expansion (the [[frameEnergy]] discipline: never
    * `CAST(binary AS STRING)`, which mangles bytes ≥ 0x80). One row
    * per media with the parsed fields plus `wav_valid`: RIFF/WAVE/
    * "fmt "/"data" magics present, PCM format 1, MONO (n_channels 1,
    * block_align 2, byte_rate = 2·sample_rate — the only layout
    * [[wavFrameEnergy]]'s positional decode understands; a stereo
    * container would otherwise pass and decode interleaved-channel
    * garbage), 16-bit, fmt chunk size 16, and riff/data sizes
    * consistent with the actual payload length — a truncated or
    * doctored container fails loudly here rather than decoding
    * garbage samples. Retains the hex column `h` for the downstream
    * sample decode.
    */
  def wavHeader(media: DataFrame, idCol: String = "media_id",
                bytesCol: String = "bytes"): DataFrame = {
    val m = media.select(col(idCol).cast("long").as("media_id"),
        col(bytesCol).cast("binary").as("bytes"))
      .withColumn("n", octet_length(col("bytes")).cast("long"))
      .where(col("n") >= 44L)
      .select(col("media_id"), hex(col("bytes")).as("h"), col("n"))
    def byteAt(p: Int) =
      conv(substring(col("h"), 2 * p - 1, 2), 16, 10).cast("long")
    def hle16(p: Int) = byteAt(p) + byteAt(p + 1) * 256L
    def hle32(p: Int) = byteAt(p) + byteAt(p + 1) * 256L +
      byteAt(p + 2) * 65536L + byteAt(p + 3) * 16777216L
    m.select(col("media_id"), col("h"), col("n"),
        hle32(5).as("riff_size"), hle32(17).as("fmt_size"),
        hle16(21).as("audio_format"), hle16(23).as("n_channels"),
        hle32(25).as("sample_rate"), hle32(29).as("byte_rate"),
        hle16(33).as("block_align"), hle16(35).as("bits_per_sample"),
        hle32(41).as("data_size"),
        (substring(col("h"), 1, 8) === "52494646" &&
          substring(col("h"), 17, 16) === "57415645666D7420" &&
          substring(col("h"), 73, 8) === "64617461").as("_magics"))
      .withColumn("wav_valid", col("_magics") &&
        col("audio_format") === 1L && col("bits_per_sample") === 16L &&
        col("fmt_size") === 16L && col("n_channels") === 1L &&
        col("block_align") === 2L &&
        col("byte_rate") === col("sample_rate") * 2L &&
        col("n") === col("data_size") + 44L &&
        col("riff_size") === col("data_size") + 36L)
      .withColumn("n_samples", when(col("block_align") > 0L,
        expr("data_size div block_align")).otherwise(lit(0L)))
      .drop("_magics")
  }

  /** REAL-codec frame energy — the proof of the decode seam the stub
    * [[frameEnergy]] documents: PCM16LE samples decoded positionally
    * from a VALID WAV payload (sample t's bytes sit at 43+2t / 44+2t,
    * little-endian, re-signed from the u16 range), framed
    * `frameSamples` per frame, energy = integer sum of squared
    * samples — exact in any engine. Invalid containers (corrupt
    * magic, non-PCM, wrong bit depth, inconsistent sizes) are
    * DROPPED by the [[wavHeader]] validity gate, never decoded.
    *
    * Scale: one narrow per-sample explode (linear in payload bytes,
    * the q291/q337 cost class; the hex expansion is computed once per
    * payload before the explode) + one (media, frame) rollup.
    */
  def wavFrameEnergy(media: DataFrame, frameSamples: Int = 16,
                     idCol: String = "media_id",
                     bytesCol: String = "bytes"): DataFrame = {
    require(frameSamples >= 1,
      s"wavFrameEnergy: frameSamples >= 1, got $frameSamples")
    val hdr = wavHeader(media, idCol, bytesCol)
      .where(col("wav_valid") && col("n_samples") > 0L)
      .select(col("media_id"), col("h"), col("n_samples"))
    val lo = conv(substring(col("h"),
      ((lit(43L) + col("t") * 2L) * 2L - 1L).cast("int"), lit(2)),
      16, 10).cast("long")
    val hi = conv(substring(col("h"),
      ((lit(44L) + col("t") * 2L) * 2L - 1L).cast("int"), lit(2)),
      16, 10).cast("long")
    val u = lo + hi * 256L
    val s = when(u >= 32768L, u - 65536L).otherwise(u)
    hdr.select(col("media_id"), col("h"),
        explode(sequence(lit(1L), col("n_samples"))).as("t"))
      .select(col("media_id"),
        expr(s"(t - 1) div $frameSamples").as("frame"), s.as("v"))
      .groupBy("media_id", "frame")
      .agg(sum(col("v") * col("v")).as("energy"))
  }

  /** VAD segmentation on the REAL PCM16 path: [[wavFrameEnergy]]
    * through the SAME [[segmentRuns]] run-merge the stub path uses —
    * the codec seam swaps, the plan shape does not (MultimodalSpec
    * pins both). Default threshold separates the synthetic loud
    * blocks (≈5·10⁹ per 16-sample frame) from the 64×-attenuated
    * quiet blocks (≈1.4·10⁶) by three orders of magnitude.
    */
  def wavSegments(media: DataFrame, frameSamples: Int = 16,
                  threshold: Long = 100000000L,
                  idCol: String = "media_id",
                  bytesCol: String = "bytes"): DataFrame =
    segmentRuns(wavFrameEnergy(media, frameSamples, idCol, bytesCol),
      threshold)

  /** Deterministic REAL BMP containers (24-bit uncompressed,
    * bottom-up, 4-byte-padded rows — the classic Windows DIB layout)
    * staged from a roster: BITMAPFILEHEADER (14 bytes) +
    * BITMAPINFOHEADER (40) + BGR pixel rows, widths 4–6 × heights
    * 3–4 by id so the stride-padding branch is actually exercised
    * (w=5 → 1 pad byte, w=6 → 2). Pixel channel values come from the
    * multiplicative-hash formula v(x,y,c)=(id·7+y·131+x·17+c·29) mod
    * 256 with c∈{0:R,1:G,2:B}; the container stores them BGR and
    * bottom-up, so a parser that misreads channel order, row
    * orientation, stride, or the data offset produces different
    * numbers — the image twin of [[syntheticWav]]'s audio-seam proof.
    */
  def syntheticBmp(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    def le16(c: String) =
      s"concat(lpad(hex(($c) % 256), 2, '0'), " +
        s"lpad(hex(($c) div 256 % 256), 2, '0'))"
    def le32(c: String) =
      s"concat(lpad(hex(($c) % 256), 2, '0'), " +
        s"lpad(hex(($c) div 256 % 256), 2, '0'), " +
        s"lpad(hex(($c) div 65536 % 256), 2, '0'), " +
        s"lpad(hex(($c) div 16777216 % 256), 2, '0'))"
    docs.select(col(idCol).cast("long").as("media_id"))
      .withColumn("w", lit(4L) + (col("media_id") % 3))
      .withColumn("hh", lit(3L) + (col("media_id") % 2))
      .withColumn("stride", expr("((3 * w + 3) div 4) * 4"))
      // pixel bytes in their own projection (HOF re-inline rule);
      // byte idx → stored row r=idx div stride (bottom-up: y=h-1-r),
      // k=idx%stride; k<3w → channel byte (BGR: c = 2 - k%3), else pad
      .withColumn("px", expr(
        """transform(sequence(CAST(0 AS BIGINT), stride * hh - 1), i ->
          |  CASE WHEN i % stride < 3 * w THEN
          |    (media_id * 7 + (hh - 1 - i div stride) * 131
          |     + ((i % stride) div 3) * 17
          |     + (2 - (i % stride) % 3) * 29) % 256
          |  ELSE 0 END)""".stripMargin))
      .withColumn("hdr", concat(
        lit("424D"),                               // "BM"
        expr(le32("54 + stride * hh")),            // file size
        lit("00000000"),                           // reserved
        expr(le32("54")),                          // pixel data offset
        expr(le32("40")),                          // info header size
        expr(le32("w")), expr(le32("hh")),         // width, height (+: bottom-up)
        expr(le16("1")), expr(le16("24")),         // planes, bpp
        expr(le32("0")),                           // BI_RGB (uncompressed)
        expr(le32("stride * hh")),                 // image size
        expr(le32("2835")), expr(le32("2835")),    // 72 DPI in px/m
        expr(le32("0")), expr(le32("0"))))         // palette counts
      .select(col("media_id"), unhex(concat(col("hdr"), expr(
        """array_join(transform(px, b -> lpad(hex(b), 2, '0')), '')""")))
        .as("bytes"))
  }

  /** Parse the BMP headers from the raw BINARY payload (the
    * [[wavHeader]] discipline: positional little-endian decode over
    * the hex expansion) and gate on validity: "BM" magic, 40-byte
    * BITMAPINFOHEADER, 1 plane, 24 bpp, BI_RGB, pixel data at offset
    * 54, and file/image sizes consistent with the actual payload
    * length and the 4-byte-padded stride. One row per media; retains
    * `h` (hex) for the pixel decode. */
  def bmpHeader(media: DataFrame, idCol: String = "media_id",
                bytesCol: String = "bytes"): DataFrame = {
    val m = media.select(col(idCol).cast("long").as("media_id"),
        col(bytesCol).cast("binary").as("bytes"))
      .withColumn("n", octet_length(col("bytes")).cast("long"))
      .where(col("n") >= 54L)
      .select(col("media_id"), hex(col("bytes")).as("h"), col("n"))
    def byteAt(p: Int) =
      conv(substring(col("h"), 2 * p - 1, 2), 16, 10).cast("long")
    def hle16(p: Int) = byteAt(p) + byteAt(p + 1) * 256L
    def hle32(p: Int) = byteAt(p) + byteAt(p + 1) * 256L +
      byteAt(p + 2) * 65536L + byteAt(p + 3) * 16777216L
    m.select(col("media_id"), col("h"), col("n"),
        hle32(3).as("file_size"), hle32(11).as("data_offset"),
        hle32(15).as("info_size"), hle32(19).as("width"),
        hle32(23).as("height"), hle16(27).as("planes"),
        hle16(29).as("bpp"), hle32(31).as("compression"),
        hle32(35).as("image_size"),
        (substring(col("h"), 1, 4) === "424D").as("_magic"))
      .withColumn("stride", expr("((3 * width + 3) div 4) * 4"))
      .withColumn("bmp_valid", col("_magic") &&
        col("info_size") === 40L && col("planes") === 1L &&
        col("bpp") === 24L && col("compression") === 0L &&
        col("data_offset") === 54L && col("width") > 0L &&
        col("height") > 0L &&
        col("image_size") === col("stride") * col("height") &&
        col("file_size") === col("n") &&
        col("n") === lit(54L) + col("stride") * col("height"))
      .drop("_magic")
  }

  /** REAL-image pixel statistics — the image twin of
    * [[wavFrameEnergy]]'s audio-seam proof: decode every 24-bit BGR
    * pixel of a VALID BMP positionally (bottom-up row order, 4-byte
    * row padding skipped, B/G/R storage → R/G/B channel indices), and
    * reduce per image to exact integer per-channel sums plus a
    * position-weighted moment Σ (y·4096 + x·8 + c)·v — the moment is
    * what catches a parser that gets the SUMS right but the geometry
    * wrong (top-down instead of bottom-up, transposed x/y, swapped
    * channels, stride off by the padding), since full-image sums are
    * invariant to all of those.
    *
    * Scale: one narrow per-byte explode over pixel bytes (linear in
    * payload size, the q291/q340 cost class) + one media rollup.
    */
  def bmpPixelStats(media: DataFrame, idCol: String = "media_id",
                    bytesCol: String = "bytes"): DataFrame = {
    val hdr = bmpHeader(media, idCol, bytesCol)
      .where(col("bmp_valid"))
      .select(col("media_id"), col("h"), col("width"), col("height"),
        col("stride"))
    // byte index i in the pixel array (0-based): stored row i div
    // stride (bottom-up ⇒ y = height-1-row), k = i mod stride;
    // k < 3·width ⇒ pixel byte: x = k div 3, channel = 2 - k mod 3
    // (BGR storage), value at hex position 2·(54+i)+1
    hdr.select(col("media_id"), col("width"), col("height"),
        col("stride"), col("h"),
        explode(sequence(lit(0L), col("stride") * col("height") - 1L))
          .as("i"))
      .where(col("i") % col("stride") < col("width") * 3L)
      .select(col("media_id"), col("width"), col("height"),
        (col("height") - 1L - expr("i div stride")).as("y"),
        expr("(i % stride) div 3").as("x"),
        (lit(2L) - expr("(i % stride) % 3")).as("c"),
        conv(substring(col("h"), ((lit(54L) + col("i")) * 2L + 1L)
          .cast("int"), lit(2)), 16, 10).cast("long").as("v"))
      .groupBy("media_id", "width", "height")
      .agg(
        sum(when(col("c") === 0L, col("v")).otherwise(0L)).as("sum_r"),
        sum(when(col("c") === 1L, col("v")).otherwise(0L)).as("sum_g"),
        sum(when(col("c") === 2L, col("v")).otherwise(0L)).as("sum_b"),
        sum((col("y") * 4096L + col("x") * 8L + col("c")) * col("v"))
          .as("pos_moment"))
  }

  /** The CLASSIC image dHash — 9×8 grayscale downsample, horizontal
    * gradient, 64-bit signature — computed on REAL pixels: every grid
    * cell's source pixel is decoded positionally from a VALID BMP's
    * pixel array (the [[bmpPixelStats]] discipline: bottom-up rows,
    * stride padding, BGR order), grayscaled with the integer BT.601
    * luma (299R + 587G + 114B) div 1000, and bit (gx, gy) set iff
    * gray(gx, gy) > gray(gx+1, gy) over the 9-wide × 8-tall grid —
    * closing the seam [[dHashSignatures]]' scaladoc documents (its
    * byte-segment reduction stands in where no pixel codec exists;
    * this is the pixel codec). Downsampling is nearest-neighbor:
    * grid cell (gx, gy) reads pixel (gx·w div 9, gy·h div 8) —
    * exact integer arithmetic, any image size.
    *
    * Output: (media_id, band, v) — four 16-bit bands (bit b lives in
    * band b div 16 at position b mod 16), the EXACT contract
    * [[dHashSignatures]] emits, so [[dHashNearDupFromSigs]]' LSH
    * bucket join + Hamming verify consumes either producer unchanged.
    *
    * Scale: header parse + 72 fixed grid reads per media, all inside
    * array transforms in one projection chain (no per-pixel explode —
    * the grid is constant-size regardless of image size, so this is
    * STRICTLY CHEAPER than [[bmpPixelStats]]' full decode); one
    * posexplode of the 4 band rows per media. No shuffle before the
    * band rollup output.
    */
  def bmpDHashSignatures(media: DataFrame, idCol: String = "media_id",
                         bytesCol: String = "bytes"): DataFrame = {
    val hdr = bmpHeader(media, idCol, bytesCol)
      .where(col("bmp_valid"))
      .select(col("media_id"), col("h"), col("width"), col("height"),
        col("stride"))
    // grays for the 72 grid cells (g = gy*9 + gx, gx 0..8, gy 0..7):
    // source pixel (px, py) = (gx·w div 9, gy·h div 8); its channel
    // byte sits at pixel-array offset (h-1-py)·stride + 3·px + chan
    // (bottom-up rows, BGR storage: chan 0 = B, 1 = G, 2 = R)
    def chanByte(chan: Int): String =
      "CAST(conv(substring(h, CAST((54 + " +
        "(height - 1 - ((CAST(g AS BIGINT) div 9) * height) div 8) * stride" +
        " + 3 * (((CAST(g AS BIGINT) % 9) * width) div 9)" +
        s" + $chan) * 2 + 1 AS INT), 2), 16, 10) AS BIGINT)"
    val grays = hdr.withColumn("_grays", expr(
      s"""transform(sequence(0, 71), g ->
         |  (299 * ${chanByte(2)} + 587 * ${chanByte(1)}
         |   + 114 * ${chanByte(0)}) div 1000)""".stripMargin))
    // bit b (0..63): gy = b div 8, gx = b mod 8 → compare grid
    // neighbors gy*9+gx and gy*9+gx+1 (1-based element_at)
    val bits = grays.withColumn("_bits", expr(
      """transform(sequence(0, 63), b -> IF(
        |  element_at(_grays, CAST((b div 8) * 9 + (b % 8) + 1 AS INT)) >
        |  element_at(_grays, CAST((b div 8) * 9 + (b % 8) + 2 AS INT)),
        |  1L, 0L))""".stripMargin))
    bits.select(col("media_id"),
        posexplode(expr(
          """transform(sequence(0, 3), bd -> aggregate(
            |  sequence(0, 15), CAST(0 AS BIGINT),
            |  (acc, p) -> acc + element_at(_bits, bd * 16 + p + 1)
            |    * shiftleft(CAST(1 AS BIGINT), p)))""".stripMargin))
          .as(Seq("band", "v")))
      .select(col("media_id"), col("band").cast("long").as("band"),
        col("v"))
  }

  /** The CLASSIC image aHash (average hash) on REAL pixels — the
    * mean-threshold companion of [[bmpDHashSignatures]]' gradient
    * hash: 8×8 grayscale downsample of a VALID BMP (same positional
    * decode — bottom-up rows, stride padding, BGR order, integer
    * BT.601 luma), and bit g set iff the cell's gray EXCEEDS the
    * 64-cell mean. The two hashes fail differently: dHash is immune
    * to global brightness shifts but blind to flat-field changes,
    * aHash is the reverse — running both is the standard perceptual
    * dedup practice, and both emit the same 4×16-bit band contract,
    * so [[dHashNearDupFromSigs]] consumes either unchanged.
    *
    * The threshold is EXACT integer arithmetic: bit = 1 iff
    * 64·gray_g > Σ grays (no division touches the decision), so the
    * engine and a SQL replay agree bit-for-bit by construction.
    *
    * Scale: header parse + 64 fixed grid reads per media inside
    * array transforms (constant-size regardless of image size, the
    * [[bmpDHashSignatures]] cost class); one posexplode of the 4
    * band rows per media. No shuffle before the band rollup output.
    */
  def bmpAHashSignatures(media: DataFrame, idCol: String = "media_id",
                         bytesCol: String = "bytes"): DataFrame = {
    val hdr = bmpHeader(media, idCol, bytesCol)
      .where(col("bmp_valid"))
      .select(col("media_id"), col("h"), col("width"), col("height"),
        col("stride"))
    // grays for the 64 grid cells (g = gy*8 + gx, gx 0..7, gy 0..7):
    // source pixel (px, py) = (gx·w div 8, gy·h div 8); channel byte
    // at pixel-array offset (h-1-py)·stride + 3·px + chan
    def chanByte(chan: Int): String =
      "CAST(conv(substring(h, CAST((54 + " +
        "(height - 1 - ((CAST(g AS BIGINT) div 8) * height) div 8) * stride" +
        " + 3 * (((CAST(g AS BIGINT) % 8) * width) div 8)" +
        s" + $chan) * 2 + 1 AS INT), 2), 16, 10) AS BIGINT)"
    val grays = hdr.withColumn("_grays", expr(
      s"""transform(sequence(0, 63), g ->
         |  (299 * ${chanByte(2)} + 587 * ${chanByte(1)}
         |   + 114 * ${chanByte(0)}) div 1000)""".stripMargin))
    // integer mean threshold: bit g = 1 iff 64·gray > Σ grays
    val bits = grays
      .withColumn("_tot", expr(
        "aggregate(_grays, CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .withColumn("_bits", expr(
        """transform(sequence(0, 63), b -> IF(
          |  64 * element_at(_grays, CAST(b + 1 AS INT)) > _tot,
          |  1L, 0L))""".stripMargin))
    bits.select(col("media_id"),
        posexplode(expr(
          """transform(sequence(0, 3), bd -> aggregate(
            |  sequence(0, 15), CAST(0 AS BIGINT),
            |  (acc, p) -> acc + element_at(_bits, bd * 16 + p + 1)
            |    * shiftleft(CAST(1 AS BIGINT), p)))""".stripMargin))
          .as(Seq("band", "v")))
      .select(col("media_id"), col("band").cast("long").as("band"),
        col("v"))
  }

  /** Flip pixel-array byte `byteIdx` (0-based within the pixel array)
    * of each BMP payload by +128 mod 256 — a REAL container-level
    * pixel perturbation (the hex overlay keeps every other byte
    * bit-identical), used to plant near-duplicate twins whose dHash
    * must land within a small Hamming radius. `newId` relabels the
    * twin. Map-only.
    */
  def perturbBmpPixelByte(media: DataFrame, byteIdx: Column,
                          newId: Column,
                          idCol: String = "media_id",
                          bytesCol: String = "bytes"): DataFrame = {
    val m = media.select(col(idCol).cast("long").as("media_id"),
        col(bytesCol).cast("binary").as("bytes"))
      .select(col("media_id"), hex(col("bytes")).as("h"),
        (lit(54L) + byteIdx).as("_bi"))
    m.select(newId.as("media_id"),
      unhex(concat(
        col("h").substr(lit(1), (col("_bi") * 2L).cast("int")),
        lpad(hex(pmod(conv(col("h").substr(
          (col("_bi") * 2L + 1L).cast("int"), lit(2)), 16, 10).cast("long")
          + 128L, lit(256L))), 2, "0"),
        expr("substring(h, CAST(_bi * 2 + 3 AS INT))"))).as("bytes"))
  }

  /** Difference-hash (dHash) perceptual signatures over the raw
    * BINARY payload, banded for LSH — the media twin of SimHash
    * banding (q37/q61): the payload is "downscaled" into `bits`+1
    * equal byte segments, each segment reduced to its byte-value sum,
    * and bit i set iff segment i's sum exceeds segment i+1's — the
    * 1-D analogue of the classic 9×8 image dHash gradient. A small
    * local byte edit perturbs one or two segment sums and flips at
    * most a couple of bits, so near-identical payloads land within a
    * small Hamming radius — the property an exact hash (q34) lacks
    * and a real pHash provides for pixels. Byte values are read via
    * the engine-portable ascii() rendering (the stub codec's payloads
    * are ASCII; a real deployment swaps a native pHash in at the
    * [[extractFeatures]] decode seam — the LSH plumbing here is the
    * durable part).
    *
    * Output (long form): (media_id, band, v) — `bits`/16 bands of 16
    * bits each, `v` the band's bit field as a BIGINT. Payloads
    * shorter than `bits`+1 bytes are skipped (every segment must hold
    * ≥ 1 byte).
    *
    * Scale: one per-byte narrow explode (linear in payload bytes, the
    * q291 cost class), a (media, segment)-keyed sum, a segment-shift
    * self-join on the segment spine, a (media, band) rollup. No
    * windows, no cartesian.
    */
  def dHashSignatures(media: DataFrame, bits: Int = 64,
                      idCol: String = "media_id",
                      bytesCol: String = "bytes"): DataFrame = {
    require(bits >= 16 && bits % 16 == 0,
      s"dHashSignatures: bits must be a positive multiple of 16, got $bits")
    val nSeg = bits + 1
    val m = media.select(col(idCol).cast("long").as("media_id"),
        col(bytesCol).cast("binary").as("bytes"))
      .withColumn("n", octet_length(col("bytes")).cast("long"))
      .where(col("n") >= nSeg)
    val segSums = m
      .select(col("media_id"), col("n"), col("bytes"),
        explode(sequence(lit(1L), col("n"))).as("pos"))
      .select(col("media_id"),
        (expr(s"((pos - 1) * $nSeg) div n") + 1L).as("seg"),
        ascii(expr("CAST(substring(bytes, pos, 1) AS STRING)"))
          .cast("long").as("bv"))
      .groupBy("media_id", "seg").agg(sum("bv").as("ss"))
    val nxt = segSums.select(col("media_id"), (col("seg") - 1L).as("seg"),
      col("ss").as("ss_next"))
    segSums.join(nxt, Seq("media_id", "seg"))
      .where(col("seg") <= bits)
      .select(col("media_id"), col("seg"),
        when(col("ss") > col("ss_next"), 1L).otherwise(0L).as("bit"))
      .groupBy(col("media_id"),
        expr("(seg - 1) div 16").as("band"))
      .agg(sum(expr("bit * shiftleft(1L, CAST((seg - 1) % 16 AS INT))"))
        .as("v"))
  }

  /** Perceptual near-dup pairs over the media payload column:
    * [[dHashSignatures]] bands bucket candidates (two media are
    * candidates iff they agree on at least one 16-bit band — LSH,
    * the SimHash-banding argument), buckets hotter than `maxBucket`
    * are dropped (the hot-bucket cap every LSH join in this engine
    * carries; a 16-bit band value shared by more media than that is
    * a degenerate gradient, not a duplicate signal), and candidates
    * are verified by EXACT Hamming distance over the full `bits`-bit
    * signature — `bit_count(xor(...))` per band, summed — keeping
    * pairs within `maxHamming`. Output: (id_a, id_b, hamming).
    *
    * Scale: signature work is linear in payload bytes; the bucket
    * join's fan-out is capped at maxBucket²·bands per bucket value;
    * verification joins the band table twice by key — equi-joins
    * end to end, no cartesian, no global window.
    */
  def dHashNearDup(media: DataFrame, bits: Int = 64,
                   maxHamming: Long = 6, maxBucket: Long = 32,
                   idCol: String = "media_id",
                   bytesCol: String = "bytes"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= bits,
      s"dHashNearDup: maxHamming in 0..$bits, got $maxHamming")
    require(maxBucket >= 2, s"dHashNearDup: maxBucket >= 2, got $maxBucket")
    dHashNearDupFromSigs(dHashSignatures(media, bits, idCol, bytesCol),
      maxHamming, maxBucket)
  }

  /** The LSH bucket-join + exact-Hamming verify of [[dHashNearDup]]
    * on an ALREADY-COMPUTED banded signature table (media_id, band,
    * v) — the seam that lets any signature producer (the stub byte
    * dHash, [[bmpDHashSignatures]]' real-pixel gradient, a future
    * native pHash) reuse the identical candidate machinery; the spec
    * pins that both producers reach the same join plan shape.
    */
  def dHashNearDupFromSigs(sigs0: DataFrame, maxHamming: Long = 6,
                           maxBucket: Long = 32): DataFrame = {
    require(maxBucket >= 2,
      s"dHashNearDupFromSigs: maxBucket >= 2, got $maxBucket")
    val sigs = sigs0
    val kept = sigs.join(
      sigs.groupBy("band", "v").agg(count(lit(1)).as("_bn"))
        .where(col("_bn") <= maxBucket)
        .select("band", "v"),
      Seq("band", "v"), "left_semi")
    val cand = kept.select(col("band"), col("v"), col("media_id").as("id_a"))
      .join(kept.select(col("band"), col("v"), col("media_id").as("id_b")),
        Seq("band", "v"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sigs.select(col("media_id").as("id_a"), col("band"),
        col("v").as("va")), Seq("id_a"))
      .join(sigs.select(col("media_id").as("id_b"), col("band"),
        col("v").as("vb")), Seq("id_b", "band"))
      .groupBy("id_a", "id_b")
      .agg(sum(expr("bit_count(va ^ vb)")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Media-aware dedup PROPAGATION — the step a text-only dedup
    * forgets: after exact-dup documents are dropped (keep the
    * smallest doc id per payload hash), any media referenced ONLY by
    * dropped docs is orphaned, and anything derived from an orphaned
    * media (thumbnails, frame features, embeddings) is transitively
    * orphaned too. Per media kind this reports the media population,
    * how many stay live, how many orphan, the payload bytes a GC
    * pass would reclaim, and the orphaned derived-row count.
    *
    * `refs` is the doc→media many-to-many edge list (a media shared
    * by a surviving doc stays live no matter how many referencing
    * docs were dropped); `derived` carries one row per derived
    * artifact keyed by media id.
    *
    * Scale: one text-hash aggregation for survivors, then semi/anti
    * equi-joins down the reference chain and a kind-keyed rollup —
    * no windows, no fan-out beyond the refs edge list itself.
    */
  def mediaDedupPropagation(docs: DataFrame, refs: DataFrame,
                            media: DataFrame, derived: DataFrame,
                            docId: String = "doc_id",
                            textCol: String = "text",
                            mediaId: String = "media_id"): DataFrame = {
    val survivors = docs
      .groupBy(md5(col(textCol)).as("_h"))
      .agg(min(col(docId)).as("doc_id"))
      .select("doc_id")
    val liveMedia = refs
      .select(col(docId).as("doc_id"), col(mediaId).as("media_id"))
      .join(survivors, Seq("doc_id"), "left_semi")
      .select("media_id").distinct()
    val m = media.select(col(mediaId).cast("long").as("media_id"),
      col("kind"), octet_length(col("bytes")).cast("long").as("payload_len"))
    val orphan = m.join(liveMedia, Seq("media_id"), "left_anti")
    val orphanDerived = derived
      .select(col(mediaId).cast("long").as("media_id"))
      .join(orphan.select("media_id"), Seq("media_id"), "left_semi")
      .groupBy("media_id").agg(count(lit(1)).as("_nd"))
    m.join(orphan.select(col("media_id"), lit(1L).as("_orph")),
        Seq("media_id"), "left")
      .join(orphanDerived, Seq("media_id"), "left")
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        sum(when(col("_orph").isNull, 1L).otherwise(0L)).as("n_live_media"),
        sum(coalesce(col("_orph"), lit(0L))).as("n_orphan_media"),
        sum(when(col("_orph") === 1L, col("payload_len")).otherwise(0L))
          .as("orphan_bytes"),
        sum(when(col("_orph") === 1L, coalesce(col("_nd"), lit(0L)))
          .otherwise(0L)).as("n_orphan_derived"))
      .orderBy("kind")
  }

  /** Cross-modal consistency audit — the doc ↔ media ↔ embedding
    * TOPOLOGY invariants a multimodal corpus must hold before
    * training: per media kind (plus "(none)" for docs with no media
    * row), how many ids exist on each side, which media are orphaned
    * (no doc), which docs are missing media, where the payload length
    * contradicts the doc's recorded size, and which media lack an
    * embedding. One full-outer + one left join, then a kind-keyed
    * rollup — no row ever fans out.
    */
  def crossModalAudit(docs: DataFrame, media: DataFrame, emb: DataFrame,
                      docId: String = "doc_id", mediaId: String = "media_id",
                      vecId: String = "vec_id"): DataFrame = {
    val d = docs.select(col(docId).cast("long").as("id"),
      col("n_chars").cast("long").as("n_chars"))
      .withColumn("_has_doc", lit(1L))
    val m = media.select(col(mediaId).cast("long").as("id"), col("kind"),
      octet_length(col("bytes")).cast("long").as("payload_len"))
    val e = emb.select(col(vecId).cast("long").as("id"))
      .distinct().withColumn("_has_emb", lit(1L))
    d.join(m, Seq("id"), "full_outer")
      .join(e, Seq("id"), "left")
      .groupBy(coalesce(col("kind"), lit("(none)")).as("kind"))
      .agg(
        count(lit(1)).as("n_ids"),
        sum(coalesce(col("_has_doc"), lit(0L))).as("n_docs"),
        sum(when(col("payload_len").isNotNull, 1L).otherwise(0L)).as("n_media"),
        sum(when(col("_has_doc").isNull && col("payload_len").isNotNull, 1L)
          .otherwise(0L)).as("n_orphan_media"),
        sum(when(col("_has_doc").isNotNull && col("payload_len").isNull, 1L)
          .otherwise(0L)).as("n_missing_media"),
        sum(when(col("payload_len").isNotNull && col("n_chars").isNotNull &&
            col("payload_len") =!= col("n_chars"), 1L)
          .otherwise(0L)).as("n_len_mismatch"),
        sum(when(col("payload_len").isNotNull && col("_has_emb").isNull, 1L)
          .otherwise(0L)).as("n_media_no_embedding"))
      .orderBy("kind")
  }
}
