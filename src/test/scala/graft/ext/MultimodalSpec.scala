package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf001, "documents")

  test("synthetic media carries binary payloads with typed metadata") {
    val m = Multimodal.syntheticMedia(docs)
    val schema = m.schema
    assert(schema("bytes").dataType.typeName === "binary")
    assert(m.count() === docs.count())
    val kinds = m.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("frame sampling explodes every-nth frame, videos get several") {
    val sampled = Multimodal.sampleFrames(Multimodal.syntheticMedia(docs), everyNth = 2)
    assert(sampled.count() >= docs.count()) // ≥1 frame each
    val video = sampled.filter(col("kind") === "video")
      .groupBy("media_id").count()
    assert(video.filter(col("count") > 1).count() > 0)
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.featurePipeline(docs).orderBy("media_id", "frame").collect()
    val f2 = Multimodal.featurePipeline(docs).orderBy("media_id", "frame").collect()
    assert(f1.map(_.getAs[Double]("feat_norm")).toSeq ===
      f2.map(_.getAs[Double]("feat_norm")).toSeq)
    // features have the declared dim and non-degenerate values
    val feats = f1.map(_.getAs[scala.collection.Seq[Float]]("feature"))
    assert(feats.forall(_.size === 16))
    assert(feats.flatten.distinct.size > 10)
  }

  test("frameDedup: shared payloads collide per-frame, unique ones don't") {
    import spark.implicits._
    // ids 0 and 1 share bytes (re-upload); id 3 is unique. With the
    // synthetic topology all three are single-frame media (id%3 != 2),
    // so the shared pair dups frame 0 and the loner stays clean.
    val d = Seq((0L, "same payload"), (1L, "same payload"),
      (3L, "different payload")).toDF("doc_id", "text")
    val out = Multimodal.frameDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_dup_frames"), r.getAs[Double]("dup_frac"))).toMap
    assert(out(0L) === ((1L, 1L, 1.0)))
    assert(out(1L) === ((1L, 1L, 1.0)))
    assert(out(3L) === ((1L, 0L, 0.0)))
    // same payload but DIFFERENT frame indexes do not collide: a
    // video (id % 3 == 2 → multi-frame) shares bytes with an image;
    // only the common frame 0 dups
    val v = Seq((2L, "vid payload"), (0L, "vid payload")).toDF("doc_id", "text")
    val out2 = Multimodal.frameDedup(v).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_dup_frames"))).toMap
    assert(out2(0L) === ((1L, 1L)))          // its single frame collides
    assert(out2(2L)._1 > 1L)                 // video sampled >1 frame
    assert(out2(2L)._2 === 1L)               // but only frame 0 dups
  }

  test("resizeMeta caps the longer side and keeps aspect") {
    val r = Multimodal.resizeMeta(Multimodal.syntheticMedia(docs), maxSide = 256)
      .select("width", "height", "out_width", "out_height").collect()
    r.foreach { row =>
      val (w, h, ow, oh) = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      assert(math.max(ow, oh) <= 256)
      if (math.max(w, h) <= 256) assert(ow === w && oh === h)
    }
  }

  test("cdcChunkBytes: chunks tile the payload; hashes are content-addressed") {
    import spark.implicits._
    val payload = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val m = Seq((1L, payload.getBytes("UTF-8")),
                (2L, payload.getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val ch = Multimodal.cdcChunkBytes(m, w = 8, divisor = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    // per media: chunks are contiguous (offsets tile 1..n, no gaps)
    for (id <- Seq(1L, 2L)) {
      val mine = ch.filter(_._1 == id).sortBy(_._2)
      assert(mine.head._3 === 1L)
      mine.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4, "chunks must tile")
        case _ => ()
      }
      assert(mine.map(_._4).sum === payload.length.toLong)
      assert(mine.length > 1, "a repetitive 800-byte payload must split")
    }
    // identical payloads → identical chunk hashes, refs count both
    val h1 = ch.filter(_._1 == 1L).sortBy(_._2).map(_._5).toSeq
    val h2 = ch.filter(_._1 == 2L).sortBy(_._2).map(_._5).toSeq
    assert(h1 === h2)
    assert(ch.forall(_._6 >= 2L), "every hash occurs in both copies")
  }

  test("cdcChunkBytes: byte-shift robustness — a prefix insertion preserves the downstream chunk-hash dictionary") {
    import spark.implicits._
    // deterministic NON-repeating payload (seeded LCG → printable
    // ASCII): every chunk is distinct, so the set measure below is
    // exact — a repetitive payload would collapse the dictionary
    val base = {
      var x = 123456789L
      val sb = new StringBuilder
      while (sb.length < 1500) {
        x = (6364136223846793005L * x + 1442695040888963407L)
        sb += (33 + java.lang.Long.remainderUnsigned(x >>> 16, 94)).toChar
      }
      sb.toString
    }
    val m = Seq((1L, base.getBytes("UTF-8")),
                (2L, ("XYZPREFIX-" + base).getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val ch = Multimodal.cdcChunkBytes(m, w = 8, divisor = 16).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val a = ch.filter(_._1 == 1L).map(_._2).toSet
    val b = ch.filter(_._1 == 2L).map(_._2).toSet
    // all but the first boundary realign: the shifted copy shares the
    // vast majority of chunk hashes with the original (fixed-size
    // chunking would share none)
    val shared = (a intersect b).size.toDouble / a.size
    assert(shared >= 0.8, s"only ${(shared * 100).round}% of chunk hashes survived the shift")
  }

  test("crossModalAudit: hand corpus — every defect column counts exactly") {
    import spark.implicits._
    // docs 1..4; media: doc 1 ok, doc 2 len-mismatch, doc 4 missing,
    // orphan id 99; embeddings for 1, 2 only (3 has media? no — doc 3
    // has media ok but no embedding)
    val docs = Seq((1L, 5L), (2L, 5L), (3L, 4L), (4L, 7L))
      .toDF("doc_id", "n_chars")
    val media = Seq(
      (1L, "image", "abcde"), // consistent
      (2L, "image", "abc"),   // payload_len 3 != n_chars 5
      (3L, "video", "wxyz"),  // consistent, but no embedding
      (99L, "audio", "zz")    // orphan: no doc 99
    ).toDF("media_id", "kind", "payload")
      .withColumn("bytes", col("payload").cast("binary")).drop("payload")
    val emb = Seq(1L, 2L).toDF("vec_id")
    val out = Multimodal.crossModalAudit(docs, media, emb).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    //                      n_ids n_docs n_media orphan missing mismatch no_emb
    assert(out("image") === ((2L, 2L, 2L, 0L, 0L, 1L, 0L)))
    assert(out("video") === ((1L, 1L, 1L, 0L, 0L, 0L, 1L)))
    assert(out("audio") === ((1L, 0L, 1L, 1L, 0L, 0L, 1L)))
    assert(out("(none)") === ((1L, 1L, 0L, 0L, 1L, 0L, 0L)))
  }

  test("dHashNearDup: planted single-byte twin lands within a small " +
    "Hamming radius; unrelated payloads stay apart") {
    import spark.implicits._
    val base = docs.filter(length(col("text")) >= 65)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("bytes"))
    // re-upload twins with one byte changed — the perceptual near-dup
    // an exact hash (q34's fingerprint) can never recover
    val twins = docs.filter(col("doc_id") % 17 === 4 &&
        length(col("text")) >= 65)
      .select((col("doc_id") + 2000000L).as("media_id"),
        concat(substring(col("text"), 1, 5), lit("z"),
          expr("substring(text, 7)")).cast("binary").as("bytes"))
    val nTwins = twins.count()
    assert(nTwins > 0, "planted twin set must be non-empty at sf0.001")
    val pairs = Multimodal.dHashNearDup(base.unionByName(twins),
      bits = 64, maxHamming = 6, maxBucket = 32)
    val found = pairs
      .filter(col("id_b") === col("id_a") + 2000000L).collect()
    // 100% planted recall: a one-byte edit perturbs one segment sum,
    // flipping at most 2 of 64 gradient bits — at least 3 of the 4
    // 16-bit bands survive intact, so LSH always buckets the pair
    assert(found.length.toLong === nTwins,
      s"recovered ${found.length} of $nTwins planted twins")
    assert(found.forall(_.getLong(2) <= 2L),
      "a single-byte edit must stay within Hamming 2")
    // identical payloads are Hamming 0 — the exact-dup degenerate case
    val self = Multimodal.dHashNearDup(
      base.unionByName(base.withColumn("media_id",
        col("media_id") + 5000000L)),
      bits = 64, maxHamming = 0, maxBucket = 32)
      .filter(col("id_b") === col("id_a") + 5000000L)
    assert(self.count() === base.count())
  }

  test("dHashNearDup plan: equi-joins end to end — no cartesian, no " +
    "nested-loop, no row-scale global window") {
    val base = docs.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("bytes"))
    val df = Multimodal.dHashNearDup(base)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(graft.PlanChecks.rowScaleGlobalWindows(df).isEmpty)
  }

  test("mediaDedupPropagation: hand corpus — shared media survive, " +
    "exclusive media of dropped dups orphan with their derived rows") {
    import spark.implicits._
    // docs: 1 and 2 are exact dups (same text) — 2 drops; 3 unique
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    // refs: each doc → own media (id), docs 1,2 also share media 100
    val refs = Seq((1L, 1L), (2L, 2L), (3L, 3L), (1L, 100L), (2L, 100L))
      .toDF("doc_id", "media_id")
    val media = Seq(
      (1L, "image", "aaaa"), (2L, "image", "bbbbbb"),
      (3L, "audio", "cc"), (100L, "video", "shared!")
    ).toDF("media_id", "kind", "p")
      .withColumn("bytes", col("p").cast("binary")).drop("p")
    val derived = Seq(1L, 1L, 2L, 3L, 100L).toDF("media_id")
    val out = Multimodal.mediaDedupPropagation(d, refs, media, derived)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // image: media 1 live (doc 1 survives), media 2 orphaned (doc 2
    // dropped; 6 bytes reclaim, 1 derived row orphaned)
    assert(out("image") === ((2L, 1L, 1L, 6L, 1L)))
    // audio: doc 3 survives → media 3 live
    assert(out("audio") === ((1L, 1L, 0L, 0L, 0L)))
    // video: media 100 shared with surviving doc 1 → live
    assert(out("video") === ((1L, 1L, 0L, 0L, 0L)))
  }

  test("frameEnergy: integer energies match a scalar replay of the " +
    "stub sample map, partial tail frame included") {
    import spark.implicits._
    val payload = "abc defg hij"  // 12 bytes → frames of 5: 5,5,2
    val m = Seq((7L, payload)).toDF("media_id", "p")
      .withColumn("bytes", col("p").cast("binary")).drop("p")
    val got = Multimodal.frameEnergy(m, frameBytes = 5).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val want = payload.getBytes("UTF-8").zipWithIndex
      .groupBy { case (_, i) => i / 5 }
      .map { case (f, bs) =>
        f.toLong -> bs.map { case (b, _) =>
          val v = (b.toLong % 7) - 3; v * v
        }.sum
      }
    assert(got === want)
  }

  test("frameEnergy: non-ASCII bytes (>= 0x80) decode as signed Java " +
    "bytes, matching the scalar replay exactly") {
    import spark.implicits._
    // every interesting region: 0x00, low ASCII, 0x7F, 0x80 (-128),
    // 0xC8 (-56), 0xFF (-1) — a string cast would mangle all of the
    // high half into U+FFFD (65533)
    val payload = Array[Byte](0, 7, 97, 127, -128, -56, -1, 42, -100)
    val m = Seq((3L, payload)).toDF("media_id", "bytes")
    val got = Multimodal.frameEnergy(m, frameBytes = 4).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val want = payload.zipWithIndex
      .groupBy { case (_, i) => i / 4 }
      .map { case (f, bs) =>
        f.toLong -> bs.map { case (b, _) =>
          val v = (b.toLong % 7) - 3; v * v
        }.sum
      }
    assert(got === want)
  }

  test("energySegments: runs merge, boundaries split, 0-based seg ids, " +
    "and frame mass is conserved") {
    import spark.implicits._
    // Build a payload whose 1-byte frames alternate states around a
    // threshold: 'a'(97%7=6,v=3,e=9), ' '(32%7=4,v=1,e=1)
    val m = Seq((1L, "aaa a aa")).toDF("media_id", "p")
      .withColumn("bytes", col("p").cast("binary")).drop("p")
    // frames: a a a _ a _ a a → active(e>=9): T T T F T F T T
    val segs = Multimodal.energySegments(m, frameBytes = 1, threshold = 9L)
      .orderBy("seg_id").collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))
    assert(segs === Array((0L, true, 0L, 3L), (1L, false, 3L, 1L),
      (2L, true, 4L, 1L), (3L, false, 5L, 1L), (4L, true, 6L, 2L)))
    assert(segs.map(_._4).sum === 8L, "every frame lands in one segment")
  }

  test("energySegments: single-state media is one segment; empty " +
    "payloads are excluded") {
    import spark.implicits._
    val m = Seq((1L, "aaaa"), (2L, "")).toDF("media_id", "p")
      .withColumn("bytes", col("p").cast("binary")).drop("p")
    val segs = Multimodal.energySegments(m, frameBytes = 2, threshold = 1L)
      .collect()
    assert(segs.length === 1)
    assert(segs.head.getLong(0) === 1L && segs.head.getLong(4) === 2L)
  }

  test("energySegments is deterministic under repartition") {
    import spark.implicits._
    val m = (1L to 20L).map(i => (i, "word " * i.toInt)).toDF("media_id", "p")
      .withColumn("bytes", col("p").cast("binary")).drop("p")
    val a = Multimodal.energySegments(m, 16, 40L)
      .orderBy("media_id", "seg_id").collect().toSeq
    val b = Multimodal.energySegments(m.repartition(7), 16, 40L)
      .orderBy("media_id", "seg_id").collect().toSeq
    assert(a === b)
  }

  // ——— the REAL WAV/PCM16 codec path (q340) ———

  /** Scalar replay of syntheticWav's generator for one media id:
    * the canonical 44-byte header + LE16 samples as Array[Byte]. */
  private def scalarWav(id: Long): Array[Byte] = {
    val sr = 8000L + (id % 3) * 4000L
    val ns = (96L + (id % 5) * 32L).toInt
    def le16(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val samples = (1 to ns).flatMap { t =>
      val u = (id * 131L + t * 17L) % 65536L
      val s = if (((t - 1) / 32) % 2 == 1) u / 64L - 512L else u - 32768L
      le16(if (s < 0) s + 65536L else s)
    }
    ("RIFF".getBytes("ASCII") ++ le32(36L + 2L * ns) ++
      "WAVEfmt ".getBytes("ASCII") ++ le32(16L) ++ le16(1L) ++ le16(1L) ++
      le32(sr) ++ le32(2L * sr) ++ le16(2L) ++ le16(16L) ++
      "data".getBytes("ASCII") ++ le32(2L * ns) ++ samples).toArray
  }

  test("syntheticWav emits byte-exact canonical RIFF/PCM16 containers " +
    "(scalar header + LE16 sample replay)") {
    val ids = Seq(0L, 5L, 7L).toDF("doc_id")
    val got = Multimodal.syntheticWav(ids).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    for (id <- Seq(0L, 5L, 7L))
      assert(java.util.Arrays.equals(got(id), scalarWav(id)),
        s"media $id: container bytes diverge from scalar replay")
  }

  test("wavHeader parses every field back from the binary and a " +
    "doctored container fails the validity gate, never decoding") {
    val wav = Multimodal.syntheticWav(Seq(4L).toDF("doc_id"))
    val h = Multimodal.wavHeader(wav).head()
    assert(h.getAs[Boolean]("wav_valid"))
    assert(h.getAs[Long]("audio_format") === 1L)
    assert(h.getAs[Long]("n_channels") === 1L)
    assert(h.getAs[Long]("sample_rate") === 12000L)  // 8000 + (4%3)*4000
    assert(h.getAs[Long]("byte_rate") === 24000L)
    assert(h.getAs[Long]("block_align") === 2L)
    assert(h.getAs[Long]("bits_per_sample") === 16L)
    assert(h.getAs[Long]("n_samples") === 96L + (4L % 5L) * 32L)
    // corrupt the RIFF magic's first byte: parse must reject, and the
    // PCM path must emit zero frames for it (gate, not garbage)
    val bad = wav.select(col("media_id"),
      concat(lit(Array[Byte]('X')),
        expr("substring(bytes, 2, octet_length(bytes) - 1)")).as("bytes"))
    assert(!Multimodal.wavHeader(bad).head().getAs[Boolean]("wav_valid"))
    assert(Multimodal.wavFrameEnergy(bad).count() === 0L)
    // truncated payload (data_size now inconsistent): also rejected
    val short = wav.select(col("media_id"),
      expr("substring(bytes, 1, octet_length(bytes) - 2)").as("bytes"))
    assert(!Multimodal.wavHeader(short).head().getAs[Boolean]("wav_valid"))
  }

  test("wavFrameEnergy equals a scalar decode of the container bytes " +
    "(endianness + sign-extension proof)") {
    val wav = Multimodal.syntheticWav(Seq(3L, 11L).toDF("doc_id"))
    val got = Multimodal.wavFrameEnergy(wav, frameSamples = 16)
      .orderBy("media_id", "frame").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Seq(3L, 11L).flatMap { id =>
      val b = scalarWav(id)
      val ns = ((b(40).toLong & 0xff) | ((b(41).toLong & 0xff) << 8) |
        ((b(42).toLong & 0xff) << 16)) / 2
      (0L until ns).map { i =>
        val u = (b(44 + 2 * i.toInt).toLong & 0xff) |
          ((b(45 + 2 * i.toInt).toLong & 0xff) << 8)
        val s = if (u >= 32768L) u - 65536L else u
        (id, i / 16) -> s * s
      }
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    assert(got === want)
  }

  // ——— the REAL BMP/24bpp codec path (q343) ———

  /** Scalar replay of syntheticBmp's generator: canonical 54-byte
    * headers + bottom-up BGR stride-padded pixel array. */
  private def scalarBmp(id: Long): Array[Byte] = {
    val w = (4L + id % 3).toInt
    val h = (3L + id % 2).toInt
    val stride = ((3 * w + 3) / 4) * 4
    def le16(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val px = (0 until h * stride).map { i =>
      val k = i % stride
      if (k < 3 * w) {
        val y = h - 1 - i / stride
        val x = k / 3
        val c = 2 - k % 3
        ((id * 7 + y * 131L + x * 17L + c * 29L) % 256L).toByte
      } else 0.toByte
    }
    ("BM".getBytes("ASCII") ++ le32(54L + stride.toLong * h) ++
      le32(0L) ++ le32(54L) ++ le32(40L) ++ le32(w) ++ le32(h) ++
      le16(1L) ++ le16(24L) ++ le32(0L) ++ le32(stride.toLong * h) ++
      le32(2835L) ++ le32(2835L) ++ le32(0L) ++ le32(0L) ++ px).toArray
  }

  test("syntheticBmp emits byte-exact 24bpp bottom-up DIBs, padding " +
    "included (scalar container replay)") {
    val got = Multimodal.syntheticBmp(Seq(0L, 1L, 2L, 5L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes"))
      .toMap
    for (id <- Seq(0L, 1L, 2L, 5L))
      assert(java.util.Arrays.equals(got(id), scalarBmp(id)),
        s"media $id: container bytes diverge from scalar replay")
  }

  test("bmpPixelStats equals a scalar pixel decode and the moment is " +
    "orientation-sensitive; doctored containers are gated out") {
    val bmp = Multimodal.syntheticBmp(Seq(1L, 4L).toDF("doc_id"))
    val got = Multimodal.bmpPixelStats(bmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))).toMap
    for (id <- Seq(1L, 4L)) {
      val w = 4L + id % 3; val h = 3L + id % 2
      val px = for (x <- 0L until w; y <- 0L until h; c <- 0L until 3L)
        yield (x, y, c, (id * 7 + y * 131 + x * 17 + c * 29) % 256)
      def cs(c: Long) = px.filter(_._3 == c).map(_._4).sum
      val moment = px.map { case (x, y, c, v) =>
        (y * 4096 + x * 8 + c) * v }.sum
      assert(got(id) === ((cs(0), cs(1), cs(2), moment)), s"media $id")
    }
    // a flipped magic byte is rejected by the header gate
    val bad = bmp.select(col("media_id"),
      concat(lit(Array[Byte]('X')),
        expr("substring(bytes, 2, octet_length(bytes) - 1)")).as("bytes"))
    assert(Multimodal.bmpPixelStats(bad).count() === 0L)
    // a truncated container (sizes now inconsistent) is rejected too
    val short = bmp.select(col("media_id"),
      expr("substring(bytes, 1, octet_length(bytes) - 1)").as("bytes"))
    assert(Multimodal.bmpPixelStats(short).count() === 0L)
  }

  test("bmpDHashSignatures: pixel-perturbed twin recall law — every " +
    "planted twin recovered within Hamming 6; identical images at 0") {
    import graft.ext.Multimodal
    val base = docs.filter(col("doc_id") < 64)
    val n = base.count()
    assert(n > 0)
    // lineage cut: the staged container construction must not re-inline
    // into the 216 positional grid reads (the HOF re-inline trap)
    val orig = Multimodal.syntheticBmp(base).localCheckpoint()
    val twin = Multimodal.perturbBmpPixelByte(orig, lit(0L),
      col("media_id") + 1000000L)
    val pairs = Multimodal.dHashNearDupFromSigs(
      Multimodal.bmpDHashSignatures(
        orig.unionByName(twin).localCheckpoint()),
      maxHamming = 6, maxBucket = 32)
    val planted = pairs.filter(col("id_b") === col("id_a") + 1000000L)
      .collect()
    // the +128 blue-channel edit at pixel (0, h-1) only reaches grid
    // cells with px = 0, py = h-1 — all in grid rows gy ∈ {6,7}, i.e.
    // band 3 — so ≤ 6 gradient bits can flip and bands 0-2 always
    // bucket the pair: 100% planted recall by construction
    assert(planted.length.toLong === n,
      s"recovered ${planted.length} of $n planted pixel twins")
    assert(planted.forall(_.getAs[Long]("hamming") <= 6L))
    val self = Multimodal.dHashNearDupFromSigs(
      Multimodal.bmpDHashSignatures(
        orig.unionByName(orig.withColumn("media_id",
          col("media_id") + 5000000L)).localCheckpoint()),
      maxHamming = 0, maxBucket = 32)
      .filter(col("id_b") === col("id_a") + 5000000L)
    assert(self.count() === n, "identical pixels must hash identically")
  }

  test("bmpAHashSignatures: identical images collide at Hamming 0; " +
    "planted pixel twins recalled within Hamming 8; aHash and dHash " +
    "signatures genuinely differ") {
    import graft.ext.Multimodal
    val base = docs.filter(col("doc_id") < 64)
    val n = base.count()
    assert(n > 0)
    val orig = Multimodal.syntheticBmp(base).localCheckpoint()
    val twin = Multimodal.perturbBmpPixelByte(orig, lit(0L),
      col("media_id") + 1000000L)
    val pairs = Multimodal.dHashNearDupFromSigs(
      Multimodal.bmpAHashSignatures(
        orig.unionByName(twin).localCheckpoint()),
      maxHamming = 8, maxBucket = 32)
    val planted = pairs.filter(col("id_b") === col("id_a") + 1000000L)
      .collect()
    // unlike dHash, the +128 pixel edit also shifts the GLOBAL mean,
    // so borderline cells anywhere can flip — but the shift is < 1
    // gray unit (≤ 6 sampling cells × ~14 / 64), so every planted
    // twin still lands within the radius on this fixture
    assert(planted.length.toLong === n,
      s"recovered ${planted.length} of $n planted pixel twins")
    assert(planted.forall(_.getAs[Long]("hamming") <= 8L))
    val self = Multimodal.dHashNearDupFromSigs(
      Multimodal.bmpAHashSignatures(
        orig.unionByName(orig.withColumn("media_id",
          col("media_id") + 5000000L)).localCheckpoint()),
      maxHamming = 0, maxBucket = 32)
      .filter(col("id_b") === col("id_a") + 5000000L)
    assert(self.count() === n, "identical pixels must hash identically")
    // the two hashes measure different structure: their 64-bit
    // signatures differ on this corpus (not a renamed dHash)
    val a = Multimodal.bmpAHashSignatures(orig)
      .groupBy("media_id").agg(sum(col("v") * (col("band") + 1L))
        .as("sig")).orderBy("media_id").collect().map(_.getLong(1))
    val d = Multimodal.bmpDHashSignatures(orig)
      .groupBy("media_id").agg(sum(col("v") * (col("band") + 1L))
        .as("sig")).orderBy("media_id").collect().map(_.getLong(1))
    assert(a.toSeq !== d.toSeq)
  }

  test("bmp and stub dHash share the LSH bucket-join machinery: " +
    "identical near-dup join shape, no cartesian / nested-loop / " +
    "row-scale window") {
    import graft.ext.Multimodal
    val base = docs.filter(col("doc_id") < 16)
    val bmpSigs = Multimodal.bmpDHashSignatures(
      Multimodal.syntheticBmp(base).localCheckpoint())
    val stubSigs = Multimodal.dHashSignatures(
      base.select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("bytes")))
    def bandJoinShape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.toString.linesIterator
        .filter(l => l.contains("Join") && l.contains("band#"))
        .map(_.replaceAll("^[-+:| ]+", "").replaceAll("#\\d+L?", "#").trim)
        .toSeq
    val bmpPlan = Multimodal.dHashNearDupFromSigs(bmpSigs)
    val stubPlan = Multimodal.dHashNearDupFromSigs(stubSigs)
    assert(bandJoinShape(bmpPlan) === bandJoinShape(stubPlan),
      "the signature producer swapped but the candidate machinery " +
        "must not")
    val phys = bmpPlan.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), phys)
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys)
    assert(graft.PlanChecks.rowScaleGlobalWindows(bmpPlan).isEmpty)
  }

  test("stub and PCM segmentation share the run-merge plan shape: one " +
    "media-partitioned Window each, no global window in either") {
    val wav = Multimodal.syntheticWav(Seq(1L, 2L).toDF("doc_id"))
    val stubM = Seq((1L, "abcd" * 16)).toDF("media_id", "p")
      .withColumn("bytes", col("p").cast("binary")).drop("p")
    def windowShape(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.toString.linesIterator
        .filter(_.contains("Window ["))
        .map(_.replaceAll("^[-+:| ]+", "").replaceAll("#\\d+L?", "#").trim)
        .toSeq
    val pcm = windowShape(Multimodal.wavSegments(wav))
    val stub = windowShape(Multimodal.energySegments(stubM))
    assert(pcm === stub, s"pcm:\n${pcm.mkString("\n")}\nstub:\n${
      stub.mkString("\n")}")
    assert(pcm.nonEmpty && pcm.forall(_.contains("media_id#")),
      "every run-merge window must be media-partitioned")
    assert(graft.PlanChecks.rowScaleGlobalWindows(
      Multimodal.wavSegments(wav)).isEmpty)
  }
}
