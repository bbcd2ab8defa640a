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
}
