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
