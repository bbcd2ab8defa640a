package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def labeled = {
    val toks = TextStats.tokens(col("text"))
    Tables.load(spark, sf001, "documents").withColumn("y",
      (array_contains(toks, "spark") && array_contains(toks, "stream") &&
        array_contains(toks, "window")).cast("int"))
  }

  test("bucket: md5-derived, non-negative, stable, within [0, dim)") {
    val toks = Seq("alpha", "beta", "gamma", "the", "a").toDF("t")
    val bs = toks.select(Classifier.bucket($"t", 64).as("b")).collect()
      .map(_.getLong(0))
    assert(bs.forall(b => b >= 0 && b < 64))
    val again = toks.select(Classifier.bucket($"t", 64).as("b")).collect()
      .map(_.getLong(0))
    assert(bs.toSeq === again.toSeq)
  }

  test("IRLS separates a planted separable corpus perfectly") {
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "good clean prose sentence", 1)
      else (i.toLong, "bad noisy garbage junk", 0)
    }.toDF("doc_id", "text", "y")
    val m = Classifier.train(docs, "y", dim = 64, iters = 2)
    val wrong = Classifier.score(docs, m).join(docs.select($"doc_id", $"y"), "doc_id")
      .filter(($"pred" && $"y" === 0) || (!$"pred" && $"y" === 1)).count()
    assert(wrong === 0L)
  }

  test("distills a k-of-n teacher rule from real docs (needle in 256 buckets)") {
    val d = labeled
    val m = Classifier.train(d, "y", dim = 256, iters = 3)
    val scored = Classifier.score(d, m).join(d.select($"doc_id", $"y"), "doc_id")
    val acc = scored.filter(($"pred" && $"y" === 1) || (!$"pred" && $"y" === 0))
      .count().toDouble / scored.count()
    assert(acc >= 0.95, s"distillation accuracy $acc")
  }

  test("more IRLS iterations do not worsen the fit (log-loss descent)") {
    val d = labeled
    val l1 = Classifier.logLoss(d, Classifier.train(d, "y", iters = 1), "y")
    val l3 = Classifier.logLoss(d, Classifier.train(d, "y", iters = 3), "y")
    assert(l3 <= l1 + 1e-9, s"loss rose: $l1 -> $l3")
  }

  test("literal-map and broadcast-join margins are bit-identical") {
    val d = labeled
    val m = Classifier.train(d, "y", iters = 2)
    def scores(via: Boolean) =
      Classifier.score(d, m, viaJoin = Some(via)).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // both paths fold ascending-bucket — exact double equality
    assert(scores(false) === scores(true))
    // and the join path's plan actually broadcasts the weights
    val plan = Classifier.score(d, m, viaJoin = Some(true))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("scores are bit-identical under different partitionings") {
    val d = labeled
    val m = Classifier.train(d, "y", iters = 2)
    def scores(df: org.apache.spark.sql.DataFrame) =
      Classifier.score(df, m).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = scores(d)
    val b = scores(d.repartition(17))
    assert(a === b) // exact double equality — the ordered-fold contract
  }
}
