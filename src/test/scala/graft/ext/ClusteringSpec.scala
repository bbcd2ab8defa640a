package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated blobs on a line (dim 4), ids 0..n-1. Seeds 0
    * and 1 land one in each blob, so one Lloyd iteration must
    * separate them perfectly.
    */
  private def blobs(n: Int) = {
    val rows = (0L until n.toLong).map { i =>
      val c = if (i % 2 == 0) 0.0f else 10.0f
      val jitter = (i % 5).toFloat / 100f
      (i, Array(c + jitter, c - jitter, c, c + jitter / 2), (i % 2).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("kmeans: separates two blobs with pure majority labels") {
    val out = Clustering.kmeans(blobs(40), k = 2, iters = 2).collect()
    assert(out.length === 2)
    // every member matches the cluster's top label: purity n == size
    out.foreach(r => assert(r.getAs[Long]("top_label_n") === r.getAs[Long]("n_members")))
    assert(out.map(_.getAs[Long]("n_members")).sum === 40)
    // the two blobs are size-balanced by construction
    assert(out.map(_.getAs[Long]("n_members")).toSet === Set(20L))
  }

  test("kmeans: bit-identical under repartitioning") {
    val d = blobs(60)
    val a = Clustering.kmeans(d, k = 2, iters = 2).collect().toSeq
    val b = Clustering.kmeans(d.repartition(7), k = 2, iters = 2).collect().toSeq
    assert(a === b)
  }

  test("kmeans: iterations do not increase inertia (quantized Lloyd)") {
    val d = blobs(50)
    def inertia(iters: Int) =
      Clustering.kmeans(d, k = 2, iters = iters)
        .agg(sum("inertia")).as[Double].head()
    val i0 = inertia(0) // distances to the raw (quantized) seed points
    val i2 = inertia(2)
    assert(i2 <= i0 + 1e-9, s"inertia grew: iters=0 → $i0, iters=2 → $i2")
  }

  test("kmeans: k=1 degenerates to one all-member cluster") {
    val out = Clustering.kmeans(blobs(30), k = 1, iters = 1).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_members") === 30)
  }

  test("kmeans: assignment pass is shuffle-free (broadcast-literal centroids)") {
    // The per-iteration aggregation is ONE exchange keyed by
    // (cluster, dim); the assignment itself adds none. With iters=0
    // the whole plan has exactly the final stats shuffles — no
    // per-row exchange proportional to k.
    val out = Clustering.kmeans(blobs(40), k = 2, iters = 0)
    val plan = out.queryExecution.executedPlan.toString
    // centroid argmin appears as a literal array expression, not a join
    assert(!plan.contains("SortMergeJoin"),
      s"kmeans assignment must not sort-merge join:\n$plan")
  }

  test("alsRankOne: dominant item wins; uniform matrix degenerates to ties") {
    import spark.implicits._
    // 3 users × {A, B}: every user spends 10× more on A → A's latent
    // score is the max (1.0) and B's is ~0.1
    val rows = Seq(
      ("u1", "A", 1000L), ("u1", "B", 100L),
      ("u2", "A", 2000L), ("u2", "B", 200L),
      ("u3", "A", 4000L), ("u3", "B", 400L))
    val out = Clustering.alsRankOne(rows.toDF("u", "i", "cents"),
        "u", "i", col("cents")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("A")._1 === 3L && out("B")._1 === 3L)
    assert(out("A")._2 === 1.0)
    assert(math.abs(out("B")._2 - 0.1) < 1e-3, s"B score ${out("B")._2}")

    // perfectly uniform matrix: all items tie at 1.0
    val uni = (for { u <- 1 to 4; i <- Seq("X", "Y", "Z") }
      yield (s"u$u", i, 500L)).toDF("u", "i", "cents")
    val all = Clustering.alsRankOne(uni, "u", "i", col("cents")).collect()
    assert(all.map(_.getDouble(2)).toSet === Set(1.0))
    // deterministic tie order: score desc then item asc
    assert(all.map(_.getString(0)).toSeq === Seq("X", "Y", "Z"))
  }

  test("alsRankOne: bit-identical under repartitioning") {
    import spark.implicits._
    val rows = (1 to 200).map(i =>
      (s"u${i % 23}", s"i${i % 7}", (i * 37 % 991).toLong + 1))
    val df = rows.toDF("u", "i", "cents")
    val a = Clustering.alsRankOne(df, "u", "i", col("cents"))
      .collect().toSeq
    val b = Clustering.alsRankOne(df.repartition(11), "u", "i", col("cents"))
      .collect().toSeq
    assert(a === b)
  }
}
