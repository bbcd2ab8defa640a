package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared oracle artifacts: tiny parquet tables the Spark query
  * materializes so the DuckDB oracle can read the SAME values —
  * closing the four queries whose arithmetic has no SQL twin
  * (round-2 verdict's top item):
  *
  *  - q42: the splitmix64 hyperplane family → signature/bucket logic
  *    becomes plain sign-of-dot-product SQL.
  *  - q48: the trained k-means centroids → assignment/probing becomes
  *    plain argmin SQL (the float-mean training pass, which IS
  *    engine-private, is shared as data instead of re-derived).
  *  - q61: native-xxhash64 SimHash signatures recomputed on the
  *    driver with the INDEPENDENT scalar pipeline below (own xxh64,
  *    own tokenizer, own vote loop) — the oracle groups over the
  *    reference signatures, so the Catalyst expression is verified
  *    end-to-end, not assumed.
  *  - q44: the stub codec's feature norms recomputed with a scalar
  *    loop — the oracle re-derives the media/frame topology from
  *    `documents` in SQL and takes only the codec seam's values from
  *    the fixture, so the distributed plumbing (synthesis, frame
  *    explode, batched mapPartitions, norm arithmetic) is what the
  *    hash compare actually checks.
  *
  * Writes are gated on `-Dgraft.verify.artifacts=true` (set by
  * Verify.main): the bench must not absorb fixture IO, and only the
  * correctness gate consumes these files. Paths are absolute because
  * the oracle SQL is a static string executed by the driver's DuckDB
  * process, whatever its working directory.
  */
object Fixtures {

  /** Resolved at runtime to an ABSOLUTE path (the oracle SQL string
    * must work in the driver's DuckDB process whatever its working
    * directory) without baking in a checkout location; overridable
    * with -Dgraft.verify.artifactsDir for unusual layouts. Verify and
    * the SQL dump run in the same JVM, so the paths always agree.
    */
  lazy val dir: String = sys.props.getOrElse("graft.verify.artifactsDir",
    new java.io.File("target/verify_artifacts").getAbsolutePath)

  def enabled: Boolean = sys.props.get("graft.verify.artifacts").contains("true")

  /** Glob the oracle SQL uses to read artifact `name`. */
  def sqlPath(name: String): String = s"$dir/$name/*.parquet"

  /** Write artifact `name` (tiny: ≤ a few thousand rows) when the
    * gate is on. `df` is BY-NAME: fixture construction (driver-side
    * collects + scalar reference loops) must not run at all outside
    * Verify — a bench run pays neither the compute nor the IO.
    */
  def write(name: String, df: => DataFrame): Unit = {
    if (enabled)
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
  }

  // ——— q61: scalar SimHash reference ———

  /** Scalar twin of `TextStats.tokens` (split(lower(text), "\s+")).
    * Java's default `split` drops trailing empties; Spark's keeps
    * them (limit -1), so the limit is explicit.
    */
  def tokensScalar(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)

  /** Scalar twin of the native `SimHash64` expression: xxhash64
    * (seed 42, via the independent Xxh64Ref) of each token votes ±1
    * per bit; sign vector → long. Mirrors the expression's contract
    * exactly: strictly-positive vote sets the bit.
    */
  def simhashScalar(text: String): Long = {
    val votes = new Array[Int](64)
    tokensScalar(text).foreach { t =>
      val h = graft.functions.Xxh64Ref.hashUtf8(t, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** (doc_id, simhash) for every document, computed entirely on the
    * driver with the scalar reference pipeline. Fixture-sized by
    * construction (one row per doc at oracle scale).
    */
  def simhashFixture(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs.select("doc_id", "text").collect().map { r =>
      (r.getLong(0), simhashScalar(r.getString(1)))
    }
    rows.toSeq.toDF("doc_id", "simhash")
  }

  /** Scalar twin of `Dedup.winnowingFingerprints(nativeHash = true)`,
    * computed with an INDEPENDENT pipeline (own normalizer, own xxh64
    * via Xxh64Ref, own window-min loop, own rightmost-min tie rule via
    * the same c = h·2²⁴ + (2²⁴−1−pos) packing) — the q61 discipline:
    * the oracle posting-joins over these reference fingerprints, so
    * the distributed gram explode / window / selection is verified
    * end-to-end against a second implementation, not assumed. Returns
    * distinct (doc_id, fp).
    */
  def winnowingXxFixture(docs: DataFrame, k: Int = 5,
                         w: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs.select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val s = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ")
      val len = s.length
      val nGram = math.max(len - k, 0) + 1 // positions 0..max(len-k,0)
      val hs = new Array[Long](nGram)
      var p = 0
      while (p < nGram) {
        val g = s.substring(p, math.min(p + k, len))
        hs(p) = java.lang.Math.floorMod(
          graft.functions.Xxh64Ref.hashUtf8(g, 42L), 1L << 36)
        p += 1
      }
      val sel = scala.collection.mutable.Set.empty[Long]
      var pos = 0
      while (pos < nGram) {
        if (pos == 0 || pos <= nGram - w) {
          var m = Long.MaxValue
          var q = pos
          while (q < math.min(pos + w, nGram)) {
            val c = hs(q) * 16777216L + (16777215L - q)
            if (c < m) m = c
            q += 1
          }
          sel += m / 16777216L
        }
        pos += 1
      }
      sel.toSeq.map(fp => (id, fp))
    }
    rows.toSeq.toDF("doc_id", "fp")
  }

  // ——— q44: scalar multimodal-codec reference ———

  /** (media_id, frame, feat_norm) recomputed scalar-side: same media
    * topology as `Multimodal.syntheticMedia`/`sampleFrames` (the SQL
    * oracle re-derives THAT part independently from `documents`),
    * with the codec seam (`fakeDecode`) and the norm evaluated in a
    * plain loop instead of the distributed batched pipeline.
    * `feat_norm` rounds exactly as Spark's `round` (HALF_UP on
    * BigDecimal.valueOf).
    */
  def multimodalFixture(docs: DataFrame, everyNth: Int = 2, dim: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs.select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val nFrames = if (id % 3 == 2) (id % 10 + 2).toInt else 1
      (0 until nFrames by everyNth).map { frame =>
        val feat = graft.ext.Multimodal.fakeDecode(bytes, frame, dim)
        var s = 0.0
        feat.foreach(x => s += x.toDouble * x.toDouble)
        val norm = java.math.BigDecimal.valueOf(math.sqrt(s))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (id, frame, norm)
      }
    }
    rows.toSeq.toDF("media_id", "frame", "feat_norm")
  }

  /** (media_id, frame, featcsv) recomputed scalar-side for q120:
    * the codec seam's feature vectors rendered exactly as
    * `Multimodal.frameFingerprint` renders them (micro-unit longs,
    * HALF_UP) — the oracle md5s this CSV itself, so the fingerprint
    * arithmetic is verified, not copied.
    */
  def multimodalFrameCsvFixture(docs: DataFrame, everyNth: Int = 2,
                                dim: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs.select("doc_id", "text").collect().flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val nFrames = if (id % 3 == 2) (id % 10 + 2).toInt else 1
      (0 until nFrames by everyNth).map { frame =>
        val feat = graft.ext.Multimodal.fakeDecode(bytes, frame, dim)
        val csv = feat.map { x =>
          java.math.BigDecimal.valueOf(x.toDouble * 1000000)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue().toString
        }.mkString(",")
        (id, frame, csv)
      }
    }
    rows.toSeq.toDF("media_id", "frame", "featcsv")
  }

  // ——— q42 / q48: engine-parameter tables ———

  /** SparkSession-independent writer for a centroid/hyperplane-style
    * (id, components) table.
    */
  def vectorTable(spark: SparkSession, idName: String, compName: String,
                  rows: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    rows.toDF(idName, compName)
  }

  def floatVectorTable(spark: SparkSession, idName: String, compName: String,
                       rows: Seq[(Int, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF(idName, compName)
  }

  /** PQ codebook table: (sub, code, comps) — the trained per-subspace
    * centroids shared as data so the oracle replays encode + ADC.
    */
  def pqTable(spark: SparkSession,
              rows: Seq[(Int, Int, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("sub", "code", "comps")
  }
}
