package graft.queries

import graft.Tables
import graft.ext.{Corpus, Evals, TextStats}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation battery (`ext.Corpus`) over the `documents` and
  * `embeddings` tables: repetition quality gates, stratified
  * sampling, token chunking, cross-modal joins. Oracles mirror the
  * engine arithmetic exactly (same tokenization regex, same md5
  * ordering, same ceil/stride chunk math).
  */
object CorpusQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  val queries: Seq[Q] = Seq(

    // ——— repetition quality signals (Gopher-style gates) ———
    Q("q62_repetition_stats",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents
        |), base AS (
        |  SELECT doc_id,
        |    ROUND(CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6) AS distinct_ratio,
        |    ts
        |  FROM toks
        |), bg AS (
        |  SELECT doc_id, distinct_ratio,
        |    unnest(CASE WHEN len(ts) >= 2
        |      THEN list_transform(range(1, len(ts)), i -> concat(ts[i], ' ', ts[i+1]))
        |      ELSE [''] END) AS bigram
        |  FROM base
        |), cnt AS (
        |  SELECT doc_id, distinct_ratio, bigram, COUNT(*) AS c
        |  FROM bg GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, distinct_ratio,
        |  ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_bigram_frac
        |FROM cnt GROUP BY 1, 2
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.repetitionStats(docs(s, dir)).orderBy("doc_id")
    },

    // ——— deterministic stratified sample: 5 docs per language by
    //     md5(id) order (RNG-free, partition-invariant) ———
    Q("q63_stratified_sample",
      """WITH ranked AS (
        |  SELECT doc_id, lang, source,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents
        |)
        |SELECT doc_id, lang, source FROM ranked WHERE rn <= 5
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.stratifiedSample(
        docs(s, dir).select("doc_id", "lang", "source"), "lang", k = 5)
        .orderBy("doc_id")
    },

    // ——— fixed-size token chunking with overlap (context windows):
    //     chunkSize 32, overlap 8 → stride 24 ———
    Q("q64_chunking",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents
        |), starts AS (
        |  SELECT doc_id, ts,
        |    unnest(range(0, GREATEST(
        |      CAST(ceil(CAST(len(ts) - 8 AS DOUBLE) / 24) AS INT), 1))) AS chunk_id
        |  FROM toks
        |)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |  array_to_string(ts[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ') AS chunk_text,
        |  CAST(LEAST(len(ts) - (chunk_id * 24 + 1) + 1, 32) AS BIGINT) AS n_tokens
        |FROM starts
        |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      Corpus.chunk(docs(s, dir), chunkSize = 32, overlap = 8)
        .orderBy("doc_id", "chunk_id")
    },

    // ——— greedy sequence packing: each document assigned to the
    //     fixed token-budget bin its first token lands in when the
    //     stratum is concatenated in id order (offset packing — the
    //     pre-training batch-packing step). Integer div on a running
    //     window sum: engine-exact, one exchange on the stratum. ———
    Q("q93_sequence_packing",
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT *, SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
        |FROM c
        |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      Corpus.packByTokenBudget(docs(s, dir), budget = 2048L)
        .orderBy("lang", "doc_id")
    },

    // ——— token-budget water-filling: the max-min-fair source
    //     allocation under a 60% corpus budget — common water level,
    //     small sources untrimmed. Integer pivot arithmetic over the
    //     source dictionary (Ranks running-sum decomposition). ———
    Q("q328_budget_waterfill",
      """WITH per AS (
        |  SELECT source AS grp,
        |    CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT)
        |      AS t
        |  FROM documents GROUP BY 1
        |), r AS (
        |  SELECT grp, t,
        |    CAST(row_number() OVER (ORDER BY t, grp) AS BIGINT) AS rk,
        |    CAST(SUM(t) OVER (ORDER BY t, grp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM per
        |), tot AS (
        |  SELECT CAST(SUM(t) AS BIGINT) AS tt,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM per
        |), w AS (
        |  SELECT r.*, tot.n,
        |    CAST(floor(CAST(tot.tt AS DOUBLE) * CAST(0.6 AS DOUBLE))
        |      AS BIGINT) AS b,
        |    r.cum + (tot.n - r.rk) * r.t AS used_here
        |  FROM r CROSS JOIN tot
        |), p AS (
        |  SELECT MAX(rk) AS prk, MAX(cum) AS pcum
        |  FROM w WHERE used_here <= b
        |), f AS (
        |  SELECT w.grp, w.t, w.b,
        |    CASE WHEN p.prk IS NULL THEN w.b // w.n
        |         WHEN p.prk = w.n THEN NULL
        |         ELSE (w.b - p.pcum) // (w.n - p.prk) END AS cap
        |  FROM w CROSS JOIN p
        |)
        |SELECT grp, t AS n_tokens, b AS budget, cap,
        |  LEAST(t, COALESCE(cap, t)) AS allocation,
        |  t - LEAST(t, COALESCE(cap, t)) AS trimmed,
        |  round(CAST(t - LEAST(t, COALESCE(cap, t)) AS DOUBLE) / t, 6)
        |    AS trim_frac
        |FROM f ORDER BY grp""".stripMargin) { (s, dir) =>
      Corpus.budgetWaterfill(docs(s, dir), budgetFrac = 0.6)
    },

    // ——— packing-contamination audit: how many causal attention
    //     pairs in q93's packs CROSS document boundaries when trained
    //     without block-diagonal masks — all-integer pair accounting
    //     (T(T−1)/2 halving exact), per-stratum ratio. ———
    Q("q324_packing_contamination",
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT *, SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |), p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
        |  FROM c
        |), pp AS (
        |  SELECT lang, bin, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY lang, bin ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
        |      AS prefix
        |  FROM p
        |), pk AS (
        |  SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tt,
        |    CAST(SUM(n_tokens * prefix) AS BIGINT) AS cross_p
        |  FROM pp GROUP BY 1, 2
        |)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_packs,
        |  CAST(SUM(nd) AS BIGINT) AS n_docs,
        |  CAST(SUM(tt) AS BIGINT) AS n_tokens,
        |  CAST(SUM(cross_p) AS BIGINT) AS cross_pairs,
        |  CAST(SUM(tt * (tt - 1) // 2) AS BIGINT) AS total_pairs,
        |  CASE WHEN SUM(tt * (tt - 1) // 2) > 0 THEN
        |    round(CAST(SUM(cross_p) AS DOUBLE)
        |      / SUM(tt * (tt - 1) // 2), 6) END AS contamination
        |FROM pk GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Corpus.packingContamination(docs(s, dir), budget = 2048L)
    },

    // ——— content-defined chunking: rolling-hash (md5-hex7) boundary
    //     whenever the 3-token window divides 16 — shift-robust
    //     chunking whose fingerprints survive insertions (the CDC
    //     dedup splitter). Full SQL replay: per-position window hash,
    //     exclusive running boundary count, ordered string_agg. ———
    Q("q102_cdc_chunks",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents
        |), idx AS (
        |  SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM toks
        |), pos AS (
        |  SELECT doc_id, CAST(i - 1 AS INT) AS pos, ts[i] AS tok,
        |    CASE WHEN i <= len(ts) - 2 AND
        |      CAST(concat('0x', substring(md5(array_to_string(ts[i:i+2], ' ')), 1, 7))
        |        AS BIGINT) % 16 = 0
        |    THEN 1 ELSE 0 END AS flag
        |  FROM idx
        |), ch AS (
        |  SELECT doc_id, pos, tok,
        |    COALESCE(SUM(flag) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |  FROM pos
        |)
        |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
        |  md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
        |FROM ch
        |GROUP BY doc_id, chunk_id
        |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      Corpus.cdcChunks(docs(s, dir), w = 3, divisor = 16)
        .orderBy("doc_id", "chunk_id")
    },

    // ——— content-defined chunking over the raw BINARY payload (the
    //     media twin of q102): md5-hex7 of each 8-byte window, chunk
    //     boundary when it divides 32; chunk hashes become the
    //     cross-upload dedup dictionary for opaque payloads. Spark
    //     runs on BinaryType end to end; the oracle replays the same
    //     byte math on the (all-ASCII) text the payload was staged
    //     from — one character IS one byte here by construction. ———
    Q("q291_media_cdc_chunks",
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, CAST(strlen(text) AS BIGINT) AS n
        |  FROM documents WHERE strlen(text) > 0
        |), p AS (
        |  SELECT media_id, text, n, unnest(range(1, n + 1)) AS pos FROM m
        |), f AS (
        |  SELECT media_id, pos,
        |    CASE WHEN pos <= n - 7 AND
        |      CAST(concat('0x', substring(md5(substring(text, CAST(pos AS INT), 8)), 1, 7)) AS BIGINT) % 32 = 0
        |    THEN 1 ELSE 0 END AS flag
        |  FROM p
        |), ch AS (
        |  SELECT media_id, pos,
        |    COALESCE(SUM(flag) OVER (PARTITION BY media_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |  FROM f
        |), g AS (
        |  SELECT media_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        |    CAST(MIN(pos) AS BIGINT) AS "offset",
        |    CAST(COUNT(*) AS BIGINT) AS n_bytes
        |  FROM ch GROUP BY 1, 2
        |), h AS (
        |  SELECT g.media_id, g.chunk_id, g."offset", g.n_bytes,
        |    md5(substring(m.text, CAST(g."offset" AS INT),
        |      CAST(g.n_bytes AS INT))) AS chunk_hash
        |  FROM g JOIN m USING (media_id)
        |)
        |SELECT media_id, chunk_id, "offset", n_bytes, chunk_hash,
        |  CAST(COUNT(*) OVER (PARTITION BY chunk_hash) AS BIGINT) AS hash_refs
        |FROM h ORDER BY media_id, chunk_id""".stripMargin) { (s, dir) =>
      import graft.ext.Multimodal
      Multimodal.cdcChunkBytes(
          Multimodal.syntheticMedia(docs(s, dir)).toDF(), w = 8, divisor = 32)
        .orderBy("media_id", "chunk_id")
    },

    // ——— cross-modal consistency audit: doc ↔ media ↔ embedding
    //     topology invariants over a corpus with PLANTED deterministic
    //     defects (missing media for doc_id%7=3, 3-byte payload
    //     truncation for doc_id%11=5, orphan media for doc_id%13=1 at
    //     id+1e6, embeddings absent for vec_id%5=2) — every audit
    //     column is provably nonzero, not vacuously clean. ———
    Q("q292_crossmodal_audit",
      """WITH m0 AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(strlen(text) AS BIGINT) AS len0
        |  FROM documents
        |), media AS (
        |  SELECT doc_id AS id, kind,
        |    CASE WHEN doc_id % 11 = 5 THEN greatest(len0 - 3, 0)
        |      ELSE len0 END AS payload_len
        |  FROM m0 WHERE doc_id % 7 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS id, kind, len0 AS payload_len
        |  FROM m0 WHERE doc_id % 13 = 1
        |), d AS (
        |  SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS n_chars,
        |    1 AS has_doc
        |  FROM documents
        |), e AS (
        |  SELECT DISTINCT vec_id AS id, 1 AS has_emb FROM embeddings
        |  WHERE vec_id % 5 <> 2
        |), j AS (
        |  SELECT COALESCE(d.id, media.id) AS id, d.has_doc, d.n_chars,
        |    media.kind, media.payload_len
        |  FROM d FULL OUTER JOIN media ON d.id = media.id
        |), j2 AS (SELECT j.*, e.has_emb FROM j LEFT JOIN e ON j.id = e.id)
        |SELECT COALESCE(kind, '(none)') AS kind,
        |  CAST(COUNT(*) AS BIGINT) AS n_ids,
        |  CAST(SUM(COALESCE(has_doc, 0)) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN payload_len IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_media,
        |  CAST(SUM(CASE WHEN has_doc IS NULL AND payload_len IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_media,
        |  CAST(SUM(CASE WHEN has_doc IS NOT NULL AND payload_len IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_media,
        |  CAST(SUM(CASE WHEN payload_len IS NOT NULL AND n_chars IS NOT NULL
        |    AND payload_len <> n_chars THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_len_mismatch,
        |  CAST(SUM(CASE WHEN payload_len IS NOT NULL AND has_emb IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_media_no_embedding
        |FROM j2 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.ext.Multimodal
      val d = docs(s, dir)
      val media0 = Multimodal.syntheticMedia(d).toDF()
      val media = media0.filter(col("media_id") % 7 =!= 3)
        .withColumn("bytes", when(col("media_id") % 11 === 5,
            expr("substring(bytes, 1, greatest(octet_length(bytes) - 3, 0))"))
          .otherwise(col("bytes")))
        .unionByName(media0.filter(col("media_id") % 13 === 1)
          .withColumn("media_id", col("media_id") + 1000000L))
      Multimodal.crossModalAudit(d,
        media, emb(s, dir).filter(col("vec_id") % 5 =!= 2))
    },

    // ——— order-independent dataset fingerprint manifest: per-shard
    //     (id mod 16) XOR multiset hash of id+content leaf hashes +
    //     the corpus root (shard −1) — verifiable dataset versioning
    //     whose digest is a plain commutative aggregate (insertion
    //     order / partitioning / merge order cannot change it), and a
    //     one-row change localizes to a shard without row data. ———
    Q("q293_fingerprint_manifest",
      """WITH leaves AS (
        |  SELECT doc_id % 16 AS shard,
        |    CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
        |      ':', md5(text))), 1, 15)) AS BIGINT) AS leaf
        |  FROM documents
        |), sh AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(bit_xor(leaf) AS BIGINT) AS digest
        |  FROM leaves GROUP BY 1
        |)
        |SELECT CAST(shard AS BIGINT) AS shard, n_docs, digest FROM sh
        |UNION ALL
        |SELECT -1, CAST(SUM(n_docs) AS BIGINT), CAST(bit_xor(digest) AS BIGINT)
        |FROM sh
        |ORDER BY shard""".stripMargin) { (s, dir) =>
      Corpus.fingerprintManifest(docs(s, dir), shards = 16)
    },

    // ——— STREAMING manifest (the 11th streaming-under-oracle entry):
    //     the q293 fingerprint maintained through a real readStream —
    //     XOR multiset hashing is what makes the digest INCREMENTAL
    //     (per-shard bit_xor is a plain streaming aggregate in
    //     Complete mode; arrival order and batching cannot change
    //     it), so a live corpus carries its version fingerprint with
    //     no reprocessing. Hash-matched to the batch manifest SQL. ———
    Q("q300_streaming_manifest",
      """WITH leaves AS (
        |  SELECT doc_id % 16 AS shard,
        |    CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
        |      ':', md5(text))), 1, 15)) AS BIGINT) AS leaf
        |  FROM documents
        |), sh AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(bit_xor(leaf) AS BIGINT) AS digest
        |  FROM leaves GROUP BY 1
        |)
        |SELECT CAST(shard AS BIGINT) AS shard, n_docs, digest FROM sh
        |UNION ALL
        |SELECT -1, CAST(SUM(n_docs) AS BIGINT), CAST(bit_xor(digest) AS BIGINT)
        |FROM sh
        |ORDER BY shard""".stripMargin) { (s, dir) =>
      val path = s"$dir/documents.parquet"
      val schema = s.read.parquet(path).schema // footer probe (q290 pattern)
      // the file streaming source wants a DIRECTORY; a single-file
      // path becomes parent dir + glob filter (readEvents' pattern)
      val f = new java.io.File(path)
      val reader = s.readStream.schema(schema)
      val stream =
        if (f.isFile) reader.option("pathGlobFilter", f.getName)
          .parquet(f.getParent)
        else reader.parquet(path)
      val agg = stream.select(
          pmod(col("doc_id").cast("long"), lit(16L)).as("shard"),
          conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
            md5(col("text")))), 1, 15), 16, 10).cast("long").as("leaf"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(leaf)").as("digest"))
      val q = graft.ext.Streaming.runToMemory(agg, "q300_manifest",
        org.apache.spark.sql.streaming.OutputMode.Complete)
      q.stop()
      val sh = s.table("q300_manifest")
      val root = sh.agg(sum("n_docs").cast("long").as("n_docs"),
          expr("bit_xor(digest)").as("digest"))
        .select(lit(-1L).as("shard"), col("n_docs"), col("digest"))
      sh.unionByName(root).orderBy("shard")
    },

    // ——— manifest diff: two corpus versions (v2 = one single-row
    //     edit, doc_id 7) compared through their manifests ALONE —
    //     exactly shard 7 mod 16 and the root flip `changed`, every
    //     other shard proves equality without reading row data. ———
    Q("q299_manifest_diff",
      """WITH la AS (
        |  SELECT doc_id % 16 AS shard,
        |    CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
        |      ':', md5(text))), 1, 15)) AS BIGINT) AS leaf
        |  FROM documents
        |), sa AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(bit_xor(leaf) AS BIGINT) AS digest
        |  FROM la GROUP BY 1
        |), ma AS (
        |  SELECT CAST(shard AS BIGINT) AS shard, n_docs, digest FROM sa
        |  UNION ALL
        |  SELECT -1, CAST(SUM(n_docs) AS BIGINT),
        |    CAST(bit_xor(digest) AS BIGINT) FROM sa
        |), lb AS (
        |  SELECT doc_id % 16 AS shard,
        |    CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
        |      ':', md5(CASE WHEN doc_id = 7 THEN text || ' rev2'
        |        ELSE text END))), 1, 15)) AS BIGINT) AS leaf
        |  FROM documents
        |), sb AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(bit_xor(leaf) AS BIGINT) AS digest
        |  FROM lb GROUP BY 1
        |), mb AS (
        |  SELECT CAST(shard AS BIGINT) AS shard, n_docs, digest FROM sb
        |  UNION ALL
        |  SELECT -1, CAST(SUM(n_docs) AS BIGINT),
        |    CAST(bit_xor(digest) AS BIGINT) FROM sb
        |)
        |SELECT ma.shard, ma.n_docs AS n_docs_a, mb.n_docs AS n_docs_b,
        |  ma.digest AS digest_a, mb.digest AS digest_b,
        |  (ma.n_docs IS DISTINCT FROM mb.n_docs
        |    OR ma.digest IS DISTINCT FROM mb.digest) AS changed
        |FROM ma FULL OUTER JOIN mb USING (shard)
        |ORDER BY shard""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val edited = d.withColumn("text",
        when(col("doc_id") === 7L, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      Corpus.manifestDiff(
        Corpus.fingerprintManifest(d, shards = 16),
        Corpus.fingerprintManifest(edited, shards = 16))
    },

    // ——— packed-row manifest: the emit side of q93 — one row per
    //     (stratum, bin) with ordered doc provenance and token
    //     payload (what a training-data writer materializes). ———
    Q("q99_packed_manifest",
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT *, SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |), p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
        |  FROM c
        |)
        |SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
        |FROM p GROUP BY lang, bin
        |ORDER BY lang, bin""".stripMargin) { (s, dir) =>
      Corpus.packedRowManifest(docs(s, dir), budget = 2048L)
        .orderBy("lang", "bin")
    },

    // ——— weighted domain mixing: per-source sampling rates applied
    //     via a deterministic md5 hash coin (reproducible mixture) ———
    Q("q71_weighted_mix",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS coin,
        |    CASE source WHEN 'src0' THEN 0.9 WHEN 'src1' THEN 0.5
        |                WHEN 'src2' THEN 0.1 ELSE 0.0 END AS rate
        |  FROM documents
        |)
        |WHERE coin < rate
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.weightedSample(docs(s, dir).select("doc_id", "source"), "source",
        Map("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.1))
        .orderBy("doc_id")
    },

    // ——— boilerplate-line removal (CCNet-style line dedup): a
    //     lineSize-token span occurring in ≥ 2 distinct docs is
    //     stripped; docs reassemble in line order. Oracle replays the
    //     q64 chunk math + a line-frequency join + string_agg. ———
    Q("q81_boilerplate_lines",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents
        |), starts AS (
        |  SELECT doc_id, ts,
        |    unnest(range(0, GREATEST(
        |      CAST(ceil(CAST(len(ts) AS DOUBLE) / 8) AS INT), 1))) AS line_id
        |  FROM toks
        |), lines AS (
        |  SELECT doc_id, CAST(line_id AS INT) AS line_id,
        |    array_to_string(ts[line_id * 8 + 1 : line_id * 8 + 8], ' ') AS line
        |  FROM starts
        |), df AS (
        |  SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1
        |), kept AS (
        |  SELECT l.doc_id, l.line_id, l.line
        |  FROM lines l JOIN df USING (line) WHERE df < 2
        |), total AS (
        |  SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY 1
        |), keptagg AS (
        |  SELECT doc_id, string_agg(line, ' ' ORDER BY line_id) AS clean_text,
        |    COUNT(*) AS n_kept
        |  FROM kept GROUP BY 1
        |)
        |SELECT t.doc_id, coalesce(k.clean_text, '') AS clean_text,
        |  CAST(t.n_lines AS BIGINT) AS n_lines,
        |  CAST(t.n_lines - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
        |FROM total t LEFT JOIN keptagg k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      Corpus.stripBoilerplate(docs(s, dir), lineSize = 8, minDf = 2)
        .orderBy("doc_id")
    },

    // ——— URL provenance: host extraction (userinfo/port-robust),
    //     registered-domain rollup, per-domain stats + blocklist
    //     flag. URLs synthesized deterministically (q76's PII
    //     pattern); regexes single-sourced from ext.Urls into the
    //     oracle. ———
    Q("q84_url_domain_stats", {
      import graft.ext.Urls
      s"""WITH u AS (
         |  SELECT doc_id, text,
         |    concat('https://',
         |      CASE WHEN doc_id % 6 = 1 THEN 'user:pw@' ELSE '' END,
         |      CASE doc_id % 6
         |        WHEN 0 THEN 'www.example.com' WHEN 1 THEN 'docs.example.com'
         |        WHEN 2 THEN 'spam.badsite.net' WHEN 3 THEN 'cdn.badsite.net'
         |        WHEN 4 THEN 'blog.goodsite.io' ELSE 'news.goodsite.io' END,
         |      CASE WHEN doc_id % 6 = 4 THEN ':8443' ELSE '' END,
         |      '/', source, '/', CAST(doc_id AS VARCHAR)) AS url
         |  FROM documents
         |), d AS (
         |  SELECT regexp_extract(regexp_extract(url, '${Urls.HostRe}', 1),
         |      '${Urls.RegisteredDomainRe}', 1) AS domain,
         |    len(string_split_regex(lower(text), '\\s+')) AS tok
         |  FROM u
         |)
         |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(tok) AS BIGINT) AS sum_tokens,
         |  (domain = 'badsite.net') AS blocked
         |FROM d GROUP BY domain
         |ORDER BY domain""".stripMargin
    }) { (s, dir) =>
      import graft.ext.Urls
      val d = docs(s, dir)
      val hostCol = (col("doc_id") % 6)
      val withUrl = d.withColumn("url", concat(lit("https://"),
        when(hostCol === 1, lit("user:pw@")).otherwise(lit("")),
        when(hostCol === 0, lit("www.example.com"))
          .when(hostCol === 1, lit("docs.example.com"))
          .when(hostCol === 2, lit("spam.badsite.net"))
          .when(hostCol === 3, lit("cdn.badsite.net"))
          .when(hostCol === 4, lit("blog.goodsite.io"))
          .otherwise(lit("news.goodsite.io")),
        when(hostCol === 4, lit(":8443")).otherwise(lit("")),
        lit("/"), col("source"), lit("/"), col("doc_id").cast("string")))
      Urls.domainStats(withUrl)
        .withColumn("blocked", col("domain") === "badsite.net")
        .orderBy("domain")
    },

    // ——— cross-modal: text stats aggregated per embedding label
    //     (id-aligned documents ⋈ embeddings) ———
    Q("q65_crossmodal_stats",
      """SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  ROUND(AVG(CAST(len(string_split_regex(lower(d.text), '\s+')) AS DOUBLE)), 6)
        |    AS avg_tokens,
        |  ROUND(AVG(CAST(d.n_chars AS DOUBLE)), 6) AS avg_chars
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY e.label
        |ORDER BY e.label""".stripMargin) { (s, dir) =>
      Corpus.withEmbeddings(docs(s, dir), emb(s, dir))
        .groupBy("label")
        .agg(count(lit(1)).as("n_docs"),
          round(avg(TextStats.tokenCount(col("text")).cast("double")), 6)
            .as("avg_tokens"),
          round(avg(col("n_chars").cast("double")), 6).as("avg_chars"))
        .orderBy("label")
    },

    // ——— token-budget mixing: per-lang budgets bound TOKENS (the
    //     unit data mixes are specified in), maximal md5-ordered
    //     prefix per stratum. Oracle: same window cumsum in SQL. ———
    Q("q79_token_budget",
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    len(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang,
        |    SUM(tok) OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t
        |)
        |SELECT doc_id, lang, CAST(cum AS BIGINT) AS cum_tokens
        |FROM c
        |WHERE cum <= (CASE lang WHEN 'en' THEN 4000 WHEN 'de' THEN 1500
        |  WHEN 'es' THEN 1500 WHEN 'fr' THEN 1500 WHEN 'zh' THEN 1500
        |  ELSE 0 END)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val budgets = Map("en" -> 4000L, "de" -> 1500L, "es" -> 1500L,
        "fr" -> 1500L, "zh" -> 1500L)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Corpus.tokenBudgetSample(docs(s, dir), budgets)
        .withColumn("cum_tokens",
          sum(TextStats.tokenCount(col("text"))).over(w))
        .select("doc_id", "lang", "cum_tokens")
        .orderBy("doc_id")
    },

    // ——— the COMPOSED corpus-prep pipeline: quality gate → exact
    //     dedup → MinHash-verified near-dup dedup → PII redaction,
    //     end-to-end in one query. The oracle replays every stage in
    //     SQL (quality formula from q39, fingerprint from q34, the
    //     md5 minhash family from q57, redaction from q76) — the
    //     strongest single statement that a user can run their whole
    //     pipeline on this engine and get oracle-exact output. ———
    Q("q77_corpus_prepare", {
      import graft.ext.Privacy
      s"""WITH scored AS (
         |  SELECT doc_id, lang, text,
         |    ROUND((least(length(text) / 200.0, 1.0)
         |         + (1.0 - least(CAST(punct_n AS DOUBLE) / n, 1.0))
         |         + (CASE WHEN CAST(stop_n AS DOUBLE) / n BETWEEN 0.01 AND 0.6
         |                 THEN 1.0 ELSE 0.5 END)) / 3.0, 6) AS quality
         |  FROM (
         |    SELECT doc_id, lang, text,
         |      len(string_split_regex(lower(text), '\\s+')) AS n,
         |      len(list_filter(string_split_regex(lower(text), '\\s+'),
         |          t -> t IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_n,
         |      length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_n
         |    FROM documents)
         |), gated AS (
         |  SELECT doc_id, lang, text FROM scored WHERE quality >= 0.85
         |), exact AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
         |      ORDER BY doc_id) AS rn
         |    FROM gated) WHERE rn = 1
         |), toks AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM exact
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(CASE WHEN len(ts) >= 3
         |      THEN list_transform(range(1, len(ts) - 1), i -> array_to_string(ts[i:i+2], ' '))
         |      ELSE [array_to_string(ts, ' ')] END) AS shingle
         |  FROM toks
         |), hashed AS (
         |  SELECT doc_id, CAST(concat('0x', substring(md5(shingle), 1, 7)) AS BIGINT) AS h
         |  FROM sh
         |), mins AS (
         |  SELECT doc_id, seed,
         |    MIN((1640531527 * h + seed * CAST(2654435769 AS BIGINT)) % 4294967296) AS mh
         |  FROM hashed CROSS JOIN (SELECT CAST(unnest(range(0, 32)) AS INT) AS seed) seeds
         |  GROUP BY doc_id, seed
         |), buckets AS (
         |  SELECT doc_id, CAST(seed // 4 AS INT) AS band,
         |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS bucket
         |  FROM mins GROUP BY doc_id, CAST(seed // 4 AS INT)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM buckets a
         |  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |), cnt AS (
         |  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
         |), inter AS (
         |  SELECT c.id_a, c.id_b, COUNT(*) AS i
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.id_a
         |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2
         |), dropped AS (
         |  SELECT DISTINCT id_b FROM inter
         |  JOIN cnt ca ON id_a = ca.doc_id
         |  JOIN cnt cb ON id_b = cb.doc_id
         |  WHERE ROUND(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) >= 0.5
         |)
         |SELECT e.doc_id, e.lang,
         |  regexp_replace(regexp_replace(regexp_replace(e.text,
         |    '${Privacy.EmailRe}', '[EMAIL]', 'g'),
         |    '${Privacy.PhoneRe}', '[PHONE]', 'g'),
         |    '${Privacy.Ipv4Re}', '[IP]', 'g') AS redacted
         |FROM exact e
         |WHERE e.doc_id NOT IN (SELECT id_b FROM dropped)
         |ORDER BY e.doc_id""".stripMargin
    }) { (s, dir) =>
      Corpus.prepare(docs(s, dir), minQuality = 0.85).orderBy("doc_id")
    },

    // ——— corpus snapshot diff (the versioning primitive): two
    //     deterministic snapshot views of `documents` (v1 drops
    //     id%11=3; v2 drops id%13=5 and edits id%7=2), full-outer
    //     fingerprint compare → added/removed/changed/unchanged per
    //     id. The join carries (id, md5) only — never text. ———
    Q("q113_snapshot_diff",
      """WITH v1 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3
        |), v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 2 THEN text || ' edited' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 5
        |), j AS (
        |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |    CASE WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN md5(regexp_replace(lower(a.text), '\s+', ' ', 'g'))
        |           <> md5(regexp_replace(lower(b.text), '\s+', ' ', 'g'))
        |           THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
        |)
        |SELECT doc_id, status FROM j ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val v1 = d.filter(col("doc_id") % 11 =!= 3).select(col("doc_id"), col("text"))
      val v2 = d.filter(col("doc_id") % 13 =!= 5)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 2, concat(col("text"), lit(" edited")))
            .otherwise(col("text")).as("text"))
      Corpus.snapshotDiff(v1, v2).orderBy("doc_id")
    },

    // ——— per-source corpus report card: ONE summary row per source
    //     (docs, tokens, quality, language spread, vocabulary). The
    //     quality mean sums exact DECIMALs of the per-doc rounded
    //     score, so the mean is partition-order independent. ———
    Q("q122_corpus_report",
      """WITH base AS (
        |  SELECT source, lang,
        |    len(string_split_regex(lower(text), '\s+')) AS nt,
        |    CAST(ROUND((least(length(text) / 200.0, 1.0)
        |       + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |                       / len(string_split_regex(lower(text), '\s+')), 1.0))
        |       + (CASE WHEN CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |               t -> t IN ('the','a','an','of','and','to','in','is','on','for'))) AS DOUBLE)
        |               / len(string_split_regex(lower(text), '\s+')) BETWEEN 0.01 AND 0.6
        |          THEN 1.0 ELSE 0.5 END)) / 3.0, 6) AS DECIMAL(18,6)) AS q
        |  FROM documents
        |), agg AS (
        |  SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(nt) AS BIGINT) AS total_tokens,
        |    ROUND(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS mean_tokens,
        |    ROUND(CAST(SUM(q) AS DOUBLE) / COUNT(*), 6) AS mean_quality,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        |  FROM base GROUP BY source
        |), voc AS (
        |  SELECT source, CAST(COUNT(DISTINCT t) AS BIGINT) AS vocab
        |  FROM (SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS t
        |        FROM documents)
        |  GROUP BY source
        |)
        |SELECT a.*, v.vocab FROM agg a JOIN voc v USING (source)
        |ORDER BY source""".stripMargin) { (s, dir) =>
      Corpus.sourceReport(docs(s, dir)).orderBy("source")
    },

    // ——— deterministic train/val/test split: one md5 coin per id vs
    //     cumulative boundaries — disjoint, exhaustive, reproducible,
    //     map-only; per-source proportions hold by hash independence
    //     (CorpusSpec). Same coin arithmetic as q71. ———
    Q("q123_train_split",
      """SELECT doc_id, source,
        |  CASE WHEN coin < 0.8 THEN 'train'
        |       WHEN coin < 0.9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id, source,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS coin
        |  FROM documents
        |)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Corpus.hashSplit(docs(s, dir).select("doc_id", "source"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")
    },

    // ——— mixture-rate solver (closes the loop: report → rates →
    //     q71 weighted mix / q79 token budget): rate_s = min(1,
    //     budget·share_s / tokens_s). src0's 0.7 share exceeds its
    //     supply → capped at 1.0, which is the report a mixture
    //     designer must see. ———
    Q("q124_mixture_rates",
      """WITH tok AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT)
        |      AS total_tokens
        |  FROM documents GROUP BY source
        |), r AS (
        |  SELECT source, total_tokens,
        |    ROUND(CASE source WHEN 'src0' THEN 0.7 WHEN 'src1' THEN 0.1
        |                      WHEN 'src2' THEN 0.1 WHEN 'src3' THEN 0.1
        |                      ELSE 0.0 END, 6) AS target_share,
        |    ROUND(LEAST(1.0,
        |      3000.0 * CASE source WHEN 'src0' THEN 0.7 WHEN 'src1' THEN 0.1
        |                           WHEN 'src2' THEN 0.1 WHEN 'src3' THEN 0.1
        |                           ELSE 0.0 END
        |        / CAST(total_tokens AS DOUBLE)), 6) AS rate
        |  FROM tok
        |)
        |SELECT source, total_tokens, target_share, rate,
        |  CAST(FLOOR(rate * CAST(total_tokens AS DOUBLE) + 0.5) AS BIGINT)
        |    AS expected_tokens
        |FROM r ORDER BY source""".stripMargin) { (s, dir) =>
      val tok = docs(s, dir).groupBy("source")
        .agg(sum(TextStats.tokenCount(col("text"))).as("total_tokens"))
      Corpus.mixtureRates(tok,
        Map("src0" -> 0.7, "src1" -> 0.1, "src2" -> 0.1, "src3" -> 0.1),
        budgetTokens = 3000)
        .orderBy("source")
    },

    // ——— temperature-scaled mixture shares (α-sampling, α = 0.5):
    //     share_s ∝ p_s^√ — the low-resource up-sampling rule,
    //     composed with the q124 budget solver. Shares are ratios of
    //     1e-9-quantized integer weights — engine-identical. ———
    Q("q139_temperature_mix",
      """WITH tok AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT)
        |      AS total_tokens
        |  FROM documents GROUP BY source
        |), nt AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS n FROM tok),
        |wu AS (
        |  SELECT source, total_tokens,
        |    CAST(round(power(CAST(total_tokens AS DOUBLE) / nt.n, 0.5) * 1e9)
        |      AS BIGINT) AS w_u
        |  FROM tok CROSS JOIN nt
        |), ws AS (SELECT CAST(SUM(w_u) AS BIGINT) AS ws FROM wu),
        |r AS (
        |  SELECT source, total_tokens,
        |    ROUND(CAST(w_u AS DOUBLE) / ws.ws, 6) AS share,
        |    ROUND(LEAST(CAST(1.0 AS DOUBLE),
        |      3000.0 * (CAST(w_u AS DOUBLE) / ws.ws)
        |        / CAST(total_tokens AS DOUBLE)), 6) AS rate
        |  FROM wu CROSS JOIN ws
        |)
        |SELECT source, total_tokens, share, rate,
        |  CAST(FLOOR(rate * CAST(total_tokens AS DOUBLE) + 0.5) AS BIGINT)
        |    AS expected_tokens
        |FROM r ORDER BY source""".stripMargin) { (s, dir) =>
      val tok = docs(s, dir).groupBy("source")
        .agg(sum(TextStats.tokenCount(col("text"))).as("total_tokens"))
      Corpus.temperatureShares(tok, alpha = 0.5, budgetTokens = 3000)
        .orderBy("source")
    },

    // ——— contrastive negative sampling: k reproducible hash-coin
    //     negatives per anchor (never the anchor itself), inner-
    //     joined back to the corpus for the negative's payload. ———
    Q("q118_negative_samples",
      """WITH n AS (SELECT COUNT(*) AS n FROM documents),
        |anchors AS (
        |  SELECT d.doc_id, j.j,
        |    CAST(CAST(concat('0x', substring(md5(concat(CAST(d.doc_id AS VARCHAR), ':', CAST(j.j AS VARCHAR))), 1, 15)) AS BIGINT)
        |      % (SELECT n FROM n) AS BIGINT) AS raw
        |  FROM documents d CROSS JOIN (SELECT unnest(range(1, 4)) AS j) j
        |), negs AS (
        |  SELECT doc_id, CAST(j AS INT) AS j,
        |    CASE WHEN raw = doc_id THEN (raw + 1) % (SELECT n FROM n)
        |         ELSE raw END AS neg_id
        |  FROM anchors
        |)
        |SELECT g.doc_id, g.j, g.neg_id, d.source AS neg_source
        |FROM negs g JOIN documents d ON g.neg_id = d.doc_id
        |ORDER BY g.doc_id, g.j""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      Corpus.negativeSamples(d, k = 3, nDocs = d.count())
        .orderBy("doc_id", "j")
    },

    // ——— CCNet-style text normalization: lowercase, URL strip,
    //     charset restriction, whitespace collapse — over text with
    //     a deterministically planted URL so the strip is visible.
    //     Regex single-sourced from TextStats into the oracle. ———
    Q("q119_normalize", {
      // Java-regex ∩ DuckDB-RE2 subset by construction — usable verbatim
      val re = graft.ext.TextStats.UrlTokenRe
      s"""WITH noisy AS (
         |  SELECT doc_id,
         |    concat(text, ' SEE https://ex', CAST(doc_id AS VARCHAR),
         |           '.com/a?b=1 NOW!!') AS text
         |  FROM documents
         |)
         |SELECT doc_id,
         |  trim(regexp_replace(
         |    regexp_replace(
         |      regexp_replace(lower(text), '$re', ' ', 'g'),
         |      '[^a-z0-9\\s.,!?'']', ' ', 'g'),
         |    '\\s+', ' ', 'g')) AS norm,
         |  CAST(LENGTH(text) AS BIGINT) AS n_before,
         |  CAST(LENGTH(trim(regexp_replace(
         |    regexp_replace(
         |      regexp_replace(lower(text), '$re', ' ', 'g'),
         |      '[^a-z0-9\\s.,!?'']', ' ', 'g'),
         |    '\\s+', ' ', 'g'))) AS BIGINT) AS n_after
         |FROM noisy
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val noisy = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" SEE https://ex"), col("doc_id").cast("string"),
          lit(".com/a?b=1 NOW!!")).as("text"))
      noisy.select(col("doc_id"),
        graft.ext.TextStats.normalizeText(col("text")).as("norm"),
        length(col("text")).cast("long").as("n_before"),
        length(graft.ext.TextStats.normalizeText(col("text"))).cast("long").as("n_after"))
        .orderBy("doc_id")
    },

    // ——— small-file compaction plan: pack the (source, lang) file
    //     manifest into ~5000-byte output bins by cumulative-offset
    //     division (the same rule Spark's own file coalescing uses).
    //     All-integer arithmetic over the metadata-sized manifest. ———
    Q("q130_compaction_plan",
      """WITH files AS (
        |  SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2
        |), planned AS (
        |  SELECT source, lang, bytes,
        |    CAST(SUM(bytes) OVER (ORDER BY bytes DESC, source, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM files
        |)
        |SELECT source, lang, bytes,
        |  CAST(FLOOR(CAST(cum - bytes AS DOUBLE) / 5000) AS BIGINT) AS bin
        |FROM planned
        |ORDER BY bin, bytes DESC, source, lang""".stripMargin) { (s, dir) =>
      val manifest = docs(s, dir).groupBy("source", "lang")
        .agg(sum("n_chars").as("bytes"))
      graft.engine.Layout.compactionPlan(manifest, "bytes",
          targetBytes = 5000L,
          orderBy = Seq(col("bytes").desc, col("source"), col("lang")))
        .orderBy(col("bin"), col("bytes").desc, col("source"), col("lang"))
    },

    // ——— weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    //     key = u^(1/w) from the deterministic md5 coin, top-25 by
    //     (round(key, 9), id) — inclusion ∝ n_chars, map-only + top-k. ———
    Q("q152_weighted_sample",
      """WITH keyed AS (
        |  SELECT doc_id, source, n_chars,
        |    round(power(
        |      (CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
        |         1, 15)) AS BIGINT) AS DOUBLE) + 1.0) / 1152921504606846976.0,
        |      CAST(1.0 AS DOUBLE) / CAST(n_chars AS DOUBLE)), 9) AS es_key
        |  FROM documents
        |)
        |SELECT doc_id, source, n_chars, es_key FROM keyed
        |ORDER BY es_key DESC, doc_id
        |LIMIT 25""".stripMargin) { (s, dir) =>
      Corpus.weightedSampleES(
          docs(s, dir).select("doc_id", "source", "n_chars"),
          weightCol = "n_chars", k = 25)
        .orderBy(col("es_key").desc, col("doc_id"))
    },

    // ——— per-source quantile normalization of the quality score:
    //     rank-fraction (rn−1)/(n−1) under the (value, id) total
    //     order — cross-source-comparable calibrated scores. ———
    Q("q153_quantile_normalize",
      """WITH base AS (
        |  SELECT doc_id, source,
        |    len(string_split_regex(lower(text), '\s+')) AS n,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_n,
        |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_n,
        |    length(text) AS len_t
        |  FROM documents
        |), ql AS (
        |  SELECT doc_id, source,
        |    ROUND((least(len_t / 200.0, 1.0)
        |         + (1.0 - least(CAST(punct_n AS DOUBLE) / n, 1.0))
        |         + (CASE WHEN CAST(stop_n AS DOUBLE) / n BETWEEN 0.01 AND 0.6
        |                 THEN 1.0 ELSE 0.5 END)) / 3.0, 6) AS quality
        |  FROM base
        |), r AS (
        |  SELECT doc_id, source, quality,
        |    row_number() OVER (PARTITION BY source ORDER BY quality, doc_id)
        |      AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM ql
        |)
        |SELECT doc_id, source, quality,
        |  CASE WHEN n > 1
        |    THEN ROUND(CAST(rn - 1 AS DOUBLE) / (n - 1), 6)
        |    ELSE 0.0 END AS qnorm
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val scored = docs(s, dir).select(col("doc_id"), col("source"),
        TextStats.qualityScore(col("text")).as("quality"))
      Corpus.quantileNormalize(scored, "quality", "source")
        .orderBy("doc_id")
    },

    // ——— curriculum schedule: 5 equal-count epochs ordered
    //     cleanest-first by the q39 quality score, with per-epoch
    //     quality range and token payload. ———
    Q("q138_curriculum",
      """WITH base AS (
        |  SELECT doc_id, text,
        |    len(string_split_regex(lower(text), '\s+')) AS n,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('the','a','an','of','and','to','in','is','on','for'))) AS stop_n,
        |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct_n
        |  FROM documents
        |), ql AS (
        |  SELECT doc_id, CAST(n AS BIGINT) AS n,
        |    ROUND((least(length(text) / 200.0, 1.0)
        |         + (1.0 - least(CAST(punct_n AS DOUBLE) / n, 1.0))
        |         + (CASE WHEN CAST(stop_n AS DOUBLE) / n BETWEEN 0.01 AND 0.6
        |                 THEN 1.0 ELSE 0.5 END)) / 3.0, 6) AS quality
        |  FROM base
        |), ep AS (
        |  SELECT doc_id, quality, n,
        |    ntile(5) OVER (ORDER BY quality DESC, doc_id) AS epoch
        |  FROM ql
        |)
        |SELECT CAST(epoch AS BIGINT) AS epoch,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(quality) AS q_lo, MAX(quality) AS q_hi,
        |  CAST(SUM(n) AS BIGINT) AS n_tokens
        |FROM ep GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Corpus.curriculumEpochs(docs(s, dir), nEpochs = 5)
    },

    // ——— phrase-level eval-leakage audit: fraction of val/test
    //     DISTINCT 3-grams never seen in train (split = the q123
    //     md5-coin; shingles = the q36 tokenization). Low novelty →
    //     eval measures shared phrasing, not generalization. ———
    Q("q170_ngram_novelty",
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(ts) >= 3
        |      THEN list_transform(range(1, len(ts) - 1),
        |        i -> array_to_string(ts[i:i+2], ' '))
        |      ELSE [array_to_string(ts, ' ')] END) AS shingle
        |  FROM toks
        |), sp AS (
        |  SELECT CASE WHEN coin < 0.8 THEN 'train'
        |              WHEN coin < 0.9 THEN 'val' ELSE 'test' END AS split,
        |    shingle
        |  FROM (
        |    SELECT doc_id, shingle,
        |      CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |        AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS coin
        |    FROM sh)
        |), d AS (SELECT DISTINCT split, shingle FROM sp),
        |tr AS (SELECT shingle FROM d WHERE split = 'train'),
        |ev AS (SELECT split, shingle FROM d WHERE split <> 'train')
        |SELECT ev.split, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        |  CAST(SUM(CASE WHEN tr.shingle IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_novel,
        |  ROUND(CAST(SUM(CASE WHEN tr.shingle IS NULL THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 6) AS novelty_rate
        |FROM ev LEFT JOIN tr USING (shingle)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Corpus.ngramNovelty(docs(s, dir), n = 3,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    },

    // ——— versioned snapshots + time travel (sinks.Versioned): write
    //     v1 = full corpus, v2 = length-gated; read BOTH back from
    //     parquet and reconcile per source (v1/v2 counts + removed
    //     keys from the storage-level diff). The oracle computes the
    //     same reconciliation from the source table — any loss in the
    //     write→read→diff path breaks the hash. ———
    Q("q188_time_travel",
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS v1_docs,
        |  CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS v2_docs,
        |  CAST(COUNT(*) - SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS removed
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.sinks.Versioned
      val base = s"${Fixtures.dir}/timetravel"
      val d = docs(s, dir)
      Versioned.write(d, base, 1)
      Versioned.write(d.filter(col("n_chars") >= 200), base, 2)
      val v1 = Versioned.read(s, base, 1)
        .groupBy("source").agg(count(lit(1)).as("v1_docs"))
      val v2 = Versioned.read(s, base, 2)
        .groupBy("source").agg(count(lit(1)).as("v2_docs"))
      val rem = Versioned.diff(s, base, fromV = 1, toV = 2,
          keyCols = Seq("doc_id", "source"))
        .filter(col("status") === "removed")
        .groupBy("source").agg(count(lit(1)).as("removed"))
      v1.join(v2, Seq("source"), "left").join(rem, Seq("source"), "left")
        .select(col("source"), col("v1_docs"),
          coalesce(col("v2_docs"), lit(0L)).as("v2_docs"),
          coalesce(col("removed"), lit(0L)).as("removed"))
        .orderBy("source")
    },

    // ——— deterministic per-epoch training order: md5(epoch:id) is a
    //     fresh RNG-free permutation per epoch; the engine ranks via
    //     bucket-offset + within-bucket row_number (no global sort),
    //     the oracle via one global ROW_NUMBER — equal by
    //     construction since the bucket char is the key's first
    //     char. First 10 positions of each of 2 epochs. ———
    Q("q232_epoch_shuffle",
      """WITH e AS (SELECT unnest(range(1, 3)) AS epoch),
        |r AS (
        |  SELECT e.epoch, d.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY e.epoch
        |      ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':'
        |        || CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rank
        |  FROM documents d CROSS JOIN e
        |)
        |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(rank AS BIGINT) AS rank,
        |  doc_id
        |FROM r WHERE rank <= 10 ORDER BY epoch, rank""".stripMargin) {
      (s, dir) =>
      graft.ext.Corpus.epochShuffle(docs(s, dir), nEpochs = 2)
        .where(col("rank") <= 10)
        .orderBy("epoch", "rank")
    },

    // ——— leakage-safe split: the train/val/test coin flips on the
    //     CONTENT fingerprint (q34's exact-dup key), so duplicate
    //     copies can never straddle splits — leaked_clusters is 0 by
    //     construction, and id_coin_leaked reports how many clusters
    //     the q123 doc-id coin WOULD have leaked. Map-only coins,
    //     shard-incremental; the audit is dictionary-bound. ———
    Q("q241_leakage_safe_split",
      """WITH d AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |), cl AS (
        |  SELECT doc_id, fp,
        |    CASE WHEN cf < 0.8 THEN 'train'
        |         WHEN cf < 0.9 THEN 'val' ELSE 'test' END AS split,
        |    CASE WHEN ci < 0.8 THEN 'train'
        |         WHEN ci < 0.9 THEN 'val' ELSE 'test' END AS id_split
        |  FROM (
        |    SELECT doc_id, fp,
        |      CAST(CAST(concat('0x', substring(md5(fp), 1, 15)) AS BIGINT)
        |        AS DOUBLE) / 1152921504606846976.0 AS cf,
        |      CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
        |        1, 15)) AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS ci
        |    FROM d)
        |), g AS (
        |  SELECT fp, COUNT(*) AS nc, COUNT(DISTINCT split) AS ns,
        |    COUNT(DISTINCT id_split) AS nis
        |  FROM cl GROUP BY 1
        |), leak AS (
        |  SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS leaked_clusters,
        |    CAST(SUM(CASE WHEN nis > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS id_coin_leaked
        |  FROM g
        |)
        |SELECT cl.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT cl.fp) AS BIGINT) AS n_clusters,
        |  CAST(SUM(CASE WHEN g.nc > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  leak.leaked_clusters, leak.id_coin_leaked
        |FROM cl JOIN g USING (fp), leak
        |GROUP BY 1, leak.leaked_clusters, leak.id_coin_leaked
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      graft.ext.Corpus.leakageSafeSplit(docs(s, dir))
    },

    // ——— perceptual (dHash) near-dup over the raw media payload:
    //     65 byte-sum segments → 64 gradient bits → 4×16-bit LSH
    //     bands → hot-bucket-capped bucket join → exact Hamming
    //     verify. Planted twins (doc_id%17=4 re-uploaded at id+2e6
    //     with ONE byte changed) land within Hamming ≤ 6 while the
    //     exact hash (q34) would miss them. All-integer arithmetic —
    //     ascii sums, comparisons, bit_count(xor) — so both engines
    //     replay bit-identically. ———
    Q("q301_media_phash_neardup",
      """WITH m AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |    WHERE strlen(text) >= 65
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS media_id,
        |    concat(substring(text, 1, 5), 'z', substring(text, 7)) AS text
        |  FROM documents WHERE doc_id % 17 = 4 AND strlen(text) >= 65
        |), p AS (
        |  SELECT media_id, strlen(text) AS n, text,
        |    unnest(range(1, strlen(text) + 1)) AS pos
        |  FROM m
        |), seg AS (
        |  SELECT media_id, ((pos - 1) * 65) // n + 1 AS seg,
        |    SUM(ascii(substring(text, CAST(pos AS INT), 1))) AS ss
        |  FROM p GROUP BY 1, 2
        |), bits AS (
        |  SELECT a.media_id, a.seg AS i,
        |    CASE WHEN a.ss > b.ss THEN 1 ELSE 0 END AS bit
        |  FROM seg a JOIN seg b
        |    ON a.media_id = b.media_id AND b.seg = a.seg + 1
        |  WHERE a.seg <= 64
        |), bands AS (
        |  SELECT media_id, (i - 1) // 16 AS band,
        |    CAST(SUM(bit * (1 << CAST((i - 1) % 16 AS INT))) AS BIGINT) AS v
        |  FROM bits GROUP BY 1, 2
        |), kept AS (
        |  SELECT bands.* FROM bands
        |  JOIN (SELECT band, v FROM bands GROUP BY 1, 2
        |        HAVING COUNT(*) <= 32) hot USING (band, v)
        |), cand AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        |  FROM kept a JOIN kept b
        |    ON a.band = b.band AND a.v = b.v AND a.media_id < b.media_id
        |)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT c.id_a, c.id_b,
        |    CAST(SUM(bit_count(xor(x.v, y.v))) AS BIGINT) AS hamming
        |  FROM cand c
        |  JOIN bands x ON x.media_id = c.id_a
        |  JOIN bands y ON y.media_id = c.id_b AND y.band = x.band
        |  GROUP BY 1, 2
        |) WHERE hamming <= 6 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import graft.ext.Multimodal
      val d = docs(s, dir)
      val base = d.select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("bytes"))
      val twins = d.filter(col("doc_id") % 17 === 4)
        .select((col("doc_id") + 2000000L).as("media_id"),
          concat(substring(col("text"), 1, 5), lit("z"),
            expr("substring(text, 7)")).cast("binary").as("bytes"))
      Multimodal.dHashNearDup(base.unionByName(twins),
        bits = 64, maxHamming = 6, maxBucket = 32)
    },

    // ——— media-aware dedup propagation: exact-dup docs dropped
    //     (planted re-upload twins at id+3e6 share the original's
    //     text) orphan the media only THEY reference; shared media
    //     (1e6 + id%50, referenced by originals too) stay live; the
    //     per-media derived rows (two per media) orphan transitively.
    //     Per kind: population, live, orphaned, reclaimable bytes,
    //     orphaned derived rows. ———
    Q("q302_media_dedup_propagation",
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 13 = 6
        |), surv AS (
        |  SELECT MIN(doc_id) AS doc_id FROM alldocs GROUP BY md5(text)
        |), refs AS (
        |  SELECT doc_id, doc_id AS media_id FROM alldocs
        |  UNION ALL
        |  SELECT doc_id, 1000000 + doc_id % 50 AS media_id FROM alldocs
        |), media AS (
        |  SELECT doc_id AS media_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(strlen(text) AS BIGINT) AS payload_len
        |  FROM alldocs
        |  UNION ALL
        |  SELECT DISTINCT 1000000 + doc_id % 50 AS media_id,
        |    'image' AS kind, CAST(64 AS BIGINT) AS payload_len
        |  FROM alldocs
        |), derived AS (
        |  SELECT media_id FROM media
        |  UNION ALL
        |  SELECT media_id FROM media
        |), live AS (
        |  SELECT DISTINCT media_id FROM refs
        |  JOIN surv USING (doc_id)
        |), orph AS (
        |  SELECT media.media_id, kind, payload_len,
        |    CASE WHEN live.media_id IS NULL THEN 1 ELSE 0 END AS o
        |  FROM media LEFT JOIN live ON media.media_id = live.media_id
        |), od AS (
        |  SELECT media_id, COUNT(*) AS nd FROM derived GROUP BY 1
        |)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_media,
        |  CAST(SUM(1 - o) AS BIGINT) AS n_live_media,
        |  CAST(SUM(o) AS BIGINT) AS n_orphan_media,
        |  CAST(SUM(CASE WHEN o = 1 THEN payload_len ELSE 0 END) AS BIGINT)
        |    AS orphan_bytes,
        |  CAST(SUM(CASE WHEN o = 1 THEN COALESCE(od.nd, 0) ELSE 0 END)
        |    AS BIGINT) AS n_orphan_derived
        |FROM orph LEFT JOIN od USING (media_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.ext.Multimodal
      val d0 = docs(s, dir).select("doc_id", "text")
      val alldocs = d0.unionByName(
        d0.filter(col("doc_id") % 13 === 6)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      val refs = alldocs.select(col("doc_id"), col("doc_id").as("media_id"))
        .unionByName(alldocs.select(col("doc_id"),
          (lit(1000000L) + col("doc_id") % 50).as("media_id")))
      val media = alldocs.select(col("doc_id").as("media_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
          col("text").cast("binary").as("bytes"))
        .unionByName(alldocs
          .select((lit(1000000L) + col("doc_id") % 50).as("media_id"))
          .distinct()
          .select(col("media_id"), lit("image").as("kind"),
            lit("x" * 64).cast("binary").as("bytes")))
      val derived = media.select("media_id")
        .unionByName(media.select("media_id"))
      Multimodal.mediaDedupPropagation(alldocs, refs, media, derived)
    },

    // ——— cross-shard contamination matrix: pairwise shared distinct
    //     3-gram shingles + shingle-set Jaccard across the 4 logical
    //     shards (doc_id % 4) — the split-bleed monitor. Bounded pair
    //     explode (≤ C(4,2) per shingle); no doc-pair explosion. ———
    Q("q303_shard_contamination_matrix",
      """WITH toks AS (
        |  SELECT doc_id % 4 AS shard,
        |    string_split_regex(lower(text), '\s+') AS ts FROM documents
        |), sh AS (
        |  SELECT DISTINCT shard,
        |    unnest(CASE WHEN len(ts) >= 3
        |      THEN list_transform(range(1, len(ts) - 1),
        |                          i -> array_to_string(ts[i:i+2], ' '))
        |      ELSE [array_to_string(ts, ' ')] END) AS shingle
        |  FROM toks
        |), per AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
        |), pairs AS (
        |  SELECT a.shard AS shard_a, b.shard AS shard_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.shard < b.shard
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(shard_a AS VARCHAR) AS shard_a,
        |  CAST(shard_b AS VARCHAR) AS shard_b, n_shared_shingles,
        |  pa.n_sh AS n_sh_a, pb.n_sh AS n_sh_b,
        |  round(CAST(n_shared_shingles AS DOUBLE) /
        |    CAST(pa.n_sh + pb.n_sh - n_shared_shingles AS DOUBLE), 6)
        |    AS jaccard
        |FROM pairs JOIN per pa ON pairs.shard_a = pa.shard
        |JOIN per pb ON pairs.shard_b = pb.shard
        |ORDER BY shard_a, shard_b""".stripMargin) { (s, dir) =>
      graft.ext.Dedup.shardContaminationMatrix(docs(s, dir),
        pmod(col("doc_id"), lit(4)), n = 3)
    },

    // ——— deterministic training-order shuffle: md5 hash order + 8
    //     balanced shards, per-shard replay witnesses + skew audit.
    //     No ORDER BY rand(), no global sort — the scale-native epoch
    //     shuffle. ———
    Q("q304_training_shuffle_shards",
      """WITH keyed AS (
        |  SELECT md5(CAST(doc_id AS VARCHAR) || ':ep1') AS order_key,
        |    CAST(concat('0x', substring(
        |      md5(CAST(doc_id AS VARCHAR) || ':ep1'), 1, 15)) AS BIGINT)
        |      % 8 AS shard,
        |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
        |      AS n_toks
        |  FROM documents
        |), per AS (
        |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
        |    MIN(order_key) AS first_key, MAX(order_key) AS last_key
        |  FROM keyed GROUP BY 1
        |), tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per)
        |SELECT CAST(shard AS BIGINT) AS shard, n_docs, n_tokens,
        |  first_key, last_key,
        |  round(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |    AS token_share,
        |  round(CAST(n_tokens AS DOUBLE) * 8 / CAST(total AS DOUBLE), 6)
        |    AS skew
        |FROM per, tot ORDER BY shard""".stripMargin) { (s, dir) =>
      graft.ext.Corpus.trainingShuffleShards(docs(s, dir), nShards = 8,
        seed = "ep1")
    },

    // ——— dedup survivorship-bias audit: fixed stopword-density bins
    //     (integer div — no quantile window), exact-dedup keep/remove
    //     split per bin, share shift vs the full population. Planted
    //     re-upload twins (doc_id % 13 = 6 at id+3e6, q302's scheme)
    //     make removal non-zero and CONCENTRATED in the twins' bins —
    //     the share_kept-vs-share_all divergence the audit exists to
    //     surface. ———
    Q("q305_dedup_quality_bias",
      """WITH alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 13 = 6
        |), f AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('the','a','an','of','and','to','in','is','on','for')))
        |      AS BIGINT) AS stop_n,
        |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
        |      AS n_toks
        |  FROM alldocs
        |), b AS (
        |  SELECT doc_id, fp,
        |    least((10 * stop_n) // n_toks, 9) AS quality_bin FROM f
        |), k AS (
        |  SELECT fp, MIN(doc_id) AS keeper FROM b GROUP BY 1
        |), fl AS (
        |  SELECT quality_bin,
        |    CASE WHEN b.doc_id = k.keeper THEN 1 ELSE 0 END AS kept
        |  FROM b JOIN k USING (fp)
        |), per AS (
        |  SELECT quality_bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(kept) AS BIGINT) AS n_kept
        |  FROM fl GROUP BY 1
        |), tot AS (
        |  SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
        |    CAST(SUM(n_kept) AS BIGINT) AS total_kept FROM per
        |)
        |SELECT CAST(quality_bin AS BIGINT) AS quality_bin, n_docs, n_kept,
        |  n_docs - n_kept AS n_removed,
        |  round(CAST(n_docs - n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS removal_rate,
        |  round(CAST(n_docs AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |    AS share_all,
        |  round(CAST(n_kept AS DOUBLE) / CAST(total_kept AS DOUBLE), 6)
        |    AS share_kept
        |FROM per, tot ORDER BY quality_bin""".stripMargin) { (s, dir) =>
      val d0 = docs(s, dir).select("doc_id", "text")
      val alldocs = d0.unionByName(
        d0.filter(col("doc_id") % 13 === 6)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      graft.ext.Dedup.dedupQualityBias(alldocs)
    },

    // ——— padding-waste audit: how many batch tokens are padding
    //     under pow2 / stride-64 / pad-to-max bucketing. Map-only +
    //     3-row aggregate; log2/pow/ceil are IEEE-identical so the
    //     oracle replays the bucket arithmetic bit-exactly. ———
    Q("q308_padding_waste",
      """WITH toks AS (
        |  SELECT CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
        |    AS n_toks
        |  FROM documents
        |), mx AS (SELECT CAST(MAX(n_toks) AS BIGINT) AS gmax FROM toks),
        |s AS (
        |  SELECT n_toks,
        |    greatest(CAST(16 AS BIGINT),
        |      CAST(pow(2.0, ceil(log2(CAST(n_toks AS DOUBLE)))) AS BIGINT))
        |      AS pow2,
        |    CAST(ceil(CAST(n_toks AS DOUBLE) / 64.0) AS BIGINT) * 64
        |      AS fixed64,
        |    mx.gmax AS global_max
        |  FROM toks, mx
        |), lng AS (
        |  SELECT n_toks, 'pow2' AS scheme, pow2 AS bucket FROM s
        |  UNION ALL SELECT n_toks, 'fixed64', fixed64 FROM s
        |  UNION ALL SELECT n_toks, 'global_max', global_max FROM s
        |)
        |SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS tokens_real,
        |  CAST(SUM(bucket) AS BIGINT) AS tokens_padded,
        |  round(CAST(SUM(bucket) - SUM(n_toks) AS DOUBLE)
        |    / CAST(SUM(bucket) AS DOUBLE), 6) AS waste_frac
        |FROM lng GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Corpus.paddingWasteAudit(docs(s, dir))
    },

    // ——— purged time-based train/test split audit (one-boundary
    //     purged k-fold): boundary at 70% of the observed span, 1 h
    //     embargo purged from train, residual cross-boundary entities
    //     REPORTED per event type. ———
    Q("q309_purged_time_split",
      """WITH span AS (
        |  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
        |), lab AS (
        |  SELECT CAST(event_type AS VARCHAR) AS etype, user_id AS entity,
        |    CASE WHEN epoch_us(ts) >= t THEN 'test'
        |         WHEN epoch_us(ts) >= t - 3600000000 THEN 'purged'
        |         ELSE 'train' END AS split
        |  FROM events, (
        |    SELECT lo, hi, lo + CAST(floor(CAST(hi - lo AS DOUBLE)
        |      * CAST(0.7 AS DOUBLE)) AS BIGINT) AS t FROM span) b
        |), counts AS (
        |  SELECT etype,
        |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_train,
        |    CAST(SUM(CASE WHEN split = 'purged' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_purged,
        |    CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_test
        |  FROM lab GROUP BY 1
        |), sides AS (
        |  SELECT etype, entity, COUNT(DISTINCT split) AS s
        |  FROM lab WHERE split <> 'purged' GROUP BY 1, 2
        |), leaky AS (
        |  SELECT etype,
        |    CAST(SUM(CASE WHEN s = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_leaky_entities,
        |    CAST(COUNT(*) AS BIGINT) AS n_entities
        |  FROM sides GROUP BY 1
        |)
        |SELECT counts.etype, n_train, n_purged, n_test,
        |  n_entities, n_leaky_entities,
        |  round(CAST(n_leaky_entities AS DOUBLE)
        |    / CAST(n_entities AS DOUBLE), 6) AS leaky_frac
        |FROM counts JOIN leaky USING (etype)
        |ORDER BY etype""".stripMargin) { (s, dir) =>
      Corpus.purgedTimeSplit(Tables.load(s, dir, "events"),
        splitFrac = 0.7, embargoUs = 3600000000L)
    },

    // ——— deterministic per-domain frequency cap (the C4/Dolma "at
    //     most N pages per domain" policy): keep the first 18 docs
    //     per source by md5(id:seed) order, report kept/dropped docs
    //     and tokens per domain. One domain-keyed shuffle, PARTITIONED
    //     window only, domain-dictionary-sized output. ———
    Q("q312_domain_cap",
      """WITH ranked AS (
        |  SELECT source AS domain, doc_id,
        |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
        |      AS n_toks,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap1'), doc_id)
        |      AS rn
        |  FROM documents
        |)
        |SELECT domain,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN rn <= 18 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN rn > 18 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(SUM(CASE WHEN rn <= 18 THEN n_toks ELSE 0 END) AS BIGINT)
        |    AS tokens_kept,
        |  CAST(SUM(CASE WHEN rn > 18 THEN n_toks ELSE 0 END) AS BIGINT)
        |    AS tokens_dropped,
        |  round(CAST(SUM(CASE WHEN rn <= 18 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS retention
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      Corpus.domainFrequencyCap(docs(s, dir), cap = 18, seed = "cap1")
    },

    // ——— q312's cap enforced INCREMENTALLY on a document stream:
    //     one Long of mapGroupsWithState state per domain, admissions
    //     stop at 18, every micro-batch upserts the domain's audit
    //     row. Admitted COUNTS are arrival-order-free (min(seen,cap)),
    //     so the final streaming ledger equals the batch policy —
    //     the oracle the stream must land on. ———
    Q("q317_streaming_domain_cap",
      """SELECT source AS domain,
        |  CAST(COUNT(*) AS BIGINT) AS n_seen,
        |  CAST(LEAST(COUNT(*), 18) AS BIGINT) AS n_admitted,
        |  CAST(COUNT(*) - LEAST(COUNT(*), 18) AS BIGINT) AS n_rejected
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import s.implicits._
      val stream = graft.ext.Streaming
        .readParquetStream(s, s"$dir/documents.parquet")
        .select(col("source")).as[graft.ext.Streaming.CapDoc]
      val q = graft.ext.Streaming.runToMemory(
        graft.ext.Streaming.domainCapStream(stream, cap = 18).toDF(),
        "q317_cap", org.apache.spark.sql.streaming.OutputMode.Update)
      q.stop()
      // the memory table holds one upsert per (domain, batch); the
      // audit counters are monotone, so the final ledger is the max
      s.table("q317_cap").groupBy("domain")
        .agg(max("n_seen").as("n_seen"),
          max("n_admitted").as("n_admitted"),
          max("n_rejected").as("n_rejected"))
        .orderBy("domain")
    },

    // ——— IPF raking (survey reweighting applied to corpus mixture):
    //     rake the (lang × source) doc-count table to UNIFORM
    //     marginals over observed labels in 3 row/col scaling
    //     iterations. Cell weights on a 1e-6 micro-grid with
    //     floor(w·T/S + 0.5) scaling → the fixed-iteration trajectory
    //     is engine-exact. One data-scale shuffle (the cell rollup);
    //     everything after is dictionary-sized. ———
    Q("q331_ipf_raking",
      """WITH cells AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2
        |), tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS t,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS nr,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS nc
        |  FROM cells
        |), w0 AS (
        |  SELECT lang, source, n, n * 1000000 AS w,
        |    CAST(FLOOR(CAST(t AS DOUBLE) * 1000000.0 / CAST(nr AS DOUBLE)
        |      + 0.5) AS BIGINT) AS tr,
        |    CAST(FLOOR(CAST(t AS DOUBLE) * 1000000.0 / CAST(nc AS DOUBLE)
        |      + 0.5) AS BIGINT) AS tc
        |  FROM cells CROSS JOIN tot
        |), r1 AS (
        |  SELECT lang, source, n, tr, tc,
        |    CAST(FLOOR(CAST(w AS DOUBLE) * tr / s + 0.5) AS BIGINT) AS w
        |  FROM (SELECT *, CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT)
        |          AS s FROM w0)
        |), c1 AS (
        |  SELECT lang, source, n, tr, tc,
        |    CAST(FLOOR(CAST(w AS DOUBLE) * tc / s + 0.5) AS BIGINT) AS w
        |  FROM (SELECT *, CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT)
        |          AS s FROM r1)
        |), r2 AS (
        |  SELECT lang, source, n, tr, tc,
        |    CAST(FLOOR(CAST(w AS DOUBLE) * tr / s + 0.5) AS BIGINT) AS w
        |  FROM (SELECT *, CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT)
        |          AS s FROM c1)
        |), c2 AS (
        |  SELECT lang, source, n, tr, tc,
        |    CAST(FLOOR(CAST(w AS DOUBLE) * tc / s + 0.5) AS BIGINT) AS w
        |  FROM (SELECT *, CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT)
        |          AS s FROM r2)
        |), r3 AS (
        |  SELECT lang, source, n, tr, tc,
        |    CAST(FLOOR(CAST(w AS DOUBLE) * tr / s + 0.5) AS BIGINT) AS w
        |  FROM (SELECT *, CAST(SUM(w) OVER (PARTITION BY lang) AS BIGINT)
        |          AS s FROM c2)
        |), c3 AS (
        |  SELECT lang, source, n, tr, tc,
        |    CAST(FLOOR(CAST(w AS DOUBLE) * tc / s + 0.5) AS BIGINT) AS w
        |  FROM (SELECT *, CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT)
        |          AS s FROM r3)
        |)
        |SELECT lang, source, n AS n_docs,
        |  round(CAST(w AS DOUBLE) / 1000000.0, 6) AS raked_docs,
        |  round(CAST(w AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
        |    AS rate
        |FROM c3 ORDER BY lang, source""".stripMargin) { (s, dir) =>
      Corpus.ipfRake(docs(s, dir), "lang", "source", iterations = 3)
    },

    // ——— preference-data QA (RLHF / reward-model corpora): prompts =
    //     doc_id/8 rosters, synthetic pairwise votes (longer response
    //     wins, 20% md5-coin flips), audited for intransitive triads
    //     (exact directed-3-cycle count), per-prompt consistency, and
    //     the Copeland winner. Every join is keyed on the prompt id;
    //     roster size is bounded (≤8) so pair/triad fan-out is
    //     constant per prompt — linear in prompts at any scale. ———
    Q("q336_preference_audit",
      """WITH r AS (
        |  SELECT CAST(doc_id // 8 AS BIGINT) AS prompt_id, doc_id, n_chars
        |  FROM documents
        |), p AS (
        |  SELECT a.prompt_id, a.doc_id AS id_a, b.doc_id AS id_b,
        |    ((a.n_chars >= b.n_chars) <>
        |     (CAST(concat('0x', substring(md5(concat(CAST(a.doc_id AS VARCHAR),
        |        ':', CAST(b.doc_id AS VARCHAR), ':pref12')), 1, 7)) AS BIGINT)
        |        % 5 = 0)) AS a_wins
        |  FROM r a JOIN r b
        |    ON a.prompt_id = b.prompt_id AND a.doc_id < b.doc_id
        |), v AS (
        |  SELECT prompt_id,
        |    CASE WHEN a_wins THEN id_a ELSE id_b END AS winner,
        |    CASE WHEN a_wins THEN id_b ELSE id_a END AS loser
        |  FROM p
        |), nresp AS (
        |  SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_resp FROM r GROUP BY 1
        |), npairs AS (
        |  SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM v GROUP BY 1
        |), cyc AS (
        |  SELECT e1.prompt_id, CAST(COUNT(*) // 3 AS BIGINT) AS n_cycles
        |  FROM v e1
        |  JOIN v e2 ON e2.prompt_id = e1.prompt_id AND e2.winner = e1.loser
        |  JOIN v e3 ON e3.prompt_id = e1.prompt_id AND e3.winner = e2.loser
        |    AND e3.loser = e1.winner
        |  GROUP BY 1
        |), wins AS (
        |  SELECT r.prompt_id, r.doc_id AS rid,
        |    CAST(COALESCE(w.w, 0) AS BIGINT) AS w
        |  FROM r LEFT JOIN (
        |    SELECT prompt_id, winner, COUNT(*) AS w FROM v GROUP BY 1, 2
        |  ) w ON w.prompt_id = r.prompt_id AND w.winner = r.doc_id
        |), best AS (
        |  SELECT prompt_id, rid AS best_id, w AS best_wins FROM (
        |    SELECT *, row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY w DESC, rid) AS rn
        |    FROM wins
        |  ) WHERE rn = 1
        |)
        |SELECT n.prompt_id, n.n_resp,
        |  CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(COALESCE(c.n_cycles, 0) AS BIGINT) AS n_cycles,
        |  CASE WHEN n.n_resp >= 3 THEN
        |    ROUND(1.0 - CAST(COALESCE(c.n_cycles, 0) AS DOUBLE) /
        |      CAST(n.n_resp * (n.n_resp - 1) * (n.n_resp - 2) // 6 AS DOUBLE), 6)
        |  END AS consistency,
        |  b.best_id, b.best_wins
        |FROM nresp n
        |LEFT JOIN npairs np USING (prompt_id)
        |LEFT JOIN cyc c USING (prompt_id)
        |LEFT JOIN best b USING (prompt_id)
        |ORDER BY prompt_id""".stripMargin) { (s, dir) =>
      import graft.ext.Preference
      val resp = docs(s, dir).select(
        floor(col("doc_id") / 8).cast("long").as("prompt_id"),
        col("doc_id"), col("n_chars"))
      val votes = Preference.pairwiseVotes(resp, "prompt_id", "doc_id",
        "n_chars", seed = "pref12", noiseMod = 5)
      Preference.audit(resp, votes, "prompt_id", "doc_id")
    },

    // ——— VAD-style energy segmentation over the raw BINARY payload
    //     (ASR corpus prep: silence-trim before transcription): stub
    //     samples (ascii%7−3) per byte, integer frame energies,
    //     active = energy ≥ 40, consecutive same-state frames merged
    //     into segments, rolled up per media. The oracle replays the
    //     byte math on the all-ASCII staged text (q291's argument:
    //     one character IS one byte here). Per-byte explode + frame
    //     rollup + media-PARTITIONED run-merge — linear end to end. ———
    Q("q337_media_energy_segments",
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, CAST(strlen(text) AS BIGINT) AS n
        |  FROM documents WHERE strlen(text) > 0
        |), p AS (
        |  SELECT media_id, text, n, unnest(range(1, n + 1)) AS pos FROM m
        |), b AS (
        |  SELECT media_id, CAST((pos - 1) // 16 AS BIGINT) AS frame,
        |    (ascii(substring(text, CAST(pos AS INT), 1)) % 7 - 3) AS v
        |  FROM p
        |), f AS (
        |  SELECT media_id, frame, CAST(SUM(v * v) AS BIGINT) AS energy
        |  FROM b GROUP BY 1, 2
        |), a AS (
        |  SELECT media_id, frame, energy >= 40 AS active FROM f
        |), c AS (
        |  SELECT media_id, frame, active,
        |    CASE WHEN lag(active) OVER (PARTITION BY media_id ORDER BY frame)
        |      IS DISTINCT FROM active THEN 1 ELSE 0 END AS chg
        |  FROM a
        |), s AS (
        |  SELECT media_id, active,
        |    SUM(chg) OVER (PARTITION BY media_id ORDER BY frame
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS seg_id
        |  FROM c
        |), g AS (
        |  SELECT media_id, seg_id, active, CAST(COUNT(*) AS BIGINT) AS n_frames
        |  FROM s GROUP BY 1, 2, 3
        |)
        |SELECT media_id, CAST(SUM(n_frames) AS BIGINT) AS n_frames,
        |  CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_active_segments,
        |  CAST(SUM(CASE WHEN active THEN n_frames ELSE 0 END) AS BIGINT)
        |    AS active_frames,
        |  ROUND(CAST(SUM(CASE WHEN active THEN n_frames ELSE 0 END) AS DOUBLE)
        |    / SUM(n_frames), 6) AS active_frac,
        |  CAST(COALESCE(MAX(CASE WHEN active THEN n_frames END), 0) AS BIGINT)
        |    AS longest_active_run
        |FROM g GROUP BY media_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.ext.Multimodal
      // spread the roster (q354 rule): the per-byte energy explode is
      // compute-dense and otherwise runs on the scan's single split
      val segs = Multimodal.energySegments(
        Multimodal.syntheticMedia(graft.engine.Skew
          .spreadForCompute(docs(s, dir), col("doc_id"))).toDF(),
        frameBytes = 16, threshold = 40L)
      segs.groupBy("media_id").agg(
          sum("n_frames").as("n_frames"),
          count(lit(1)).as("n_segments"),
          sum(when(col("active"), 1L).otherwise(0L)).as("n_active_segments"),
          sum(when(col("active"), col("n_frames")).otherwise(0L))
            .as("active_frames"),
          coalesce(max(when(col("active"), col("n_frames"))), lit(0L))
            .as("longest_active_run"))
        .select(col("media_id"), col("n_frames"), col("n_segments"),
          col("n_active_segments"), col("active_frames"),
          round(col("active_frames").cast("double") /
            col("n_frames").cast("double"), 6).as("active_frac"),
          col("longest_active_run"))
        .orderBy("media_id")
    },

    // ——— Bradley–Terry strength fit (Hunter 2004 MM) over the q336
    //     vote table — the reward-model training target itself. Five
    //     integer-quantized MM rounds, λ=1 smoothing, Σπ = k
    //     renormalization per prompt; the oracle unrolls the
    //     identical iteration (every per-pair term rounded to BIGINT
    //     before summation, so both engines add integers in any
    //     order). Everything prompt-keyed; bounded rosters. ———
    Q("q338_bradley_terry", btOracleSql(iterations = 5)) { (s, dir) =>
      import graft.ext.Preference
      val resp = docs(s, dir).select(
        floor(col("doc_id") / 8).cast("long").as("prompt_id"),
        col("doc_id"), col("n_chars"))
      val votes = Preference.pairwiseVotes(resp, "prompt_id", "doc_id",
        "n_chars", seed = "pref12", noiseMod = 5)
      Preference.bradleyTerry(resp, votes, "prompt_id", "doc_id",
        iterations = 5)
    },

    // ——— REAL WAV/PCM16 codec-seam proof: stage genuine RIFF
    //     containers (44-byte header + little-endian int16 samples)
    //     as BinaryType, then PARSE the header fields and DECODE the
    //     samples back positionally and run q337's segmentation on
    //     them. The oracle replays the sample-generation arithmetic
    //     directly (never touching bytes), so any encode/parse
    //     asymmetry — wrong endianness, off-by-one field offset,
    //     sign-extension error — breaks the hash. Per-sample explode
    //     + media-partitioned run-merge: q337's exact cost class. ———
    Q("q340_wav_pcm_segments",
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    8000 + (doc_id % 3) * 4000 AS sr,
        |    96 + (doc_id % 5) * 32 AS ns
        |  FROM documents
        |), p AS (
        |  SELECT media_id, sr, ns, CAST(t AS BIGINT) AS t
        |  FROM m, unnest(range(1, ns + 1)) AS r(t)
        |), s AS (
        |  SELECT media_id, sr, ns, t,
        |    CASE WHEN ((t - 1) // 32) % 2 = 1
        |      THEN ((media_id * 131 + t * 17) % 65536) // 64 - 512
        |      ELSE (media_id * 131 + t * 17) % 65536 - 32768 END AS v
        |  FROM p
        |), f AS (
        |  SELECT media_id, sr, ns, (t - 1) // 16 AS frame,
        |    CAST(SUM(v * v) AS BIGINT) AS energy
        |  FROM s GROUP BY 1, 2, 3, 4
        |), a AS (
        |  SELECT media_id, sr, ns, frame, energy >= 100000000 AS active
        |  FROM f
        |), c AS (
        |  SELECT media_id, sr, ns, frame, active,
        |    CASE WHEN lag(active) OVER (PARTITION BY media_id ORDER BY frame)
        |      IS DISTINCT FROM active THEN 1 ELSE 0 END AS chg
        |  FROM a
        |), seg AS (
        |  SELECT media_id, sr, ns, active,
        |    SUM(chg) OVER (PARTITION BY media_id ORDER BY frame
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS seg_id
        |  FROM c
        |), g AS (
        |  SELECT media_id, sr, ns, seg_id, active,
        |    CAST(COUNT(*) AS BIGINT) AS n_frames
        |  FROM seg GROUP BY 1, 2, 3, 4, 5
        |)
        |SELECT media_id, CAST(MAX(sr) AS BIGINT) AS sample_rate,
        |  CAST(MAX(ns) AS BIGINT) AS n_samples,
        |  CAST(SUM(n_frames) AS BIGINT) AS n_frames,
        |  CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  CAST(SUM(CASE WHEN active THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_active_segments,
        |  CAST(SUM(CASE WHEN active THEN n_frames ELSE 0 END) AS BIGINT)
        |    AS active_frames,
        |  CAST(COALESCE(MAX(CASE WHEN active THEN n_frames END), 0)
        |    AS BIGINT) AS longest_active_run
        |FROM g GROUP BY media_id ORDER BY media_id""".stripMargin) {
      (s, dir) =>
      import graft.ext.Multimodal
      import graft.engine.TrackedCache.Trackable
      // spread the roster (the container build + positional decode
      // are compute-dense per-row work — the q354 rule), then
      // checkpoint the STAGED containers: without the lineage cut,
      // CollapseProject re-inlines the whole construction into every
      // positional header read of BOTH wavHeader consumers (the q355
      // trap — measured 9.5 s, single task, two full rebuilds)
      val wav = Multimodal.syntheticWav(graft.engine.Skew
          .spreadForCompute(docs(s, dir), col("doc_id")))
        .trackedLocalCheckpoint()
      val hdr = Multimodal.wavHeader(wav).where(col("wav_valid"))
        .select(col("media_id"), col("sample_rate"), col("n_samples"))
      val segs = Multimodal.wavSegments(wav, frameSamples = 16,
        threshold = 100000000L)
      segs.groupBy("media_id").agg(
          sum("n_frames").as("n_frames"),
          count(lit(1)).as("n_segments"),
          sum(when(col("active"), 1L).otherwise(0L)).as("n_active_segments"),
          sum(when(col("active"), col("n_frames")).otherwise(0L))
            .as("active_frames"),
          coalesce(max(when(col("active"), col("n_frames"))), lit(0L))
            .as("longest_active_run"))
        .join(hdr, Seq("media_id"))
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("n_frames"), col("n_segments"), col("n_active_segments"),
          col("active_frames"), col("longest_active_run"))
        .orderBy("media_id")
    },

    // ——— model-arena leaderboard (the LMArena / Chatbot-Arena
    //     computation): synthetic head-to-head battles between 8
    //     model variants staged from the events stream (planted skill
    //     = (m·37) mod 23, 20% md5-coin upsets), then ONE GLOBAL
    //     Bradley–Terry fit — q338's per-prompt machinery with a
    //     constant prompt key, so the iteration frames are
    //     8-row/28-pair dictionaries regardless of battle volume; the
    //     only data-scale work is the two battle-count aggregates. ———
    Q("q341_model_arena", {
      val roster =
        """SELECT CAST(0 AS BIGINT) AS prompt_id, CAST(m AS BIGINT) AS rid
          |  FROM range(0, 8) t(m)""".stripMargin
      val votes =
        """SELECT CAST(0 AS BIGINT) AS prompt_id,
          |    CASE WHEN a_wins THEN ma ELSE mb END AS winner,
          |    CASE WHEN a_wins THEN mb ELSE ma END AS loser
          |  FROM (
          |    SELECT ma, mb,
          |      (((ma * 37) % 23 >= (mb * 37) % 23) <>
          |       (CAST(concat('0x', substring(md5(concat(
          |          CAST(event_id AS VARCHAR), ':arena13')), 1, 7)) AS BIGINT)
          |          % 5 = 0)) AS a_wins
          |    FROM (
          |      SELECT event_id, event_id % 8 AS ma,
          |        (event_id // 8) % 8 AS mb
          |      FROM events WHERE event_id IS NOT NULL
          |    ) WHERE ma <> mb
          |  )""".stripMargin
      btChainSql(5, roster, votes) +
        """
          |SELECT st.rid AS model_id, st.wins, st.n_games,
          |  CASE WHEN st.n_games > 0 THEN
          |    round(CAST(st.wins AS DOUBLE) / st.n_games, 6) END AS win_rate,
          |  round(CAST(pf.p AS DOUBLE) / 1000000, 6) AS strength,
          |  CAST(row_number() OVER (ORDER BY pf.p DESC, st.rid) AS BIGINT)
          |    AS bt_rank
          |FROM st JOIN p5 pf
          |  ON pf.prompt_id = st.prompt_id AND pf.rid = st.rid
          |ORDER BY model_id""".stripMargin
    }) { (s, dir) =>
      import graft.ext.Preference
      val roster = s.range(8).select(lit(0L).as("prompt_id"),
        col("id").as("rid"))
      val battles = graft.Tables.load(s, dir, "events")
        .filter(col("event_id").isNotNull)
        .select(col("event_id"), (col("event_id") % 8).as("ma"),
          (expr("event_id div 8") % 8).as("mb"))
        .filter(col("ma") =!= col("mb"))
      val aWins = ((col("ma") * 37 % 23) >= (col("mb") * 37 % 23)) =!=
        (conv(substring(md5(concat(col("event_id").cast("string"),
          lit(":arena13"))), 1, 7), 16, 10).cast("long") % 5 === 0)
      val votes = battles.select(lit(0L).as("prompt_id"),
        when(aWins, col("ma")).otherwise(col("mb")).as("winner"),
        when(aWins, col("mb")).otherwise(col("ma")).as("loser"))
      Preference.bradleyTerry(roster, votes, "prompt_id", "rid",
        iterations = 5)
        .select(col("rid").as("model_id"), col("wins"), col("n_games"),
          when(col("n_games") > 0L,
            round(col("wins").cast("double") / col("n_games"), 6))
            .as("win_rate"),
          col("strength"), col("bt_rank"))
        .orderBy("model_id")
    },

    // ——— DPO training-pair export from the q338 fit: per prompt the
    //     (chosen, rejected) = (rank-1, bottom-rank) responses, kept
    //     only when the strength margin ≥ 0.25 — compared in integer
    //     micro-units so the cut is float-proof. One prompt-keyed
    //     struct-aggregate on top of the fit; no new windows. ———
    Q("q342_dpo_pairs",
      btChainSql(5, q338RosterSql, q338VotesSql) +
        """, fit AS MATERIALIZED (
          |  SELECT st.prompt_id, st.rid, st.wins, pf.p,
          |    row_number() OVER (PARTITION BY st.prompt_id
          |      ORDER BY pf.p DESC, st.rid) AS rn,
          |    COUNT(*) OVER (PARTITION BY st.prompt_id) AS k
          |  FROM st JOIN p5 pf
          |    ON pf.prompt_id = st.prompt_id AND pf.rid = st.rid
          |), ch AS MATERIALIZED (
          |  SELECT prompt_id, rid AS chosen_id, wins AS chosen_wins,
          |    p AS pc, k FROM fit WHERE rn = 1
          |), rj AS MATERIALIZED (
          |  SELECT prompt_id, rid AS rejected_id, wins AS rejected_wins,
          |    p AS prj FROM fit WHERE rn = k
          |)
          |SELECT ch.prompt_id, chosen_id, rejected_id, chosen_wins,
          |  rejected_wins,
          |  round(CAST(pc - prj AS DOUBLE) / 1000000, 6) AS margin
          |FROM ch JOIN rj USING (prompt_id)
          |WHERE ch.k >= 2 AND pc - prj >= 250000
          |ORDER BY ch.prompt_id""".stripMargin) { (s, dir) =>
      import graft.ext.Preference
      val resp = docs(s, dir).select(
        floor(col("doc_id") / 8).cast("long").as("prompt_id"),
        col("doc_id"), col("n_chars"))
      val votes = Preference.pairwiseVotes(resp, "prompt_id", "doc_id",
        "n_chars", seed = "pref12", noiseMod = 5)
      Preference.dpoPairs(
        Preference.bradleyTerry(resp, votes, "prompt_id", "doc_id",
          iterations = 5),
        minMargin = 0.25)
    },

    // ——— REAL BMP codec-seam proof (the image twin of q340): stage
    //     genuine 24-bit bottom-up stride-padded DIBs as BinaryType,
    //     parse the two headers back, decode every BGR pixel
    //     positionally, and reduce to per-channel sums + a
    //     position-weighted moment. The oracle replays the pixel
    //     formula over (x, y, c) directly — never touching bytes —
    //     so a wrong stride, top-down read, or swapped channel order
    //     breaks the hash even where plain sums would not. ———
    Q("q343_bmp_pixel_stats",
      """WITH m AS (
        |  SELECT doc_id AS media_id, 4 + doc_id % 3 AS w,
        |    3 + doc_id % 2 AS h
        |  FROM documents
        |), px AS (
        |  SELECT media_id, w, h, CAST(x AS BIGINT) AS x,
        |    CAST(y AS BIGINT) AS y, CAST(c AS BIGINT) AS c,
        |    (media_id * 7 + y * 131 + x * 17 + c * 29) % 256 AS v
        |  FROM m,
        |    unnest(range(0, w)) AS tx(x),
        |    unnest(range(0, h)) AS ty(y),
        |    unnest(range(0, 3)) AS tc(c)
        |)
        |SELECT media_id, CAST(MAX(w) AS BIGINT) AS width,
        |  CAST(MAX(h) AS BIGINT) AS height,
        |  CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
        |  CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
        |  CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
        |  CAST(SUM((y * 4096 + x * 8 + c) * v) AS BIGINT) AS pos_moment
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin) {
      (s, dir) =>
      import graft.ext.Multimodal
      import graft.engine.TrackedCache.Trackable
      // q340's discipline: spread the roster (per-byte positional
      // decode is compute-dense), checkpoint the staged containers so
      // bmpHeader's 10 positional field reads stop re-inlining the
      // construction (the q355 trap)
      Multimodal.bmpPixelStats(
          Multimodal.syntheticBmp(graft.engine.Skew
            .spreadForCompute(docs(s, dir), col("doc_id")))
            .trackedLocalCheckpoint())
        .orderBy("media_id")
    },

    // ——— unbiased pass@k (Chen et al. 2021, eq. 1) over synthetic
    //     per-task samples (16-doc tasks, task-dependent md5 success
    //     rate): the exact falling-factorial ratio — integer
    //     numerator/denominator products, ONE double division per k,
    //     NULL where k exceeds the sample count. One task-keyed
    //     aggregate; the combinatorics are column arithmetic. ———
    Q("q344_pass_at_k", passAtKOracleSql) { (s, dir) =>
      import graft.ext.Evals
      val samples = docs(s, dir).select(col("doc_id"),
        expr("doc_id div 16").as("task_id"),
        ((conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":pass13"))), 1, 7), 16, 10).cast("long") % 100) <
          (lit(20L) + expr("doc_id div 16") % 60)).as("correct"))
      Evals.passAtK(samples, "task_id", "correct")
    },

    // ——— best-of-n expected-reward curve: exact order-statistics
    //     expectation E[max of a random n-subset] per prompt roster
    //     via Σ x_(i)·(C(i,n)−C(i−1,n))/C(k,n) — tie-safe, integer
    //     numerators, one division per n. n=1 is the mean and n=k
    //     the max (spec-pinned internal laws). The only window is
    //     the bounded per-prompt rank. ———
    Q("q345_bon_curve", {
      def chooseSql(v: String, n: Int): String = {
        val fact = (1 to n).product
        val prod = (0 until n).map(j => s"($v - $j)").mkString(" * ")
        s"(CASE WHEN $v >= $n THEN ($prod) // $fact ELSE 0 END)"
      }
      val ns = Seq(1, 2, 4)
      val sums = ns.map { n =>
        s"""CAST(SUM(x * (${chooseSql("i", n)} - ${chooseSql("(i - 1)", n)}))
           |      AS BIGINT) AS s$n""".stripMargin
      }.mkString(",\n    ")
      val es = ns.map { n =>
        s"""CASE WHEN k >= $n THEN
           |    round(CAST(s$n AS DOUBLE) / ${chooseSql("k", n)}, 6)
           |  END AS e_max_$n""".stripMargin
      }.mkString(",\n  ")
      s"""WITH r AS (
         |  SELECT doc_id // 8 AS prompt_id, doc_id,
         |    CAST(n_chars AS BIGINT) AS x
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
         |), rk AS (
         |  SELECT prompt_id, x,
         |    CAST(row_number() OVER (PARTITION BY prompt_id
         |      ORDER BY x, doc_id) AS BIGINT) AS i
         |  FROM r
         |), g AS (
         |  SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS k,
         |    MAX(x) AS best,
         |    $sums
         |  FROM rk GROUP BY 1
         |)
         |SELECT prompt_id, k, best,
         |  $es
         |FROM g ORDER BY prompt_id""".stripMargin
    }) { (s, dir) =>
      import graft.ext.Evals
      val roster = docs(s, dir).select(
        expr("doc_id div 8").as("prompt_id"), col("doc_id"),
        col("n_chars"))
      Evals.bonCurve(roster, "prompt_id", "doc_id", "n_chars")
    },

    // ——— group-relative (GRPO) advantage normalization: per-prompt
    //     z-scores rewritten as (n·r − Σr)/√(n·Σr² − (Σr)²) —
    //     integer numerator and radicand, one sqrt + one division,
    //     so both engines emit the identical double; NULL on
    //     constant/singleton rosters. One aggregate + one
    //     prompt-keyed join; no windows. ———
    Q("q346_grpo_advantages",
      """WITH r AS (
        |  SELECT doc_id // 8 AS prompt_id, doc_id,
        |    CAST(n_chars AS BIGINT) AS rw
        |  FROM documents
        |), g AS (
        |  SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_resp,
        |    CAST(SUM(rw) AS BIGINT) AS s, CAST(SUM(rw * rw) AS BIGINT) AS ss
        |  FROM r GROUP BY 1
        |)
        |SELECT r.prompt_id, r.doc_id, r.rw AS reward, g.n_resp,
        |  CASE WHEN g.n_resp * g.ss - g.s * g.s > 0 THEN
        |    round(CAST(g.n_resp * r.rw - g.s AS DOUBLE)
        |      / sqrt(CAST(g.n_resp * g.ss - g.s * g.s AS DOUBLE)), 6)
        |  END AS advantage
        |FROM r JOIN g USING (prompt_id)
        |ORDER BY r.prompt_id, r.doc_id""".stripMargin) { (s, dir) =>
      import graft.ext.Evals
      val roster = docs(s, dir).select(
        expr("doc_id div 8").as("prompt_id"), col("doc_id"),
        col("n_chars"))
      Evals.grpoAdvantages(roster, "prompt_id", "doc_id", "n_chars")
    },

    // ——— covariate-bias audit on the q336 votes — the reward-hacking
    //     diagnostic: per length-gap bucket, how often the LONGER
    //     response won. On this corpus the construction plants the
    //     answer (longer wins unless the 20% coin flips), so the
    //     curve must sit near 0.8 in every bucket — any reweighting
    //     pipeline's sanity anchor. Two keyed joins + one bucket
    //     aggregate; no windows. ———
    Q("q347_length_bias",
      s"""WITH r AS (
        |  SELECT CAST(doc_id // 8 AS BIGINT) AS prompt_id, doc_id AS rid,
        |    CAST(n_chars AS BIGINT) AS cv
        |  FROM documents
        |), v AS (
        |  SELECT prompt_id,
        |    CASE WHEN a_wins THEN id_a ELSE id_b END AS winner,
        |    CASE WHEN a_wins THEN id_b ELSE id_a END AS loser
        |  FROM (
        |    SELECT a.prompt_id, a.rid AS id_a, b.rid AS id_b,
        |      ((a.cv >= b.cv) <>
        |       (CAST(concat('0x', substring(md5(concat(CAST(a.rid AS VARCHAR),
        |          ':', CAST(b.rid AS VARCHAR), ':pref12')), 1, 7)) AS BIGINT)
        |          % 5 = 0)) AS a_wins
        |    FROM r a JOIN r b
        |      ON a.prompt_id = b.prompt_id AND a.rid < b.rid
        |  )
        |), j AS (
        |  SELECT LEAST(abs(w.cv - l.cv) // 100, 10) AS gap_bucket,
        |    CASE WHEN w.cv > l.cv THEN 1 ELSE 0 END AS hw
        |  FROM v
        |  JOIN r w ON w.prompt_id = v.prompt_id AND w.rid = v.winner
        |  JOIN r l ON l.prompt_id = v.prompt_id AND l.rid = v.loser
        |  WHERE w.cv <> l.cv
        |)
        |SELECT gap_bucket, CAST(COUNT(*) AS BIGINT) AS n_votes,
        |  CAST(SUM(hw) AS BIGINT) AS higher_wins,
        |  round(CAST(SUM(hw) AS DOUBLE) / COUNT(*), 6) AS higher_win_rate
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.ext.Preference
      val resp = docs(s, dir).select(
        floor(col("doc_id") / 8).cast("long").as("prompt_id"),
        col("doc_id"), col("n_chars"))
      val votes = Preference.pairwiseVotes(resp, "prompt_id", "doc_id",
        "n_chars", seed = "pref12", noiseMod = 5)
      Preference.voteCovariateBias(resp, votes, "prompt_id", "doc_id",
        "n_chars", bucketWidth = 100L, maxBucket = 10L)
    },

    // ——— q344's ledger maintained INCREMENTALLY on a sample stream:
    //     two Longs of mapGroupsWithState state per task, upserted
    //     per micro-batch; counters are monotone sums so the final
    //     streamed ledger equals the batch aggregate — the oracle.
    //     pass@k computed on the final ledger, not in the stream. ———
    Q("q348_streaming_pass_at_k", passAtKOracleSql) { (s, dir) =>
      import s.implicits._
      import graft.ext.{Evals, Streaming}
      val stream = Streaming
        .readParquetStream(s, s"$dir/documents.parquet")
        .select(expr("doc_id div 16").as("task_id"),
          ((conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":pass13"))), 1, 7), 16, 10).cast("long") % 100) <
            (lit(20L) + expr("doc_id div 16") % 60)).as("correct"))
        .as[Streaming.EvalSample]
      val q = Streaming.runToMemory(
        Streaming.evalLedgerStream(stream).toDF(),
        "q348_ledger", org.apache.spark.sql.streaming.OutputMode.Update)
      q.stop()
      // one upsert per (task, batch); counters are monotone → final
      // ledger is the max
      val ledger = s.table("q348_ledger").groupBy("task_id")
        .agg(max("n_samples").as("n_samples"),
          max("n_correct").as("n_correct"))
      Evals.passAtKOnCounts(ledger, "task_id")
    },

    // ——— self-consistency (Wang et al. 2023): per 16-sample task,
    //     the majority answer (ties toward the smaller — a min-struct
    //     over (−count, answer), no window) vs gold, next to the
    //     single-sample accuracy it should beat. Synthetic answers:
    //     ~65% gold, the rest spread over 3 md5-picked wrong
    //     alternatives. Two keyed aggregates; all counting. ———
    Q("q352_self_consistency",
      """WITH s AS (
        |  SELECT doc_id, doc_id // 16 AS task_id,
        |    ((doc_id // 16) * 13) % 4 AS gold,
        |    CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
        |      ':sc13')), 1, 7)) AS BIGINT) % 100 AS c1,
        |    CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
        |      ':sc13b')), 1, 7)) AS BIGINT) % 3 AS c2
        |  FROM documents
        |), a AS (
        |  SELECT task_id, gold,
        |    CASE WHEN c1 < 65 THEN gold
        |         ELSE (gold + 1 + c2) % 4 END AS answer
        |  FROM s
        |), pa AS (
        |  SELECT task_id, answer, CAST(COUNT(*) AS BIGINT) AS c,
        |    MAX(gold) AS gold
        |  FROM a GROUP BY 1, 2
        |), maj AS (
        |  SELECT task_id, answer AS majority_answer FROM (
        |    SELECT task_id, answer,
        |      row_number() OVER (PARTITION BY task_id
        |        ORDER BY c DESC, answer) AS rn
        |    FROM pa
        |  ) WHERE rn = 1
        |)
        |SELECT pa.task_id, CAST(SUM(pa.c) AS BIGINT) AS n_samples,
        |  MAX(pa.gold) AS gold,
        |  CAST(SUM(CASE WHEN pa.answer = pa.gold THEN pa.c ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  round(CAST(SUM(CASE WHEN pa.answer = pa.gold THEN pa.c ELSE 0 END)
        |    AS DOUBLE) / SUM(pa.c), 6) AS single_acc,
        |  MAX(m.majority_answer) AS majority_answer,
        |  CAST(MAX(CASE WHEN m.majority_answer = pa.gold THEN 1 ELSE 0 END)
        |    AS BIGINT) AS majority_correct
        |FROM pa JOIN maj m USING (task_id)
        |GROUP BY pa.task_id
        |ORDER BY pa.task_id""".stripMargin) { (s, dir) =>
      import graft.ext.Evals
      val base = docs(s, dir).select(col("doc_id"),
        expr("doc_id div 16").as("task_id"))
      val c1 = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":sc13"))), 1, 7), 16, 10).cast("long") % 100
      val c2 = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":sc13b"))), 1, 7), 16, 10).cast("long") % 3
      val samples = base
        .withColumn("gold", (col("task_id") * 13) % 4)
        .withColumn("answer", when(c1 < 65, col("gold"))
          .otherwise((col("gold") + 1 + c2) % 4))
      Evals.selfConsistency(samples, "task_id", "answer", "gold")
    },

    // ——— dHash on REAL pixels (closing the seam the stub dHash
    //     documents): classic 9×8 grayscale-gradient signatures over
    //     q343's decoded BMP grid, on a 512-image slice plus
    //     byte-level PERTURBED twins (one pixel's blue channel +128
    //     via a real hex overlay on the container), pushed through
    //     the EXISTING LSH band-bucket join + exact-Hamming verify.
    //     The oracle replays the pixel formula + grid + gradient +
    //     banding + cap + join directly — never touching bytes — so
    //     stride/orientation/channel/grid misreads all break the
    //     hash. Slice rationale: the synthetic pixel formula repeats
    //     every 768 ids (id·7 mod 256 × the (w,h) period), so an
    //     unsliced corpus plants identical images that LSH correctly
    //     reports as a quadratic pair set; 512 < 768 keeps every
    //     image distinct and the output the PLANTED twin ledger. ———
    Q("q355_bmp_dhash_neardup",
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS pert,
        |    4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h
        |  FROM documents WHERE doc_id < 512
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, 1, 4 + doc_id % 3,
        |    3 + doc_id % 2
        |  FROM documents WHERE doc_id < 512
        |), cell AS (
        |  SELECT media_id, base, pert, h, CAST(gx AS BIGINT) AS gx,
        |    CAST(gy AS BIGINT) AS gy,
        |    (gx * w) // 9 AS px, (gy * h) // 8 AS py
        |  FROM m, unnest(range(0, 9)) tx(gx), unnest(range(0, 8)) ty(gy)
        |), gray AS (
        |  SELECT media_id, gx, gy,
        |    (299 * ((base * 7 + py * 131 + px * 17) % 256)
        |     + 587 * ((base * 7 + py * 131 + px * 17 + 29) % 256)
        |     + 114 * (((base * 7 + py * 131 + px * 17 + 58) % 256
        |         + CASE WHEN pert = 1 AND px = 0 AND py = h - 1
        |             THEN 128 ELSE 0 END) % 256)) // 1000 AS gv
        |  FROM cell
        |), bit AS (
        |  SELECT a.media_id, a.gy * 8 + a.gx AS b,
        |    CASE WHEN a.gv > c.gv THEN 1 ELSE 0 END AS bit
        |  FROM gray a JOIN gray c
        |    ON c.media_id = a.media_id AND c.gy = a.gy AND c.gx = a.gx + 1
        |  WHERE a.gx <= 7
        |), sig AS (
        |  SELECT media_id, CAST(b // 16 AS BIGINT) AS band,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(b % 16 AS INTEGER)))
        |      AS BIGINT) AS v
        |  FROM bit GROUP BY 1, 2
        |), keep AS (
        |  SELECT band, v FROM sig GROUP BY band, v HAVING COUNT(*) <= 32
        |), kept AS (
        |  SELECT sig.* FROM sig JOIN keep USING (band, v)
        |), cand AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        |  FROM kept a JOIN kept b ON a.band = b.band AND a.v = b.v
        |    AND a.media_id < b.media_id
        |)
        |SELECT c.id_a, c.id_b,
        |  CAST(SUM(bit_count(xor(sa.v, sb.v))) AS BIGINT) AS hamming
        |FROM cand c
        |JOIN sig sa ON sa.media_id = c.id_a
        |JOIN sig sb ON sb.media_id = c.id_b AND sb.band = sa.band
        |GROUP BY 1, 2
        |HAVING CAST(SUM(bit_count(xor(sa.v, sb.v))) AS BIGINT) <= 6
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import graft.ext.Multimodal
      import graft.engine.TrackedCache.Trackable
      // NOT spread (q354 rule deliberately skipped): measured neutral
      // at this 512-row roster — the per-task overhead of 32-way
      // spread cancels the parallel decode gain (q355 3.66 → 3.87 s)
      val base = docs(s, dir).filter(col("doc_id") < 512)
      // checkpoint the STAGED containers (1024 tiny rows): without
      // the lineage cut, CollapseProject re-inlines the whole
      // synthetic-container construction into every one of the 216
      // positional grid reads per image (the HOF re-inline trap —
      // measured as a >5 min spin vs <1 s cut)
      val orig = Multimodal.syntheticBmp(base).trackedLocalCheckpoint()
      val twin = Multimodal.perturbBmpPixelByte(orig, lit(0L),
        col("media_id") + 1000000L)
      Multimodal.dHashNearDupFromSigs(
        Multimodal.bmpDHashSignatures(
          orig.unionByName(twin).trackedLocalCheckpoint()),
        maxHamming = 6, maxBucket = 32)
    },

    // ——— aHash on REAL pixels: the MEAN-THRESHOLD companion of
    //     q355's gradient dHash over the same 512-image slice +
    //     perturbed twins — bit g = 1 iff 64·gray_g > Σ grays (exact
    //     integer threshold, no division in the decision). Unlike
    //     dHash, the perturbation also shifts the GLOBAL mean, so
    //     borderline cells anywhere can flip — the radius is 8 and
    //     twins that flip past it honestly drop from both engines
    //     (the two hashes failing differently is the point of
    //     running both). Same LSH band-bucket join + exact-Hamming
    //     verify; the oracle replays pixel formula → 8×8 grid →
    //     integer mean threshold → banding → cap → join. ———
    Q("q396_bmp_ahash_neardup",
      """WITH m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS pert,
        |    4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h
        |  FROM documents WHERE doc_id < 512
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, 1, 4 + doc_id % 3,
        |    3 + doc_id % 2
        |  FROM documents WHERE doc_id < 512
        |), cell AS (
        |  SELECT media_id, base, pert, h, CAST(gx AS BIGINT) AS gx,
        |    CAST(gy AS BIGINT) AS gy,
        |    (gx * w) // 8 AS px, (gy * h) // 8 AS py
        |  FROM m, unnest(range(0, 8)) tx(gx), unnest(range(0, 8)) ty(gy)
        |), gray AS (
        |  SELECT media_id, gx, gy,
        |    (299 * ((base * 7 + py * 131 + px * 17) % 256)
        |     + 587 * ((base * 7 + py * 131 + px * 17 + 29) % 256)
        |     + 114 * (((base * 7 + py * 131 + px * 17 + 58) % 256
        |         + CASE WHEN pert = 1 AND px = 0 AND py = h - 1
        |             THEN 128 ELSE 0 END) % 256)) // 1000 AS gv
        |  FROM cell
        |), tot AS (
        |  SELECT media_id, CAST(SUM(gv) AS BIGINT) AS tot
        |  FROM gray GROUP BY 1
        |), bit AS (
        |  SELECT g.media_id, g.gy * 8 + g.gx AS b,
        |    CASE WHEN 64 * g.gv > t.tot THEN 1 ELSE 0 END AS bit
        |  FROM gray g JOIN tot t USING (media_id)
        |), sig AS (
        |  SELECT media_id, CAST(b // 16 AS BIGINT) AS band,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(b % 16 AS INTEGER)))
        |      AS BIGINT) AS v
        |  FROM bit GROUP BY 1, 2
        |), keep AS (
        |  SELECT band, v FROM sig GROUP BY band, v HAVING COUNT(*) <= 32
        |), kept AS (
        |  SELECT sig.* FROM sig JOIN keep USING (band, v)
        |), cand AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        |  FROM kept a JOIN kept b ON a.band = b.band AND a.v = b.v
        |    AND a.media_id < b.media_id
        |)
        |SELECT c.id_a, c.id_b,
        |  CAST(SUM(bit_count(xor(sa.v, sb.v))) AS BIGINT) AS hamming
        |FROM cand c
        |JOIN sig sa ON sa.media_id = c.id_a
        |JOIN sig sb ON sb.media_id = c.id_b AND sb.band = sa.band
        |GROUP BY 1, 2
        |HAVING CAST(SUM(bit_count(xor(sa.v, sb.v))) AS BIGINT) <= 8
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import graft.ext.Multimodal
      import graft.engine.TrackedCache.Trackable
      // NOT spread (q354 rule deliberately skipped): measured neutral
      // at this 512-row roster — the per-task overhead of 32-way
      // spread cancels the parallel decode gain (q355 3.66 → 3.87 s)
      val base = docs(s, dir).filter(col("doc_id") < 512)
      // same lineage cut as q355 (HOF re-inline trap on the staged
      // containers)
      val orig = Multimodal.syntheticBmp(base).trackedLocalCheckpoint()
      val twin = Multimodal.perturbBmpPixelByte(orig, lit(0L),
        col("media_id") + 1000000L)
      Multimodal.dHashNearDupFromSigs(
        Multimodal.bmpAHashSignatures(
          orig.unionByName(twin).trackedLocalCheckpoint()),
        maxHamming = 8, maxBucket = 32)
    },

    // ——— SEQUENTIAL Elo arena fold (the streaming complement of
    //     q341's batch Bradley–Terry leaderboard): 4 leagues × ~56
    //     event-staged battles replayed in seq order through the
    //     rational-expected-score Elo update (one double division +
    //     round per battle — no cross-engine pow). The oracle replays
    //     the fold with a RECURSIVE CTE whose state is the league's
    //     rating list, one battle per iteration — any drift in update
    //     order, delta rounding, or the rating floor breaks the hash.
    //     Scale: leagues parallelize (repartition + in-partition
    //     fold); a league's history is inherently sequential — Elo's
    //     semantics, not a plan defect. q356 checks the BATCH fold;
    //     StreamingSpec pins the mapGroupsWithState twin's parity. ———
    Q("q356_elo_arena",
      """WITH RECURSIVE b AS (
        |  SELECT event_id % 4 AS league, event_id AS seq,
        |    CASE WHEN a_wins THEN ma ELSE mb END AS winner,
        |    CASE WHEN a_wins THEN mb ELSE ma END AS loser
        |  FROM (
        |    SELECT event_id, ma, mb,
        |      (((ma * 37) % 23 >= (mb * 37) % 23) <>
        |       (CAST(concat('0x', substring(md5(concat(
        |          CAST(event_id AS VARCHAR), ':elo14')), 1, 7)) AS BIGINT)
        |          % 5 = 0)) AS a_wins
        |    FROM (
        |      SELECT event_id, (event_id // 4) % 8 AS ma,
        |        (event_id // 32) % 8 AS mb
        |      FROM events WHERE event_id IS NOT NULL AND event_id < 256
        |    ) WHERE ma <> mb
        |  )
        |), bb AS (
        |  SELECT league, winner, loser,
        |    row_number() OVER (PARTITION BY league ORDER BY seq) AS step
        |  FROM b
        |), fold AS (
        |  SELECT league, CAST(0 AS BIGINT) AS step,
        |    list_transform(range(0, 8),
        |      x -> CAST(1500000000 AS BIGINT)) AS r
        |  FROM (SELECT DISTINCT league FROM bb)
        |  UNION ALL
        |  SELECT f.league, f.step + 1,
        |    list_transform(range(0, 8), x ->
        |      CASE WHEN x = bb.winner THEN
        |        f.r[CAST(x AS INT) + 1]
        |        + CAST(round(CAST(32000000 AS DOUBLE)
        |            * (CAST(f.r[CAST(bb.loser AS INT) + 1] AS DOUBLE)
        |               / CAST(f.r[CAST(bb.winner AS INT) + 1]
        |                      + f.r[CAST(bb.loser AS INT) + 1] AS DOUBLE)))
        |            AS BIGINT)
        |      WHEN x = bb.loser THEN
        |        GREATEST(f.r[CAST(x AS INT) + 1]
        |        - CAST(round(CAST(32000000 AS DOUBLE)
        |            * (CAST(f.r[CAST(bb.loser AS INT) + 1] AS DOUBLE)
        |               / CAST(f.r[CAST(bb.winner AS INT) + 1]
        |                      + f.r[CAST(bb.loser AS INT) + 1] AS DOUBLE)))
        |            AS BIGINT), CAST(100000000 AS BIGINT))
        |      ELSE f.r[CAST(x AS INT) + 1] END)
        |  FROM fold f JOIN bb ON bb.league = f.league
        |    AND bb.step = f.step + 1
        |), final AS (
        |  SELECT league, r FROM (
        |    SELECT league, r, row_number() OVER (PARTITION BY league
        |      ORDER BY step DESC) AS rk
        |    FROM fold) WHERE rk = 1
        |), wstats AS (
        |  SELECT league, winner AS model_id,
        |    CAST(COUNT(*) AS BIGINT) AS wins
        |  FROM bb GROUP BY 1, 2
        |), games AS (
        |  SELECT league, model_id, CAST(COUNT(*) AS BIGINT) AS n_games
        |  FROM (
        |    SELECT league, winner AS model_id FROM bb
        |    UNION ALL SELECT league, loser FROM bb
        |  ) GROUP BY 1, 2
        |)
        |SELECT g.league, g.model_id,
        |  CAST(COALESCE(w.wins, 0) AS BIGINT) AS wins, g.n_games,
        |  round(CAST(f.r[CAST(g.model_id AS INT) + 1] AS DOUBLE)
        |    / 1000000, 6) AS rating
        |FROM games g
        |LEFT JOIN wstats w ON w.league = g.league
        |  AND w.model_id = g.model_id
        |JOIN final f ON f.league = g.league
        |ORDER BY g.league, g.model_id""".stripMargin) { (s, dir) =>
      import graft.ext.Preference
      val ev = graft.Tables.load(s, dir, "events")
        .filter(col("event_id").isNotNull && col("event_id") < 256)
        .select(col("event_id"),
          (expr("event_id div 4") % 8).as("ma"),
          (expr("event_id div 32") % 8).as("mb"))
        .filter(col("ma") =!= col("mb"))
      val aWins = ((col("ma") * 37 % 23) >= (col("mb") * 37 % 23)) =!=
        (conv(substring(md5(concat(col("event_id").cast("string"),
          lit(":elo14"))), 1, 7), 16, 10).cast("long") % 5 === 0)
      val battles = ev.select((col("event_id") % 4).as("league"),
        col("event_id").as("seq"),
        when(aWins, col("ma")).otherwise(col("mb")).as("winner"),
        when(aWins, col("mb")).otherwise(col("ma")).as("loser"))
      Preference.eloFold(battles)
    },

    // ——— Wilson-CI arena leaderboard (Wilson 1927): the
    //     uncertainty-aware win-rate table next to q341's BT point
    //     estimates, ranked by the pessimistic LOWER bound. z enters
    //     as z² = 3.8416 so sqrt (IEEE correctly-rounded, unlike
    //     exp/ln/pow) is the only non-arithmetic op — the whole
    //     interval is mirrored operation-for-operation. Rank via
    //     Ranks.rowNumberExact (dictionary-cumulative), not a global
    //     window. ———
    Q("q362_arena_wilson",
      """WITH v AS (
        |  SELECT CASE WHEN a_wins THEN ma ELSE mb END AS winner,
        |    CASE WHEN a_wins THEN mb ELSE ma END AS loser
        |  FROM (
        |    SELECT ma, mb,
        |      (((ma * 37) % 23 >= (mb * 37) % 23) <>
        |       (CAST(concat('0x', substring(md5(concat(
        |          CAST(event_id AS VARCHAR), ':wilson14')), 1, 7)) AS BIGINT)
        |          % 5 = 0)) AS a_wins
        |    FROM (
        |      SELECT event_id, event_id % 8 AS ma,
        |        (event_id // 8) % 8 AS mb
        |      FROM events WHERE event_id IS NOT NULL
        |    ) WHERE ma <> mb
        |  )
        |), w AS (
        |  SELECT winner AS model_id, CAST(COUNT(*) AS BIGINT) AS wc
        |  FROM v GROUP BY 1
        |), l AS (
        |  SELECT loser AS model_id, CAST(COUNT(*) AS BIGINT) AS lc
        |  FROM v GROUP BY 1
        |), c AS (
        |  SELECT COALESCE(w.model_id, l.model_id) AS model_id,
        |    COALESCE(wc, 0) AS wins,
        |    COALESCE(wc, 0) + COALESCE(lc, 0) AS n_games
        |  FROM w FULL JOIN l ON w.model_id = l.model_id
        |), ph AS (
        |  SELECT model_id, wins, n_games,
        |    CAST(wins AS DOUBLE) / CAST(n_games AS DOUBLE) AS p,
        |    CAST(n_games AS DOUBLE) AS nd
        |  FROM c
        |), s AS (
        |  SELECT model_id, wins, n_games,
        |    round(p, 6) AS win_rate,
        |    round((p + CAST(3.8416 AS DOUBLE) / (CAST(2.0 AS DOUBLE) * nd)
        |        - sqrt(CAST(3.8416 AS DOUBLE)) *
        |          sqrt(p * (CAST(1.0 AS DOUBLE) - p) / nd
        |            + CAST(3.8416 AS DOUBLE) /
        |              (CAST(4.0 AS DOUBLE) * nd * nd)))
        |      / (CAST(1.0 AS DOUBLE) + CAST(3.8416 AS DOUBLE) / nd), 6)
        |      AS wilson_lo,
        |    round((p + CAST(3.8416 AS DOUBLE) / (CAST(2.0 AS DOUBLE) * nd)
        |        + sqrt(CAST(3.8416 AS DOUBLE)) *
        |          sqrt(p * (CAST(1.0 AS DOUBLE) - p) / nd
        |            + CAST(3.8416 AS DOUBLE) /
        |              (CAST(4.0 AS DOUBLE) * nd * nd)))
        |      / (CAST(1.0 AS DOUBLE) + CAST(3.8416 AS DOUBLE) / nd), 6)
        |      AS wilson_hi
        |  FROM ph
        |)
        |SELECT model_id, wins, n_games, win_rate, wilson_lo, wilson_hi,
        |  CAST(row_number() OVER (ORDER BY wilson_lo DESC, model_id)
        |    AS BIGINT) AS pess_rank
        |FROM s ORDER BY model_id""".stripMargin) { (s, dir) =>
      import graft.ext.Preference
      val battles = graft.Tables.load(s, dir, "events")
        .filter(col("event_id").isNotNull)
        .select(col("event_id"), (col("event_id") % 8).as("ma"),
          (expr("event_id div 8") % 8).as("mb"))
        .filter(col("ma") =!= col("mb"))
      val aWins = ((col("ma") * 37 % 23) >= (col("mb") * 37 % 23)) =!=
        (conv(substring(md5(concat(col("event_id").cast("string"),
          lit(":wilson14"))), 1, 7), 16, 10).cast("long") % 5 === 0)
      val votes = battles.select(
        when(aWins, col("ma")).otherwise(col("mb")).as("winner"),
        when(aWins, col("mb")).otherwise(col("ma")).as("loser"))
      Preference.wilsonLeaderboard(votes)
    },

    // ——— one Dawid–Skene MM round (1979) over a synthetic 5-annotator
    //     panel (annotators 0–3 ≈80% accurate, annotator 4 ≈40%, md5
    //     coin): unweighted majority → per-annotator accuracy vs the
    //     majority (exact 1e-6 BIGINT weights) → accuracy-weighted
    //     re-vote. Ties resolve through min-label everywhere — no
    //     argmax exists to tie-break differently cross-engine. ———
    Q("q364_dawid_skene",
      dsLabMajSql +
      """, wt AS (
        |  SELECT annotator_id,
        |    CAST(round(1e6 * SUM(CASE WHEN lab.label = maj.maj
        |      THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT) AS wt
        |  FROM lab JOIN maj USING (item_id) GROUP BY 1
        |), wcnt AS (
        |  SELECT item_id, label, CAST(SUM(wt) AS BIGINT) AS s
        |  FROM lab JOIN wt USING (annotator_id) GROUP BY 1, 2
        |), wmx AS (
        |  SELECT item_id, MAX(s) AS wmx FROM wcnt GROUP BY 1
        |), wmaj AS (
        |  SELECT wcnt.item_id, MIN(label) AS wl
        |  FROM wcnt JOIN wmx ON wmx.item_id = wcnt.item_id
        |    AND wcnt.s = wmx.wmx
        |  GROUP BY 1
        |), nv AS (
        |  SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_votes
        |  FROM lab GROUP BY 1
        |)
        |SELECT nv.item_id, nv.n_votes, maj.maj AS majority_label,
        |  wmaj.wl AS weighted_label,
        |  CAST(CASE WHEN wmaj.wl <> maj.maj THEN 1 ELSE 0 END AS BIGINT)
        |    AS changed
        |FROM nv JOIN maj USING (item_id) JOIN wmaj USING (item_id)
        |ORDER BY item_id""".stripMargin) { (s, dir) =>
      graft.ext.Evals.dawidSkeneRound(dsLabFrame(s, dir))
    },

    // ——— the Dawid–Skene sufficient statistic itself on the q364
    //     panel: per-annotator confusion matrix against the majority
    //     (row-normalized P(says l | majority m)) — the diagonal is
    //     per-class accuracy, off-diagonal mass shows WHICH confusion
    //     each annotator makes. Dictionary-scale cells. ———
    Q("q366_annotator_confusion",
      dsLabMajSql +
      """, j AS (
        |  SELECT lab.annotator_id, maj.maj, lab.label
        |  FROM lab JOIN maj USING (item_id)
        |), cells AS (
        |  SELECT annotator_id, maj, label, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM j GROUP BY 1, 2, 3
        |), rt AS (
        |  SELECT annotator_id, maj, CAST(SUM(n) AS BIGINT) AS row_total
        |  FROM cells GROUP BY 1, 2
        |)
        |SELECT cells.annotator_id, cells.maj AS majority_label,
        |  cells.label, cells.n, rt.row_total,
        |  round(CAST(cells.n AS DOUBLE) / rt.row_total, 6) AS rate
        |FROM cells JOIN rt USING (annotator_id, maj)
        |ORDER BY annotator_id, majority_label, label""".stripMargin) { (s, dir) =>
      graft.ext.Evals.annotatorConfusion(dsLabFrame(s, dir))
    },

    // ——— length-debiased win rate by stratification (the adjusted
    //     leaderboard the q347 audit calls for; AlpacaEval-2.0 family
    //     without the logistic GLM — exp() is not correctly rounded
    //     cross-engine, direct standardization is all-rational): a
    //     75%-verbosity-biased synthetic judge inflates long models'
    //     raw rates; equal-weight means over length-difference strata
    //     remove the between-stratum component. ———
    Q("q368_stratified_winrate",
      """WITH b AS (
        |  SELECT event_id, event_id % 8 AS ma, (event_id // 8) % 8 AS mb
        |  FROM events WHERE event_id IS NOT NULL
        |), f0 AS (
        |  SELECT event_id, ma, mb,
        |    (event_id * 13) % 40 + ma * 5 AS la,
        |    (event_id * 29) % 40 + mb * 5 AS lb
        |  FROM b WHERE ma <> mb
        |), f AS (
        |  SELECT ma, mb, la, lb,
        |    ((la > lb OR (la = lb AND (ma * 37) % 23 >= (mb * 37) % 23))
        |     <> (CAST(concat('0x', substring(md5(concat(
        |        CAST(event_id AS VARCHAR), ':swr14')), 1, 7)) AS BIGINT)
        |        % 4 = 0)) AS a_wins
        |  FROM f0
        |), v AS (
        |  SELECT CASE WHEN a_wins THEN ma ELSE mb END AS winner,
        |    CASE WHEN a_wins THEN mb ELSE ma END AS loser,
        |    CASE WHEN a_wins THEN la ELSE lb END AS winner_len,
        |    CASE WHEN a_wins THEN lb ELSE la END AS loser_len
        |  FROM f
        |), p AS (
        |  SELECT winner AS model_id,
        |    GREATEST(LEAST(CAST(floor(CAST(winner_len - loser_len
        |      AS DOUBLE) / 10) AS BIGINT), 2), -2) AS bk,
        |    CAST(1 AS BIGINT) AS w
        |  FROM v
        |  UNION ALL
        |  SELECT loser,
        |    GREATEST(LEAST(CAST(floor(CAST(loser_len - winner_len
        |      AS DOUBLE) / 10) AS BIGINT), 2), -2),
        |    CAST(0 AS BIGINT)
        |  FROM v
        |), st AS (
        |  SELECT model_id, bk, CAST(SUM(w) AS BIGINT) AS sw,
        |    CAST(COUNT(*) AS BIGINT) AS sn,
        |    CAST(round(1e9 * SUM(w) / COUNT(*)) AS BIGINT) AS q
        |  FROM p GROUP BY 1, 2
        |)
        |SELECT model_id, CAST(SUM(sw) AS BIGINT) AS wins,
        |  CAST(SUM(sn) AS BIGINT) AS n_games,
        |  round(CAST(SUM(sw) AS DOUBLE) / SUM(sn), 6) AS win_rate,
        |  CAST(COUNT(*) AS BIGINT) AS n_strata,
        |  round(CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1e9, 6)
        |    AS adj_win_rate
        |FROM st GROUP BY 1 ORDER BY model_id""".stripMargin) { (s, dir) =>
      import graft.ext.Preference
      val base = graft.Tables.load(s, dir, "events")
        .filter(col("event_id").isNotNull)
        .select(col("event_id"), (col("event_id") % 8).as("ma"),
          (expr("event_id div 8") % 8).as("mb"))
        .filter(col("ma") =!= col("mb"))
        .select(col("event_id"), col("ma"), col("mb"),
          (col("event_id") * 13 % 40 + col("ma") * 5).as("la"),
          (col("event_id") * 29 % 40 + col("mb") * 5).as("lb"))
      val aWins = ((col("la") > col("lb")) ||
        (col("la") === col("lb") &&
          (col("ma") * 37 % 23) >= (col("mb") * 37 % 23))) =!=
        (conv(substring(md5(concat(col("event_id").cast("string"),
          lit(":swr14"))), 1, 7), 16, 10).cast("long") % 4 === 0)
      val votes = base.select(
        when(aWins, col("ma")).otherwise(col("mb")).as("winner"),
        when(aWins, col("mb")).otherwise(col("ma")).as("loser"),
        when(aWins, col("la")).otherwise(col("lb")).as("winner_len"),
        when(aWins, col("lb")).otherwise(col("la")).as("loser_len"))
      Preference.stratifiedWinRate(votes)
    },

    // ——— paired-bootstrap significance (Koehn 2004) between two
    //     systems on the same segments, via the DETERMINISTIC Poisson
    //     bootstrap (Chamandy et al. 2012 — per-row md5-thresholded
    //     Poisson(1) weights, no RNG state, no global n): 200
    //     resamples of the per-doc metric deltas → win fraction,
    //     ties-count-half p-value, nearest-rank 95% CI. Every
    //     comparison is integer/rational (sign of Σw·qd; sq·sw' vs
    //     sq'·sw on HUGEINT) — doubles only in the final reported
    //     divisions. System A carries a planted ~+0.0095 mean
    //     improvement over the shared base metric. ———
    Q("q373_paired_bootstrap",
      """WITH segs AS (
        |  SELECT doc_id AS s,
        |    CAST((CAST(concat('0x', substring(md5('pba#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000)
        |      + (CAST(concat('0x', substring(md5('pbb#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 200)
        |      - 90 AS DOUBLE) / 1000.0 AS ma,
        |    CAST(CAST(concat('0x', substring(md5('pba#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      AS DOUBLE) / 1000.0 AS mb
        |  FROM documents WHERE doc_id IS NOT NULL
        |), base AS (
        |  SELECT s, CAST(round(1e6 * (ma - mb)) AS BIGINT) AS qd
        |  FROM segs
        |), fs AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_segs,
        |    CAST(COALESCE(SUM(qd), 0) AS BIGINT) AS sqd
        |  FROM base
        |), wts AS (
        |  SELECT r, s, qd,
        |    CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
        |      WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3
        |      WHEN u < 9963 THEN 4 ELSE 5 END AS w
        |  FROM (
        |    SELECT r, s, qd, CAST(concat('0x', substring(md5('pb#'
        |      || CAST(r AS VARCHAR) || '#' || CAST(s AS VARCHAR)),
        |      1, 7)) AS BIGINT) % 10000 AS u
        |    FROM (SELECT s, qd, unnest(range(0, 200)) AS r FROM base))
        |), means AS MATERIALIZED (
        |  SELECT r, CAST(SUM(w) AS BIGINT) AS sw,
        |    CAST(SUM(w * qd) AS BIGINT) AS sq
        |  FROM wts GROUP BY 1 HAVING SUM(w) > 0
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_eff,
        |    CAST(SUM(CASE WHEN sq > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS wins,
        |    CAST(SUM(CASE WHEN sq < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS losses,
        |    CAST(SUM(CASE WHEN sq = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties
        |  FROM means
        |), rk AS (
        |  SELECT x.r, x.sw, x.sq, CAST(COUNT(*) AS BIGINT) AS rk
        |  FROM means x JOIN means y ON
        |    CAST(y.sq AS HUGEINT) * x.sw < CAST(x.sq AS HUGEINT) * y.sw
        |    OR (CAST(y.sq AS HUGEINT) * x.sw
        |          = CAST(x.sq AS HUGEINT) * y.sw
        |        AND y.r <= x.r)
        |  GROUP BY 1, 2, 3
        |), ci AS (
        |  SELECT MAX(CASE WHEN rk = (n_eff + 39) // 40 THEN
        |      round(CAST(sq AS DOUBLE) / 1e6 / sw, 6) END) AS ci_lo,
        |    MAX(CASE WHEN rk = (39 * n_eff + 39) // 40 THEN
        |      round(CAST(sq AS DOUBLE) / 1e6 / sw, 6) END) AS ci_hi
        |  FROM rk CROSS JOIN tot
        |)
        |SELECT n_segs, CAST(200 AS BIGINT) AS b_resamples, n_eff,
        |  CASE WHEN n_segs > 0 THEN
        |    round(CAST(sqd AS DOUBLE) / 1e6 / n_segs, 6)
        |  END AS mean_delta,
        |  CASE WHEN n_eff > 0 THEN
        |    round(CAST(wins AS DOUBLE) / n_eff, 6) END AS win_frac,
        |  CASE WHEN n_eff > 0 THEN
        |    round(CAST(losses AS DOUBLE) / n_eff, 6) END AS loss_frac,
        |  CASE WHEN n_eff > 0 THEN
        |    round(CAST(ties AS DOUBLE) / n_eff, 6) END AS tie_frac,
        |  CASE WHEN n_eff > 0 THEN
        |    round((CAST(losses AS DOUBLE) + CAST(ties AS DOUBLE) / 2)
        |      / n_eff, 6) END AS p_value,
        |  ci_lo, ci_hi
        |FROM fs CROSS JOIN tot CROSS JOIN ci""".stripMargin) { (s, dir) =>
      val c1 = conv(substring(md5(concat(lit("pba#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val c2 = conv(substring(md5(concat(lit("pbb#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val segs = docs(s, dir).filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("seg_id"),
          ((c1 % 1000 + c2 % 200 - 90).cast("double") / 1000.0)
            .as("ma"),
          ((c1 % 1000).cast("double") / 1000.0).as("mb"))
      Evals.pairedBootstrap(segs, "seg_id", "ma", "mb", b = 200,
        seed = "pb")
    },

    // ——— approximate randomization / paired permutation test
    //     (Riezler & Maxwell 2005) on the SAME planted two-system
    //     panel as q373, so the two significance tests are directly
    //     comparable: each resample sign-flips every segment delta on
    //     an md5 coin; |sum flipped| >= |sum observed| is a PURE
    //     INTEGER comparison (shared denominator n); p = (r+1)/(b+1)
    //     validity-corrected. ———
    Q("q374_permutation_test",
      """WITH segs AS (
        |  SELECT doc_id AS s,
        |    CAST((CAST(concat('0x', substring(md5('pba#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000)
        |      + (CAST(concat('0x', substring(md5('pbb#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 200)
        |      - 90 AS DOUBLE) / 1000.0 AS ma,
        |    CAST(CAST(concat('0x', substring(md5('pba#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      AS DOUBLE) / 1000.0 AS mb
        |  FROM documents WHERE doc_id IS NOT NULL
        |), base AS (
        |  SELECT s, CAST(round(1e6 * (ma - mb)) AS BIGINT) AS qd
        |  FROM segs
        |), obs AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_segs,
        |    CAST(COALESCE(SUM(qd), 0) AS BIGINT) AS sqd
        |  FROM base
        |), res AS (
        |  SELECT r, CAST(COALESCE(SUM(CASE WHEN
        |      CAST(concat('0x', substring(md5('ar#'
        |        || CAST(r AS VARCHAR) || '#' || CAST(s AS VARCHAR)),
        |        1, 7)) AS BIGINT) % 2 = 0
        |      THEN qd ELSE -qd END), 0) AS BIGINT) AS fq
        |  FROM (SELECT s, qd, unnest(range(0, 200)) AS r FROM base)
        |  GROUP BY 1
        |), hits AS (
        |  SELECT CAST(COALESCE(SUM(CASE WHEN ABS(fq) >= ABS(sqd)
        |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
        |  FROM res CROSS JOIN obs
        |)
        |SELECT n_segs, CAST(200 AS BIGINT) AS b_resamples,
        |  CASE WHEN n_segs > 0 THEN
        |    round(CAST(sqd AS DOUBLE) / 1e6 / n_segs, 6)
        |  END AS mean_delta,
        |  CASE WHEN n_segs > 0 THEN n_hits END AS n_hits,
        |  CASE WHEN n_segs > 0 THEN
        |    round((CAST(n_hits AS DOUBLE) + 1) / 201, 6)
        |  END AS p_value
        |FROM obs CROSS JOIN hits""".stripMargin) { (s, dir) =>
      val c1 = conv(substring(md5(concat(lit("pba#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val c2 = conv(substring(md5(concat(lit("pbb#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val segs = docs(s, dir).filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("seg_id"),
          ((c1 % 1000 + c2 % 200 - 90).cast("double") / 1000.0)
            .as("ma"),
          ((c1 % 1000).cast("double") / 1000.0).as("mb"))
      Evals.permutationTest(segs, "seg_id", "ma", "mb", b = 200,
        seed = "ar")
    },

    // ——— McNemar's test (1947) on two systems' paired binary
    //     outcomes over the shared task set (planted 70% vs 60%
    //     accuracies on independent md5 coins): only discordant
    //     pairs carry signal; uncorrected and continuity-corrected
    //     chi-squared, each an exact integer ratio. ———
    Q("q376_mcnemar", mcnemarOracleSql) { (s, dir) =>
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      Evals.mcNemar(
        docs(s, dir).filter(col("doc_id").isNotNull)
          .select(col("doc_id"), (coin("mna#") % 100 < 70).as("a"),
            (coin("mnb#") % 100 < 60).as("b")),
        "doc_id", "a", "b")
    },

    // ——— Cochran's Q (1950): the k-system McNemar — four systems
    //     with planted 50/58/66/74% accuracies on the shared task
    //     set; Q from exact integer sufficient statistics (per-system
    //     and per-task success totals, squares on HUGEINT), complete-
    //     panel gated like q370's kendallW. ———
    Q("q377_cochran_q",
      """WITH r AS (
        |  SELECT doc_id, unnest(range(0, 4)) AS s
        |  FROM documents WHERE doc_id IS NOT NULL
        |), o AS (
        |  SELECT doc_id AS t, s,
        |    CASE WHEN (CAST(concat('0x', substring(md5('cq#'
        |        || CAST(s AS VARCHAR) || '#' || CAST(doc_id AS VARCHAR)),
        |        1, 7)) AS BIGINT) % 100) < 50 + 8 * s
        |      THEN 1 ELSE 0 END AS c
        |  FROM r
        |), sys AS (
        |  -- smn = min DISTINCT tasks per system, smx = max raw
        |  -- count: smn = smx = n_tasks is the exactly-once gate
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_systems,
        |    SUM(CAST(g AS HUGEINT) * g) AS sg2,
        |    CAST(SUM(g) AS BIGINT) AS n,
        |    MIN(sd) AS smn, MAX(sn) AS smx
        |  FROM (SELECT s, CAST(SUM(c) AS BIGINT) AS g,
        |    CAST(COUNT(*) AS BIGINT) AS sn,
        |    CAST(COUNT(DISTINCT t) AS BIGINT) AS sd
        |    FROM o GROUP BY 1)
        |), tk AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_tasks,
        |    SUM(CAST(l AS HUGEINT) * l) AS sl2
        |  FROM (SELECT t, CAST(SUM(c) AS BIGINT) AS l FROM o
        |    GROUP BY 1)
        |)
        |SELECT n_tasks, n_systems, n AS n_successes,
        |  CASE WHEN CAST(n_systems AS HUGEINT) * n - sl2 <> 0
        |      AND smn = smx AND smx = n_tasks THEN
        |    round(CAST((n_systems - 1) * (CAST(n_systems AS HUGEINT)
        |        * sg2 - CAST(n AS HUGEINT) * n) AS DOUBLE)
        |      / CAST(CAST(n_systems AS HUGEINT) * n - sl2 AS DOUBLE),
        |      6) END AS q
        |FROM sys CROSS JOIN tk""".stripMargin) { (s, dir) =>
      val r = docs(s, dir).filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          explode(sequence(lit(0L), lit(3L))).as("sys"))
      val coin = conv(substring(md5(concat(lit("cq#"),
        col("sys").cast("string"), lit("#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      Evals.cochranQ(
        r.select(col("doc_id"), col("sys"),
          (coin % 100 < col("sys") * 8 + 50).as("correct")),
        "doc_id", "sys", "correct")
    },

    // ——— STREAMING McNemar: the q376 panel ingested as a stream,
    //     discordant counters as monotone per-shard
    //     mapGroupsWithState ledgers (bounded state: 64 shards, not
    //     |tasks|), read back at max per shard, summed, finished with
    //     the shared counts finisher — converges to the batch
    //     statistic exactly (same oracle as q376). ———
    Q("q380_streaming_mcnemar", mcnemarOracleSql) { (s, dir) =>
      import s.implicits._
      import graft.ext.Streaming
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val stream = Streaming
        .readParquetStream(s, s"$dir/documents.parquet")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("task_id"),
          (coin("mna#") % 100 < 70).as("a"),
          (coin("mnb#") % 100 < 60).as("b"))
        .as[Streaming.PairedOutcome]
      val q = Streaming.runToMemory(
        Streaming.mcNemarLedgerStream(stream).toDF(),
        "q380_ledger", org.apache.spark.sql.streaming.OutputMode.Update)
      q.stop()
      // monotone counters → the final ledger is the per-shard max
      val ledger = s.table("q380_ledger").groupBy("shard")
        .agg(max("n_pairs").as("n_pairs"),
          max("n_concordant").as("n_concordant"),
          max("b_a_only").as("b_a_only"),
          max("b_b_only").as("b_b_only"))
      Evals.mcNemarOnCounts(ledger)
    },

    // ——— DoReMi one-round domain reweighting (Xie et al. 2023): per-
    //     source clipped excess loss (proxy − reference, md5-synthed
    //     per doc) → one multiplicative-weights update exp(η·excess)
    //     from the uniform prior, 20% uniform-smoothed. Per-example
    //     excesses 1e-6-quantized; MW scores MAX-NORMALIZED into
    //     (0, 1] (softmax shift — overflow-free for any excess) then
    //     1e-9-quantized before the normalizing sum; ONE domain-keyed
    //     aggregate + a 1-row max broadcast. ———
    Q("q381_doremi_round",
      """WITH ex AS (
        |  SELECT source AS d,
        |    CAST(round(1e6 * GREATEST(
        |      CAST(CAST(concat('0x', substring(md5('dma#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 5000
        |        AS DOUBLE) / 1000.0
        |      - CAST(CAST(concat('0x', substring(md5('dmb#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 4000
        |        AS DOUBLE) / 1000.0,
        |      CAST(0 AS DOUBLE))) AS BIGINT) AS q
        |  FROM documents WHERE source IS NOT NULL
        |    AND doc_id IS NOT NULL
        |), dom AS (
        |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n_examples,
        |    CAST(SUM(q) AS BIGINT) AS sq
        |  FROM ex GROUP BY 1
        |), dm AS (
        |  SELECT d, n_examples,
        |    CAST(sq AS DOUBLE) / 1e6 / n_examples AS mx
        |  FROM dom
        |), mxt AS (
        |  -- softmax shift: scores max-normalized into (0, 1] so the
        |  -- exp can never overflow the BIGINT quantization
        |  SELECT MAX(mx) AS mxm FROM dm
        |), sc AS (
        |  SELECT d, n_examples, mx,
        |    CAST(round(1e9 * exp(CAST(1.0 AS DOUBLE) * (mx - mxm)))
        |      AS BIGINT) AS s
        |  FROM dm CROSS JOIN mxt
        |), tot AS (
        |  SELECT CAST(SUM(s) AS BIGINT) AS ts,
        |    CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM sc
        |)
        |SELECT d AS source, n_examples, round(mx, 6) AS excess_loss,
        |  round(CAST(0.8 AS DOUBLE) * s / ts
        |    + CAST(0.2 AS DOUBLE) / nd, 6) AS weight
        |FROM sc CROSS JOIN tot ORDER BY source""".stripMargin) {
      (s, dir) =>
        def coin(tag: String) = conv(substring(md5(concat(lit(tag),
          col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
        val ex = docs(s, dir)
          .filter(col("source").isNotNull && col("doc_id").isNotNull)
          .select(col("source"),
            ((coin("dma#") % 5000).cast("double") / 1000.0)
              .as("proxy_loss"),
            ((coin("dmb#") % 4000).cast("double") / 1000.0)
              .as("ref_loss"))
        Corpus.doremiRound(ex, "source", "proxy_loss", "ref_loss",
          eta = 1.0, smooth = 0.2)
    },

    // ——— off-policy evaluation: IPS / SNIPS / effective sample size
    //     over a logged-bandit synth (behavior prob in [0.1, 1),
    //     target prob in (0, 1], reward in [0, 1)). Per-example w,
    //     w·r, w² 1e-6-quantized before the sums; ESS square on
    //     HUGEINT; one map pass + one scalar aggregate. ———
    Q("q384_ips_offpolicy", ipsOracleSql) { (s, dir) =>
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val logged = docs(s, dir).filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          ((coin("ipb#") % 900 + 100).cast("double") / 1000.0)
            .as("pb"),
          ((coin("ipt#") % 1000 + 1).cast("double") / 1000.0)
            .as("pt"),
          ((coin("ipr#") % 100).cast("double") / 100.0).as("r"))
      Evals.ipsOffPolicy(logged, "doc_id", "pb", "pt", "r")
    },

    // ——— STREAMING IPS: the q384 logged-bandit synth ingested as a
    //     stream, weight moments as monotone per-shard
    //     mapGroupsWithState ledgers (each example quantized with the
    //     same HALF_UP 1e-6 rule as the batch op), summed and
    //     finished by the shared counts finisher — same oracle as
    //     q384. ———
    Q("q385_streaming_ips", ipsOracleSql) { (s, dir) =>
      import s.implicits._
      import graft.ext.Streaming
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val stream = Streaming
        .readParquetStream(s, s"$dir/documents.parquet")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("task_id"),
          ((coin("ipb#") % 900 + 100).cast("double") / 1000.0)
            .as("pb"),
          ((coin("ipt#") % 1000 + 1).cast("double") / 1000.0)
            .as("pt"),
          ((coin("ipr#") % 100).cast("double") / 100.0).as("r"))
        .as[Streaming.LoggedPlay]
      val q = Streaming.runToMemory(
        Streaming.ipsLedgerStream(stream).toDF(),
        "q385_ledger", org.apache.spark.sql.streaming.OutputMode.Update)
      q.stop()
      // final ledger = LAST row per shard, by argmax on the strictly
      // monotone n_total (NOT per-counter max: swr is a sum of
      // 1e6·w·r terms, which negative rewards make non-monotone)
      val ledger = s.table("q385_ledger").groupBy("shard")
        .agg(max(struct(col("n_total"), col("n_samples"), col("sw"),
          col("swr"), col("sw2"))).as("_m"))
        .select(col("shard"), col("_m.n_total").as("n_total"),
          col("_m.n_samples").as("n_samples"), col("_m.sw").as("sw"),
          col("_m.swr").as("swr"), col("_m.sw2").as("sw2"))
      Evals.ipsOnCounts(ledger)
    },

    // ——— doubly-robust off-policy estimate (Dudík et al. 2011): the
    //     q384 synth plus an imperfect md5-synthed reward model q̂;
    //     DR term 1e-6-quantized per example, one scalar aggregate,
    //     plain IPS alongside. ———
    Q("q386_dr_offpolicy",
      """WITH l AS (
        |  SELECT doc_id AS t,
        |    CAST(CAST(concat('0x', substring(md5('ipb#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 900
        |      + 100 AS DOUBLE) / 1000.0 AS pb,
        |    CAST(CAST(concat('0x', substring(md5('ipt#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      + 1 AS DOUBLE) / 1000.0 AS pt,
        |    CAST(CAST(concat('0x', substring(md5('ipr#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100
        |      AS DOUBLE) / 100.0 AS r,
        |    CAST(CAST(concat('0x', substring(md5('ipq#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100
        |      AS DOUBLE) / 100.0 AS qh
        |  FROM documents WHERE doc_id IS NOT NULL
        |), q AS (
        |  SELECT
        |    CAST(round(1e6 * (qh + (pt / pb) * (r - qh))) AS BIGINT)
        |      AS qd,
        |    CAST(round(1e6 * (pt / pb) * r) AS BIGINT) AS qwr
        |  FROM l WHERE pb > 0
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS alln FROM l
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(COALESCE(SUM(qd), 0) AS BIGINT) AS sd,
        |    CAST(COALESCE(SUM(qwr), 0) AS BIGINT) AS swr
        |  FROM q
        |)
        |SELECT n_samples, alln - n_samples AS n_dropped,
        |  CASE WHEN n_samples > 0 THEN
        |    round(CAST(sd AS DOUBLE) / 1e6 / n_samples, 6) END AS dr,
        |  CASE WHEN n_samples > 0 THEN
        |    round(CAST(swr AS DOUBLE) / 1e6 / n_samples, 6) END AS ips
        |FROM agg CROSS JOIN tot""".stripMargin) { (s, dir) =>
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val logged = docs(s, dir).filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          ((coin("ipb#") % 900 + 100).cast("double") / 1000.0)
            .as("pb"),
          ((coin("ipt#") % 1000 + 1).cast("double") / 1000.0)
            .as("pt"),
          ((coin("ipr#") % 100).cast("double") / 100.0).as("r"),
          ((coin("ipq#") % 100).cast("double") / 100.0).as("qh"))
      Evals.drOffPolicy(logged, "doc_id", "pb", "pt", "r", "qh")
    },

    // ——— isotonic recalibration by Pool-Adjacent-Violators (Ayer et
    //     al. 1955; Zadrozny & Elkan 2002): per-source least-squares
    //     nondecreasing step map from a planted noisy-monotone score
    //     panel (P(y=1) ≈ 0.2 + 0.6·score). Engine: bucket-pooled
    //     exact-rational PAV fold (the eloFold sessionizer shape);
    //     oracle: the max-min characterization fitted(k) =
    //     max_{i≤k} min_{j≥k} avg(i..j) over the same bucket
    //     dictionary, compacted into blocks — two INDEPENDENT
    //     formulations of the same unique isotonic fit (distinct
    //     rationals stay distinct as doubles at this scale, so the
    //     double minimax splits blocks exactly where the integer
    //     rational PAV does). ———
    Q("q387_isotonic_pav",
      """WITH sc AS (
        |  SELECT source AS g,
        |    CAST(concat('0x', substring(md5('isa#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      AS sm,
        |    CASE WHEN CAST(concat('0x', substring(md5('isb#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      < 200 + (600 * (CAST(concat('0x', substring(md5('isa#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
        |        % 1000)) // 1000
        |      THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE source IS NOT NULL
        |    AND doc_id IS NOT NULL
        |), bkt AS MATERIALIZED (
        |  SELECT g, sm AS b, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sy
        |  FROM sc GROUP BY 1, 2
        |), idx AS MATERIALIZED (
        |  SELECT g, b, n, sy,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY b)
        |      AS BIGINT) AS k,
        |    CAST(SUM(n) OVER (PARTITION BY g ORDER BY b) AS BIGINT)
        |      AS cn,
        |    CAST(SUM(sy) OVER (PARTITION BY g ORDER BY b) AS BIGINT)
        |      AS cy
        |  FROM bkt
        |), pairs AS (
        |  SELECT a.g, a.k AS i, c.k AS j,
        |    CAST(c.cy - (a.cy - a.sy) AS DOUBLE)
        |      / CAST(c.cn - (a.cn - a.n) AS DOUBLE) AS avgv
        |  FROM idx a JOIN idx c ON a.g = c.g AND a.k <= c.k
        |), sufmin AS (
        |  SELECT g, i, j,
        |    MIN(avgv) OVER (PARTITION BY g, i ORDER BY j DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        |  FROM pairs
        |), fit AS MATERIALIZED (
        |  SELECT g, j AS k, MAX(mn) AS fitted FROM sufmin GROUP BY 1, 2
        |), blk AS (
        |  SELECT g, k,
        |    CAST(SUM(CASE WHEN prev IS NULL OR prev <> fitted
        |        THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY g ORDER BY k) AS BIGINT) AS block_id
        |  FROM (SELECT g, k, fitted,
        |    lag(fitted) OVER (PARTITION BY g ORDER BY k) AS prev
        |    FROM fit)
        |)
        |SELECT idx.g AS source, blk.block_id,
        |  round(CAST(MIN(idx.b) AS DOUBLE) / 1000, 6) AS score_lo,
        |  round(CAST(MAX(idx.b) AS DOUBLE) / 1000, 6) AS score_hi,
        |  CAST(SUM(idx.n) AS BIGINT) AS n,
        |  CAST(SUM(idx.sy) AS BIGINT) AS n_pos,
        |  round(CAST(SUM(idx.sy) AS DOUBLE) / SUM(idx.n), 6) AS fitted
        |FROM idx JOIN blk ON idx.g = blk.g AND idx.k = blk.k
        |GROUP BY 1, 2
        |ORDER BY source, block_id""".stripMargin) { (s, dir) =>
      import graft.ext.Classifier
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val sm = coin("isa#") % 1000
      val thr = lit(200L) +
        floor((lit(600L) * sm).cast("double") / 1000.0).cast("long")
      val scored = docs(s, dir)
        .filter(col("source").isNotNull && col("doc_id").isNotNull)
        .select(col("source"),
          (sm.cast("double") / 1000.0).as("score"),
          when(coin("isb#") % 1000 < thr, 1L).otherwise(0L).as("y"))
      Classifier.isotonicCalibration(scored, "y", "score", "source",
        buckets = 1000)
    },

    // ——— STREAMING anytime-valid sequential test: the q373/q374
    //     planted panel ingested as a stream, quantized delta moments
    //     as per-shard mapGroupsWithState ledgers (argmax-on-n_segs
    //     readback — sqd is signed), summed and finished by the
    //     shared confidence-sequence finisher (Howard et al. 2021
    //     stitched boundary, α = 0.05, sub-Gaussian scale 0.109 —
    //     the operator's Hoeffding rule wants scale ≥ max|delta|,
    //     and these deltas lie in [−0.09, 0.109]). The interval is
    //     valid at ANY
    //     stopping time — the always-valid readout the fixed-horizon
    //     q373/q374 can't give a live ledger. ———
    Q("q388_streaming_confseq",
      """WITH segs AS (
        |  SELECT doc_id AS s,
        |    CAST((CAST(concat('0x', substring(md5('pba#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000)
        |      + (CAST(concat('0x', substring(md5('pbb#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 200)
        |      - 90 AS DOUBLE) / 1000.0 AS ma,
        |    CAST(CAST(concat('0x', substring(md5('pba#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      AS DOUBLE) / 1000.0 AS mb
        |  FROM documents WHERE doc_id IS NOT NULL
        |), base AS (
        |  SELECT CAST(round(1e6 * (ma - mb)) AS BIGINT) AS qd,
        |    CAST(round(1e6 * (ma - mb) * (ma - mb)) AS BIGINT) AS qd2
        |  FROM segs
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_segs,
        |    CAST(COALESCE(SUM(qd), 0) AS BIGINT) AS sqd,
        |    CAST(COALESCE(SUM(qd2), 0) AS BIGINT) AS sqd2
        |  FROM base
        |), fin AS (
        |  SELECT n_segs,
        |    CAST(sqd AS DOUBLE) / 1e6 / n_segs AS meanraw,
        |    CAST(sqd2 AS DOUBLE) / 1e6 / n_segs
        |      - (CAST(sqd AS DOUBLE) / 1e6 / n_segs)
        |        * (CAST(sqd AS DOUBLE) / 1e6 / n_segs) AS varraw,
        |    CAST(0.109 AS DOUBLE) * CAST(1.7 AS DOUBLE)
        |      * sqrt((ln(ln(CAST(2.0 AS DOUBLE) * n_segs))
        |        + CAST(0.72 AS DOUBLE)
        |          * ln(CAST(5.2 AS DOUBLE) / CAST(0.05 AS DOUBLE)))
        |        / n_segs) AS radraw
        |  FROM agg
        |)
        |SELECT n_segs,
        |  CASE WHEN n_segs > 0 THEN round(meanraw, 6) END
        |    AS mean_delta,
        |  CASE WHEN n_segs > 0 THEN round(varraw, 6) END AS var_delta,
        |  CASE WHEN n_segs > 0 THEN round(radraw, 6) END AS radius,
        |  CASE WHEN n_segs > 0 THEN round(meanraw - radraw, 6) END
        |    AS ci_lo,
        |  CASE WHEN n_segs > 0 THEN round(meanraw + radraw, 6) END
        |    AS ci_hi,
        |  CASE WHEN n_segs > 0 THEN
        |    CAST(CASE WHEN abs(round(meanraw, 6)) > round(radraw, 6)
        |      THEN 1 ELSE 0 END AS BIGINT) END AS reject_null
        |FROM fin""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ext.Streaming
      val c1 = conv(substring(md5(concat(lit("pba#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val c2 = conv(substring(md5(concat(lit("pbb#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val stream = Streaming
        .readParquetStream(s, s"$dir/documents.parquet")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("task_id"),
          ((c1 % 1000 + c2 % 200 - 90).cast("double") / 1000.0)
            .as("a"),
          ((c1 % 1000).cast("double") / 1000.0).as("b"))
        .as[Streaming.PairedScore]
      val q = Streaming.runToMemory(
        Streaming.confSeqLedgerStream(stream).toDF(),
        "q388_ledger", org.apache.spark.sql.streaming.OutputMode.Update)
      q.stop()
      // final ledger = LAST row per shard, by argmax on the strictly
      // monotone n_segs (sqd is signed — per-counter max is wrong)
      val ledger = s.table("q388_ledger").groupBy("shard")
        .agg(max(struct(col("n_segs"), col("sqd"), col("sqd2")))
          .as("_m"))
        .select(col("_m.n_segs").as("n_segs"), col("_m.sqd").as("sqd"),
          col("_m.sqd2").as("sqd2"))
      Evals.seqTestOnCounts(ledger, alpha = 0.05, scale = 0.109)
    },

    // ——— per-group Poisson-bootstrap percentile CI (Chamandy et al.
    //     2012): nearest-rank 95% CI on each source's mean metric,
    //     the q373 deterministic-resample machinery keyed by (group,
    //     resample) — the rank comparison is a group-EQUI self-join
    //     with b² fan-out per group, never a BNLJ. ———
    Q("q389_grouped_bootstrap_ci",
      """WITH rws AS (
        |  SELECT source AS g, doc_id AS s,
        |    CAST(round(1e6 * (CAST(CAST(concat('0x', substring(
        |      md5('gbx#' || CAST(doc_id AS VARCHAR)), 1, 7))
        |      AS BIGINT) % 1000 AS DOUBLE) / 1000.0)) AS BIGINT) AS qx
        |  FROM documents WHERE source IS NOT NULL
        |    AND doc_id IS NOT NULL
        |), grp AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(COALESCE(SUM(qx), 0) AS BIGINT) AS sqx
        |  FROM rws GROUP BY 1
        |), wts AS (
        |  SELECT g, r, s, qx,
        |    CASE WHEN u < 3679 THEN 0 WHEN u < 7358 THEN 1
        |      WHEN u < 9197 THEN 2 WHEN u < 9810 THEN 3
        |      WHEN u < 9963 THEN 4 ELSE 5 END AS w
        |  FROM (
        |    SELECT g, r, s, qx, CAST(concat('0x', substring(md5('gb#'
        |      || CAST(r AS VARCHAR) || '#' || CAST(s AS VARCHAR)),
        |      1, 7)) AS BIGINT) % 10000 AS u
        |    FROM (SELECT g, s, qx, unnest(range(0, 200)) AS r
        |      FROM rws))
        |), means AS MATERIALIZED (
        |  SELECT g, r, CAST(SUM(w) AS BIGINT) AS sw,
        |    CAST(SUM(w * qx) AS BIGINT) AS sq
        |  FROM wts GROUP BY 1, 2 HAVING SUM(w) > 0
        |), neff AS MATERIALIZED (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_eff FROM means
        |  GROUP BY 1
        |), rk AS (
        |  SELECT x.g, x.r, x.sw, x.sq, CAST(COUNT(*) AS BIGINT) AS rk
        |  FROM means x JOIN means y ON x.g = y.g AND (
        |    CAST(y.sq AS HUGEINT) * x.sw < CAST(x.sq AS HUGEINT) * y.sw
        |    OR (CAST(y.sq AS HUGEINT) * x.sw
        |          = CAST(x.sq AS HUGEINT) * y.sw
        |        AND y.r <= x.r))
        |  GROUP BY 1, 2, 3, 4
        |), ci AS (
        |  SELECT rk.g,
        |    MAX(CASE WHEN rk = (n_eff + 39) // 40 THEN
        |      round(CAST(sq AS DOUBLE) / 1e6 / sw, 6) END) AS ci_lo,
        |    MAX(CASE WHEN rk = (39 * n_eff + 39) // 40 THEN
        |      round(CAST(sq AS DOUBLE) / 1e6 / sw, 6) END) AS ci_hi
        |  FROM rk JOIN neff ON rk.g = neff.g GROUP BY 1
        |)
        |SELECT grp.g AS source, grp.n_rows,
        |  CAST(200 AS BIGINT) AS b_resamples,
        |  CAST(COALESCE(neff.n_eff, 0) AS BIGINT) AS n_eff,
        |  CASE WHEN grp.n_rows > 0 THEN
        |    round(CAST(grp.sqx AS DOUBLE) / 1e6 / grp.n_rows, 6) END
        |    AS mean,
        |  ci.ci_lo, ci.ci_hi
        |FROM grp LEFT JOIN neff ON grp.g = neff.g
        |  LEFT JOIN ci ON grp.g = ci.g
        |ORDER BY source""".stripMargin) { (s, dir) =>
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val rows = docs(s, dir)
        .filter(col("source").isNotNull && col("doc_id").isNotNull)
        .select(col("source"), col("doc_id"),
          ((coin("gbx#") % 1000).cast("double") / 1000.0).as("x"))
      Evals.groupedBootstrapCI(rows, "source", "doc_id", "x", b = 200,
        seed = "gb")
    },

    // ——— calibration gain: fit the q387 PAV map and apply it back
    //     to the same panel — per-source Brier before/after. On a
    //     grid-aligned panel brier_cal <= brier_raw is a THEOREM
    //     (PAV is the least-squares monotone bucket-constant map and
    //     the raw grid score is one); the gap is the removed
    //     miscalibration. Oracle refits via the q387 minimax and
    //     applies per bucket (fitted is the block-sum division in
    //     both constructions, so the 6-dp fitted agrees). ———
    Q("q390_calibration_gain",
      """WITH sc AS (
        |  SELECT source AS g,
        |    CAST(concat('0x', substring(md5('isa#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      AS sm,
        |    CASE WHEN CAST(concat('0x', substring(md5('isb#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      < 200 + (600 * (CAST(concat('0x', substring(md5('isa#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
        |        % 1000)) // 1000
        |      THEN 1 ELSE 0 END AS y
        |  FROM documents WHERE source IS NOT NULL
        |    AND doc_id IS NOT NULL
        |), bkt AS MATERIALIZED (
        |  SELECT g, sm AS b, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(round(1e6 * (sm / 1000.0 - y)
        |      * (sm / 1000.0 - y)) AS BIGINT)) AS BIGINT) AS qraw
        |  FROM sc GROUP BY 1, 2
        |), idx AS MATERIALIZED (
        |  SELECT g, b, n, sy, qraw,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY b)
        |      AS BIGINT) AS k,
        |    CAST(SUM(n) OVER (PARTITION BY g ORDER BY b) AS BIGINT)
        |      AS cn,
        |    CAST(SUM(sy) OVER (PARTITION BY g ORDER BY b) AS BIGINT)
        |      AS cy
        |  FROM bkt
        |), pairs AS (
        |  SELECT a.g, a.k AS i, c.k AS j,
        |    CAST(c.cy - (a.cy - a.sy) AS DOUBLE)
        |      / CAST(c.cn - (a.cn - a.n) AS DOUBLE) AS avgv
        |  FROM idx a JOIN idx c ON a.g = c.g AND a.k <= c.k
        |), sufmin AS (
        |  SELECT g, i, j,
        |    MIN(avgv) OVER (PARTITION BY g, i ORDER BY j DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        |  FROM pairs
        |), fit AS MATERIALIZED (
        |  SELECT g, j AS k, round(MAX(mn), 6) AS f6, MAX(mn) AS fraw
        |  FROM sufmin GROUP BY 1, 2
        |), app AS (
        |  SELECT i.g, i.n, i.qraw,
        |    CAST(round(1e6 * (f.f6 * f.f6 * i.n
        |      - CAST(2.0 AS DOUBLE) * f.f6 * i.sy + i.sy)) AS BIGINT)
        |      AS qcal
        |  FROM idx i JOIN fit f ON i.g = f.g AND i.k = f.k
        |), nb AS (
        |  SELECT g, CAST(COUNT(DISTINCT fraw) AS BIGINT) AS n_blocks
        |  FROM fit GROUP BY 1
        |)
        |SELECT app.g AS source, CAST(SUM(app.n) AS BIGINT) AS n,
        |  CAST(MAX(nb.n_blocks) AS BIGINT) AS n_blocks,
        |  round(CAST(SUM(app.qraw) AS DOUBLE) / 1e6 / SUM(app.n), 6)
        |    AS brier_raw,
        |  round(CAST(SUM(app.qcal) AS DOUBLE) / 1e6 / SUM(app.n), 6)
        |    AS brier_cal
        |FROM app JOIN nb ON app.g = nb.g
        |GROUP BY 1 ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.ext.Classifier
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val sm = coin("isa#") % 1000
      val thr = lit(200L) +
        floor((lit(600L) * sm).cast("double") / 1000.0).cast("long")
      val scored = docs(s, dir)
        .filter(col("source").isNotNull && col("doc_id").isNotNull)
        .select(col("source"),
          (sm.cast("double") / 1000.0).as("score"),
          when(coin("isb#") % 1000 < thr, 1L).otherwise(0L).as("y"))
      Classifier.calibrationGain(scored, "y", "score", "source",
        buckets = 1000)
    },

    // ——— OUT-OF-SAMPLE isotonic apply: fit the q387 PAV map on an
    //     md5-split train half, apply it to the holdout with the
    //     nearest-block-below gap rule (a holdout bucket in a gap
    //     between fitted blocks, or beyond the last block, reads the
    //     block below; below the first block reads the first block).
    //     n_gap counts holdout rows served by that extension path —
    //     the honest generalization readout calibrationGain's
    //     in-sample theorem can't give. Oracle refits the q387
    //     minimax on the train half and applies with the same rule
    //     (nearest TRAIN BUCKET below ≡ nearest block below, since
    //     every block's lo is a train bucket). ———
    Q("q394_isotonic_apply",
      """WITH sc AS (
        |  SELECT source AS g,
        |    CAST(concat('0x', substring(md5('isa#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      AS sm,
        |    CASE WHEN CAST(concat('0x', substring(md5('isb#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      < 200 + (600 * (CAST(concat('0x', substring(md5('isa#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
        |        % 1000)) // 1000
        |      THEN 1 ELSE 0 END AS y,
        |    CAST(concat('0x', substring(md5('hsp#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 2 AS tr
        |  FROM documents WHERE source IS NOT NULL
        |    AND doc_id IS NOT NULL
        |), bkt AS MATERIALIZED (
        |  SELECT g, sm AS b, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sy
        |  FROM sc WHERE tr = 0 GROUP BY 1, 2
        |), idx AS MATERIALIZED (
        |  SELECT g, b, n, sy,
        |    CAST(row_number() OVER (PARTITION BY g ORDER BY b)
        |      AS BIGINT) AS k,
        |    CAST(SUM(n) OVER (PARTITION BY g ORDER BY b) AS BIGINT)
        |      AS cn,
        |    CAST(SUM(sy) OVER (PARTITION BY g ORDER BY b) AS BIGINT)
        |      AS cy
        |  FROM bkt
        |), pairs AS (
        |  SELECT a.g, a.k AS i, c.k AS j,
        |    CAST(c.cy - (a.cy - a.sy) AS DOUBLE)
        |      / CAST(c.cn - (a.cn - a.n) AS DOUBLE) AS avgv
        |  FROM idx a JOIN idx c ON a.g = c.g AND a.k <= c.k
        |), sufmin AS (
        |  SELECT g, i, j,
        |    MIN(avgv) OVER (PARTITION BY g, i ORDER BY j DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        |  FROM pairs
        |), fit AS MATERIALIZED (
        |  SELECT f.g, f.k, i.b AS tb, round(f.fraw, 6) AS f6, f.fraw
        |  FROM (SELECT g, j AS k, MAX(mn) AS fraw FROM sufmin
        |        GROUP BY 1, 2) f
        |  JOIN idx i ON f.g = i.g AND f.k = i.k
        |), blk AS MATERIALIZED (
        |  SELECT g, fraw, CAST(MIN(tb) AS BIGINT) AS blo,
        |    CAST(MAX(tb) AS BIGINT) AS bhi, MAX(f6) AS f6
        |  FROM fit GROUP BY 1, 2
        |), hb AS MATERIALIZED (
        |  SELECT g, sm AS b, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(round(1e6 * (sm / 1000.0 - y)
        |      * (sm / 1000.0 - y)) AS BIGINT)) AS BIGINT) AS qraw
        |  FROM sc WHERE tr = 1 GROUP BY 1, 2
        |), lkp AS (
        |  SELECT hb.g, hb.b, hb.n, hb.sy, hb.qraw,
        |    arg_max(bl.f6, bl.blo) AS fb, arg_max(bl.bhi, bl.blo) AS hi
        |  FROM hb LEFT JOIN blk bl ON hb.g = bl.g AND bl.blo <= hb.b
        |  GROUP BY 1, 2, 3, 4, 5
        |), fb1 AS (
        |  SELECT g, arg_min(f6, blo) AS f0,
        |    CAST(COUNT(*) AS BIGINT) AS n_blocks
        |  FROM blk GROUP BY 1
        |), app AS (
        |  SELECT l.g, l.n, l.qraw, fb1.n_blocks,
        |    CASE WHEN l.fb IS NULL OR l.b > l.hi THEN l.n
        |      ELSE CAST(0 AS BIGINT) END AS ngap,
        |    CAST(round(1e6 * (COALESCE(l.fb, fb1.f0)
        |      * COALESCE(l.fb, fb1.f0) * l.n
        |      - CAST(2.0 AS DOUBLE) * COALESCE(l.fb, fb1.f0) * l.sy
        |      + l.sy)) AS BIGINT) AS qcal
        |  FROM lkp l JOIN fb1 ON l.g = fb1.g
        |)
        |SELECT g AS source, CAST(SUM(n) AS BIGINT) AS n,
        |  CAST(MAX(n_blocks) AS BIGINT) AS n_blocks,
        |  CAST(SUM(ngap) AS BIGINT) AS n_gap,
        |  round(CAST(SUM(qraw) AS DOUBLE) / 1e6 / SUM(n), 6)
        |    AS brier_raw,
        |  round(CAST(SUM(qcal) AS DOUBLE) / 1e6 / SUM(n), 6)
        |    AS brier_cal
        |FROM app GROUP BY 1 ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.ext.Classifier
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val sm = coin("isa#") % 1000
      val thr = lit(200L) +
        floor((lit(600L) * sm).cast("double") / 1000.0).cast("long")
      val scored = docs(s, dir)
        .filter(col("source").isNotNull && col("doc_id").isNotNull)
        .select(col("source"),
          (sm.cast("double") / 1000.0).as("score"),
          when(coin("isb#") % 1000 < thr, 1L).otherwise(0L).as("y"),
          (coin("hsp#") % 2).as("tr"))
      val blocks = Classifier.isotonicCalibration(
        scored.filter(col("tr") === 0L), "y", "score", "source",
        buckets = 1000)
      Classifier.applyCalibration(blocks,
        scored.filter(col("tr") === 1L), "y", "score", "source",
        buckets = 1000)
    },

    // ——— EMPIRICAL-BERNSTEIN anytime-valid test: the q388 confseq
    //     with a variance-adaptive radius — the fixture plants a
    //     small positive delta (mean ≈ 0.03, spread ≈ 0.02) under a
    //     deliberately CONSERVATIVE asserted bound scale = 1.0 (the
    //     mis-specification the sub-Gaussian radius can't survive):
    //     radius_sg stays above the mean (no rejection) while
    //     radius_eb adapts to the measured variance and rejects —
    //     the power the EB boundary buys when V̂ ≪ scale². Same
    //     (n, Σd, Σd²) ledger counters as q388. ———
    Q("q395_eb_confseq",
      """WITH segs AS (
        |  SELECT doc_id AS s,
        |    CAST(CAST(concat('0x', substring(md5('eba#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      AS DOUBLE) / 1000.0 AS x,
        |    CAST(100 + CAST(concat('0x', substring(md5('ebb#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100
        |      AS DOUBLE) / 5000.0 AS d
        |  FROM documents WHERE doc_id IS NOT NULL
        |), base AS (
        |  SELECT CAST(round(1e6 * ((x + d) - x)) AS BIGINT) AS qd,
        |    CAST(round(1e6 * ((x + d) - x) * ((x + d) - x)) AS BIGINT)
        |      AS qd2
        |  FROM segs
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_segs,
        |    CAST(COALESCE(SUM(qd), 0) AS BIGINT) AS sqd,
        |    CAST(COALESCE(SUM(qd2), 0) AS BIGINT) AS sqd2
        |  FROM base
        |), fin AS (
        |  SELECT n_segs,
        |    CAST(sqd AS DOUBLE) / 1e6 / n_segs AS meanraw,
        |    CAST(sqd2 AS DOUBLE) / 1e6 / n_segs
        |      - (CAST(sqd AS DOUBLE) / 1e6 / n_segs)
        |        * (CAST(sqd AS DOUBLE) / 1e6 / n_segs) AS varraw,
        |    ln(ln(CAST(2.0 AS DOUBLE) * n_segs))
        |      + CAST(0.72 AS DOUBLE)
        |        * ln(CAST(5.2 AS DOUBLE) / CAST(0.05 AS DOUBLE)) AS ell
        |  FROM agg
        |), fin2 AS (
        |  SELECT n_segs, meanraw, varraw,
        |    CAST(1.0 AS DOUBLE) * CAST(1.7 AS DOUBLE)
        |      * sqrt(ell / n_segs) AS radsg,
        |    CAST(1.7 AS DOUBLE)
        |      * sqrt(greatest(varraw, CAST(0.0 AS DOUBLE)) * ell
        |        / n_segs)
        |      + CAST(3.4 AS DOUBLE) * ell / n_segs AS radeb
        |  FROM fin
        |)
        |SELECT n_segs,
        |  CASE WHEN n_segs > 0 THEN round(meanraw, 6) END
        |    AS mean_delta,
        |  CASE WHEN n_segs > 0 THEN round(varraw, 6) END AS var_delta,
        |  CASE WHEN n_segs > 0 THEN round(radsg, 6) END AS radius_sg,
        |  CASE WHEN n_segs > 0 THEN round(radeb, 6) END AS radius_eb,
        |  CASE WHEN n_segs > 0 THEN round(meanraw - radeb, 6) END
        |    AS ci_lo,
        |  CASE WHEN n_segs > 0 THEN round(meanraw + radeb, 6) END
        |    AS ci_hi,
        |  CASE WHEN n_segs > 0 THEN
        |    CAST(CASE WHEN abs(round(meanraw, 6)) > round(radeb, 6)
        |      THEN 1 ELSE 0 END AS BIGINT) END AS reject_null
        |FROM fin2""".stripMargin) { (s, dir) =>
      def coin(tag: String) = conv(substring(md5(concat(lit(tag),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val x = (coin("eba#") % 1000).cast("double") / 1000.0
      val d = (lit(100L) + coin("ebb#") % 100).cast("double") / 5000.0
      val segs = docs(s, dir).filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("s"), (x + d).as("a"), x.as("b"))
      Evals.confSeqTestEB(segs, "s", "a", "b", alpha = 0.05,
        scale = 1.0)
    },

    // ——— STREAMING empirical-Bernstein test: the q388 ledger stream
    //     BYTE-UNCHANGED — same panel, same confSeqLedgerStream
    //     shards, same argmax-on-n readback — finished by the EB
    //     radius instead of the sub-Gaussian one. This makes the
    //     "finisher swap, stream untouched" claim hash-verified
    //     end-to-end: an already-deployed q388 ledger upgrades to
    //     the variance-adaptive guarantee with zero state migration.
    //     scale = 0.109 is now just a bound on |delta| (which it
    //     provably is), not a distributional assertion. ———
    Q("q398_streaming_eb_confseq",
      """WITH segs AS (
        |  SELECT doc_id AS s,
        |    CAST((CAST(concat('0x', substring(md5('pba#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000)
        |      + (CAST(concat('0x', substring(md5('pbb#'
        |        || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 200)
        |      - 90 AS DOUBLE) / 1000.0 AS ma,
        |    CAST(CAST(concat('0x', substring(md5('pba#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      AS DOUBLE) / 1000.0 AS mb
        |  FROM documents WHERE doc_id IS NOT NULL
        |), base AS (
        |  SELECT CAST(round(1e6 * (ma - mb)) AS BIGINT) AS qd,
        |    CAST(round(1e6 * (ma - mb) * (ma - mb)) AS BIGINT) AS qd2
        |  FROM segs
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_segs,
        |    CAST(COALESCE(SUM(qd), 0) AS BIGINT) AS sqd,
        |    CAST(COALESCE(SUM(qd2), 0) AS BIGINT) AS sqd2
        |  FROM base
        |), fin AS (
        |  SELECT n_segs,
        |    CAST(sqd AS DOUBLE) / 1e6 / n_segs AS meanraw,
        |    CAST(sqd2 AS DOUBLE) / 1e6 / n_segs
        |      - (CAST(sqd AS DOUBLE) / 1e6 / n_segs)
        |        * (CAST(sqd AS DOUBLE) / 1e6 / n_segs) AS varraw,
        |    ln(ln(CAST(2.0 AS DOUBLE) * n_segs))
        |      + CAST(0.72 AS DOUBLE)
        |        * ln(CAST(5.2 AS DOUBLE) / CAST(0.05 AS DOUBLE)) AS ell
        |  FROM agg
        |), fin2 AS (
        |  SELECT n_segs, meanraw, varraw,
        |    CAST(0.109 AS DOUBLE) * CAST(1.7 AS DOUBLE)
        |      * sqrt(ell / n_segs) AS radsg,
        |    CAST(1.7 AS DOUBLE)
        |      * sqrt(greatest(varraw, CAST(0.0 AS DOUBLE)) * ell
        |        / n_segs)
        |      + (CAST(3.4 AS DOUBLE) * CAST(0.109 AS DOUBLE)) * ell
        |        / n_segs AS radeb
        |  FROM fin
        |)
        |SELECT n_segs,
        |  CASE WHEN n_segs > 0 THEN round(meanraw, 6) END
        |    AS mean_delta,
        |  CASE WHEN n_segs > 0 THEN round(varraw, 6) END AS var_delta,
        |  CASE WHEN n_segs > 0 THEN round(radsg, 6) END AS radius_sg,
        |  CASE WHEN n_segs > 0 THEN round(radeb, 6) END AS radius_eb,
        |  CASE WHEN n_segs > 0 THEN round(meanraw - radeb, 6) END
        |    AS ci_lo,
        |  CASE WHEN n_segs > 0 THEN round(meanraw + radeb, 6) END
        |    AS ci_hi,
        |  CASE WHEN n_segs > 0 THEN
        |    CAST(CASE WHEN abs(round(meanraw, 6)) > round(radeb, 6)
        |      THEN 1 ELSE 0 END AS BIGINT) END AS reject_null
        |FROM fin2""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.ext.Streaming
      val c1 = conv(substring(md5(concat(lit("pba#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val c2 = conv(substring(md5(concat(lit("pbb#"),
        col("doc_id").cast("string"))), 1, 7), 16, 10).cast("long")
      val stream = Streaming
        .readParquetStream(s, s"$dir/documents.parquet")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id").as("task_id"),
          ((c1 % 1000 + c2 % 200 - 90).cast("double") / 1000.0)
            .as("a"),
          ((c1 % 1000).cast("double") / 1000.0).as("b"))
        .as[Streaming.PairedScore]
      val q = Streaming.runToMemory(
        Streaming.confSeqLedgerStream(stream).toDF(),
        "q398_ledger", org.apache.spark.sql.streaming.OutputMode.Update)
      q.stop()
      // last row per shard by argmax on monotone n_segs (q388 rule)
      val ledger = s.table("q398_ledger").groupBy("shard")
        .agg(max(struct(col("n_segs"), col("sqd"), col("sqd2")))
          .as("_m"))
        .select(col("_m.n_segs").as("n_segs"), col("_m.sqd").as("sqd"),
          col("_m.sqd2").as("sqd2"))
      Evals.seqTestOnCountsEB(ledger, alpha = 0.05, scale = 0.109)
    },

    // ——— media near-dup CLUSTERS: the q355 real-pixel dHash pair
    //     ledger folded into connected components + a canonical keep
    //     flag (cluster = min id, the nearDupClusters contract) with
    //     cluster sizes — the actionable "keep one per perceptual
    //     cluster" artifact a pairwise ledger is not. Oracle =
    //     recursive-CTE reachability over the SAME replayed pair
    //     graph (the q58 pattern on the q355 chain). ———
    Q("q399_media_dedup_clusters",
      """WITH RECURSIVE m AS (
        |  SELECT doc_id AS media_id, doc_id AS base, 0 AS pert,
        |    4 + doc_id % 3 AS w, 3 + doc_id % 2 AS h
        |  FROM documents WHERE doc_id < 512
        |  UNION ALL
        |  SELECT doc_id + 1000000, doc_id, 1, 4 + doc_id % 3,
        |    3 + doc_id % 2
        |  FROM documents WHERE doc_id < 512
        |), cell AS (
        |  SELECT media_id, base, pert, h, CAST(gx AS BIGINT) AS gx,
        |    CAST(gy AS BIGINT) AS gy,
        |    (gx * w) // 9 AS px, (gy * h) // 8 AS py
        |  FROM m, unnest(range(0, 9)) tx(gx), unnest(range(0, 8)) ty(gy)
        |), gray AS (
        |  SELECT media_id, gx, gy,
        |    (299 * ((base * 7 + py * 131 + px * 17) % 256)
        |     + 587 * ((base * 7 + py * 131 + px * 17 + 29) % 256)
        |     + 114 * (((base * 7 + py * 131 + px * 17 + 58) % 256
        |         + CASE WHEN pert = 1 AND px = 0 AND py = h - 1
        |             THEN 128 ELSE 0 END) % 256)) // 1000 AS gv
        |  FROM cell
        |), bit AS (
        |  SELECT a.media_id, a.gy * 8 + a.gx AS b,
        |    CASE WHEN a.gv > c.gv THEN 1 ELSE 0 END AS bit
        |  FROM gray a JOIN gray c
        |    ON c.media_id = a.media_id AND c.gy = a.gy
        |      AND c.gx = a.gx + 1
        |  WHERE a.gx <= 7
        |), sig AS (
        |  SELECT media_id, CAST(b // 16 AS BIGINT) AS band,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(b % 16 AS INTEGER)))
        |      AS BIGINT) AS v
        |  FROM bit GROUP BY 1, 2
        |), keep AS (
        |  SELECT band, v FROM sig GROUP BY band, v HAVING COUNT(*) <= 32
        |), kept AS (
        |  SELECT sig.* FROM sig JOIN keep USING (band, v)
        |), cand AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
        |  FROM kept a JOIN kept b ON a.band = b.band AND a.v = b.v
        |    AND a.media_id < b.media_id
        |), pairs AS MATERIALIZED (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c
        |  JOIN sig sa ON sa.media_id = c.id_a
        |  JOIN sig sb ON sb.media_id = c.id_b AND sb.band = sa.band
        |  GROUP BY 1, 2
        |  HAVING CAST(SUM(bit_count(xor(sa.v, sb.v))) AS BIGINT) <= 6
        |), edges AS MATERIALIZED (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |), clusters AS MATERIALIZED (
        |  SELECT id, CAST(least(id, min(dst)) AS BIGINT) AS cluster
        |  FROM (SELECT src AS id, dst FROM reach) GROUP BY id
        |)
        |SELECT c.id, c.cluster, CAST(cnt.n AS BIGINT) AS cluster_size,
        |  CAST(CASE WHEN c.id = c.cluster THEN 1 ELSE 0 END AS BIGINT)
        |    AS keep
        |FROM clusters c
        |JOIN (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM clusters GROUP BY 1) cnt USING (cluster)
        |ORDER BY id""".stripMargin) { (s, dir) =>
      import graft.ext.{Dedup, Multimodal}
      import graft.engine.TrackedCache.Trackable
      // NOT spread (q354 rule deliberately skipped): measured neutral
      // at this 512-row roster — the per-task overhead of 32-way
      // spread cancels the parallel decode gain (q355 3.66 → 3.87 s)
      val base = docs(s, dir).filter(col("doc_id") < 512)
      val orig = Multimodal.syntheticBmp(base).trackedLocalCheckpoint()
      val twin = Multimodal.perturbBmpPixelByte(orig, lit(0L),
        col("media_id") + 1000000L)
      // localCheckpoint the pair ledger: its lineage is the whole
      // decode+LSH chain and the CC loop caches per iteration (the
      // q58 GC lesson)
      val pairs = Multimodal.dHashNearDupFromSigs(
        Multimodal.bmpDHashSignatures(
          orig.unionByName(twin).trackedLocalCheckpoint()),
        maxHamming = 6, maxBucket = 32)
        .select("id_a", "id_b")
        .trackedLocalCheckpoint()
      val clusters = Dedup.nearDupClusters(pairs)
        .select(col("id"), col("cluster").cast("long").as("cluster"))
      val sizes = clusters.groupBy("cluster")
        .agg(count(lit(1)).as("cluster_size"))
      clusters.join(sizes, Seq("cluster"))
        .select(col("id"), col("cluster"), col("cluster_size"),
          (col("id") === col("cluster")).cast("long").as("keep"))
        .orderBy("id")
    }
  )

  /** The q364/q366 synthetic annotation panel: 5 annotators per
    * document, annotators 0–3 ≈80% accurate and annotator 4 ≈40%
    * (md5 coin, engine-mirrorable), true-ish label = doc_id % 3. */
  private def dsLabFrame(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"),
      explode(sequence(lit(0L), lit(4L))).as("a"))
    val coin = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":"), col("a").cast("string"), lit(":ds14"))), 1, 7), 16, 10)
      .cast("long")
    val wrong = (coin % 10) < when(col("a") < 4L, 2L).otherwise(6L)
    base.select(col("doc_id").as("item_id"),
      col("a").as("annotator_id"),
      when(wrong, (col("doc_id") % 3 + 1 + coin % 2) % 3)
        .otherwise(col("doc_id") % 3).as("label"))
  }

  /** Shared oracle prefix for q364/q366: the synthetic `lab` panel
    * plus the min-label-tie majority chain ending in
    * `maj(item_id, maj)`. */
  private def dsLabMajSql: String =
    """WITH lab AS (
      |  SELECT d.doc_id AS item_id, CAST(a.a AS BIGINT) AS annotator_id,
      |    CASE WHEN (CAST(concat('0x', substring(md5(concat(
      |        CAST(d.doc_id AS VARCHAR), ':', CAST(a.a AS VARCHAR),
      |        ':ds14')), 1, 7)) AS BIGINT) % 10) <
      |        (CASE WHEN a.a < 4 THEN 2 ELSE 6 END)
      |      THEN (d.doc_id % 3 + 1 + (CAST(concat('0x', substring(
      |        md5(concat(CAST(d.doc_id AS VARCHAR), ':',
      |        CAST(a.a AS VARCHAR), ':ds14')), 1, 7)) AS BIGINT) % 2))
      |        % 3
      |      ELSE d.doc_id % 3 END AS label
      |  FROM documents d, unnest(range(0, 5)) a(a)
      |), cnt AS (
      |  SELECT item_id, label, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM lab GROUP BY 1, 2
      |), mx AS (
      |  SELECT item_id, MAX(c) AS mx FROM cnt GROUP BY 1
      |), maj AS (
      |  SELECT cnt.item_id, MIN(label) AS maj
      |  FROM cnt JOIN mx ON mx.item_id = cnt.item_id AND cnt.c = mx.mx
      |  GROUP BY 1
      |)""".stripMargin

  /** The q344/q348 oracle: pass@k on the batch (task, n, c) ledger —
    * also the answer the q348 STREAMING ingestion must land on (its
    * counters are monotone sums, so the final streamed ledger equals
    * the batch aggregate by construction). */
  private def passAtKOracleSql: String = {
    // overflow-stable left-fold of per-term double ratios, mirroring
    // Evals.passAtKOnCounts factor-for-factor (same order ⇒ identical
    // IEEE result); the integer factorial products would wrap BIGINT
    // at k=8 once n_samples ≳ 236
    val passes = Seq(1, 2, 4, 8).map { k =>
      val prod = (0 until k)
        .map(i => s"(CAST(GREATEST(n_samples - n_correct - $i, 0) " +
          s"AS DOUBLE) / CAST(n_samples - $i AS DOUBLE))")
        .mkString(" * ")
      s"""CASE WHEN n_samples >= $k THEN
         |    round(1 - $prod, 6)
         |  END AS pass_at_$k""".stripMargin
    }.mkString(",\n  ")
    s"""WITH s AS (
       |  SELECT doc_id, doc_id // 16 AS task_id,
       |    (CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
       |      ':pass13')), 1, 7)) AS BIGINT) % 100)
       |      < 20 + (doc_id // 16) % 60 AS correct
       |  FROM documents
       |), g AS (
       |  SELECT task_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
       |    CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_correct
       |  FROM s GROUP BY 1
       |)
       |SELECT task_id, n_samples, n_correct,
       |  $passes
       |FROM g ORDER BY task_id""".stripMargin
  }

  /** The q338 roster + vote construction (q336's synthetic preference
    * corpus): prompts = doc_id/8 rosters, longer response wins, 20%
    * md5-coin flips. */
  private def q338RosterSql: String =
    """SELECT CAST(doc_id // 8 AS BIGINT) AS prompt_id, doc_id AS rid,
      |    n_chars FROM documents""".stripMargin
  private def q338VotesSql: String =
    """SELECT prompt_id,
      |    CASE WHEN a_wins THEN id_a ELSE id_b END AS winner,
      |    CASE WHEN a_wins THEN id_b ELSE id_a END AS loser
      |  FROM (
      |    SELECT a.prompt_id, a.rid AS id_a, b.rid AS id_b,
      |      ((a.n_chars >= b.n_chars) <>
      |       (CAST(concat('0x', substring(md5(concat(CAST(a.rid AS VARCHAR),
      |          ':', CAST(b.rid AS VARCHAR), ':pref12')), 1, 7)) AS BIGINT)
      |          % 5 = 0)) AS a_wins
      |    FROM r a JOIN r b
      |      ON a.prompt_id = b.prompt_id AND a.rid < b.rid
      |  )""".stripMargin

  /** Unrolled Bradley–Terry MM chain shared by the q338/q341/q342
    * oracles, replaying [[graft.ext.Preference.bradleyTerry]]
    * bit-exactly (integer micro-unit strengths, per-term rounding
    * before integer sums, Σπ = k renormalization): given CTE bodies
    * for the roster `r` (prompt_id, rid, extra vote-input columns
    * allowed) and the votes `v` (prompt_id, winner, loser; may
    * reference `r`), returns the WITH prefix ending at the fitted
    * strengths `p<iterations>`(prompt_id, rid, p) and the stats table
    * `st`(prompt_id, rid, k, wins, n_games, a) — append a final
    * SELECT (and nothing else) to it.
    */
  private def btChainSql(iterations: Int, rosterSql: String,
                         votesSql: String): String = {
    // Every iteration references the previous strength CTE TWICE
    // (π_i and π_j joins); an inlining planner therefore expands the
    // chain 2^iterations-fold — DuckDB ran out of file descriptors
    // re-opening documents.parquet before it ran out of time. The
    // MATERIALIZED hint (PostgreSQL 12 syntax, honored by DuckDB)
    // pins each CTE to one evaluation — the SQL twin of the
    // trackedLocalCheckpoint lineage cut on the Spark side.
    def mat(sql: String): String = sql.replace(" AS (", " AS MATERIALIZED (")
    val iter = (1 to iterations).map { t =>
      s"""t$t AS (
         |  SELECT pr.prompt_id, pr.i, pr.j,
         |    CAST(round(1e12 * pr.m / (pi.p + pj.p)) AS BIGINT) AS tm
         |  FROM pr
         |  JOIN p${t - 1} pi ON pi.prompt_id = pr.prompt_id AND pi.rid = pr.i
         |  JOIN p${t - 1} pj ON pj.prompt_id = pr.prompt_id AND pj.rid = pr.j
         |), d$t AS (
         |  SELECT prompt_id, rid, CAST(SUM(tm) AS BIGINT) AS d FROM (
         |    SELECT prompt_id, i AS rid, tm FROM t$t
         |    UNION ALL SELECT prompt_id, j AS rid, tm FROM t$t
         |  ) GROUP BY 1, 2
         |), raw$t AS (
         |  SELECT st.prompt_id, st.rid, st.k,
         |    COALESCE(CAST(round(CAST(st.a AS DOUBLE) * 1e12 / d.d)
         |      AS BIGINT), 1000000) AS praw
         |  FROM st LEFT JOIN d$t d
         |    ON d.prompt_id = st.prompt_id AND d.rid = st.rid
         |), s$t AS (
         |  SELECT prompt_id, CAST(SUM(praw) AS BIGINT) AS s
         |  FROM raw$t GROUP BY 1
         |), p$t AS (
         |  SELECT r.prompt_id, r.rid,
         |    CAST(round(CAST(r.praw AS DOUBLE) * r.k * 1000000 / s.s)
         |      AS BIGINT) AS p
         |  FROM raw$t r JOIN s$t s ON s.prompt_id = r.prompt_id
         |)""".stripMargin
    }.mkString(", ")
    mat(s"""WITH r AS (
       |  $rosterSql
       |), v0 AS (
       |  $votesSql
       |), v AS (
       |  -- mirror of bradleyTerry's roster semi-join: votes naming an
       |  -- out-of-roster winner or loser never reach the counters
       |  SELECT v0.prompt_id, v0.winner, v0.loser FROM v0
       |  WHERE EXISTS (SELECT 1 FROM r
       |      WHERE r.prompt_id = v0.prompt_id AND r.rid = v0.winner)
       |    AND EXISTS (SELECT 1 FROM r
       |      WHERE r.prompt_id = v0.prompt_id AND r.rid = v0.loser)
       |), k AS (
       |  SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS k FROM r GROUP BY 1
       |), vp AS (
       |  SELECT prompt_id, least(winner, loser) AS i,
       |    greatest(winner, loser) AS j, CAST(COUNT(*) AS BIGINT) AS nv
       |  FROM v GROUP BY 1, 2, 3
       |), pr AS (
       |  SELECT ap.prompt_id, ap.i, ap.j, COALESCE(vp.nv, 0) * 2 + 2 AS m
       |  FROM (
       |    SELECT a.prompt_id, a.rid AS i, b.rid AS j
       |    FROM r a JOIN r b
       |      ON a.prompt_id = b.prompt_id AND a.rid < b.rid
       |  ) ap LEFT JOIN vp ON vp.prompt_id = ap.prompt_id
       |    AND vp.i = ap.i AND vp.j = ap.j
       |), wc AS (
       |  SELECT prompt_id, winner AS rid, CAST(COUNT(*) AS BIGINT) AS w
       |  FROM v GROUP BY 1, 2
       |), gc AS (
       |  SELECT prompt_id, rid, CAST(COUNT(*) AS BIGINT) AS g FROM (
       |    SELECT prompt_id, winner AS rid FROM v
       |    UNION ALL SELECT prompt_id, loser FROM v
       |  ) GROUP BY 1, 2
       |), st AS (
       |  SELECT r.prompt_id, r.rid, k.k,
       |    COALESCE(wc.w, 0) AS wins, COALESCE(gc.g, 0) AS n_games,
       |    COALESCE(wc.w, 0) * 2 + k.k - 1 AS a
       |  FROM r
       |  JOIN k USING (prompt_id)
       |  LEFT JOIN wc ON wc.prompt_id = r.prompt_id AND wc.rid = r.rid
       |  LEFT JOIN gc ON gc.prompt_id = r.prompt_id AND gc.rid = r.rid
       |), p0 AS (
       |  SELECT prompt_id, rid, CAST(1000000 AS BIGINT) AS p FROM st
       |), $iter""".stripMargin)
  }

  /** Shared q384/q385 oracle: IPS / SNIPS / ESS on the logged-bandit
    * synth — the streaming ledger twin must converge to the batch
    * estimates exactly. */
  private def ipsOracleSql: String =
    """WITH l AS (
        |  SELECT doc_id AS t,
        |    CAST(CAST(concat('0x', substring(md5('ipb#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 900
        |      + 100 AS DOUBLE) / 1000.0 AS pb,
        |    CAST(CAST(concat('0x', substring(md5('ipt#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
        |      + 1 AS DOUBLE) / 1000.0 AS pt,
        |    CAST(CAST(concat('0x', substring(md5('ipr#'
        |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100
        |      AS DOUBLE) / 100.0 AS r
        |  FROM documents WHERE doc_id IS NOT NULL
        |), q AS (
        |  SELECT CAST(round(1e6 * (pt / pb)) AS BIGINT) AS qw,
        |    CAST(round(1e6 * (pt / pb) * r) AS BIGINT) AS qwr,
        |    CAST(round(1e6 * (pt / pb) * (pt / pb)) AS BIGINT) AS qw2
        |  FROM l WHERE pb > 0
        |), tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS alln FROM l
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(COALESCE(SUM(qw), 0) AS BIGINT) AS sw,
        |    CAST(COALESCE(SUM(qwr), 0) AS BIGINT) AS swr,
        |    CAST(COALESCE(SUM(qw2), 0) AS BIGINT) AS sw2
        |  FROM q
        |)
        |SELECT n_samples, alln - n_samples AS n_dropped,
        |  CASE WHEN n_samples > 0 THEN
        |    round(CAST(swr AS DOUBLE) / 1e6 / n_samples, 6) END AS ips,
        |  CASE WHEN sw > 0 THEN
        |    round(CAST(swr AS DOUBLE) / sw, 6) END AS snips,
        |  CASE WHEN sw2 > 0 THEN
        |    round(CAST(CAST(sw AS HUGEINT) * sw AS DOUBLE)
        |      / (1e6 * CAST(sw2 AS DOUBLE)), 6) END AS ess
        |FROM agg CROSS JOIN tot""".stripMargin

  /** Shared q376/q380 oracle: McNemar on the planted 70%-vs-60%
    * paired-outcome panel — the streaming ledger twin must converge
    * to the identical batch statistic. */
  private def mcnemarOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    (CAST(concat('0x', substring(md5('mna#'
      |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100)
      |      < 70 AS a,
      |    (CAST(concat('0x', substring(md5('mnb#'
      |      || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100)
      |      < 60 AS b
      |  FROM documents WHERE doc_id IS NOT NULL
      |), agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_concordant,
      |    CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b_a_only,
      |    CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b_b_only
      |  FROM p
      |)
      |SELECT n_pairs, n_concordant, b_a_only, b_b_only,
      |  CASE WHEN b_a_only + b_b_only > 0 THEN
      |    round(CAST((b_a_only - b_b_only) * (b_a_only - b_b_only)
      |      AS DOUBLE) / (b_a_only + b_b_only), 6) END AS chi2,
      |  CASE WHEN b_a_only + b_b_only > 0 THEN
      |    round(CAST(GREATEST(ABS(b_a_only - b_b_only) - 1, 0)
      |      * GREATEST(ABS(b_a_only - b_b_only) - 1, 0) AS DOUBLE)
      |      / (b_a_only + b_b_only), 6) END AS chi2_cc
      |FROM agg""".stripMargin

  /** The q338 oracle: the shared MM chain on q336's corpus, reporting
    * per-response strengths and ranks. */
  private def btOracleSql(iterations: Int): String =
    btChainSql(iterations, q338RosterSql, q338VotesSql) +
      s"""
       |SELECT st.prompt_id, st.rid, st.wins, st.n_games,
       |  round(CAST(pf.p AS DOUBLE) / 1000000, 6) AS strength,
       |  CAST(row_number() OVER (PARTITION BY st.prompt_id
       |    ORDER BY pf.p DESC, st.rid) AS BIGINT) AS bt_rank
       |FROM st JOIN p$iterations pf
       |  ON pf.prompt_id = st.prompt_id AND pf.rid = st.rid
       |ORDER BY st.prompt_id, st.rid""".stripMargin
}
