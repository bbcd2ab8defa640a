package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training.
  *
  * The classic algorithm (Sennrich et al. 2016, public): start from
  * characters, repeatedly merge the most frequent adjacent symbol
  * pair. The distributed formulation keeps ALL state in a
  * VOCABULARY-sized table (word, wc, syms) — the corpus is read once
  * to count words, and every subsequent round is map + aggregate over
  * the vocabulary, so training cost is independent of corpus size
  * beyond the initial count (the scale property that makes BPE
  * trainable on 100 TB: a trillion tokens still yield a few million
  * distinct words). Only the single argmax row crosses to the driver
  * per round (the "key roster" exception to no-collect).
  *
  * One pair-count round is oracle-verified as q96
  * (`TextStats.bpePairCounts` computes the same statistic from raw
  * docs); the iterative trainer is pinned against a plain-Scala
  * reference implementation in BpeSpec.
  */
object Bpe {

  /** (word, wc, syms): every distinct word with its corpus frequency
    * and its current symbol sequence (initially characters).
    */
  def initVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextStats.tokens(col(textCol))).as("w"))
      // leading/trailing whitespace tokenizes to empty words; drop them
      // BEFORE charring — sequence(1, 0) runs DESCENDING in Spark, so an
      // unguarded empty word would char-split to ["", ""] and feed a
      // bogus ("", "") pair into every merge round
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))

  /** Adjacent-pair frequencies over the vocabulary, weighted by word
    * frequency — the per-round merge statistic. Map-only explode over
    * vocab rows + one vocabulary-sized aggregate.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS p1, syms[i + 1] AS p2))"))
        .as("_p"))
      .select(col("wc"), col("_p.p1").as("p1"), col("_p.p2").as("p2"))
      .groupBy("p1", "p2").agg(sum(col("wc")).as("total"))

  /** Left-to-right greedy merge of every adjacent (p1, p2) occurrence
    * in `syms` — the standard BPE application order ("aaa" under
    * (a,a) → [aa, a], and the freshly merged symbol does not re-pair
    * within the same round). A lazy CASE guards the empty-accumulator
    * probe, so the fold is ANSI-safe.
    */
  private[ext] def mergeColumn(p1: String, p2: String): Column =
    aggregate(col("syms"),
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .otherwise(when(
            element_at(acc, -1) === lit(p1) && x === lit(p2),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(p1 + p2))))
            .otherwise(concat(acc, array(x)))))

  /** Train `nMerges` merge rules. Deterministic: the argmax breaks
    * ties (total desc, p1, p2). Each round localCheckpoints the
    * vocabulary so plan depth stays constant across rounds (same
    * discipline as Dedup.nearDupClusters' label loop). Stops early
    * when no pair remains (every word fully merged).
    */
  def train(docs: DataFrame, nMerges: Int,
            textCol: String = "text"): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0: $nMerges")
    var vocab = initVocab(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var i = 0
    while (i < nMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("total").desc, col("p1"), col("p2"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (p1, p2) = (top(0).getAs[String]("p1"), top(0).getAs[String]("p2"))
        merges += ((p1, p2))
        val next = vocab.withColumn("syms", mergeColumn(p1, p2)).localCheckpoint()
        org.apache.spark.sql.GraftBridge.leafRdds(vocab)
          .foreach(_.unpersist(blocking = false))
        vocab = next
      }
      i += 1
    }
    org.apache.spark.sql.GraftBridge.leafRdds(vocab)
      .foreach(_.unpersist(blocking = false))
    merges.toSeq
  }

  /** Apply trained merges to a vocabulary table: iterate the merge
    * fold per rule. Plan depth is bounded by checkpointing every
    * `ckptEvery` merges (each rule nests one HOF aggregate; unbounded
    * nesting blows analysis cost — same discipline as the trainer's
    * per-round checkpoint). Vocabulary-sized work throughout.
    */
  def segmentVocab(vocab: DataFrame, merges: Seq[(String, String)],
                   ckptEvery: Int = 8): DataFrame = {
    var v = vocab
    // release superseded checkpoints as we advance (Dataset.unpersist
    // is a no-op on checkpointed frames — same discipline as train and
    // nearDupClusters); the FINAL checkpoint must survive because the
    // returned frame roots at it
    var prevCkpt: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    merges.zipWithIndex.foreach { case ((p1, p2), i) =>
      v = v.withColumn("syms", mergeColumn(p1, p2))
      if ((i + 1) % ckptEvery == 0) {
        v = v.localCheckpoint()
        prevCkpt.foreach(_.unpersist(blocking = false))
        prevCkpt = org.apache.spark.sql.GraftBridge.leafRdds(v)
      }
    }
    // the returned frame roots at the FINAL checkpoint — hand its
    // blocks to the TrackedCache RDD ledger so the harness's
    // release() frees them after the caller materializes
    graft.engine.TrackedCache.adoptRdds(prevCkpt)
    v.select(col("w"), col("syms"))
  }

  /** Tokenize a corpus with trained merges — BPE inference at corpus
    * scale. The corpus explodes to (doc, word-position, word) once;
    * segmentation happens on the VOCABULARY (each distinct word
    * segmented exactly once, however often it occurs), and one join
    * on the word key fans the subwords back out. Unseen-corpus words
    * segment fine (characters + whatever merges apply). Returns one
    * row per subword: (idCol, pos, spos, subword) — fully
    * deterministic ordering keys.
    */
  def tokenizeBpe(docs: DataFrame, merges: Seq[(String, String)],
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val vocabSeg = segmentVocab(initVocab(docs, textCol), merges)
    docs
      .select(col(idCol),
        posexplode(TextStats.tokens(col(textCol))).as(Seq("pos", "w")))
      .join(vocabSeg, "w")
      .select(col(idCol), col("pos"),
        posexplode(col("syms")).as(Seq("spos", "subword")))
  }

  /** Segment one word with trained merges (driver-side reference
    * application — inference over a corpus would broadcast the merge
    * list and apply the same fold as a column).
    */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    merges.foreach { case (p1, p2) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == p1 && x == p2) {
          out.remove(out.length - 1); out += (p1 + p2)
        } else out += x
      }
      syms = out.toSeq
    }
    syms
  }
}
