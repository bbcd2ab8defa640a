package graft.ext

/** Plain-Scala reference BPE (Sennrich et al. 2016) shared by BpeSpec
  * and CorpusProps: argmax pair by (count desc, p1 asc, p2 asc),
  * greedy left-to-right application — the ground truth the
  * distributed trainer must reproduce exactly.
  */
object BpeReference {

  def train(words: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] =
      words.filter(_._1.nonEmpty).map { case (w, c) => w.map(_.toString) -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (p1, p2) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((p1, p2))
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (out.nonEmpty && out.last == p1 && x == p2) {
              out.remove(out.length - 1); out += (p1 + p2)
            } else out += x
          }
          out.toSeq -> c
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
    }
    merges.toSeq
  }
}
