package graft.ext

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Pure-function properties for the shared session merge core
  * (`Streaming.insertIntoSessions`) — the law that makes the
  * streaming sessionizer correct under ANY arrival order: folding
  * events through the insert core must yield exactly the sessions of
  * a sorted linear scan, for every permutation. (The Spark-level
  * batch/stream equivalence rides on this plus watermark sealing,
  * law-tested in StreamingSpec.)
  */
object SessionProps extends Properties("sessions") {

  private val gap = 7L

  // clustered timestamps (small range) so merges and bridges actually
  // happen; cents arbitrary
  private val events: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 120L), Gen.choose(0L, 999L)))

  /** Reference: gaps-and-islands over the sorted sequence (new session
    * when ts - prev >= gap — q23 semantics).
    */
  private def sortedScan(evts: List[(Long, Long)]): List[Streaming.Sess] =
    evts.sortBy(_._1).foldLeft(List.empty[Streaming.Sess]) {
      case (acc, (ts, cents)) =>
        acc.lastOption match {
          case Some(s) if ts - s.lastMicros < gap =>
            acc.init :+ Streaming.Sess(s.startMicros, ts, s.n + 1, s.cents + cents)
          case _ => acc :+ Streaming.Sess(ts, ts, 1, cents)
        }
    }

  private def foldInserts(evts: List[(Long, Long)]): List[Streaming.Sess] =
    evts.foldLeft(List.empty[Streaming.Sess]) { case (acc, (ts, cents)) =>
      Streaming.insertIntoSessions(acc, ts, cents, gap)
    }

  property("any insertion order equals the sorted scan") =
    forAll(events, Gen.long) { (evts, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(evts)
      foldInserts(shuffled) == sortedScan(evts)
    }

  property("conservation: counts and cents survive the fold") =
    forAll(events) { evts =>
      val out = foldInserts(evts)
      out.map(_.n).sum == evts.length.toLong &&
        out.map(_.cents).sum == evts.map(_._2).sum
    }

  property("sessions are ordered, disjoint, and gap-separated") =
    forAll(events) { evts =>
      val out = foldInserts(evts)
      out.forall(s => s.startMicros <= s.lastMicros) &&
        out.sliding(2).forall {
          case List(a, b) => b.startMicros - a.lastMicros >= gap
          case _ => true
        }
    }
}
