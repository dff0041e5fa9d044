package graft.streaming

import org.scalacheck.{Gen, Prop, Properties}

/** Property checks for the pure Misra–Gries fold behind st18
  * ([[StreamHeavyHitters.mgFold]]): on ANY token stream, split into
  * ANY sequence of micro-batch chunks (the incremental-maintenance
  * regime the streaming gate replays), the final summary must satisfy
  * the two textbook MG guarantees the st18 oracle RELIES on:
  *
  *  1. candidates ⊇ heavy tokens — every token with true count >
  *     seen/k survives in the summary (this is what makes the exact
  *     recount over the candidate set provably complete);
  *  2. every surviving counter is a valid lower bound:
  *     true − seen/k ≤ counter ≤ true.
  *
  * Pure JVM — no Spark session; thousands-of-cases cheap. Small k and
  * a small token alphabet force constant decrement-all churn, the
  * regime where an off-by-one in the decrement loop breaks guarantee
  * (1) silently. */
object MgProps extends Properties("misra-gries") {

  private val streamGen: Gen[(List[List[String]], Int)] = for {
    k <- Gen.chooseNum(2, 8)
    n <- Gen.chooseNum(0, 400)
    toks <- Gen.listOfN(n, Gen.chooseNum(0, 20).map(i => s"t$i"))
    // arbitrary chunking: a random cut-set over the stream
    cuts <- Gen.listOf(Gen.chooseNum(0, math.max(0, n)))
  } yield {
    val sorted = (0 +: cuts :+ n).distinct.sorted
    val chunks = sorted.zip(sorted.tail).map { case (a, b) =>
      toks.slice(a, b)
    }
    (chunks, k)
  }

  property("final summary contains every > seen/k token and only " +
    "valid lower-bound counters, under any chunking") =
    Prop.forAll(streamGen) { case (chunks, k) =>
      val fin = chunks.foldLeft(Option.empty[StreamHeavyHitters.MgState]) {
        (st, chunk) =>
          Some(StreamHeavyHitters.mgFold(st, chunk.iterator, k))
      }.getOrElse(StreamHeavyHitters.MgState(Nil, Nil, 0L))
      val all = chunks.flatten
      val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val seen = all.size.toLong
      val summary = fin.tokens.zip(fin.counts).toMap
      val sizeOk = fin.seen == seen && summary.size <= k
      val heavyOk = truth.forall { case (t, c) =>
        c * k <= seen || summary.contains(t)
      }
      val boundsOk = summary.forall { case (t, lb) =>
        val c = truth.getOrElse(t, 0L)
        lb >= 1 && lb <= c && (c - lb) * k <= seen
      }
      sizeOk && heavyOk && boundsOk
    }
}
