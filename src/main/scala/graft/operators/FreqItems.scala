package graft.operators

import scala.collection.mutable

/** Misra-Gries frequent-items summary — the per-partition phase of the
  * exact two-phase heavy-hitters operator (q73_heavy_hitters).
  *
  * Guarantee (the reason the two-phase composition is EXACT, not
  * approximate): over a stream of n items with k counters, each
  * decrement round removes k+1 occurrences (k survivors + the arriving
  * item), so at most n/(k+1) rounds happen and any item with true count
  * > n/(k+1) still holds a positive counter at the end. Summaries from
  * disjoint partitions therefore jointly retain every item whose GLOBAL
  * count exceeds N/(k+1) (it must exceed the local threshold in at least
  * one partition); an exact recount of the surviving candidates then
  * removes all false positives. PropertySpec checks the retention bound
  * on random streams. */
object FreqItems {

  /** Candidate keys of the Misra-Gries summary of `it` with `k` counters. */
  def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { tok =>
      counters.get(tok) match {
        case Some(c) => counters(tok) = c + 1
        case None if counters.size < k => counters(tok) = 1L
        case None => // full: decrement-all round (the new item implicitly too)
          val dead = List.newBuilder[String]
          counters.foreach { case (key, c) =>
            if (c == 1L) dead += key else counters(key) = c - 1
          }
          dead.result().foreach(counters.remove)
      }
    }
    counters.keysIterator
  }
}
