package graft.functions

/** Misra-Gries frequent-items sketch (Misra & Gries 1982) — the
  * per-partition candidate generator behind `agg_heavy_hitters`.
  *
  * Guarantee: with `k` counters over a stream of length m, every
  * decrement round removes k+1 occurrence tokens (the k counters plus
  * the arriving item), so an item's counter is undercounted by at most
  * m/(k+1) — any item with true count > m/(k+1) (in particular, with
  * share > 1/k) still holds a positive counter at stream end.
  * PureProps checks this on adversarial random streams.
  */
object MisraGries {

  /** Surviving counters after one pass; keys are the candidate set. */
  def sketch[T](it: Iterator[T], k: Int): collection.Map[T, Long] = {
    require(k >= 2, s"misra-gries needs k >= 2 counters, got $k")
    val counts = scala.collection.mutable.HashMap.empty[T, Long]
    it.foreach { w =>
      counts.get(w) match {
        case Some(c) => counts(w) = c + 1
        case None if counts.size < k => counts(w) = 1L
        case None =>
          val dead = List.newBuilder[T]
          counts.foreach { case (cw, c) =>
            if (c == 1L) dead += cw else counts(cw) = c - 1
          }
          dead.result().foreach(counts.remove)
      }
    }
    counts
  }

  def candidates[T](it: Iterator[T], k: Int): Iterator[T] =
    sketch(it, k).keysIterator
}
