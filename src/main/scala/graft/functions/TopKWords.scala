package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Approximate heavy-hitter (top-k word) aggregation as a typed
  * `Aggregator` — the mergeable-summary alternative to the full
  * `groupBy(word).count()` shuffle of A14 (`content_analysis.py:75-102`).
  *
  * Algorithm: Misra–Gries with `capacity` counters. Each partition folds
  * its tokens into a bounded map (miss on a full map decrements every
  * counter — the classic frequent-items step); partial summaries merge by
  * summed counts followed by a rank-(capacity+1) subtraction, which keeps
  * the standard guarantee: every reported count is an undercount by at
  * most n/(capacity+1), and any word with true frequency above that bound
  * survives.
  *
  * Scale shape: this is ONE pass with fixed memory per partition and a
  * single tiny merged summary at the driver — no (word) shuffle at all,
  * versus the exact groupBy whose shuffle is proportional to the
  * vocabulary. With `capacity` ≥ the distinct-word count the summary is
  * exact (no decrement ever fires), which is what makes the query entry
  * oracle-checkable against plain SQL top-k.
  *
  * Runs under `ObjectHashAggregateExec`: the buffer stays a JVM object
  * within a partition, serialized only for the final partial-merge
  * exchange.
  */
object TopKWords {

  /** Bounded counter state. `n` tracks tokens folded in (for the error
    * bound); counts hold the surviving counters.
    */
  case class MGBuffer(counts: Map[String, Long], n: Long)

  case class TopWord(word: String, cnt: Long)

  class TopKWordsAgg(k: Int, capacity: Int)
      extends Aggregator[String, MGBuffer, Seq[TopWord]] {

    override def zero: MGBuffer = MGBuffer(Map.empty, 0L)

    override def reduce(b: MGBuffer, w: String): MGBuffer = {
      val c = b.counts
      if (c.contains(w)) MGBuffer(c.updated(w, c(w) + 1L), b.n + 1)
      else if (c.size < capacity) MGBuffer(c.updated(w, 1L), b.n + 1)
      else {
        // decrement-all step: drop zeroed counters, new word absorbed
        val dec = c.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
        MGBuffer(dec, b.n + 1)
      }
    }

    override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
      val summed = b.counts.foldLeft(a.counts) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      val trimmed =
        if (summed.size <= capacity) summed
        else {
          // subtract the (capacity+1)-th largest count, drop non-positives
          val d = summed.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
          summed.view.mapValues(_ - d).filter(_._2 > 0L).toMap
        }
      MGBuffer(trimmed, a.n + b.n)
    }

    override def finish(b: MGBuffer): Seq[TopWord] =
      b.counts.toSeq
        .sortBy { case (w, c) => (-c, w) }
        .take(k)
        .map { case (w, c) => TopWord(w, c) }

    override def bufferEncoder: Encoder[MGBuffer] = ExpressionEncoder[MGBuffer]()
    override def outputEncoder: Encoder[Seq[TopWord]] = ExpressionEncoder[Seq[TopWord]]()
  }

  /** Column form: `top_k_words(word)` over a string column. */
  def topKWords(word: Column, k: Int, capacity: Int): Column =
    udaf(new TopKWordsAgg(k, capacity)).apply(word)
}
