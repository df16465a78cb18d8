package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (bottom-k distinct) sketch as a typed `Aggregator` — the
  * shuffle-free, streaming-ready form of
  * [[graft.operators.Sketches.kmvShingleDistinct]] (x56). The batch
  * operator derives the bottom-k with a per-group window over the distinct
  * hash set; this one folds each partition into a bounded sorted buffer
  * and merges buffers pairwise — the mergeability KMV is chosen FOR (the
  * union's sketch is the k smallest of the union), which is exactly what
  * lets it run under Structured Streaming's partial/merge aggregation with
  * fixed memory and no distinct-hash shuffle.
  *
  * Estimator and rounding are byte-identical to x56: exact `size` when the
  * buffer never filled, else (k−1)/(h₍k₎/2^60) rounded 4 dp HALF_UP — so a
  * streamed replay hash-matches the batch oracle.
  *
  * Like [[TopKWords]], runs under `ObjectHashAggregateExec`: the buffer is
  * a JVM object within a partition, serialized only for the merge exchange.
  */
object KmvSketch {

  /** Sorted ascending, distinct, at most k entries. */
  case class KmvBuffer(ks: Vector[Long])

  case class KmvResult(n_kept: Long, est_distinct: Double)

  class KmvAgg(k: Int) extends Aggregator[Long, KmvBuffer, KmvResult] {

    override def zero: KmvBuffer = KmvBuffer(Vector.empty)

    override def reduce(b: KmvBuffer, h: Long): KmvBuffer = {
      val ks = b.ks
      if (ks.length == k && h >= ks.last) b
      else {
        val i = insertionPoint(ks, h)
        if (i < ks.length && ks(i) == h) b // already present
        else {
          val grown = (ks.take(i) :+ h) ++ ks.drop(i)
          KmvBuffer(if (grown.length > k) grown.dropRight(1) else grown)
        }
      }
    }

    override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
      if (a.ks.isEmpty) b
      else if (b.ks.isEmpty) a
      else KmvBuffer((a.ks ++ b.ks).distinct.sorted.take(k))

    override def finish(b: KmvBuffer): KmvResult = {
      val n = b.ks.length
      val est =
        if (n < k) n.toDouble
        else (k - 1).toDouble / (b.ks.last.toDouble / 1.152921504606846976e18)
      KmvResult(n.toLong,
        BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

    private def insertionPoint(ks: Vector[Long], h: Long): Int = {
      var lo = 0; var hi = ks.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ks(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }

    override def bufferEncoder: Encoder[KmvBuffer] = ExpressionEncoder[KmvBuffer]()
    override def outputEncoder: Encoder[KmvResult] = ExpressionEncoder[KmvResult]()
  }

  /** Column form: `kmv(h60, k)` over a long hash column; returns a
    * `(n_kept, est_distinct)` struct.
    */
  def kmv(h: Column, k: Int): Column = udaf(new KmvAgg(k)).apply(h)
}
