package graft.mr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface — the algebraic fast path for
  * the reference's reduce contract (SURVEY §7.4): mergeable buffers give
  * Spark map-side partial aggregation + spillable hash agg, which the
  * generic `flatMapGroups` contract cannot.
  */
object Aggregators {

  /** Mean with an explicit mergeable buffer (sum, count). */
  final case class AvgBuf(var sum: Double, var n: Long)
  class AvgAggregator extends Aggregator[Double, AvgBuf, Double] {
    def zero: AvgBuf = AvgBuf(0.0, 0L)
    def reduce(b: AvgBuf, v: Double): AvgBuf = { b.sum += v; b.n += 1; b }
    def merge(a: AvgBuf, b: AvgBuf): AvgBuf = { a.sum += b.sum; a.n += b.n; a }
    def finish(b: AvgBuf): Double = if (b.n == 0) Double.NaN else b.sum / b.n
    def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k (largest values) with a mergeable buffer — the
    * constant-memory per-group alternative to collect_list + sort at
    * scale.
    */
  class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
    def zero: Seq[Double] = Vector.empty
    def reduce(b: Seq[Double], v: Double): Seq[Double] = insert(b, v)
    def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = b.foldLeft(a)(insert)
    def finish(b: Seq[Double]): Seq[Double] = b
    // Buffer invariant: sorted descending, size ≤ k. A full buffer whose
    // minimum already beats v is untouched (the common case on skewed
    // streams); otherwise binary-search the insertion point — O(log k)
    // compares + one O(k) copy, vs the O(k log k) re-sort per row.
    private def insert(b: Seq[Double], v: Double): Seq[Double] = {
      if (b.size >= k && v <= b.last) b
      else {
        val vec = b.toVector
        var lo = 0
        var hi = vec.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (vec(mid) > v) lo = mid + 1 else hi = mid
        }
        val nb = (vec.take(lo) :+ v) ++ vec.drop(lo)
        if (nb.size > k) nb.take(k) else nb
      }
    }
    def bufferEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = bufferEncoder
  }
}
