package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One-pass grouped top-k as a typed [[Aggregator]]: keeps the k largest
  * (value, id) pairs per group, descending value with ascending-id
  * tie-break.
  *
  * Why an Aggregator and not a window: `row_number() OVER (PARTITION BY
  * g ORDER BY v DESC) <= k` sorts EVERY group member inside its window
  * partition before discarding all but k. An aggregate participates in
  * partial aggregation: each map task reduces its slice to at most k
  * pairs per group BEFORE the exchange, so the shuffle carries k rows
  * per (group, partition) instead of the whole group — the difference
  * between shuffling kilobytes and terabytes when groups are large and
  * k is small. (Spark 3.5+'s WindowGroupLimit narrows the gap for the
  * window form, but still sorts and shuffles whole groups.)
  *
  * Buffer is a sorted Vector bounded at k: reduce is an insertion into
  * at most k elements, merge is a bounded merge — both O(k), state O(k).
  */
final class TopByValue(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  // matches SQL `ORDER BY v DESC, id ASC` exactly: Spark sorts NaN as the
  // LARGEST double and treats -0.0 == 0.0; scala's Ordering.by(-v) would
  // rank NaN last and split the zeros before consulting the id tie-break.
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    private def norm(v: Double): Double = if (v == 0.0) 0.0 else v
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(norm(b._1), norm(a._1)) // desc, NaN first
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)    // id asc
    }
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)],
                      a: (Double, Long)): Seq[(Double, Long)] =
    if (b.size >= k && ord.gteq(a, b.last)) b
    else ((b :+ a).sorted(ord)).take(k)

  override def merge(x: Seq[(Double, Long)],
                     y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (x ++ y).sorted(ord).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopByValue {
  /** Aggregator over (group-ignored) triples: picks (value, id) from
    * (key, value, id) rows — convenience for Dataset.groupByKey flows.
    */
  final class OfTriple(k: Int)
      extends Aggregator[(Int, Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val inner = new TopByValue(k)
    override def zero: Seq[(Double, Long)] = inner.zero
    override def reduce(b: Seq[(Double, Long)],
                        a: (Int, Double, Long)): Seq[(Double, Long)] =
      inner.reduce(b, (a._2, a._3))
    override def merge(x: Seq[(Double, Long)],
                       y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      inner.merge(x, y)
    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] = inner.bufferEncoder
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = inner.outputEncoder
  }
}
