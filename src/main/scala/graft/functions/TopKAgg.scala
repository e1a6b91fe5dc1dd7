package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k by value as a typed aggregate: a bounded insertion
  * buffer (size ≤ k) replaces the ranking-window formulation's full
  * partition sort. O(n · k) worst case with k small and constant memory
  * per group, partial-merged map-side — the shuffle carries at most k
  * rows per (group, partition) instead of the whole group. Use when k ≪
  * group size; the window form is in [[graft.operators.Relational.topOrdersPerCustomer]].
  *
  * Ordering: value DESC, then key ASC on ties (deterministic, matches the
  * window twin's `orderBy(desc(value), asc(key))`).
  */
class TopKAgg(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && better(buf.last, x)) buf
    else ((buf :+ x).sortWith(better)).take(k)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    insert(buf, in)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
