package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.util.sketch.CountMinSketch

/** Occurrence-WEIGHTED count-min sketch over `(term, cnt)` rows: each row
  * adds `cnt` to the term's counters in one call, so a pre-aggregated
  * term-counts table feeds the sketch WITHOUT re-expanding the token
  * stream (the SQL `count_min_sketch` aggregate is unweighted — feeding
  * it meant `explode(array_repeat(term, cnt))`, linear but pointless work
  * that also capped cnt at Int.MaxValue through the array size).
  *
  * CMS counters are order-independent sums, so the result is bit-identical
  * to the unweighted sketch of the expanded stream at the same
  * (eps, confidence, seed) — the spec asserts blob equality. Partials
  * merge map-side like any typed Aggregator; one sketch blob reaches the
  * driver.
  */
class CmsWeightedAgg(eps: Double, confidence: Double, seed: Int)
    extends Aggregator[(String, Long), CountMinSketch, Array[Byte]] {

  def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)

  def reduce(b: CountMinSketch, a: (String, Long)): CountMinSketch = {
    require(a._2 >= 0L, s"negative occurrence count ${a._2} for term '${a._1}'")
    b.add(a._1, a._2)
    b
  }

  def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch = {
    b1.mergeInPlace(b2)
    b1
  }

  def finish(r: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    r.writeTo(bos)
    bos.toByteArray
  }

  // CountMinSketchImpl implements Java serialization via its own compact
  // writeTo/readFrom format — the buffer only crosses the wire at the
  // partial-merge boundary
  def bufferEncoder: Encoder[CountMinSketch] = Encoders.javaSerialization[CountMinSketch]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
