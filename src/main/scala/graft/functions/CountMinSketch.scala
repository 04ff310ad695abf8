package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed Spark [[Aggregator]] — the custom
  * distributed aggregation path (partial sketches per partition,
  * elementwise-sum merge) for heavy-hitter estimation over unbounded key
  * domains where an exact groupBy would not fit.
  *
  * Buckets use the engine-portable hash family of [[PortableHashExprs]]
  * (bucket_i(x) = ((A(i)·baseHash(x) + B(i)) mod P) mod width), so an
  * independent SQL engine can rebuild the identical sketch and verify
  * every estimate — see the `text_heavy_hitters` oracle.
  *
  * Estimates over-count (never under-count): est(x) = min over rows i of
  * cell(i, bucket_i(x)); error ≤ 2N/width with prob ≥ 1 − 2^-depth.
  */
object CountMinSketch {

  def bucket(i: Int, token: String, width: Int): Int =
    (((PortableHashExprs.affineA(i) * PortableHashExprs.baseHash(token) +
      PortableHashExprs.affineB(i)) % PortableHashExprs.P) % width).toInt

  def estimate(sketch: Array[Long], token: String, depth: Int,
      width: Int): Long =
    (0 until depth).map(i => sketch(i * width + bucket(i, token, width))).min

  class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], token: String): Array[Long] = {
      var i = 0
      while (i < depth) {
        buf(i * width + bucket(i, token, width)) += 1
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
