package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass SimHash aggregator: folds 64-bit token hashes into one
  * 64-slot vote buffer (+1 per set bit, -1 per clear bit) and emits the
  * sign vector as a 64-bit signature.
  *
  * Replaces the 64-separate-`SUM(CASE)` formulation: one pass over the
  * hashes, one 512-byte buffer per group in the map-side partial — the
  * shuffle carries buffers, not token rows. Associative + commutative, so
  * Spark plans partial+final aggregation.
  */
object SimHashAgg extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < 64) {
      buf(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
