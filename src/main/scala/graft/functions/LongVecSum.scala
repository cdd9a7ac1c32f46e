package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise sum of array<bigint> vectors — the engine's one custom
  * `Aggregator` (SURVEY §2.9: UDAFs are optional; this one exists because
  * Spark has no built-in element-wise array aggregate, and the explode →
  * groupBy(pos) alternative multiplies the shuffle by the vector
  * dimension). Integer math keeps it commutative-exact: identical results
  * for any partitioning or merge order. Empty input yields an empty array.
  */
object LongVecSum extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] =
    if (v == null) buf
    else if (buf.isEmpty) v.toArray
    else {
      // A ragged (dimension-mismatched) vector is corrupt input; silently
      // truncating would shrink the sum by encounter order. Fail loudly.
      require(buf.length == v.length,
        s"LongVecSum: vector dimension mismatch (${buf.length} vs ${v.length})")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"LongVecSum: vector dimension mismatch (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoderHelper.longSeq

  /** Column form: `long_vec_sum(vec)`. */
  def column(vec: Column): Column = udaf(this).apply(vec)
}

private object ExpressionEncoderHelper {
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  val longSeq: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
