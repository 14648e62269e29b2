package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Intermediate buffer: element-wise sums + row count. */
case class CentroidBuf(sums: Array[Double], n: Long)

/** Typed UDAF (SURVEY.md §2.K): element-wise mean of a vector column —
  * the per-label embedding centroid.
  *
  * Scale: Aggregator lowers to partial→final aggregation, so each
  * executor combines its local vectors before the shuffle; shuffle
  * volume is O(labels × dim), independent of row count. The buffer is a
  * primitive double array — no per-row boxing beyond the input Seq.
  */
object CentroidAgg extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
  override def zero: CentroidBuf = CentroidBuf(Array.empty, 0L)

  override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
    if (v == null) return b
    val sums = if (b.sums.length == 0) new Array[Double](v.length) else b.sums
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    CentroidBuf(sums, b.n + 1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    if (a.sums.length == 0) b
    else if (b.sums.length == 0) a
    else {
      val sums = a.sums.clone()
      var i = 0
      while (i < sums.length) { sums(i) += b.sums(i); i += 1 }
      CentroidBuf(sums, a.n + b.n)
    }
  }

  override def finish(b: CentroidBuf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
