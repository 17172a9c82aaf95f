package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: elementwise vector-sum aggregator over
  * `array<float>` columns, the building block for centroids / mean
  * embeddings per group.
  *
  * Why an Aggregator (vs exploding rows or 64 scalar sum columns): the
  * buffer is one double[dim] per group per partition — map-side partial
  * aggregation in its natural shape, merged pairwise across partitions.
  * At 100 TB this shuffles dim×8 bytes per (group, partition), nothing
  * proportional to row count.
  */
object VectorAgg {

  final case class SumState(var n: Long, var sums: Array[Double])

  /** Elementwise sum + count; dims fixed at construction. */
  final class VectorSum(dim: Int) extends Aggregator[Seq[Float], SumState, Seq[Double]] {
    override def zero: SumState = SumState(0L, new Array[Double](dim))
    override def reduce(b: SumState, a: Seq[Float]): SumState = {
      var i = 0
      while (i < dim && i < a.length) { b.sums(i) += a(i); i += 1 }
      b.n += 1
      b
    }
    override def merge(x: SumState, y: SumState): SumState = {
      var i = 0
      while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
    override def finish(r: SumState): Seq[Double] =
      if (r.n == 0) Seq.fill(dim)(0.0)
      else r.sums.map(_ / r.n).toSeq
    override def bufferEncoder: Encoder[SumState] = Encoders.product[SumState]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `centroid(embedding)` as an untyped Column aggregation. */
  def centroid(embedding: Column, dim: Int): Column =
    org.apache.spark.sql.functions.udaf(new VectorSum(dim))
      .apply(embedding)

  final case class SumQState(var n: Long, var sums: Array[Long])

  /** Decimal HALF_UP round to integer — Spark's round() semantics, which
    * DuckDB's round() matches (the repo's cross-engine rounding stance).
    * floor(v + 0.5) is NOT equivalent: it double-rounds
    * 0.49999999999999994 up.
    */
  private def quantize(v: Double): Long =
    new java.math.BigDecimal(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Elementwise mean with per-element contributions quantized to integer
    * nano-units BEFORE summation — the order-independence stance: long
    * addition is associative/commutative, so the result is bit-identical
    * across partitionings, run-to-run, and engines (DuckDB twin:
    * `CAST(sum(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE) / n / 1e9`).
    * Used by the k-means trainer so the learned model — and everything
    * derived from it — is oracle-replayable.
    */
  final class VectorSumQ(dim: Int) extends Aggregator[Seq[Float], SumQState, Seq[Double]] {
    override def zero: SumQState = SumQState(0L, new Array[Long](dim))
    override def reduce(b: SumQState, a: Seq[Float]): SumQState = {
      var i = 0
      while (i < dim && i < a.length) {
        b.sums(i) += quantize(a(i).toDouble * 1e9)
        i += 1
      }
      b.n += 1
      b
    }
    override def merge(x: SumQState, y: SumQState): SumQState = {
      var i = 0
      while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
    override def finish(r: SumQState): Seq[Double] =
      if (r.n == 0) Seq.fill(dim)(0.0)
      else r.sums.map(q => q.toDouble / r.n / 1e9).toSeq
    override def bufferEncoder: Encoder[SumQState] = Encoders.product[SumQState]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `centroid_q(embedding)`: order-independent quantized mean. */
  def centroidQ(embedding: Column, dim: Int): Column =
    org.apache.spark.sql.functions.udaf(new VectorSumQ(dim))
      .apply(embedding)
}
