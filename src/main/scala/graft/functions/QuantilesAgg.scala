package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact interpolated percentiles over a primitive double buffer — a
  * drop-in for `percentile(col, p)` computing ALL requested percentiles
  * from ONE buffer per group.
  *
  * Why not the built-in: Spark's `Percentile` accumulates a boxed
  * value→count OpenHashMap per group; on a 150 k-row group the boxing +
  * generic hashing cost ~0.3 s per call site, and every additional
  * percentile of the same column pays a SECOND buffer (q_rel_quantiles
  * carried four). This aggregator appends to a growable Array[Double]
  * (amortized O(1), no boxing on the hot path), merges by concat, sorts
  * once at eval, and interpolates every requested percentile from that
  * one sorted array — the same `pos = p·(n−1), lower + frac·(upper−lower)`
  * formula as Spark's Percentile and DuckDB's quantile_cont, so oracle
  * twins are unchanged.
  *
  * Scale: the buffer is the group's value set, exactly like the built-in
  * (exact quantiles are not mergeable-summary computable); use
  * approx_percentile where a sketch is acceptable. Nulls must be filtered
  * by the CALLER (the untyped-udaf boundary would coerce them to 0.0; the
  * built-in skips them) — every graft call site aggregates non-null
  * fixture columns, and the oracle hash-verifies that.
  */
object QuantilesAgg {

  final case class QState(var n: Int, var vs: Array[Double])

  final class Quantiles(ps: Seq[Double])
      extends Aggregator[Double, QState, Seq[Double]] {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0, 1], got $ps")

    override def zero: QState = QState(0, new Array[Double](16))

    override def reduce(s: QState, v: Double): QState = {
      if (s.n == s.vs.length) {
        val grown = new Array[Double](s.vs.length * 2)
        System.arraycopy(s.vs, 0, grown, 0, s.n)
        s.vs = grown
      }
      s.vs(s.n) = v
      s.n += 1
      s
    }

    override def merge(a: QState, b: QState): QState = {
      val out = new Array[Double](a.n + b.n)
      System.arraycopy(a.vs, 0, out, 0, a.n)
      System.arraycopy(b.vs, 0, out, a.n, b.n)
      a.vs = out
      a.n = out.length
      a
    }

    override def finish(s: QState): Seq[Double] = {
      if (s.n == 0) return null
      val sorted = java.util.Arrays.copyOf(s.vs, s.n)
      java.util.Arrays.sort(sorted)
      ps.map { p =>
        val pos = p * (s.n - 1)
        val lo = math.floor(pos).toInt
        val hi = math.ceil(pos).toInt
        if (lo == hi) sorted(lo)
        else sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
      }
    }

    override def bufferEncoder: Encoder[QState] = Encoders.product[QState]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `quantiles(col, ps)`: array<double> of exact interpolated percentiles
    * (1-based `element_at` positions follow `ps` order). Caller casts the
    * column to double and guarantees non-null input.
    */
  def quantiles(value: Column, ps: Seq[Double]): Column =
    org.apache.spark.sql.functions.udaf(new Quantiles(ps)).apply(value)
}
