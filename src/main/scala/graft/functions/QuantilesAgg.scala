package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact interpolated percentiles over a primitive value→count map — a
  * drop-in for `percentile(col, p)` computing ALL requested percentiles
  * from ONE buffer per group.
  *
  * Why not the built-in: Spark's `Percentile` accumulates a BOXED
  * value→count OpenHashMap per group; on a 150 k-row group the boxing +
  * generic hashing cost ~0.3 s per call site, and every additional
  * percentile of the same column pays a SECOND buffer (q_rel_quantiles
  * carried four). This aggregator keeps the same value→count shape —
  * buffer memory is bounded by the group's DISTINCT-value cardinality,
  * not its row count, so heavily tied columns (durations, integer-valued
  * lengths) aggregate in a few KB however many rows flow in — but on
  * primitive open-addressed arrays (no boxing on the hot path), merges
  * map-to-map, sorts the distinct keys once at eval, and interpolates
  * every requested percentile from that one weighted sorted array.
  *
  * Interpolation is the lerp form `lower + frac·(upper−lower)` — the
  * same arithmetic as DuckDB's quantile_cont Interpolator, which is what
  * keeps the oracle twins hash-stable. (Spark's own Percentile computes
  * `(hiIdx−pos)·lower + (pos−loIdx)·higher`, which can differ from the
  * lerp at the last ulp; every call site rounds to 2–6 dp, absorbing
  * both that and the replaced-builtin delta.) Nulls must be filtered by
  * the CALLER (the untyped-udaf boundary would coerce them to 0.0; the
  * built-in skips them) — every graft call site aggregates non-null
  * fixture columns, and the oracle hash-verifies that.
  *
  * Serialized-state note: Encoders.product ships the full-capacity
  * arrays, so on an ALL-DISTINCT column the partial-agg exchange carries
  * ~32–64 B per value vs the old append-array's 8–16 B. Measured, the
  * map still wins there — sf10 q_rel_quantiles (o_totalprice,
  * distinct-heavy) went 2.72 → 1.12 s, because the old merge
  * concatenated a fresh full array per partial merge (O(n) each,
  * compounding) while the map merges per-entry — and on tied columns
  * the state is orders of magnitude smaller. If a future profile shows
  * the exchange bytes mattering, the fix is a TypedImperativeAggregate
  * whose serialize() writes only occupied slots.
  */
object QuantilesAgg {

  /** Open-addressed value→count map: `counts(i) == 0` marks an empty
    * slot; capacity is a power of two at ≤50% load. Key equality and
    * hashing use canonical double bits, so -0.0/0.0 stay distinct keys
    * (they sort adjacently and interpolate identically) and NaN
    * collapses to one key instead of probing forever.
    */
  final case class QState(
      var m: Int, var total: Long,
      var keys: Array[Double], var counts: Array[Long])

  final class Quantiles(ps: Seq[Double])
      extends Aggregator[Double, QState, Seq[Double]] {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0, 1], got $ps")

    private def hashOf(v: Double): Int = {
      val b = java.lang.Double.doubleToLongBits(v)
      val h = (b ^ (b >>> 32)).toInt
      // murmur3-style finalizer: sequential keys must not cluster probes
      val x = (h ^ (h >>> 16)) * 0x85ebca6b
      x ^ (x >>> 13)
    }

    private def insert(s: QState, v: Double, c: Long): Unit = {
      val vb = java.lang.Double.doubleToLongBits(v)
      val mask = s.keys.length - 1
      var i = hashOf(v) & mask
      while (s.counts(i) != 0L &&
        java.lang.Double.doubleToLongBits(s.keys(i)) != vb)
        i = (i + 1) & mask
      if (s.counts(i) == 0L) { s.keys(i) = v; s.m += 1 }
      s.counts(i) += c
      s.total += c
      if (s.m * 2 > s.keys.length) grow(s)
    }

    private def grow(s: QState): Unit = {
      val ok = s.keys; val oc = s.counts
      s.keys = new Array[Double](ok.length * 2)
      s.counts = new Array[Long](ok.length * 2)
      s.m = 0; s.total = 0L
      var i = 0
      while (i < ok.length) {
        if (oc(i) != 0L) insert(s, ok(i), oc(i))
        i += 1
      }
    }

    override def zero: QState =
      QState(0, 0L, new Array[Double](16), new Array[Long](16))

    override def reduce(s: QState, v: Double): QState = {
      insert(s, v, 1L)
      s
    }

    override def merge(a: QState, b: QState): QState = {
      val (into, from) = if (a.m >= b.m) (a, b) else (b, a)
      var i = 0
      while (i < from.keys.length) {
        if (from.counts(i) != 0L) insert(into, from.keys(i), from.counts(i))
        i += 1
      }
      into
    }

    override def finish(s: QState): Seq[Double] = {
      if (s.total == 0L) return null
      val m = s.m
      val ks = new Array[Double](m); val cs = new Array[Long](m)
      var j = 0; var i = 0
      while (i < s.keys.length) {
        if (s.counts(i) != 0L) { ks(j) = s.keys(i); cs(j) = s.counts(i); j += 1 }
        i += 1
      }
      // index sort by key — m is distinct-bounded, and this runs once per
      // group at eval, not per row
      val order = Array.range(0, m).sortBy(ks(_))
      def valueAt(rank: Long): Double = {
        var c = 0L; var k = 0
        while (k < m) {
          c += cs(order(k))
          if (c > rank) return ks(order(k))
          k += 1
        }
        ks(order(m - 1))
      }
      ps.map { p =>
        val pos = p * (s.total - 1)
        val loRank = math.floor(pos).toLong
        val hiRank = math.ceil(pos).toLong
        val lo = valueAt(loRank)
        if (hiRank == loRank) lo
        else {
          val hi = valueAt(hiRank)
          lo + (pos - loRank) * (hi - lo)
        }
      }
    }

    override def bufferEncoder: Encoder[QState] = Encoders.product[QState]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `quantiles(col, ps)`: array<double> of exact interpolated percentiles
    * (1-based `element_at` positions follow `ps` order). Caller casts the
    * column to double and filters nulls; a null reaching the aggregate
    * THROWS (via the lazy coalesce→raise_error guard below) rather than
    * silently counting as 0.0 — the untyped-udaf boundary would otherwise
    * coerce null→0.0 where the built-in percentile skips it. Coalesce
    * short-circuits in codegen, so non-null rows never evaluate the guard.
    */
  def quantiles(value: Column, ps: Seq[Double]): Column = {
    import org.apache.spark.sql.functions.{coalesce, lit, raise_error}
    val guarded = coalesce(value, raise_error(lit(
      "graft.QuantilesAgg: null input — filter nulls before aggregating")))
    org.apache.spark.sql.functions.udaf(new Quantiles(ps)).apply(guarded)
  }
}
