package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k selection as a typed Aggregator — the
  * two-phase partial-agg replacement for `row_number() OVER (PARTITION BY
  * group ORDER BY …) <= k` when `group` has BOUNDED cardinality over
  * corpus-sized input (language, source shard, label, …).
  *
  * The window form sorts each group's ENTIRE slice on one reducer — with
  * 10 labels over 100 TB that is 10 TB through a single task. This
  * aggregator keeps at most `cap` entries per partition per group
  * (map-side partial aggregation), so the shuffle carries
  * ≤ cap × partitions × |groups| constant-size rows and no full-slice
  * sort ever exists. Same stance as the Space-Saving sketch
  * ([[HeavyHitters]]), but exact: top-k under a total order is a
  * mergeable summary (the k smallest of a union are among the union of
  * each side's k smallest).
  *
  * Ordering is ascending (ks, kd, id) — a string key, a double key, and
  * the id tiebreak; callers encode "descending by x" as kd = −x and an
  * unused key as ""/0.0. `p` is an opaque payload that rides along
  * (weight, distance, …), so winners need no join-back to recover their
  * attributes. Entries come back sorted, so `posexplode` yields the rank.
  */
object TopKAgg {

  /** One candidate: composite sort key (ks, kd, id) + payload `p`. */
  final case class TKEntry(ks: String, kd: Double, id: Long, p: Double)

  final case class TKState(var entries: Vector[TKEntry])

  private val ord: Ordering[TKEntry] =
    Ordering.by((e: TKEntry) => (e.ks, e.kd, e.id))

  final class TopK(cap: Int) extends Aggregator[TKEntry, TKState, Seq[TKEntry]] {
    require(cap >= 1, s"cap must be >= 1, got $cap")

    override def zero: TKState = TKState(Vector.empty)

    override def reduce(s: TKState, e: TKEntry): TKState = {
      // common case once warm: strictly worse than the current k-th → O(1)
      if (s.entries.size == cap && ord.gteq(e, s.entries.last)) return s
      val i = s.entries.indexWhere(ord.lt(e, _)) match {
        case -1 => s.entries.size
        case j  => j
      }
      val grown = (s.entries.take(i) :+ e) ++ s.entries.drop(i)
      s.entries = if (grown.size > cap) grown.take(cap) else grown
      s
    }

    override def merge(a: TKState, b: TKState): TKState = {
      a.entries = (a.entries ++ b.entries).sorted(ord).take(cap)
      a
    }

    override def finish(s: TKState): Seq[TKEntry] = s.entries

    override def bufferEncoder: Encoder[TKState] = Encoders.product[TKState]
    override def outputEncoder: Encoder[Seq[TKEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TKEntry]]()
  }

  /** `top_k(ks, kd, id, p, cap)` as an untyped Column aggregation:
    * array<struct<ks,kd,id,p>> of the `cap` smallest (ks, kd, id),
    * sorted — `posexplode` positions are 0-based ranks.
    */
  def topK(ks: Column, kd: Column, id: Column, p: Column, cap: Int): Column =
    org.apache.spark.sql.functions.udaf(new TopK(cap)).apply(ks, kd, id, p)
}
