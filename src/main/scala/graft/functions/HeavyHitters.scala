package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy-hitters sketch as a typed Aggregator — approximate
  * top terms with BOUNDED memory, the sketch a 100 TB corpus needs where
  * the exact `groupBy(term)` would shuffle the whole vocabulary
  * (web-scale corpora have billions of distinct tokens; the exact plan's
  * shuffle is vocabulary-sized, this one's is `m` entries per partition,
  * constant).
  *
  * Guarantees (Metwally et al. 2005; merge per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with capacity m over N tokens,
  * every term with true count > N/m is present in the summary;
  * a reported count overestimates its true count by at most the entry's
  * `err`. Merging sums counts, charging each side's min-count as the
  * potential overestimate for terms it lacks — associative/commutative
  * up to the top-m cut, so partial aggregation applies.
  *
  * Not oracle-checkable: which sub-threshold terms survive depends on
  * arrival order within a partition (inherent to Space-Saving), so the
  * quality spec pins the GUARANTEE (true heavy terms present, counts
  * within error), not the full row set.
  */
object HeavyHitters {

  /** One summary entry: count is an upper bound on the term's true
    * frequency; count − err is a lower bound.
    */
  final case class HHEntry(term: String, count: Long, err: Long)

  final case class HHState(var entries: Seq[HHEntry])

  final class SpaceSaving(m: Int) extends Aggregator[String, HHState, Seq[HHEntry]] {
    require(m >= 1, s"capacity must be >= 1, got $m")

    override def zero: HHState = HHState(Vector.empty)

    override def reduce(s: HHState, term: String): HHState = {
      val idx = s.entries.indexWhere(_.term == term)
      if (idx >= 0) {
        val e = s.entries(idx)
        s.entries = s.entries.updated(idx, e.copy(count = e.count + 1))
      } else if (s.entries.size < m) {
        s.entries = s.entries :+ HHEntry(term, 1L, 0L)
      } else {
        // evict the min-count entry (ties → lexicographically smallest
        // term, for determinism within a partition); the newcomer
        // inherits its count as the overestimate bound
        val victim = s.entries.minBy(e => (e.count, e.term))
        s.entries = s.entries.filterNot(_ eq victim) :+
          HHEntry(term, victim.count + 1, victim.count)
      }
      s
    }

    override def merge(a: HHState, b: HHState): HHState = {
      def minCount(s: HHState): Long =
        if (s.entries.size < m) 0L else s.entries.map(_.count).min
      val (ma, mb) = (minCount(a), minCount(b))
      val bm = b.entries.map(e => e.term -> e).toMap
      val am = a.entries.map(e => e.term -> e).toMap
      val merged = (am.keySet ++ bm.keySet).toSeq.map { t =>
        val ea = am.get(t)
        val eb = bm.get(t)
        HHEntry(t,
          ea.map(_.count).getOrElse(ma) + eb.map(_.count).getOrElse(mb),
          ea.map(_.err).getOrElse(ma) + eb.map(_.err).getOrElse(mb))
      }
      a.entries = merged.sortBy(e => (-e.count, e.term)).take(m)
      a
    }

    override def finish(s: HHState): Seq[HHEntry] =
      s.entries.sortBy(e => (-e.count, e.term))

    override def bufferEncoder: Encoder[HHState] = Encoders.product[HHState]
    override def outputEncoder: Encoder[Seq[HHEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HHEntry]]()
  }

  /** `heavy_hitters(term, m)` as an untyped Column aggregation. */
  def heavyHitters(term: Column, m: Int): Column =
    org.apache.spark.sql.functions.udaf(new SpaceSaving(m)).apply(term)
}
