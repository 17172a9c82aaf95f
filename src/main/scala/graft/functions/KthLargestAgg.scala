package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact k-th largest of a long column per group, via a k-bounded
  * primitive min-heap — the group-wise order statistic that turns a
  * "newest k rows per key" rank window into a threshold filter.
  *
  * Why: `row_number().over(partitionBy(key).orderBy(desc))` routes every
  * group's FULL history through one reducer task and sorts it — fine for
  * high-cardinality keys, a funnel when a handful of keys carry the bulk
  * of the stream (retention over a few chatty containers). This
  * aggregate's state is ≤ k longs per group whatever the group's row
  * count, partial-aggregates map-side, and the resulting per-key
  * threshold broadcasts back onto the stream as a plain filter.
  *
  * finish() returns Long.MinValue when the group holds fewer than k
  * values (every row passes a `>=` threshold test — the min(k, n)
  * semantics of the rank form). Values must be DISTINCT within the group
  * for the threshold filter to match the rank filter exactly (log
  * sequence numbers are — the reference's ROWID contract).
  */
object KthLargestAgg {

  final case class HState(var n: Int, var heap: Array[Long])

  final class KthLargest(k: Int) extends Aggregator[Long, HState, Long] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: HState =
      HState(0, new Array[Long](math.min(k, 16)))

    private def siftDown(h: Array[Long], n: Int): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && h(l) < h(m)) m = l
        if (r < n && h(r) < h(m)) m = r
        if (m == i) return
        val t = h(i); h(i) = h(m); h(m) = t
        i = m
      }
    }

    private def push(s: HState, v: Long): Unit = {
      if (s.n < k) {
        if (s.n == s.heap.length) {
          val grown = new Array[Long](math.min(k, s.heap.length * 2))
          System.arraycopy(s.heap, 0, grown, 0, s.n)
          s.heap = grown
        }
        // sift up
        s.heap(s.n) = v
        var i = s.n
        s.n += 1
        while (i > 0 && s.heap((i - 1) / 2) > s.heap(i)) {
          val p = (i - 1) / 2
          val t = s.heap(i); s.heap(i) = s.heap(p); s.heap(p) = t
          i = p
        }
      } else if (v > s.heap(0)) {
        s.heap(0) = v
        siftDown(s.heap, s.n)
      }
    }

    override def reduce(s: HState, v: Long): HState = { push(s, v); s }

    override def merge(a: HState, b: HState): HState = {
      val (into, from) = if (a.n >= b.n) (a, b) else (b, a)
      var i = 0
      while (i < from.n) { push(into, from.heap(i)); i += 1 }
      into
    }

    override def finish(s: HState): Long =
      if (s.n < k) Long.MinValue else s.heap(0)

    override def bufferEncoder: Encoder[HState] = Encoders.product[HState]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** `kthLargest(col, k)`: the k-th largest long in the group, or
    * Long.MinValue when the group has fewer than k values.
    */
  def kthLargest(value: Column, k: Int): Column =
    org.apache.spark.sql.functions.udaf(new KthLargest(k)).apply(value)
}
