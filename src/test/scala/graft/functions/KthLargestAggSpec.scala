package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for [[KthLargestAgg]] — the retention threshold's
  * k-bounded heap: exact k-th largest per group, Long.MinValue on
  * under-quota groups, correctness across partial-buffer merges.
  */
class KthLargestAggSpec extends SparkSpec with graft.PropSpec {

  private def kth(vals: Seq[(String, Long)], k: Int): Map[String, Long] = {
    import spark.implicits._
    vals.toDF("g", "v").repartition(4)
      .groupBy(col("g"))
      .agg(KthLargestAgg.kthLargest(col("v"), k).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("k-th largest matches a sort on shuffled distinct values") {
    val vs = scala.util.Random.shuffle((1L to 500L).toList)
    val got = kth(vs.map(("a", _)), 10)
    assert(got("a") === 491L) // 10th largest of 1..500
  }

  test("groups under quota return Long.MinValue (all rows survive >=)") {
    val got = kth(Seq(("a", 5L), ("a", 7L), ("b", 1L)), 10)
    assert(got("a") === Long.MinValue && got("b") === Long.MinValue)
  }

  test("exactly-k group returns its minimum") {
    val got = kth((1L to 10L).map(("a", _)), 10)
    assert(got("a") === 1L)
  }

  test("threshold filter reproduces the rank-window newest-k semantics") {
    import spark.implicits._
    val logs = (for (c <- Seq("c1", "c2"); s <- 1L to 37L) yield (c, s))
      .toDF("c", "seq").repartition(4)
    val thr = logs.groupBy(col("c"))
      .agg(KthLargestAgg.kthLargest(col("seq"), 5).as("t"))
    val survivors = logs.join(broadcast(thr), Seq("c"))
      .where(col("seq") >= col("t"))
    val byC = survivors.collect().groupBy(_.getString(0))
    assert(byC.forall(_._2.length === 5))
    assert(byC("c1").map(_.getLong(1)).sorted.toSeq === (33L to 37L))
  }

  test("property: threshold equals sorted-desc k-th on arbitrary distinct sets") {
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(1, 80)
      k <- Gen.choose(1, 20)
      vs <- Gen.listOfN(n, Gen.choose(-1000000L, 1000000L)).map(_.distinct)
    } yield (vs, k)
    forSamples(gen, n = 30) { case (vs, k) =>
      if (vs.nonEmpty) {
        val got = kth(vs.map(("g", _)), k)("g")
        val want =
          if (vs.size < k) Long.MinValue else vs.sorted(Ordering[Long].reverse)(k - 1)
        assert(got === want, s"k=$k vs=$vs")
      }
    }
  }
}
