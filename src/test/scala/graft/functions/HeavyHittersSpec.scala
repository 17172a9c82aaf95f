package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** Space-Saving guarantee on the fixture corpus, against exact counts:
  * every term above the N/m threshold is present, and for every reported
  * term the true count lies in [count - err, count].
  */
class HeavyHittersSpec extends SparkSpec {

  test("guarantee holds under a capacity that forces eviction") {
    val m = 16
    val toks = graft.Tables.documents(spark, sf0001)
      .select(explode(TextOps.tokens(col("text"))).as("term"))
    val exact = toks.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    assert(exact.size > m, "fixture vocabulary must exceed capacity")

    val sketch = toks
      .agg(HeavyHitters.heavyHitters(col("term"), m).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    val guaranteed = exact.filter(_._2 > n / m).keySet
    val reported = sketch.map(_._1).toSet
    assert(guaranteed.subsetOf(reported),
      s"missing heavy terms: ${guaranteed -- reported}")

    sketch.foreach { case (term, count, err) =>
      val truth = exact.getOrElse(term, 0L)
      assert(count >= truth, s"$term: upper bound $count < true $truth")
      assert(count - err <= truth, s"$term: lower bound ${count - err} > true $truth")
    }
  }

  test("heavyTerms publishes exactly the over-threshold terms with exact counts") {
    val m = 16
    val exact = graft.Tables.documents(spark, sf0001)
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val want = exact.filter { case (_, c) => c * m > n }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(m)

    val got = TextOps.heavyTerms(spark, sf0001, m = m, k = m)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want,
      "verified heavy-hitter output must be the exact over-threshold set")
  }

  test("heavyTermsExact ≡ heavyTerms (sketch+recount) on the fixture") {
    // m high enough that the count·m > N threshold admits real terms on the
    // tiny fixture (at the default m=200 both correctly return few/none)
    val m = 5000
    val a = TextOps.heavyTermsExact(spark, sf0001, m = m, k = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = TextOps.heavyTerms(spark, sf0001, m = m, k = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a === b && a.nonEmpty)
  }

  test("under-capacity summaries are exact") {
    import spark.implicits._
    val terms = Seq("a", "b", "a", "c", "a", "b").toDF("t")
    val got = terms.agg(HeavyHitters.heavyHitters(col("t"), 10).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }
}
