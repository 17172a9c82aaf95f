package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for [[QuantilesAgg]] — equality against Spark's builtin
  * `percentile` (after the call sites' rounding) and the distinct-bounded
  * buffer contract the r10 rework introduced.
  */
class QuantilesAggSpec extends SparkSpec with graft.PropSpec {

  private def quantileOf(vals: Seq[Double], ps: Seq[Double]): Seq[Double] = {
    import spark.implicits._
    val df = vals.toDF("v").repartition(4)
    df.agg(QuantilesAgg.quantiles(col("v"), ps).as("qs"))
      .collect()(0).getSeq[Double](0)
  }

  private def builtinOf(vals: Seq[Double], ps: Seq[Double]): Seq[Double] = {
    import spark.implicits._
    val df = vals.toDF("v").repartition(4)
    val aggs = ps.map(p => expr(s"percentile(v, $p)"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    ps.indices.map(row.getDouble)
  }

  private val fences = Seq(0.0, 0.2, 0.25, 0.5, 0.75, 0.9, 1.0)

  test("matches builtin percentile on distinct values (4 dp)") {
    val vals = (1 to 153).map(i => i * 1.25 - 7)
    val (got, want) = (quantileOf(vals, fences), builtinOf(vals, fences))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 5e-5, s"got $g want $w") }
  }

  test("heavily tied input: counts weight ranks, buffer stays distinct-sized") {
    // 10_000 rows, 7 distinct values — the shape that must NOT buffer
    // per row (funnel durations, integer lengths)
    val vals = Seq.fill(4000)(5.0) ++ Seq.fill(3000)(1.0) ++
      Seq.fill(1500)(9.0) ++ Seq.fill(1000)(2.5) ++ Seq.fill(400)(7.0) ++
      Seq.fill(99)(0.5) ++ Seq.fill(1)(100.0)
    val (got, want) = (quantileOf(vals, fences), builtinOf(vals, fences))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 5e-5, s"got $g want $w") }
  }

  test("single value, empty-ish groups, and -0.0/0.0 adjacency") {
    assert(quantileOf(Seq(42.0), fences).forall(_ == 42.0))
    // -0.0 and 0.0 are distinct map keys but interpolate identically
    val got = quantileOf(Seq(-0.0, 0.0, -0.0, 0.0), Seq(0.5))
    assert(got.head == 0.0)
  }

  test("state map grows past its initial capacity and survives merges") {
    // >16 distinct values per partition forces grow(); repartition(4)
    // forces partial-buffer merges
    val vals = (1 to 1000).map(_.toDouble)
    val got = quantileOf(vals, Seq(0.5, 0.99))
    assert(math.abs(got(0) - 500.5) < 1e-9)
    assert(math.abs(got(1) - 990.01) < 1e-6)
  }

  test("property: arbitrary tied multisets match the builtin at 4 dp") {
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(1, 60)
      vs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-50, 50).map(_.toDouble),      // heavy ties
        Gen.choose(-1e6, 1e6)))                   // distinct-ish
    } yield vs
    forSamples(gen, n = 30) { vs =>
      val (got, want) = (quantileOf(vs, fences), builtinOf(vs, fences))
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 5e-5, s"got $g want $w for $vs") }
    }
  }
  test("a null reaching the aggregate throws instead of counting as 0.0") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val e = intercept[Exception] {
      df.agg(QuantilesAgg.quantiles(col("v"), Seq(0.5))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("QuantilesAgg: null input")))
    // and the guard is pay-per-use: non-null columns aggregate unchanged
    val ok = df.where(col("v").isNotNull)
      .agg(QuantilesAgg.quantiles(col("v"), Seq(0.5))).collect()(0)
      .getSeq[Double](0)
    assert(ok === Seq(2.0))
  }
}
