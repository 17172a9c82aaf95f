package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Semantics tests for the event-analytics pack (funnel / cohort /
  * transitions) on hand-built event streams; exact fixture values are
  * covered by the DuckDB oracles (`q_ts_funnel`, `q_ts_cohort`,
  * `q_ts_transitions`).
  */
class EventAnalyticsSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "event_type")
  }

  test("userDiversity: hand-computed gini buckets land in the right deciles") {
    // u1: 4 events of one type → gini 0, decile 0, single-type
    // u2: 2+2 across two types → gini 0.5 → decile 5
    // u3: 1+1+1+1 across four types → gini 0.75 → decile 7
    val events = ev(
      (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "a"), (1L, 4L, "a"),
      (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "b"), (2L, 4L, "b"),
      (3L, 1L, "a"), (3L, 2L, "b"), (3L, 3L, "c"), (3L, 4L, "d"))
    val got = EventAnalyticsOps.userDiversityOf(events).collect()
      .map(r => r.getAs[Int]("decile") ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("mean_gini"),
          r.getAs[Long]("n_single_type"))).toMap
    assert(got.keySet === Set(0, 5, 7))
    assert(got(0) === ((1L, 0.0, 1L)))
    assert(got(5) === ((1L, 0.5, 0L)))
    assert(got(7) === ((1L, 0.75, 0L)))
    assert(got.values.map(_._1).sum === 3L)
  }

  test("funnel counts ordered subsequences, not mere presence") {
    // u1: full chain in order → reaches 4
    // u2: purchase BEFORE the chain starts → only signup+view+click (3)
    // u3: view without signup → reaches 0 (not counted)
    val events = ev(
      (1L, 1L, "signup"), (1L, 2L, "view"), (1L, 3L, "click"), (1L, 4L, "purchase"),
      (2L, 1L, "purchase"), (2L, 2L, "signup"), (2L, 3L, "view"), (2L, 4L, "click"),
      (3L, 1L, "view"), (3L, 2L, "click"))
    val got = EventAnalyticsOps.funnelOf(events).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("n_users")).toMap
    assert(got === Map(1 -> 2L, 2 -> 2L, 3 -> 2L, 4 -> 1L))
  }

  test("funnel emits intermediate steps even when every user passes them") {
    val events = ev(
      (1L, 1L, "signup"), (1L, 2L, "view"), (1L, 3L, "click"), (1L, 4L, "purchase"),
      (2L, 1L, "signup"), (2L, 2L, "view"), (2L, 3L, "click"), (2L, 4L, "purchase"))
    val got = EventAnalyticsOps.funnelOf(events).collect()
    assert(got.length === 4)
    assert(got.forall(_.getAs[Long]("n_users") === 2L))
    assert(got.map(_.getAs[String]("step")).toSeq ===
      Seq("signup", "view", "click", "purchase"))
  }

  test("funnel greedy walk matches events on the same step type repeatedly") {
    // signup, signup, view: the second signup must not consume the view slot
    val events = ev((1L, 1L, "signup"), (1L, 2L, "signup"), (1L, 3L, "view"))
    val got = EventAnalyticsOps.funnelOf(events).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("n_users")).toMap
    assert(got === Map(1 -> 1L, 2 -> 1L))
  }

  test("cohort retention assigns first-seen day and day offsets") {
    import spark.implicits._
    val d0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val d1 = Timestamp.valueOf("2024-01-02 09:00:00")
    val d2 = Timestamp.valueOf("2024-01-03 23:59:59")
    // u1 active day0+day2, u2 active day0 only, u3 cohort day1
    val events = Seq(
      (1L, d0), (1L, d2), (2L, d0), (3L, d1), (3L, d1))
      .toDF("user_id", "ts")
    val got = EventAnalyticsOps.cohortRetentionOf(events).collect()
      .map(r => (r.getAs[Long]("cohort_ms"), r.getAs[Int]("offset_days")) ->
        r.getAs[Long]("n_users")).toMap
    val day0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val day1 = Timestamp.valueOf("2024-01-02 00:00:00").getTime
    assert(got === Map(
      (day0, 0) -> 2L,  // u1 + u2 on their cohort day
      (day0, 2) -> 1L,  // u1 returns two days later
      (day1, 0) -> 1L)) // u3's cohort
  }

  test("transition matrix counts consecutive pairs per user with row-normalized p") {
    val events = ev(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "view"), (1L, 4L, "click"),
      (2L, 1L, "view"), (2L, 2L, "purchase"))
    val got = EventAnalyticsOps.transitionMatrixOf(events).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    // from view: 2×click + 1×purchase; from click: 1×view
    assert(got(("view", "click")) === ((2L, 0.666667)))
    assert(got(("view", "purchase")) === ((1L, 0.333333)))
    assert(got(("click", "view")) === ((1L, 1.0)))
    // no cross-user pair: (purchase→view) from u2's end to u1 must not exist
    assert(!got.contains(("purchase", "view")))
  }

  test("funnelTiming: greedy-chain duration for converted users only") {
    import spark.implicits._
    def evt(rows: (Long, Long, String, Long)*) =
      rows.map { case (u, e, t, ms) => (u, e, t, new Timestamp(ms)) }
        .toDF("user_id", "event_id", "event_type", "ts")
    val events = evt(
      // u1 converts start→end = 1000..4000
      (1L, 1L, "signup", 1000L), (1L, 2L, "view", 2000L),
      (1L, 3L, "click", 3000L), (1L, 4L, "purchase", 4000L),
      // u2 never converts
      (2L, 1L, "signup", 1000L),
      // u3: early purchase must NOT end the chain; greedy start at 1000,
      // end at the purchase AFTER the chain = 5000
      (3L, 1L, "signup", 1000L), (3L, 2L, "purchase", 2000L),
      (3L, 3L, "view", 3000L), (3L, 4L, "click", 4000L),
      (3L, 5L, "purchase", 5000L))
    val r = EventAnalyticsOps.funnelTimingOf(events).collect()(0)
    assert(r.getAs[Long]("n_converted") === 2L)
    assert(r.getAs[Long]("min_ms") === 3000L)  // u1
    assert(r.getAs[Long]("max_ms") === 4000L)  // u3
    assert(r.getAs[Double]("p50_ms") === 3500.0)
  }

  test("sessionBaskets: gap splits baskets; support/confidence/lift hand-checked") {
    import spark.implicits._
    def evt(rows: (Long, Long, String, Long)*) =
      rows.map { case (u, e, t, ms) => (u, e, t, new Timestamp(ms)) }
        .toDF("user_id", "event_id", "event_type", "ts")
    val min = 60000L
    // u1 session1 {a,b}; u1 session2 {a} (2h gap); u2 session {a,c}
    val events = evt(
      (1L, 1L, "a", 0L), (1L, 2L, "b", 1 * min),
      (1L, 3L, "a", 120 * min),
      (2L, 1L, "a", 0L), (2L, 2L, "c", 5 * min))
    val got = EventAnalyticsOps.sessionBasketsOf(events).collect()
      .map(r => (r.getAs[String]("ta"), r.getAs[String]("tb")) ->
        ((r.getAs[Long]("n_both"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))).toMap
    // 3 sessions; a in 3, b in 1, c in 1
    assert(got === Map(
      ("a", "b") -> ((1L, 0.333333, 0.333333, 1.0)),
      ("a", "c") -> ((1L, 0.333333, 0.333333, 1.0))))
  }

  test("rollingActives: trailing-window distinct counts, overlap not double-counted") {
    import spark.implicits._
    val day = 86400000L
    def evd(rows: (Long, Long)*) = // (user, day index)
      rows.map { case (u, di) => (u, new Timestamp(di * day)) }
        .toDF("user_id", "ts")
    // day0: u1,u2; day1: u1; day3: u3
    val events = evd((1L, 0L), (2L, 0L), (1L, 0L), (1L, 1L), (3L, 3L))
    val got = EventAnalyticsOps.rollingActivesOf(events, windowDays = 3).collect()
      .map(r => r.getAs[Long]("day_ms") / day ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("active_3d")))).toMap
    // day0: dau 2, window {d-2..d0} actives {1,2} = 2
    // day1: dau 1, window {1,2} from day0 + {1} day1 = 2 (u1 NOT doubled)
    // day3: dau 1, window day1..day3 = {1 (day1), 3} = 2
    assert(got === Map(0L -> ((2L, 2L)), 1L -> ((1L, 2L)), 3L -> ((1L, 2L))))
  }

  test("lastTouchAttribution: purchases credit the preceding channel, else direct") {
    import spark.implicits._
    val events = Seq(
      // u1: view → purchase(10), click → purchase(20)
      (1L, 1L, "view", 0.0), (1L, 2L, "purchase", 10.0),
      (1L, 3L, "click", 0.0), (1L, 4L, "purchase", 20.0),
      // u2: purchase with no preceding event → direct; prior user's
      // events must not leak across the partition
      (2L, 1L, "purchase", 5.0),
      // u3: purchase → purchase: the earlier purchase is NOT a channel,
      // the view before it is
      (3L, 1L, "view", 0.0), (3L, 2L, "purchase", 1.0), (3L, 3L, "purchase", 2.0))
      .toDF("user_id", "event_id", "event_type", "value")
    val got = EventAnalyticsOps.lastTouchAttributionOf(events).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("view") === ((3L, 0.6, 13.0)), "u1 first + both u3 purchases")
    assert(got("click") === ((1L, 0.2, 20.0)))
    assert(got("direct") === ((1L, 0.2, 5.0)))
  }

  test("typeDayIndependence: perfect association hits V=1, uniformity hits 0") {
    import spark.implicits._
    val mon = java.time.Instant.parse("2024-06-03T10:00:00Z") // Monday
    val tue = java.time.Instant.parse("2024-06-04T10:00:00Z")
    def rows(spec: (java.time.Instant, String, Int)*) = spec.flatMap {
      case (t0, typ, n) => (0 until n).map(i =>
        (java.sql.Timestamp.from(t0.plusSeconds(i.toLong)), typ))
    }.toDF("ts", "event_type")
    // A only on Monday, B only on Tuesday → e=5 per cell, chi2 = 4·25/5 = 20
    val assoc = EventAnalyticsOps.typeDayIndependenceOf(
      rows((mon, "A", 10), (tue, "B", 10))).collect()(0)
    assert(assoc.getAs[Long]("n_events") === 20L)
    assert(assoc.getAs[Long]("dof") === 1L)
    assert(assoc.getAs[Double]("chi2") === 20.0)
    assert(assoc.getAs[Double]("cramers_v") === 1.0)
    // both types uniform over both days → independent
    val indep = EventAnalyticsOps.typeDayIndependenceOf(
      rows((mon, "A", 5), (tue, "A", 5), (mon, "B", 5), (tue, "B", 5))).collect()(0)
    assert(indep.getAs[Double]("chi2") === 0.0)
    assert(indep.getAs[Double]("cramers_v") === 0.0)
  }

  test("activityConcentration: hand-computed gini and top shares") {
    import spark.implicits._
    // counts: u1=9, u2=1, u3=1, u4=1 → sorted asc 1,1,1,9:
    // T = 1+2+3+36 = 42; G = 2·42/(4·12) − 5/4 = 0.5
    val events = ((0 until 9).map(i => (1L, i.toLong)) ++
      Seq((2L, 20L), (3L, 21L), (4L, 22L)))
      .toDF("user_id", "event_id")
    val r = EventAnalyticsOps.activityConcentrationOf(events).collect()(0)
    assert(r.getAs[Long]("n_users") === 4L)
    assert(r.getAs[Long]("n_events") === 12L)
    assert(r.getAs[Double]("gini") === 0.5)
    // k1 = k10 = ceil(4/100) = ceil(4/10) = 1 → the one heaviest user
    assert(r.getAs[Double]("top1_share") === 0.75)
    assert(r.getAs[Double]("top10_share") === 0.75)
    assert(r.getAs[Double]("max_user_share") === 0.75)
    // uniform counts → gini exactly 0
    val flat = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("user_id", "event_id")
    val r2 = EventAnalyticsOps.activityConcentrationOf(flat).collect()(0)
    assert(r2.getAs[Double]("gini") === 0.0)
    assert(r2.getAs[Double]("top1_share") === 0.25)
  }

  test("activityConcentration: histogram closed form equals brute-force on random corpora") {
    import spark.implicits._
    val gen = org.scalacheck.Gen.nonEmptyListOf(
      org.scalacheck.Gen.choose(1, 40)) // per-user event counts
    new graft.PropSpec {}.forSamples(gen, n = 25) { counts =>
      val events = counts.zipWithIndex.flatMap { case (c, u) =>
        (0 until c).map(i => (u.toLong, (u * 1000 + i).toLong))
      }.toDF("user_id", "event_id")
      val r = EventAnalyticsOps.activityConcentrationOf(events).collect()(0)
      // brute-force reference: sort ascending, rank-weighted sum
      val sorted = counts.map(_.toLong).sorted
      val n = sorted.size
      val s = sorted.sum
      val t = sorted.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
      val gini = BigDecimal(2.0 * t / (n.toDouble * s) - (n + 1.0) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("gini") === gini, s"counts=$counts")
      // top-k shares against brute force
      def topShare(p: Int): Double = {
        val k = (n + p - 1) / p
        BigDecimal(sorted.takeRight(k.toInt).sum.toDouble / s)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(r.getAs[Double]("top1_share") === topShare(100), s"counts=$counts")
      assert(r.getAs[Double]("top10_share") === topShare(10), s"counts=$counts")
      assert(r.getAs[Long]("n_users") === n.toLong)
      assert(r.getAs[Long]("n_events") === s)
    }
  }

  test("topPaths counts length-3 consecutive sequences, never across users") {
    val events = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"))
    val got = EventAnalyticsOps.topPathsOf(events, k = 10).collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2"),
        r.getAs[String]("s3")) -> r.getAs[Long]("n")).toMap
    assert(got === Map(("a", "b", "c") -> 2L, ("b", "c", "d") -> 1L))
    // k truncates after the count-desc, path-asc order
    val top1 = EventAnalyticsOps.topPathsOf(events, k = 1).collect()
    assert(top1.length === 1 &&
      top1(0).getAs[String]("s1") === "a" && top1(0).getAs[Long]("n") === 2L)
  }

  test("transitionPredictability agrees with the transition matrix arg-max") {
    // a -> b twice, a -> c once; b -> c once; ties broken to larger type
    val events = ev(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "a"), (3L, 2L, "c"))
    val got = EventAnalyticsOps.transitionPredictabilityOf(events).collect()
      .map(r => r.getAs[String]("from_type") ->
        (r.getAs[Long]("n_transitions"), r.getAs[Long]("n_next_types"),
          r.getAs[String]("top_next"), r.getAs[Long]("top_n"),
          r.getAs[Double]("top1_acc"))).toMap
    assert(got === Map(
      "a" -> ((3L, 2L, "b", 2L, 0.666667)),
      "b" -> ((1L, 1L, "c", 1L, 1.0))))
    // tie on counts resolves to the lexicographically larger next type,
    // matching the oracle's ORDER BY n DESC, to_type DESC
    val tied = ev((1L, 1L, "a"), (1L, 2L, "b"), (2L, 1L, "a"), (2L, 2L, "c"))
    val t = EventAnalyticsOps.transitionPredictabilityOf(tied).collect()
    assert(t.length === 1 && t.head.getAs[String]("top_next") === "c")
    // sum over the matrix's per-from rows reconciles with n_transitions
    val matrix = EventAnalyticsOps.transitionMatrixOf(events).collect()
      .groupBy(_.getAs[String]("from_type"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    got.foreach { case (f, (n, _, _, _, _)) => assert(matrix(f) === n) }
  }

  test("hourlyDispersion: constant series 0, bursty series above 1") {
    import spark.implicits._
    val h = 3600000L
    val t0 = 1700000000000L / h * h
    // "flat": 1 event every hour for 8 hours -> variance 0
    // "burst": 8 events in hour 0, none in hours 1-7 -> dispersion = 7
    val events = ((0 until 8).map(i => (t0 + i * h + 1000L, "flat")) ++
      (0 until 8).map(i => (t0 + i * 1000L, "burst")))
      .toDF("ms", "event_type")
      .select(org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ms")).as("ts"),
        org.apache.spark.sql.functions.col("event_type"))
    val got = TimeSeriesOps.hourlyDispersionOf(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_hours"), r.getAs[Long]("nonzero_hours"),
          r.getAs[Long]("n_events"), r.getAs[Double]("mean_per_hour"),
          r.getAs[Double]("dispersion"))).toMap
    assert(got("flat") === ((8L, 8L, 8L, 1.0, 0.0)))
    // burst: n=8, S=8, Q=64 -> var = (8*64-64)/64 = 7; mean 1 -> D = 7
    assert(got("burst") === ((8L, 1L, 8L, 1.0, 7.0)))
  }
}
