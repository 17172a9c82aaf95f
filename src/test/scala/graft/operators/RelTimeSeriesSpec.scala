package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariant tests for the relational + time-series packs on the sf0.001
  * fixtures (exact values are covered by the DuckDB oracle; these check
  * structural properties that must hold at any scale).
  */
class RelTimeSeriesSpec extends SparkSpec {

  test("trendFit: hand-computed slope/r2, dense-grid zero fill, degenerate pin") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 10:00:00")
    // "up": counts 1,2,3 on consecutive days → slope 1, r2 1
    // "gap": 3 events day1, none day2, 3 events day3 → dense fill → slope 0
    // "flat": constant 2,2,2 → den2 = 0 → slope 0, r2 pinned 0
    val rows =
      Seq.fill(1)(("up", ts(1))) ++ Seq.fill(2)(("up", ts(2))) ++
        Seq.fill(3)(("up", ts(3))) ++
        Seq.fill(3)(("gap", ts(1))) ++ Seq.fill(3)(("gap", ts(3))) ++
        Seq.fill(2)(("flat", ts(1))) ++ Seq.fill(2)(("flat", ts(2))) ++
        Seq.fill(2)(("flat", ts(3)))
    val got = TimeSeriesOps.trendFitOf(rows.toDF("event_type", "ts")).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("n_events"),
          r.getAs[Double]("slope_per_day"), r.getAs[Double]("r2"))).toMap
    assert(got("up") === ((3L, 6L, 1.0, 1.0)))
    assert(got("gap") === ((3L, 6L, 0.0, 0.0))) // day 2 filled with 0
    assert(got("flat") === ((3L, 6L, 0.0, 0.0)))
    val fixture = TimeSeriesOps.trendFit(spark, sf0001).collect()
    fixture.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_days") >= 1L)
    }
  }

  test("semi and anti joins partition the customer set") {
    val urgent = RelationalOps.customersWithUrgentOrders(spark, sf0001)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val building = Tables.customer(spark, sf0001)
      .where(col("c_mktsegment") === "BUILDING").count()
    assert(urgent.nonEmpty && urgent.size <= building)
    val dormant = RelationalOps.dormantCustomers(spark, sf0001)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    // anti join = exact complement of customers having a qualifying order
    val active = Tables.orders(spark, sf0001)
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val all = Tables.customer(spark, sf0001)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(dormant === all -- active)
  }

  test("top3OrdersPerCustomer: rank bounded, per-customer counts <= 3, ordered") {
    val rows = RelationalOps.top3OrdersPerCustomer(spark, sf0001).collect()
    assert(rows.forall(_.getAs[Int]("rn") <= 3))
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey")).view.mapValues(_.length)
    assert(perCust.values.forall(_ <= 3))
  }

  test("runningRevenue: last running value equals the customer's total") {
    val rows = RelationalOps.runningRevenue(spark, sf0001).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    val totals = Tables.orders(spark, sf0001).where(col("o_custkey") <= 100)
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (ck, rs) =>
      // prices are positive → the max running value is the customer total
      val maxRun = rs.map(_.getAs[Double]("running_total")).max
      assert(math.abs(maxRun - totals(ck)) < 0.5)
    }
  }

  test("rollup and cube grand-total rows equal the full row count") {
    val n = Tables.lineitem(spark, sf0001).count()
    val roll = RelationalOps.rollupReturns(spark, sf0001)
      .where(col("returnflag") === "(all)" && col("linestatus") === "(all)")
      .collect()
    assert(roll.length === 1 && roll.head.getAs[Long]("n") === n)
    val cube = RelationalOps.cubeReturns(spark, sf0001).collect()
    assert(cube.count(_.getAs[String]("returnflag") == "(all)") >= 2) // (all,*) rows
    assert(cube.find(r => r.getAs[String]("returnflag") == "(all)" &&
      r.getAs[String]("linestatus") == "(all)").get.getAs[Long]("n") === n)
  }

  test("buyerCohorts: 'both' and 'only_1995' are disjoint and cover b95") {
    val rows = RelationalOps.buyerCohorts(spark, sf0001).collect()
      .groupBy(_.getAs[String]("cohort"))
    val both = rows.getOrElse("both", Array.empty).map(_.getLong(0)).toSet
    val only = rows.getOrElse("only_1995", Array.empty).map(_.getLong(0)).toSet
    assert((both & only).isEmpty)
    val b95 = Tables.orders(spark, sf0001)
      .where(year(col("o_orderdate")) === 1995)
      .select("o_custkey").distinct().count()
    assert((both.size + only.size).toLong === b95)
  }

  test("promoRevenueShare: share in [0,100], revenues reconcile per month") {
    val rows = RelationalOps.promoRevenueShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val promo = r.getAs[Double]("promo_revenue")
      val total = r.getAs[Double]("revenue")
      val share = r.getAs[Double]("promo_share")
      assert(promo >= 0 && promo <= total)
      assert(share >= 0.0 && share <= 100.0)
      // share is round(·, 4): reconstruction can differ by half an ulp of
      // the 4th decimal
      assert(math.abs(share - 100.0 * promo / total) <= 5.001e-5)
    }
    // months are distinct and sorted
    val ms = rows.map(_.getAs[Long]("month_ms")).toSeq
    assert(ms === ms.sorted && ms.distinct.size === ms.size)
  }

  test("minCostSupplier: one row per sold part; best_price is the true minimum") {
    val out = RelationalOps.minCostSupplier(spark, sf0001).collect()
    val soldParts = Tables.lineitem(spark, sf0001)
      .select("l_partkey").distinct().count()
    assert(out.length.toLong === soldParts)
    assert(out.map(_.getAs[Long]("p_partkey")).distinct.length === out.length)
    // cross-check a handful of parts against a brute recompute
    val brute = Tables.lineitem(spark, sf0001)
      .where(col("l_partkey") <= 10)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") / col("l_quantity"), 6).as("u"))
      .collect().groupBy(_.getLong(0))
    out.filter(_.getAs[Long]("p_partkey") <= 10).foreach { r =>
      val rows = brute(r.getAs[Long]("p_partkey"))
      val minU = rows.map(_.getDouble(2)).min
      assert(r.getAs[Double]("best_price") === minU)
      // deterministic tie-break: smallest suppkey among the minima
      val winner = rows.filter(_.getDouble(2) == minU).map(_.getLong(1)).min
      assert(r.getAs[Long]("s_suppkey") === winner)
    }
  }

  test("topReturnedCustomers: descending revenue, only R items in window counted") {
    val out = RelationalOps.topReturnedCustomers(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 20)
    val revs = out.map(_.getAs[Double]("ret_revenue")).toSeq
    assert(revs === revs.sorted.reverse)
    // reconcile the top row against a brute recompute
    val top = out.head
    val brute = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("l_returnflag") === "R" &&
        col("o_custkey") === top.getAs[Long]("c_custkey") &&
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2))
      .collect().head.getDouble(0)
    assert(top.getAs[Double]("ret_revenue") === brute)
  }

  test("seasonality: day shares sum to 1 per weekday, counts to the corpus") {
    val rows = TimeSeriesOps.seasonality(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.events(spark, sf0001).count())
    rows.groupBy(_.getAs[Int]("iso_dow")).foreach { case (dow, cells) =>
      assert(dow >= 1 && dow <= 7)
      val share = cells.map(_.getAs[Double]("day_share")).sum
      assert(math.abs(share - 1.0) < 1e-4, s"dow $dow shares sum to $share")
      cells.foreach(c => assert(c.getAs[Int]("hr") >= 0 && c.getAs[Int]("hr") <= 23))
    }
  }

  test("priceQuantiles: p50 <= p95 per group") {
    RelationalOps.priceQuantiles(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95"))
    }
  }

  test("sessions partition each user's events exactly") {
    val sess = TimeSeriesOps.sessions(spark, sf0001)
      .groupBy("user_id").agg(sum("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val events = Tables.events(spark, sf0001)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess === events)
    // session bounds are ordered
    TimeSeriesOps.sessions(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("session_start_ms") <= r.getAs[Long]("session_end_ms"))
    }
  }

  test("hourly tumbling counts sum to the table size; sliding counts to 2x") {
    val n = Tables.events(spark, sf0001).count()
    val hourly = TimeSeriesOps.hourlyByType(spark, sf0001)
      .agg(sum("n")).collect().head.getLong(0)
    assert(hourly === n)
    val sliding = TimeSeriesOps.slidingActivity(spark, sf0001)
      .agg(sum("n")).collect().head.getLong(0)
    assert(sliding === 2 * n) // every event lands in exactly 2 sliding windows
  }

  test("as-of: every prior click strictly precedes its error, per user") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val asof = RelationalOps.lastClickBeforeError(spark, sf0001)
    val joined = asof.where(col("prior_click_id").isNotNull)
      .join(ev.select(col("event_id").as("prior_click_id"),
        col("user_id").as("u2"), col("event_type").as("t2")), Seq("prior_click_id"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("t2") === "click")
      assert(r.getAs[Long]("u2") === r.getAs[Long]("user_id"))
      // event_id is monotone with ts in the fixture → strict precedence
      assert(r.getAs[Long]("prior_click_id") < r.getAs[Long]("event_id"))
    }
  }

  test("integrityAudit counts planted violations and reports zeros as passes") {
    import spark.implicits._
    val li = Seq((1L, 1), (1L, 2), (9L, 1)).toDF("l_orderkey", "l_linenumber")
    val ord = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((10L, 0), (11L, 7)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((0L, "A")).toDF("n_nationkey", "n_name")
    val got = RelationalOps.integrityAuditOf(li, ord, cust, nat).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("n_violations")).toMap
    assert(got === Map(
      "lineitem_without_order" -> 1L,   // l_orderkey 9
      "order_without_lineitem" -> 2L,   // orders 2, 3
      "order_without_customer" -> 1L,   // custkey 99
      "customer_without_nation" -> 1L)) // nationkey 7
    // the fixture reports 4 explicit rows (a real finding included: the
    // synthetic generator leaves some orders without lineitems)
    val clean = RelationalOps.integrityAudit(spark, sf0001).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("n_violations")).toMap
    assert(clean.keySet.size === 4)
    assert(clean("lineitem_without_order") === 0L)
    assert(clean("order_without_customer") === 0L)
    assert(clean("customer_without_nation") === 0L)
    assert(clean("order_without_lineitem") > 0L)
  }

  test("rfmSegments: scores in 1..5, monotone with their metric, segment composed") {
    val rows = RelationalOps.rfmSegments(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for (c <- Seq("r", "f", "m"))
        assert(r.getAs[Int](c) >= 1 && r.getAs[Int](c) <= 5)
      assert(r.getAs[Int]("segment") ===
        r.getAs[Int]("r") * 100 + r.getAs[Int]("f") * 10 + r.getAs[Int]("m"))
    }
    // boundary scoring is monotone: sorted by monetary, m never decreases
    val byMonetary = rows.sortBy(_.getAs[Double]("monetary")).map(_.getAs[Int]("m"))
    assert(byMonetary.zip(byMonetary.tail).forall { case (a, b) => a <= b })
    // and recency scores INVERT: sorted by recency_days, r never increases
    val byRecency = rows.sortBy(_.getAs[Int]("recency_days")).map(_.getAs[Int]("r"))
    assert(byRecency.zip(byRecency.tail).forall { case (a, b) => a >= b })
    // quintile boundaries split ~evenly (ties may skew buckets slightly)
    val mCounts = rows.groupBy(_.getAs[Int]("m")).view.mapValues(_.length)
    assert(mCounts.keySet === Set(1, 2, 3, 4, 5))
  }

  test("profileOf: per-column nulls/distinct/min-max with typed routing") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("b"), Some(2.5)),
      (Some(3L), None, Some(0.5)),
      (None, Some("a"), Some(2.5)))
      .toDF("k", "s", "v")
    val got = RelationalOps.profileOf(df, Seq("k", "s", "v")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(got.keySet === Set("k", "s", "v"))
    got.values.foreach(r => assert(r.getAs[Long]("n_rows") === 3L))
    val k = got("k")
    assert(k.getAs[Long]("n_nulls") === 1L)
    assert(k.getAs[Long]("n_distinct") === 2L)
    assert(k.getAs[Double]("min_num") === 1.0)
    assert(k.getAs[Double]("max_num") === 3.0)
    assert(k.isNullAt(k.fieldIndex("min_str")))
    val s = got("s")
    assert(s.getAs[Long]("n_nulls") === 1L)
    assert(s.getAs[String]("min_str") === "a")
    assert(s.getAs[String]("max_str") === "b")
    assert(s.isNullAt(s.fieldIndex("min_num")))
    val v = got("v")
    assert(v.getAs[Long]("n_distinct") === 2L) // 2.5 dup collapses
    assert(v.getAs[Double]("min_num") === 0.5)
  }

  test("profileOf: decimal columns keep fractional distinctness (no long truncation)") {
    import spark.implicits._
    // 1.10 vs 1.25 vs 1.10 — a long-cast distinct slot would merge all
    // three to 1L; the string slot must report 2 distinct values
    val df = Seq("1.10", "1.25", "1.10").toDF("raw")
      .select(col("raw").cast("decimal(12,2)").as("price"))
    val row = RelationalOps.profileOf(df, Seq("price")).collect().head
    assert(row.getAs[Long]("n_distinct") === 2L)
    assert(row.getAs[Double]("min_num") === 1.1)
    assert(row.getAs[Double]("max_num") === 1.25)
  }

  test("anomalies: spike over a varying history is flagged, normal buckets are not") {
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-06-01T00:00:00Z")
    // 24 history hours alternating 9/11 events, then an hour with 20
    val counts = (0 until 24).map(h => (h, if (h % 2 == 0) 9 else 11)) :+ ((24, 20))
    val rows = counts.flatMap { case (h, n) =>
      (0 until n).map(i =>
        ("error", java.sql.Timestamp.from(t0.plusSeconds(h * 3600L + i))))
    }
    val got = TimeSeriesOps.anomaliesOf(rows.toDF("event_type", "ts"), lookback = 24)
      .collect()
    // only the spike hour has a full 24-bucket history
    assert(got.length === 1)
    val r = got(0)
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Double]("mean_n") === 10.0)
    // var = (Σn² − (Σn)²/24)/23 = (2424 − 2400)/23; z = 10/sqrt(var)
    val z = 10.0 / math.sqrt(24.0 / 23.0)
    assert(math.abs(r.getAs[Double]("z") - z) < 5e-4)
    assert(r.getAs[Boolean]("is_anomaly"))
    // replace the spike with an in-band value → not flagged
    val calm = counts.dropRight(1) :+ ((24, 11))
    val rows2 = calm.flatMap { case (h, n) =>
      (0 until n).map(i =>
        ("error", java.sql.Timestamp.from(t0.plusSeconds(h * 3600L + i))))
    }
    val got2 = TimeSeriesOps.anomaliesOf(rows2.toDF("event_type", "ts"), lookback = 24)
      .collect()
    assert(got2.length === 1 && !got2(0).getAs[Boolean]("is_anomaly"))
  }

  test("hourlyIncrement: merge equals full recompute; statuses classify buckets") {
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-06-01T00:00:00Z")
    def ev(h: Int, typ: String, v: Double) =
      (java.sql.Timestamp.from(t0.plusSeconds(h * 3600L)), typ, v)
    val baseEvents = Seq(ev(0, "a", 1.0), ev(0, "a", 2.0), ev(1, "b", 3.0))
      .toDF("ts", "event_type", "value")
    val late = Seq(ev(0, "a", 4.0), ev(2, "c", 5.0)) // merged + new bucket
      .toDF("ts", "event_type", "value")
    val base = baseEvents
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour", $"ts").as("bucket"),
        $"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"value").as("sv"))
    val got = TimeSeriesOps.hourlyIncrementOf(base, late).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toInstant.getEpochSecond / 3600 % 24) ->
        ((r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    assert(got(("a", 0)) === ((3L, 7.0, "merged")))
    assert(got(("b", 1)) === ((1L, 3.0, "unchanged")))
    assert(got(("c", 2)) === ((1L, 5.0, "new")))
    // contract: identical to recomputing over base ∪ late
    val full = baseEvents.union(late)
      .groupBy(org.apache.spark.sql.functions.date_trunc("hour", $"ts").as("bucket"),
        $"event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"value").as("sv"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val inc = TimeSeriesOps.hourlyIncrementOf(base, late)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(inc === full)
  }

  test("hourlyDense: random sparse series reconcile with a plain-Scala reference") {
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-06-01T00:00:00Z")
    // (type, hour, value) observations over a 12-hour span, sparse
    val gen = org.scalacheck.Gen.nonEmptyListOf(for {
      typ <- org.scalacheck.Gen.oneOf("a", "b", "c")
      h <- org.scalacheck.Gen.choose(0, 11)
      v <- org.scalacheck.Gen.choose(1, 100)
    } yield (typ, h, v.toDouble))
    new graft.PropSpec {}.forSamples(gen, n = 15) { obs =>
      val events = obs.map { case (typ, h, v) =>
        (java.sql.Timestamp.from(t0.plusSeconds(h * 3600L)), typ, v)
      }.toDF("ts", "event_type", "value")
      val got = TimeSeriesOps.hourlyDenseOf(events).collect()
        .map(r => (r.getString(1), r.getLong(0)) ->
          ((r.getLong(2), r.getDouble(3),
            Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
      // reference: dense grid over the observed span, zero-fill + LVCF
      val hours = obs.map(_._2)
      val (h0, h1) = (hours.min, hours.max)
      val types = obs.map(_._1).distinct
      assert(got.size === (h1 - h0 + 1) * types.size, "dense grid size")
      for (typ <- types) {
        var carry: Option[Double] = None
        for (h <- h0 to h1) {
          val vs = obs.filter(o => o._1 == typ && o._2 == h).map(_._3)
          if (vs.nonEmpty) carry = Some(
            BigDecimal(vs.sum / vs.size)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          val key = (typ, t0.plusSeconds(h * 3600L).toEpochMilli)
          val (n, sv, ff) = got(key)
          assert(n === vs.size.toLong, s"$key n")
          assert(sv === BigDecimal(vs.sum)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$key sum")
          assert(ff === carry, s"$key carry")
        }
      }
    }
  }

  test("hourlyDense: gaps zero-fill, forward fill carries the last mean") {
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-06-01T00:00:00Z")
    def ev(h: Int, typ: String, v: Double) =
      (java.sql.Timestamp.from(t0.plusSeconds(h * 3600L)), typ, v)
    // type a: hours 0 (v=2.0) and 3 (v=8.0) — gap at 1, 2
    // type b: hour 2 only — null fill before its first observation
    val events = Seq(
      ev(0, "a", 2.0), ev(3, "a", 8.0), ev(2, "b", 5.0))
      .toDF("ts", "event_type", "value")
    val got = TimeSeriesOps.hourlyDenseOf(events).collect()
      .map(r => (r.getString(1), r.getLong(0)) ->
        (r.getLong(2), r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got.size === 8, "4-hour span × 2 types")
    val h = (i: Int) => t0.plusSeconds(i * 3600L).toEpochMilli
    assert(got(("a", h(1))) === ((0L, 0.0, Some(2.0))), "gap carries hour-0 mean")
    assert(got(("a", h(2))) === ((0L, 0.0, Some(2.0))))
    assert(got(("a", h(3))) === ((1L, 8.0, Some(8.0))))
    assert(got(("b", h(0)))._3 === None, "no observation yet — nothing to carry")
    assert(got(("b", h(3))) === ((0L, 0.0, Some(5.0))))
  }

  test("q5/q7/q8: regional and cross-border revenue reconcile against brute filters") {
    import spark.implicits._
    val d = sf0001
    // q5: every reported nation is in ASIA, and revenue matches a brute
    // five-way-join recomputation.
    val asiaNations = Tables.nation(spark, d)
      .join(Tables.region(spark, d), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA").select("n_name").as[String].collect().toSet
    val q5 = RelationalOps.regionalSupplierVolume(spark, d).collect()
    assert(q5.forall(r => asiaNations.contains(r.getAs[String]("n_name"))))
    val brute = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, d), col("l_suppkey") === col("s_suppkey"))
      .where(col("c_nationkey") === col("s_nationkey") &&
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .join(Tables.nation(spark, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, d), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    q5.foreach { r =>
      assert(math.abs(r.getAs[Double]("revenue") - brute(r.getAs[String]("n_name"))) < 0.02)
    }
    // q7: no same-nation pairs, years within the window.
    val q7 = RelationalOps.nationTradeVolume(spark, d).collect()
    assert(q7.nonEmpty)
    assert(q7.forall(r => r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation")))
    assert(q7.forall(r => Set(1996, 1997).contains(r.getAs[Int]("yr"))))
    // q8: share in [0,100], nation_revenue <= total_revenue.
    val q8 = RelationalOps.nationMarketShare(spark, d).collect()
    assert(q8.nonEmpty)
    q8.foreach { r =>
      assert(r.getAs[Double]("nation_revenue") <= r.getAs[Double]("total_revenue") + 1e-9)
      val sh = r.getAs[Double]("mkt_share")
      assert(sh >= 0.0 && sh <= 100.0)
    }
  }

  test("q15/q17/q4/q19: top-supplier max, micro-order bound, late-order semi-join") {
    val d = sf0001
    // q15: the reported revenue IS the max over the per-supplier rollup,
    // and every tied supplier appears.
    val window = Tables.lineitem(spark, d)
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("rev"))
    val mx = window.agg(max(col("rev"))).collect()(0).getDouble(0)
    val q15 = RelationalOps.topSupplierByRevenue(spark, d).collect()
    assert(q15.nonEmpty)
    assert(q15.forall(_.getAs[Double]("total_revenue") == mx))
    assert(q15.length ===
      window.where(col("rev") === mx).count().toInt, "all ties surface")
    // q17: single row, non-negative, bounded by total brand revenue / 7.
    val brandTotal = Tables.lineitem(spark, d)
      .join(Tables.part(spark, d).where(col("p_brand") === "Brand#13"),
        col("l_partkey") === col("p_partkey"))
      .agg(sum("l_extendedprice")).collect()(0).getDouble(0)
    val q17 = RelationalOps.smallQuantityRevenue(spark, d).collect()
    assert(q17.length === 1)
    val yearly = q17(0).getAs[Double]("avg_yearly")
    assert(yearly >= 0.0 && yearly <= brandTotal / 7.0 + 1e-6)
    // q4: per-priority counts sum to the number of distinct late orders.
    val q4 = RelationalOps.latePriorityOrders(spark, d).collect()
    val lateOrders = Tables.orders(spark, d)
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00")))
      .join(Tables.lineitem(spark, d), col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(q4.map(_.getAs[Long]("n_orders")).sum === lateOrders)
    // q16: segment supplier counts are bounded by the supplier population.
    val nSupp = Tables.supplier(spark, d).count()
    val q16 = RelationalOps.supplierDiversity(spark, d).collect()
    assert(q16.nonEmpty)
    assert(q16.forall(r => r.getAs[Long]("n_suppliers") > 0 &&
      r.getAs[Long]("n_suppliers") <= nSupp))
    // q20: every family part with any shipment elects exactly one leader.
    val q20 = RelationalOps.dominantSuppliers(spark, d).collect()
    val famParts = Tables.lineitem(spark, d)
      .join(Tables.part(spark, d).where(col("p_name").contains("gear")),
        col("l_partkey") === col("p_partkey"))
      .select("l_partkey").distinct().count()
    assert(q20.map(_.getAs[Long]("n_led_parts")).sum === famParts)
    assert(q20.forall { r =>
      val sh = r.getAs[Double]("mean_led_share")
      sh > 0.0 && sh <= 1.0
    })
    // q11: every survivor clears 1.5x the average part revenue (brute check).
    val q11 = RelationalOps.importantParts(spark, d).collect()
    val perPart = Tables.lineitem(spark, d)
      .groupBy("l_partkey").agg(sum("l_extendedprice").as("rev"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cut = 1.5 * perPart.values.sum / perPart.size
    assert(q11.nonEmpty)
    q11.foreach(r =>
      assert(r.getAs[Double]("revenue") > cut - 0.02,
        s"part below the 1.5x-average bar: ${r}"))
    assert(q11.length >= perPart.values.count(_ > cut + 0.02),
      "no clearly-qualifying part may be dropped (cent-rounding slack)")
    // q21: a sole-late supplier count never exceeds that supplier's late orders.
    val q21 = RelationalOps.soleLateSuppliers(spark, d).collect()
    val lateBySupp = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_suppkey").agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q21.length <= 10)
    q21.foreach { r =>
      val c = r.getAs[Long]("n_waiting_orders")
      assert(c > 0 && c <= lateBySupp(r.getAs[Long]("s_suppkey")))
    }
    // changepoints: ≤3 per type, shift consistent with its two means.
    val cp = TimeSeriesOps.changepoints(spark, d).collect()
    assert(cp.nonEmpty)
    cp.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      rs.foreach { r =>
        val want = math.abs(r.getAs[Double]("after_avg") - r.getAs[Double]("before_avg"))
        assert(math.abs(r.getAs[Double]("shift") - want) < 1e-6)
      }
    }
    // forecast: MAE dominates |bias|; every type has held-out hours.
    val fc = TimeSeriesOps.forecastBacktest(spark, d).collect()
    assert(fc.nonEmpty)
    fc.foreach { r =>
      assert(r.getAs[Long]("n_test_hours") > 0)
      assert(r.getAs[Double]("mae") >= math.abs(r.getAs[Double]("bias")) - 1e-9)
    }
    // q19: disjunctive-band revenue is a subset of all-bands brand revenue.
    val q19 = RelationalOps.disjunctiveBandRevenue(spark, d).collect()
    assert(q19.length === 1)
    val bandRev = q19(0).getAs[Double]("revenue")
    val brandsRev = Tables.lineitem(spark, d)
      .join(Tables.part(spark, d)
          .where(col("p_brand").isin("Brand#13", "Brand#7", "Brand#20")),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .collect()(0).getDouble(0)
    assert(bandRev >= 0.0 && bandRev <= brandsRev + 1e-6)
  }

  test("distinctMergeAudit: union dedups group overlap a naive sum cannot") {
    val r = RelationalOps.distinctMergeAudit(spark, sf0001).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("n_groups") === 3L) // A/N/R flags
    val sumGroups = row.getAs[Long]("sum_group_exact")
    val global = row.getAs[Long]("global_exact")
    // parts recur under several flags: the naive per-group sum
    // double-counts them, the merged sketch must not
    assert(sumGroups > global, s"fixture has no overlap? $sumGroups vs $global")
    assert(row.getAs[Boolean]("merged_ok"))
    // cross-check the exact global against an independent count
    val expected = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().count()
    assert(global === expected)
  }
}
