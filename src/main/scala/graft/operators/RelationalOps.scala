package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational extension pack over the star schema (SURVEY.md §2.3).
  *
  * The reference has no joins/group-by/windows at all (SURVEY §2.2); this
  * pack supplies the full relational surface a log-analytics user needs,
  * expressed declaratively so Catalyst handles pushdown, join reordering,
  * and AQE does runtime re-planning.
  *
  * Scale notes:
  *  - Dimension tables (region 5 rows → customer 1.5M at SF100) are
  *    broadcast explicitly where they are guaranteed small; the
  *    customer-side join is left to AQE, which converts it to broadcast
  *    when the runtime size qualifies, and falls back to shuffled hash
  *    join otherwise.
  *  - All aggregates are partial-agg friendly (sum/count/min/max/avg over
  *    groupBy) → map-side combine before the shuffle.
  *  - Windows partition on high-cardinality keys (custkey), so the sort is
  *    distributed, not global. Global top-k uses orderBy+limit which plans
  *    as TakeOrderedAndProject (O(k) per partition).
  */
object RelationalOps {

  private def r2(c: Column): Column = round(c, 2)
  private def r4(c: Column): Column = round(c, 4)

  // bounded memos for cut intermediates: a bare SessionCache.cut strands
  // its checkpoint RDD blocks when the frame goes out of scope (no
  // unpersist path until ContextCleaner GC); the LRU's onEvict=release
  // closes that window
  private val rfmRollupCache =
    new graft.SessionCache[org.apache.spark.sql.DataFrame](
      maxEntries = 4, onEvict = graft.SessionCache.release)
  private val distinctPairsCache =
    new graft.SessionCache[org.apache.spark.sql.DataFrame](
      maxEntries = 4, onEvict = graft.SessionCache.release)

  /** TPC-H Q1-shaped scan-heavy aggregate on lineitem: 2-col group key,
    * 8 aggregates, one shuffle after partial aggregation.
    */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        r4(avg(col("l_quantity"))).as("avg_qty"),
        r4(avg(col("l_extendedprice"))).as("avg_price"),
        r4(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q5-shaped 5-table join chain: fact table joins up the dimension
    * hierarchy. region/nation are tiny → explicit broadcast (no shuffle);
    * orders⋈customer and lineitem⋈orders shuffle on their keys (AQE may
    * broadcast customer at small SF).
    */
  def revenueByNation(s: SparkSession, d: String): DataFrame = {
    // lineitem⋈orders rides the session's bucketed orderkey layout when
    // available (zero-exchange co-bucketed join; plain scans otherwise —
    // no strategy hints, so the fallback plan is the r10 plan unchanged)
    val li = graft.plans.FactLayout.lineitemByOrderOpt(s, d)
      .getOrElse(Tables.lineitem(s, d))
    val o  = graft.plans.FactLayout.ordersByKeyOpt(s, d)
      .getOrElse(Tables.orders(s, d))
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
             col("o_orderdate") <  lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val c  = Tables.customer(s, d)
    val n  = broadcast(Tables.nation(s, d))
    val r  = broadcast(Tables.region(s, d).where(col("r_name") === "ASIA"))
    li.join(hashBuildIfBig(o), col("l_orderkey") === col("o_orderkey"))
      .join(hashBuildIfBig(c), col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Left-semi join: customers in a segment that placed at least one urgent
    * order (EXISTS). Semi-join keeps only the probe side → no row
    * multiplication, shuffle carries just the join key from the build side.
    */
  def customersWithUrgentOrders(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join: customers with NO order since 2001 (NOT EXISTS). */
  def dormantCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2001-01-01 00:00:00")))
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** ROLLUP over (returnflag, linestatus): hierarchical subtotals in one
    * pass (Spark expands grouping sets, still partial-agg friendly).
    * Grouping-null columns are coalesced to a sentinel so the output has no
    * NULL ordering/hashing ambiguity between engines.
    */
  def rollupReturns(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Explicit GROUPING SETS — the asymmetric member of the grouping
    * family ([[rollupReturns]] / [[cubeReturns]] are its prefix/powerset
    * specializations): per-flag totals, per-status totals, and the grand
    * total, WITHOUT the (flag, status) cross table a cube would add.
    * Spark's Dataset API exposes only rollup/cube, so this goes through
    * the SQL surface — one Expand + one aggregation, same physical shape.
    */
  def groupingSetsReturns(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
    s.sql(
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM graft_lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** CUBE over (returnflag, linestatus): all 4 grouping sets in one pass —
    * the full grouping-sets surface next to rollupReturns' hierarchy.
    */
  def cubeReturns(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(r2(sum(col("l_quantity"))).as("sum_qty"),
           r2(avg(col("l_extendedprice"))).as("avg_price"),
           count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("sum_qty"), col("avg_price"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Exact interpolated percentiles per group (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). At 100 TB swap for `approx_percentile` — kept exact
    * here for oracle parity; the query shape is identical.
    */
  def priceQuantiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        graft.functions.QuantilesAgg
          .quantiles(col("o_totalprice").cast("double"), Seq(0.5, 0.95))
          .as("qs"),
        count(lit(1)).as("n"))
      .select(col("o_orderpriority"),
        r2(element_at(col("qs"), 1)).as("p50"),
        r2(element_at(col("qs"), 2)).as("p95"),
        col("n"))
      .orderBy(col("o_orderpriority"))

  /** Ranking window: top-3 orders per customer by value. Partitioned by
    * custkey → the sort is per-customer within shuffle partitions, never
    * global; at 100 TB this is the standard distributed top-n-per-group.
    */
  def top3OrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Analytic window: running revenue per customer in order-date order. */
  def runningRevenue(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .where(col("o_custkey") <= 100)
      .select(
        col("o_custkey"), col("o_orderkey"),
        r2(sum(col("o_totalprice")).over(w)).as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** TPC-H Q12 shape: the conditional-aggregation-over-a-join pattern
    * (CASE inside SUM), with the high/low priority split computed in one
    * pass instead of two filtered scans. The fixture has no `l_shipmode`
    * column, so `l_returnflag` stands in as the grouping dimension — the
    * SHAPE (filtered fact join + two conditional counts per group) is
    * what's exercised. Lineitem filters push to the scan; orders joins
    * the already-filtered slice.
    */
  def shipmodePriority(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
             col("l_shipdate") <  lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
      .select(col("l_orderkey"), col("l_returnflag"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q22 shape: "missed opportunity" — customers above the average
    * balance with no urgent order. Composes the two decorrelation
    * patterns: a scalar subquery (the global average, reduced to a 1-row
    * broadcast) and an anti join. The orders side filters BEFORE the anti
    * join and carries only its key column. (The textbook Q22 predicate
    * "no orders at all" is empty on this fixture — the generator gives
    * every customer orders — so the anti-join side is the urgent slice.)
    */
  def idleRichCustomers(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val avgBal = cust.where(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    cust
      .crossJoin(broadcast(avgBal)) // 1 row
      // boundary ROUNDED before the compare (the RFM stance): the raw
      // double average is an order-dependent sum, and a balance within
      // one ulp of it would classify differently across engines
      .where(col("c_acctbal") > round(col("avg_bal"), 2))
      .join(Tables.orders(s, d)
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Deterministic arg-max aggregate: per nation, the customer holding the
    * maximum account balance — the "which row achieved this extreme"
    * shape. `max(struct(value, key))` makes the answer DETERMINISTIC under
    * value ties (struct ordering tie-breaks on the key) where a bare
    * max_by picks an arbitrary winner; one partial-agg rollup on the
    * nation key, carrying a 2-field struct instead of the row.
    */
  def topCustomerPerNation(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        max(struct(col("c_acctbal"), col("c_custkey"))).as("best"),
        count(lit(1)).as("n_customers"),
        // exact integer cents, not avg(double) (r14 green-tree fix): the
        // float mean is an ORDER-DEPENDENT sum, and the sf0.001 fixture
        // lands NATION_17's mean exactly on a half-cent boundary — Spark
        // and DuckDB rounded to different cents (4201.32 vs 4201.31).
        // Quantize first (2-dp currency ⇒ cents are exact longs), sum
        // exactly, divide half-up once — the Num.halfUpDiv convention
        // every quantized mean in this engine uses; the twin replays the
        // identical integer arithmetic.
        sum(round(col("c_acctbal") * 100, 0).cast("long")).as("balq"))
      .select(
        col("n_name"), col("best.c_custkey").as("top_custkey"),
        round(col("best.c_acctbal"), 2).as("top_acctbal"),
        col("n_customers"),
        (Num.halfUpDiv(col("balq"), col("n_customers")).cast("double") / 100.0)
          .as("avg_acctbal"))
      .orderBy(col("n_name"))

  /** RANGE-frame moving aggregate: per-customer trailing-30-day order
    * revenue and count at each order — the time-based sibling of
    * [[runningRevenue]]'s ROWS frame. RANGE frames bound the window by the
    * ORDER-BY VALUE (orders in the last 30 days), not a row count, so
    * bursty and sparse customers get the same temporal semantics. One
    * shuffle on the (high-cardinality) customer key; the frame is
    * evaluated in-sort with constant state — nothing beyond the window
    * sort touches the data. Epoch-ms keys keep the bound integer-exact on
    * both engines.
    */
  def movingRevenue(s: SparkSession, d: String): DataFrame = {
    val dayMs = 86400000L
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("ms"))
      .rangeBetween(-30L * dayMs, 0L)
    Tables.orders(s, d)
      .where(col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_totalprice"))
      .select(
        col("o_custkey"), col("o_orderkey"), col("ms"),
        count(lit(1)).over(w).as("n_30d"),
        r2(sum(col("o_totalprice")).over(w)).as("rev_30d"))
      .orderBy(col("o_custkey"), col("ms"), col("o_orderkey"))
  }

  /** Global top-k: 10 most expensive orders → TakeOrderedAndProject. */
  def topOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Set ops: customers ordering in BOTH 1995 and 1996 (intersect), and in
    * 1995 but not 1996 (except), tagged and unioned into one result.
    *
    * Semantically INTERSECT/EXCEPT/UNION, but planned as conditional
    * aggregation: ONE scan of the two-year slice, ONE shuffle on custkey
    * with map-side partial max() of the membership flags, then a CASE on
    * the flags. The literal intersect/except form plans as 2 scans + 4+
    * key shuffles for the identical result — pure waste at 100 TB.
    */
  def buyerCohorts(s: SparkSession, d: String): DataFrame = {
    val y95 = lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))
    val y96 = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
    val y97 = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
    Tables.orders(s, d)
      .where(col("o_orderdate") >= y95 && col("o_orderdate") < y97)
      .groupBy(col("o_custkey"))
      .agg(
        max(when(col("o_orderdate") < y96, 1).otherwise(0)).as("in95"),
        max(when(col("o_orderdate") >= y96, 1).otherwise(0)).as("in96"))
      .where(col("in95") === 1)
      .select(
        col("o_custkey"),
        when(col("in96") === 1, lit("both")).otherwise(lit("only_1995")).as("cohort"))
      .orderBy(col("cohort"), col("o_custkey"))
  }

  /** Multi-distinct aggregate: exact distinct counts per return flag.
    * (At 100 TB prefer approx_count_distinct; exact kept here for oracle
    * parity — Spark plans multi-distinct via expand, one extra shuffle.)
    */
  def distinctPartsPerFlag(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** HyperLogLog++ calibration audit — the 100 TB form of
    * distinctPartsPerFlag, made driver-checkable (VERDICT r5 #2): the raw
    * HLL estimate is engine-specific, so the PUBLISHED columns are the
    * exact counts plus a tolerance VERDICT (estimate within ±5% of exact —
    * generous vs the sketch's configured 1% rsd). The oracle recomputes
    * the exact counts and asserts the verdicts true, so the sketch's
    * accuracy contract is hash-verified even though its bits can't be.
    * (The exact side is the audit's yardstick — production runs this on a
    * sample; the estimate-only scan is the scale path.)
    */
  def distinctPartsApprox(s: SparkSession, d: String): DataFrame = {
    // ONE scan, no Expand (two prior drafts preserved in spirit: 4 aggs in
    // one groupBy = Expand ×3 over every row, 4.5 s; per-side distinct
    // rollups + separate HLL pass = 3 scans of the fact table, 1.8 s).
    // Unpivot each row to two narrow (flag, kind, key) tuples, dedup them
    // (partials collapse map-side — shuffle is Σ distinct keys, the exact
    // answer's floor), then compute BOTH the exact counts and the sketches
    // off the deduplicated set: HLL registers are duplicate-insensitive
    // maxima, so approx_count_distinct over the distinct keys is
    // bit-identical to running it over the raw fact table — while touching
    // |distinct| rows instead of |fact|. 0.6 s at sf0.1.
    val up = Tables.lineitem(s, d)
      .select(col("l_returnflag"), explode(array(
        struct(lit("p").as("kind"), col("l_partkey").as("key")),
        struct(lit("s").as("kind"), col("l_suppkey").as("key")))).as("e"))
      .select(col("l_returnflag"), col("e.kind"), col("e.key"))
      .distinct()
    // DataSketches HLL (hll_sketch_agg), not approx_count_distinct: the
    // HLL++ buffer at rsd=0.01 is 2^14 registers flattened into every
    // UnsafeRow aggregation buffer — measured 0.9 s of pure buffer tax on
    // THREE groups. The sketch agg keeps one compact object per group
    // (0.45 s full query), and at lgK=14 its HIP estimate lands within
    // 0.6% of exact here — well inside the published ±5% verdict.
    up.groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("kind") === "p", 1L).otherwise(0L)).as("n_parts"),
        sum(when(col("kind") === "s", 1L).otherwise(0L)).as("n_supps"),
        expr("hll_sketch_estimate(" +
          "hll_sketch_agg(CASE WHEN kind='p' THEN key END, 14))").as("pa"),
        expr("hll_sketch_estimate(" +
          "hll_sketch_agg(CASE WHEN kind='s' THEN key END, 14))").as("sa"))
      .select(
        col("l_returnflag"), col("n_parts"), col("n_supps"),
        (abs(col("pa") - col("n_parts")).cast("double") <=
          col("n_parts") * 0.05).as("parts_ok"),
        (abs(col("sa") - col("n_supps")).cast("double") <=
          col("n_supps") * 0.05).as("supps_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Sketch-MERGEABILITY audit — the property [[distinctPartsApprox]]
    * exercises implicitly, made explicit and checked: per-group HLL
    * sketches built independently (as 1000 executors would), UNIONED
    * into one global sketch, and the merged estimate verified against
    * the exact global distinct. This is the algebraic contract that
    * makes sketch rollups distributable at all (per-shard summaries
    * compose without revisiting rows); the output also carries
    * Σ per-group exact vs global exact — the overlap a naive
    * sum-of-groups "merge" double-counts and the sketch union must not.
    *
    * Plan: ONE dedup pass of (flag, partkey) feeds per-group exact
    * counts, per-group sketches, AND the global exact (HLL registers
    * are duplicate-insensitive, the distinctPartsApprox move); the
    * union stage aggregates 3 sketch objects.
    */
  def distinctMergeAudit(s: SparkSession, d: String): DataFrame = {
    val dd = distinctPairsCache.getOrElseUpdate(s, d) { (ss, dir) =>
      graft.SessionCache.cut(Tables.lineitem(ss, dir)
        .select(col("l_returnflag"), col("l_partkey")).distinct())
    }
    val per = dd.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_exact"),
        expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
    val merged = per.agg(
      count(lit(1)).as("n_groups"),
      sum(col("n_exact")).as("sum_group_exact"),
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val globalExact = dd.select(col("l_partkey")).distinct()
      .agg(count(lit(1)).as("global_exact"))
    merged.crossJoin(broadcast(globalExact)) // 1 row × 1 row
      .select(col("n_groups"), col("sum_group_exact"), col("global_exact"),
        (abs(col("est") - col("global_exact")).cast("double") <=
          col("global_exact") * 0.05).as("merged_ok"))
  }

  /** Approx-percentile calibration audit — the 100 TB form of
    * priceQuantiles, made driver-checkable (VERDICT r5 #2): published
    * columns are the exact percentiles plus a tolerance VERDICT (sketch
    * estimate within ±1% of exact — loose vs the accuracy-1000 rank
    * guarantee on these group sizes). Same stance as
    * [[distinctPartsApprox]].
    */
  def priceQuantilesApprox(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        graft.functions.QuantilesAgg
          .quantiles(col("o_totalprice").cast("double"),
            Seq(0.5, 0.95, 0.45, 0.55, 0.90, 1.0))
          .as("eqs"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("pa"),
        expr("approx_percentile(o_totalprice, 0.95, 1000)").as("sa"))
      .select(col("o_orderpriority"),
        r2(element_at(col("eqs"), 1)).as("p50"),
        r2(element_at(col("eqs"), 2)).as("p95"),
        col("pa"), col("sa"),
        col("eqs"))
      .select(
        col("o_orderpriority"), col("p50"), col("p95"),
        // verdict = value tolerance OR ±5%-RANK window (r14 green-tree
        // fix): a sketch percentile is a DATA VALUE, so on sparsely
        // spaced data the honest contract is rank error, not value
        // error — at sf0.001 one ~1%-wide gap between the two middle
        // '2-HIGH' prices flipped the value-only verdict while the
        // sketch was rank-EXACT. The rank window [q(p−0.05), q(p+0.05)]
        // is loose vs the accuracy-1000 guarantee (±0.1% rank) at every
        // scale; the value branch is kept so every case the old audit
        // certified stays certified.
        (abs(col("pa") - col("p50")) <= col("p50") * 0.01 ||
          col("pa").between(element_at(col("eqs"), 3), element_at(col("eqs"), 4)))
          .as("p50_ok"),
        (abs(col("sa") - col("p95")) <= col("p95") * 0.01 ||
          col("sa").between(element_at(col("eqs"), 5), element_at(col("eqs"), 6)))
          .as("p95_ok"))
      .orderBy(col("o_orderpriority"))

  /** Correlated scalar subquery through the SQL interface: parts priced
    * above their brand's average. Catalyst decorrelates this into an
    * aggregate + join (no per-row re-execution), so it scales like the
    * explicit-join form — demonstrated via the engine's SQL surface.
    */
  def partsAboveBrandAvg(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("graft_part")
    s.sql(
      """SELECT p.p_partkey, p.p_brand, round(p.p_retailprice, 2) AS price
        |FROM graft_part p
        |WHERE p.p_retailprice > (SELECT avg(p2.p_retailprice) * 1.05
        |                         FROM graft_part p2
        |                         WHERE p2.p_brand = p.p_brand)
        |ORDER BY p.p_partkey""".stripMargin)
  }

  /** Analytic window functions beyond rank/sum: lead/lag navigation,
    * ntile bucketing, percent_rank — per-customer order timelines.
    */
  def orderTimeline(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .where(col("o_custkey") <= 50)
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        first(col("o_orderkey")).over(w).as("first_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** As-of join: for each error event, the most recent strictly-prior click
    * of the same user.
    *
    * Implemented scale-first with the union + last-value-carried-forward
    * trick instead of a range join: tag both streams, sort per user on
    * (ts, event_id), carry the last click id/ts forward with an
    * ignore-nulls window — one shuffle on user_id, zero row explosion.
    * A naive `e.ts >= c.ts` range join is O(errors × clicks) per user and
    * dies at scale; this is O(n log n) per user partition.
    */
  def lastClickBeforeError(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .where(col("event_type").isin("error", "click"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
      // For an error row click_id is NULL, so the running ignore-nulls last
      // already means "most recent strictly-prior click" at that row.
      .withColumn("prior_click_id",
        last(col("click_id"), ignoreNulls = true).over(w))
      .where(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("prior_click_id"))
      .orderBy(col("event_id"))
  }

  /** Orders-per-customer distribution (the TPC-H Q13 shape): how many
    * customers placed 0, 1, 2, … orders — the outer-join histogram that
    * needs customers with NO orders to appear as the zero bin.
    *
    * Plan: orders pre-aggregate to per-custkey counts BEFORE the join —
    * the join's right side is one row per customer, not one per order
    * (joining raw orders first would shuffle the full fact table wide and
    * count after). The left join fills the zero bin via coalesce, and the
    * final histogram rollup is |distinct counts| rows.
    */
  def orderCountDistribution(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("c_count"))
    Tables.customer(s, d)
      .select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("c_count"))
  }

  /** TPC-H Q6 shape: pure predicate-scan aggregate (the "what would this
    * discount change have earned" query). Everything pushes to the scan —
    * the plan is filter + one partial-agg reduce, zero wide shuffles; the
    * canonical demonstration that a selective aggregate costs one pass.
    */
  def discountRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.08 &&
        col("l_quantity") < 24)
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue_effect"))

  /** TPC-H Q3 shape: shipping-priority top-10 — the 3-table join with a
    * group-by on the fact side and a value-ordered limit.
    *
    * Plan: customer filters BEFORE the join (column-pruned to the key),
    * orders⋈lineitem is the one fact-fact shuffle, and the final top-10 is
    * TakeOrderedAndProject over the grouped revenue — no global sort.
    */
  def shippingPriority(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1996-06-01 00:00:00"))
    val cust = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    // on the bucketed layout the filtered-customer join broadcasts (AQE,
    // small key-only slice) onto the orderkey-bucketed orders scan — the
    // streamed side keeps the bucket partitioning — so orders⋈lineitem
    // and the per-order rollup never exchange LINEITEM; over plain
    // parquet the r10 shuffle-hash form stands unchanged
    val liOpt = graft.plans.FactLayout.lineitemByOrderOpt(s, d)
    val ordOpt = graft.plans.FactLayout.ordersByKeyOpt(s, d)
    val ord = ordOpt.getOrElse(Tables.orders(s, d))
      .where(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = liOpt.getOrElse(Tables.lineitem(s, d))
      .where(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val co = cust.join(ord, col("c_custkey") === col("o_custkey"))
    (if (liOpt.isDefined && ordOpt.isDefined) co
     else hashBuildIfBig(co, sizer = Tables.orders(s, d)))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"))
      .agg(round(sum(col("rev")), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(k)
  }

  /** TPC-H Q18 shape: large-volume customers — orders whose total line
    * quantity exceeds a threshold, attributed to their customer. The
    * canonical AGGREGATE-BEFORE-JOIN pattern: the lineitem rollup reduces
    * the fact table to (rare) qualifying order keys BEFORE any join, so
    * the orders/customer joins only ever see the qualifying slice — a
    * join-first plan would shuffle the full fact table twice. The final
    * top-100 is a value-ordered limit (TakeOrderedAndProject, no global
    * sort); ties break on the order key so the cut is deterministic.
    */
  def largeVolumeCustomers(
      s: SparkSession, d: String, minQty: Double = 200.0): DataFrame = {
    // the per-order rollup and the orders join both ride the bucketed
    // orderkey layout when available (zero lineitem/orders exchanges);
    // the plain scans keep the identical aggregate-before-join plan
    val big = graft.plans.FactLayout.lineitemByOrderOpt(s, d)
      .getOrElse(Tables.lineitem(s, d))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .where(col("qty") > minQty)
    graft.plans.FactLayout.ordersByKeyOpt(s, d)
      .getOrElse(Tables.orders(s, d))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"),
        col("o_totalprice"), round(col("qty"), 2).as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  /** IQR outlier audit per group (Tukey fences): quartiles, the
    * 1.5×IQR fences, and how many rows fall outside them — the numeric
    * anomaly screen of the profiling pack ([[profileOf]] finds nulls and
    * ranges; this finds the suspicious tail mass).
    *
    * Plan: pass 1 reduces each group to its quartiles/fences (a
    * |groups|-sized table that broadcasts back); pass 2 is one
    * conditional rollup of members against their group's fences. Two
    * scans, |groups|-bounded intermediate state, no wide shuffle beyond
    * the grouped partial aggregates.
    */
  def outlierAudit(s: SparkSession, d: String): DataFrame = {
    val q = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.QuantilesAgg
        .quantiles(col("o_totalprice").cast("double"), Seq(0.25, 0.75))
        .as("qq"))
      .select(col("o_orderpriority"),
        element_at(col("qq"), 1).as("q1"), element_at(col("qq"), 2).as("q3"))
      .select(col("o_orderpriority"), col("q1"), col("q3"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo_fence"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi_fence"))
    Tables.orders(s, d)
      .join(broadcast(q), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        round(first(col("q1")), 2).as("q1"),
        round(first(col("q3")), 2).as("q3"),
        sum(when(col("o_totalprice") < col("lo_fence"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("o_totalprice") > col("hi_fence"), 1L).otherwise(0L)).as("n_high"))
      .orderBy(col("o_orderpriority"))
  }

  /** Equi-width histogram of order totals over FIXED bounds — the
    * data-profiling companion to the exact/approx percentiles: fixed
    * bounds keep the bucket function a pure per-row expression (no
    * data-dependent min/max pass), so the whole plan is one
    * partial-aggregated rollup of ≤ `bins`+1 keys.
    */
  def priceHistogram(s: SparkSession, d: String,
      lo: Double = 0d, hi: Double = 600000d, bins: Int = 20): DataFrame = {
    val width = (hi - lo) / bins
    val bucket = least(floor((col("o_totalprice") - lo) / width), lit(bins - 1))
      .cast("int")
    Tables.orders(s, d)
      .groupBy(bucket.as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo_price"),
        round(max(col("o_totalprice")), 2).as("hi_price"))
      .withColumn("bucket_lo", round(lit(lo) + col("bucket") * width, 2))
      .orderBy(col("bucket"))
  }

  /** Referential-integrity audit over the star schema: violation counts
    * for each foreign-key edge (orphan facts, childless parents, dangling
    * dimension keys) — the data-quality gate a pipeline runs after every
    * load. All-zero rows are the PASSING result and are emitted (absence
    * of a check is not the same as a passing check).
    *
    * Plan: each check is an anti-join whose dimension side broadcasts
    * (explicitly for the small dims, AQE otherwise); each reduces to a
    * 1-row count before the 4-row union.
    */
  def integrityAudit(s: SparkSession, d: String): DataFrame =
    integrityAuditOf(Tables.lineitem(s, d), Tables.orders(s, d),
      Tables.customer(s, d), Tables.nation(s, d))

  /** [[integrityAudit]] over arbitrary star-schema frames. */
  def integrityAuditOf(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame): DataFrame = {
    def violations(name: String, facts: DataFrame, factKey: String,
        dim: DataFrame, dimKey: String): DataFrame =
      facts.join(dim, col(factKey) === col(dimKey), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check"), col("n_violations"))
    violations("lineitem_without_order", lineitem, "l_orderkey",
        orders, "o_orderkey")
      .union(violations("order_without_lineitem", orders, "o_orderkey",
        lineitem, "l_orderkey"))
      .union(violations("order_without_customer", orders, "o_custkey",
        customer, "c_custkey"))
      .union(violations("customer_without_nation", customer, "c_nationkey",
        broadcast(nation), "n_nationkey"))
      .orderBy(col("check"))
  }

  /** RFM customer segmentation (recency / frequency / monetary quintiles) —
    * the classic mart rollup, built scale-first: the textbook `ntile(5)`
    * needs a GLOBAL sort per metric (one partition holds every customer);
    * instead, exact quintile BOUNDARIES reduce to one row that broadcasts,
    * and each customer scores with four comparisons per metric — same
    * buckets, no global sort at any customer count (boundary ties land in
    * the lower score on both engines).
    *
    * Plan: the only corpus-sized shuffle is the per-customer rollup of
    * orders; everything after runs on the customer dimension. Boundaries
    * are rounded to 4 dp on both engines before comparison so interpolated
    * quantiles can't flip a bucket at the last ulp.
    */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    // The per-customer rollup is cut ONCE: the reference-date row and the
    // 12-fence quantile row are both model-sized driver state (trainKmeans
    // contract), and as broadcast subtrees each re-ran the orders scan +
    // custkey shuffle under the single consumer action — three corpus
    // passes for one query. Now: one rollup job, two tiny collects over
    // the cut leaf, literals in the scoring pass. The cut routes through
    // the bounded memo (not a bare SessionCache.cut) so the checkpoint
    // blocks have a release path instead of stranding per invocation.
    val perCust = rfmRollupCache.getOrElseUpdate(s, d) { (ss, dir) =>
      graft.SessionCache.cut(Tables.orders(ss, dir)
        .groupBy(col("o_custkey"))
        .agg(
          max(unix_millis(col("o_orderdate").cast("timestamp"))).as("last_ms"),
          count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("monetary")))
    }
    val refRow = perCust.agg(max(col("last_ms"))).collect()(0)
    if (refRow.isNullAt(0)) {
      // no orders at all: contract-shaped empty result (the quantile
      // fences below would be null and every getDouble would NPE)
      return perCust.select(
        col("o_custkey").as("c_custkey"), lit(0).as("recency_days"),
        col("n_orders"), col("monetary"), lit(0).as("r"), lit(0).as("f"),
        lit(0).as("m"), lit(0).as("segment")).where(lit(false))
    }
    val refMs = refRow.getLong(0)
    val rc = perCust
      .select(
        col("o_custkey").as("c_custkey"),
        expr(s"(${refMs}L - last_ms) div 86400000").cast("int").as("recency_days"),
        col("n_orders"), col("monetary"))
    val fences = Seq(0.2, 0.4, 0.6, 0.8)
    def qs(metric: String, tag: String): Column =
      graft.functions.QuantilesAgg
        .quantiles(col(metric).cast("double"), fences).as(s"${tag}qs")
    def unpack(tag: String): Seq[Column] =
      Seq(20, 40, 60, 80).zipWithIndex.map { case (p, i) =>
        round(element_at(col(s"${tag}qs"), i + 1), 4).as(s"$tag$p") }
    val bounds = rc
      .agg(qs("recency_days", "r"), qs("n_orders", "f"), qs("monetary", "m"))
      .select(unpack("r") ++ unpack("f") ++ unpack("m"): _*)
      .collect()(0)
    def fence(tag: String, p: Int): Column =
      lit(bounds.getDouble(bounds.fieldIndex(s"$tag$p")))
    def scoreUp(v: Column, tag: String): Column =
      lit(1) + Seq(20, 40, 60, 80)
        .map(p => (v > fence(tag, p)).cast("int")).reduce(_ + _)
    def scoreDown(v: Column, tag: String): Column =
      lit(1) + Seq(80, 60, 40, 20)
        .map(p => (v < fence(tag, p)).cast("int")).reduce(_ + _)
    rc
      .select(
        col("c_custkey"), col("recency_days"), col("n_orders"), col("monetary"),
        scoreDown(col("recency_days"), "r").as("r"),
        scoreUp(col("n_orders"), "f").as("f"),
        scoreUp(col("monetary"), "m").as("m"))
      .withColumn("segment", col("r") * 100 + col("f") * 10 + col("m"))
      .orderBy(col("c_custkey"))
  }

  /** Column profiler — the engine's ANALYZE/describe surface: one result
    * row per column with row/null/exact-distinct counts and typed min/max
    * (numerics and timestamps land in `min_num`/`max_num` — timestamps as
    * epoch-ms — strings in `min_str`/`max_str`).
    *
    * Plan: TWO scans, no Expand. The first draft put all |cols|
    * countDistincts in one agg — Catalyst's multi-distinct rewrite is an
    * Expand ×(|cols|+1) whose first-phase GROUP KEYS are every profiled
    * column at once, and the string min/max aggregates force
    * SortAggregate, so 7× the table got fully SORTED on 7 columns twice
    * (2.3 s at sf0.1). Now: (1) a plain global-stats pass — no distinct
    * aggregates, so no Expand, and SortAggregate with empty grouping keys
    * needs no sort; (2) an unpivot pass — explode each row to |cols|
    * narrow (gid, typed-value) tuples, hash-distinct them (partials
    * collapse map-side), count per gid. Shuffle volume is Σ per-column
    * distinct values — the information-theoretic floor for exact
    * n_distinct — vs 7×|rows| sorted rows before. 0.6 s at sf0.1; the
    * 7-row joins broadcast. Values stay TYPED through the distinct
    * (timestamps as unix_micros longs, injective): casting doubles to
    * string would split -0.0/0.0, which both engines' DISTINCT unify.
    */
  def profileOrders(s: SparkSession, d: String): DataFrame =
    profileOf(Tables.orders(s, d), Seq("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))

  /** [[profileOrders]] over any frame and column subset. */
  def profileOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{NumericType, TimestampNTZType, TimestampType}
    val fields = cols.map(n => df.schema.fields.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no such column: $n")))
    def minMaxNum(name: String, f: Column => Column): Column =
      df.schema(name).dataType match {
        case _: NumericType => round(f(col(name)).cast("double"), 4)
        case _: TimestampType => f(unix_millis(col(name))).cast("double")
        // parquet timestamp[ms] reads as NTZ; session tz is UTC everywhere
        // in this library, so the cast is the identity instant
        case _: TimestampNTZType =>
          f(unix_millis(col(name).cast("timestamp"))).cast("double")
        case _ => lit(null).cast("double")
      }
    def minMaxStr(name: String, f: Column => Column): Column =
      df.schema(name).dataType match {
        case org.apache.spark.sql.types.StringType => f(col(name))
        case _ => lit(null).cast("string")
      }
    val aggExprs: Seq[Column] = count(lit(1)).as("__n") +: fields.flatMap { fd =>
      Seq(
        sum(when(col(fd.name).isNull, 1L).otherwise(0L)).as(s"${fd.name}__nulls"),
        minMaxNum(fd.name, min).as(s"${fd.name}__minn"),
        minMaxNum(fd.name, max).as(s"${fd.name}__maxn"),
        minMaxStr(fd.name, min).as(s"${fd.name}__mins"),
        minMaxStr(fd.name, max).as(s"${fd.name}__maxs"))
    }
    // Unpivot to (gid, v_long | v_dbl | v_str): one typed slot per column
    // kind so the distinct's group keys stay 4 narrow columns; NULL values
    // are dropped before grouping (countDistinct semantics).
    def slot(fd: org.apache.spark.sql.types.StructField, gid: Int): Column = {
      val nulL = lit(null).cast("long")
      val nulD = lit(null).cast("double")
      val nulS = lit(null).cast("string")
      val (vl, vd, vs) = fd.dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType =>
          (nulL, col(fd.name).cast("double"), nulS)
        // decimals keep full precision through the string slot — a long
        // cast would truncate the fraction and merge distinct values
        // (1.10 vs 1.25 → 1); a fixed-scale column renders injectively
        case _: org.apache.spark.sql.types.DecimalType =>
          (nulL, nulD, col(fd.name).cast("string"))
        case _: NumericType => (col(fd.name).cast("long"), nulD, nulS)
        case _: TimestampType => (unix_micros(col(fd.name)), nulD, nulS)
        case _: TimestampNTZType =>
          (unix_micros(col(fd.name).cast("timestamp")), nulD, nulS)
        case org.apache.spark.sql.types.DateType =>
          (datediff(col(fd.name), lit("1970-01-01").cast("date")).cast("long"),
            nulD, nulS)
        case _ => (nulL, nulD, col(fd.name).cast("string"))
      }
      struct(lit(gid).as("gid"), vl.as("v_long"), vd.as("v_dbl"),
        vs.as("v_str"), col(fd.name).isNull.as("vnull"))
    }
    val nd = df
      .select(explode(array(fields.zipWithIndex.map {
        case (fd, i) => slot(fd, i) }: _*)).as("e"))
      .where(!col("e.vnull"))
      .groupBy(col("e.gid").as("gid"), col("e.v_long"), col("e.v_dbl"),
        col("e.v_str"))
      .agg(count(lit(1)).as("__dup"))
      .groupBy(col("gid")).agg(count(lit(1)).as("n_distinct"))
    df.agg(aggExprs.head, aggExprs.tail: _*)
      .select(explode(array(fields.zipWithIndex.map { case (fd, i) => struct(
        lit(i).as("gid"),
        lit(fd.name).as("col_name"),
        col("__n").as("n_rows"),
        col(s"${fd.name}__nulls").as("n_nulls"),
        col(s"${fd.name}__minn").as("min_num"),
        col(s"${fd.name}__maxn").as("max_num"),
        col(s"${fd.name}__mins").as("min_str"),
        col(s"${fd.name}__maxs").as("max_str")) }: _*)).as("p"))
      .select(col("p.*"))
      .join(broadcast(nd), Seq("gid"), "left")
      .select(
        col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .orderBy(col("col_name"))
  }

  /** TPC-H Q14 shape: promo revenue share per ship month — the conditional
    * numerator/denominator pair computed in ONE pass (CASE-inside-SUM, the
    * [[shipmodePriority]] stance: two filtered scans would read the fact
    * table twice).
    *
    * Plan: part is a dimension (|parts| ≪ |lineitem|) and broadcasts; the
    * fact table crosses exactly one exchange — the month rollup, whose key
    * space is |months|, so partials collapse map-side. Share is derived
    * from the two rounded sums with one double expression, identical on
    * both engines.
    */
  def promoRevenueShare(s: SparkSession, d: String): DataFrame = {
    val promoPart = Tables.part(s, d)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).as("ship_month"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(broadcast(promoPart), col("l_partkey") === col("p_partkey"))
      .groupBy(unix_millis(col("ship_month").cast("timestamp")).as("month_ms"))
      .agg(
        round(sum(when(col("is_promo"), col("rev")).otherwise(lit(0.0))), 2)
          .as("promo_revenue"),
        round(sum(col("rev")), 2).as("revenue"))
      .select(col("month_ms"), col("promo_revenue"), col("revenue"),
        round(lit(100.0) * col("promo_revenue") / col("revenue"), 4)
          .as("promo_share"))
      .orderBy(col("month_ms"))
  }

  /** TPC-H Q2 shape (fixture-adapted: no partsupp table — the part/supplier
    * price relation lives in lineitem): the cheapest supplier per part by
    * observed unit price, with the supplier's nation/region denormalized.
    *
    * Plan: ONE aggregation — `min(struct(price, suppkey))` per part over
    * raw lineitem. The lexicographic struct min over all of a part's rows
    * equals the two-stage per-supplier-then-global form (smallest price,
    * ties to the smallest suppkey), but partial aggregation map-side
    * combines it in the same pass, so the fact table crosses ONE
    * part-keyed exchange carrying a 2-field struct (a pre-rollup to
    * (part, supplier) minima first was measured at 2 exchanges / ~2× the
    * time for identical results). Tie-break is deterministic where a bare
    * min + join-back would not be ([[topCustomerPerNation]] stance).
    * Dimensions broadcast.
    */
  def minCostSupplier(s: SparkSession, d: String): DataFrame = {
    // the part-keyed rollup rides the PARTKEY-bucketed lineitem when
    // available — zero fact exchange (plain scan keeps the r10 plan)
    val best = graft.plans.FactLayout.lineitemByPartOpt(s, d)
      .getOrElse(Tables.lineitem(s, d))
      .select(col("l_partkey"),
        struct(round(col("l_extendedprice") / col("l_quantity"), 6).as("pair_best"),
          col("l_suppkey")).as("cand"))
      .groupBy(col("l_partkey"))
      .agg(min(col("cand")).as("m"))
      .select(col("l_partkey"),
        col("m.pair_best").as("best_price"), col("m.l_suppkey").as("s_suppkey"))
    best
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey").as("sk"), col("s_name"), col("s_nationkey"))),
        col("s_suppkey") === col("sk"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("r_name"), col("best_price"))
      .orderBy(col("p_partkey"))
  }

  /** TPC-H Q10 shape: top customers by returned revenue in a quarter — the
    * "who is sending things back" triage list.
    *
    * Plan: both fact sides pre-filter BEFORE their join (returnflag on
    * lineitem, the date window on orders — both reach the scans as pushed
    * predicates); the orders⋈lineitem equi-join is the single fact-fact
    * shuffle, the per-customer rollup rides the same exchange shape, and
    * customer/nation broadcast onto the (small) aggregated slice. Top-k is
    * a value-ordered limit (TakeOrderedAndProject), ties on custkey.
    */
  def topReturnedCustomers(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    // both fact scans ride the bucketed orderkey layout when available:
    // the orders⋈lineitem join is co-bucketed (zero exchange), leaving
    // the per-customer rollup as the only fact shuffle — and it carries
    // the filtered+joined slice, not raw lineitem
    val liOpt = graft.plans.FactLayout.lineitemByOrderOpt(s, d)
    val ordOpt = graft.plans.FactLayout.ordersByKeyOpt(s, d)
    val ret = liOpt.getOrElse(Tables.lineitem(s, d))
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val ord = ordOpt.getOrElse(Tables.orders(s, d))
      .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"))
    (if (liOpt.isDefined && ordOpt.isDefined) ord else hashBuildIfBig(ord))
      .join(ret, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("rev")), 2).as("ret_revenue"), count(lit(1)).as("n_items"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("ret_revenue"), col("n_items"))
      .orderBy(col("ret_revenue").desc, col("c_custkey"))
      .limit(k)
  }

  private def ts(day: String) = lit(java.sql.Timestamp.valueOf(s"$day 00:00:00"))

  /** Prefer a shuffled-hash build on `df` ONLY when it is too big to
    * broadcast: an unconditional `hint("shuffle_hash")` outranks the
    * planner's size-based broadcast selection, so at small scale it
    * replaced a broadcast join with a full shuffle (measured: the r10
    * hinted queries regressed ~2× at sf0.1 while winning 30–40% at sf10).
    * Under the threshold the frame is left unhinted — AQE broadcasts it;
    * over it, SHJ skips the 60 M-row sort an SMJ would pay, falling back
    * to SMJ itself if a build partition outgrows memory. The estimate is
    * the optimizer's own file-size stat — driver-side, no job.
    */
  private def hashBuildIfBig(df: DataFrame, sizer: DataFrame = null): DataFrame = {
    // `sizer` overrides the measured frame when `df` is a join (join-stats
    // multiply out to garbage); pass the dominating base table instead
    val basis = if (sizer == null) df else sizer
    val bytes = basis.queryExecution.optimizedPlan.stats.sizeInBytes
    val thresh = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thresh > 0 && bytes <= BigInt(thresh)) df else df.hint("shuffle_hash")
  }

  /** TPC-H Q5 shape: revenue that stayed inside one region — customer and
    * supplier share a nation, the nation sits in the target region, orders
    * fall in one year.
    *
    * Plan: the region/nation filter collapses supplier to a slim broadcast
    * BEFORE the fact scan, so ~(1 - 1/|regions|) of lineitem is dropped by
    * the first (broadcast) join and never crosses an exchange. The only
    * shuffles are the two fact-side equi-joins (lineitem⋈orders on
    * orderkey, then ⋈customer on custkey — AQE may broadcast the shrunken
    * right sides at runtime); the same-nation predicate is a post-join
    * filter on two int columns. Final rollup key space is |nations|.
    */
  def regionalSupplierVolume(s: SparkSession, d: String,
      region: String = "ASIA"): DataFrame = {
    val supInRegion = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === region)
      .select(col("s_suppkey"), col("s_nationkey").as("sup_nk"), col("n_name"))
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1997-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(broadcast(supInRegion), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .where(col("c_nationkey") === col("sup_nk"))
      .groupBy(col("n_name"))
      .agg(r2(sum(col("rev"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q7 shape: cross-border trade volume — (supplier nation, customer
    * nation, ship year) revenue for all distinct nation pairs.
    *
    * Plan: supplier⋈nation is a broadcast stitched onto the lineitem scan
    * (year window pushed to the scan); orders carries custkey across the
    * one orderkey shuffle; customer⋈nation resolves the other endpoint.
    * The inequality (different nations) is a cheap post-join filter; the
    * rollup key space is |nations|² × 2 years, so partials collapse
    * map-side regardless of fact size.
    *
    * Determinism: with ~600+ distinct group cells the double sum lands on
    * a .xx5 cent boundary for SOME cell at SOME scale (observed at
    * sf0.01), so per-row revenue quantizes to integer 10⁻⁴-units and the
    * group sum is an exact long ([[graft.operators.DedupOps]]
    * sketchCalibration stance) — order-independent on both engines.
    */
  def nationTradeVolume(s: SparkSession, d: String): DataFrame = {
    val supNation = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val custNation = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("cust_nation"))
    graft.plans.FactLayout.lineitemByOrderOpt(s, d)
      .getOrElse(Tables.lineitem(s, d))
      .where(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("yr"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e4, 0)
          .cast("long").as("rev_q"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .join(graft.plans.FactLayout.ordersByKeyOpt(s, d)
          .getOrElse(Tables.orders(s, d))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("yr"))
      // half-up to cents in pure long arithmetic (rev is never negative):
      // a double division + round() here crosses engines' rounding modes
      // at exact half-cents — observed at sf0.01.
      .agg((((sum(col("rev_q")) + lit(50L)).cast("long") / lit(100L))
        .cast("long").cast("double") / 100.0).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("yr"))
  }

  /** TPC-H Q8 shape: one supplier nation's market share, per order year,
    * of all revenue delivered to customers in one region.
    *
    * Plan: the customer side is pre-filtered to the region via two
    * broadcast dims before touching facts; the supplier nation flag rides
    * the lineitem scan as a broadcast int→bool map. Numerator and
    * denominator come out of the SAME per-year rollup (CASE inside SUM),
    * so the fact table is read once and crosses one orderkey shuffle +
    * one |years|-key rollup; the fact-fact join hash-builds on the
    * region-pruned orders side (`shuffle_hash` — sorting 60 M lineitem
    * rows for an SMJ was 43% of the query at sf10, PERF_r10 §4; SHJ
    * falls back to SMJ when a build partition outgrows memory, so the
    * hint is a preference, not a scale hazard). Share derives from the
    * two rounded sums — deterministic across engines
    * ([[promoRevenueShare]] stance).
    */
  def nationMarketShare(s: SparkSession, d: String,
      region: String = "AMERICA", nation: String = "NATION_3"): DataFrame = {
    val custInRegion = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .where(col("r_name") === region)
      .select(col("c_custkey"))
    val supFlag = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), (col("n_name") === nation).as("is_target"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .join(custInRegion, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("yr"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(broadcast(supFlag), col("l_suppkey") === col("s_suppkey"))
      .join(hashBuildIfBig(ord, sizer = Tables.orders(s, d)),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("yr"))
      .agg(
        r2(sum(when(col("is_target"), col("rev")).otherwise(lit(0.0))))
          .as("nation_revenue"),
        r2(sum(col("rev"))).as("total_revenue"))
      .select(col("yr"), col("nation_revenue"), col("total_revenue"),
        r4(lit(100.0) * col("nation_revenue") / col("total_revenue"))
          .as("mkt_share"))
      .orderBy(col("yr"))
  }

  /** TPC-H Q9 shape (fixture-adapted: no partsupp → supply cost proxied as
    * half the part's retail price): profit on one product family by
    * supplier nation and ship year.
    *
    * Plan: the p_name predicate prunes part BEFORE broadcast, so the first
    * join drops all non-matching lineitem rows scan-side; supplier/nation
    * broadcast onto the survivors; single rollup over |nations|×|years|
    * keys. Zero fact-fact shuffles — the whole query is broadcast joins +
    * one partial-agg exchange.
    */
  def productFamilyProfit(s: SparkSession, d: String,
      family: String = "gear"): DataFrame = {
    val fam = Tables.part(s, d)
      .where(col("p_name").contains(family))
      .select(col("p_partkey"), col("p_retailprice"))
    val supNation = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        year(col("l_shipdate")).as("yr"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(broadcast(fam), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("yr"))
      .agg(r2(sum(col("rev") - lit(0.5) * col("p_retailprice") * col("l_quantity")))
        .as("profit"))
      .orderBy(col("n_name"), col("yr"))
  }

  /** TPC-H Q15 shape: the top supplier(s) by revenue in one quarter —
    * all suppliers tied at the maximum, not an arbitrary one.
    *
    * Plan: the quarter window is pushed to the lineitem scan; revenue per
    * supplier is one partial-agg shuffle on suppkey; the global max is a
    * 1-row broadcast cross-joined back (no single-partition window, no
    * driver collect). Supplier names broadcast onto the ≤handful of
    * surviving rows.
    */
  def topSupplierByRevenue(s: SparkSession, d: String): DataFrame = {
    val revs = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("total_revenue"))
    val mx = revs.agg(max(col("total_revenue")).as("mx"))
    revs.join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 shape: annualized revenue lost to micro-orders — lineitems
    * of one brand whose quantity is under 20% of that part's average
    * order quantity.
    *
    * Plan: the brand filter shrinks part to a slim broadcast FIRST, so
    * both passes over lineitem (the per-part average and the probe) only
    * keep brand rows — the correlated-subquery shape becomes one
    * partkey rollup re-broadcast onto the same pruned scan. The per-part
    * average is rounded to 6dp on both engines so the `<` threshold
    * compares identical decimals ([[minCostSupplier]] determinism stance).
    */
  def smallQuantityRevenue(s: SparkSession, d: String,
      brand: String = "Brand#13"): DataFrame = {
    val bparts = Tables.part(s, d).where(col("p_brand") === brand)
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(bparts), col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("l_partkey").as("ak"))
      .agg(round(avg(col("l_quantity")), 6).as("avg_qty"))
    li.join(broadcast(avgQty), col("l_partkey") === col("ak"))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(r2(sum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning both
    * join sides (brand × size × quantity bands).
    *
    * Plan: part broadcasts with only the rows any disjunct could accept;
    * the overall quantity envelope (≤ the max band) is pushed to the
    * lineitem scan as a simple range predicate, and the disjunction
    * evaluates post-join inside whole-stage codegen. One scalar output —
    * no shuffle beyond the final 1-row agg.
    */
  def disjunctiveBandRevenue(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
      .where((col("p_brand") === "Brand#13" && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#7") && col("p_size").between(1, 20) ||
        (col("p_brand") === "Brand#20") && col("p_size").between(1, 30))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    Tables.lineitem(s, d)
      .where(col("l_quantity") >= 1.0 && col("l_quantity") <= 30.0)
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1.0, 11.0)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10.0, 20.0)) ||
        (col("p_brand") === "Brand#20" && col("p_size").between(1, 30) &&
          col("l_quantity").between(20.0, 30.0)))
      .agg(r2(sum(col("rev"))).as("revenue"))
  }

  /** TPC-H Q4 shape (fixture-adapted: no commitdate → "late" means any
    * line shipped >90 days after the order date): order counts by priority
    * for a half-year of orders with at least one late line.
    *
    * Plan: EXISTS compiles to a LEFT SEMI join on orderkey with the
    * date-lag inequality as an extra join predicate — each order is
    * emitted at most once with no post-join dedup. The order-date window
    * is pushed to the orders scan; lineitem ships only (orderkey,
    * shipdate) across the one semi-join exchange; the rollup key space is
    * |priorities|.
    */
  def latePriorityOrders(s: SparkSession, d: String): DataFrame = {
    // EXISTS(l_shipdate > o_orderdate + 90d) ⟺ max(l_shipdate) per order
    // clears the bound, so the lineitem side rolls up to ONE (orderkey,
    // max_ship) row before any join — the shuffle carries |orders| narrow
    // pairs (4:1 partial-agg collapse map-side) instead of every lineitem
    // row through a non-equi semi join. The r9 semi-join spelling was the
    // one relational ratio that did NOT shrink sf1→sf10 (9.4×→10.9×);
    // this is the q21 pair-rollup stance applied to Q4.
    val perOrder = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("max_ship"))
    Tables.orders(s, d)
      .where(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1996-07-01"))
      .join(hashBuildIfBig(perOrder),
        col("o_orderkey") === col("l_orderkey"))
      .where(col("max_ship") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q21 shape (fixture-adapted: "late" = shipped >60 days after the
    * order date): suppliers solely responsible for delaying multi-supplier
    * orders — this supplier late, every co-supplier on time.
    *
    * Plan: the reference query is a double EXISTS/NOT-EXISTS self-join on
    * lineitem; here lateness only needs each (order, supplier) pair's MAX
    * shipdate. The whole chain runs on the BUCKETED fact layout
    * ([[graft.plans.FactLayout]]): lineitem and orders are bucketed on
    * their orderkey, so the scan's hash partitioning already satisfies
    * the (orderkey, suppkey) pair rollup, the orders join, and the
    * per-order verdict rollup — ZERO exchanges until the final
    * ≤|suppliers| rollup (r10 paid a full lineitem repartition here every
    * run; the layout pays it once per session — at cluster scale, once at
    * ingest). A TPC-H order has ≤7 lines so pre-shuffle partial
    * aggregation had nothing to collapse anyway. The verdict itself
    * needs no window:
    * an order with exactly ONE late supplier identifies that supplier
    * uniquely, so `max(when(was_late, suppkey))` captures it in the same
    * hash rollup that counts suppliers — the r9 sort-window spelling
    * (1.17 s at sf0.1, 4.1× twin at sf1) paid a second orderkey exchange
    * plus a per-partition sort for what a hash aggregate computes in one
    * pass. Supplier names broadcast onto the ≤|suppliers| rollup.
    */
  def soleLateSuppliers(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    // join BEFORE the pair rollup, as a merge join: both bucketed scans
    // arrive hash-distributed AND sorted on orderkey, so the SMJ is a
    // pure zero-exchange zero-sort streaming merge — no per-run broadcast
    // hashed-relation build (the r11 isolated-vs-suite probe showed that
    // build as the plan's GC-sensitive part). Lateness commutes with the
    // reorder: max(ship) > cutoff  ⟺  any line's ship > cutoff, so the
    // per-pair verdict is max of per-LINE verdicts.
    //
    // The merge hint is ONLY sound on the bucketed layout: over plain
    // parquet a forced SMJ pays full exchanges + sorts on both fact
    // tables EVERY run — the r11 driver-window 4.9 s q21 anomaly was
    // exactly this (layout build failed in that environment, the hint
    // stayed). When the layout is unavailable the query routes to the
    // r10 aggregate-before-join form, which is the best plain-parquet
    // plan we measured.
    val pair = (graft.plans.FactLayout.lineitemByOrderOpt(s, d),
        graft.plans.FactLayout.ordersByKeyOpt(s, d)) match {
      case (Some(li), Some(ord)) =>
        li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(ord.select(col("o_orderkey"), col("o_orderdate")).hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max((col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS")).cast("int"))
            .as("was_late"))
          .select(col("l_orderkey"), col("l_suppkey"), col("was_late"))
      case _ =>
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .repartition(col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(col("l_shipdate")).as("max_ship"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("max_ship") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS")).cast("int")
              .as("was_late"))
    }
    pair
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(col("was_late")).as("n_late"),
        max(when(col("was_late") === 1, col("l_suppkey"))).as("late_supp"))
      .where(col("n_supp") >= 2 && col("n_late") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).as("n_waiting_orders"))
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_waiting_orders"))
      .orderBy(col("n_waiting_orders").desc, col("s_suppkey"))
      .limit(k)
  }

  /** TPC-H Q11 shape (fixture-adapted: observed revenue stands in for
    * stock value): parts whose revenue exceeds 1.5× the average part's —
    * the "important inventory" HAVING-over-scalar-subquery pattern.
    *
    * Plan: one partkey rollup of per-row cent-quantized revenue; the
    * global total and part count ride a 1-row broadcast; the threshold
    * check `2·n·rev > 3·total` is exact integer arithmetic in
    * decimal(38)/HUGEINT (a long product would overflow around
    * petabyte-scale revenue sums, and a float threshold reintroduces the
    * rounding-boundary class [[graft.operators.Num]] exists to kill).
    * Part names broadcast onto the surviving slice.
    *
    * BANKED DECISION (VERDICT r12 #6, A/B in PERF_r12 §3): the partkey-
    * bucketed layout costs q11 a consistent ~1.4× LOCALLY (1.77 vs
    * 1.28 s plain at sf0.1) because Spark plans partial+final
    * HashAggregate ADJACENT in one stage even when the scan is already
    * hash-partitioned on the grouping key — two hash passes over a
    * high-cardinality key, where the plain path's final aggregate runs
    * after an AQE-coalesced exchange. Locally the exchange the layout
    * saves is an in-memory copy, so the second hash pass loses; on a
    * cluster it is the full fact projection over the network, so the
    * layout wins. KEPT ON THE LAYOUT (the scale-safe choice); revisit
    * only if Spark grows single-phase aggregation over pre-partitioned
    * input — do not re-derive this trade.
    */
  def importantParts(s: SparkSession, d: String): DataFrame = {
    val perPart = graft.plans.FactLayout.lineitemByPartOpt(s, d)
      .getOrElse(Tables.lineitem(s, d))
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("cents")).as("rev_c"))
    val tot = perPart.agg(sum(col("rev_c")).as("total_c"),
      count(lit(1)).as("n_parts"))
    perPart.join(broadcast(tot))
      .where(col("rev_c").cast("decimal(38,0)") * 2 * col("n_parts") >
        col("total_c").cast("decimal(38,0)") * 3)
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_name"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"),
        (col("rev_c").cast("double") / 100.0).as("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey"))
  }

  /** TPC-H Q16 shape (fixture-adapted: supplier relation via lineitem, one
    * excluded brand): how many distinct suppliers serve each
    * (p_type, size-decade) part segment.
    *
    * Plan: the brand exclusion prunes part BEFORE broadcast; the distinct
    * count runs as Spark's two-phase partial-distinct aggregate over
    * (type, bucket, suppkey) — the only exchange carries the already
    * partially-deduplicated triples, never raw fact rows.
    */
  def supplierDiversity(s: SparkSession, d: String,
      excludeBrand: String = "Brand#9"): DataFrame = {
    val p = Tables.part(s, d)
      .where(col("p_brand") =!= excludeBrand)
      .select(col("p_partkey"), col("p_type"),
        (col("p_size") / 10).cast("int").as("size_bucket"))
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("size_bucket"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"))
      .orderBy(col("p_type"), col("size_bucket"))
  }

  /** TPC-H Q20 shape (fixture-adapted): the LEADING supplier of every
    * part in a product family — who ships the largest quantity share of
    * each part — rolled up per supplier. An absolute dominance threshold
    * ("ships >50%") empties as supplier counts grow with scale; the
    * argmax formulation answers the same "who controls this part's
    * supply" question with scale-independent output.
    *
    * Plan: the family filter prunes part before broadcast; per-(part,
    * supplier) quantities roll up first, the per-part total is a second
    * rollup of THAT (part-sized), and the per-part argmax is a
    * `max(struct)` over micro-unit share — deterministic ties to the
    * SMALLEST suppkey via the negated-key trick ([[minCostSupplier]]
    * stance). Quantities are integral doubles, so every sum and ratio is
    * exact on both engines; shares quantize to 10⁻⁶-unit longs.
    */
  def dominantSuppliers(s: SparkSession, d: String,
      family: String = "gear"): DataFrame = {
    val fam = Tables.part(s, d).where(col("p_name").contains(family))
      .select(col("p_partkey"))
    val pairQty = graft.plans.FactLayout.lineitemByPartOpt(s, d)
      .getOrElse(Tables.lineitem(s, d))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .join(broadcast(fam), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("q_pair"))
    // argmax and the denominator FUSE into one per-part rollup — the old
    // spelling computed the pair rollup TWICE (total + join probe) and
    // shuffled a self-join to divide by the total. Leader semantics: rank
    // by RAW q_pair (ties → smaller suppkey), which the oracle mirrors
    // verbatim; ranking by the ROUNDED share would diverge once a part's
    // q_total exceeds ~2e6 (two distinct q_pair rounding to the same
    // micro-share). q_pair is a sum of integer-valued quantities, exact
    // in doubles to 2^53, so the raw ranking is engine-independent.
    pairQty
      .groupBy(col("l_partkey"))
      .agg(
        max(struct(col("q_pair").as("qp"),
          (-col("l_suppkey")).as("negkey"))).as("m"),
        sum(col("q_pair")).as("q_total"))
      .select((-col("m.negkey")).as("lead_suppkey"),
        round(col("m.qp") / col("q_total") * 1e6, 0).cast("long").as("sq"))
      .groupBy(col("lead_suppkey"))
      .agg(count(lit(1)).as("n_led_parts"),
        // exact half-up in longs — round(sum/n/1e6, 6) crosses engines'
        // rounding modes when the mean lands on a half micro-unit
        // (376299/6 observed in the sf1 study)
        Num.quantMean(sum(col("sq")), count(lit(1)), 1e6)
          .as("mean_led_share"))
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
        col("lead_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_led_parts"),
        col("mean_led_share"))
      .orderBy(col("s_suppkey"))
  }
}
