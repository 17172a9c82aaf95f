package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import graft.plans.SkewOps

/** Semantics tests for the round-5c additions: semantic dedup, snapshot
  * diff, quality tiers, and the join-key skew audit. Exact fixture values
  * are covered by the DuckDB oracles (`q_vec_semdedup`,
  * `q_prep_snapshot_diff`, `q_prep_quality_tiers`, `q_rel_skew_audit`).
  */
class AuditDiffSpec extends SparkSpec with graft.PropSpec {

  test("property: funnel step counts are monotonically non-increasing") {
    import spark.implicits._
    import org.scalacheck.Gen
    val stepGen = Gen.oneOf("signup", "view", "click", "purchase", "error")
    val evGen = for {
      nUsers <- Gen.choose(1, 6)
      evs <- Gen.listOfN(nUsers * 6, stepGen)
    } yield evs.zipWithIndex.map { case (t, i) =>
      ((i % nUsers).toLong, i.toLong, t)
    }
    forSamples(evGen, n = 12) { rows =>
      val got = EventAnalyticsOps.funnelOf(rows.toDF("user_id", "event_id", "event_type"))
        .collect().sortBy(_.getAs[Int]("step_idx")).map(_.getAs[Long]("n_users"))
      assert(got.sameElements(got.sorted.reverse), s"not monotone: ${got.toSeq}")
    }
  }

  test("property: merging an empty change batch carries the snapshot unchanged") {
    import spark.implicits._
    import org.scalacheck.Gen
    val snapGen = Gen.listOfN(8, Gen.alphaStr.map(_.take(6))).map(_.zipWithIndex
      .map { case (t, i) => (i.toLong, t) })
    forSamples(snapGen, n = 10) { rows =>
      val snap = rows.toDF("doc_id", "text")
      val noChanges = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "op")
      val got = TrainPrepOps.mergeChangesOf(snap, noChanges).collect()
      assert(got.length === rows.length)
      assert(got.forall(_.getAs[String]("provenance") === "carried"))
    }
  }

  test("semanticDedup drops the higher id of a similar same-cell pair, keeps dissimilar") {
    import spark.implicits._
    // v0 ≈ v1 (same direction, same sign cell); v2 orthogonal in dims 5+
    // but same sign cell — below threshold; v3 in a different cell.
    def vec(head: Seq[Double], tail: Seq[Double]): Seq[Float] =
      (head ++ tail ++ Seq.fill(64 - head.size - tail.size)(0.0)).map(_.toFloat)
    val rows = Seq(
      (0L, vec(Seq(1.0, 1.0, 1.0, 1.0), Seq(1.0, 0.0))),
      (1L, vec(Seq(1.0, 1.0, 1.0, 1.0), Seq(0.9, 0.0))),
      (2L, vec(Seq(0.1, 0.1, 0.1, 0.1), Seq(0.0, -9.0))),
      (3L, vec(Seq(-1.0, 1.0, 1.0, 1.0), Seq(1.0, 0.0))))
    val got = VectorOps.semanticDedupOf(rows.toDF("vec_id", "embedding"), minSim = 0.8)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("dropped_by")))).toMap
    assert(got(0L) === (("kept", None)))
    assert(got(1L) === (("dropped", Some(0L))))
    assert(got(2L)._1 === "kept")
    assert(got(3L)._1 === "kept")
  }

  test("snapshotDiffOf classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("doc_id", "text")
    val nw = Seq((2L, "bb"), (3L, "cc2"), (4L, "dd")).toDF("doc_id", "text")
    val got = TrainPrepOps.snapshotDiffOf(old, nw).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("qualityTiers: tier 1 holds the best quality; tiers partition each source") {
    val got = TrainPrepOps.qualityTiers(spark, sf0001).collect()
    val bySource = got.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    for ((_, rows) <- bySource) {
      val sorted = rows.sortBy(_.getAs[Int]("tier"))
      assert(sorted.map(_.getAs[Int]("tier")).toSeq === (1 to sorted.length))
      // descending quality across tiers: tier k's min >= tier k+1's max
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Double]("min_quality") >= lo.getAs[Double]("max_quality"))
        case _ =>
      }
    }
  }

  test("mergeChangesOf: upsert wins, delete drops, snapshot carries") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val chg = Seq((2L, "b2", "U"), (3L, "c", "D"), (4L, "d", "U"), (5L, "x", "D"))
      .toDF("doc_id", "text", "op")
    val got = TrainPrepOps.mergeChangesOf(snap, chg).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("provenance")).toMap
    // 1 carried, 2 upserted, 3 deleted, 4 inserted, 5 delete-of-absent = no row
    assert(got === Map(1L -> "carried", 2L -> "applied", 4L -> "applied"))
  }

  test("orderCountDistribution includes the zero-order bin") {
    val got = RelationalOps.orderCountDistribution(spark, sf0001).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("n_custs")).toMap
    import org.apache.spark.sql.functions._
    val nCust = graft.Tables.customer(spark, sf0001).count()
    val nWithOrders = graft.Tables.orders(spark, sf0001)
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(got.getOrElse(0L, 0L) === nCust - nWithOrders)
    assert(got.values.sum === nCust)
  }

  test("weightedSample matches a driver-side Efraimidis-Spirakis reference") {
    import org.apache.spark.sql.functions._
    // independent reference: same u/weight/key math in plain Scala over the
    // collected corpus, per-source top-25 — must agree row for row
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
    val ref = docs.map { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = r.getAs[String]("text").split(" ", -1)
      val q = math.min(toks.length / 50.0, 1.0) * (toks.distinct.length.toDouble / toks.length)
      val w = math.max(BigDecimal(q).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 0.0001)
      val u = ((id * 2654435761L) % 1000003L + 1L).toDouble / 1000004d
      val key = BigDecimal(math.pow(u, 1.0 / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r.getAs[String]("source"), id, key)
    }.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy(t => (-t._3, t._2)).take(25).zipWithIndex
        .map { case ((_, id, key), i) => (src, i + 1) -> ((id, key)) }
    }.toMap
    val got = TrainPrepOps.weightedSample(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("sample_rank")) ->
        ((r.getAs[Long]("doc_id"), r.getAs[Double]("es_key")))).toMap
    assert(got.size === ref.size)
    ref.foreach { case (k, v) => assert(got(k) === v, s"mismatch at $k") }
  }

  test("keySkewAudit computes share and skew factor against hand counts") {
    import spark.implicits._
    // key 1 → 6 rows, key 2 → 2, key 3 → 2, key 4 → 2: total 12, 4 keys
    val df = (Seq.fill(6)(1) ++ Seq.fill(2)(2) ++ Seq.fill(2)(3) ++ Seq.fill(2)(4))
      .zipWithIndex.map { case (k, i) => (k.toLong, i.toLong) }.toDF("k", "row_id")
    val got = SkewOps.keySkewAudit(df, "k", k = 2).collect()
    assert(got.length === 2)
    val top = got.head
    assert(top.getAs[Long]("k") === 1L)
    assert(top.getAs[Long]("cnt") === 6L)
    assert(top.getAs[Double]("share") === 0.5)
    assert(top.getAs[Double]("skew_factor") === 2.0) // 6 / (12/4)
    assert(top.getAs[Long]("total_rows") === 12L)
    assert(top.getAs[Long]("n_keys") === 4L)
    assert(got(1).getAs[Long]("k") === 2L) // ties broken by key asc
  }
}
