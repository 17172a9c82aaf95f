package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariant tests for the corpus-audit additions: cross-split leakage,
  * dedup-impact histogram, temperature-scaled mixture weights, token-budget
  * selection, and the per-source length profile. Exact values are covered
  * by the DuckDB oracles; these pin semantics on adversarial synthetic
  * corpora (the fixtures have almost no exact duplicates) and the
  * structural properties that must hold at any scale.
  */
class CorpusAuditSpec extends SparkSpec {

  /** Same split rule as TrainPrepOps.splitName, computed independently. */
  private def splitOf(docId: Long): String = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"split:$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val b = hex.substring(0, 2)
    if (b < "cc") "train" else if (b < "e6") "val" else "test"
  }

  test("splitLeakage finds exactly the cross-split duplicate pairs") {
    import spark.implicits._
    // ids chosen so each text's copies cover >= 2 splits somewhere
    val ids = 0L until 64L
    val docs = ids.map { i => (i, s"text-${i % 4}") } // 4 texts x 16 copies
      .toDF("doc_id", "text")
    val got = TrainPrepOps.splitLeakageOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val expected = (for {
      a <- ids; b <- ids
      if a < b && a % 4 == b % 4 && splitOf(a) != splitOf(b)
    } yield (a, b)).toSet
    assert(expected.nonEmpty) // the synthetic corpus must actually leak
    assert(got === expected)
    // and same-split duplicate pairs are NOT reported
    val gotAll = TrainPrepOps.splitLeakageOf(docs).collect()
    gotAll.foreach(r =>
      assert(r.getAs[String]("split_a") !== r.getAs[String]("split_b")))
  }

  test("splitLeakage maxGroup caps pathological duplicate groups") {
    import spark.implicits._
    // one text with 40 copies (pathological), one with 3 (normal)
    val docs = ((0L until 40L).map(i => (i, "boilerplate")) ++
      Seq((100L, "rare"), (101L, "rare"), (102L, "rare")))
      .toDF("doc_id", "text")
    val capped = TrainPrepOps.splitLeakageOf(docs, maxGroup = 10).collect()
    // the 40-copy group is dropped entirely; the 3-copy group survives
    assert(capped.forall(_.getAs[Long]("doc_a") >= 100L))
    val uncapped = TrainPrepOps.splitLeakageOf(docs).collect()
    assert(uncapped.length > capped.length)
  }

  test("dedupImpact histogram: groups, docs and removables reconcile") {
    import spark.implicits._
    // 3 singletons + 2 pairs + 1 group of 5  =>  sizes {1:3, 2:2, 5:1}
    val docs = (Seq("a", "b", "c") ++
      Seq("d", "d", "e", "e") ++ Seq.fill(5)("f"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = DedupOps.dedupImpactOf(docs).collect()
      .map(r => r.getAs[Long]("group_size") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_removable"))).toMap
    assert(got === Map(
      1L -> ((3L, 3L, 0L)), 2L -> ((2L, 4L, 2L)), 5L -> ((1L, 5L, 4L))))
  }

  test("dedupImpact on the fixture reconciles with corpus totals") {
    val rows = DedupOps.dedupImpact(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
    val n = docs.count()
    val nDistinct = docs.select(md5(col("text"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === n)
    assert(rows.map(_.getAs[Long]("n_groups")).sum === nDistinct)
    assert(rows.map(_.getAs[Long]("n_removable")).sum === n - nDistinct)
  }

  test("mixtureWeights: sqrt-temperature law, shares sum to 1") {
    val rows = TrainPrepOps.mixtureWeights(spark, sf0001).collect()
    assert(rows.length > 1)
    val toks = rows.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("n_tokens")).toMap
    val totW = toks.values.map(v => math.sqrt(v.toDouble)).sum
    rows.foreach { r =>
      val expected = math.sqrt(toks(r.getAs[String]("source")).toDouble) / totW
      assert(math.abs(r.getAs[Double]("weight") - expected) < 1e-6)
    }
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("natural_share")).sum - 1.0) < 1e-4)
    // temperature flattening: smaller sources are up-weighted (epochs > 1
    // below-average sources, < 1 above-average), and epochs is
    // anti-monotone in source size
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    val epochs = bySize.map(_.getAs[Double]("epochs"))
    epochs.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-9)
      case _ => ()
    }
  }

  test("tokenBudget selects a quality-prefix per source within budget") {
    val budget = 300L
    val kept = TrainPrepOps.tokenBudget(spark, sf0001, budget).collect()
    assert(kept.nonEmpty)
    val all = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        CurationOps.qualityCol.as("quality"),
        size(split(col("text"), " ")).as("n_tokens"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Double]("quality"), r.getAs[Int]("n_tokens")))
    val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
    all.groupBy(_._2).foreach { case (_, docs) =>
      // greedy reference: walk quality-desc order, keep while budget unspent
      val order = docs.sortBy(d => (-d._3, d._1))
      var cum = 0L
      val expect = scala.collection.mutable.Set[Long]()
      order.foreach { d =>
        if (cum < budget) { expect += d._1; cum += d._4 }
      }
      val got = docs.map(_._1).filter(keptIds).toSet
      assert(got === expect.toSet)
    }
    // cum_tokens never exceeds budget by more than the final doc's tokens
    kept.foreach { r =>
      assert(r.getAs[Long]("cum_tokens") - r.getAs[Int]("n_tokens") < budget)
    }
  }

  test("lengthProfile: ordered percentiles, bounds, doc counts") {
    val rows = TextOps.lengthProfile(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mn = r.getAs[Long]("min_chars").toDouble
      val mx = r.getAs[Long]("max_chars").toDouble
      val ps = Seq(r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"), r.getAs[Double]("p95"))
      ps.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b)
        case _ => ()
      }
      assert(mn <= ps.head && ps.last <= mx)
      val avg = r.getAs[Double]("avg_chars")
      assert(avg >= mn && avg <= mx)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf0001).count())
  }

  test("contentNovelty: first doc fully novel, totals reconcile with the corpus") {
    val rows = DedupOps.contentNovelty(spark, sf0001).collect()
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Double]("novelty") === 1.0,
      "the earliest document is first for every one of its shingles")
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
    // every distinct shingle is novel in exactly one document
    val distinctShingles = DedupOps.shingles(spark, sf0001)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("shs")).as("sh"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum === distinctShingles)
  }

  test("qualityCalibration: deciles ordered by quality, counts reconcile") {
    val rows = CurationOps.qualityCalibration(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val qs = rows.map(_.getAs[Double]("avg_quality"))
    qs.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"decile means must ascend: $a > $b")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dups") <= r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf0001).count())
  }

  test("datasetCard: volumes, shares, and dup counts reconcile with the corpus") {
    val rows = TrainPrepOps.datasetCard(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
    assert(rows.map(_.getAs[String]("source")).distinct.length === rows.length)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(rows.map(_.getAs[Long]("n_chars")).sum ===
      docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
        .head.getLong(0))
    // ppm shares sum to 1 within rounding slack (one quantum per source)
    val docShare = rows.map(_.getAs[Double]("doc_share")).sum
    assert(math.abs(docShare - 1.0) <= rows.length * 1e-6,
      s"doc shares must sum to ~1, got $docShare")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact_dup_docs") >= 0L)
      assert(r.getAs[Long]("n_exact_dup_docs") < r.getAs[Long]("n_docs"))
      val dr = r.getAs[Double]("dup_rate")
      assert(dr >= 0.0 && dr < 1.0)
      val tls = r.getAs[Double]("top_lang_share")
      assert(tls > 0.0 && tls <= 1.0)
      assert(r.getAs[Long]("n_langs") >= 1L)
      val q = r.getAs[Double]("mean_quality")
      assert(q >= 0.0 && q <= 1.0)
    }
    // cross-check one source's dominant language against a direct count
    val src = rows.head.getAs[String]("source")
    val byLang = docs.filter(org.apache.spark.sql.functions.col("source") === src)
      .groupBy("lang").count().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("count")))
    val expected = byLang.maxBy { case (l, n) => (n, l) }
    assert(rows.head.getAs[String]("top_lang") === expected._1)
  }

  test("vocabGrowth: vocabulary and volumes reconcile, cumulatives monotone") {
    val rows = TextOps.vocabGrowth(spark, sf0001).collect()
      .sortBy(_.getAs[Int]("decile"))
    assert(rows.length === 10)
    val docs = Tables.documents(spark, sf0001)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val distinctTerms = docs
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    assert(rows.map(_.getAs[Long]("new_terms")).sum === distinctTerms)
    assert(rows.last.getAs[Long]("cum_vocab") === distinctTerms)
    assert(rows.last.getAs[Long]("cum_tokens") ===
      rows.map(_.getAs[Long]("n_tokens")).sum)
    // every term in decile 1's docs is new there; cum curves never fall
    assert(rows.head.getAs[Long]("new_terms") > 0L)
    val cumV = rows.map(_.getAs[Long]("cum_vocab"))
    assert(cumV.sameElements(cumV.sorted))
    // marginal novelty falls: later deciles add fewer types per token
    // than the first (Heaps sublinearity on any natural-ish corpus)
    val first = rows.head
    val last = rows.last
    assert(last.getAs[Long]("new_terms").toDouble / last.getAs[Long]("n_tokens") <=
      first.getAs[Long]("new_terms").toDouble / first.getAs[Long]("n_tokens"))
  }

  test("qualityDrift: halves reconcile, TVD bounded, shift bucket sane") {
    val rows = TrainPrepOps.qualityDrift(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val total = Tables.documents(spark, sf0001).count()
    assert(rows.map(r =>
      r.getAs[Long]("n_early") + r.getAs[Long]("n_late")).sum === total)
    rows.foreach { r =>
      val tvd = r.getAs[Double]("tvd")
      assert(tvd >= 0.0 && tvd <= 1.0, s"TVD out of range: $tvd")
      val b = r.getAs[Int]("top_shift_bucket")
      assert(b >= 0 && b <= 9)
      assert(math.abs(r.getAs[Double]("top_shift")) <= 2 * tvd + 1e-6,
        "no single bucket can shift more than the full TVD mass")
    }
    // identical halves => zero drift: replicate a tiny frame symmetrically
    import spark.implicits._
    val sym = Seq(
      (1L, "a b c d e", "s"), (2L, "f g h i j k l m n o", "s"),
      (3L, "a b c d e", "s"), (4L, "f g h i j k l m n o", "s"))
      .toDF("doc_id", "text", "source")
    val zero = TrainPrepOps.qualityDriftOf(sym).collect()
    assert(zero.length === 1 && zero.head.getAs[Double]("tvd") === 0.0)
  }

  test("decontamCurve: monotone in the threshold, reconciles with decontaminate") {
    val rows = TrainPrepOps.decontamCurve(spark, sf0001).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.length === 6)
    val flagged = rows.map(_.getAs[Long]("n_flagged"))
    assert(flagged.sameElements(flagged.sorted.reverse),
      "raising the threshold can only flag fewer docs")
    val shFrac = rows.map(_.getAs[Double]("flagged_shingle_frac"))
    assert(shFrac.sameElements(shFrac.sorted.reverse))
    // the 0.05 point IS decontaminate's verdict count
    val at05 = rows.find(_.getAs[Double]("threshold") === 0.05).get
    val direct = TrainPrepOps.decontaminate(spark, sf0001).collect()
      .count(_.getAs[Boolean]("is_contaminated"))
    assert(at05.getAs[Long]("n_flagged") === direct.toLong)
    rows.foreach { r =>
      val f = r.getAs[Double]("flagged_doc_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("bloomDecontaminate is row-identical to exact decontaminate at any fpp") {
    val exact = TrainPrepOps.decontaminate(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    // default fpp, and a deliberately terrible filter (every other key a
    // false positive): the exact confirm join must erase the difference
    for (fpp <- Seq(0.01, 0.5)) {
      val got = TrainPrepOps.bloomDecontaminate(spark, sf0001, fpp = fpp)
        .collect().map(_.toSeq).toSeq
      assert(got === exact, s"fpp=$fpp")
    }
  }

  test("qualityAuc equals the brute-force tie-aware Mann-Whitney statistic") {
    val row = TrainPrepOps.qualityAuc(spark, sf0001).collect().head
    val docs = Tables.documents(spark, sf0001)
    assert(row.getAs[Long]("n_unique") + row.getAs[Long]("n_dup") ===
      docs.count())
    // recompute from scratch: per-doc q4 + near-dup membership
    val dupIds = DedupOps.minhashLshPairs(spark, sf0001).collect()
      .flatMap(r => Seq(r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val scored = docs
      .select(col("doc_id"),
        round(CurationOps.qualityCol * 1e4, 0).cast("long").as("q4"))
      .collect()
      .map(r => (r.getAs[Long]("q4"), dupIds.contains(r.getAs[Long]("doc_id"))))
    val pos = scored.filter(!_._2).map(_._1)
    val neg = scored.filter(_._2).map(_._1)
    assert(row.getAs[Long]("n_unique") === pos.length.toLong)
    assert(row.getAs[Long]("n_dup") === neg.length.toLong)
    // 2U = sum over positives of (2 * negatives strictly below + ties)
    val twoU = pos.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p)).sum
    val den = 2L * pos.length * neg.length
    val expectPpm = (2L * 1000000L * twoU + den) / (2L * den)
    assert(row.getAs[Double]("auc") === expectPpm.toDouble / 1e6)
  }
}
