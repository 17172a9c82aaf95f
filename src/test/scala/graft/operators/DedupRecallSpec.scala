package graft.operators

import graft.SparkSpec

/** Quality evidence for the approximate dedup operators: their recall of
  * the exact-Jaccard near-duplicate pairs on the sf0.001 fixture.
  * Deterministic (fixed data, fixed hashes) — the bounds are pinned from
  * the theoretical candidate probabilities: 8 bands × 4 rows gives
  * P(candidate) = 1−(1−j⁴)⁸ ≈ 0.92 at j=0.7, ≈ 1.0 at j≥0.9.
  */
class DedupRecallSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH recovers the high-similarity exact pairs") {
    val strong = pairs(DedupOps.ngramJaccardPairs(spark, sf0001, minSim = 0.9))
    val lsh = pairs(DedupOps.minhashLshPairs(spark, sf0001))
    assert(strong.nonEmpty, "fixture should contain planted near-dups")
    val recall = (strong & lsh).size.toDouble / strong.size
    assert(recall >= 0.9, s"recall=$recall over ${strong.size} strong pairs")
  }

  test("containment flags a planted excerpt that Jaccard misses") {
    import spark.implicits._
    val long = (0 until 40).map(i => s"w$i").mkString(" ")
    val excerpt = (10 until 20).map(i => s"w$i").mkString(" ")
    val other = (100 until 140).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, long), (2L, excerpt), (3L, other)).toDF("doc_id", "text")
    val out = DedupOps.containmentPairsOf(docs, minCont = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getDouble(3)))
    assert(out.map(_._1).toSet == Set((1L, 2L)), "only the excerpt pair qualifies")
    val (_, cont, jac) = out.head
    assert(cont == 1.0, s"every excerpt shingle is in the long doc: $cont")
    assert(jac < 0.5, s"the symmetric measure stays low: $jac")
  }

  test("containment dominates jaccard on the fixture corpus") {
    // C(A,B) = inter/min >= inter/union = J, so every Jaccard-qualified
    // pair must re-appear (with containment >= its jaccard) at the same cut
    val jac = pairs(DedupOps.ngramJaccardPairs(spark, sf0001, minSim = 0.6))
    val cont = pairs(DedupOps.containmentPairs(spark, sf0001, minCont = 0.6))
    assert(jac.nonEmpty)
    assert(jac.subsetOf(cont), s"missing: ${(jac -- cont).take(5)}")
  }

  test("simhash recovers most near-identical exact pairs") {
    // SimHash distance measures bag-of-words bit agreement, not shingle
    // Jaccard — some high-Jaccard pairs legitimately exceed Hamming 3, so
    // the pinned bound (measured 0.78 on this fixture) is looser than LSH's
    val strong = pairs(DedupOps.ngramJaccardPairs(spark, sf0001, minSim = 0.9))
    val sim = pairs(DedupOps.simhashPairs(spark, sf0001))
    val recall = (strong & sim).size.toDouble / strong.size
    assert(recall >= 0.7, s"recall=$recall over ${strong.size} strong pairs")
  }

  test("dupSpans recovers planted maximal runs exactly") {
    import spark.implicits._
    // doc 2 embeds tokens 10..29 of doc 1 (a 20-token verbatim run) plus
    // a second, shorter 9-token run (40..48), separated by alien text;
    // doc 3 shares nothing long enough (7 tokens < minRun=8)
    val base = (0 until 60).map(i => s"w$i")
    val d1 = base.mkString(" ")
    val d2 = ((100 until 110).map(i => s"a$i") ++ base.slice(10, 30) ++
      (200 until 215).map(i => s"b$i") ++ base.slice(40, 49)).mkString(" ")
    val d3 = ((300 until 320).map(i => s"c$i") ++ base.slice(0, 7)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = DedupOps.dupSpansOf(docs).collect()
    assert(out.length == 1, s"only the (1,2) pair qualifies: ${out.toSeq}")
    val r = out.head
    assert((r.getAs[Long]("a"), r.getAs[Long]("b")) == (1L, 2L))
    assert(r.getAs[Long]("n_runs") == 2L)
    assert(r.getAs[Long]("max_run_tokens") == 20L)
    assert(r.getAs[Long]("dup_tokens") == 29L)
    // min doc length = 54 tokens (doc 2); 29/54 half-up at 1e-6
    assert(math.abs(r.getAs[Double]("dup_frac") - 29.0 / 54.0) < 1e-6)
  }

  test("dupSpanRewrite merges adjacent cuts and keeps the first occurrence") {
    import spark.implicits._
    // doc 4 embeds two doc-1 runs that land ADJACENT in doc-4 coordinates
    // (positions 11..30 and 31..42) — the excision plan must merge them
    // into one maximal cut; doc 1 (the keeper) must not appear at all
    val base = (0 until 60).map(i => s"w$i")
    val d1 = base.mkString(" ")
    val d4 = ((100 until 110).map(i => s"a$i") ++ base.slice(10, 30) ++
      base.slice(28, 40)).mkString(" ")
    val docs = Seq((1L, d1), (4L, d4)).toDF("doc_id", "text")
    val out = DedupOps.dupSpanRewriteOf(docs).collect()
    assert(out.length == 1, s"only doc 4 gets surgery: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("doc_id") == 4L)
    assert(r.getAs[Long]("n_spans") == 1L, "adjacent intervals must merge")
    assert(r.getAs[Long]("tokens_before") == 42L)
    assert(r.getAs[Long]("tokens_removed") == 32L)
    assert(r.getAs[Long]("tokens_after") == 10L)
    assert(math.abs(r.getAs[Double]("removed_frac") - 0.761905) < 1e-9)
  }

  test("thresholdCurve: survival monotone, points reconcile with pair queries") {
    val rows = DedupOps.thresholdCurve(spark, sf0001).collect()
      .sortBy(_.getAs[Double]("threshold"))
    assert(rows.nonEmpty)
    val nPairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(nPairs.sameElements(nPairs.sorted.reverse),
      "raising the threshold can only keep fewer pairs")
    val nDocs = rows.map(_.getAs[Long]("n_docs"))
    assert(nDocs.sameElements(nDocs.sorted.reverse))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= 2 * r.getAs[Long]("n_pairs"))
      assert(r.getAs[Double]("mean_jaccard") >=
        r.getAs[Double]("threshold") - 1e-6)
    }
    // each point equals a direct minSim query's pair count (quantized
    // jq >= thr*1e6 is exactly the jaccard >= thr filter on 6-dp values)
    rows.take(2).foreach { r =>
      val thr = r.getAs[Double]("threshold")
      val direct = DedupOps.ngramJaccardPairs(spark, sf0001, minSim = 0.0)
        .collect()
        .count(_.getAs[Double]("jaccard") * 1e6 >= math.round(thr * 1e6) - 0.5)
      assert(r.getAs[Long]("n_pairs") === direct.toLong)
    }
  }
}
