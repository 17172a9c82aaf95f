package graft.operators

import java.security.MessageDigest

import graft.SparkSpec

/** Semantics tests for the retrieval pack (BM25 / inverted index / unigram
  * log-prob) on hand-built corpora; exact fixture values are covered by the
  * DuckDB oracles (`q_text_bm25`, `q_text_inverted_index`,
  * `q_text_unigram_logprob`).
  */
class RetrievalSpec extends SparkSpec {

  private def md5hex(t: String): String =
    MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25 ranks higher term frequency above lower at equal length") {
    val corpus = docs(
      (0L, "spark spark spark pad1 pad2 pad3"),
      (1L, "spark pad1 pad2 pad3 pad4 pad5"),
      (2L, "pad1 pad2 pad3 pad4 pad5 pad6"))
    val got = RetrievalOps.bm25TopKOf(corpus, Seq("spark"), k = 10).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 1L))
    assert(got(0).getAs[Double]("bm25") > got(1).getAs[Double]("bm25"))
  }

  test("bm25 on an empty corpus returns the contract-shaped empty frame") {
    // the literal-inlined stats path must not NPE on a null avgdl
    val got = RetrievalOps.bm25TopKOf(docs().limit(0), Seq("spark"), k = 5)
    assert(got.columns.toSeq === Seq("doc_id", "bm25"))
    assert(got.count() === 0L)
  }

  test("bm25 length normalization prefers the shorter doc at equal tf") {
    val corpus = docs(
      (0L, "spark pad1 pad2 pad3"),
      (1L, "spark pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8 pad9 pad10 pad11"),
      (2L, "pad1 pad2"))
    val got = RetrievalOps.bm25TopKOf(corpus, Seq("spark"), k = 10).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 1L))
  }

  test("prfTopK: expanded rescoring keeps feedback docs and ranks deterministically") {
    val prf = RetrievalOps.prfTopK(spark, sf0001).collect()
    assert(prf.nonEmpty && prf.length <= 10)
    val scores = prf.map(_.getAs[Double]("prf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the feedback docs carry both original and expansion terms, so at
    // least one must survive the rescoring
    val base = RetrievalOps.bm25TopK(spark, sf0001, k = 3).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(prf.map(_.getAs[Long]("doc_id")).toSet.intersect(base).nonEmpty)
    // deterministic: a second run is identical row for row
    val again = RetrievalOps.prfTopK(spark, sf0001).collect()
    assert(prf.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("tfidf similarity: identical docs hit cosine 1.0, disjoint docs are absent") {
    val corpus = docs(
      (0L, "foo bar"),
      (1L, "foo bar"),
      (2L, "baz qux quux"))
    val got = RetrievalOps.tfidfSimilarPairsOf(corpus, minSim = 0.1, dfDenom = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq((0L, 1L)), "only the identical pair shares a term")
    assert(got.head._2 === 1.0)
  }

  test("tfidf similarity ranks heavier term overlap above lighter") {
    // doc 2 shares both content words with doc 0; doc 1 shares one —
    // and 'pad' is common to all three so idf downweights it
    val corpus = docs(
      (0L, "alpha beta pad"),
      (1L, "alpha gamma pad"),
      (2L, "alpha beta pad"),
      (3L, "delta epsilon pad"))
    val got = RetrievalOps.tfidfSimilarPairsOf(corpus, minSim = 0.01, dfDenom = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got((0L, 2L)) === 1.0, "identical docs")
    assert(got((0L, 2L)) > got((0L, 1L)), "two shared terms beat one")
    assert(!got.contains((0L, 3L)), "no shared capped-vocab terms")
  }

  test("tfidf similarity df-fraction cap drops common-term-only pairs") {
    // N=10, denom=5 → terms kept iff df <= 2: the df=2 terms pair up
    // docs 0/1; the df=3 'shared3' is capped so docs 2/3/4 never pair
    val corpus = docs(
      (0L, "shared1 shared2 u0"), (1L, "shared1 shared2 u1"),
      (2L, "shared3 u2 v2"), (3L, "shared3 u3 v3"), (4L, "shared3 u4 v4"),
      (5L, "u5 v5 w5"), (6L, "u6 v6 w6"), (7L, "u7 v7 w7"),
      (8L, "u8 v8 w8"), (9L, "u9 v9 w9"))
    val got = RetrievalOps.tfidfSimilarPairsOf(corpus, minSim = 0.01, dfDenom = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L)))
  }

  test("rbo: identical rankings score 1-p^k, disjoint score 0") {
    import spark.implicits._
    val k = 10; val p = 0.9
    val a = (1 to k).map(i => (i.toLong, i)).toDF("doc_id", "r_bm")
    val same = (1 to k).map(i => (i.toLong, i)).toDF("doc_id", "r_cos")
    val disj = (1 to k).map(i => (i + 100L, i)).toDF("doc_id", "r_cos")
    val rSame = RetrievalOps.rboOf(spark, a, same, k, p).collect()(0)
    assert(rSame.getAs[Long]("overlap_at_k") === k.toLong)
    assert(math.abs(rSame.getAs[Double]("rbo") - (1.0 - math.pow(p, k))) < 1e-6)
    val rDisj = RetrievalOps.rboOf(spark, a, disj, k, p).collect()(0)
    assert(rDisj.getAs[Long]("overlap_at_k") === 0L)
    assert(rDisj.getAs[Double]("rbo") === 0.0)
    // reversal of the tail ranks scores strictly between
    val rev = (1 to k).map(i => (i.toLong, if (i <= 5) i else 16 - i))
      .toDF("doc_id", "r_cos")
    val rRev = RetrievalOps.rboOf(spark, a, rev, k, p).collect()(0)
    assert(rRev.getAs[Double]("rbo") > 0.0 &&
      rRev.getAs[Double]("rbo") < rSame.getAs[Double]("rbo"))
  }

  test("inverted index: df, total_tf, and order-independent postings signature") {
    val corpus = docs(
      (2L, "a b a"),
      (0L, "a c"),
      (1L, "b a"))
    val got = RetrievalOps.invertedIndexOf(corpus).collect()
      .map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), r.getAs[Long]("total_tf"),
          r.getAs[Long]("postings_sig1"), r.getAs[Long]("postings_sig2")))
      .toMap
    // sig = (Σh, Σh²) mod 1e9+7 over h = md5Base31(id) — hashed moments,
    // so id sets with equal raw sums ({0,1,2} vs {1,2}) do NOT collide
    val p = 1000000007L
    def h(id: Long): Long =
      BigInt(md5hex(id.toString).take(15), 16).toLong % 2147483647L
    def sigs(ids: Seq[Long]): (Long, Long) = (
      ids.map(h).sum % p,
      ids.map(i => h(i) * h(i) % p).sum % p)
    assert(got("a") === ((3L, 4L) match {
      case (df, tf) => (df, tf, sigs(Seq(0L, 1L, 2L))._1, sigs(Seq(0L, 1L, 2L))._2) }))
    assert(got("b") === ((2L, 2L, sigs(Seq(1L, 2L))._1, sigs(Seq(1L, 2L))._2)))
    assert(got("c") === ((1L, 1L, sigs(Seq(0L))._1, sigs(Seq(0L))._2)))
    assert(sigs(Seq(0L, 1L, 2L)) !== sigs(Seq(1L, 2L)))
  }

  test("bpe pair counts match hand-counted adjacent character pairs") {
    val corpus = docs((0L, "abab cd x"), (1L, "ab"))
    val got = RetrievalOps.bpePairCountsOf(corpus).collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")) ->
        r.getAs[Long]("n")).toMap
    // "abab": ab, ba, ab; "cd": cd; "x": none (1-char guard); "ab": ab
    assert(got === Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("c", "d") -> 1L))
  }

  test("bigram LM: conditional p normalizes per w1 and ranks continuations") {
    val corpus = docs((0L, "a b a b a c"), (1L, "b a"))
    val got = RetrievalOps.bigramLmOf(corpus, k = 3).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p"), r.getAs[Int]("rank")))).toMap
    // bigrams: doc0 = a>b, b>a, a>b, b>a, a>c; doc1 = b>a  (no cross-doc pair)
    assert(got(("a", "b")) === ((2L, 0.666667, 1)))
    assert(got(("a", "c")) === ((1L, 0.333333, 2)))
    assert(got(("b", "a")) === ((3L, 1.0, 1)))
    assert(got.size === 3)
  }

  test("unigram log-prob: docs of rare tokens score below docs of common tokens") {
    val corpus = docs(
      (0L, "the the the the"),
      (1L, "the the the the"),
      (2L, "zq xk vj wp"))
    val got = RetrievalOps.unigramLogProbOf(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"))).toMap
    assert(got(0L)._1 === 4L)
    assert(got(0L)._2 === got(1L)._2)
    assert(got(2L)._2 < got(0L)._2)
    // exact: p(the) = 8/12, p(each rare) = 1/12
    assert(math.abs(got(0L)._2 - math.log(8.0 / 12)) < 5e-5)
    assert(math.abs(got(2L)._2 - math.log(1.0 / 12)) < 5e-5)
  }

  test("bigram log-prob: exact MLE means on a hand-computed corpus") {
    // doc0 "a b a b": bigrams (a,b),(b,a),(a,b); doc1 "a b c": (a,b),(b,c)
    // LM: P(b|a) = 3/3 = 1 → 0; P(a|b) = 1/2, P(c|b) = 1/2 → ln 0.5
    val corpus = docs((0L, "a b a b"), (1L, "a b c"))
    val got = RetrievalOps.bigramLogProbOf(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp")))).toMap
    val ln05 = math.log(0.5)
    assert(got(0L)._1 === 3L)
    assert(math.abs(got(0L)._2 - (0 + ln05 + 0) / 3) < 5e-5)
    assert(got(1L)._1 === 2L)
    assert(math.abs(got(1L)._2 - (0 + ln05) / 2) < 5e-5)
    // model pruning drops singleton bigrams from scoring
    val pruned = RetrievalOps.bigramLogProbOf(corpus, minCount = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bigrams")).toMap
    assert(pruned === Map(0L -> 2L, 1L -> 1L)) // only (a,b) survives
  }

  /** Plain-Scala reference BPE (Sennrich on the weighted vocab; greedy
    * left-to-right merge application).
    */
  private def refBpe(words: Seq[String], rounds: Int)
      : (Seq[(String, String, Long)], Map[String, List[String]]) = {
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var segs: Map[String, List[String]] =
      freq.keys.map(w => w -> w.map(_.toString).toList).toMap
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (w, sy) =>
        sy.zip(sy.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + freq(w))
      }
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head
        merges += ((l, r, n))
        segs = segs.view.mapValues { sy =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
              out += l + r; i += 2 // greedy left-to-right, non-overlapping
            } else { out += sy(i); i += 1 }
          }
          out.toList
        }.toMap
      }
    }
    (merges.result(), segs)
  }

  // brute-force anchor: q_text_bpe_merges q_text_bpe_fertility
  test("BPE induction agrees with a plain-Scala reference, chains included") {
    // 'abab' and 'aaa' pin the greedy-merge boundary semantics: after
    // merge (a,b), 'abab' must be [ab, ab] (not [ab, a, b]) and after
    // (a,a) 'aaa' must be [aa, a]
    val words = Seq(
      "abab", "abab", "abab", "abab", "abab",
      "aaa", "aaa", "aaa",
      "banana", "banana", "bandana", "cabana")
    val corpus = docs(words.zipWithIndex.map {
      case (w, i) => (i.toLong, w) }: _*)
    val rounds = 5
    val (refMerges, refSegs) = refBpe(words, rounds)
    val (gotMerges, vocab) = RetrievalOps.bpeLearnOf(corpus, rounds)
    assert(gotMerges.map(m => (m._2, m._3, m._5)) === refMerges)
    val gotSegs = vocab.collect().map { r =>
      r.getAs[String]("w") ->
        "[^~]+".r.findAllIn(r.getAs[String]("seq")).toList
    }.toMap
    assert(gotSegs === refSegs)
    // fertility reconciles with the reference segmentation
    val fert = RetrievalOps.bpeFertilityOf(corpus, rounds).collect()
    val expTokens = words.map(w => refSegs(w).length.toLong).sum
    assert(fert.map(_.getAs[Long]("n_bpe_tokens")).sum === expTokens)
  }
}
