package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected-components canonicalization ([[DedupOps.clusters]]):
  * correctness on adversarial synthetic graphs (deep chain — the
  * worst case for label propagation —, cycle, disjoint components) plus
  * the end-to-end fixture run agreeing with a transitive closure of the
  * pair set computed independently in-memory.
  */
class DedupClusterSpec extends SparkSpec with graft.PropSpec {

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupOps.clusters(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain component propagates the min id end to end") {
    // 1-2-3-4-5-6-7: diameter 6, min label must travel the full chain
    val chain = (1L to 6L).map(i => (i, i + 1))
    val lbl = labelsOf(chain)
    assert(lbl.keySet == (1L to 7L).toSet)
    assert(lbl.values.toSet == Set(1L))
  }

  test("cycles terminate and disjoint components stay separate") {
    val edges = Seq((20L, 21L), (21L, 22L), (22L, 20L), // cycle
      (10L, 11L), // pair
      (1L, 2L), (2L, 3L)) // path
    val lbl = labelsOf(edges)
    assert(lbl == Map(20L -> 20L, 21L -> 20L, 22L -> 20L,
      10L -> 10L, 11L -> 10L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty pair set yields empty labeling") {
    import spark.implicits._
    assert(DedupOps.clusters(Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
  }

  test("fixture clusters agree with an independent transitive closure") {
    val pairs = DedupOps.ngramJaccardPairs(spark, sf0001, minSim = 0.2)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain planted near-dups")
    // reference labeling: union-find over the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(v: Long): Long = {
      val p = parent.getOrElseUpdate(v, v)
      if (p == v) v else { val r = find(p); parent(v) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(v => v -> find(v)).toMap
    val got = DedupOps.duplicateClusters(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("clusterSafeSplit: clusters never span splits; singletons match hashSplit") {
    val d = sf0001
    val rows = TrainPrepOps.clusterSafeSplit(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val clustered = DedupOps.duplicateClusters(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every document appears exactly once
    assert(rows.map(_._1).distinct.length === rows.length)
    // all members of a cluster share the SAME split
    val byGroup = rows.filter(r => clustered.contains(r._1)).groupBy(_._2)
    assert(byGroup.nonEmpty && byGroup.values.forall(_.map(_._3).distinct.length == 1))
    // singleton assignments coincide with the per-doc hashSplit
    val perDoc = TrainPrepOps.hashSplit(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    rows.filterNot(r => clustered.contains(r._1)).foreach { case (id, gk, sp) =>
      assert(gk === id)
      assert(sp === perDoc(id), s"singleton $id drifted from hashSplit")
    }
  }

  test("crossSourceLeakage: cell counts reconcile with the raw pair table") {
    val d = sf0001
    import org.apache.spark.sql.functions.col
    val cells = DedupOps.crossSourceLeakage(spark, d).collect()
    val nPairs = DedupOps.ngramJaccardPairs(spark, d).count()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum === nPairs,
      "every near-dup pair lands in exactly one source cell")
    cells.foreach { r =>
      assert(r.getAs[String]("source_lo") <= r.getAs[String]("source_hi"))
      val m = r.getAs[Double]("mean_jaccard")
      assert(m >= 0.2 - 1e-6 && m <= 1.0 + 1e-6)
    }
  }

  test("neardupDegreeDist: degree mass equals twice the pair count") {
    val d = sf0001
    val dist = DedupOps.neardupDegreeDist(spark, d).collect()
      .map(r => r.getAs[Long]("degree") -> r.getAs[Long]("n_docs"))
    val nPairs = DedupOps.ngramJaccardPairs(spark, d).count()
    assert(dist.map { case (deg, n) => deg * n }.sum === 2 * nPairs,
      "handshake lemma: total degree = 2·|edges|")
    assert(dist.forall { case (deg, n) => deg >= 1 && n >= 1 })
  }

  test("keyphrases: k ranked terms per source, scores non-increasing") {
    val rows = graft.operators.TextOps.keyphrases(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rank"),
        r.getAs[Double]("score")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq === (1 to ordered.length).toSeq)
      assert(ordered.length <= 5)
      // ranks follow score: non-increasing down the list
      val scores = ordered.map(_._3).toSeq
      assert(scores.zip(scores.drop(1)).forall { case (x, y) => x >= y - 1e-9 })
    }
  }

  test("shingleDfProfile: bucket invariants hold and posting mass is positive") {
    val rows = DedupOps.shingleDfProfile(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val totalPostings = rows.map(_.getAs[Long]("n_postings")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("capped_postings") <= r.getAs[Long]("n_postings"))
      assert(r.getAs[Long]("n_capped_shingles") <= r.getAs[Long]("n_shingles"))
      // bucket b holds dfs in [2^b, 2^(b+1)): shingles*2^b <= postings
      val b = r.getAs[Int]("df_bucket")
      assert(r.getAs[Long]("n_shingles") * (1L << b) <= r.getAs[Long]("n_postings"))
      assert(r.getAs[Long]("n_postings") <
        r.getAs[Long]("n_shingles") * (1L << (b + 1)))
    }
    assert(totalPostings > 0)
  }

  test("clusterSizeProfile reconciles with the live cluster assignment") {
    val prof = DedupOps.clusterSizeProfile(spark, sf0001).collect()
    assert(prof.nonEmpty)
    val cl = DedupOps.duplicateClusters(spark, sf0001).collect()
    val sizes = cl.groupBy(_.getAs[Long]("cluster_id")).map(_._2.length.toLong)
    assert(prof.map(_.getAs[Long]("n_clusters")).sum == sizes.size.toLong)
    assert(prof.map(_.getAs[Long]("n_docs")).sum == cl.length.toLong)
    assert(prof.map(_.getAs[Long]("dup_excess")).sum ==
      cl.length.toLong - sizes.size)
    prof.foreach { r =>
      val b = r.getAs[Int]("size_bucket")
      assert(b >= 1, "pair-built clusters have size >= 2 so bucket >= 1")
      // bucket b holds sizes in [2^b, 2^(b+1))
      assert(r.getAs[Long]("n_docs") >= r.getAs[Long]("n_clusters") * (1L << b))
      assert(r.getAs[Long]("n_docs") <
        r.getAs[Long]("n_clusters") * (1L << (b + 1)))
    }
  }

  test("clusterTransitivity: direct mass reconciles with the live pair table") {
    val rows = DedupOps.clusterTransitivity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val nPairs = DedupOps.ngramJaccardPairs(spark, sf0001).count()
    // every qualifying pair is intra-cluster by construction
    assert(rows.map(_.getAs[Long]("direct_pairs")).sum == nPairs)
    rows.foreach { r =>
      val poss = r.getAs[Long]("possible_pairs")
      val direct = r.getAs[Long]("direct_pairs")
      assert(direct >= 1L && direct <= poss)
      val infl = r.getAs[Double]("closure_inflation")
      assert(infl >= 0.0 && infl < 1.0)
    }
  }

  test("collocations: planted adjacent pair gets the hand-computed lift") {
    import spark.implicits._
    // 5 docs "x y" + one 10-token filler: N=20 tokens, B=14 bigram slots,
    // c_xy=5, c_x=c_y=5 → lift = 5·20²·10⁶ / (14·5·5) half-up = 5.714286
    val docs = (Seq.fill(5)("x y") ++
      Seq((1 to 10).map(i => s"f$i").mkString(" "))).toDF("text")
    val out = TextOps.collocationsOf(docs, minCount = 5L, k = 10).collect()
    assert(out.length == 1, s"only (x,y) clears minCount: ${out.toSeq}")
    val r = out.head
    assert((r.getAs[String]("w1"), r.getAs[String]("w2")) == ("x", "y"))
    assert(r.getAs[Long]("c_ab") == 5L && r.getAs[Long]("c_a") == 5L)
    assert(math.abs(r.getAs[Double]("lift") - 5.714286) < 1e-9)
  }

  test("waterfillBudget: allocation is feasible, fair, and budget-tight") {
    val rows = graft.operators.TrainPrepOps.waterfillBudget(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val budget = rows.map(_.getAs[Long]("cap_tokens")).sum / 2
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    val clipped = rows.filterNot(_.getAs[Boolean]("funded"))
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("cap_tokens"))
      assert(r.getAs[Double]("util") > 0.0 && r.getAs[Double]("util") <= 1.0)
    }
    assert(alloc <= budget)
    assert(budget - alloc < math.max(clipped.length, 1),
      s"slack ${budget - alloc} >= ${clipped.length} clipped sources")
    // every clipped source sits exactly on the waterline, above all funded
    if (clipped.nonEmpty) {
      assert(clipped.map(_.getAs[Long]("alloc_tokens")).distinct.length === 1)
      val wl = clipped.head.getAs[Long]("waterline")
      rows.filter(_.getAs[Boolean]("funded"))
        .foreach(r => assert(r.getAs[Long]("cap_tokens") <= wl + 1))
    }
  }

  test("boilerplate: planted header is flagged; accounting is consistent") {
    import spark.implicits._
    val header = "copyright acme corp all rights reserved"
    val synth = (1L to 6L).map(i =>
      (i, s"$header unique$i words body$i content$i here$i now$i", "x", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("bp").toString
    synth.write.parquet(s"$tmp/documents.parquet")
    val r = DedupOps.boilerplate(spark, tmp).collect().head
    assert(r.getAs[Long]("n_boiler_shingles") >= 4L) // the header's shingles
    assert(r.getAs[Double]("mean_doc_boiler_frac") > 0.2)
    val fixture = DedupOps.boilerplate(spark, sf0001).collect()
    fixture.foreach { f =>
      assert(f.getAs[Long]("n_boiler_shingles") <= f.getAs[Long]("n_shingles"))
      val mean = f.getAs[Double]("mean_doc_boiler_frac")
      assert(mean >= 0.0 && mean <= f.getAs[Double]("max_doc_boiler_frac") + 1e-9)
    }
  }

  test("winnowPairs: guarantee catches a shared 6-token run; bounds hold") {
    import spark.implicits._
    // two docs sharing a 10-token run (> w+k-1 = 6) must share >= 1 fp
    val shared = (1 to 10).map(i => s"run$i").mkString(" ")
    val synth = Seq(
      (1L, s"alpha beta gamma $shared delta", "x", "s", 0L),
      (2L, s"omega $shared psi chi phi", "x", "s", 0L),
      (3L, "totally different words here now", "x", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("wp").toString
    synth.write.parquet(s"$tmp/documents.parquet")
    val pairs = DedupOps.winnowPairs(spark, tmp, minShared = 1L).collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L), "guaranteed pair missed")
    // fixture-level invariants
    val rows = DedupOps.winnowPairs(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared_fp") <=
        math.min(r.getAs[Long]("n_fp_a"), r.getAs[Long]("n_fp_b")))
      val c = r.getAs[Double]("containment")
      assert(c > 0.0 && c <= 1.0)
    }
  }

  test("quantRecallAudit: overlap bounded by k and int8 stays near-faithful") {
    val rows = graft.operators.VectorOps.quantRecallAudit(spark, sf0001).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0 && ov <= 10)
      assert(r.getAs[Double]("overlap_frac") === ov / 10.0)
    }
    // int8 over 64 dims preserves most of the top-10 on the fixture
    assert(rows.map(_.getAs[Long]("n_overlap")).sum >= 5 * 10 / 2)
  }

  test("effectiveTokens: discount bounded by cluster structure") {
    val d = sf0001
    import org.apache.spark.sql.functions.col
    val rows = TrainPrepOps.effectiveTokens(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_tokens")
      val eff = r.getAs[Double]("effective_tokens")
      val ret = r.getAs[Double]("retention")
      assert(eff > 0.0 && eff <= raw + 1e-6, "discount never inflates")
      assert(ret > 0.0 && ret <= 1.0 + 1e-9)
    }
    // corpus-wide: effective = raw exactly iff there are no clusters; the
    // fixture HAS near-dup clusters, so some source must be discounted
    val clustered = DedupOps.duplicateClusters(spark, d).count()
    assert(clustered > 0)
    assert(rows.exists(_.getAs[Double]("retention") < 1.0))
  }

  test("sourceBudgetCurve: cumulative totals are monotone and close at the full source") {
    val d = sf0001
    val rows = TrainPrepOps.sourceBudgetCurve(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("qbucket"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"),
        r.getAs[Double]("cum_share")))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val ordered = rs.sortBy(-_._2) // qbucket desc = accumulation order
      // cum is the running sum of the per-bucket totals
      assert(ordered.map(_._3).scanLeft(0L)(_ + _).tail.toSeq ===
        ordered.map(_._4).toSeq)
      // the lowest bucket closes the curve at share 1.0
      assert(math.abs(ordered.last._5 - 1.0) < 1e-9)
    }
  }

  private def censusOf(edges: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Double) = {
    import spark.implicits._
    val r = DedupOps.trianglesOfEdges(edges.toDF("a", "b")).collect().head
    (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"),
      r.getAs[Double]("transitivity"))
  }

  test("triangle census: empty graph is all zeros, not nulls") {
    import spark.implicits._
    assert(DedupOps.trianglesOfEdges(Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().head.toSeq === Seq(0L, 0L, 0L, 0L, 0.0))
  }

  test("triangle census: chain, triangle, K4, triangle+pendant") {
    // chain 1-2-3-4: 2 wedges, no triangle
    assert(censusOf(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ==
      ((4L, 3L, 2L, 0L, 0.0)))
    // closed triangle: 3 wedges all closed
    assert(censusOf(Seq((1L, 2L), (1L, 3L), (2L, 3L))) ==
      ((3L, 3L, 3L, 1L, 1.0)))
    // K4: 12 wedges, 4 triangles, transitivity 1
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(censusOf(k4) == ((4L, 6L, 12L, 4L, 1.0)))
    // triangle + pendant off node 3: degrees 2,2,3,1 → 5 wedges, 1 closed
    assert(censusOf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))) ==
      ((4L, 4L, 5L, 1L, 0.6)))
  }

  test("hybridVerdicts: cosine confirm/reject, missing coverage stays unverified") {
    import spark.implicits._
    val cand = Seq((1L, 2L, 0.5), (1L, 3L, 0.4), (2L, 4L, 0.3))
      .toDF("a", "b", "jaccard")
    val emb = Seq( // doc 4 has no embedding
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f)), // cos(1,2) = 1 → confirmed
      (3L, Array(-1f, 0f, 0f, 0f))) // cos(1,3) = −1 → rejected
      .toDF("vec_id", "embedding")
    val out = DedupOps.hybridVerdicts(cand, emb, minCos = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getAs[String]("verdict"))).toMap
    assert(out((1L, 2L)) == ((Some(1.0), "confirmed")))
    assert(out((1L, 3L)) == ((Some(-1.0), "rejected")))
    assert(out((2L, 4L)) == ((None, "unverified")))
  }

  test("incrementalClusters: new/joined/merged attach, recompute-equivalent") {
    import spark.implicits._
    val ta = "a b c d e f g h"
    val tb = "p q r s t u v w"
    val tc = "m n o x y z k j"
    val corpus = Seq(
      (1L, ta), (2L, ta), // cluster A (label 1)
      (3L, tb), (4L, tb), // cluster B (label 3)
      (5L, tc)) // singleton
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = Seq(
      (101L, ta), // verbatim resubmission → A
      (102L, "zz yy xx ww vv uu tt"), // unseen → new singleton
      (103L, "a b c d p q r s"), // bridges A and B (jac exactly 0.2 each)
      (104L, "m n o x y z k q"), // near-dup of the singleton 5
      (105L, "fresh pair text one two three"), // new cluster with 106
      (106L, "fresh pair text one two three"))
      .toDF("doc_id", "text")
    val out = DedupOps.incrementalClusters(spark, dir, batch)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("n_corpus_clusters"),
          r.getAs[String]("status"))).toMap
    // status is a COMPONENT property: 103 bridges clusters A and B, so
    // everything in that component (101 included) reports the merge
    assert(out(101L) == ((1L, 2L, "merged")))
    assert(out(103L) == ((1L, 2L, "merged")))
    assert(out(102L) == ((102L, 0L, "new")))
    assert(out(104L) == ((5L, 1L, "joined")))
    assert(out(105L) == ((105L, 0L, "new")))
    assert(out(106L) == ((105L, 0L, "new")))

    // the driver union-find fast path and the distributed propagation
    // path must be row-identical on the same input
    val distributed = DedupOps
      .incrementalClusters(spark, dir, batch, smallGraphEdges = 0L)
      .collect().map(_.toSeq).toSeq
    assert(distributed === DedupOps.incrementalClusters(spark, dir, batch)
      .collect().map(_.toSeq).toSeq)

    // no df cap is active at this size, so the incremental attach must
    // equal a FULL recompute over corpus ∪ batch
    val unionDir = java.nio.file.Files.createTempDirectory("graft-incr-u")
      .toString
    corpus.union(batch.select(col("doc_id"), col("text"), lit("en"),
        lit("src"), length(col("text")).cast("long")))
      .write.mode("overwrite").parquet(s"$unionDir/documents.parquet")
    val full = DedupOps.duplicateClusters(spark, unionDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, (cluster, _, _)) =>
      assert(full.getOrElse(id, id) === cluster,
        s"batch doc $id: incremental $cluster vs recompute ${full.get(id)}")
    }
  }

  test("triangle census property: random graphs agree with brute force") {
    // 10 nodes → 45 possible edges → one random 45-bit mask per case;
    // covers degree-tie orientation cases the hand-picked graphs miss
    val pairs10 = (for (i <- 1L to 10L; j <- (i + 1) to 10L)
      yield (i, j)).toIndexedSeq
    forSamples(org.scalacheck.Gen.choose(0L, (1L << 45) - 1), n = 12) { mask =>
      val edges = pairs10.zipWithIndex.collect {
        case (e, i) if ((mask >> i) & 1L) == 1L => e
      }
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
      val expTri = edges.map { case (a, b) =>
        (adj(a) & adj(b)).count(_ > b)
      }.sum.toLong
      val expWedges = adj.values
        .map(n => n.size.toLong * (n.size - 1) / 2).sum
      val got = censusOf(edges)
      assert(got == ((adj.size.toLong, edges.length.toLong, expWedges,
        expTri, got._5)), s"mask=$mask edges=$edges")
    }
  }

  test("fixture triangle count agrees with an in-memory brute force") {
    val pairs = DedupOps.ngramJaccardPairs(spark, sf0001, minSim = 0.2)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val tri = pairs.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b) // a < b < c once per triangle
    }.sum
    val wedges = adj.values.map(n => n.size.toLong * (n.size - 1) / 2).sum
    val r = DedupOps.neardupTriangles(spark, sf0001).collect().head
    assert(r.getAs[Long]("n_nodes") == adj.size.toLong)
    assert(r.getAs[Long]("n_edges") == pairs.length.toLong)
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("n_triangles") == tri.toLong)
  }
}
