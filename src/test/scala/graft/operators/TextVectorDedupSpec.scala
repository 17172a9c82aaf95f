package graft.operators

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic tests for the text / dedup / vector / multimodal packs on a
  * hand-built corpus (written as fixture-shaped parquet so the operators
  * run exactly as in production).
  */
class TextVectorDedupSpec extends SparkSpec with graft.PropSpec {

  test("property: typoPairs ≡ brute-force levenshtein on random vocabularies") {
    import spark.implicits._
    import org.scalacheck.Gen
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // 3-letter alphabet, lengths 2-5 → dense edit-distance neighborhoods
    val wordGen = Gen.choose(2, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = Gen.listOfN(7, wordGen).map(_.distinct)
    forSamples(vocabGen, n = 8) { vocab =>
      val corpus = Seq((0L, vocab.mkString(" "))).toDF("doc_id", "text")
      val got = TextOps.typoPairsOf(corpus, maxEdit = 2).collect()
        .map(r => (r.getAs[String]("term_a"), r.getAs[String]("term_b"),
          r.getAs[Int]("lev"))).toSet
      val brute = (for {
        a <- vocab; b <- vocab if a < b && lev(a, b) <= 2
      } yield (a, b, lev(a, b))).toSet
      assert(got === brute, s"vocab=$vocab")
    }
  }

  /** Tiny corpus with planted duplicates:
    *  0: base text, 1: exact copy of 0, 2: near-dup of 0 (one word changed),
    *  3: unrelated, 4: too short for 3-shingles.
    */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-corpus").toString
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox leaps over the lazy dog again and again"
    val other = "completely different content about spark catalyst expressions here"
    Seq(
      (0L, base, "en", "web", base.length.toLong),
      (1L, base, "en", "web", base.length.toLong),
      (2L, near, "en", "web", near.length.toLong),
      (3L, other, "en", "web", other.length.toLong),
      (4L, "too short", "en", "web", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val e = (0 until 6).map { i =>
      val v = (0 until 64).map(j =>
        if (i < 2) (if (j == 0) 1f else 0f)           // 0,1: identical e_0
        else if (i == 2) (if (j == 0) 0.9f else if (j == 1) 0.1f else 0f) // near 0
        else if (j == i) 1f else 0f)                  // others: distinct axes
      (i.toLong, v.toArray, i % 2)
    }
    e.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("exactDuplicates groups identical texts under the min doc_id") {
    val rows = DedupOps.exactDuplicates(spark, dir).collect()
    assert(rows.length === 4) // 5 docs, one exact pair
    val dup = rows.find(_.getAs[Long]("n_copies") === 2L).get
    assert(dup.getAs[Long]("canonical_doc_id") === 0L)
  }

  test("ngramJaccardPairs: exact dup at 1.0, near-dup in (0,1), short doc excluded") {
    val pairs = DedupOps.ngramJaccardPairs(spark, dir, minSim = 0.1, maxDf = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) === 1.0)
    val nearSim = pairs((0L, 2L))
    assert(nearSim > 0.3 && nearSim < 1.0)
    assert(pairs((1L, 2L)) === nearSim) // copy has identical similarity
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("canonNearDupPairs: exact group contracts; weights carry raw multiplicity") {
    val pairs = DedupOps.canonNearDupPairs(spark, dir, minSim = 0.1, maxDf = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // the 0≡1 exact pair is contracted away; 0's canonical meets 2 once,
    // standing for the two raw pairs (0,2) and (1,2)
    assert(!pairs.contains((0L, 1L)))
    val (j, wa, wb, rp) = pairs((0L, 2L))
    val raw = DedupOps.ngramJaccardPairs(spark, dir, minSim = 0.1, maxDf = 0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j === raw((0L, 2L)))
    assert(wa === 2L && wb === 1L && rp === 2L)
  }

  test("property: contraction-first pair stats ≡ raw machinery on replicated corpora") {
    import spark.implicits._
    // random bases, each replicated 1–3× under fresh ids — the dir-level
    // path contracts exact groups and expands back; containmentPairsOf
    // computes the same pairs through the RAW uncached machinery
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val gen = for {
      nBase <- org.scalacheck.Gen.choose(3, 7)
      texts <- org.scalacheck.Gen.listOfN(nBase,
        org.scalacheck.Gen.listOfN(8, org.scalacheck.Gen.oneOf(words))
          .map(_.mkString(" ")))
      reps <- org.scalacheck.Gen.listOfN(nBase, org.scalacheck.Gen.choose(1, 3))
    } yield texts.zip(reps)
    forSamples(gen, n = 8) { spec =>
      val rows = spec.zipWithIndex.flatMap { case ((t, k), i) =>
        (0 until k).map(r => (i * 10L + r, t)) // distinct raw ids per replica
      }
      val d = Files.createTempDirectory("graft-contr").toString
      rows.toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
      for (cap <- Seq(0L, 3L)) {
        val got = DedupOps.ngramJaccardPairs(spark, d, minSim = 0.0, maxDf = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val want = DedupOps.containmentPairsOf(
            rows.toDF("doc_id", "text"), minCont = 0.0, maxDf = cap)
          .select(col("a"), col("b"), col("jaccard"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(got === want, s"cap=$cap corpus=$rows")

        // the closed-form structure consumers (degree dist / triangle
        // census / threshold curve) must equal brute force over the RAW
        // pair set — the contracted-graph math is exact, not approximate
        val t = 0.3
        val raw = want.filter(_._3 >= t)
        val degs = raw.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val wantDegHist = degs.values.groupBy(identity)
          .map { case (deg, g) => deg -> g.size.toLong }
        val gotDegHist = DedupOps.neardupDegreeDist(spark, d, minSim = t, maxDf = cap)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotDegHist === wantDegHist, s"degree cap=$cap corpus=$rows")

        import spark.implicits._
        val rawEdges = raw.toSeq.map(p => (p._1, p._2)).toDF("a", "b")
        val wantTri = DedupOps.trianglesOfEdges(rawEdges)
          .collect()(0).toSeq
        val gotTri = DedupOps.neardupTriangles(spark, d, minSim = t, maxDf = cap)
          .collect()(0).toSeq
        assert(gotTri === wantTri, s"triangles cap=$cap corpus=$rows")

        val thrs = Seq(0.2, 0.5, 0.8)
        val gotCurve = DedupOps.thresholdCurve(spark, d, thrs, maxDf = cap)
          .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSeq
        val jqOf = (j: Double) => math.round(j * 1e6)
        val wantCurve = thrs.flatMap { th =>
          val surv = want.filter(p => jqOf(p._3) >= math.round(th * 1e6))
          if (surv.isEmpty) None
          else {
            val sj = surv.toSeq.map(p => jqOf(p._3)).sum
            val n = surv.size.toLong
            val nd = surv.flatMap(p => Seq(p._1, p._2)).size.toLong
            val mean = ((2L * sj + n) / (2L * n)).toDouble / 1e6
            Some((th, n, nd, mean))
          }
        }
        assert(gotCurve === wantCurve, s"curve cap=$cap corpus=$rows")

        // brute-force anchor: q_dedup_kcore
        // bounded k-core peel: the contracted group-atomic peel must
        // equal the raw peel over the brute-force pair set, round by round
        val kc = 2
        var eCur = raw.map(p => (p._1, p._2))
        var nCur = eCur.flatMap(p => Seq(p._1, p._2))
        val wantPeel = scala.collection.mutable.ArrayBuffer(
          (0, nCur.size.toLong, eCur.size.toLong))
        for (r <- 1 to 2) {
          val deg = eCur.toSeq.flatMap(p => Seq(p._1, p._2))
            .groupBy(identity).map { case (n, v) => n -> v.size }
          nCur = nCur.filter(n => deg.getOrElse(n, 0) >= kc)
          eCur = eCur.filter(p => nCur(p._1) && nCur(p._2))
          wantPeel += ((r, nCur.size.toLong, eCur.size.toLong))
        }
        // duplicateClusters: contracted label propagation + member
        // expansion must equal union-find over the brute-force pair set
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        raw.foreach { p =>
          val (ra, rb) = (find(p._1), find(p._2))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val wantClusters = raw.toSeq.flatMap(p => Seq(p._1, p._2)).distinct
          .map(x => (x, find(x))).sortBy(_._1)
        val gotClusters = DedupOps.duplicateClusters(spark, d,
            minSim = t, maxDf = cap)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(gotClusters === wantClusters, s"clusters cap=$cap corpus=$rows")

        // nearest neighbor: the closed-form (contracted) spelling must
        // equal the raw arg-max over the brute-force pair set
        val wantNearest = want.toSeq
          .flatMap(p => Seq((p._1, p._2, math.round(p._3 * 1e6)),
                            (p._2, p._1, math.round(p._3 * 1e6))))
          .groupBy(_._1).toSeq.map { case (docId, cands) =>
            val best = cands.maxBy(c => (c._3, -c._2))
            (docId, best._2, best._3.toDouble / 1e6, cands.size.toLong)
          }.sortBy(_._1)
        val gotNearest = DedupOps.nearestNeighbors(spark, d, maxDf = cap)
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
        assert(gotNearest === wantNearest, s"nearest cap=$cap corpus=$rows")

        // both size-gate paths (driver loop / distributed checkpoint
        // rounds) must equal the brute-force raw peel
        for (gate <- Seq(1L << 20, 0L)) {
          val gotPeel = DedupOps.kcorePeel(spark, d, kCore = kc, rounds = 2,
              minSim = t, maxDf = cap, smallGraphEdges = gate)
            .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
          assert(gotPeel === wantPeel.toSeq,
            s"kcore cap=$cap gate=$gate corpus=$rows")
        }
      }
    }
  }

  test("kcore peel working set is O(edges + dup groups), never corpus-sized (VERDICT r12 #1)") {
    import spark.implicits._
    // Plant a "well-deduplicated corpus" shape: many non-incident singleton
    // canonical groups (w = 1, no near-dup edges), a few edges, a couple of
    // exact-dup groups. kcorePeel's driver fast path collects EXACTLY
    // peelWorkingSet's output (and gates on its count), so bounding this
    // frame bounds the driver materialization: non-incident singletons —
    // the dominant mass of a cleaned 100 TB corpus — must never appear.
    val nSingletons = 5000L
    val nodes = spark.range(nSingletons)
      .select(col("id").as("g"), lit(1L).as("w"))
      .unionByName(Seq((5000L, 3L), (5001L, 2L)).toDF("g", "w"))
    val edges = Seq((10L, 11L), (12L, 13L), (14L, 15L)).toDF("a", "b")
    val got = DedupOps.peelWorkingSet(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 1L), (11L, 1L), (12L, 1L), (13L, 1L),
      (14L, 1L), (15L, 1L), (5000L, 3L), (5001L, 2L)),
      "working set must be edge-incident ∪ (w >= 2) only")
    assert(got.size.toLong <= 2L * 3L + 2L,
      "collected rows must be O(edges + dup groups), independent of corpus size")
    // dup groups that are ALSO edge-incident must not duplicate rows
    val edges2 = Seq((5000L, 10L)).toDF("a", "b")
    val got2 = DedupOps.peelWorkingSet(nodes, edges2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 === Set((10L, 1L), (5000L, 3L), (5001L, 2L)))
    assert(DedupOps.peelWorkingSet(nodes, edges2).count() === 3L)
  }

  test("property: contraction-first LSH family ≡ brute-force signatures on replicated corpora") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def shinglesOf(t: String): Vector[String] = {
      val toks = t.split(" ").toVector
      if (toks.length < 3) Vector.empty
      else toks.sliding(3).map(_.mkString(" ")).toVector.distinct
    }
    def sigOf(shs: Vector[String]): Vector[Long] = {
      val hs = shs.map(sh =>
        java.lang.Long.parseLong(md5hex(sh).take(15), 16) % 2147483647L)
      (0 until 32).toVector.map(i =>
        hs.map(h => ((i + 1) * h + i * 7919L) % 2147483647L).min)
    }
    def buckets(sig: Vector[Long], rows: Int): Vector[String] =
      (0 until 32 / rows).toVector.map(b =>
        md5hex(sig.slice(b * rows, b * rows + rows).mkString(",")))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val gen = for {
      nBase <- org.scalacheck.Gen.choose(3, 6)
      texts <- org.scalacheck.Gen.listOfN(nBase,
        org.scalacheck.Gen.listOfN(8, org.scalacheck.Gen.oneOf(words))
          .map(_.mkString(" ")))
      reps <- org.scalacheck.Gen.listOfN(nBase, org.scalacheck.Gen.choose(1, 3))
    } yield texts.zip(reps)
    forSamples(gen, n = 6) { spec =>
      val rowsIn = spec.zipWithIndex.flatMap { case ((t, k), i) =>
        (0 until k).map(r => (i * 10L + r, t))
      }
      val d = Files.createTempDirectory("graft-lsh").toString
      rowsIn.toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$d/documents.parquet")
      val sigs = rowsIn.map { case (id, t) => id -> sigOf(shinglesOf(t)) }.toMap
      val sets = rowsIn.map { case (id, t) => id -> shinglesOf(t).toSet }.toMap
      val ids = rowsIn.map(_._1)
      val pairs = for { a <- ids; b <- ids if a < b } yield (a, b)
      def estOf(a: Long, b: Long): Double =
        r6(sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 32)
      def candAt(rows: Int, a: Long, b: Long): Boolean =
        buckets(sigs(a), rows).zip(buckets(sigs(b), rows))
          .exists { case (x, y) => x == y }
      def jacOf(a: Long, b: Long): Option[Double] = {
        val i = (sets(a) intersect sets(b)).size
        if (i == 0) None else Some(r6(i.toDouble / (sets(a) ++ sets(b)).size))
      }
      // 1. candidate pairs: raw banded self-join semantics from the
      // contracted computation
      val wantLsh = pairs.filter(p => candAt(4, p._1, p._2))
        .map { case (a, b) => (a, b, estOf(a, b)) }
        .filter(_._3 >= 0.5).sorted
      val gotLsh = DedupOps.minhashLshPairs(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(gotLsh === wantLsh, s"lsh corpus=$rowsIn")
      // 2. estimate-calibration rollup: weighted canon rollup vs the raw
      // per-pair rollup
      val graded = wantLsh.map { case (a, b, est) =>
        val eq = math.round(est * 1e6)
        val xq = jacOf(a, b).map(j => math.round(j * 1e6)).getOrElse(0L)
        (math.floor(est * 10).toInt, eq, xq, math.abs(eq - xq))
      }
      val wantCal = graded.groupBy(_._1).toSeq.map { case (b10, g) =>
        val n = g.size.toLong
        (b10 / 10.0, n,
          r6(g.map(_._2).sum.toDouble / n / 1e6),
          r6(g.map(_._3).sum.toDouble / n / 1e6),
          r6(g.map(_._4).sum.toDouble / n / 1e6),
          r6(g.map(_._4).max.toDouble / 1e6))
      }.sortBy(_._1)
      val gotCal = DedupOps.sketchCalibration(spark, d).collect().map(r =>
        (r.getDouble(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toSeq
      assert(gotCal === wantCal, s"calib corpus=$rowsIn")
      // 3. band-geometry tuning counts: weighted candidate/hit totals vs
      // brute force per geometry
      val cut = 500000L
      val jqs = pairs.flatMap(p =>
        jacOf(p._1, p._2).map(j => p -> math.round(j * 1e6))).toMap
      val nTrue = jqs.count(_._2 >= cut).toLong
      def hud(num: Long, den: Long): Double =
        ((2 * num + den) / (2 * den)).toDouble / 1e6
      val wantCurve = Seq(2, 4, 8).map { r =>
        val cs = pairs.filter(p => candAt(r, p._1, p._2))
        val nc = cs.size.toLong
        val nh = cs.count(p => jqs.getOrElse(p, 0L) >= cut).toLong
        (r, 32 / r, nc, nTrue,
          hud(1000000L * nh, math.max(nTrue, 1L)),
          hud(1000000L * nh, math.max(nc, 1L)))
      }
      val gotCurve = DedupOps.lshTuningCurve(spark, d).collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toSeq
      assert(gotCurve === wantCurve, s"curve corpus=$rowsIn")
    }
  }

  test("property: novelty / dup-shingle / df-profile contraction ≡ raw brute force") {
    import spark.implicits._
    def sh3(t: String): Vector[String] = {
      val toks = t.split(" ").toVector
      if (toks.length < 3) Vector.empty
      else toks.sliding(3).map(_.mkString(" ")).toVector.distinct
    }
    def win5(t: String): Vector[String] = {
      val toks = t.split(" ").toVector
      if (toks.length < 5) Vector.empty
      else toks.sliding(5).map(_.mkString(" ")).toVector // WITH multiplicity
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val gen = for {
      nBase <- org.scalacheck.Gen.choose(3, 6)
      texts <- org.scalacheck.Gen.listOfN(nBase,
        org.scalacheck.Gen.listOfN(8, org.scalacheck.Gen.oneOf(words))
          .map(_.mkString(" ")))
      reps <- org.scalacheck.Gen.listOfN(nBase, org.scalacheck.Gen.choose(1, 3))
    } yield texts.zip(reps)
    forSamples(gen, n = 6) { spec =>
      val rowsIn = spec.zipWithIndex.flatMap { case ((t, k), i) =>
        (0 until k).map(r => (i * 10L + r, t))
      }
      val d = Files.createTempDirectory("graft-nvl").toString
      rowsIn.toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$d/documents.parquet")
      // novelty over the distinct 3-shingle index
      val first = rowsIn.flatMap { case (id, t) => sh3(t).map(_ -> id) }
        .groupBy(_._1).map { case (sh, g) => sh -> g.map(_._2).min }
      val wantNov = rowsIn.filter(r => sh3(r._2).nonEmpty)
        .map { case (id, t) =>
          val shs = sh3(t)
          val nov = shs.count(sh => first(sh) == id).toLong
          (id, shs.size.toLong, nov, r6(nov.toDouble / shs.size))
        }.sortBy(_._1)
      val gotNov = DedupOps.contentNovelty(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(gotNov === wantNov, s"novelty corpus=$rowsIn")
      // positional 5-gram dup fraction
      val cnt = rowsIn.flatMap { case (_, t) => win5(t) }
        .groupBy(identity).map { case (fp, g) => fp -> g.size.toLong }
      val wantDup = rowsIn.filter(r => win5(r._2).nonEmpty)
        .map { case (id, t) =>
          val ws = win5(t)
          val dup = ws.count(fp => cnt(fp) > 1).toLong
          (id, ws.size.toLong, dup, r6(dup.toDouble / ws.size))
        }.sortBy(_._1)
      val gotDup = DedupOps.dupShingleFrac(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(gotDup === wantDup, s"dupfrac corpus=$rowsIn")
      // df histogram (bucket = floor(log2(df)))
      val dfs = rowsIn.flatMap { case (id, t) => sh3(t).map(_ -> id) }
        .groupBy(_._1).map { case (_, g) => g.map(_._2).size.toLong }
      val wantDf = dfs.groupBy(df => 63 - java.lang.Long.numberOfLeadingZeros(df))
        .toSeq.map { case (b, g) =>
          (b, g.size.toLong, g.sum,
            g.count(_ > 1000L).toLong, g.filter(_ > 1000L).sum)
        }.sortBy(_._1)
      val gotDf = DedupOps.shingleDfProfile(spark, d).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(gotDf === wantDf, s"dfprofile corpus=$rowsIn")
      // per-doc pure-text wrappers: contracted dir form ≡ raw Of form
      val rawDocs = rowsIn.toDF("doc_id", "text")
      assert(TrainPrepOps.piiRedact(spark, d).collect().map(_.toSeq).toSeq
        === TrainPrepOps.piiRedactOf(rawDocs).collect().map(_.toSeq).toSeq,
        s"pii corpus=$rowsIn")
      assert(TextOps.repeatSpans(spark, d, k = 2, minRun = 3)
        .collect().map(_.toSeq).toSeq
        === TextOps.repeatSpansOf(rawDocs, k = 2, minRun = 3)
          .collect().map(_.toSeq).toSeq,
        s"repeatspans corpus=$rowsIn")
    }
  }

  test("ngramJaccard df-cap removes pairs that only share boilerplate") {
    // cap at df<=2: shingles shared by all of 0,1,2 (df=3) are dropped;
    // 0-1 remain dups via their full overlap; 0-2 lose their only common
    // (df=3) shingles → the near-dup pair disappears
    val pairs = DedupOps.ngramJaccardPairs(spark, dir, minSim = 0.1, maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("minhashLshPairs surfaces the exact duplicate at estimate 1.0") {
    val pairs = DedupOps.minhashLshPairs(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) === 1.0)
  }

  test("simhashPairs: identical docs at distance 0") {
    val pairs = DedupOps.simhashPairs(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 1L)) === 0)
  }

  test("tokenStats / fingerprints agree with hand counts") {
    val ts = TextOps.tokenStats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
    assert(ts(0L) === 12)
    assert(ts(4L) === 2)
    val fp = TextOps.fingerprints(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("sketch")).toMap
    assert(fp(0L) === "the|the|again") // first | middle | last token
    val md5s = TextOps.fingerprints(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("md5")).toMap
    assert(md5s(0L) === md5s(1L)); assert(md5s(0L) != md5s(2L))
  }

  test("languageId scores stopword profiles deterministically") {
    val rows = TextOps.languageId(spark, dir).collect()
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getAs[String]("lang_predicted") === "en") // 'the'×2, 'and' hit en
    assert(r0.getAs[Double]("confidence") > 0)
  }

  test("cosineTopK ranks the exact-copy embedding first") {
    val top = VectorOps.cosineTopK(spark, dir, queryId = 0L, k = 3).collect()
    assert(top.head.getAs[Long]("vec_id") === 1L)
    assert(math.abs(top.head.getAs[Double]("cos_sim") - 1.0) < 1e-9)
    assert(top(1).getAs[Long]("vec_id") === 2L) // the near vector
  }

  test("ivfTopK only scans the query's cell but still finds the copy") {
    val top = VectorOps.ivfTopK(spark, dir, queryId = 0L, k = 5).collect()
    assert(top.map(_.getAs[Long]("vec_id")).contains(1L))
    assert(top.map(_.getAs[Long]("cell")).distinct.length === 1)
  }

  test("nearDupPairsExact finds exactly the planted near/exact pairs at 0.85") {
    val pairs = VectorOps.nearDupPairsExact(spark, dir, minSim = 0.85, maxId = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("LSH near-dup finds the planted pairs without an all-pairs stage") {
    val pairs = VectorOps.nearDupPairsLsh(spark, dir, minSim = 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact copies share a cell and are found; vec 2's small positive
    // second dim flips a sign bit into another cell — the documented
    // recall tradeoff of single-probe LSH (multi-probe would recover it)
    assert(pairs === Set((0L, 1L)))
  }

  test("materialized IVF index probe prunes to the query's cell partition") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf").toString + "/index"
    VectorOps.writeIvfIndex(spark, dir, idx)
    val qv = (0 until 64).map(j => if (j == 0) 1f else 0f).toArray
    val probe = VectorOps.ivfProbe(spark, idx, qv, k = 5)
    // partition pruning visible in the physical plan
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition filter in:\n$plan")
    val got = probe.collect().map(_.getAs[Long]("vec_id"))
    assert(got.contains(1L)) // the exact copy is in the probed cell

    // incremental append: a new vector lands in the probed cell without
    // rewriting anything, and pruning still holds
    import spark.implicits._
    val before = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toSet
    val newVec = (0 until 64).map(j => if (j == 0) 0.9f else 0f).toArray
    VectorOps.appendIvfIndex(spark, idx,
      Seq((100L, newVec)).toDF("vec_id", "embedding"))
    val after = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toSet
    assert(before.subsetOf(after), "append must not rewrite existing files")
    val probe2 = VectorOps.ivfProbe(spark, idx, qv, k = 5)
    val plan2 = probe2.queryExecution.executedPlan.toString
    assert(plan2.contains("PartitionFilters") && plan2.contains("cell"))
    val got2 = probe2.collect().map(_.getAs[Long]("vec_id"))
    assert(got2.contains(100L) && got2.contains(1L))
  }

  test("learned-quantizer IVF index: probe prunes, append reuses the persisted model") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-kivf").toString + "/index"
    VectorOps.writeIvfKmeansIndex(spark, dir, idx, k = 3, iters = 2)
    val qv = (0 until 64).map(j => if (j == 0) 1f else 0f).toArray
    val probe = VectorOps.ivfKmeansProbe(spark, idx, qv, topK = 5, nProbe = 1)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected cell partition filter in:\n$plan")
    assert(probe.collect().map(_.getAs[Long]("vec_id")).contains(0L))

    // append assigns with the PERSISTED model: the new vector's cell
    // equals a fresh driver-side nearest-centroid of the stored model
    // (an exact copy of qv, so its cell IS the nProbe=1 probe cell)
    VectorOps.appendIvfKmeansIndex(spark, idx,
      Seq((200L, qv)).toDF("vec_id", "embedding"))
    val data = spark.read.parquet(s"$idx/data")
    val cents = spark.read.parquet(s"$idx/model")
      .orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    def nearest(v: Array[Float]): Int = cents.zipWithIndex.minBy { case (c, i) =>
      (c.zip(v.map(_.toDouble)).map { case (a, b) =>
        (a - b) * (a - b) }.sum, i)
    }._2
    val gotCell = data.where(col("vec_id") === 200L)
      .select(col("cell")).head().getInt(0)
    assert(gotCell === nearest(qv))
    // and the appended vector is reachable through the pruned probe
    val got2 = VectorOps.ivfKmeansProbe(spark, idx, qv, topK = 6, nProbe = 1)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(got2.contains(200L))
  }

  test("frameSample expands each video payload into n deterministic frames") {
    val frames = MultimodalOps.frameSample(spark, dir, nFrames = 3).collect()
    // video modality = doc_id % 3 == 2 → only doc 2
    assert(frames.map(_.getAs[Long]("media_id")).distinct.toSeq === Seq(2L))
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 1, 2))
    assert(frames.map(_.getAs[String]("frame_fp")).distinct.length === 3)
  }

  test("extractFeatures: stub histogram sums to ~1 and is modality-tagged") {
    val f = MultimodalOps.extractFeatures(spark, dir).collect()
    assert(f.length === 5)
    assert(f.forall(r => r.getAs[String]("modality").nonEmpty))
    val h = MultimodalOps.decodeStub("abcabc".getBytes)
    assert(math.abs(h.sum - 1.0) < 1e-9)
  }

  test("batchTopK agrees with per-query ivfTopK on every query in the batch") {
    val batch = VectorOps.batchTopK(spark, sf0001, nQueries = 3, k = 4).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(batch.keySet === Set(0L, 1L, 2L))
    for (q <- 0L to 2L) {
      val single = VectorOps.ivfTopK(spark, sf0001, queryId = q, k = 4).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
      val fromBatch = batch(q).sortBy(_.getAs[Int]("rk"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSeq
      assert(fromBatch === single, s"query $q diverged")
    }
  }

  test("property: winnow gap rule ≡ brute-force window-min selection") {
    import org.scalacheck.Gen
    val w = 4
    // brute force: position selected iff it is the min of some length-w
    // window over the sequence padded with +∞ beyond both edges
    def brute(h: Vector[Long]): Set[Int] = {
      val m = h.length
      def at(p: Int) = if (p < 1 || p > m) Long.MaxValue else h(p - 1)
      (for {
        s <- (2 - w) to m
        win = (s until s + w).map(p => (at(p), p))
        (mn, p) = win.min if mn != Long.MaxValue
      } yield p).toSet
    }
    def gapRule(h: Vector[Long]): Set[Int] = {
      val m = h.length
      (1 to m).filter { i =>
        def d(dir: Int) = (1 until w)
          .find(j => i + dir * j >= 1 && i + dir * j <= m &&
            h(i + dir * j - 1) < h(i - 1)).getOrElse(w)
        d(-1) + d(+1) > w
      }.toSet
    }
    forSamples(Gen.listOf(Gen.choose(0L, 1L << 60)).map(_.distinct.toVector),
      n = 200) { h => assert(gapRule(h) === brute(h), s"seq=$h") }
  }

  test("winnowProfile: density tracks 2/(w+1) and accounting is consistent") {
    val rows = TextOps.winnowProfile(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Double]("density")
      assert(d > 0.2 && d < 0.65, s"density $d far from 2/(w+1)=0.4")
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_positions"))
      assert(r.getAs[Long]("n_distinct_fp") <= r.getAs[Long]("n_selected"))
      assert(r.getAs[Long]("n_dup_positions") <= r.getAs[Long]("n_selected"))
    }
  }

  test("charDiversity: gini bounds and degenerate text collapses the score") {
    val rows = TextOps.charDiversity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("mean_gini")
      assert(g > 0.0 && g < 1.0)
      assert(r.getAs[Double]("min_gini") <= g + 1e-9)
      assert(r.getAs[Double]("max_topchar") > 0.0)
      assert(r.getAs[Long]("n_low") <= r.getAs[Long]("n_docs"))
    }
    // a synthesized degenerate doc scores near zero; varied text scores high
    import spark.implicits._
    val synth = Seq((1L, "aaaaaaaaaaaaaaaa", "x", "s", 16L),
        (2L, "the quick brown fox jumps", "x", "s", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = Files.createTempDirectory("cdiv").toString
    synth.write.parquet(s"$tmp/documents.parquet")
    val g = TextOps.charDiversity(spark, tmp).collect().head
    assert(g.getAs[Double]("min_gini") === 0.0) // single-char doc
    assert(g.getAs[Double]("max_topchar") === 1.0)
    assert(g.getAs[Long]("n_low") >= 1L)
  }

  // brute-force anchor: q_vec_ivf_probe_curve
  test("ivfProbeCurve: recall and candidates are monotone in probes") {
    val rows = VectorOps.ivfProbeCurve(spark, sf0001).collect()
      .sortBy(_.getAs[Int]("probes"))
    assert(rows.map(_.getAs[Int]("probes")).toSeq === Seq(1, 2, 4, 8))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        // probing more cells only ever adds candidates, per query
        assert(a.getAs[Long]("total_cands") <= b.getAs[Long]("total_cands"))
        assert(a.getAs[Double]("mean_recall") <=
          b.getAs[Double]("mean_recall") + 1e-9)
      case _ =>
    }
    rows.foreach { r =>
      val mn = r.getAs[Double]("min_recall")
      val mean = r.getAs[Double]("mean_recall")
      assert(mn >= 0.0 && mn <= mean + 1e-9 && mean <= 1.0 + 1e-9)
    }
  }

  test("semanticDecontam: partition accounting and similarity bounds hold") {
    val rows = VectorOps.semanticDecontam(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val emb = graft.Tables.embeddings(spark, sf0001)
    val nTrain = emb.where(col("vec_id") % 20 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n_train")).sum === nTrain)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_train"))
      val mx = r.getAs[Double]("max_maxsim")
      val mn = r.getAs[Double]("mean_maxsim")
      assert(mx >= -1.0 - 1e-9 && mx <= 1.0 + 1e-9)
      assert(mn <= mx + 1e-9)
      // a flagged vector requires max_maxsim to clear the threshold
      if (r.getAs[Long]("n_flagged") > 0) assert(mx >= 0.35)
    }
  }

  test("sketchCalibration: bands cover the LSH pairs, errors bounded by band math") {
    val pairs = DedupOps.minhashLshPairs(spark, sf0001).count()
    val cal = DedupOps.sketchCalibration(spark, sf0001).collect()
    assert(cal.nonEmpty)
    // every candidate pair lands in exactly one band
    assert(cal.map(_.getAs[Long]("n_pairs")).sum === pairs)
    cal.foreach { r =>
      val band = r.getAs[Double]("est_band")
      assert(band >= 0.5 && band <= 1.0) // candidates pass the 0.5 estimate gate
      val me = r.getAs[Double]("mean_est")
      assert(me >= band - 1e-9 && me < band + 0.1 + 1e-9,
        s"mean_est $me outside its band $band")
      assert(r.getAs[Double]("mean_abs_err") <= r.getAs[Double]("max_abs_err") + 1e-9)
      assert(r.getAs[Double]("mean_exact") >= 0.0 && r.getAs[Double]("mean_exact") <= 1.0)
    }
  }

  // brute-force anchor: q_vec_pca_component q_vec_pca_scores
  test("trainPca agrees with a plain-Scala power iteration; scores bracket") {
    val (m, v) = VectorOps.trainPca(spark, sf0001)
    // the trained direction is unit-norm
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    // replay the exact quantized algorithm single-threaded
    val rows = graft.Tables.embeddings(spark, sf0001).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    def q(x: Double): Long = new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val msum = new Array[Long](64)
    rows.foreach(r => (0 until 64).foreach(i => msum(i) += q(r(i) * 1e9)))
    val mRef = msum.map(s => s.toDouble / n / 1e9)
    (0 until 64).foreach(i => assert(math.abs(mRef(i) - m(i)) < 1e-12, s"mean dim $i"))
    var vr = Array.fill(64)(0.125)
    for (_ <- 1 to 3) {
      val ws = new Array[Long](64)
      rows.foreach { r =>
        val sh = Array.tabulate(64)(i => r(i) - mRef(i))
        val dt = (0 until 64).foldLeft(0.0)((a, i) => a + sh(i) * vr(i))
        (0 until 64).foreach(i => ws(i) += q((sh(i) * dt) * 1e6))
      }
      val w = ws.map(_.toDouble / 1e6)
      val norm = math.sqrt(w.foldLeft(0.0)((a, x) => a + x * x))
      vr = w.map(_ / norm)
    }
    // micro-unit quantization can differ by one ulp per row between SQL
    // round and BigDecimal rounding; 1e-5 still pins 5 decimals of the
    // direction
    (0 until 64).foreach(i => assert(math.abs(vr(i) - v(i)) < 1e-5, s"dim $i"))
    // label scores: mean within [min, max], labels complete
    val scores = VectorOps.pcaLabelScores(spark, sf0001).collect()
    assert(scores.length === 10)
    scores.foreach { r =>
      assert(r.getAs[Double]("min_score") <= r.getAs[Double]("mean_score"))
      assert(r.getAs[Double]("mean_score") <= r.getAs[Double]("max_score"))
    }
  }

  // brute-force anchor: q_vec_logreg_model q_vec_logreg_eval
  test("trainLogReg agrees with a plain-Scala GD replay; eval separates") {
    val (w, b) = VectorOps.trainLogReg(spark, sf0001)
    // replay the exact quantized algorithm single-threaded
    val rows = graft.Tables.embeddings(spark, sf0001)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val n = rows.length
    def q(x: Double): Long = new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var wr = Array.fill(64)(0.0)
    var br = 0.0
    for (_ <- 1 to 3) {
      val gs = new Array[Long](65)
      rows.foreach { case (label, v) =>
        val y = if (label < 5) 1.0 else 0.0
        val z = (0 until 64).foldLeft(0.0)((a, i) => a + v(i) * wr(i)) + br
        val err = 0.5 * (1.0 + z / (1.0 + math.abs(z))) - y
        (0 until 64).foreach(i => gs(i) += q((err * v(i)) * 1e6))
        gs(64) += q(err * 1e6)
      }
      wr = Array.tabulate(64)(i => wr(i) - 0.5 * ((gs(i).toDouble / 1e6) / n))
      br -= 0.5 * ((gs(64).toDouble / 1e6) / n)
    }
    // micro-unit quantization can differ by one ulp per row between SQL
    // round and BigDecimal rounding; 1e-5 still pins 5 decimals
    (0 until 64).foreach(i => assert(math.abs(wr(i) - w(i)) < 1e-5, s"dim $i"))
    assert(math.abs(br - b) < 1e-5)
    // eval: the probe must separate the target slice — mean p for the
    // positive labels (< 5) strictly above the negative labels' mean
    val ev = VectorOps.logRegEval(spark, sf0001).collect()
    assert(ev.length === 10)
    val pos = ev.filter(_.getAs[Int]("label") < 5).map(_.getAs[Double]("mean_p"))
    val neg = ev.filter(_.getAs[Int]("label") >= 5).map(_.getAs[Double]("mean_p"))
    assert(pos.min > neg.max,
      s"probe does not separate: pos=${pos.toSeq} neg=${neg.toSeq}")
    // model table shape: 64 weights + bias row
    val model = VectorOps.logRegModel(spark, sf0001).collect()
    assert(model.length === 65)
    assert(math.abs(model(64).getAs[Double]("weight") - b) < 1.1e-6)
  }

  // brute-force anchor: q_vec_sim_pagerank
  test("simGraphPageRank agrees with a plain-Scala replay; invariants hold") {
    val got = VectorOps.simGraphPageRank(spark, sf0001).collect()
    val pairs = VectorOps.nearDupPairsLsh(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val nodes = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0))
    val n = nodes.length
    assert(got.length === n)
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    def rq(x: Double): Long = new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var pq = nodes.map(v => v -> rq(1e9 / n)).toMap
    for (_ <- 1 to 5) {
      val sc = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.foreach { case (s0, d0) => sc(d0) += pq(s0) / deg(s0) }
      pq = nodes.map(v =>
        v -> (rq(0.15 * 1e9 / n) + rq(sc(v) * 0.85))).toMap
    }
    got.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      assert(math.abs(r.getAs[Double]("pagerank") - pq(v) / 1e9) < 2e-6,
        s"node $v")
      assert(r.getAs[Long]("n_neighbors") === deg.getOrElse(v, 0L), s"deg $v")
    }
    // isolated nodes hold exactly the teleport base; connected nodes more
    val base = rq(0.15 * 1e9 / n) / 1e9
    got.filter(_.getAs[Long]("n_neighbors") == 0L).foreach { r =>
      assert(math.abs(r.getAs[Double]("pagerank") - base) < 2e-6)
    }
    // mass is conserved up to the teleport floor (no dangling recycle):
    // total in (0.15, 1] — quantization slack
    val total = got.map(_.getAs[Double]("pagerank")).sum
    assert(total > 0.15 && total <= 1.0 + 1e-3, s"total mass $total")
  }

  test("ivfRecallAudit: k >= corpus makes overlap exact; invariants hold") {
    // with k >= every candidate, the exact list holds ALL vectors and the
    // IVF list holds exactly the in-cell ones -> overlap == n_cell_cands
    val nVec = graft.Tables.embeddings(spark, sf0001).count()
    val wide = VectorOps.ivfRecallAudit(spark, sf0001, nQueries = 2,
      k = nVec.toInt + 10).collect()
    wide.foreach { r =>
      assert(r.getAs[Long]("n_overlap") === r.getAs[Long]("n_cell_cands"))
    }
    // standard audit: recall consistent, bounded, all queries present
    val audit = VectorOps.ivfRecallAudit(spark, sf0001, nQueries = 4, k = 5)
      .collect()
    assert(audit.map(_.getAs[Long]("q_id")).toSeq === Seq(0L, 1L, 2L, 3L))
    audit.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0L && ov <= 5L)
      assert(ov <= r.getAs[Long]("n_cell_cands"))
      assert(math.abs(r.getAs[Double]("recall_at_k") - ov / 5.0) < 1e-9)
    }
  }

  // brute-force anchor: q_vec_mmr
  test("mmrTopK: greedy selection matches an independent brute force") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0.0 else dot / den
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def q6(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val qv = emb.find(_._1 == 0L).get._3
    val pool = emb.filter(_._1 != 0L)
      .map(t => (t._1, t._2, r6(cos(t._3, qv)), t._3))
      .sortBy(t => (-t._3, t._1)).take(20)
    val relq = pool.map(t => t._1 -> q6(t._3)).toMap
    val sim = (for (a <- pool; b <- pool if a._1 != b._1)
      yield ((a._1, b._1), q6(r6(cos(a._4, b._4))))).toMap
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long)] // rank, id, msq, num
    val remaining = scala.collection.mutable.ArrayBuffer(pool.map(_._1): _*)
    while (picked.size < 5) {
      val scored = remaining.map { id =>
        val ms = if (picked.isEmpty) 0L
                 else picked.map(p => sim((id, p._2))).max
        (id, ms, 7L * relq(id) - (if (picked.isEmpty) 0L else 3L * ms))
      }
      val best = scored.minBy { case (id, _, num) => (-num, id) }
      picked += ((picked.size + 1, best._1, best._2, best._3))
      remaining -= best._1
    }
    val got = VectorOps.mmrTopK(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.length === 5)
    got.zip(picked).foreach { case (g, w) =>
      assert(g._1 === w._1 && g._2 === w._2, s"pick mismatch: $g vs $w")
      assert(g._4 === relq(w._2).toDouble / 1e6)
      assert(g._5 === (if (w._1 == 1) 0.0 else w._3.toDouble / 1e6))
      assert(g._6 === w._4.toDouble / 1e7)
    }
    // rank 1 is the pure-relevance argmax; ids are distinct
    assert(got.head._2 === pool.head._1)
    assert(got.map(_._2).distinct.length === 5)
  }

  test("matryoshkaAudit: full-dim prefix is a perfect overlap; counts bounded") {
    // prefixDim = 64 makes both rankings identical -> overlap must be k
    val ident = VectorOps.matryoshkaAudit(spark, sf0001, nQueries = 3, k = 5,
      prefixDim = 64).collect()
    assert(ident.map(_.getAs[Long]("q_id")).toSeq === Seq(0L, 1L, 2L))
    ident.foreach { r =>
      assert(r.getAs[Long]("n_overlap") === 5L)
      assert(r.getAs[Double]("overlap_frac") === 1.0)
    }
    // a real truncation stays within [0, k] and matches a brute recompute
    // of the full-dim ranking side (the TopKAgg path vs plain cosineTopK)
    val audit = VectorOps.matryoshkaAudit(spark, sf0001, nQueries = 2, k = 5)
      .collect()
    audit.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0L && n <= 5L)
      assert(math.abs(r.getAs[Double]("overlap_frac") - n / 5.0) < 1e-9)
    }
  }

  test("dupShingleFrac: shared 5-grams count as dup, short docs drop out") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c d e f"), // shingles: abcde (shared), bcdef (unique)
      (1L, "a b c d e"),   // abcde (shared)
      (2L, "v w x y z"),   // unique
      (3L, "a b"))         // too short: no row
      .toDF("doc_id", "text")
    val got = DedupOps.dupShingleFracOf(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup_shingles"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got === Map(
      0L -> ((2L, 1L, 0.5)),
      1L -> ((1L, 1L, 1.0)),
      2L -> ((1L, 0L, 0.0))))
  }

  test("sourceDivergence: identical sources at 0, disjoint vocabularies at ln 2") {
    import spark.implicits._
    val corpus = Seq(
      ("s1", "a b c a"), ("s2", "a b c a"),  // identical distributions
      ("s3", "x y z w"))                     // disjoint from both
      .toDF("source", "text")
    val got = TextOps.sourceDivergenceOf(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("shared_terms"), r.getAs[Double]("js_divergence"),
          r.getAs[Double]("oov_b_in_a")))).toMap
    assert(got.size === 3)
    assert(got(("s1", "s2")) === ((3L, 0.0, 0.0)), "same distribution → JS 0")
    val (sh13, js13, oov13) = got(("s1", "s3"))
    assert(sh13 === 0L)
    assert(js13 === 0.693147, "disjoint vocabularies → JS = ln 2")
    assert(oov13 === 1.0, "all of s3's mass is unseen in s1")
  }

  test("typoPairs: deletion-neighborhood join finds exactly the ed<=k pairs") {
    import spark.implicits._
    val corpus = Seq((0L, "spark spark spork sprk hello")).toDF("doc_id", "text")
    def pairs(maxEdit: Int) =
      TextOps.typoPairsOf(corpus, maxEdit).collect()
        .map(r => (r.getAs[String]("term_a"), r.getAs[String]("term_b"),
          r.getAs[Int]("lev"))).toSet
    // ed=1: substitution (spark/spork share deletion "sprk"), deletion
    // (sprk IS a deletion of both); hello pairs with nothing
    assert(pairs(1) === Set(
      ("spark", "spork", 1), ("spark", "sprk", 1), ("spork", "sprk", 1)))
    // ed=2 is a superset; counts ride along
    assert(pairs(2).contains(("spark", "spork", 1)))
    val withCnt = TextOps.typoPairsOf(corpus, maxEdit = 1).collect()
      .map(r => (r.getAs[String]("term_a"), r.getAs[Long]("cnt_a"))).toMap
    assert(withCnt("spark") === 2L)
    // exhaustive cross-check: neighborhood join ≡ brute-force levenshtein
    val vocab = Seq("spark", "spork", "sprk", "hello")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 2
    } yield (a, b, lev(a, b))).toSet
    assert(pairs(2) === brute)
  }

  test("repeatSpans: planted repeat and tandem periodicity are exact") {
    import spark.implicits._
    // doc 1: 10-token block A, 5 alien tokens, A again → one 10-token
    // repeat at period 15; redundant mass = the later occurrence only
    val a10 = (0 until 10).map(i => s"w$i")
    val d1 = (a10 ++ (0 until 5).map(i => s"g$i") ++ a10).mkString(" ")
    // doc 2: (p0 p1 p2) × 6 — tandem repeat, period 3; diagonals 3/6/9
    // clear minRun=8 (runs 15/12/9), diagonal 12 (run 6) does not
    val d2 = Seq.fill(6)(Seq("p0", "p1", "p2")).flatten.mkString(" ")
    // doc 3: no internal repeats
    val d3 = (100 until 130).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = TextOps.repeatSpansOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_runs") == 1L)
    assert(r1.getAs[Long]("max_run_tokens") == 10L)
    assert(r1.getAs[Long]("max_run_period") == 15L)
    assert(r1.getAs[Long]("redundant_tokens") == 10L)
    assert(math.abs(r1.getAs[Double]("redundancy_frac") - 0.4) < 1e-9)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_runs") == 3L)
    assert(r2.getAs[Long]("max_run_tokens") == 15L)
    assert(r2.getAs[Long]("max_run_period") == 3L, "longest run has period 3")
    assert(r2.getAs[Long]("redundant_tokens") == 15L)
    assert(math.abs(r2.getAs[Double]("redundancy_frac") - 15.0 / 18.0) < 1e-6)
  }

  test("termBurstiness property: random corpora agree with an integer reference") {
    def halfUp(num: Long, den: Long): Long = (2 * num + den) / (2 * den)
    val docGen = org.scalacheck.Gen.listOfN(8,
      org.scalacheck.Gen.choose(0, 3).map("abcd".charAt(_).toString))
    val corpusGen = org.scalacheck.Gen.listOfN(6, docGen)
    forSamples(corpusGen, n = 10) { corpus =>
      import spark.implicits._
      val docs = corpus.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextOps.termBurstinessOf(docs).collect()
        .map(r => r.getAs[String]("term") ->
          (r.getAs[Long]("df"), r.getAs[Long]("total_tf"),
            r.getAs[Double]("mean_tf"), r.getAs[Double]("vmr"))).toMap
      val tf = corpus.zipWithIndex.flatMap { case (ws, i) =>
        ws.groupBy(identity).map { case (w, os) => (w, i, os.size.toLong) }
      }
      val exp = tf.groupBy(_._1).map { case (w, rows) =>
        val df = rows.size.toLong
        val tot = rows.map(_._3).sum
        val sq = rows.map(x => x._3 * x._3).sum
        w -> ((df, tot,
          halfUp(tot * 1000000L, df) / 1e6,
          halfUp((df * sq - tot * tot) * 1000000L, df * tot) / 1e6))
      }
      assert(got == exp, s"corpus=$corpus")
    }
  }

  test("termBurstiness: hand-computed VMR, df ordering, top-N cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"), // a: tf 3, b: tf 1
      (2L, "a b"), //      a: tf 1, b: tf 1
      (3L, "b b")) //               b: tf 2
      .toDF("doc_id", "text")
    val out = TextOps.termBurstinessOf(docs)
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), r.getAs[Long]("total_tf"),
          r.getAs[Double]("mean_tf"), r.getAs[Double]("vmr"))).toMap
    // b: df 3 ranks before a: df 2
    assert(out.keySet == Set("a", "b"))
    // a: mean 4/2 = 2.0; VMR = (2·10 − 16)/(2·4) = 0.5
    assert(out("a") == ((2L, 4L, 2.0, 0.5)))
    // b: mean 4/3 half-up at micro-units; VMR = (3·6 − 16)/(3·4) = 1/6
    assert(out("b") == ((3L, 4L, 1.333333, 0.166667)))
    // topN cuts on (df desc, term asc)
    val top1 = TextOps.termBurstinessOf(docs, topN = 1).collect()
    assert(top1.length == 1 && top1.head.getAs[String]("term") == "b")
    // uniform per-doc tf ⇒ VMR exactly 0 (Poisson floor is data, not code)
    val uni = TextOps.termBurstinessOf(
      Seq((1L, "x x"), (2L, "x x")).toDF("doc_id", "text")).collect()
    assert(uni.head.getAs[Double]("vmr") == 0.0)
  }
}
