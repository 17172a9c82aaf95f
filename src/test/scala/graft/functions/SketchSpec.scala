package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{PropSpec, SparkSpec}
import graft.functions.sketch._

/** Sketch expressions: kernel semantics + DataFrame (codegen) evaluation. */
class SketchSpec extends SparkSpec with PropSpec {

  private def shingleRows(texts: String*): Seq[Seq[String]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(wordShingles(split(col("text"), " "), 3).as("shs"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  test("word_shingles builds distinct 3-gram shingles (codegen path)") {
    assert(shingleRows("a b c d e") === Seq(Seq("a b c", "b c d", "c d e")))
    assert(shingleRows("a b") === Seq(Seq.empty))          // < n tokens
    assert(shingleRows("x y z x y z x y z") ===
      Seq(Seq("x y z", "y z x", "z x y")))                 // distinct
  }

  test("word_shingles matches a naive Scala reference on random docs") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    forSamples(Gen.listOf(word), n = 60) { words =>
      val expected = words.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSeq.distinct
      val got = shingleRows(if (words.isEmpty) " " else words.mkString(" ")).head
      if (words.size >= 3) assert(got === expected)
    }
  }

  test("shingle_hashes: positional, value-identical to xxhash64(array_join(slice))") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    forSamples(Gen.listOf(word), n = 60) { words =>
      val text = if (words.isEmpty) " " else words.mkString(" ")
      for (k <- Seq(2, 3, 5)) {
        val short = Seq(text).toDF("text")
          .select(split(col("text"), " ").as("t"))
          .where(size(col("t")) < k)
          .select(shingleHashes(col("t"), k))
          .collect().map(_.getSeq[Long](0).toSeq)
        assert(short.forall(_.isEmpty), s"k=$k words=$words (short-doc case)")
        val rows = Seq(text).toDF("text")
          .select(split(col("text"), " ").as("t"))
          .where(size(col("t")) >= k)
          .select(
            shingleHashes(col("t"), k).as("native"),
            transform(sequence(lit(1), size(col("t")) - (k - 1)),
              i => xxhash64(array_join(slice(col("t"), i, lit(k)), " ")))
              .as("hof"))
          .collect()
        rows.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1),
          s"k=$k words=$words"))
      }
    }
  }

  test("repeat_seeds: fused selection equals the HOF pipeline it replaced") {
    import spark.implicits._
    // words drawn from a tiny alphabet so in-doc gram repeats are common
    val word = Gen.oneOf("a", "b", "c")
    forSamples(Gen.listOf(word), n = 80) { words =>
      val text = if (words.isEmpty) " " else words.mkString(" ")
      for (k <- Seq(2, 3)) {
        val hof = Seq(text).toDF("text")
          .select(split(col("text"), " ").as("t"))
          .where(size(col("t")) >= k)
          .select(transform(sequence(lit(1), size(col("t")) - (k - 1)),
            i => xxhash64(array_join(slice(col("t"), i, lit(k)), " ")))
            .as("g_arr"))
          .select(col("g_arr"), array_sort(col("g_arr")).as("sg"))
          .select(col("g_arr"),
            array_distinct(filter(col("sg"),
              (v, idx) => v === try_element_at(col("sg"), idx + 2))).as("dupg"))
          .select(explode(filter(
            transform(col("g_arr"), (g, i) => struct((i + 1).as("pos"), g.as("g"))),
            p => array_contains(col("dupg"), p.getField("g")))).as("pg"))
          .select(col("pg.pos"), col("pg.g"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        val native = Seq(text).toDF("text")
          .select(split(col("text"), " ").as("t"))
          .where(size(col("t")) >= k)
          .select(explode(repeatSeeds(col("t"), k)).as("pg"))
          .select(col("pg.pos"), col("pg.g"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
        assert(native === hof, s"k=$k words=$words")
      }
    }
  }

  test("minhash_sig: k dims, deterministic, permutation-invariant, and containment-monotone") {
    import spark.implicits._
    def sig(elems: Seq[String]): Seq[Long] =
      Seq(elems).toDF("e").select(minhashSig(col("e"), 32))
        .collect().head.getSeq[Long](0).toSeq
    val a = sig(Seq("s1", "s2", "s3"))
    assert(a.size === 32)
    assert(a === sig(Seq("s3", "s1", "s2")))          // set semantics
    val b = sig(Seq("s1", "s2", "s3", "s4"))
    assert(a.zip(b).forall { case (x, y) => y <= x }) // superset can only lower mins
  }

  test("minhash estimate approximates Jaccard") {
    import spark.implicits._
    // |A∩B|/|A∪B| = 60/140 ≈ 0.43; k=128 → stderr ≈ 0.04
    val A = (1 to 100).map(i => s"sh$i")
    val B = (41 to 180).map(i => s"sh$i")
    val df = Seq((A, B)).toDF("a", "b")
      .select(minhashSig(col("a"), 128).as("sa"), minhashSig(col("b"), 128).as("sb"))
      .select(size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y),
        m => m)).cast("double") / 128)
    val est = df.collect().head.getDouble(0)
    val trueJ = 60.0 / 180.0
    assert(math.abs(est - trueJ) < 0.12, s"est=$est true=$trueJ")
  }

  test("simhash64: identical docs → distance 0; near docs closer than far docs") {
    import spark.implicits._
    def h(tokens: Seq[String]): Long =
      Seq(tokens).toDF("t").select(simhash64(col("t"))).collect().head.getLong(0)
    val doc = (1 to 50).map(i => s"w$i")
    assert(h(doc) === h(doc))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = dist(h(doc), h(doc.updated(0, "CHANGED")))
    val far = dist(h(doc), h((1 to 50).map(i => s"other$i")))
    assert(near < far)
    assert(dist(h(doc), h(doc.reverse)) === 0) // bag-of-words: order-free
  }

  test("cosine_sim: known values on float arrays (codegen path)") {
    import spark.implicits._
    def cos(a: Seq[Float], b: Seq[Float]): Double =
      Seq((a, b)).toDF("a", "b").select(cosineSim(col("a"), col("b")))
        .collect().head.getDouble(0)
    assert(math.abs(cos(Seq(1f, 0f), Seq(1f, 0f)) - 1.0) < 1e-12)
    assert(math.abs(cos(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
    assert(math.abs(cos(Seq(1f, 0f), Seq(-1f, 0f)) + 1.0) < 1e-12)
    assert(math.abs(cos(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("sorted_id_pairs: canonical a<b pairs from an unsorted posting list") {
    import spark.implicits._
    val rows = Seq(Seq(30L, 10L, 20L)).toDF("ids")
      .select(explode(sortedIdPairs(col("ids"))).as("p"))
      .select(col("p.a"), col("p.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((10L, 20L), (10L, 30L), (20L, 30L)))
    // degenerate lists emit nothing
    assert(Seq(Seq(7L), Seq.empty[Long]).toDF("ids")
      .select(explode(sortedIdPairs(col("ids")))).count() == 0)
  }

  test("bigram_stats: counts match an explode+groupBy reference (codegen path)") {
    import spark.implicits._
    def stats(text: String): (Long, Long, Long) = {
      val r = Seq(text).toDF("text")
        .select(bigramStats(split(col("text"), " ")).as("st"))
        .select(col("st.n_bigrams"), col("st.n_distinct_bigrams"),
          col("st.top_bigram_cnt"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // "a b a b a": bigrams = [a b, b a, a b, b a] → 4 total, 2 distinct, top 2
    assert(stats("a b a b a") === ((4L, 2L, 2L)))
    assert(stats("x y z") === ((2L, 2L, 1L)))      // all distinct
    assert(stats("w w w w") === ((3L, 1L, 3L)))    // one bigram repeated
    assert(stats("solo") === ((0L, 0L, 0L)))       // < 2 tokens → no bigrams
  }

  test("bigram_stats matches a naive Scala reference on random docs") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d")
    forSamples(Gen.listOf(word).suchThat(_.size >= 2), n = 40) { words =>
      val bgs = words.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bgs.groupBy(identity).view.mapValues(_.size)
      val r = Seq(words.mkString(" ")).toDF("text")
        .select(bigramStats(split(col("text"), " ")).as("st"))
        .select(col("st.n_bigrams"), col("st.n_distinct_bigrams"),
          col("st.top_bigram_cnt")).collect().head
      assert(r.getLong(0) === bgs.size.toLong)
      assert(r.getLong(1) === counts.size.toLong)
      assert(r.getLong(2) === counts.values.max.toLong)
    }
  }

  test("max_cosine_sim: equals max of per-pair cosine_sim, quantize commutes") {
    import spark.implicits._
    // float vectors incl. zero-norm and length mismatches — the exact
    // surface the crossJoin spelling covered
    val comp = Gen.chooseNum(-2.0f, 2.0f)
    val vec = Gen.chooseNum(1, 5).flatMap(k => Gen.listOfN(k, comp))
    val zero = Gen.chooseNum(1, 5).map(k => List.fill(k)(0.0f))
    val gen = for {
      evs <- Gen.nonEmptyListOf(Gen.frequency(4 -> vec, 1 -> zero))
      v <- Gen.frequency(4 -> vec, 1 -> zero)
    } yield (v, evs)
    forSamples(gen, n = 60) { case (v, evs) =>
      val evalVecs = evs.map(_.map(_.toDouble).toArray).toArray
      val rows = Seq(v).toDF("emb")
        .select(col("emb").cast("array<float>").as("emb"))
      val fused = rows
        .select(round(maxCosineSim(col("emb"), evalVecs) * 1e6, 0)
          .cast("long"))
        .collect().head.getLong(0)
      val pairwise = rows
        .crossJoin(evs.map(e => Tuple1(e)).toDF("evv")
          .select(col("evv").cast("array<float>").as("evv")))
        .select(round(cosineSim(col("emb"), col("evv")) * 1e6, 0)
          .cast("long").as("simq"))
        .agg(max(col("simq"))).collect().head.getLong(0)
      assert(fused === pairwise, s"v=$v evs=$evs")
    }
  }

  test("sign_cell: equals both HOF spellings it replaced (cell and cellDyn)") {
    import spark.implicits._
    val comp = Gen.frequency(8 -> Gen.chooseNum(-2.0f, 2.0f), 1 -> Gen.const(0.0f))
    val vec = Gen.chooseNum(0, 10).flatMap(k => Gen.listOfN(k, comp))
    val gen = for { v <- vec; bits <- Gen.chooseNum(1, 8) } yield (v, bits)
    forSamples(gen, n = 60) { case (v, bits) =>
      val df = Seq(v).toDF("emb")
        .select(col("emb").cast("array<float>").as("v"))
      val asD = transform(col("v"), x => x.cast("double"))
      val hofStatic = df.select(aggregate(
        zip_with(slice(asD, 1, bits),
          transform(sequence(lit(0), lit(bits - 1)), i => pow(lit(2.0), i)),
          (x, p) => when(x > 0, p).otherwise(lit(0.0))),
        lit(0.0), (acc, x) => acc + x).cast("long")).collect().head.getLong(0)
      val native = df.select(signCell(col("v"), lit(bits)))
        .collect().head.getLong(0)
      assert(native === hofStatic, s"static v=$v bits=$bits")
      // the dyn spelling's element_at is ANSI-strict — its production
      // domain is dim(64) >= bits, where the index never overruns
      if (v.length >= bits) {
        val hofDyn = df.select(aggregate(
          transform(sequence(lit(0), lit(bits) - 1),
            i => when(element_at(col("v"), i + 1) > lit(0f), pow(lit(2.0), i))
              .otherwise(lit(0.0))),
          lit(0.0), (acc, x) => acc + x).cast("long")).collect().head.getLong(0)
        assert(native === hofDyn, s"dyn v=$v bits=$bits")
      }
    }
  }

  test("best_lang: equals greatest(struct(round(filter-score), lang))") {
    import spark.implicits._
    val profs = graft.operators.TextOps.langProfiles.toSeq.sortBy(_._1)
    // alphabet mixes profile words (so ties and non-zero scores happen)
    // with noise
    val word = Gen.oneOf("the", "la", "de", "que", "und", "noise", "x", "的")
    forSamples(Gen.listOf(word), n = 80) { words =>
      val text = if (words.isEmpty) " " else words.mkString(" ")
      val df = Seq(text).toDF("text")
      val toksL = split(lower(col("text")), " ")
      val hof = df.select(greatest(profs.map { case (lang, prof) =>
        struct(
          round(size(filter(toksL,
            t => prof.map(w => t === lit(w)).reduce(_ || _))).cast("double") /
            greatest(size(toksL), lit(1)), 6).as("score"),
          lit(lang).as("lang"))
      }: _*).as("b")).select(col("b.score"), col("b.lang")).collect().head
      val native = df.select(bestLang(toksL,
        profs.map(_._1).toArray, profs.map(_._2.toArray).toArray).as("b"))
        .select(col("b.score"), col("b.lang")).collect().head
      assert(native.getDouble(0) === hof.getDouble(0), s"score words=$words")
      assert(native.getString(1) === hof.getString(1), s"lang words=$words")
    }
  }

  test("expressions survive the interpreted (non-codegen) path too") {
    // eval() is exercised directly via the kernel + a filter that Catalyst
    // constant-folds (constant folding uses interpreted eval)
    import spark.implicits._
    val n = Seq(1).toDF("x")
      .where(size(wordShingles(split(lit("a b c d"), " "), 3)) === 2)
      .count()
    assert(n === 1L)
  }
}
