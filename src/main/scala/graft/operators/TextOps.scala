package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis pack over `documents` — the training-data-pipeline
  * operators (language-ID, quality scoring, token counting, fingerprinting)
  * the north star mandates on top of the reference's surface.
  *
  * Everything here is built from codegen'd built-ins and higher-order
  * functions over arrays — no Scala UDF in any hot path, so the whole pack
  * stays inside whole-stage codegen and is embarrassingly parallel (no
  * shuffle except the final aggregates).
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Per-document token statistics: whitespace tokens plus a BPE-ish
    * regex token count (letters / digits / other runs — a crude subword
    * proxy that matches on both engines' regex dialects).
    */
  def tokenStats(s: SparkSession, d: String): DataFrame =
    // row-gated width pin (r15, VERDICT r14 #4): the fused split/regex
    // projection is the whole query and the fixture scan is ONE row
    // group, so ≥20k docs ran it 1-task (sf1 read 6.2× the sf0.1 time
    // at 10× data); measured b2b at both SFs in OPTIMIZATION_r15 §
    Tables.widenSmallRows(s, d, "documents", Tables.documents(s, d), 20000L)
      .select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"),
        size(array_distinct(tokens(col("text")))).as("n_distinct_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).as("n_regex_tokens"),
        length(col("text")).as("n_chars_measured"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  /** Prefix-duplicate groups: documents sharing their first `k` tokens —
    * the boilerplate-intro signal (same templated opening, different
    * bodies) that exact dedup misses and near-dup only catches when the
    * body also overlaps. One rollup on a 16-byte prefix fingerprint.
    */
  def prefixDups(s: SparkSession, d: String, k: Int = 8): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        substring(md5(concat_ws(" ", slice(tokens(col("text")), 1, k))), 1, 16)
          .as("pfx_fp"))
      .groupBy(col("pfx_fp"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .where(col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("pfx_fp"))

  /** Quality-signal correlation audit: Pearson r between the curation
    * quality score and raw size signals (token/char counts) — the sanity
    * check that a quality signal is not just a length proxy before a
    * pipeline filters on it.
    *
    * Determinism: the explicit sum-formula
    * r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²)) is computed from the
    * SAME aggregate sums on both engines (built-in `corr` implementations
    * differ algorithmically); one scan, one 1-row aggregate.
    */
  def signalCorr(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(
      size(tokens(col("text"))).cast("double").as("x"),
      graft.operators.CurationOps.qualityCol.as("y"),
      col("n_chars").cast("double").as("z"))
    def corrOf(a: String, b: String): Column = {
      val n = col("n").cast("double")
      (n * col(s"s_$a$b") - col(s"s_$a") * col(s"s_$b")) /
        sqrt((n * col(s"s_$a$a") - col(s"s_$a") * col(s"s_$a")) *
          (n * col(s"s_$b$b") - col(s"s_$b") * col(s"s_$b")))
    }
    base.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("s_x"), sum(col("y")).as("s_y"), sum(col("z")).as("s_z"),
      sum(col("x") * col("x")).as("s_xx"), sum(col("y") * col("y")).as("s_yy"),
      sum(col("z") * col("z")).as("s_zz"),
      sum(col("x") * col("y")).as("s_xy"),
      sum(col("z") * col("y")).as("s_zy"),
      sum(col("x") * col("z")).as("s_xz"))
      .select(
        col("n"),
        round(corrOf("x", "y"), 4).as("corr_tokens_quality"),
        round(corrOf("z", "y"), 4).as("corr_chars_quality"),
        round(corrOf("x", "z"), 4).as("corr_tokens_chars"))
  }

  /** Language confusion matrix: declared `lang` label × [[languageId]]
    * prediction, with counts and mean confidence — the label-noise audit
    * run before trusting a corpus's language metadata (off-diagonal mass
    * = mislabeled or code-mixed documents).
    *
    * Plan: the per-doc prediction is one scan of codegen'd profile
    * scoring (no shuffle — see languageId); the matrix rollup is bounded
    * by |langs|².
    */
  def langConfusion(s: SparkSession, d: String): DataFrame =
    languageId(s, d)
      .groupBy(col("lang_actual"), col("lang_predicted"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("confidence")), 4).as("avg_confidence"))
      .orderBy(col("lang_actual"), col("lang_predicted"))

  /** Vocabulary typo/variant pairs within edit distance `maxEdit`, found
    * SymSpell-style: every term joins on its deletion neighborhood (the
    * term plus every string reachable by deleting ≤ `maxEdit` characters),
    * and candidates sharing a key are confirmed with `levenshtein` — two
    * terms within edit distance k ALWAYS share a depth-k deletion, so the
    * neighborhood join is exact, never all-pairs. The spelling-variant
    * detector a corpus-normalization pass runs over its vocabulary
    * (OCR noise, typo mining, tokenizer-vocab coalescing).
    *
    * Scale: operates on the VOCABULARY (Heaps-sublinear in the corpus),
    * never the token stream; per-term key fanout is 1 + L + L(L−1)/2 for
    * term length L — constant-size short-string keys. Frequencies ride
    * along so consumers can orient pairs (the rare member of a pair with a
    * frequency cliff is the probable typo). Skew note: depth-2 deletions
    * of 2-character terms all hit the empty-string bucket, making that one
    * bucket quadratic in the 2-char vocabulary — bounded (≤ ~1k such
    * terms in any alphabet), and the levenshtein confirm keeps output
    * exact; production SymSpell bounds it further with prefix windows.
    */
  def typoPairs(s: SparkSession, d: String, maxEdit: Int = 2): DataFrame =
    typoPairsOf(Tables.documents(s, d), maxEdit)

  /** [[typoPairs]] over an arbitrary `(text)` frame. */
  def typoPairsOf(docs: DataFrame, maxEdit: Int = 2, minTermLen: Int = 2): DataFrame = {
    require(maxEdit == 1 || maxEdit == 2, "maxEdit must be 1 or 2")
    val vocab = docs
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .where(length(col("term")) >= minTermLen)
    val t = col("term")
    def del1(i: Column): Column =
      concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t) - i))
    def del2(i: Column, j: Column): Column =
      concat(t.substr(lit(1), i - 1), t.substr(i + 1, j - i - 1),
        t.substr(j + 1, length(t) - j))
    val id = vocab.select(t, col("cnt"), t.as("key"))
    val d1 = vocab
      .select(t, col("cnt"), explode(sequence(lit(1), length(t))).as("i"))
      .select(t, col("cnt"), del1(col("i")).as("key"))
    val keyed0 =
      if (maxEdit == 1) id.union(d1)
      else {
        // i < j over the ORIGINAL positions; sequence(i+1, len) is never
        // descending because i ≤ len − 1
        val d2 = vocab
          .where(length(t) >= 2) // sequence(1, 0) would count DOWN
          .select(t, col("cnt"), explode(sequence(lit(1), length(t) - 1)).as("i"))
          .select(t, col("cnt"), col("i"),
            explode(sequence(col("i") + 1, length(t))).as("j"))
          .select(t, col("cnt"), del2(col("i"), col("j")).as("key"))
        id.union(d1).union(d2)
      }
    val keyed = keyed0.distinct()
    val a = keyed.select(col("key"), t.as("term_a"), col("cnt").as("cnt_a"))
    val b = keyed.select(col("key"), t.as("term_b"), col("cnt").as("cnt_b"))
    a.join(b, Seq("key"))
      .where(col("term_a") < col("term_b") &&
        levenshtein(col("term_a"), col("term_b")) <= maxEdit)
      .select(col("term_a"), col("term_b"), col("cnt_a"), col("cnt_b"),
        levenshtein(col("term_a"), col("term_b")).as("lev"))
      .distinct()
      .orderBy(col("term_a"), col("term_b"))
  }

  /** Corpus term frequency: top-20 terms. explode → partial count →
    * shuffle on term → global count; vocabulary-sized state only.
    */
  def termFrequency(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(20)

  /** Corpus heavy hitters via the Space-Saving typed Aggregator
    * (graft.functions.HeavyHitters) + exact verification pass. The sketch
    * finds candidates with BOUNDED memory — capacity-m summary per
    * partition, merged pairwise, never vocabulary-sized state (the scale
    * twin of [[termFrequency]], whose shuffle is the whole vocabulary).
    * A second pass recounts ONLY the ≤ m candidate terms exactly (the
    * candidate set broadcasts; the token stream shuffles at most the
    * matching terms) and keeps those with true count · m > N.
    *
    * That threshold makes the output deterministic and SQL-checkable
    * (VERDICT r5 #2): Space-Saving guarantees every term with true count
    * > N/m is in the summary (min counter ≤ N/m), so the filtered result
    * is EXACTLY the set of true over-threshold terms with exact counts —
    * independent of which sub-threshold entries happened to survive
    * arrival order. N is recovered from the summary itself (counters sum
    * to the stream length), so no third pass exists.
    */
  /** Exact heavy hitters: one explode → vocabulary rollup (map-side combine
    * collapses the token stream before the shuffle) → threshold against the
    * stream length, which is summed from the COUNTED table so the explode
    * stage is shared between both branches at runtime (ReuseExchange — the
    * same trick activityConcentration uses for its totals).
    *
    * Measured A/B vs the Space-Saving path below (graft.tools.HeavyAB,
    * sf10 = 500 k docs / ~100 M tokens): two-action exact 4.3 s, sketch
    * 9.7 s; this single-DAG reuse-exchange form 2.5 s (bench min-of-2) —
    * the typed-UDAF update per token costs more than the vocab-bounded
    * shuffle it avoids, at every scale where the vocabulary fits executor
    * memory. The sketch stays below for the regime where it
    * is the right call — open token spaces (URLs, ids) whose vocabulary
    * rollup would not be memory-bounded — and as the batch twin of the
    * streaming HeavyHittersStream state shape.
    */
  def heavyTermsExact(s: SparkSession, d: String, m: Int = 200, k: Int = 20): DataFrame = {
    val counted = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("count"))
    counted
      .crossJoin(broadcast(counted.agg(sum(col("count")).as("n_stream"))))
      .where(col("count") * m > col("n_stream"))
      .select(col("term"), col("count"))
      .orderBy(col("count").desc, col("term"))
      .limit(k)
  }

  def heavyTerms(s: SparkSession, d: String, m: Int = 200, k: Int = 20): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
    val summary = toks
      .agg(graft.functions.HeavyHitters.heavyHitters(col("term"), m).as("hh"))
      .select(col("hh"),
        aggregate(col("hh"), lit(0L), (acc, e) => acc + e.getField("count"))
          .as("n_stream"))
    val cands = broadcast(
      summary.select(explode(col("hh")).as("e"), col("n_stream"))
        .select(col("e.term").as("term"), col("n_stream")))
    toks.join(cands, Seq("term"))
      .groupBy(col("term"), col("n_stream"))
      .agg(count(lit(1)).as("count"))
      .where(col("count") * m > col("n_stream"))
      .select(col("term"), col("count"))
      .orderBy(col("count").desc, col("term"))
      .limit(k)
  }

  /** Corpus vocabulary / Zipf profile: term frequencies bucketed by
    * power-of-two bands (bucket = ⌊log₂ cnt⌋), with term and occurrence
    * counts per band — the frequency-of-frequencies histogram that shows
    * whether a corpus has a healthy Zipfian tail or is boilerplate-heavy.
    * The bucket is computed as `length(bin(cnt)) − 1`: exact integer
    * semantics on both engines (a floating log₂ can land a power of two on
    * either side of the floor depending on the libm).
    *
    * Plan: explode → vocabulary-sized term count (map-side partial agg
    * collapses the token stream before the shuffle) → ~60-row band rollup.
    */
  /** Top-k collocations by LIFT — adjacent bigrams whose observed rate
    * most exceeds independence: lift(a,b) = p(ab) / (p(a)·p(b)) with
    * p(ab) over bigram slots and p(w) over tokens. The association
    * measure behind phrase mining / tokenizer-merge candidates, kept as
    * the RAW ratio instead of its log (PMI = ln(lift)): ordering is
    * identical and `ln` is the one function whose last ulp differs
    * across libms — the ratio quantizes exactly.
    *
    * Determinism: lift is computed as ONE half-up integer division of
    * exact products, c_ab·N²·10⁶ ÷ (B·c_a·c_b), in DECIMAL(38,0)
    * ([[graft.operators.Num.halfUpDiv]] semantics; headroom to ~10¹⁴
    * tokens before 38 digits clip — past that, shard the corpus or drop
    * the 10⁶ quantizer a digit). Ties break on (w1, w2).
    *
    * Plan: one in-row bigram explode (native [[graft.functions.sketch]]
    * kernel) → vocabulary²-bounded count; one token explode → vocabulary
    * rollup; totals ride 1-row broadcasts; the two unigram joins hit the
    * ≥ `minCount` survivors only. TakeOrderedAndProject emits k rows.
    */
  def collocations(s: SparkSession, d: String, minCount: Long = 5L,
      k: Int = 30): DataFrame =
    collocationsOf(Tables.documents(s, d), minCount, k)

  /** [[collocations]] over an arbitrary `(text)` frame. */
  def collocationsOf(docs: DataFrame, minCount: Long = 5L,
      k: Int = 30): DataFrame = {
    val dec = "decimal(38,0)"
    val bigrams = docs.select(tokens(col("text")).as("t"))
      .select(explode(graft.functions.sketch.bigramPairs(col("t"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgCounts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_ab"))
    val bTot = broadcast(bgCounts.agg(sum(col("c_ab")).as("n_bigrams")))
    val uni = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nTot = broadcast(uni.agg(sum(col("c")).as("n_tokens")))
    bgCounts.where(col("c_ab") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(bTot).crossJoin(nTot)
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        (Num.halfUpDiv(
          col("c_ab").cast(dec) * col("n_tokens").cast(dec) *
            col("n_tokens").cast(dec) * lit(1000000L).cast(dec),
          col("n_bigrams").cast(dec) * col("c_a").cast(dec) *
            col("c_b").cast(dec))
          .cast("double") / 1e6).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Intra-document repeated-span profile: for every doc containing a
    * verbatim token run of ≥ `minRun` tokens that occurs AGAIN later in
    * the same doc, the repeat inventory — run count, longest repeat and
    * its period (offset between the two occurrences; period < length ⇒
    * tandem repeat), and the redundant token mass (merged coverage of
    * all later occurrences) as a fraction of the doc. The span-exact
    * version of the Gopher/MassiveText repetition filters: bigram-ratio
    * stats ([[graft.operators.TrainPrepOps.repetitionStats]]) flag that
    * a doc repeats itself; this says WHAT repeats, how long, and how
    * much of the doc is literally recoverable from its own prefix —
    * the template/spam/generated-text signature.
    *
    * Method: the [[graft.operators.DedupOps.dupSpans]] diagonal-island
    * extraction turned inward — seeds are same-doc k-gram position
    * pairs (pa < pb), a maximal repeat of length L at offset `diag` =
    * pb − pa is L−k+1 consecutive-pa seeds on one (doc, diag) diagonal.
    * `maxTf` caps the per-(doc, gram) occurrence count before the
    * C(tf,2) self-join the way the cross-doc ops cap df.
    *
    * Plan: positions explode once; the self-join keys on (doc_id, g) —
    * 16 bytes, text never moves; islands and the interval merge are
    * per-doc windows over matched seeds only.
    */
  def repeatSpans(s: SparkSession, d: String, k: Int = 5, minRun: Int = 8,
      maxTf: Long = 100L): DataFrame =
    // contraction-first (r11): the intra-document repeat profile is a
    // pure text function — the position self-pairing runs once per
    // DISTINCT text and expands member-wise
    DedupOps.contractPerDocText(s, d)(repeatSpansOf(_, k, minRun, maxTf))

  /** [[repeatSpans]] over an arbitrary `(doc_id, text)` frame. */
  def repeatSpansOf(docsIn: DataFrame, k: Int = 5, minRun: Int = 8,
      maxTf: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2 && minRun >= k, "need k >= 2 and minRun >= k")
    val docs = docsIn
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .where(size(col("t")) >= k)
    // Native fused seed kernel (r14). History: the first spelling hashed
    // each position via md5 + a gram-string self-join; r13 moved to
    // in-row xxhash64 HOFs (13.8 → 4.2 s on the ×10 weak-scaling corpus)
    // whose remaining cost was the INTERPRETED per-element evaluation —
    // transform(hash) + array_sort + filter(try_element_at) +
    // transform/filter with an array_contains probe per position was the
    // query's dominant 32-task stage (~11 core-seconds at sf0.1, measured
    // by StageProbe this round). `repeatSeeds` fuses the whole selection
    // — window hashes (xxh64 seed 42 of the ' '-joined window, value-
    // identical to the HOF spelling), duplicate-gram membership
    // (sorted-neighbor equality), positional emission — into ONE compiled
    // pass that participates in whole-stage codegen. Only positions whose
    // gram repeats INSIDE the doc reach the explode or the (doc, g)
    // shuffle, as before; `g` stays a query-internal key (the oracle
    // replays gram STRINGS).
    //
    // The r13 optimizer landmines (predicate pushdown into lambdas,
    // CollapseProject inlining non-cheap expressions referenced once,
    // InferFiltersFromGenerate on attribute-explodes) are structurally
    // gone: there are no lambdas left, and the single non-cheap
    // expression is exploded INLINE as the generator child, which the
    // SPARK-36715 guard exempts from filter inference.
    val grams = docs
      .select(col("doc_id"),
        explode(graft.functions.sketch.repeatSeeds(col("t"), k)).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.g").as("g"))
    // ONE (doc_id, g) rollup; the C(tf,2) position pairs generate IN-ROW
    // from the collected (≤ maxTf) position list — no keep-list join-back
    // and no exploded self-join. The join spelling measured 5.8× per 10×
    // data on the weak-scaling corpus (2.6 → 15.2 s); this one re-shuffles
    // nothing but the rollup itself.
    val seeds = grams.groupBy(col("doc_id"), col("g"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .where(size(col("ps")).between(2, maxTf))
      .select(col("doc_id"), explode(flatten(transform(
        sequence(lit(1), size(col("ps")) - 1),
        i => transform(
          sequence(i + 1, size(col("ps"))),
          j => struct(element_at(col("ps"), i).as("pa"),
            (element_at(col("ps"), j) - element_at(col("ps"), i))
              .as("diag")))))).as("pp"))
      .select(col("doc_id"), col("pp.pa").as("pa"), col("pp.diag").as("diag"))
    val runs = seeds
      .withColumn("grp", col("pa") - row_number().over(
        Window.partitionBy(col("doc_id"), col("diag")).orderBy(col("pa"))))
      .groupBy(col("doc_id"), col("diag"), col("grp"))
      .agg((count(lit(1)) + (k - 1)).as("run_tokens"),
        min(col("pa")).as("pa_start"))
      .where(col("run_tokens") >= minRun)
    // redundant mass = merged coverage of the LATER occurrence intervals
    val iv = runs.select(col("doc_id"),
      (col("pa_start") + col("diag")).as("start"),
      (col("pa_start") + col("diag") + col("run_tokens") - 1).as("end"))
      .distinct()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("start"), col("end"))
    val merged = iv
      .withColumn("prev_max",
        max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_grp",
        when(col("prev_max").isNull || col("start") > col("prev_max") + 1, 1L)
          .otherwise(0L))
      .withColumn("grp",
        sum(col("new_grp")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("start")).as("s"), max(col("end")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sum(col("e") - col("s") + 1).as("redundant_tokens"))
    val perDoc = runs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_runs"),
        max(struct(col("run_tokens"), (-col("diag")).as("nd")))
          .as("best"))
      .select(col("doc_id"), col("n_runs"),
        col("best.run_tokens").as("max_run_tokens"),
        (-col("best.nd")).cast("long").as("max_run_period"))
    val lens = docs.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    perDoc.join(merged, Seq("doc_id"))
      .join(lens, Seq("doc_id"))
      .select(col("doc_id"), col("n_runs"), col("max_run_tokens"),
        col("max_run_period"), col("redundant_tokens"),
        col("dl").as("tokens_total"),
        (Num.halfUpDiv(col("redundant_tokens") * 1000000L, col("dl"))
          .cast("double") / 1e6).as("redundancy_frac"))
      .orderBy(col("doc_id"))
  }

  def zipfProfile(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy((length(bin(col("cnt"))) - 1).cast("int").as("freq_bucket"))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("cnt")).as("n_occurrences"),
        min(col("cnt")).as("min_cnt"),
        max(col("cnt")).as("max_cnt"))
      .orderBy(col("freq_bucket"))

  /** TF-IDF per (doc, term): tf = in-doc frequency, idf = ln(N / df) over
    * the WHOLE corpus (df computed before any output slicing — the
    * statistics are corpus-global even when only a doc slice is emitted).
    * Plan: one explode → (doc, term) count [shuffle 1] → term df from the
    * same counts [shuffle 2, vocabulary-sized keys] → joins back; N rides
    * a 1-row broadcast. Nothing row-proportional beyond the term index
    * crosses the shuffles.
    */
  def tfIdf(s: SparkSession, d: String, maxDocId: Long = 20): DataFrame = {
    val docs = Tables.documents(s, d)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // df does NOT need the corpus-wide (doc, term) rollup the first
    // draft paid (1M-row shuffle at sf0.1): array_distinct before the
    // explode makes the stream per-doc-unique in-row, so df is a plain
    // vocabulary-sized term count. tf only needs the emitted doc slice,
    // so its explode runs on the doc_id-pruned scan. Corpus-global
    // statistics are unchanged — df still counts every document.
    val tf = docs.where(col("doc_id") < maxDocId)
      .select(
        col("doc_id"), size(tokens(col("text"))).as("n_tok"),
        explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("n_tok"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val df = docs
      .select(explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(
        col("doc_id"), col("term"),
        round(col("cnt").cast("double") / col("n_tok"), 6).as("tf"),
        col("df"),
        round((col("cnt").cast("double") / col("n_tok")) *
          log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** Per-source document-length profile: exact char-length percentiles
    * (p25/p50/p75/p95) plus min/max/avg — the distribution table that
    * length-outlier filters (truncated pages, concatenation artifacts,
    * binary spills) derive their cutoffs from. One rollup shuffle on the
    * source key; exact `percentile` keeps the per-group sort inside the
    * aggregate (group cardinality = shard size, sorted distributed, never
    * on the driver). Same exact-percentile / `quantile_cont` oracle pairing
    * as [[graft.operators.RelationalOps.priceQuantiles]].
    */
  def lengthProfile(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        graft.functions.QuantilesAgg.quantiles(
          col("n_chars").cast("double"), Seq(0.25, 0.5, 0.75, 0.95)).as("qs"),
        max(col("n_chars")).as("max_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .select(col("source"), col("n_docs"), col("min_chars"),
        round(element_at(col("qs"), 1), 2).as("p25"),
        round(element_at(col("qs"), 2), 2).as("p50"),
        round(element_at(col("qs"), 3), 2).as("p75"),
        round(element_at(col("qs"), 4), 2).as("p95"),
        col("max_chars"), col("avg_chars"))
      .orderBy(col("source"))

  /** Per-language corpus stats. */
  def langStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        round(avg(size(tokens(col("text")))), 4).as("avg_tokens"))
      .orderBy(col("lang"))

  /** Quality scoring: length, mean token length, stopword ratio, upper /
    * digit / punctuation character ratios — the standard cheap pre-filters
    * of a training-data pipeline, as pure column arithmetic.
    */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val stop = size(filter(toks, t => t === "the" || t === "a" || t === "of"))
    val nonAlnum = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    // width-pinned: per-row tokenize+regex kernel, single consumer — the
    // languageId rationale verbatim (3.5 s linear at sf1 before the pin)
    Tables.widenSmall(Tables.documents(s, d))
      .select(
        col("doc_id"),
        col("n_chars"),
        nTok.as("n_tokens"),
        round((length(col("text")) - nTok + 1).cast("double") / nTok, 4)
          .as("avg_token_len"),
        round(stop.cast("double") / nTok, 4).as("stopword_ratio"),
        nonAlnum.as("n_punct"),
        // composite quality score: long enough, not too repetitive
        round(
          least(nTok.cast("double") / 50.0, lit(1.0)) *
          (size(array_distinct(toks)).cast("double") / nTok), 4).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprinting: full-text MD5 plus a positional sample
    * fingerprint (first/middle/last token) — cheap near-constant-size keys
    * for exact and structural dedup at scale.
    */
  def fingerprints(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        md5(col("text")).as("md5"),
        concat_ws("|",
          element_at(toks, 1),
          // Column./ is float division — truncate back for the index
          element_at(toks, (size(toks) / 2).cast("int") + 1),
          element_at(toks, -1)).as("sketch"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing fingerprint profile (the MOSS scheme, Schleimer–
    * Wilkerson–Aiken 2003): hash every k-gram (k = 3 tokens), select the
    * minimum of each sliding length-`w` window, and profile the selected
    * fingerprint density per source — the guarantee-carrying sampling
    * scheme behind plagiarism/overlap detection (any shared run of
    * w + k − 1 tokens shares ≥ 1 selected fingerprint).
    *
    * Selection uses the exact gap characterization instead of a window
    * scan: with distinct hashes, position `i` is the minimum of SOME
    * length-`w` window iff its nearest strictly-smaller neighbors on the
    * two sides are more than `w` apart (distances capped at `w`; doc
    * edges count as no-smaller, i.e. the sequence extends with +∞ — so
    * short docs still emit fingerprints). 60-bit md5 k-gram hashes make
    * ties vanishingly rare; a tie would select both positions, which
    * only nudges the density audit, never drops a match.
    *
    * Scale shape: selection is pure per-row array arithmetic (2(w−1)
    * bounded probes per position, ZERO window-function shuffle — the
    * doc-partitioned lag/lead spelling would shuffle the exploded corpus
    * by doc_id first), and the only shuffle is the (source, fp) rollup
    * whose unselected mass rides a per-source null key that map-side
    * combine collapses to one row per partition. Expected density is
    * 2/(w+1) — the audit column a corpus-overlap dashboard tracks
    * against theory.
    */
  def winnowProfile(s: SparkSession, d: String, w: Int = 4): DataFrame =
    winnowPositions(s, d, w)
      .groupBy(col("source"), col("fp")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("n_positions"),
        sum(when(col("fp").isNotNull, col("c")).otherwise(0L))
          .as("n_selected"),
        sum(when(col("fp").isNotNull, 1L).otherwise(0L)).as("n_distinct_fp"),
        sum(when(col("fp").isNotNull && col("c") > 1, col("c")).otherwise(0L))
          .as("n_dup_positions"))
      .select(col("source"), col("n_positions"), col("n_selected"),
        (graft.operators.Num.halfUpDiv(col("n_selected") * 1000000L,
          col("n_positions")).cast("double") / 1e6).as("density"),
        col("n_distinct_fp"), col("n_dup_positions"))
      .orderBy(col("source"))

  // The selection arithmetic (an md5 per k-gram position) is the pack's
  // single most expensive scan and is consumed by BOTH the density profile
  // and the MOSS pair detector — memoize the full positions frame per
  // (session, dir, w) like DedupOps' shingle index, so a session (and the
  // interleaved bench) pays the corpus hash pass once per snapshot.
  private val winnowPosCache =
    new graft.SessionCache[DataFrame](maxEntries = 8, onEvict = graft.SessionCache.release)

  /** The winnowing selection itself: one row per k-gram position,
    * `fp` = the 60-bit fingerprint where the position is selected, null
    * where not (so consumers can count both sides without a second
    * corpus scan). Shared by [[winnowProfile]] and
    * [[graft.operators.DedupOps.winnowPairs]]; memoized + persisted per
    * (session, dir, w).
    */
  private[operators] def winnowPositions(s: SparkSession, d: String,
      w: Int = 4): DataFrame =
    winnowPosCache.getOrElseUpdate(s, s"$d#$w") { (ss, _) =>
      graft.SessionCache.cut(winnowPositionsUncached(ss, d, w))
    }

  private def winnowPositionsUncached(s: SparkSession, d: String,
      w: Int): DataFrame = {
    val toks = tokens(col("text"))
    val hs = transform(sequence(lit(1), size(toks) - 2),
      i => conv(substring(md5(array_join(slice(toks, i, lit(3)), " ")), 1, 15),
        16, 10).cast("long"))
    // Nearest strictly-smaller distance on one side, capped at w. The
    // bounds guard is load-bearing: BOTH engines resolve negative list
    // indices from the END of the array, so an unguarded i−j ≤ 0 would
    // silently compare against the far edge instead of +∞.
    def dist(hsC: Column, i: Column, back: Boolean): Column = {
      val cases = (1 until w).map { j =>
        val off = if (back) i - j else i + j
        val inBounds = if (back) i > j else lit(true)
        (inBounds && try_element_at(hsC, off) < try_element_at(hsC, i),
          lit(j))
      }
      cases.tail.foldLeft(when(cases.head._1, cases.head._2)) {
        case (acc, (c, v)) => acc.when(c, v)
      }.otherwise(lit(w))
    }
    val sel = (hsC: Column, i: Column) =>
      dist(hsC, i, back = true) + dist(hsC, i, back = false) > w
    Tables.documents(s, d)
      .where(size(tokens(col("text"))) >= 3)
      .select(col("doc_id"), col("source"), hs.as("hs"))
      .select(col("doc_id"), col("source"), explode(transform(
        sequence(lit(1), size(col("hs"))),
        i => when(sel(col("hs"), i), element_at(col("hs"), i)))).as("fp"))
  }

  /** Language identification via stopword-profile scoring — the classic
    * n-gram/stopword heuristic. Profiles are tiny hardcoded maps; the
    * score is computed with higher-order array functions, no UDF.
    * (The fixture corpus shares one synthetic vocabulary, so predictions
    * are uniform — the operator's value is the deterministic machinery,
    * exercised for real by the unit tests on multilingual text.)
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langIdScore(text: Column, profile: Seq[String]): Column = {
    val toks = tokens(lower(text))
    val hits = size(filter(toks, t => profile.map(w => t === w).reduce(_ || _)))
    hits.cast("double") / greatest(size(toks), lit(1))
  }

  /** Cross-source distribution divergence: pairwise Jensen–Shannon
    * divergence between per-source unigram distributions, plus vocabulary
    * overlap and each side's out-of-vocabulary token mass — the mixture
    * drift audit ("did the new crawl shift vocabulary?", "which sources
    * are near-duplicates of each other at the distribution level?").
    *
    * Scale design:
    *  - One corpus shuffle: the (source, term) rollup. Everything after
    *    runs on vocabulary-sized (counts) or |sources|²-sized (pairs) data.
    *  - Only SHARED terms need the pair join: a term absent from the other
    *    side contributes exactly p·ln2 to JS, so the one-sided mass is the
    *    closed form ln2·(1 − shared_mass/total) from integer sums — no
    *    full-outer join over the vocabulary union.
    *  - Cross-engine exactness: per-term JS contributions are quantized to
    *    integer nano-units before summing (order-independent, the
    *    tfidfSimilarPairs stance); shared/total masses are integer counts.
    *    ln(2) enters as the same 17-digit literal on both engines rather
    *    than trusting two libms to agree.
    *  - Source pairs with NO shared vocabulary still appear (JS = ln 2):
    *    the pair frame is the |sources|² cross of totals, left-joined to
    *    the shared-term aggregate.
    */
  def sourceDivergence(s: SparkSession, d: String): DataFrame =
    sourceDivergenceOf(Tables.documents(s, d))

  private val Ln2 = 0.6931471805599453

  /** [[sourceDivergence]] over an arbitrary `(source, text)` frame. */
  def sourceDivergenceOf(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("source"))
      .agg(sum(col("c")).as("tok"), count(lit(1)).as("vocab"))
    val ta = tot.select(col("source").as("sa"), col("tok").as("toka"),
      col("vocab").as("va"))
    val tb = tot.select(col("source").as("sb"), col("tok").as("tokb"),
      col("vocab").as("vb"))
    val x = cnt.select(col("source").as("sa"), col("term"), col("c").as("ca"))
    val y = cnt.select(col("source").as("sb"), col("term"), col("c").as("cb"))
    val sharedAgg = x.join(y, Seq("term")).where(col("sa") < col("sb"))
      .join(broadcast(ta), Seq("sa")).join(broadcast(tb), Seq("sb"))
      .withColumn("p", col("ca").cast("double") / col("toka"))
      .withColumn("q", col("cb").cast("double") / col("tokb"))
      .withColumn("cq", round(
        (col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))) +
         col("q") * log(lit(2.0) * col("q") / (col("p") + col("q")))) * 1e9)
        .cast("long"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("shared_terms"),
        sum(col("ca")).as("ash"), sum(col("cb")).as("bsh"),
        sum(col("cq")).as("sum_cq"))
    ta.crossJoin(tb).where(col("sa") < col("sb")) // |sources|² rows
      .join(sharedAgg, Seq("sa", "sb"), "left")
      .select(
        col("sa").as("source_a"), col("sb").as("source_b"),
        col("va").as("vocab_a"), col("vb").as("vocab_b"),
        coalesce(col("shared_terms"), lit(0L)).as("shared_terms"),
        round(coalesce(col("shared_terms"), lit(0L)).cast("double") /
          (col("va") + col("vb") - coalesce(col("shared_terms"), lit(0L))), 6)
          .as("vocab_jaccard"),
        round(lit(0.5) * (
          coalesce(col("sum_cq"), lit(0L)).cast("double") / lit(1e9) +
          lit(Ln2) * (lit(1.0) -
            coalesce(col("ash"), lit(0L)).cast("double") / col("toka")) +
          lit(Ln2) * (lit(1.0) -
            coalesce(col("bsh"), lit(0L)).cast("double") / col("tokb"))), 6)
          .as("js_divergence"),
        round(lit(1.0) -
          coalesce(col("bsh"), lit(0L)).cast("double") / col("tokb"), 6)
          .as("oov_b_in_a"),
        round(lit(1.0) -
          coalesce(col("ash"), lit(0L)).cast("double") / col("toka"), 6)
          .as("oov_a_in_b"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def languageId(s: SparkSession, d: String): DataFrame = {
    // tokenize ONCE in a staged projection: the per-language score closure
    // over the raw text re-derived split(lower(text)) per language (plus
    // once per size()) — ~10 splits of every document per row; `tk` is
    // referenced |langs|·2 times below, so CollapseProject keeps the stage
    // (the repeatSpansOf landmine rules)
    def scoreOf(tk: Column, profile: Seq[String]): Column = {
      val hits = size(filter(tk, t => profile.map(w => t === w).reduce(_ || _)))
      hits.cast("double") / greatest(size(tk), lit(1))
    }
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      struct(round(scoreOf(col("tk"), prof), 6).as("score"),
             lit(lang).as("lang"))
    }
    // width-pinned (Tables.widenSmall, 512 MB-gated → no-op at corpus
    // scale): the per-language score closures are the hot stage and the
    // single-row-group fixture scan would run them ONE-core — measured
    // linear (not sublinear) ×10 scaling at sf1 (3.4 s = 10 × sf0.1).
    // Single consumer chain, so the r12 multi-subtree caveat
    // (RetrievalOps.tfidfSimilarPairs) does not apply.
    Tables.widenSmall(Tables.documents(s, d))
      .select(col("doc_id"), col("lang").as("lang_actual"),
        tokens(lower(col("text"))).as("tk"))
      .select(col("doc_id"), col("lang_actual"),
        greatest(scored: _*).as("best"))
      .select(
        col("doc_id"), col("lang_actual"),
        col("best.lang").as("lang_predicted"),
        col("best.score").as("confidence"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID confidence calibration: accuracy of [[languageId]]'s
    * prediction within each confidence decile — "can I trust the
    * confidence as a probability?" The operational question behind every
    * threshold choice downstream (curation keeps docs whose langid is
    * confident; this table says what a 0.3 actually buys). A calibrated
    * classifier shows accuracy rising with the decile; a flat column
    * means the score ranks but does not calibrate.
    *
    * Exact arithmetic: confidence is already a 6-dp rational (stopword
    * hit ratio), so deciles and per-decile accuracy are integer ops; one
    * |deciles|-key rollup after the per-doc scoring scan.
    */
  def langIdCalibration(s: SparkSession, d: String): DataFrame = {
    val lid = languageId(s, d).select(
      round(col("confidence") * 1e6, 0).cast("long").as("cq"),
      when(col("lang_predicted") === col("lang_actual"), 1L).otherwise(0L)
        .as("ok"))
    lid
      .groupBy(call_function("div", col("cq"), lit(100000L))
        .cast("int").as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        (graft.operators.Num.halfUpDiv(lit(1000000L) * sum(col("ok")),
          count(lit(1))).cast("double") / 1e6).as("accuracy"),
        (graft.operators.Num.halfUpDiv(sum(col("cq")), count(lit(1)))
          .cast("double") / 1e6).as("mean_confidence"))
      .orderBy(col("decile"))
  }

  /** Top TF-IDF keyphrases per source: the terms that most distinguish
    * each source slice from the rest of the corpus — smoothed idf
    * (ln((N+1)/(df+1)) + 1 over SOURCE document frequency), score =
    * tf · idf.
    *
    * Plan: per-(source, term) tf and per-term source-df are two rollups
    * of one token explosion; N rides a 1-row broadcast. The per-source
    * top-k is the bounded two-phase [[graft.functions.TopKAgg]] — source
    * is a bounded-cardinality key, so a rank window here would sort each
    * source's ENTIRE vocabulary on one reducer at scale. Winners carry a
    * portable 60-bit md5 term id and join back to the scored table for
    * the term text (winner side is k·|sources| rows — broadcast).
    *
    * Determinism: idf quantizes to integer micro-units BEFORE the
    * tf-multiply (score_q = tf · idf_q is pure long arithmetic); the only
    * cross-engine float op is round(ln·1e6) over ≤|sources| distinct
    * inputs. Ties order by the term id on both engines.
    */
  /** Character-diversity quality audit: per-document Gini impurity of the
    * character distribution (1 − Σpᵢ²) — the gibberish/degenerate-text
    * signal that catches what token-level [[qualityScore]] can't (one
    * repeated character, base64 blobs, padding floods all collapse the
    * char distribution long before token ratios move). Entropy is the
    * textbook choice but needs float logs whose last ulp differs across
    * engines; Gini is a RATIONAL function of the counts, so the whole
    * audit runs in exact long arithmetic: gini_ppm =
    * ⌊1e6·(n²−Σcᵢ²)/n²⌉ (half-up, [[graft.operators.Num.halfUpDiv]]).
    *
    * Scale shape: the per-doc counts are ONE compiled pass per row
    * ([[graft.functions.sketch.charStats]], a codegen'd
    * native expression — the original array-HOF spelling re-filtered
    * the char array once per DISTINCT char per statistic, interpreted,
    * and the honest noop-sink bench measured it as the single most
    * expensive query in the suite, 6.9 s at sf0.1 → 0.3 s native; ZERO
    * shuffle — no corpus-char explosion), and the only shuffle is the
    * |sources|-key rollup of constant-width quantized rows.
    */
  def charDiversity(s: SparkSession, d: String,
      lowPpm: Long = 915000L): DataFrame = {
    val n = col("st.n")
    val sumSq = col("st.sum_sq")
    val maxCnt = col("st.max_cnt")
    val perDoc = Tables.documents(s, d)
      .select(col("source"),
        graft.functions.sketch.charStats(col("text")).as("st"))
      .select(col("source"),
        graft.operators.Num.halfUpDiv(lit(1000000L) * (n * n - sumSq), n * n)
          .as("gini_ppm"),
        graft.operators.Num.halfUpDiv(lit(1000000L) * maxCnt, n)
          .as("topchar_ppm"))
    perDoc.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (graft.operators.Num.halfUpDiv(sum(col("gini_ppm")), count(lit(1)))
          .cast("double") / 1e6).as("mean_gini"),
        (min(col("gini_ppm")).cast("double") / 1e6).as("min_gini"),
        sum(when(col("gini_ppm") < lowPpm, 1L).otherwise(0L)).as("n_low"),
        (max(col("topchar_ppm")).cast("double") / 1e6).as("max_topchar"))
      .orderBy(col("source"))
  }

  /** Tokenizer-fertility audit: per language, how many subword-ish
    * tokens the BPE-proxy regex produces per whitespace word and per 100
    * characters — the "this language costs N× more tokens per byte"
    * number that drives mixture budgeting and per-language context-window
    * math in a training pipeline (fertility is THE standard tokenizer
    * metric; here the regex run-splitter stands in for the real BPE, same
    * stance as [[tokenStats]]).
    *
    * Determinism: per-doc ratios quantize to ppm longs
    * ([[graft.operators.Num.halfUpDiv]]) before the |langs|-key rollup;
    * the corpus-level fertility divides the raw long sums once. Zero
    * shuffle until the constant-width rollup rows.
    */
  def tokenizerFertility(s: SparkSession, d: String): DataFrame = {
    val nws = size(tokens(col("text"))).cast("long")
    val nrx = size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
      .cast("long")
    val nch = length(col("text")).cast("long")
    val perDoc = Tables.documents(s, d).select(col("lang"),
      graft.operators.Num
        .halfUpDiv(lit(1000000L) * nrx, greatest(nws, lit(1L))).as("fert_ppm"),
      graft.operators.Num
        .halfUpDiv(lit(100000000L) * nrx, greatest(nch, lit(1L)))
        .as("per100_ppm"),
      nrx.as("nrx"), nws.as("nws"))
    perDoc.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (graft.operators.Num.halfUpDiv(sum(col("fert_ppm")), count(lit(1)))
          .cast("double") / 1e6).as("mean_fertility"),
        (graft.operators.Num.halfUpDiv(sum(col("per100_ppm")), count(lit(1)))
          .cast("double") / 1e6).as("mean_tokens_per_100ch"),
        (graft.operators.Num
          .halfUpDiv(lit(1000000L) * sum(col("nrx")), sum(col("nws")))
          .cast("double") / 1e6).as("corpus_fertility"))
      .orderBy(col("lang"))
  }

  /** Type-token-ratio audit: per-document lexical diversity (distinct
    * whitespace tokens ÷ tokens) bucketed into deciles — the repetition
    * screen at the WORD level, complementing [[charDiversity]] (chars)
    * and `repetitionStats` (Gopher bigram mass): templated/spun text
    * sits in the low deciles, natural prose high. TTR is rational in two
    * integer counts, so the audit is exact long arithmetic end to end —
    * and the emitted mean stays a quantized long (`mean_ttr_ppm`) so the
    * hashed oracle comparison never touches float formatting;
    * decile 10 is the all-distinct (TTR = 1.0) bucket, populated by
    * short docs — which is WHY the mean doc length rides along (TTR's
    * length sensitivity is the caveat every corpus-stats writeup flags).
    */
  def typeTokenRatio(s: SparkSession, d: String): DataFrame = {
    val nTok = size(tokens(col("text"))).cast("long")
    val nTyp = size(array_distinct(tokens(col("text")))).cast("long")
    val perDoc = Tables.documents(s, d).select(
      graft.operators.Num
        .halfUpDiv(lit(1000000L) * nTyp, greatest(nTok, lit(1L)))
        .as("ttr_ppm"),
      nTok.as("n_tok"))
    perDoc
      .groupBy(call_function("div", col("ttr_ppm"), lit(100000L))
        .cast("int").as("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        graft.operators.Num.halfUpDiv(sum(col("ttr_ppm")), count(lit(1)))
          .as("mean_ttr_ppm"),
        graft.operators.Num.halfUpDiv(sum(col("n_tok")), count(lit(1)))
          .as("mean_tokens"))
      .orderBy(col("decile"))
  }

  private val keyphraseCache =
    new graft.SessionCache[DataFrame](maxEntries = 8, onEvict = graft.SessionCache.release)

  def keyphrases(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    // The scored (source, term) table is k-independent and is consumed by
    // BOTH the top-k rollup and the final term join-back — without the
    // memo the corpus explode→rollup subtree re-runs on each side of the
    // broadcast boundary (ReusedExchange never crosses it). Memoized per
    // (session, dir) as a checkpointed leaf (the winnowPositions stance);
    // vocabulary×|sources|-sized, never corpus-sized.
    val scored = keyphraseCache.getOrElseUpdate(s, s"$d#keyphrases") { (ss, _) =>
      val tf = Tables.documents(ss, d)
        .select(col("source"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val sourceDf = tf.groupBy(col("term")).agg(count(lit(1)).as("n_src"))
      val nSources = tf.select(col("source")).distinct()
        .agg(count(lit(1)).as("n_sources"))
      graft.SessionCache.cut(tf
        .join(sourceDf, Seq("term"))
        .join(broadcast(nSources))
        .select(col("source"), col("term"), col("tf"), col("n_src"),
          (col("tf") *
            round((log((col("n_sources") + 1).cast("double") / (col("n_src") + 1))
              + lit(1.0)) * 1e6, 0).cast("long")).as("score_q"),
          conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long").as("tid")))
    }
    val winners = scored
      .groupBy(col("source"))
      .agg(graft.functions.TopKAgg.topK(
        lit(""), -col("score_q").cast("double"), col("tid"), lit(0.0), k).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("tid"))
    winners.join(scored, Seq("source", "tid"))
      .select(col("source"), col("rank"), col("term"), col("tf"), col("n_src"),
        round(col("score_q").cast("double") / 1e6, 6).as("score"))
      .orderBy(col("source"), col("rank"))
  }

  /** Vocabulary-growth (Heaps-law) profile: distinct whitespace terms
    * first seen per doc-id decile, with cumulative vocabulary and token
    * volume — the table that answers "is the corpus still contributing
    * new types, or are we re-reading the same vocabulary?" (tokenizer
    * sizing + diminishing-returns check before buying more of a source).
    * Published as exact counts plus types-per-million-tokens; no float
    * logs (the charDiversity precedent — a Heaps exponent fit would put
    * ln() in the hash check).
    *
    * Plan shape: pass 1 rolls the corpus into the 10-row decile grid
    * (docs + tokens); pass 2 is the first-occurrence rollup — a shuffle
    * keyed on the term (bounded by vocabulary, the inverted-index/tf-idf
    * precedent) collapsed onto the same grid. The 9 doc-id fences are a
    * percentile aggregate broadcast onto each pass; each consumer branch
    * re-derives it from a scan PRUNED to the single int64 doc_id column
    * (fence recompute is 2 extra int-column passes, not text passes —
    * cheaper than persisting a 1-row frame at cluster scale).
    * Cumulatives are a window over the 10-row grid, never the corpus.
    *
    * Determinism: fences are interpolated percentiles rounded to 6 dp
    * (`percentile` ≡ `quantile_cont`, the q_rel_quantiles precedent);
    * deciles compare `fence < doc_id` in both engines; ratios are
    * [[Num.halfUpDiv]] ppm.
    */
  def vocabGrowth(s: SparkSession, d: String, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val docs = Tables.documents(s, d)
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val fences = docs.agg(
      transform(graft.functions.QuantilesAgg
          .quantiles(col("doc_id").cast("double"), qs),
        f => round(f, 6)).as("fs"))
    def decileOf(id: Column): Column =
      size(filter(col("fs"), f => f < id.cast("double"))) + 1
    val grid = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok"))
      .crossJoin(broadcast(fences))
      .groupBy(decileOf(col("doc_id")).as("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val firstSeen = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(fences))
      .groupBy(decileOf(col("first_doc")).as("decile"))
      .agg(count(lit(1)).as("new_terms"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(firstSeen, Seq("decile"), "left")
      .na.fill(0L, Seq("new_terms"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_vocab", sum(col("new_terms")).over(w))
      .select(col("decile"), col("n_docs"), col("n_tokens"), col("new_terms"),
        col("cum_tokens"), col("cum_vocab"),
        graft.operators.Num
          .halfUpDiv(lit(1000000L) * col("cum_vocab"), col("cum_tokens"))
          .as("types_per_mtok"))
      .orderBy(col("decile"))
  }

  /** Term burstiness (Church–Gale): for the corpus' `topN` highest-df
    * terms, the variance-to-mean ratio of within-document term frequency
    * over the documents containing the term. VMR ≈ 1 is Poisson
    * (function words scatter uniformly); VMR ≫ 1 is bursty (content
    * words clump — one mention begets more). The signal separates
    * topical vocabulary from glue even when raw frequency can't, and it
    * flags template/boilerplate terms (high df AND high VMR) that
    * quality filters should discount.
    *
    * Plan: explode → (doc_id, term) tf rollup — each document's tokens
    * sit in one input row, so map-side partial aggregation collapses
    * within-doc duplicates BEFORE the exchange; the shuffle carries one
    * row per distinct (doc, term), the information floor for per-doc tf.
    * Then a vocabulary-sized rollup to (df, Σtf, Σtf²) and a top-N
    * TakeOrderedAndProject. VMR is exact-rational in long arithmetic:
    * Var/mean = (n·Σx² − (Σx)²)/(n·Σx), half-up at micro-units —
    * no engine-divergent float accumulation anywhere.
    */
  def termBurstiness(s: SparkSession, d: String, topN: Int = 20): DataFrame =
    // ROW-gated width pin (r15, VERDICT r14 #4): r14's byte gate could
    // not separate the fixtures (0.59 vs 0.91 MB files for 50k vs 500k
    // docs) and the unconditional pin lost at sf0.1 (0.33 → 0.69 s b2b)
    // while winning at sf1; the parquet-footer row gate fires at ≥20k
    // docs only — sf0.1 stays un-pinned, the ×10 fixture parallelizes
    termBurstinessOf(
      Tables.widenSmallRows(s, d, "documents", Tables.documents(s, d),
        20000L), topN)

  /** [[termBurstiness]] over an arbitrary `(doc_id, text)` frame. */
  def termBurstinessOf(docs: DataFrame, topN: Int = 20): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        sum(col("tf") * col("tf")).as("tf_sq"))
      .select(
        col("term"), col("df"), col("total_tf"),
        (graft.operators.Num.halfUpDiv(col("total_tf") * 1000000L, col("df"))
          .cast("double") / 1e6).as("mean_tf"),
        (graft.operators.Num.halfUpDiv(
          (col("df") * col("tf_sq") - col("total_tf") * col("total_tf"))
            * 1000000L,
          col("df") * col("total_tf"))
          .cast("double") / 1e6).as("vmr"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(topN)
  }
}
