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
  *  - Repetition stats shuffle (doc_id, bigram) partial counts with
  *    map-side combine — the wordcount shape, the safest shuffle there is.
  */
object TrainPrepOps {

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

  // ---- stratified deterministic sampling ----------------------------------

  /** Per-language stratified sample: the k docs with the smallest salted
    * hash within each language. Deterministic (hash order, not rand()),
    * and the window partitions on `lang` — stratum cardinality — so the
    * sort is per-stratum, never global. For heavily skewed strata at
    * 100 TB, the same semantics can run as a per-stratum TakeOrdered
    * (groupBy(lang) + min-k heap aggregate) — the window form is chosen
    * here for its exact SQL twin.
    */
  def stratifiedSample(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit("sample:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(h, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), row_number().over(w).as("sample_rank"))
      .where(col("sample_rank") <= k)
      .orderBy(col("lang"), col("sample_rank"))
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
  def decontaminate(s: SparkSession, d: String, minFrac: Double = 0.05): DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), explode(wordShingles(toks, 3)).as("sh"))
      .select(col("doc_id"), shingleKey(col("sh")).as("shk"))
    val evalKeys = sh.where(col("doc_id") % 10 === 0)
      .select(col("shk")).distinct()
    val train = sh.where(col("doc_id") % 10 =!= 0)
    val totals = train.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = train.join(broadcast(evalKeys), Seq("shk"), "left_semi")
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
    * fraction. Plan: one explode → (doc, bigram) count with map-side
    * combine → per-doc rollup of three scalars; nothing document-sized
    * crosses the second shuffle.
    */
  def repetitionStats(s: SparkSession, d: String, maxDupFrac: Double = 0.2): DataFrame = {
    val bigrams = transform(
      sequence(lit(1), size(toks) - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val perBigram = Tables.documents(s, d)
      .where(size(toks) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("cnt"))
    perBigram.groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        max(col("cnt")).as("top_bigram_cnt"))
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

  /** PII scan + redaction over the customer table: mask all but the last
    * four phone digits, collapse digit runs in addresses, count email-
    * shaped tokens in comments. Pure per-row regex column ops (global-
    * replace semantics on both engines) — zero shuffle, and the regexes
    * are anchored to character classes valid in both Java and RE2
    * dialects so the oracle runs the identical patterns.
    */
  def piiRedact(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        concat(
          regexp_replace(
            col("c_phone").substr(lit(1), length(col("c_phone")) - 4),
            "[0-9]", "*"),
          col("c_phone").substr(length(col("c_phone")) - 3, lit(4)))
          .as("phone_masked"),
        length(regexp_replace(col("c_phone"), "[^0-9]", "")).as("n_phone_digits"),
        regexp_replace(col("c_address"), "[0-9]+", "#").as("address_redacted"),
        size(regexp_extract_all(
          col("c_comment"), lit("[a-zA-Z0-9.]+@[a-zA-Z0-9.]+"), lit(0)))
          .as("n_emails"))
      .orderBy(col("c_custkey"))

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
    Tables.documents(s, d)
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
}
