package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication pack over `documents` — exact and near-duplicate
  * detection, the workhorse operators of a 100 TB training-data pipeline.
  *
  * Scale design:
  *  - Exact dedup is a hash groupBy on a constant-size fingerprint
  *    (md5), never on the full text → the shuffle carries 32 bytes + ids
  *    per row, not documents.
  *  - N-gram Jaccard builds the candidate set by self-joining on shared
  *    shingles. To stop hot shingles from exploding the join (the classic
  *    skew failure), very frequent shingles are dropped (document-frequency
  *    cap) — standard practice, loses only candidates that share *nothing
  *    rare*, and bounds per-key fanout.
  *  - MinHash/LSH: k=32 signatures from seeded xxhash64, banded into 8
  *    bands of 4 → join on (band, band-hash) buckets only. O(n · k) compute,
  *    shuffle on tiny bucket keys; the full O(n²) comparison never happens.
  *  - SimHash: 64-bit signature via per-token hash bit-voting; near-dup =
  *    small Hamming distance. Candidate generation by exact match on
  *    signature chunks (same banding idea).
  */
object DedupOps {

  /** Exact duplicate groups by full-text fingerprint: canonical (minimum)
    * doc_id per distinct text + the duplicate count.
    */
  def exactDuplicates(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_doc_id"), col("n_copies"), col("fp"))
      .orderBy(col("canonical_doc_id"))

  /** Distinct word-3-gram shingles per document. transform over a
    * sequence of start offsets — pure array ops, no explode until the
    * shingle table is built.
    */
  def shingles(s: SparkSession, d: String, n: Int = 3): DataFrame = {
    val toks = split(col("text"), " ")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        // guard: sequence(0, negative) would run descending for docs with
        // < n tokens — emit an empty shingle set for those instead
        when(size(toks) >= n,
          array_distinct(
            transform(
              sequence(lit(0), size(toks) - n),
              i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)
            ))).otherwise(array().cast("array<string>")).as("shs"))
      .where(size(col("shs")) > 0)
  }

  /** Near-duplicate pairs by exact n-gram Jaccard similarity >= minSim.
    * Candidate pairs come from a self-join on shared shingles (grouped,
    * so each pair is counted once with its intersection size), then
    * |A∪B| = |A|+|B|−|A∩B| gives exact Jaccard without comparing texts.
    */
  def ngramJaccardPairs(s: SparkSession, d: String, minSim: Double = 0.2): DataFrame = {
    val sh = shingles(s, d)
      .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
    val a = sh.select(col("doc_id").as("a"), col("n_sh").as("na"), col("sh"))
    val b = sh.select(col("doc_id").as("b"), col("n_sh").as("nb"), col("sh"))
    a.join(b, Seq("sh"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(
        col("a"), col("b"),
        round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .where(col("jaccard") >= minSim)
      .orderBy(col("a"), col("b"))
  }

  /** MinHash signature column: k seeded 64-bit min-hashes over the shingle
    * set. Seeding is `xxhash64(shingle, seed_i)` — Spark-native, codegen'd.
    */
  def minhashSig(shs: Column, k: Int): Column =
    array((0 until k).map { seed =>
      array_min(transform(shs, sh => xxhash64(sh, lit(seed))))
    }: _*)

  /** MinHash + LSH candidate pairs with estimated Jaccard.
    * bands=8 × rows=4 over a k=32 signature: P(candidate) ≈
    * 1−(1−j⁴)⁸ — steep around j≈0.5. Join key is (band, hash of the band
    * slice): constant-size, uniformly distributed → skew-free shuffle.
    * Estimated similarity = fraction of matching signature components.
    * (No DuckDB oracle: xxhash64 is Spark-specific → rows-only check.)
    */
  def minhashLshPairs(
      s: SparkSession, d: String,
      k: Int = 32, bands: Int = 8, minEst: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sig = shingles(s, d).select(col("doc_id"), minhashSig(col("shs"), k).as("sig"))
    val banded = sig.select(
      col("doc_id"), col("sig"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          bnd => xxhash64(concat_ws(",",
            transform(slice(col("sig"), bnd * rows + 1, lit(rows)), x => x.cast("string"))))))
        .as(Seq("band", "bucket")))
    val l = banded.select(col("doc_id").as("a"), col("sig").as("siga"), col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("b"), col("sig").as("sigb"), col("band"), col("bucket"))
    l.join(r, Seq("band", "bucket"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("siga"), col("sigb"))
      .distinct()
      .select(
        col("a"), col("b"),
        round(
          size(filter(zip_with(col("siga"), col("sigb"), (x, y) => x === y), m => m))
            .cast("double") / k, 6).as("est_jaccard"))
      .where(col("est_jaccard") >= minEst)
      .orderBy(col("a"), col("b"))
  }

  /** 64-bit SimHash per document: each token hashes to 64 bits; each bit
    * position accumulates +1/−1 votes weighted by presence; the signature
    * takes the sign. Built entirely from higher-order functions.
    * (Rows-only check — hash is engine-specific.)
    */
  def simhash(tokensCol: Column): Column = {
    val hashes = transform(tokensCol, t => xxhash64(t))
    // for each bit i: sum over tokens of (bit set ? 1 : -1), then sign bit.
    // shiftright/shiftleft by a non-literal column → call_function (the SQL
    // builtins accept expression shift amounts; the Scala shims don't).
    def shr(h: Column, i: Column): Column = call_function("shiftright", h, i)
    def shl(h: Column, i: Column): Column = call_function("shiftleft", h, i)
    val bits = transform(sequence(lit(0), lit(63)), i =>
      when(
        aggregate(hashes, lit(0L),
          (acc, h) => acc + when(shr(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
          > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)), (bit, i) => shl(bit, i)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash signatures + near-dup pairs at Hamming distance <= maxDist,
    * candidates generated by matching on any of 4 16-bit chunks (guarantees
    * recall for distance <= 3 by pigeonhole).
    */
  def simhashPairs(s: SparkSession, d: String, maxDist: Int = 3): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), simhash(split(col("text"), " ")).as("sh"))
    val chunked = docs.select(
      col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sh"), i * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ck")))
    val l = chunked.select(col("doc_id").as("a"), col("sh").as("sha"), col("chunk"), col("ck"))
    val r = chunked.select(col("doc_id").as("b"), col("sh").as("shb"), col("chunk"), col("ck"))
    l.join(r, Seq("chunk", "ck"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), col("sha"), col("shb"))
      .distinct()
      .select(col("a"), col("b"), bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
      .where(col("hamming") <= maxDist)
      .orderBy(col("a"), col("b"))
  }
}
