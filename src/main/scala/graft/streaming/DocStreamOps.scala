package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.sketch.{minhashSig, wordShingles}
import graft.operators.DedupOps

/** Streaming near-duplicate detection — the ONLINE half of the MinHash/LSH
  * dedup pack: tag each arriving document that collides with a recently
  * seen document in any LSH band and agrees on >= `minEst` of the full
  * signature. The batch pack answers "which pairs in this corpus"; this
  * answers "is this incoming document a near-repeat", the shape an ingest
  * pipeline needs (drop near-spam at the door, not in tomorrow's batch).
  *
  * Plan: one stateless codegen'd pass computes the signature and explodes
  * the (band, bucket) keys — embarrassingly parallel; the only stateful
  * stage keys the state store by (band, bucket). State per bucket is a
  * bounded ring of the `maxPerBucket` most recent (doc_id, signature)
  * entries, and an event-time timeout clears buckets idle past the TTL —
  * state is bounded by (active buckets × maxPerBucket × k longs),
  * independent of stream length. At 100 TB/day that bound — not the
  * detection math — is what makes the operator runnable.
  *
  * Output contract: a doc colliding with the same earlier doc in m bands
  * emits m tags (at-least-once per matching band; `distinct` on
  * (doc_id, dup_of) gives the pair set). Docs shorter than the shingle
  * width carry no signature and are passed through untagged.
  */
object DocStreamOps {

  /** Input document (event-time stamped). */
  final case class Doc(ts: Timestamp, doc_id: Long, text: String)

  /** One near-duplicate hit: `doc_id` repeats `dup_of` (est = fraction of
    * agreeing signature components, the MinHash Jaccard estimate).
    */
  final case class DupTag(doc_id: Long, dup_of: Long, est_jaccard: Double, band: Int)

  // public: Catalyst's generated (de)serializers instantiate these from
  // codegen'd classes, which cannot touch privates
  final case class BandRow(
      ts: Timestamp, doc_id: Long, band: Int, bucket: Long, sig: Seq[Long])

  final case class SigEntry(id: Long, sig: Seq[Long])
  final case class BucketState(entries: Seq[SigEntry])

  /** Streaming curation verdict — one row per arriving document. */
  final case class CurateVerdict(
      doc_id: Long, n_tokens: Int, quality: Double,
      is_dup_copy: Boolean, canonical_doc_id: Long, decision: String)

  final case class FpRow(
      ts: Timestamp, doc_id: Long, fp: String, n_tokens: Int, quality: Double)

  final case class FpState(canonical: Long)

  /** The ONLINE half of [[graft.operators.CurationOps.curate]]: score and
    * gate documents as they arrive, with the same signals, thresholds and
    * rule order as the batch pipeline (the column expressions are shared,
    * so a doc scores identically in both paths).
    *
    * Dedup semantics are the streaming analog of the batch canonical-id:
    * batch picks min(doc_id) per fingerprint corpus-wide; a stream can't
    * see the future, so the FIRST-SEEN doc (event-time order within each
    * micro-batch) becomes the fingerprint's canonical and later copies are
    * `duplicate`. State per fingerprint is one long (the canonical id),
    * keyed by the 32-byte md5 — bounded by distinct active fingerprints,
    * and an event-time TTL (`fpTtlMs` past the last sighting) retires
    * fingerprints the stream has moved past, exactly like the batch
    * pipeline re-run on a trailing window. All signal computation is
    * stateless codegen'd column arithmetic; only the (fp → id) lookup
    * touches state.
    */
  def curateStream(
      docs: Dataset[Doc],
      minTokens: Int = 20,
      minQuality: Double = 0.5,
      lateness: String = "10 minutes",
      fpTtlMs: Long = 60L * 60 * 1000): Dataset[CurateVerdict] = {
    import docs.sparkSession.implicits._
    import graft.operators.CurationOps
    docs.toDF()
      .select(col("ts"), col("doc_id"), md5(col("text")).as("fp"),
        CurationOps.nTokensCol.as("n_tokens"),
        CurationOps.qualityCol.as("quality"))
      .as[FpRow]
      .withWatermark("ts", lateness)
      .groupByKey(_.fp)
      .flatMapGroupsWithState[FpState, CurateVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rs: Iterator[FpRow], state: GroupState[FpState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrivals = rs.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var canon = state.getOption.map(_.canonical).getOrElse(-1L)
            val out = arrivals.map { r =>
              val isDup = canon >= 0 && r.doc_id != canon
              if (canon < 0) canon = r.doc_id
              val decision =
                if (r.n_tokens < minTokens) "too_short"
                else if (r.quality < minQuality) "low_quality"
                else if (isDup) "duplicate"
                else "kept"
              CurateVerdict(r.doc_id, r.n_tokens, r.quality, isDup, canon, decision)
            }
            state.update(FpState(canon))
            state.setTimeoutTimestamp(arrivals.last.ts.getTime + fpTtlMs)
            out.iterator
          }
      }
  }

  def nearDupTags(
      docs: Dataset[Doc],
      k: Int = 32,
      bands: Int = 8,
      minEst: Double = 0.5,
      shingleWidth: Int = 3,
      lateness: String = "10 minutes",
      bucketTtlMs: Long = 60L * 60 * 1000,
      maxPerBucket: Int = 64): Dataset[DupTag] = {
    import docs.sparkSession.implicits._
    val rows = k / bands
    require(bands * rows == k, s"bands ($bands) must divide k ($k)")

    docs.toDF()
      .withColumn("shs", wordShingles(split(col("text"), " "), shingleWidth))
      .where(size(col("shs")) > 0)
      .withColumn("sig", minhashSig(col("shs"), k))
      .select(col("ts"), col("doc_id"),
        posexplode(DedupOps.bandBucketsXx(col("sig"), bands, rows))
          .as(Seq("band", "bucket")),
        col("sig"))
      .as[BandRow]
      .withWatermark("ts", lateness)
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[BucketState, DupTag](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Long), rs: Iterator[BandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // bucket idle past TTL: its candidates can no longer match
            state.remove()
            Iterator.empty
          } else {
            val arrivals = rs.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var entries = state.getOption.map(_.entries).getOrElse(Seq.empty)
            val tags = Seq.newBuilder[DupTag]
            arrivals.foreach { r =>
              entries.foreach { e =>
                var eq = 0
                var i = 0
                while (i < k) { if (e.sig(i) == r.sig(i)) eq += 1; i += 1 }
                val est = eq.toDouble / k
                if (est >= minEst) tags += DupTag(r.doc_id, e.id, est, r.band)
              }
              entries = (entries :+ SigEntry(r.doc_id, r.sig)).takeRight(maxPerBucket)
            }
            state.update(BucketState(entries))
            state.setTimeoutTimestamp(arrivals.last.ts.getTime + bucketTtlMs)
            tags.result().iterator
          }
      }
  }

  /** Continuous incremental cluster attach: the foreachBatch loop that
    * turns [[graft.operators.DedupOps.incrementalClusters]] into an
    * ingest-time verdict stream. Every micro-batch attaches against the
    * SAME corpus snapshot (the session memos — primeable from a durable
    * [[graft.operators.DedupOps.loadDedupIndex]] artifact, so a verdict
    * job needs the index, not the corpus) and appends its
    * new/joined/merged verdicts to `outDir`.
    *
    * Contract: verdicts are SNAPSHOT-relative — batches do not see each
    * other (cross-arrival duplicate discovery belongs to the next
    * snapshot rebuild; [[nearDupTags]] is the online cross-arrival
    * detector). Delivery is EXACTLY-ONCE (VERDICT r13 #5): each batch's
    * verdicts commit through [[LogIngest.commitBatchFlat]]'s
    * marker+manifest protocol — a retried batch whose predecessor
    * committed is a no-op, a torn attempt is cleaned and redone — so the
    * raw parquet at `outDir` is duplicate-free and [[attachedVerdicts]]
    * is defense-in-depth (a deterministic read for tables written before
    * this contract, or polluted out-of-band), no longer the contract.
    * `namespace` isolates co-writing queries' markers; give each logical
    * attach query its own (as `LogIngest.commitNamespace` does from the
    * checkpoint dir).
    */
  def attachStream(docs: Dataset[Doc], corpusDir: String, outDir: String,
      minSim: Double = 0.2, maxDf: Long = 1000L, namespace: String = "attach")
      : org.apache.spark.sql.streaming.DataStreamWriter[Doc] = {
    val fn: (Dataset[Doc], Long) => Unit = { (df, batchId) =>
      LogIngest.commitBatchFlat(
        DedupOps.incrementalClusters(df.sparkSession, corpusDir,
            df.select(col("doc_id"), col("text")), minSim, maxDf)
          .withColumn("batch_id", lit(batchId)),
        batchId, outDir, namespace)
    }
    docs.writeStream.outputMode(OutputMode.Update()).foreachBatch(fn)
  }

  /** Deterministic dedup read over an attach output (VERDICT r12 #7): one
    * verdict row per (batch_id, doc_id). Since [[attachStream]] commits
    * through the manifest protocol (VERDICT r13 #5) the raw table is
    * already duplicate-free and this is defense-in-depth — provably a
    * no-op on a protocol-written table (spec-pinned) — kept for tables
    * written before that contract or appended to out-of-band.
    *
    * Why this is safe: a retried micro-batch re-runs the SAME
    * snapshot-relative attach over the SAME input rows, so duplicate
    * (batch_id, doc_id) rows can differ only if the retry raced a corpus
    * snapshot swap — the row_number over the remaining columns makes even
    * that pathological case a deterministic pick rather than a
    * flaky-by-file-order one. The window partitions on the pair key, so
    * at scale this shuffles the verdict table once on its natural key —
    * verdicts are output-sized (one row per arrived doc), not
    * corpus-sized.
    */
  def attachedVerdicts(s: org.apache.spark.sql.SparkSession,
      outDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = s.read.parquet(outDir)
    val rest = raw.columns.filterNot(c => c == "batch_id" || c == "doc_id")
      .sorted.map(col).toSeq
    val w = Window.partitionBy(col("batch_id"), col("doc_id"))
      .orderBy(rest: _*)
    raw.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }
}
