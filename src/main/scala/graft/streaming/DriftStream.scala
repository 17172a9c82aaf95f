package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Online quality-distribution drift monitor — the streaming twin of
  * [[graft.operators.TrainPrepOps.qualityDriftOf]], on Spark 4's
  * `transformWithState` (the [[BurnRateStream]] / [[BudgetStream]] API
  * stance: typed state handle + TTL, RocksDB state store).
  *
  * Semantics mirror the batch operator cell for cell: documents at or
  * below `boundaryId` accumulate the per-source REFERENCE decile
  * histogram (the batch operator's early half — its doc-id midpoint,
  * passed in because an online monitor cannot know the corpus midpoint);
  * documents above it accumulate the CURRENT histogram. Every batch that
  * touches a source emits that source's refreshed drift row — exact
  * total-variation distance plus the most-shifted decile — so the LATEST
  * row per source always equals the batch replay over the same
  * documents, bit for bit (same half-up ppm longs, same present-bucket
  * arg-max tie-break).
  *
  * Scale: state per source is 20 longs (2 × 10 decile counts) —
  * independent of stream length; TTL reclaims sources that stop
  * emitting. Histogram accumulation is commutative, so arrival order
  * and batch boundaries cannot change the final row.
  */
object DriftStream {

  /** A scored document: `q4` is the shared composite quality quantized
    * to 1e-4 longs ([[graft.operators.CurationOps.qualityCol]] × 10⁴ —
    * the batch operator's exact quantization).
    */
  final case class DocQuality(source: String, doc_id: Long, q4: Long)

  /** A drift verdict for one source, as of the emitting micro-batch. */
  final case class DriftRow(
      source: String, n_early: Long, n_late: Long,
      tvd: Double, top_shift_bucket: Int, top_shift: Double)

  final case class DriftState(early: Seq[Long], late: Seq[Long])

  private def halfUp(num: Long, den: Long): Long =
    if (num >= 0) (2 * num + den) / (2 * den) else -((-2 * num + den) / (2 * den))

  /** The batch operator's arithmetic over two decile histograms —
    * shared by the processor and the spec's oracle. Shares are half-up
    * ppm longs; an empty half contributes zero shares; the arg-max runs
    * over PRESENT buckets only (max(struct) over the batch `cells`
    * rows), ties to the larger bucket.
    */
  private[streaming] def score(
      source: String, early: Seq[Long], late: Seq[Long]): DriftRow = {
    val nEarly = early.sum
    val nLate = late.sum
    def share(n: Long, tot: Long): Long =
      if (tot > 0) halfUp(1000000L * n, tot) else 0L
    val cells = (0 until 10).filter(b => early(b) + late(b) > 0)
    val dppm = cells.map(b => b -> (share(late(b), nLate) - share(early(b), nEarly)))
    val sad = dppm.map { case (_, d) => math.abs(d) }.sum
    val (topB, topD) = dppm.maxBy { case (b, d) => (math.abs(d), b) }
    DriftRow(source, nEarly, nLate,
      halfUp(sad, 2L).toDouble / 1e6, topB, topD.toDouble / 1e6)
  }

  private class DriftProcessor(boundaryId: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, DocQuality, DriftRow] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[DriftState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DriftState](
        "drift_hist", Encoders.product[DriftState], ttl)

    override def handleInputRows(
        source: String, rows: Iterator[DocQuality],
        timerValues: TimerValues): Iterator[DriftRow] = {
      val s = if (st.exists()) st.get() else
        DriftState(Seq.fill(10)(0L), Seq.fill(10)(0L))
      val early = s.early.toArray
      val late = s.late.toArray
      var touched = false
      rows.foreach { doc =>
        val bucket = math.min(doc.q4 / 1000L, 9L).toInt
        if (doc.doc_id <= boundaryId) early(bucket) += 1L
        else late(bucket) += 1L
        touched = true
      }
      if (!touched) Iterator.empty
      else {
        st.update(DriftState(early.toSeq, late.toSeq))
        Iterator.single(score(source, early.toSeq, late.toSeq))
      }
    }
  }

  /** Apply the drift monitor to a stream of scored documents keyed by
    * source. `boundaryId` is the reference-snapshot boundary (the batch
    * operator derives it as the corpus doc-id midpoint). Requires the
    * RocksDB state store provider (a transformWithState constraint).
    */
  def monitor(
      docs: Dataset[DocQuality],
      boundaryId: Long,
      ttl: TTLConfig = TTLConfig.NONE): Dataset[DriftRow] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(
        new DriftProcessor(boundaryId, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
