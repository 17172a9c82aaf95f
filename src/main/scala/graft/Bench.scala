package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line of per-query seconds.
  *
  * Each query is timed `SPARK_GRAFT_RUNS` times (default 3) and reports the
  * MIN — the local[32] host shows 20–40s run-to-run noise on the full
  * suite, so a single sample conflates operator cost with host jitter
  * (VERDICT r1 asked for min-of-3). The first run of the first query also
  * absorbs JVM/codegen warmup; the JSON carries the run count for honesty.
  *
  * Fail-loud (VERDICT r4 #3): a throwing query is reported under "errors"
  * with its message and EXCLUDED from the per-query map and the total —
  * r4's swallow-and-time-zero let a broken query *improve* the bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC") // NTZ-as-UTC convention (Tables.events)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM + parquet reader once so timings measure queries, not
    // class-loading (same treatment for every query; tiny sf0.001 input).
    // Inside try/catch: r7's fixture-schema drift crashed this line and
    // zeroed the whole round's bench artifact (rc=1, no sidecar, no compact
    // line). A broken flagship costs warmup accuracy, never the artifact.
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"warmup failed (continuing): $e") }
    // INTERLEAVED passes (suite × runs, not query × runs): the host shows
    // spiky multi-second contention windows; three back-to-back samples of
    // one query all land in the same window and the min is still poisoned.
    // Spreading a query's samples across full-suite passes decorrelates
    // them from any single noise burst — same work, better estimator.
    // optional comma-separated filter (scale studies time a subset; the
    // driver leaves it unset and times everything)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n)))
    val best = scala.collection.mutable.Map[String, Double]()
    val errors = scala.collection.mutable.Map[String, String]()
    for (_ <- 0 until runs; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best.getOrElse(name, Double.MaxValue)) best(name) = dt
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
    }
    // The harness keeps only the last ~2000 chars of stdout and parses the
    // JSON line out of that window. At 148 queries the full per-query map is
    // ~4.5 KB — it can never fit, which is why every BENCH_r0N came back
    // parsed:null. Split the contract: the FULL map goes to a sidecar file
    // (BENCH_local.json in the cwd, i.e. the repo — committed per round as
    // BENCH_r0N_local.json), and stdout carries a compact line that fits the
    // window: total, per-pack rollups, the heaviest individual queries up to
    // a character budget, and ALL errors (loud part stays loud).
    def sec(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jstr(s: String): String = {
      // code-point-safe truncation: .take(60) alone can split a surrogate
      // pair, leaving an unpaired high surrogate in the JSON (ADVICE r7)
      val cut0 = s.take(60)
      val cut = if (cut0.nonEmpty && Character.isHighSurrogate(cut0.last)) cut0.dropRight(1) else cut0
      "\"" + cut.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    }
    val ok = names.filter(best.contains).sorted
    val errJson = errors.toSeq.sortBy(_._1)
      .map { case (n, m) => "\"" + n + "\":" + jstr(m) }.mkString("{", ",", "}")
    // the compact stdout line carries at most K error entries (~140 chars
    // each escaped — unbounded, a heavy-failure round blows the ~2000-char
    // harness window exactly when the loud part matters; ADVICE r7). The
    // FULL errors map always goes to the sidecar.
    val errCap = 8
    val errSorted = errors.toSeq.sortBy(_._1)
    val errJsonCompact = errSorted.take(errCap)
      .map { case (n, m) => "\"" + n + "\":" + jstr(m) }.mkString("{", ",", "}")
    val errTruncated = math.max(0, errSorted.size - errCap)
    val total = ok.map(best).sum
    spark.stop()

    val fullQs = ok.map(n => "\"" + n + "\":" + sec(best(n))).mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$fullQs,"errors":$errJson,"sf":"$sfDir","runs":$runs}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")
    // "full" points at the sidecar only if this run actually wrote it —
    // otherwise a stale file from a previous run could be read as this
    // round's results (ADVICE r7)
    val fullField =
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outPath),
          (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        "\"" + outPath + "\""
      } catch {
        case e: Throwable =>
          System.err.println(s"bench sidecar write failed: $e"); "null"
      }

    // pack = the q_<pack>_ prefix (q_rel_topk -> rel); rollup keeps every
    // query's time visible in the parsed line even when the query itself
    // doesn't make the top-slowest cut
    val packs = ok.groupBy(n => n.split("_").lift(1).getOrElse("other"))
      .toSeq.sortBy(_._1)
      .map { case (p, ns) => "\"" + p + "\":" + sec(ns.map(best).sum) }
      .mkString("{", ",", "}")
    val budget = 1500 // chars for the whole line; harness window is ~2000
    val slowest = ok.sortBy(n => -best(n))
    val head = new StringBuilder(
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","sf":"$sfDir","runs":$runs,"n_queries":${ok.size},"full":$fullField,"packs":$packs,"errors":$errJsonCompact,"errors_truncated":$errTruncated,"queries":{""")
    var first = true
    for (n <- slowest) {
      val item = (if (first) "" else ",") + "\"" + n + "\":" + sec(best(n))
      if (head.length + item.length + 2 <= budget) { head ++= item; first = false }
    }
    head ++= "}}"
    // rc stays 0 — the driver still needs to parse the JSON line; the
    // "errors" object (non-empty = red) is the loud part
    println(head.toString)
  }
}
