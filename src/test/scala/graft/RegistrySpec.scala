package graft

/** Build-time validation of the driver contract surface (VERDICT r4 #2):
  * every registered query must ANALYZE (schema resolves against the real
  * sf0.001 fixtures) and EXECUTE (count() runs) — this is the spec that
  * would have caught r4's `q_prep_pii` referencing columns absent from the
  * customer fixture before it shipped. Also pins the registry's shape:
  * every oracle twin points at a registered query, and the flagship entry
  * returns rows.
  */
class RegistrySpec extends SparkSpec {

  test("every registered query analyzes and executes on the sf0.001 fixtures") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf0001)
        assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
        df.count() // forces execution end-to-end, not just analysis
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage}")
      }
    }
    assert(bad.isEmpty, s"${bad.size} queries failed:\n${bad.mkString("\n")}")
  }

  test("every oracle twin targets a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.mkString(", ")}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every replay twin is anchored by a brute-force property spec") {
    // A replay twin (an oracle that unrolls the engine's own algorithm as
    // CTEs) proves determinism, not correctness — its correctness evidence
    // is an independent brute-force property spec, linked by a
    // `brute-force anchor: <query-id>` tag in the spec source. This lint
    // fails if a future replay twin lands without that anchor, or an
    // anchor names a query that no longer exists (VERDICT r11 #5).
    import scala.jdk.CollectionConverters._
    val testRoot = java.nio.file.Paths.get("src/test/scala/graft")
    assert(java.nio.file.Files.isDirectory(testRoot),
      "source-tree lint must run from the repo root")
    // an anchor is a whole comment line of query ids — prose mentions of
    // the phrase (like this one) never match
    val anchorLine = """^\s*// brute-force anchor:((?:\s+q_[a-z0-9_]+)+)\s*$""".r
    val anchored = java.nio.file.Files.walk(testRoot).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator
          .flatMap {
            case anchorLine(ids) => ids.trim.split("\\s+").toSeq
            case _ => Nil
          }
      }.toSet
    val unanchored = SparkEntry.replayTwins -- anchored
    assert(unanchored.isEmpty,
      s"replay twins without an independent brute-force spec anchor: ${unanchored.mkString(", ")}")
    val ghosts = anchored -- SparkEntry.queries.keySet
    assert(ghosts.isEmpty,
      s"anchors naming unregistered queries: ${ghosts.mkString(", ")}")
    val untwinned = SparkEntry.replayTwins -- SparkEntry.oracleSql.keySet
    assert(untwinned.isEmpty,
      s"replayTwins entries without an oracle twin: ${untwinned.mkString(", ")}")
  }
}
