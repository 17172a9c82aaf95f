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
}
