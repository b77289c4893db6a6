package graft

/** Smoke: every declared query runs on sf0.001, returns rows, and every
  * oracle key refers to a declared query. The value-level check is the
  * DuckDB differential gate (tools/check_oracle.py / driver t2).
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("IMPLEMENTATION.md names every declared query key (docs track the code)") {
    val doc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("IMPLEMENTATION.md")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(k => doc.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"keys missing from IMPLEMENTATION.md: ${missing.toSeq.sorted.mkString(", ")}")
  }

  // Scale-geometry operators whose EMPTINESS at the toy corpus is the
  // design claim itself (r ≈ log₂ n band rows suppress every toy-scale
  // pair). Empty since round 11: sim_threshold_lsh_wide now plants
  // deterministic duplicate vectors into its gate fixture precisely so
  // its oracle row proves pairs instead of the empty set (round-10
  // verdict task 2) — it returns ≥ 1 row at every scale.
  private val emptyOkAtToyScale = Set.empty[String]

  test("every declared query runs and returns rows on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        val n = df.count()
        if (n > 0 || (emptyOkAtToyScale(name) && df.columns.nonEmpty)) None
        else Some(s"$name: 0 rows")
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
