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

  test("every declared query runs and returns rows on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        if (n > 0) None else Some(s"$name: 0 rows")
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
