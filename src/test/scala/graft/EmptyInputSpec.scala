package graft

/** Robustness gate: every declared query must EXECUTE (no exception, no
  * hang) against a corpus of the same schemas with ZERO rows. At 100 TB
  * this is the empty-partition / empty-day / brand-new-table case — an
  * operator that throws on empty input takes down a whole pipeline run.
  * Values are not asserted (most results are legitimately empty or null);
  * execution is.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      Tables.table(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    dir
  }

  test("every declared query executes on zero-row inputs") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(name -> e.toString.take(200)) }
    }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
  }

  private lazy val nullDir: String = {
    // every non-key column nulled: the sparse/dirty-ingest case. Keys stay
    // so joins/groupings still have semantics; everything else must
    // null-propagate, never throw.
    val keyCols = Map(
      "region" -> Set("r_regionkey"), "nation" -> Set("n_nationkey", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_nationkey"),
      "supplier" -> Set("s_suppkey", "s_nationkey"),
      "part" -> Set("p_partkey"), "orders" -> Set("o_orderkey", "o_custkey"),
      "lineitem" -> Set("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      "events" -> Set("event_id", "user_id"), "documents" -> Set("doc_id"),
      "embeddings" -> Set("vec_id", "label"))
    val dir = java.nio.file.Files.createTempDirectory("graft_null").toString
    for ((t, keys) <- keyCols) {
      val src = Tables.table(spark, sf, t).limit(20)
      val cols = src.schema.fields.map { f =>
        if (keys(f.name)) org.apache.spark.sql.functions.col(f.name)
        else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
      }
      src.select(cols.toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every declared query null-propagates on all-null non-key columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, nullDir).count(); None }
        catch { case e: Throwable => Some(name -> e.toString.take(200)) }
    }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString("\n"))
  }

  test("concurrent queries on one session produce the same results as serial runs") {
    // multi-tenant reality: one SparkSession, many threads. The library
    // must be re-entrant — shared state (curate TrieMap, lazy planes,
    // scratch dirs keyed by sfDir) must not race or cross-contaminate.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val names = Seq("agg_daily_top_titles", "join_star", "dedup_text_hash",
      "sim_topk_cosine", "filter_partition_prune", "text_chunk",
      "win_rank_topn", "sample_stratified_hash")
    val serial = names.map(n => n -> SparkEntry.queries(n)(spark, sf).count()).toMap
    val concurrent = Await.result(
      Future.sequence(names.map(n =>
        Future(n -> SparkEntry.queries(n)(spark, sf).count()))), 120.seconds).toMap
    assert(concurrent === serial)
  }
}
