package graft

import org.apache.spark.sql.functions._

/** Semantic corners of the scalar-function families (SURVEY §2.8) pinned
  * to golden values — the spots where engines commonly disagree.
  */
class FnSemanticsSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  private def one(c: org.apache.spark.sql.Column) =
    spark.range(1).select(c).head

  test("add_months clamps to month end (Jan 31 + 1 = Feb 29 in a leap year)") {
    assert(one(add_months(lit("2024-01-31").cast("date"), 1)).getDate(0)
      === java.sql.Date.valueOf("2024-02-29"))
    assert(one(add_months(lit("2023-01-31").cast("date"), 1)).getDate(0)
      === java.sql.Date.valueOf("2023-02-28"))
  }

  test("session_window MERGES a gap exactly equal to the threshold (strict > break)") {
    // Locks the empirically-verified boundary rule the win_session_native
    // oracle replays: events exactly 30 min apart form ONE session
    // [first, last + gap) — adjacent event windows merge.
    val out = Seq(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")))
      .toDF("uid", "ts")
      .groupBy($"uid", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"sw.end".as("e"), $"n")
      .collect()
    assert(out.length === 1, s"exact-gap events must merge: ${out.toSeq}")
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getTimestamp(0) === java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))
  }

  test("split keeps trailing empty tokens (limit = -1 semantics)") {
    assert(one(size(split(lit("a b "), " "))).getInt(0) === 3)
  }

  test("regexp_extract with no match yields empty string, not null") {
    val r = one(regexp_extract(lit("12345"), "^([a-z]+)", 1))
    assert(!r.isNullAt(0) && r.getString(0) === "")
  }

  test("concat_ws skips nulls instead of nulling out") {
    assert(one(concat_ws("-", lit("a"), lit(null).cast("string"), lit("b")))
      .getString(0) === "a-b")
  }

  test("coalesce(bot,false)=false admits null AND false, rejects true (P6 contract)") {
    val df = Seq((1, Some(true)), (2, Some(false)), (3, None))
      .toDF("id", "bot")
    val kept = df.filter(coalesce($"bot", lit(false)) === false)
      .select("id").as[Int].collect().sorted
    assert(kept.toSeq === Seq(2, 3))
  }

  test("from_unixtime(to_timestamp) curate chain reproduces the epoch instant in UTC") {
    val r = one(to_timestamp(from_unixtime(lit(1704067199L))))
    assert(r.getTimestamp(0) === java.sql.Timestamp.valueOf("2023-12-31 23:59:59"))
  }

  test("pmod is non-negative where % would be negative") {
    assert(one(pmod(lit(-7L), lit(3L))).getLong(0) === 2L)
    assert(one(lit(-7L) % lit(3L)).getLong(0) === -1L)
  }

  test("get_json_object on missing key / corrupt doc yields null, never throws") {
    assert(one(get_json_object(lit("""{"k":1}"""), "$.missing")).isNullAt(0))
    assert(one(get_json_object(lit("not json"), "$.k")).isNullAt(0))
  }
}
