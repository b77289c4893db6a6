package graft

import graft.rel.SkewJoin
import org.apache.spark.sql.functions._

/** Salted join/aggregation equivalence: same results as the unsalted
  * forms on a deliberately skewed key distribution.
  */
class SkewJoinSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  test("saltedJoin == plain join on a skewed key") {
    val e = Tables.events(spark, sf)  // event_type: 5 hot keys
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 3),
      ("signup", 4), ("error", 5)).toDF("et", "code")
    val plain = e.join(dim, $"event_type" === $"et")
      .select($"event_id", $"code").orderBy($"event_id").collect()
    val salted = SkewJoin.saltedJoin(e, dim, "event_type", "et", 8)
      .select($"event_id", $"code").orderBy($"event_id").collect()
    assert(plain.length > 0 && salted.toSeq === plain.toSeq)
  }

  test("saltedCount == plain groupBy count") {
    val e = Tables.events(spark, sf)
    val plain = e.groupBy($"event_type").count()
      .orderBy($"event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    val salted = SkewJoin.saltedCount(e, "event_type", 8)
      .orderBy($"event_type").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("S12: results stream to the driver via toLocalIterator (bounded memory)") {
    val it = SparkEntry.queries("agg_sum_by_group")(spark, sf).toLocalIterator()
    var n = 0
    while (it.hasNext) { it.next(); n += 1 }
    assert(n === 5)
  }
}
