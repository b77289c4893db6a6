package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of mine_frequent_pairs at sf0.1 to
  * find the dominant cost. Run:
  *   sbt "runMain graft.tools.ProfMine"
  */
object ProfMine {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(tag: String)(act: => Long): Unit = {
      val r = act // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); act; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-34s rows=$r%9d best=${ts.min}%.3fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val basketsRaw = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("p")).distinct()
    time("distinct (ok,p)")(basketsRaw.count())
    val baskets = basketsRaw.persist()
    baskets.count()
    val freqItems = baskets.groupBy($"p").agg(count(lit(1)).as("c"))
      .filter($"c" >= 25L)
    time("item support pass")(freqItems.count())
    val pruned = baskets.join(freqItems, Seq("p"))
    time("prune join")(pruned.count())
    val lists = pruned.groupBy($"ok")
      .agg(sort_array(collect_list(struct($"p", $"c"))).as("it"))
    time("basket collapse")(lists.count())
    val pairs = lists.select(explode(expr(
      """flatten(transform(it, (x, i) ->
        |  transform(slice(it, i + 2, size(it)), y ->
        |    struct(x.p AS p1, y.p AS p2, x.c AS c1, y.c AS c2))))""".stripMargin
    )).as("pr")).select($"pr.p1", $"pr.p2", $"pr.c1", $"pr.c2")
    time("pair explode")(pairs.count())
    val sup = pairs.groupBy($"p1", $"p2")
      .agg(count(lit(1)).as("support"), max($"c1").as("c1"), max($"c2").as("c2"))
      .filter($"support" >= 2L)
    time("pair support")(sup.count())
    spark.stop()
  }
}
