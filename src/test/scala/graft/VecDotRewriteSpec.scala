package graft

import graft.functions.VectorFunctions
import graft.plans.VecDotRewrite
import org.apache.spark.sql.functions._

/** The optimizer rule: the HOF dot-product pattern rewrites to the native
  * expression with unchanged results; non-matching shapes are untouched.
  */
class VecDotRewriteSpec extends SparkSpec {
  import SparkSpec.session.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ VecDotRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == VecDotRewrite)
  }

  test("HOF dot product is rewritten to vec_dot_native and results match") {
    // QueryExecution caches the optimized plan lazily — build a FRESH
    // DataFrame for each phase so the rule's presence/absence is observed
    def hofDf = Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", VectorFunctions.vec_dot($"embedding", $"embedding").as("d"))
    val plain = hofDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    withRule {
      val df = hofDf
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vec_dot_native"),
        s"expected rewrite in optimized plan:\n$optimized")
      val rewritten = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(rewritten === plain)
    }
  }

  test("non-dot-product aggregates are left alone") {
    val e = Tables.embeddings(spark, sf).limit(10)
    // sum of MAXes, not products — must not match
    val df = e.select(
      aggregate(zip_with($"embedding", $"embedding",
          (x, y) => greatest(x.cast("double"), y.cast("double"))),
        lit(0.0), (s, x) => s + x).as("d"))
    withRule {
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("vec_dot_native"), optimized)
      assert(df.count() === 10)
    }
  }

  test("double arrays (no float cast) are left alone — rule is float-specific") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
        lit(0.0), (s, x) => s + x).as("d"))
    withRule {
      assert(!df.queryExecution.optimizedPlan.toString.contains("vec_dot_native"))
      assert(df.head.getDouble(0) === 11.0)
    }
  }
}
