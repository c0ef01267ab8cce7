package graft.plans

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The runtime cartesian ban: enabled, a true cartesian fails at plan
  * compile; bounded-side cross joins (the engine's own stat-frame
  * shape) and condition-less joins that OPTIMIZE into equi-joins pass;
  * disabled (the default), nothing changes — and the entire registered
  * query surface compiles clean under the guard.
  */
class CartesianGuardSpec extends SparkSpecBase {

  private def withGuard[A](body: => A): A = {
    spark.conf.set(CartesianGuard.EnabledKey, "true")
    try body finally spark.conf.unset(CartesianGuard.EnabledKey)
  }

  test("a true cartesian is rejected at plan compile when enabled") {
    val big = spark.range(1000000).toDF("a")
    val alsoBig = spark.range(1000000).toDF("b")
    val e = intercept[IllegalStateException] {
      withGuard(big.crossJoin(alsoBig).queryExecution.optimizedPlan)
    }
    assert(e.getMessage.contains("CartesianGuard"))
    // default-off: the same plan compiles (nobody executes it here)
    big.crossJoin(alsoBig).queryExecution.optimizedPlan
  }

  test("bounded-side cross joins pass: the engine's stat-frame shape") {
    val big = spark.range(100000).toDF("a")
    withGuard {
      // global aggregate side (1 row), the dominant in-engine shape
      big.crossJoin(big.agg(count(lit(1)).as("n")))
        .queryExecution.optimizedPlan
      // explicit limit side
      big.crossJoin(big.limit(5)).queryExecution.optimizedPlan
      // literal frame side
      import spark.implicits._
      big.crossJoin(Seq(1, 2).toDF("k")).queryExecution.optimizedPlan
    }
  }

  test("a filter that optimizes into an equi-join is not flagged") {
    val a = spark.range(100000).toDF("x")
    val b = spark.range(100000).toDF("y")
    withGuard {
      // analyzed: Filter over condition-less Join; optimized: equi-join
      a.join(b).filter(col("x") === col("y"))
        .queryExecution.optimizedPlan
    }
  }

  test("every registered query compiles under the guard") {
    withGuard {
      graft.SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
        graft.SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.optimizedPlan
      }
    }
  }
}
