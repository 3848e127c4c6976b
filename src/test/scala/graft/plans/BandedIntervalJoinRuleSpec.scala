package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BandedIntervalJoinRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pairs(withRule: Boolean): (String, Set[(Long, Long)]) = {
    import spark.implicits._
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      if (withRule) Seq(BandedIntervalJoinRule) else Nil
    try {
      val a = (0L until 300L).map(i => i * 37 % 1000).toDF("x")
      val b = (0L until 300L).map(i => i * 53 % 1000).toDF("y")
      val joined = a.join(b, abs(col("x") - col("y")) <= lit(5L))
      val plan = joined.queryExecution.executedPlan.toString
      (plan, joined.as[(Long, Long)].collect().toSet)
    } finally spark.experimental.extraOptimizations = saved // restore global reg
  }

  test("abs(x-y)<=tol joins rewrite from nested-loop to banded equi-join") {
    val (naivePlan, naiveResult) = pairs(withRule = false)
    assert(naivePlan.contains("NestedLoop"),
      s"expected the O(n·m) baseline plan:\n$naivePlan")
    val (bandedPlan, bandedResult) = pairs(withRule = true)
    assert(!bandedPlan.contains("NestedLoop"),
      s"rule did not fire:\n$bandedPlan")
    assert(bandedPlan.contains("Generate"), "band explode missing")
    // identical result set — the banding is lossless
    assert(bandedResult == naiveResult)
    assert(naiveResult.nonEmpty)
  }

  test("rule leaves non-matching joins alone") {
    import spark.implicits._
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq(BandedIntervalJoinRule)
    try {
      val a = Seq(1L, 2L).toDF("x")
      val b = Seq(1L, 3L).toDF("y")
      // equi-join: untouched
      assert(a.join(b, col("x") === col("y")).count() == 1)
      // strict < (not <=): untouched, still correct via nested loop
      assert(a.join(b, abs(col("x") - col("y")) < lit(2L)).count() == 3)
      // left join with the abs cond: out of scope, still correct
      assert(a.join(b, abs(col("x") - col("y")) <= lit(1L), "left").count() == 3)
    } finally spark.experimental.extraOptimizations = saved
  }
}
