package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Co-located join via bucketed storage (SURVEY §4 / the 100 TB design):
  * the archive and its companion tables are bucketed on the join key at
  * write time, so repeated joins/aggregations on that key run with NO
  * shuffle exchange — the per-stage repartitioning cost is paid once at
  * ingest. This is the Spark analogue of the reference's per-kit tables
  * (manual partitioning by kit). */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans without a shuffle") {
    import spark.implicits._
    // warehouse.dir is a static conf; the default ./spark-warehouse is
    // fine for the managed test tables (dropped in finally, gitignored)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val a = (1 to 1000).map(i => (i % 50, i.toDouble)).toDF("k", "v")
      val b = (1 to 500).map(i => (i % 50, s"m$i")).toDF("k", "m")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bj_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bj_b")
      val joined = spark.table("bj_a").join(spark.table("bj_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      assert(n == (1 to 1000).map(_ % 50).groupBy(identity).map { case (k, as) =>
        as.size * (1 to 500).count(_ % 50 == k)
      }.sum)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_a")
      spark.sql("DROP TABLE IF EXISTS bj_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i % 50, i.toDouble)).toDF("k", "v")
    a.write.mode("overwrite").bucketBy(8, "k").saveAsTable("bj_c")
    try {
      val plan = spark.table("bj_c").groupBy("k").agg(sum("v"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS bj_c")
  }
}
