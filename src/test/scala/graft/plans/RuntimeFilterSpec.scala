package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Proof of the runtime-filter stance (SURVEY build plan: "push down and
  * prune"): when a large fact table shuffle-joins a dimension that
  * carries a SELECTIVE filter, the optimizer injects a bloom filter
  * built from the dimension's join keys into the fact side — the fact
  * scan then drops non-matching rows BEFORE the shuffle, which at 100 TB
  * is the difference between shuffling the full fact table and shuffling
  * the ~matching slice. Static predicate pushdown can't do this (the
  * predicate is on the dimension, not the fact); the bloom filter is the
  * dynamic bridge.
  *
  * Thresholds are lowered to test scale (the defaults gate on a 10 GB
  * application-side scan); what's asserted is the MECHANISM: same join,
  * bloom on, bloom off — the fact-side plan grows a
  * `bloomFilterMightContain` probe, and results are identical.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom probe on the fact side of a shuffle join") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rtf_").toString
    // parquet-backed so the optimizer sees real scan statistics
    spark.range(0, 200000).toDF("i")
      .select((col("i") % 1000).as("k"), col("i").as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 1000L).map(k => (k, k % 50)).toDF("k", "cat")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def runJoin() = {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").where(col("cat") === 7) // 2% of keys
      fact.join(dim, "k").select(col("k"), col("payload"), col("cat"))
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val on = runJoin()
      val onRows = on.collect()
      val onPlan = on.queryExecution.optimizedPlan.toString
      assert(onPlan.contains("bloom_filter_agg") ||
        onPlan.toLowerCase.contains("bloomfiltermightcontain"),
        s"expected a bloom-filter probe in the optimized plan:\n$onPlan")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val off = runJoin()
      val offRows = off.collect()
      val offPlan = off.queryExecution.optimizedPlan.toString
      assert(!offPlan.toLowerCase.contains("bloomfiltermightcontain"),
        "bloom probe must disappear when disabled")
      // the runtime filter is a pure pruning optimization: same rows
      assert(onRows.map(_.toString).sorted.toSeq ==
        offRows.map(_.toString).sorted.toSeq)
      // and it actually selects: 2% of dim keys → 2% of fact rows
      assert(onRows.length == 200000 / 50)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
