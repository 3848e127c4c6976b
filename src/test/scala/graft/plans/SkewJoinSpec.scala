package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Proof of the skew stance (SURVEY build plan: "salting for skew, AQE
  * for runtime re-plan"): a join with one hot key re-plans at runtime —
  * AQE detects the oversized shuffle partition and splits it across
  * tasks (`skew=true` on the sort-merge join) instead of one straggler
  * executor dragging the stage. Salting (`q48`) is the static answer
  * for aggregations; this is the dynamic one for joins. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits the hot-key partition: skew=true in the final join plan") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 100k rows on ONE key vs 100 rows each on 99 others: the hot
      // key's partition is ~1000x its siblings
      val left = spark.range(0, 110000).toDF("i")
        .select(when(col("i") < 100000, lit(7L))
          .otherwise(col("i") % 100).as("k"), col("i").as("payload"))
      val right = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "meta")
        .repartition(4) // force a real shuffle side, no broadcast
      val joined = left.join(right, "k")
      // materialize THIS QueryExecution (count() would build its own
      // plan and leave joined's adaptive plan unexecuted)
      assert(joined.collect().length == 110000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot partition as skew-handled:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
