package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (r8): time the full q26 df-capped n-gram Jaccard at a
  * scaled dir, min-of-N. `runMain graft.DfProbe <dir> [reps]`. */
object DfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val c = operators.Dedup.ngramJaccardPairs(
        docs, col("doc_id"), col("text"), 3, 0.5, maxShingleDf = Some(100)).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"RUN $s%8.2f s  -> $c pairs")
      s
    }
    println(f"MIN ${times.min}%8.2f s")
    spark.stop()
  }
}
