package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev diagnostic: run ONE dedup shape in its own SparkSession against
  * a replicated-documents dir, printing its output cardinality and
  * wall-clock. Isolating ops in separate JVMs is the point — it is how
  * the r6 scale-probe disk exhaustion was bisected to (a) the 32-bit
  * SimHash block join (structural, fixed by the 60-bit fingerprint) and
  * then (b) cross-op dead-shuffle accumulation (environmental, fixed by
  * periodic cleaner GC in ScaleProbe). `runMain graft.DiagDedup
  * <replicaDir> <op>` where op in shingle|jaccard|lsh|simhash|cc.
  */
object DiagDedup {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val op = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(dir)
    println(s"docs=${d.count()}")
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    op match {
      case "shingle" =>
        // the shared first stage: how many (id, shingle) rows?
        val sh = d.select(col("doc_id"), explode(array_distinct(
          filter(transform(split(lower(col("text")), "\\s+"),
            (w, i) => concat_ws(" ",
              element_at(split(lower(col("text")), "\\s+"), i + lit(1)),
              element_at(split(lower(col("text")), "\\s+"), i + lit(2)),
              element_at(split(lower(col("text")), "\\s+"), i + lit(3)))),
            s => !s.contains("null")))).as("s"))
        println(s"approx shingle rows=${sh.count()}")
      case "cand" =>
        // candidate-pair volume of the df-capped posting-list path (the
        // verify join's input — drives its shuffle/spill footprint)
        val sh = d.select(col("doc_id").as("id"),
          explode(graft.functions.TextFunctions.shinglesOfTokens(
            graft.functions.TextFunctions.tokens(col("text")), 3)).as("s"))
        val posting = sh.groupBy(col("s"))
          .agg(count(lit(1)).as("df"))
          .where(col("df").between(2, 100))
        println("posting_lists=" + posting.count())
        println("cand_pre_distinct=" + posting.agg(
          sum(col("df") * (col("df") - 1) / 2)).head().get(0))
      case "jaccard" =>
        val s = t { println("pairs=" + operators.Dedup.ngramJaccardPairs(
          d, col("doc_id"), col("text"), 3, 0.5,
          maxShingleDf = Some(100)).count()) }
        println(s"jaccard_s=$s")
      case "lsh" =>
        val s = t { println("pairs=" + operators.Dedup.minhashLshPairs(
          d, col("doc_id"), col("text"), 3, 16, 4, 0.5).count()) }
        println(s"lsh_s=$s")
      case "simhash" =>
        val s = t { println("pairs=" + operators.Dedup.simhashPairs(
          d, col("doc_id"), col("text"), 3).count()) }
        println(s"simhash_s=$s")
      case "cc" =>
        val s = t { println("clusters=" + operators.Dedup.dupClusters(
          operators.Dedup.minhashLshPairs(d, col("doc_id"), col("text"),
            3, 16, 4, 0.5), col("d1"), col("d2"))
          .where(col("is_survivor")).count()) }
        println(s"cc_s=$s")
    }
    spark.stop()
  }
}
