package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q104 cost attribution: times each PII pattern's count+redact pass
  * separately over a documents dir (min-of-3 per leg after a warmup),
  * plus the r10 fixture-only phone pattern as the A/B baseline — ran
  * for the r11 sf1 sweep where q104 read 26.7× its sf0.1 time for 10×
  * data (adjudication in docs/SCALING.md r11: salted sf1 text is both
  * longer and digit-dense, which multiplies regex work per char; the
  * wider phone alternation pays a further constant on digit runs).
  * `runMain graft.DiagPii <docsDir>` */
object DiagPii {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Tables.documents(spark, dir).select(col("text"))
    def run(re: String): Double = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        d.select(regexp_count(col("text"), lit(re)).as("n"),
            md5(regexp_replace(col("text"), lit(re), lit("<X>"))).as("m"))
          .agg(sum(col("n")), count(col("m"))).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      math.rint(best * 1000) / 1000
    }
    run("[0-9]+") // codegen + scan warmup
    val legs =
      ("phone_r10_fixture_only" -> "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{1,10}") +:
        functions.PiiFunctions.patterns.map { case (n, re, _) => n -> re }
    legs.foreach { case (name, re) =>
      println(s"""{"leg":"$name","sec":${run(re)}}""")
    }
    spark.stop()
  }
}
