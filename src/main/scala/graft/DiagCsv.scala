package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (r14): q82 CSV-roundtrip stage decomposition + clustered-
  * write A/B. Where do the seconds go — the hourly frame, the
  * partitioned CSV write (tasks × keys small files?), or the read-back?
  *
  *   runMain graft.DiagCsv <sfDir> [reps]
  */
object DiagCsv {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fromS = 1704067200L
    val toS = 1704240000L
    def frame = operators.HourlyExport.hourlyFrame(Tables.events(spark, sfDir),
      pmod(col("user_id"), lit(50)), col("ts"), col("value"), fromS, toS)
    def countFiles(dir: String): Long = {
      val root = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.isDirectory(root)) return 0
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.getFileName.toString.endsWith(".csv")).count()
      finally s.close()
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def leg(name: String)(f: => Unit): Unit = {
      val t = (1 to reps).map(_ => time(f)).min
      println(f"CSVSTAGE $name%-16s $t%8.2f s (min-of-$reps)")
    }
    leg("frame_noop")(frame.write.mode("overwrite").format("noop").save())
    val dirA = Scratch.tempDir("q82diag_plain_").toString
    val dirB = Scratch.tempDir("q82diag_clust_").toString
    leg("write_plain") {
      frame.write.mode("overwrite").partitionBy("k")
        .option("header", "true").csv(dirA)
    }
    leg("write_clustered") {
      frame.repartition(col("k")).write.mode("overwrite").partitionBy("k")
        .option("header", "true").csv(dirB)
    }
    println(s"CSVSTAGE files plain=${countFiles(dirA)} clustered=${countFiles(dirB)}")
    val schema = "bucket_ts LONG, avg_value DOUBLE, n LONG"
    leg("read_plain")(spark.read.option("header", "true").schema(schema)
      .csv(dirA).write.mode("overwrite").format("noop").save())
    leg("read_clustered")(spark.read.option("header", "true").schema(schema)
      .csv(dirB).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
