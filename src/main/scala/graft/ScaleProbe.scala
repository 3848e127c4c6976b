package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scaling probe: replicate the events table N× (disjoint key/id ranges,
  * so cardinalities scale with N) and time representative operator
  * shapes — evidence that the plans scale ~linearly rather than
  * quadratically when the data grows, which is the question the bench's
  * fixed SF cannot answer.
  *
  * `runMain graft.ScaleProbe <sfDir> <mult1,mult2,...>` → one JSON line
  * per multiplier. Replicas land under /tmp.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mults = args.lift(1).getOrElse("1,3,10").split(",").map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id % 7)").collect() // warmup

    val base = Tables.events(spark, sfDir)
    // offsets derived from the data so replicas stay disjoint at ANY sf
    // (hardcoded strides would silently collide on bigger inputs and
    // fake sublinear scaling)
    val bounds = base.agg(max(col("user_id")), max(col("event_id"))).head()
    val userStride = bounds.getLong(0) + 1
    val idStride = bounds.getLong(1) + 1

    def replicate(n: Int): DataFrame =
      (0 until n).map { i =>
        base.select(
          (col("event_id") + lit(i * idStride)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(i * userStride)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)

    mults.foreach { m =>
      val dir = s"/tmp/graft_scale_${m}x"
      replicate(m).write.mode("overwrite").parquet(dir)
      val e = spark.read.parquet(dir)
      def time(f: => Unit): Double = {
        val best = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.min
        math.rint(best * 1000) / 1000
      }
      val tAgg = time {
        e.groupBy(col("user_id"), date_trunc("hour", col("ts")))
          .agg(sum(col("value")), count(lit(1)))
          .write.mode("overwrite").format("noop").save()
      }
      val tWin = time {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        e.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .write.mode("overwrite").format("noop").save()
      }
      val tJoin = time {
        val l = e.where(col("event_type") === "click")
        val r = e.where(col("event_type") === "purchase")
        operators.AsOfAlign.bucketAlign(l, col("ts"), col("value"),
            r, col("ts"), col("value"), 900)
          .write.mode("overwrite").format("noop").save()
      }
      val tZ = time {
        operators.Outliers.zscoreOutliers(e, col("user_id"), col("value"), 2.5)
          .write.mode("overwrite").format("noop").save()
      }
      val rows = e.count()
      println(s"""{"mult":$m,"rows":$rows,"agg_s":$tAgg,"window_s":$tWin,"asof_join_s":$tJoin,"zscore_s":$tZ}""")
    }
    spark.stop()
  }
}
