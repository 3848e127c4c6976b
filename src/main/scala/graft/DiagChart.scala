package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only (r14): plan dump + interleaved A/B for the q89 series
  * assembly — the SHIPPED window form (the operator) vs the REJECTED
  * aggregate + broadcast-join form (mirrored inline below; measured
  * flat at sf0.1 and 2.7× slower at sf1, see ChartDoc.seriesBlocks).
  * The declared q89 plan (PLANS.txt) only shows the parse-back scan —
  * the seriesBlocks frame executes eagerly inside document()'s collect
  * — so this prints its formatted plan too.
  *
  *   runMain graft.DiagChart <sfDir> [reps] [plan]
  */
object DiagChart {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.events(spark, sfDir)
      .where(col("event_type") =!= "error" || col("event_id") % 149 === 0)
    def eS(c: org.apache.spark.sql.Column) = unix_timestamp(c.cast("timestamp"))
    def blocksNew = operators.ChartDoc.seriesBlocks(e,
      (col("user_id") % 12).cast("int"), col("event_type"),
      eS(col("ts")), col("event_id"), col("value"))
    // The REJECTED aggregate + broadcast-join form, mirrored verbatim
    // (packed (t << 32 | o) first-reading min with enforced guards).
    def blocksOld = {
      val base = e.select((col("user_id") % 12).cast("int").as("st"),
        col("event_type").as("pol"), eS(col("ts")).as("t"),
        col("event_id").as("o"), col("value").as("v"))
      val packOk = col("t") >= 0 && col("t") < lit(1L << 31) &&
        col("o") >= 0 && col("o") < lit(1L << 32)
      val packTO = shiftleft(col("t").cast("long"), 32)
        .bitwiseOR(col("o").cast("long"))
      val stats = base.groupBy(col("st"), col("pol"))
        .agg(min(col("t")).as("t0"), count(lit(1)).as("n"),
          min(coalesce(when(packOk, packTO), raise_error(concat(
            lit("seriesBlocks: (t, o) out of packing range "),
            col("t").cast("string"), lit(","), col("o").cast("string")))))
            .as("first_pk"))
        .where(col("n") >= operators.ChartDoc.MinHours + 1)
      val rows = base
        .join(broadcast(stats.select(col("st"), col("pol"), col("t0"),
          col("first_pk"))), Seq("st", "pol"))
        .withColumn("rn", when(packTO === col("first_pk"), lit(1))
          .otherwise(lit(2)))
        .withColumn("k", when(col("rn") === 1, lit(0L))
          .otherwise(floor((col("t") - col("t0")) / lit(operators.ChartDoc.UnitS)) + 1))
      val buckets = rows.groupBy(col("st"), col("pol"), col("t0"), col("k"))
        .agg(avg(col("v")).as("m"),
          max(when(col("rn") === 1, col("v"))).as("raw"))
        .withColumn("mdec", col("m").cast("decimal(18,6)"))
        .withColumn("val_js",
          when(col("k") === 0, col("raw").cast("string"))
            .when(col("mdec") < 0.1, lit("null"))
            .otherwise((floor(col("mdec") * 10 + lit(BigDecimal("0.4")))
              .cast("double") / 10).cast("string")))
      val blocks = buckets.groupBy(col("st"), col("pol"), col("t0"))
        .agg(map_from_entries(collect_list(struct(col("k"), col("val_js"))))
          .as("mp"), max(col("k")).as("kmax"))
        .withColumn("data_js", concat(lit("["),
          array_join(transform(sequence(lit(0L), col("kmax")),
            k => coalesce(element_at(col("mp"), k), lit("null"))), ","),
          lit("]")))
      blocks
        .withColumn("series_idx", row_number().over(
          Window.partitionBy(col("st")).orderBy(col("pol"))) - 1)
        .select(col("st"), col("series_idx"), col("pol"),
          col("t0").as("start_s"), lit(operators.ChartDoc.UnitS).as("unit_s"),
          concat(col("pol"), lit(" (S"), col("st"), lit(")")).as("title"),
          col("data_js"))
    }
    if (args.contains("plan")) {
      println("===== seriesBlocks NEW plan =====")
      println(blocksNew.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("===== seriesBlocks OLD plan =====")
      println(blocksOld.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      spark.stop(); return
    }
    // value equivalence first, then the interleaved timing
    val diff = blocksNew.as("n").join(blocksOld.as("o"),
        Seq("st", "series_idx"), "full")
      .where(not(struct(col("n.pol"), col("n.start_s"), col("n.data_js")) <=>
        struct(col("o.pol"), col("o.start_s"), col("o.data_js")))).count()
    require(diff == 0, s"old/new seriesBlocks diverge on $diff rows")
    println("EQUIV ok (old == new on every series)")
    def leg(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    leg(blocksNew) // warmup
    val ts = (1 to reps).map { i =>
      val a = leg(blocksNew); val b = leg(blocksOld)
      println(f"AB round $i: shipped(window) $a%8.2f s  rejected(agg) $b%8.2f s")
      (a, b)
    }
    println(f"AB MIN seriesBlocks shipped ${ts.map(_._1).min}%8.2f s  " +
      f"rejected ${ts.map(_._2).min}%8.2f s")
    spark.stop()
  }
}
