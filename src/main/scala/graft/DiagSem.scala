package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only SemDeDup stage breakdown (r12): the 220 k-vector probe leg
  * measured semDedup at 274.9 s (vs 4.5 s at 66 k — superlinear), so
  * split the operator: cell assignment, cell-width histogram (the
  * Σwidth² pair bound), and the within-cell pair join, for both the
  * n/256 auto-K and the √n alternative. */
object DiagSem {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_emb_10x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)
    spark.range(1000000).selectExpr("sum(id % 7)").collect()
    val d = spark.read.parquet(dir)
    val n = d.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (k <- Seq(math.max(8, math.ceil(n / 256.0).toInt),
                  math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt))) {
      println(s"== n=$n k=$k")
      val cells = operators.Similarity.ivfAssign(d, col("id"), col("v"), k)
      time(s"assign k=$k")(cells.write.mode("overwrite").format("noop").save())
      val w = cells.groupBy(col("cell")).count()
        .agg(max("count"), sum(col("count") * col("count")), count(lit(1))).head()
      println(s"  maxWidth=${w.getLong(0)} sumW2=${w.getLong(1)} cells=${w.getLong(2)}")
      val anchors = cells.select(col("cell"), col("id").as("a_id"),
        col("v").as("a_v"), col("n2").as("a_n2"))
      time(s"pair-join k=$k")(cells.join(anchors, Seq("cell"))
        .where(col("a_id") < col("id") &&
          operators.Similarity.dot(col("v"), col("a_v")) /
            sqrt(col("n2") * col("a_n2")) >= 0.9)
        .select(col("id")).distinct().count())
    }
    spark.stop()
  }
}
