package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage breakdown for q76 (TTN envelope round trip): times the
  * fixture render, render+parse, and the full query separately so the
  * expensive stage is measured, not guessed. Not part of the contract. */
object DiagQ76 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id % 7)").collect()

    def time(label: String)(df: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${ts.min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val q = SparkEntry.queries("q76_ttn_envelope")
    // stage A: render only (reproduce the fixture expression)
    val lines = renderLines(spark, sfDir)
    time("A render-only")(lines)
    time("B render+from_json")(lines.select(
      from_json(col("line").substr(lit(30), lit(100000)),
        graft.ingest.TtnEnvelope.envelopeSchema).as("e")).select(col("e.app_id")))
    time("C render+parse")(graft.ingest.TtnEnvelope.parse(lines, col("line")))
    time("D full q76")(q(spark, sfDir))
    // r12 legs over PERSISTED lines (the Bench timing shape): isolates
    // the operator pipeline from the render, and the parse from the
    // downstream timestamp/md5/unbase64 stages.
    val path = s"/tmp/graft_diag_q76_${math.abs(sfDir.hashCode)}"
    lines.write.mode("overwrite").parquet(path)
    val persisted = spark.read.parquet(path)
    time("L0 read lines only")(persisted)
    time("L1 read+parse (unfused)")(graft.ingest.TtnEnvelope.parse(persisted, col("line")))
    time("L2 read+parseBest (fused)")(graft.ingest.TtnEnvelope.parseBest(persisted, col("line")))
    time("L3 read+full pipeline")(SparkEntry.q76Pipeline(persisted))
    spark.stop()
  }

  private def renderLines(s: SparkSession, d: String): DataFrame =
    SparkEntry.ttnFixtureLines(Tables.events(s, d))
}
