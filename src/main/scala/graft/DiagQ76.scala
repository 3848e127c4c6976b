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
    spark.stop()
  }

  private def renderLines(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val devId = concat(lit("kit"), col("user_id"))
    val port = (col("event_id") % 3 + 2).cast("int")
    val counter = col("event_id") % 1000
    val iso = date_format(date_trunc("second", col("ts")),
      "yyyy-MM-dd'T'HH:mm:ss'Z'")
    val payloadB64 = base64(devId.cast("binary"))
    def rssi(i: Int) = -(lit(50) + (col("event_id") + lit(13 * i)) % 70)
    def snr(i: Int) = (col("event_id") + lit(7 * i)) % 20 - 10
    def gwV2(i: Int) = concat(
      lit(s"""{"gtw_id":"gw$i","rssi":"""), rssi(i),
      lit(""","snr":"""), snr(i), lit("}"))
    def gwV3(i: Int) = concat(
      lit(s"""{"gateway_ids":{"gateway_id":"gw$i"},"rssi":"""), rssi(i),
      lit(""","snr":"""), snr(i), lit("}"))
    def gwList(gw: Int => Column) = concat_ws(",", gw(0),
      when(col("event_id") % 3 >= 1, gw(1)),
      when(col("event_id") % 3 === 2, gw(2)))
    val v2 = concat(
      lit("""{"app_id":"app1","dev_id":""""), devId,
      lit("""","port":"""), port,
      lit(""","counter":"""), counter,
      lit(""","payload_raw":""""), payloadB64,
      lit("""","metadata":{"time":""""), iso,
      lit("""","gateways":["""), gwList(gwV2), lit("]}}"))
    val v3 = concat(
      lit("""{"end_device_ids":{"device_id":""""), devId,
      lit("""","application_ids":{"application_id":"app1"}},"received_at":""""), iso,
      lit("""","uplink_message":{"f_port":"""), port,
      lit(""","f_cnt":"""), counter,
      lit(""","frm_payload":""""), payloadB64,
      lit("""","rx_metadata":["""), gwList(gwV3), lit("]}}"))
    e.select(concat(
      lit("devices/"), col("event_id"), lit(" "),
      when(col("event_id") % 2 === 0, v2).otherwise(v3)).as("line"))
  }
}
