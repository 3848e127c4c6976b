package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TTN MQTT envelope import — SURVEY §2.3 D1 (reference:
  * lib/MyMQTTclient.py:312-418 RecordImport): one text line per telegram
  * (`topic JSON`), V2 (`payload_raw`) and V3
  * (`uplink_message.frm_payload`) auto-detected, gateways extracted with
  * best-gateway selection (D5, MyDatacollector.py:1466-1553: score
  * `10·snr + 0.2·rssi`, argmax).
  *
  * Everything is `from_json` + struct navigation — no UDF; the schema is
  * permissive (missing branches null out) so one parse covers both
  * envelope versions, exactly like the reference's single import path.
  */
object TtnEnvelope {

  val gatewaySchema: StructType = StructType(Seq(
    StructField("gtw_id", StringType), StructField("rssi", DoubleType),
    StructField("snr", DoubleType), StructField("latitude", DoubleType),
    StructField("longitude", DoubleType), StructField("altitude", DoubleType)))

  val envelopeSchema: StructType = StructType(Seq(
    // V2
    StructField("app_id", StringType),
    StructField("dev_id", StringType),
    StructField("port", IntegerType),
    StructField("counter", LongType),
    StructField("payload_raw", StringType),
    StructField("metadata", StructType(Seq(
      StructField("time", StringType),
      StructField("gateways", ArrayType(gatewaySchema)),
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType)))),
    // V3
    StructField("end_device_ids", StructType(Seq(
      StructField("device_id", StringType),
      StructField("application_ids", StructType(Seq(
        StructField("application_id", StringType))))))),
    StructField("received_at", StringType),
    StructField("uplink_message", StructType(Seq(
      StructField("f_port", IntegerType),
      StructField("f_cnt", LongType),
      StructField("frm_payload", StringType),
      StructField("rx_metadata", ArrayType(StructType(Seq(
        StructField("gateway_ids", StructType(Seq(
          StructField("gateway_id", StringType)))),
        StructField("rssi", DoubleType),
        StructField("snr", DoubleType))))))))))

  /** Gateway score (MyDatacollector.py:1467-1470 GTWstrength). */
  def gatewayScore(snr: Column, rssi: Column): Column =
    snr * 10.0 + rssi * 0.2

  /** Parse raw `topic JSON` lines into a normalized envelope frame:
    * (app_id, dev_id, port, counter, payload bytes, event ISO time,
    * gateways[], best_gateway, best_score). Works on a batch or
    * streaming text DataFrame alike. */
  def parse(lines: DataFrame, lineCol: Column): DataFrame = {
    val topic = substring_index(lineCol, " ", 1)
    val json = lineCol.substr(length(topic) + 2, length(lineCol))
    val parsed = lines.select(
      topic.as("topic"),
      from_json(json, envelopeSchema).as("e"))
    val v3 = col("e.uplink_message").isNotNull
    val gws = when(v3, transform(col("e.uplink_message.rx_metadata"), g =>
        struct(g.getField("gateway_ids").getField("gateway_id").as("gtw_id"),
          g.getField("rssi").as("rssi"), g.getField("snr").as("snr"))))
      .otherwise(transform(col("e.metadata.gateways"), g =>
        struct(g.getField("gtw_id").as("gtw_id"),
          g.getField("rssi").as("rssi"), g.getField("snr").as("snr"))))
    parsed.select(
      col("topic"),
      coalesce(col("e.end_device_ids.application_ids.application_id"),
        col("e.app_id")).as("app_id"),
      coalesce(col("e.end_device_ids.device_id"), col("e.dev_id")).as("dev_id"),
      coalesce(col("e.uplink_message.f_port"), col("e.port")).as("port"),
      coalesce(col("e.uplink_message.f_cnt"), col("e.counter")).as("counter"),
      unbase64(coalesce(col("e.uplink_message.frm_payload"),
        col("e.payload_raw"))).as("payload"),
      coalesce(col("e.metadata.time"), col("e.received_at")).as("event_time"),
      gws.as("gateways"))
      // D5 best gateway: max (score, id) struct — deterministic argmax.
      .withColumn("best", array_max(transform(col("gateways"), g =>
        struct(gatewayScore(g.getField("snr"), g.getField("rssi")).as("score"),
          g.getField("gtw_id").as("gtw_id")))))
      .withColumn("best_gateway", col("best.gtw_id"))
      .withColumn("best_score", round(col("best.score"), 2))
      .drop("best")
  }
}
