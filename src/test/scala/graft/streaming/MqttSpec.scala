package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ingest.TtnEnvelope

/** S1 live-subscribe leg over a REAL MQTT 3.1.1 round trip (VERDICT r11
  * item 5): in-process broker ← publisher (fixture telegrams) and
  * broker ← subscriber bridge → socket transport → the identical parse
  * pipeline. The ingested result must equal the batch parse of the same
  * telegram lines — the "archive equals file-replay" parity contract,
  * executed through an actual CONNECT/SUBSCRIBE/PUBLISH exchange
  * instead of a stub. */
class MqttSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("MQTT codec: varint remaining length and +/# topic filters") {
    import Mqtt.Codec._
    // remaining-length round trip across the varint group boundaries
    for (n <- Seq(0, 1, 127, 128, 16383, 16384, 100000)) {
      val bos = new java.io.ByteArrayOutputStream()
      writePacket(new java.io.DataOutputStream(bos), PUBLISH, 0, new Array[Byte](n))
      val p = readPacket(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray)))
      assert(p.ptype == PUBLISH && p.body.length == n)
    }
    assert(topicMatches("v3/+/devices/+/up", "v3/app1/devices/kit7/up"))
    assert(!topicMatches("v3/+/devices/+/up", "v3/app1/devices/kit7/down"))
    assert(!topicMatches("v3/+/devices/+/up", "v3/app1/devices/kit7/up/x"))
    assert(topicMatches("v3/#", "v3/app1/devices/kit7/up"))
    assert(topicMatches("#", "anything/at/all"))
    assert(!topicMatches("v3/+", "v3/a/b"))
    assert(topicMatches("exact/topic", "exact/topic"))
  }

  test("live MQTT subscribe feeds the parse pipeline; result == batch parse") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val fixture = graft.SparkEntry.ttnFixtureLines(events)
      .limit(40).collect().map(_.getString(0)).toSeq
    // the fixture line is `devices/<id> <json>`; publish the json AS the
    // MQTT payload on that topic — the bridge reassembles `topic payload`
    val telegrams = fixture.map { l =>
      val cut = l.indexOf(' ')
      (l.substring(0, cut), l.substring(cut + 1))
    }

    val broker = new Mqtt.MqttBroker()
    val cfg = Transport.Mqtt(broker.host, broker.port, "devices/#")
    try {
      val stream = Transport.lines(spark, cfg) // returns SUBSCRIBED
      val q = TtnEnvelope.parseBest(stream, col("value"))
        .select("topic", "app_id", "dev_id", "port", "counter",
          "n_gateways", "best_gateway", "best_score")
        .writeStream.format("memory").queryName("mqtt_env")
        .outputMode("append").start()
      try {
        val pub = new Mqtt.MqttPublisher(broker.host, broker.port)
        telegrams.foreach { case (topic, json) => pub.publish(topic, json) }
        pub.close()
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table("mqtt_env").count() < telegrams.size &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)

        import spark.implicits._
        val batch = TtnEnvelope.parseBest(
            spark.createDataset(fixture).toDF("line"), col("line"))
          .select("topic", "app_id", "dev_id", "port", "counter",
            "n_gateways", "best_gateway", "best_score")
        val streamed = spark.table("mqtt_env")
        assert(streamed.count() == telegrams.size,
          s"expected ${telegrams.size} telegrams, got ${streamed.count()}")
        // full-row parity with the batch (file-replay) result
        assert(streamed.exceptAll(batch).isEmpty &&
          batch.exceptAll(streamed).isEmpty,
          "MQTT-ingested frame differs from the batch parse")
      } finally q.stop()
    } finally {
      Transport.closeMqtt(cfg)
      broker.close()
    }
  }
}
