package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** K5 / K2 / S4 live wire legs over REAL HTTP round trips (r13 — the
  * S1/K6 closure pattern): an in-process `com.sun.net.httpserver`
  * endpoint receives what the production client functions send, and the
  * received requests must equal the oracle-checked formatter columns
  * (q83 line protocol, q63 pin rows) / the pulled frame must equal the
  * series the server stated (S4). */
class HttpWireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("K5 live influx write: one POST per telegram, 204 contract, " +
      "bodies equal the q83 line column across a micro-batch boundary") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") < 60)
    val project = lit("SAN")
    val serial = concat(lit("d"), col("user_id"))
    val gated = e.where(Forwarding.channelGate(project, serial,
      Some("SAN_d[0-9]*[02468]$")))
    val line = Forwarding.influxLine(gated, lit("data"),
      Seq("project" -> project, "serial" -> serial,
        "type" -> col("event_type")),
      Seq("temp" -> col("value"), "cnt" -> (col("event_id") % 997),
        "note" -> col("props")),
      Some(unix_timestamp(col("ts"))))
    val pairs = gated.select((col("event_id") % 2).cast("int").as("half"),
      line.as("line")).where(col("line").isNotNull)
    val expected = pairs.select("line").collect().map(_.getString(0)).toSeq
    assert(expected.nonEmpty)

    // two parquet files → file stream → foreachBatch(influxWriteBatch)
    val root = java.nio.file.Files.createTempDirectory("k5live")
    val inDir = java.nio.file.Files.createDirectories(root.resolve("in"))
    Seq(0, 1).foreach { h =>
      val stage = root.resolve(s"s$h").toString
      pairs.where(col("half") === h).select("line")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val ls = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
      val part = try ls.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      finally ls.close()
      val dest = inDir.resolve(s"b$h.parquet")
      java.nio.file.Files.move(part, dest)
      dest.toFile.setLastModified(1700000000000L + h * 60000L)
    }
    val server = new HttpWire.CollectingServer() // default 204 = influx OK
    try {
      val q = spark.readStream.schema("line string")
        .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
        .writeStream.option("checkpointLocation", root.resolve("ck").toString)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          HttpWire.influxWriteBatch(b, server.url, "air quality"))
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()

      val got = server.take(expected.size, 30000)
      assert(got.size == expected.size,
        s"server received ${got.size} of ${expected.size} telegrams")
      got.foreach { r =>
        assert(r.method == "POST" && r.path == "/write")
        assert(r.query == "db=air%20quality&precision=s", r.query)
      }
      assert(got.map(_.body).groupBy(identity).view.mapValues(_.size).toMap ===
        expected.groupBy(identity).view.mapValues(_.size).toMap,
        "received line-protocol multiset differs from the q83 column")
    } finally server.close()
  }

  test("K2 live community POST: one request per (kit, pin), reference " +
      "headers and JSON template, values equal the q63 rows") {
    import graft.SparkEntry
    val rows = SparkEntry.queries("q63_community_pins")(
        spark, "/root/testdata/sf0.001")
      .where(col("event_id") < 200)
      .select(col("kit"), col("pin"), col("value_type"), col("value"))
    val expected = rows.collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getString(2), r.get(3).toString)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(expected.nonEmpty)

    val server = new HttpWire.CollectingServer(defaultStatus = 201)
    try {
      HttpWire.communityPostBatch(rows, server.url, "/v1/push-sensor-data/",
        idPrefix = "esp8266-", softwareVersion = "MySense1.0",
        timestamp = "2026-08-15T00:00:00")
      val got = server.take(expected.size, 30000)
      assert(got.size == expected.size,
        s"expected ${expected.size} (kit, pin) POSTs, got ${got.size}")
      val gotByKey = got.map { r =>
        assert(r.method == "POST" && r.path == "/v1/push-sensor-data/")
        assert(r.headers("content-type") == "application/json")
        val sensor = r.headers("x-sensor")
        assert(sensor.startsWith("esp8266-"))
        val vals = """\{"value_type":"([^"]+)","value":"([^"]+)"\}""".r
          .findAllMatchIn(r.body).map(m => (m.group(1), m.group(2))).toSeq
        assert(r.body.contains(""""software_version":"MySense1.0""""))
        ((sensor.stripPrefix("esp8266-"), r.headers("x-pin").toInt),
          vals.sorted)
      }.toMap
      assert(gotByKey === expected,
        "received (kit, pin) → sensordatavalues differ from the q63 rows")
    } finally server.close()
  }

  test("S4 live influx pull: GET /query round trip parses the 1.x series " +
      "JSON and composes with the q02 bucketing semantics") {
    import spark.implicits._
    val src = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") < 500)
      .select(unix_timestamp(col("ts")).as("time"), col("value"))
      .orderBy("time").limit(200)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val valuesJson = src.map { case (t, v) => s"[$t,$v]" }.mkString(",")
    val seriesJson =
      s"""{"results":[{"statement_id":0,"series":[{"name":"data",""" +
        s""""columns":["time","value"],"values":[$valuesJson]}]}]}"""
    val server = new HttpWire.CollectingServer(
      responses = Map("/query" -> (200, seriesJson)))
    try {
      val pulled = HttpWire.influxQuery(spark, server.url, "air",
        "SELECT value FROM data")
      // the GET carried the reference's query-string contract
      val req = server.take(1, 10000).head
      assert(req.method == "GET" &&
        req.query == "db=air&q=SELECT%20value%20FROM%20data&epoch=s")
      // round trip: pulled == served (values come back as strings)
      val got = pulled.select(col("time").cast("long"),
          col("value").cast("double"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(got === src.sorted.toSeq)
      // compose: hourly bucketing over the pulled frame equals the same
      // aggregate computed directly (the q02/S4 semantics)
      val viaPull = pulled
        .select((col("time").cast("long") / 3600).cast("long").as("h"),
          col("value").cast("double").as("v"))
        .groupBy("h").agg(count(lit(1)).as("n"), avg("v").as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      val direct = src.toSeq.toDF("time", "v")
        .select((col("time") / 3600).cast("long").as("h"), col("v"))
        .groupBy("h").agg(count(lit(1)).as("n"), avg("v").as("m"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      // keys/counts exact; means ULP-tolerant (partitioning differs
      // between the pulled and local frames, so double-sum ORDER differs
      // — the q06/q44 class, expected for a float mean)
      assert(viaPull.map(t => (t._1, t._2)) === direct.map(t => (t._1, t._2)))
      viaPull.zip(direct).foreach { case ((h, _, a), (_, _, b)) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"hour $h mean $a vs $b")
      }
    } finally server.close()
  }
}
