package graft.streaming

import java.io.ByteArrayOutputStream
import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.LinkedBlockingQueue

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** In-sandbox HTTP wire legs for the three HTTP-shaped reference
  * channels (r13 — the S1/K6 closure pattern applied to the rest of the
  * "missing" list):
  *
  *   - K5 InfluxDB publish (`RPi/MyINFLUXPUB.py:119-160`): one line-
  *     protocol telegram per record, POST `/write?db=<db>&precision=s`,
  *     success = HTTP 204 (the influxdb client's `request(..., 204)`).
  *   - K2 Sensors.Community publish (`MyDatacollector/lib/MyCOMMUNITY.py
  *     :140-200`): one POST per (kit, pin) with headers `X-Sensor:
  *     <prefix><id>` / `X-Pin: <pin>` and a JSON body
  *     `{software_version, timestamp, sensordatavalues:[{value_type,
  *     value}, …]}`.
  *   - S4 InfluxDB pull (`statistics/MyRegression.py:139-324`): GET
  *     `/query?db=<db>&q=<select>&epoch=s`, response = the InfluxDB 1.x
  *     `{"results":[{"series":[{name, columns, values}]}]}` JSON.
  *
  * The sandbox is zero-egress, so — like the MQTT leg — the wire is
  * proven against an in-process [[HttpWire.CollectingServer]] (JDK
  * `com.sun.net.httpserver`, zero deps) speaking real HTTP over TCP;
  * a production deployment points the same client functions at the real
  * endpoints. Clients are per-partition (the per-executor-client shape);
  * POST failure raises, which in a foreachBatch sink surfaces as a task
  * failure → retry, matching the reference's raise-IOError-on-failure
  * contract.
  */
object HttpWire {

  /** One received request, as the assertion end of a wire spec sees it. */
  final case class Received(method: String, path: String, query: String,
                            headers: Map[String, String], body: String)

  /** Minimal in-process HTTP server: records every request and answers
    * with a per-path-prefix (status, body) — default 204 empty (the
    * InfluxDB write contract). Dev/test-grade on purpose; daemon
    * executor threads, idempotent close. */
  final class CollectingServer(responses: Map[String, (Int, String)] = Map(),
                               defaultStatus: Int = 204) {
    private val server = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 16)
    private val queue = new LinkedBlockingQueue[Received]()
    val port: Int = server.getAddress.getPort
    val url: String =
      s"http://${server.getAddress.getAddress.getHostAddress}:$port"

    server.createContext("/", { exchange =>
      val body = new String(exchange.getRequestBody.readAllBytes(), UTF_8)
      val hdrs = {
        val b = Map.newBuilder[String, String]
        exchange.getRequestHeaders.forEach { (k, vs) =>
          if (!vs.isEmpty) b += (k.toLowerCase -> vs.get(0))
        }
        b.result()
      }
      queue.put(Received(exchange.getRequestMethod,
        exchange.getRequestURI.getPath,
        Option(exchange.getRequestURI.getRawQuery).getOrElse(""),
        hdrs, body))
      val (status, respBody) = responses
        .collectFirst { case (p, r) if exchange.getRequestURI.getPath.startsWith(p) => r }
        .getOrElse((defaultStatus, ""))
      val bytes = respBody.getBytes(UTF_8)
      if (bytes.isEmpty) exchange.sendResponseHeaders(status, -1)
      else {
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        exchange.sendResponseHeaders(status, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
      }
      exchange.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      r => { val t = new Thread(r, "graft-http"); t.setDaemon(true); t }))
    server.start()

    /** Blocks until `n` requests arrived or `timeoutMs` elapsed. */
    def take(n: Int, timeoutMs: Long): Seq[Received] = {
      val out = scala.collection.mutable.ArrayBuffer[Received]()
      val deadline = System.currentTimeMillis() + timeoutMs
      while (out.size < n && System.currentTimeMillis() < deadline) {
        val m = queue.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (m != null) out += m
      }
      out.toSeq
    }

    def close(): Unit = server.stop(0)
  }

  /** One plain HTTP POST (java.net.HttpURLConnection — java.base, no
    * deps); returns the status code. Used per row inside partitions. */
  private def post(url: String, headers: Seq[(String, String)],
                   body: Array[Byte]): Int = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.getOutputStream.write(body)
      conn.getOutputStream.close()
      val code = conn.getResponseCode
      // drain so keep-alive sockets can be reused
      val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
      if (in != null) { in.readAllBytes(); in.close() }
      code
    } finally conn.disconnect()
  }

  /** K5 live leg: publish one micro-batch of line-protocol telegrams —
    * `batch` must carry a `line` string column ([[Forwarding.influxLine]];
    * null lines are the formatter's "no values" drops and are skipped,
    * the reference's `if not len(data_values): return True`). One POST
    * per telegram to `/write?db=<db>&precision=s`, success = 204
    * (`RPi/MyINFLUXPUB.py:156`). Wire from a sink as
    * `.foreachBatch((b, _) => HttpWire.influxWriteBatch(b, url, db))`. */
  def influxWriteBatch(batch: DataFrame, baseUrl: String, db: String): Unit = {
    val target = s"$baseUrl/write?db=${enc(db)}&precision=s"
    batch.select(col("line")).where(col("line").isNotNull)
      .foreachPartition { (rows: Iterator[Row]) =>
        rows.foreach { r =>
          val code = post(target, Seq("Content-Type" -> "text/plain"),
            r.getString(0).getBytes(UTF_8))
          require(code == 204,
            s"influx write expected 204, got $code") // reference raises
        }
      }
  }

  /** K2 live leg: publish one micro-batch of Sensors.Community rows —
    * `batch` is the q63 shape (kit, pin, value_type, value). Rows are
    * grouped to one POST per (kit, pin) with the reference's headers and
    * JSON template (`MyCOMMUNITY.py:149-183`; value order inside
    * `sensordatavalues` = the deterministic (value_type, value) sort so
    * the POST set is reproducible). */
  def communityPostBatch(batch: DataFrame, baseUrl: String, path: String,
                         idPrefix: String, softwareVersion: String,
                         timestamp: String): Unit = {
    val grouped = batch.groupBy(col("kit"), col("pin"))
      .agg(sort_array(collect_list(struct(
        col("value_type").cast("string").as("value_type"),
        col("value").cast("string").as("value")))).as("vals"))
    val target = s"$baseUrl$path"
    grouped.foreachPartition { (rows: Iterator[Row]) =>
      rows.foreach { r =>
        val vals = r.getSeq[Row](2).map { v =>
          s"""{"value_type":"${v.getString(0)}","value":"${v.getString(1)}"}"""
        }
        if (vals.nonEmpty) { // reference: `if not len(...): continue`
          val body =
            s"""{"software_version":"$softwareVersion","timestamp":"$timestamp",""" +
              s""""sensordatavalues":[${vals.mkString(",")}]}"""
          val code = post(target, Seq(
            "Content-Type" -> "application/json",
            "X-Sensor" -> s"$idPrefix${r.getString(0)}",
            "X-Pin" -> r.getInt(1).toString),
            body.getBytes(UTF_8))
          require(code / 100 == 2, s"community POST expected 2xx, got $code")
        }
      }
    }
  }

  /** S4 live leg: InfluxDB 1.x `/query` pull → DataFrame of the first
    * series, one string column per series column (callers cast — the
    * reference's regression job reads (time, field columns) and casts
    * to float itself). The GET runs on the driver: this is the
    * reference's PULL shape (a stats job fetching one bounded query
    * result, `MyRegression.py:279-295`), not a corpus scan — the
    * result is then a regular distributed frame. */
  def influxQuery(spark: SparkSession, baseUrl: String, db: String,
                  q: String): DataFrame = {
    import spark.implicits._
    val conn = URI.create(
        s"$baseUrl/query?db=${enc(db)}&q=${enc(q)}&epoch=s")
      .toURL.openConnection().asInstanceOf[HttpURLConnection]
    val body = try {
      conn.setConnectTimeout(10000); conn.setReadTimeout(60000)
      require(conn.getResponseCode == 200,
        s"influx query expected 200, got ${conn.getResponseCode}")
      new String(conn.getInputStream.readAllBytes(), UTF_8)
    } finally conn.disconnect()
    // parse with Spark's own JSON reader against the response schema —
    // `values` cells are heterogeneous (numbers and strings), read as
    // strings (Spark stringifies scalars under an explicit StringType)
    val parsed = spark.read.schema(
        "results array<struct<series: array<struct<" +
          "name string, columns array<string>, " +
          "values array<array<string>>>>>>")
      .json(Seq(body).toDS)
    val series = parsed.select(explode(col("results")).as("r"))
      .select(explode(col("r.series")).as("s"))
      .select(col("s.columns").as("columns"),
        explode(col("s.values")).as("row"))
    val cols = series.select(col("columns")).limit(1).collect()
      .headOption.map(_.getSeq[String](0)).getOrElse(Seq.empty)
    cols.zipWithIndex.foldLeft(series.select(col("row"))) {
      case (df, (name, i)) => df.withColumn(name, col("row")(i))
    }.drop("row")
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, UTF_8).replace("+", "%20")
}
