package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end ingest integration over the reference's largest replay
  * corpus (132 telegrams): envelope parse (D1) → payload decode (D2) →
  * long-row flatten (D3) — the batch shape of SURVEY §3.1, identical
  * code to the streaming path (the file source swaps in). */
class IngestPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val stress = "/root/reference/MyDatacollector/inputtests/stressTestData.mqtt"

  test("stress corpus: parse → decode → flatten yields long measurement rows") {
    assume(Files.exists(Paths.get(stress)))
    import spark.implicits._

    val env = TtnEnvelope.parse(spark.read.text(stress), col("value"))
    val n = env.count()
    assert(n >= 100, s"expected >=100 telegrams, got $n")
    // Every record resolves ids and a payload.
    assert(env.where(col("dev_id").isNull || col("payload").isNull).count() == 0)

    // D2+D3: decode measurement ports (2/4) with the flat decoder and
    // explode the field map into long rows.
    val decodeUdf = udf((payload: Array[Byte], port: Int) =>
      if (port == 2 || port == 4)
        scala.util.Try(LoRaDecode.decodeFlat(payload, port))
          .getOrElse(Map.empty[String, Double])
      else Map.empty[String, Double])
    val long = env
      .withColumn("fields", decodeUdf(col("payload"), col("port")))
      .select(col("app_id"), col("dev_id"), col("event_time"),
        col("best_gateway"), explode(col("fields")).as(Seq("field", "value")))
    val rows = long.count()
    assert(rows > n, s"long rows ($rows) should exceed telegrams ($n)")
    // Known fields dominate; nothing decodes to NaN.
    val fields = long.groupBy("field").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fields.keySet.intersect(
      Set("pm25", "pm10", "temperature", "humidity", "pressure")).nonEmpty)
    assert(long.where(col("value").isNaN).count() == 0)
    // Gateway selection produced a best gateway wherever gateways exist.
    assert(env.where(size(col("gateways")) > 0 && col("best_gateway").isNull)
      .count() == 0)
  }
}
