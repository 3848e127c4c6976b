package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Community

/** SURVEY §3.1 end-to-end: the reference's primary lifecycle — telegram
  * stream → archive upsert + gated Sensors.Community forwarding under
  * the per-channel error budget — wired from the round's real pieces
  * (ArchiveSink, Forwarding.channelGate/ChannelBudget/forwardBatch,
  * Community.rows) over a MemoryStream with multiple micro-batches.
  */
object PipelineIntegrationSpec {
  case class Reading(project: String, serial: String, stype: String,
                     field: String, value: Double, ts: Long)
}

class PipelineIntegrationSpec extends AnyFunSuite {
  import PipelineIntegrationSpec.Reading
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream → archive + gated community forwarding with error budget") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_pipe_int_").toString + "/arch"

    // channels: one healthy, one permanently down; only SAN kits forward
    var now = 0L
    val sent = collection.mutable.Buffer[String]()
    val healthy = new Forwarding.ChannelBudget("community", () => now)
    val dead = new Forwarding.ChannelBudget("influx", () => now)
    val gate = Some("SAN_.*")

    def handleBatch(batch: org.apache.spark.sql.Dataset[Reading], id: Long): Unit = {
      val b = batch.toDF().persist()
      try {
        ArchiveSink.upsert(b.toDF(), dir,
          keys = Seq("project", "serial", "field", "ts"), version = "ts",
          numBuckets = 8)
        val gated = b.where(Forwarding.channelGate(
          col("project"), col("serial"), gate))
        val api = Community.rows(spark, gated,
          concat_ws("_", col("project"), col("serial")),
          col("stype"), col("field"), col("value"))
          .collect().map(r => s"${r.getString(0)}:${r.getInt(1)}:" +
            s"${r.getString(2)}=${r.getDouble(3)}")
        Forwarding.forwardBatch(api.toSeq, Seq(
          (healthy, (r: String) => { sent += r; () }),
          (dead, (_: String) => throw new RuntimeException("down"))))
        ()
      } finally { b.unpersist(); () }
    }

    val mem = MemoryStream[Reading]
    val q = mem.toDS().writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_pipe_ckpt_").toString)
      .foreachBatch(handleBatch _)
      .start()

    // batch 1: one SAN kit (forwards), one HadM kit (gated out)
    mem.addData(
      Reading("SAN", "b4e62d", "PMS7003", "pm25", 18.35, 100L),
      Reading("SAN", "b4e62d", "BME280", "temp", 21.0, 100L),
      Reading("HadM", "30aea4", "PMS7003", "pm25", 9.0, 100L))
    q.processAllAvailable()
    // batch 2: replay of one telegram (archive collapses) + a new one
    mem.addData(
      Reading("SAN", "b4e62d", "PMS7003", "pm25", 18.35, 100L),
      Reading("SAN", "b4e62d", "PMS7003", "pm10", 40.0, 200L))
    q.processAllAvailable()
    q.stop()

    // archive: REPLACE INTO semantics across micro-batches — the replayed
    // telegram collapsed; 4 distinct (project, serial, field, ts) keys
    val archived = ArchiveSink.read(spark, dir)
    assert(archived.count() == 4)
    assert(archived.where(col("project") === "HadM").count() == 1)

    // forwarding: only SAN rows, translated+calibrated, on the healthy
    // channel; pm25 18.35 → P2 11.1 via the PMS Taylor
    assert(sent.forall(_.startsWith("SAN_")), s"gated rows leaked: $sent")
    assert(sent.exists(_.contains(":1:P2=11.1")), s"calibrated P2 missing in $sent")
    assert(sent.exists(_.contains(":11:temperature=21.0")))
    assert(!sent.exists(_.contains("pm25")), "untranslated field name leaked")

    // the dead channel burned its budget and sent nothing
    assert(dead.errorCount > 0 && sent.nonEmpty)
    assert(healthy.errorCount == 0)

    // K8 leg: RRD consolidation over the archive the stream just built
    // (the reference pipes the same records into rrdtool, Get_data.pl
    // Add_RRA) — all four keys land in one hourly PDP, one CDP row per CF
    val rrd = graft.operators.RrdArchive.consolidate(
        archived, timestamp_seconds(col("ts")), col("value"),
        rras = Seq(graft.operators.RrdArchive.Rra(24, 1, 3600)))
      .collect()
    assert(rrd.length == 3) // AVERAGE, MIN, MAX of the single CDP row
    val byCf = rrd.map(r => r.getAs[String]("cf") -> r.getAs[Double]("value")).toMap
    // all three CFs consolidate the ONE hourly PDP (= mean of the 4 rows)
    val pdp = (18.35 + 21.0 + 9.0 + 40.0) / 4
    assert(byCf("AVERAGE") == pdp && byCf("MIN") == pdp && byCf("MAX") == pdp)
    assert(rrd.forall(_.getAs[Long]("n_pdp") == 1L))
  }
}
