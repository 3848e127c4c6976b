package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HourlyExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val h0 = 1700000 * 1000L / 1000 / 3600 * 3600 // hour-aligned epoch

  test("hourly frame: buckets, gap rows, and per-key spine") {
    val df = Seq(
      ("kitA", h0 + 60, 10.0), ("kitA", h0 + 120, 20.0), // hour 0: avg 15
      ("kitA", h0 + 2 * 3600 + 5, 30.0),                 // hour 2 (hour 1 silent)
      ("kitB", h0 + 10, 7.0))
      .toDF("kit", "epoch_s", "v")
      .withColumn("ts", col("epoch_s").cast("timestamp"))
    val frame = HourlyExport.hourlyFrame(df, col("kit"), col("ts"), col("v"),
      h0, h0 + 2 * 3600 + 100)
    val rows = frame.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), Option(r.get(3))))
      .toMap
    // 3 hours × 2 kits
    assert(rows.size == 6)
    assert(rows(("kitA", h0))._1.contains(15.0))
    assert(rows(("kitA", h0 + 3600))._1.isEmpty) // gap row, null avg
    assert(rows(("kitA", h0 + 7200))._1.contains(30.0))
    assert(rows(("kitB", h0))._1.contains(7.0))
    assert(rows(("kitB", h0 + 3600))._1.isEmpty)
  }

  test("csv write: one partition directory per kit, readable back") {
    val df = Seq(("kitA", h0 + 60, 10.0), ("kitB", h0 + 10, 7.0))
      .toDF("kit", "epoch_s", "v")
      .withColumn("ts", col("epoch_s").cast("timestamp"))
    val frame = HourlyExport.hourlyFrame(df, col("kit"), col("ts"), col("v"),
      h0, h0 + 3600)
    val out = Files.createTempDirectory("graft_export_").toString + "/csv"
    HourlyExport.writeCsv(frame, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("k=kitA", "k=kitB"))
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 4)
  }
}
