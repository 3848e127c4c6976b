package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S6 — CSV source half. The reference reads spreadsheet sensor columns
  * with pandas (statistics/MyRegression.py:699-757); the Spark-side
  * equivalent is the built-in csv source with an explicit schema. Native
  * .xlsx reads are covered by [[XlsxSource]] / XlsxSourceSpec.
  * This spec pins down the ingest contract: header handling, typed
  * schema (no inference surprises), null handling, and that the loaded
  * dimension broadcast-joins onto a fact frame. */
class CsvSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kit-metadata CSV loads typed and broadcast-joins as a dimension") {
    val dir = Files.createTempDirectory("graft_csv_src").toFile
    val f = new java.io.File(dir, "kits.csv")
    // deleteOnExit runs LIFO and only removes empty dirs — register the
    // file first so the dir delete actually succeeds at JVM exit
    dir.deleteOnExit()
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.write(
      """project,serial,label,lat,lon,active
        |SAN,b4e62df4b311,Vredepeel,51.541,5.854,1
        |HadM,30aea44505c8,Horst,51.453,6.044,0
        |SAN,deadbeef0000,,51.4,5.9,1
        |""".stripMargin)
    w.close()

    val schema = StructType(Seq(
      StructField("project", StringType), StructField("serial", StringType),
      StructField("label", StringType), StructField("lat", DoubleType),
      StructField("lon", DoubleType), StructField("active", IntegerType)))
    val dim = spark.read.option("header", "true").schema(schema)
      .csv(f.getAbsolutePath)

    assert(dim.schema == schema, "explicit schema, no inference drift")
    val rows = dim.collect()
    assert(rows.length == 3)
    assert(rows.count(_.isNullAt(2)) == 1, "empty field reads as null")

    val fact = Seq(("b4e62df4b311", 12.5), ("30aea44505c8", 3.0),
      ("unknown", 9.9)).toDF("serial", "value")
    val joined = fact.join(broadcast(dim.where(col("active") === 1)), Seq("serial"))
    assert(joined.count() == 1 && joined.head.getAs[String]("project") == "SAN")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }
}
