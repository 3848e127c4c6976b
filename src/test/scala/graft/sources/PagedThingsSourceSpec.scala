package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PagedThingsSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def load(streams: String, pages: Int, pageSize: Int) =
    spark.read.format("graft.sources.PagedThingsSource")
      .option("datastreams", streams)
      .option("pages", pages.toString)
      .option("pageSize", pageSize.toString)
      .load()

  test("reads all pages of all datastreams with one partition per page") {
    val df = load("101,102", 4, 50)
    assert(df.count() == 2 * 4 * 50)
    // partition-per-page: the parallel-fetch unit is visible to Spark
    val parts = df.select(spark_partition_id()).distinct().count()
    assert(parts == 8, s"expected 8 input partitions, got $parts")
    // every (datastream, page) cell is complete
    val cells = df.groupBy("datastream_id", "page").count()
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cells.size == 8 && cells.values.forall(_ == 50L))
  }

  test("rows are deterministic and analytics compose on top") {
    val a = load("7", 2, 25).select(sum("result")).head.getDouble(0)
    val b = load("7", 2, 25).select(sum("result")).head.getDouble(0)
    assert(a == b)
    // timestamps advance monotonically within a datastream
    val ts = load("7", 2, 25).orderBy("phenomenon_time")
      .select("phenomenon_time").collect().map(_.getLong(0))
    assert(ts.sliding(2).forall { case Array(x, y) => x < y; case _ => true })
    // and the source joins like any other table
    val hourly = load("7,8", 2, 60)
      .groupBy(col("datastream_id"),
        floor(col("phenomenon_time") / 3600).as("h"))
      .agg(avg("result"))
    assert(hourly.count() > 0)
  }
}
