package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ChartsPM chart-document emission (visualisation/ChartsPM.pl:553-615
  * Array2Units, :1659-1669 JS vars): first-reading-anchored regrid,
  * empty/sub-0.1 buckets as JS null, the Perl's int(x*10+0.4)/10
  * rounding, MINHOURS admission, and the render→parse round trip. */
class ChartDocSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // (station, pol, tSeconds, order, value)
  private def blocks(rows: Seq[(Int, String, Long, Long, Double)],
                     minCount: Int = ChartDoc.MinHours + 1) = {
    import spark.implicits._
    ChartDoc.seriesBlocks(
      rows.toDF("st", "pol", "t", "o", "v"),
      col("st"), col("pol"), col("t"), col("o"), col("v"), minCount)
  }

  test("regrid: raw first reading, bucket means, gaps and sub-0.1 as null, Perl rounding") {
    val t0 = 1000000L
    val h = ChartDoc.UnitS
    // 13 readings on (0, pm25): first raw at t0; bucket 1 has 2.3 & 2.4
    // (mean 2.35 → int(23.9)/10 = 2.3); bucket 2 has 2.32 & 2.40 (mean
    // 2.36 → int(24.0)/10 = 2.4); bucket 3 empty; bucket 4 has 0.05
    // (< 0.1 → null); buckets 5..12 one reading each.
    val rows =
      Seq((0, "pm25", t0, 0L, 7.77),
        (0, "pm25", t0 + 10, 1L, 2.3), (0, "pm25", t0 + 20, 2L, 2.4),
        (0, "pm25", t0 + h + 10, 3L, 2.32), (0, "pm25", t0 + h + 20, 4L, 2.40),
        (0, "pm25", t0 + 3 * h + 5, 5L, 0.05)) ++
        (5 to 12).map(k => (0, "pm25", t0 + (k - 1) * h + 30, k.toLong, k * 1.0))
    val got = blocks(rows, minCount = 13).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("start_s") == t0)
    assert(r.getAs[String]("data_js") ==
      "[7.77,2.3,2.4,null,null,5.0,6.0,7.0,8.0,9.0,10.0,11.0,12.0]")
    assert(r.getAs[String]("title") == "pm25 (S0)")
  }

  test("MINHOURS admission drops short series") {
    val rows = (0 until 12).map(i => (1, "pm10", 500L + i, i.toLong, 1.0)) ++
      (0 until 13).map(i => (1, "no2", 500L + i, i.toLong, 1.0))
    val got = blocks(rows).collect()
    assert(got.map(_.getAs[String]("pol")).toSet == Set("no2"))
  }

  test("document → parseSeries round trip recovers every grid slot") {
    val t0 = 2000000L
    val h = ChartDoc.UnitS
    val rows = (0 until 20).flatMap { i =>
      Seq((0, "pm25", t0 + i * h, i.toLong, 1.0 + i),
        (0, "rv", t0 + i * h, i.toLong, 50.0 + i),
        (3, "pm25", t0 + 7200 + i * h, i.toLong, 0.05)) // all sub-0.1 → null
    }
    val f = java.nio.file.Files.createTempDirectory("chartdoc").resolve("c.html")
    java.nio.file.Files.writeString(f, ChartDoc.document(blocks(rows)))
    val back = ChartDoc.parseSeries(spark, f.toString).collect()
      .map(r => ((r.getInt(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .toMap
    // 3 series × 21 slots: bucket 0 = raw first reading, bucket 1 =
    // [t0, t0+h) (empty — only the first reading fell there), and the
    // reading at t0+i·h lands in bucket i+1, so k ∈ 0..20.
    assert(back.size == 63)
    assert(back((0, "pm25", 0L)) == ((t0, Some(1.0))))
    assert(back((0, "pm25", 1L))._2.isEmpty)
    assert(back((0, "pm25", 5L)) == ((t0 + 5 * h, Some(5.0))))
    assert(back((0, "rv", 20L)) == ((t0 + 20 * h, Some(69.0))))
    // bucket 0 is the RAW first value even when sub-0.1; later buckets null
    assert(back((3, "pm25", 0L))._2 == Some(0.05))
    assert((1L to 20L).forall(k => back((3, "pm25", k))._2.isEmpty))
  }
}
