package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RrdArchiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("referenceRras reproduces Get_data.pl's pdp_per_row grid") {
    // int((span_hours + 785)/785) at W=785 (Get_data.pl:535-540)
    val grid = RrdArchive.referenceRras().map(r => r.spanHours -> r.pdpPerRow)
    assert(grid == Seq(24 -> 1, 168 -> 1, 720 -> 1,
      8760 -> 12, 26280 -> 34, 52560 -> 67))
  }

  test("consolidation: AVERAGE/MIN/MAX per row, xff gates sparse rows") {
    import spark.implicits._
    // 4 hourly points in one 2-PDP row + 1 point alone in the next row
    // (pdp_per_row = 2 → a row with 1 known PDP of 2 passes xff = 0.5;
    // craft a 4-PDP archive where 1 of 4 fails).
    val rows = Seq(
      ("2024-01-01 00:10:00", 10.0), ("2024-01-01 01:10:00", 20.0),
      ("2024-01-01 02:10:00", 30.0), ("2024-01-01 03:10:00", 40.0),
      // next 4-hour row: only hour 4 present → 1 of 4 known → NULL
      ("2024-01-01 04:10:00", 99.0))
    val df = rows.toDF("t", "v")
      .select($"t".cast("timestamp").as("ts"), $"v")
    val out = RrdArchive.consolidate(df, $"ts", $"v",
        rras = Seq(RrdArchive.Rra(16, 4, 4 * 3600)))
      .orderBy("row_ts", "cf").collect()
    // two rows × three CFs
    assert(out.length == 6)
    val full = out.filter(_.getAs[Long]("row_ts") == 1704067200L)
    assert(full.map(r => r.getAs[String]("cf") -> r.getAs[Double]("value"))
      .toSet == Set("AVERAGE" -> 25.0, "MIN" -> 10.0, "MAX" -> 40.0))
    val sparse = out.filter(_.getAs[Long]("row_ts") != 1704067200L)
    assert(sparse.forall(_.isNullAt(sparse.head.fieldIndex("value"))))
    assert(sparse.forall(_.getAs[Long]("n_pdp") == 1L))
  }

  test("retention keeps exactly the last W rows per archive") {
    import spark.implicits._
    // 10 hourly points, W = 3, pdp_per_row = 1 → rows at hours 7, 8, 9
    val df = (0 until 10).map(h => (f"2024-01-01 $h%02d:10:00", h.toDouble))
      .toDF("t", "v")
      .select($"t".cast("timestamp").as("ts"), $"v")
    val out = RrdArchive.consolidate(df, $"ts", $"v", width = 3,
        rras = Seq(RrdArchive.Rra(24, 1, 3600)))
      .where($"cf" === "AVERAGE").orderBy("row_ts").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(7.0, 8.0, 9.0))
  }

  test("the six archive branches reuse one PDP exchange in the plan") {
    val df = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val out = RrdArchive.consolidate(df, col("ts"), col("value"))
    out.collect() // AQE finalizes exchange reuse only at execution
    val plan = out.queryExecution.executedPlan.toString
    // ReuseExchange collapses the identical hourly-aggregate subtrees:
    // the fact scan appears once, references appear as ReusedExchange.
    assert(plan.contains("ReusedExchange"), plan.take(2000))
  }
}
