package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark

class SensorBufferSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bufAvgOf mirrors MyThreading.filterOutliers on a numpy example") {
    // buffer [10, 12, 11, 100, 13]: sorted [10,11,12,13,100];
    // np.percentile: q1 = 11.0, q3 = 13.0, IQR = 2 →
    // keep [8, 14] (Q1-based upper bound!) → drop 100 → mean 11.5
    val out = SensorBuffer.bufAvgOf(Seq(
      (100L, 10.0), (200L, 12.0), (300L, 11.0), (400L, 100.0), (500L, 13.0)))
    assert(out.n_buf == 5 && out.n_kept == 4)
    assert(out.buf_avg.contains(11.5))
    assert(out.mid_ts == 300.0) // (100 + 500)/2
    // singleton buffer: avg is the value itself
    val one = SensorBuffer.bufAvgOf(Seq((7L, 42.123456)))
    assert(one.buf_avg.contains(42.123)) // 3-decimal rounding (:133)
  }

  test("batch slidingAverage: per-row frame, outlier dropped mid-series") {
    import spark.implicits._
    val df = Seq(
      ("k", 1L, 10.0), ("k", 2L, 12.0), ("k", 3L, 11.0),
      ("k", 4L, 100.0), ("k", 5L, 13.0), ("k", 6L, 12.0))
      .toDF("kit", "t", "v")
    val out = SensorBuffer.slidingAverage(df, Seq($"kit"), Seq($"t"),
        $"t", $"v", bufSize = 5)
      .orderBy("t").collect()
    assert(out.map(_.getAs[Int]("n_buf")).toSeq == Seq(1, 2, 3, 4, 5, 5))
    // row 5's buffer is the spec example above
    val r5 = out(4)
    assert(r5.getAs[Int]("n_kept") == 4 && r5.getAs[Double]("buf_avg") == 11.5)
    // row 4: buffer [10,12,11,100] — q1 = 10.75, q3 = 34.0 (interp into
    // 100), IQR 23.25 → hi = 45.625 → 100 dropped → mean 11.0
    assert(out(3).getAs[Double]("buf_avg") == 11.0)
  }

  test("bufAvgOf properties: bounded mean, kept ≤ buffered, mid-ts in range") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genBuf = for {
      n <- Gen.chooseNum(1, 12)
      vs <- Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0))
    } yield vs.zipWithIndex.map { case (v, i) => (100L * (i + 1), v) }
    val p = Prop.forAll(genBuf) { buf =>
      val r = SensorBuffer.bufAvgOf(buf)
      val vals = buf.map(_._2)
      r.n_buf == buf.length &&
        r.n_kept >= 1 && r.n_kept <= r.n_buf && // Q1±1.5·IQR always keeps Q1
        r.buf_avg.forall(a => a >= vals.min - 0.001 && a <= vals.max + 0.001) &&
        r.mid_ts >= buf.head._1 && r.mid_ts <= buf.last._1
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("streaming buffer state equals the batch operator across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val readings = Seq(
      SensorBuffer.Reading("A", "pm25", 100L, 10.0),
      SensorBuffer.Reading("A", "pm25", 200L, 12.0),
      SensorBuffer.Reading("A", "pm25", 300L, 11.0),
      SensorBuffer.Reading("A", "pm25", 400L, 100.0),
      SensorBuffer.Reading("A", "pm25", 500L, 13.0),
      SensorBuffer.Reading("B", "pm25", 100L, 5.0),
      SensorBuffer.Reading("B", "pm25", 200L, 6.0))
    val mem = MemoryStream[SensorBuffer.Reading]
    val q = SensorBuffer.slidingAverageStream(mem.toDS(), bufSize = 5)
      .writeStream.format("memory").queryName("buf_out")
      .outputMode("append").start()
    mem.addData(readings.take(3): _*) // state must carry across batches
    q.processAllAvailable()
    mem.addData(readings.drop(3): _*)
    q.processAllAvailable()
    val streamed = spark.table("buf_out").as[SensorBuffer.BufAvg]
      .collect().sortBy(r => (r.kit, r.ts))
    q.stop()

    val batch = SensorBuffer.slidingAverage(
        readings.toDF(), Seq($"kit", $"sensor"), Seq($"ts"), $"ts", $"value", 5)
      .orderBy("kit", "ts").collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.kit == b.getAs[String]("kit") && s.ts == b.getAs[Long]("ts"))
      assert(s.mid_ts == b.getAs[Double]("mid_ts"))
      assert(s.n_buf == b.getAs[Int]("n_buf"))
      assert(s.n_kept == b.getAs[Int]("n_kept"))
      assert(s.buf_avg == Option(b.getAs[Any]("buf_avg"))
        .map(_.asInstanceOf[Double]))
    }
  }
}
