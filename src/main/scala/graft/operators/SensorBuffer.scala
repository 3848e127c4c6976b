package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S8 — the sensor-plugin sliding-average buffer.
  *
  * Reference: every RPi sensor plugin feeds a per-sensor thread
  * (`RPi/MySense.py:778-949` sensorread) whose buffer logic lives in
  * `RPi/MyThreading.py:97-205`: keep the last `BUFSIZE` polls
  * (`bufCleanup :97-120`), and on every poll publish the buffer's
  * outlier-filtered average (`bufCollect :135-180`) — quartiles via
  * numpy's linear-interpolated percentiles, keep values in
  * `[Q1 − 1.5·(Q3−Q1), Q1 + 1.5·(Q3−Q1)]` (the asymmetric Q1-based upper
  * bound, `filterOutliers :122-133` — same quirk as A7/q40), mean rounded
  * to 3 decimals, stamped at the middle of the buffered time range
  * (`:172`).
  *
  * Spark-first shape: the edge threads disappear — batch-side this is a
  * count-bounded sliding window per sensor (one shuffle on the sensor
  * key), with the quartile/filter/mean arithmetic done by HOFs over the
  * frame's sorted value list so the identical formula renders to the
  * DuckDB oracle. Stream-side the same buffer is per-key
  * `flatMapGroupsWithState` (the state IS the reference's `self.Buffer`),
  * emitting one averaged record per poll — parity with the batch operator
  * is spec-enforced. The wall-clock `INTERVAL` cleanup is a polling-
  * cadence concern of the edge loop and is not modelled; the count bound
  * (`BUFSIZE`) is the portable semantics.
  */
object SensorBuffer {

  /** numpy-style linear-interpolated percentile of a SORTED array column:
    * `pos = (n−1)·p`, `v = s[⌊pos⌋] + frac·(s[⌊pos⌋+1] − s[⌊pos⌋])`.
    * 1-based element_at; total on singleton lists (frac 0). */
  private def pctl(sorted: Column, p: Double): Column = {
    val pos = (size(sorted) - 1) * p
    val lo = floor(pos)
    val frac = pos - lo
    val vLo = element_at(sorted, (lo + 1).cast("int"))
    val vHi = element_at(sorted, least(lo + 2, size(sorted)).cast("int"))
    vLo + frac * (vHi - vLo)
  }

  /** SQL twin of [[pctl]] over a sorted-list SQL expression `s`. */
  private def pctlSql(s: String, p: Double): String = {
    val pos = s"((len($s) - 1) * $p)"
    val lo = s"floor($pos)"
    s"""(($s)[CAST($lo AS INT) + 1]
        + ($pos - $lo) * (($s)[CAST(least($lo + 1, len($s) - 1) AS INT) + 1]
                          - ($s)[CAST($lo AS INT) + 1]))"""
  }

  /** Batch shape: per `key`, ordered by `order`, the last-`bufSize`-rows
    * buffer ending at each row. Emits `mid_ts` (middle of the buffered
    * epoch-seconds range), `n_buf`, `n_kept`, and `buf_avg` (the filtered
    * 3-decimal mean; NULL when the filter keeps nothing). Bounds carry
    * the q40 epsilon: source values sit on a coarse grid, interpolated
    * bounds on a finer one, so a value can land EXACTLY on a bound where
    * 1-ulp engine noise would flip membership.
    *
    * NULL contract: NULL `value`s are EXCLUDED from the buffer
    * (`collect_list` drops them), so `n_buf` counts non-null polls only —
    * the reference's plugins never buffer a failed poll either
    * (`MyThreading.py:135-180` appends measured values only). The SQL
    * twin must match: see [[slidingAverageSql]].
    */
  def slidingAverage(df: DataFrame, key: Seq[Column], order: Seq[Column],
                     tsEpochS: Column, value: Column,
                     bufSize: Int): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(order: _*)
      .rowsBetween(-(bufSize - 1), Window.currentRow)
    val staged = df
      .withColumn("__vals", sort_array(collect_list(value).over(w)))
      .withColumn("__t0", min(tsEpochS).over(w))
      .withColumn("__t1", tsEpochS)
      .withColumn("__q1", pctl(col("__vals"), 0.25))
      .withColumn("__q3", pctl(col("__vals"), 0.75))
      .withColumn("__lo", col("__q1") - (col("__q3") - col("__q1")) * 1.5 - 1e-6)
      .withColumn("__hi", col("__q1") + (col("__q3") - col("__q1")) * 1.5 + 1e-6)
      .withColumn("__kept",
        filter(col("__vals"), v => v >= col("__lo") && v <= col("__hi")))
    staged
      .withColumn("mid_ts", (col("__t0") + col("__t1")) / 2.0)
      .withColumn("n_buf", size(col("__vals")))
      .withColumn("n_kept", size(col("__kept")))
      .withColumn("buf_avg", when(size(col("__kept")) > 0, Resample.roundStable(
        aggregate(col("__kept"), lit(0.0), _ + _) / size(col("__kept")), 3)))
      .drop("__vals", "__t0", "__t1", "__q1", "__q3", "__lo", "__hi", "__kept")
  }

  /** The DuckDB rendering of the same computation, for oracle authors:
    * frame list → sort → quartiles → filter → 3-decimal mean. `valsSorted`
    * must be the frame's value list with NULLs removed BEFORE sorting —
    * the canonical recipe is
    * `list_sort(list_filter(list(value) OVER w, v -> v IS NOT NULL))` —
    * because the engine side's `collect_list` drops NULLs while DuckDB's
    * `list()` keeps them; an unfiltered list shifts quartiles, `n_buf`
    * and the mean whenever a NULL poll is in frame. */
  def slidingAverageSql(valsSorted: String): (String, String, String) = {
    val q1 = pctlSql(valsSorted, 0.25)
    val q3 = pctlSql(valsSorted, 0.75)
    val lo = s"($q1 - ($q3 - $q1) * 1.5 - 1e-6)"
    val hi = s"($q1 + ($q3 - $q1) * 1.5 + 1e-6)"
    val kept = s"list_filter($valsSorted, v -> v >= $lo AND v <= $hi)"
    (kept,
      s"len($kept)",
      s"""CASE WHEN len($kept) > 0 THEN CAST(round(CAST(
            list_sum($kept) / len($kept) AS DECIMAL(18,6)), 3) AS DOUBLE)
          END""")
  }

  // ---------------------------------------------------------- streaming

  /** One sensor poll. */
  case class Reading(kit: String, sensor: String, ts: Long, value: Double)
  /** One published buffer average (the reference's `BufAvg`). */
  case class BufAvg(kit: String, sensor: String, ts: Long, mid_ts: Double,
                    n_buf: Int, n_kept: Int, buf_avg: Option[Double])

  /** The exact scalar pipeline of [[slidingAverage]], reused by the
    * streaming state handler so batch and stream can't drift. */
  private[operators] def bufAvgOf(buffer: Seq[(Long, Double)]): BufAvg = {
    val vals = buffer.map(_._2).sorted.toIndexedSeq
    def pct(p: Double): Double = {
      val pos = (vals.length - 1) * p
      val lo = pos.toInt
      val hi = math.min(lo + 1, vals.length - 1)
      vals(lo) + (pos - lo) * (vals(hi) - vals(lo))
    }
    val q1 = pct(0.25); val q3 = pct(0.75)
    val lo = q1 - (q3 - q1) * 1.5 - 1e-6
    val hi = q1 + (q3 - q1) * 1.5 + 1e-6
    val kept = vals.filter(v => v >= lo && v <= hi)
    // EXACTLY roundStable(x, 3): decimal(18,6) half-up first, then 3 —
    // a single setScale(3) would round x.0004999… differently and break
    // the spec-enforced batch/stream parity
    val avg = if (kept.isEmpty) None
      else Some(BigDecimal(kept.sum / kept.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
    BufAvg("", "", buffer.last._1,
      (buffer.map(_._1).min + buffer.last._1) / 2.0,
      buffer.length, kept.length, avg)
  }

  /** Streaming shape: per (kit, sensor) the buffer is explicit state;
    * every arriving poll appends, trims to `bufSize`, and emits one
    * [[BufAvg]] — `bufCollect`'s publish-per-poll loop. Use with
    * `OutputMode.Append`. Batch parity (SensorBufferSpec) holds when
    * `ts` is unique per sensor — the reference's poll loop guarantees
    * monotone times; with duplicate timestamps the within-tie buffer
    * order (here (ts, value); batch: the caller's order columns) can
    * differ, which only permutes the intermediate averages. */
  def slidingAverageStream(readings: Dataset[Reading],
                           bufSize: Int): Dataset[BufAvg] = {
    import readings.sparkSession.implicits._
    readings.groupByKey(r => (r.kit, r.sensor))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String), rows: Iterator[Reading],
         state: GroupState[Seq[(Long, Double)]]) => {
          var buf = state.getOption.getOrElse(Seq.empty)
          val out = rows.toSeq.sortBy(r => (r.ts, r.value)).map { r =>
            buf = (buf :+ (r.ts, r.value)).takeRight(bufSize)
            bufAvgOf(buf).copy(kit = key._1, sensor = key._2)
          }
          state.update(buf)
          out.iterator
        })
  }
}
