package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed window / ordering operators.
  *
  * Reference semantics, file:line into `/root/reference/`:
  *  - latest-per-kit `ORDER BY datum DESC LIMIT 1` (`MyDatacollector.py:733`,
  *    `scripts/MySQL2CSV.sh:215`)
  *  - run-length "static value" detection (`scripts/FilterShow.py:362-383`)
  *  - last-non-null validity back-fill (`MyDatacollector.py:1569-1598`)
  *  - interval estimation, mean+2σ of consecutive diffs
  *    (`statistics/MyRegression.py:267-277`)
  *  - dead-kit detection (`MyDatacollector.py:720-756`)
  *  - stuck-sensor mode report (`scripts/ReportFailingSensors.sh:420-440`)
  *
  * All are single-shuffle window/agg plans: each partitions by the kit key,
  * which is exactly the archive's physical partitioning at scale, so with a
  * pre-partitioned archive these run shuffle-free.
  */
object WindowOps {

  /** Newest row per key; `tiebreak` makes the pick deterministic. */
  def latestPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(order: _*)))
      .where(col("rn") === 1).drop("rn")

  /** Runs of >= minLen identical `value` per key in `order` order.
    * Returns one row per run: key cols, value, run_len, first order value.
    * Gaps-and-islands via difference of row_numbers (no self-join).
    */
  def runLengths(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 value: Column, minLen: Long): DataFrame = {
    val byKey = Window.partitionBy(keys: _*).orderBy(order: _*)
    val byKeyVal = Window.partitionBy(keys :+ value: _*).orderBy(order: _*)
    df.withColumn("grp",
        row_number().over(byKey) - row_number().over(byKeyVal))
      .groupBy(keys :+ value :+ col("grp"): _*)
      .agg(count(lit(1)).as("run_len"), min(order.head).as("run_start"))
      .where(col("run_len") >= minLen)
      .drop("grp")
  }

  /** Forward-fill nulls in `value` per key (`last(..., ignoreNulls)`). */
  def backfill(df: DataFrame, keys: Seq[Column], order: Seq[Column],
               value: Column, as: String): DataFrame =
    df.withColumn(as, last(value, ignoreNulls = true).over(
      Window.partitionBy(keys: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Per-key cadence estimate: mean and mean+2σ of consecutive epoch-second
    * diffs restricted to [loSec, hiSec].
    */
  def intervalEstimate(df: DataFrame, key: Column, ts: Column,
                       loSec: Double, hiSec: Double,
                       tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts +: tiebreak: _*)
    val us = unix_micros(ts.cast("timestamp"))
    df.withColumn("diff_s", (us - lag(us, 1).over(w)) / 1e6)
      .where(col("diff_s").between(loSec, hiSec))
      .groupBy(key)
      // quantize through DECIMAL before the 4-decimal round (the q02/q53
      // half-trap); diff_s sits on a 1e-6 grid so its means need a deeper
      // decimal scale than roundStable's 6
      .agg(round(avg(col("diff_s")).cast("decimal(28,12)"), 4).cast("double")
             .as("mean_interval"),
           round((avg(col("diff_s")) + lit(2) * stddev_samp(col("diff_s")))
             .cast("decimal(28,12)"), 4).cast("double").as("interval_2sig"),
           count(lit(1)).as("n_diffs"))
  }

  /** Keys whose latest event lags the global latest by more than `gapSec`.
    * The global max is a 1-row aggregate broadcast-cross-joined back in —
    * an unpartitioned window here would drag every per-key row onto a
    * single partition (last_seen has one row per key: millions at scale).
    */
  def deadKeys(df: DataFrame, key: Column, ts: Column, gapSec: Long): DataFrame = {
    val lastSeen = df.groupBy(key).agg(max(unix_timestamp(ts)).as("last_seen"))
    val globalLast = lastSeen.agg(max(col("last_seen")).as("global_last"))
    lastSeen.crossJoin(broadcast(globalLast))
      .withColumn("gap_s", col("global_last") - col("last_seen"))
      .where(col("gap_s") > gapSec)
      .drop("global_last")
  }

  /** Batch geofence segmentation (W7): contiguous runs of rows whose
    * home-distance exceeds `radiusM` ("kit not at home"), one row per
    * away period with its bounds — the batch equivalent of the
    * reference's awk state machine over `ST_Distance_Sphere(home, pos)`
    * ordered by time, threshold 118 m
    * (`scripts/UpdateValidity.sh:188-202`). Same gaps-and-islands shape
    * as [[runLengths]]: two row_numbers, one shuffle on the kit key.
    *
    * Rows with a null distance (missing GPS fix) are DROPPED before
    * segmentation — the reference's feed filters them (`AND NOT
    * ISNULL(geohash)`, UpdateValidity.sh:193), so a null row neither
    * splits an away run nor counts toward it. (Without the explicit
    * filter, null rows would land in their own window flag partition
    * and corrupt the gaps-and-islands group ids.)
    */
  def geofenceSegments(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                       distM: Column, radiusM: Double): DataFrame = {
    val flagged = df.withColumn("dist_m", distM)
      .where(col("dist_m").isNotNull)
      .withColumn("away", col("dist_m") > radiusM)
    val byKey = Window.partitionBy(keys: _*).orderBy(order: _*)
    val byFlag = Window.partitionBy(keys :+ col("away"): _*).orderBy(order: _*)
    flagged.withColumn("grp",
        row_number().over(byKey) - row_number().over(byFlag))
      .where(col("away"))
      .groupBy(keys :+ col("grp"): _*)
      .agg(min(order.head).as("seg_start"), max(order.head).as("seg_end"),
        count(lit(1)).as("n_rows"), max(col("dist_m")).as("max_dist_m"))
      .drop("grp")
  }

  /** Most frequent value per key with support > minCount
    * (stuck-sensor report). Deterministic tie-break on the value itself.
    */
  def modeTop1(df: DataFrame, keys: Seq[Column], value: Column,
               minCount: Long): DataFrame =
    df.groupBy(keys :+ value: _*).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > minCount)
      .withColumn("rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(col("cnt").desc, value.asc)))
      .where(col("rn") === 1).drop("rn")

  /** Gap-based sessionization via Spark's native `session_window` — the
    * W-family member the fixed-grid windows (W5) can't express: a
    * session is a maximal run of per-key events with no silence longer
    * than `gapSec`; its window is `[min ts, last ts + gap)`. One shuffle
    * on the key (the session merge is key-local), streaming-capable with
    * a watermark unchanged.
    *
    * Boundary semantics, MEASURED on this engine and locked by spec: a
    * gap of EXACTLY `gapSec` still merges (rows t and t+gap share a
    * session — Spark merges on overlap of `[t, t+gap)` half-open
    * windows, and the successor's window starts at the predecessor's
    * end, which counts as overlapping); only a strictly larger gap
    * breaks. The DuckDB twin is the classic gaps-and-islands form with
    * the SAME `diff > gap` break predicate (q99).
    *
    * Sums go through DECIMAL so the hash is addition-order-independent.
    */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapSec: Int,
                 value: Column): DataFrame =
    df.groupBy(session_window(ts, s"$gapSec seconds"), key.as("key"))
      .agg(count(lit(1)).as("n"),
        sum(value.cast("decimal(18,6)")).cast("double").as("s"))
      .select(col("key"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n"), col("s"))
}
