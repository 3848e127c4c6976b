package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket resampling + gap filling.
  *
  * Reference semantics: hourly-average exports
  * (`statistics/MySQL2CSV.sh:349-412` — `GROUP BY YEAR,MONTH,DAY,HOUR` with
  * `ROUND(AVG(col),2)`) and the generic bucket resampler with *gap rows*
  * (`visualisation/ChartsPM.pl:554-615` Array2Units emits null rows for
  * empty buckets through the series end; `MySQL2CSV.sh:43,124` add_rows).
  *
  * Scale notes: the bucket aggregation is a single hash aggregate with
  * map-side partial aggregation (one shuffle on the bucket/group keys).
  * The spine is `sequence(min,max)` — one row per bucket, tiny next to the
  * fact table — so the gap-fill join broadcasts the aggregated side or the
  * spine, never re-shuffling the raw facts.
  */
object Resample {

  /** Truncate `ts` to `bucketSec`-second buckets, as epoch seconds. */
  def bucketEpochS(ts: Column, bucketSec: Long): Column =
    floor(unix_timestamp(ts) / bucketSec) * bucketSec

  /** Round a double aggregate to `scale` decimals, stably across engines:
    * a group mean can land exactly on a rounding boundary (e.g. 49.005),
    * where last-bit summation-order differences flip `round(x, 2)`. Casting
    * through decimal(18,6) first absorbs ~1e-12 noise, so both Spark and
    * any reasonable SQL engine round the same exact decimal.
    */
  def roundStable(c: Column, scale: Int): Column =
    round(c.cast("decimal(18,6)"), scale).cast("double")

  /** Per-bucket (+ optional extra keys) aggregation. */
  def timeBucketAgg(df: DataFrame, ts: Column, bucketSec: Long,
                    keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val b = bucketEpochS(ts, bucketSec).as("bucket_ts")
    df.groupBy(b +: keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Hourly mean per group, `ROUND(AVG(v),2)` per the reference export. */
  def hourlyAvg(df: DataFrame, ts: Column, value: Column,
                keys: Seq[Column] = Nil): DataFrame =
    timeBucketAgg(df, ts, 3600, keys,
      Seq(roundStable(avg(value), 2).as("avg_value"), count(lit(1)).as("n")))

  /** Left-join `agg` (which has a `bucket_ts` epoch-seconds column) onto a
    * complete bucket spine spanning [min, max] of the raw data — rows for
    * empty buckets carry nulls, mirroring ChartsPM's Array2Units.
    */
  def gapFill(raw: DataFrame, ts: Column, bucketSec: Long,
              agg: DataFrame): DataFrame = {
    val bounds = raw.agg(
      min(bucketEpochS(ts, bucketSec)).as("lo"),
      max(bucketEpochS(ts, bucketSec)).as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), lit(bucketSec))).as("bucket_ts"))
    spine.join(agg, Seq("bucket_ts"), "left")
  }
}
