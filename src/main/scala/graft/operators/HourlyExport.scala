package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hourly CSV export job — SURVEY §3.2's end-to-end lifecycle
  * (reference: statistics/MySQL2CSV.sh:349-412): select a period, bucket
  * to hours with `ROUND(AVG(col),2)` per measurement column, gap-fill
  * empty buckets through the series end (`add_rows` awk, :43,124), and
  * write one CSV per kit (K3 sink semantics).
  *
  * Composed from [[Resample]] (same bucket expression, same
  * engine-stable rounding) plus a per-key spine; one Spark job: filter
  * (pushed to the scan) → window agg (map-side partial) → spine
  * left-join (spine rows = keys × hours, tiny) → csv. At cluster scale
  * the write partitions by kit, giving the reference's file-per-kit
  * layout from a single job.
  */
object HourlyExport {

  /** Hourly gap-filled export frame: one row per (key, hour-in-range),
    * null measurements for silent hours (the reference emits empty
    * fields there). Columns: k, bucket_ts, avg_value, n. */
  def hourlyFrame(df: DataFrame, key: Column, ts: Column, value: Column,
                  fromS: Long, toS: Long): DataFrame = {
    val t = ts.cast("timestamp")
    val filtered = df.where(unix_timestamp(t).between(fromS, toS))
    val agg = Resample.hourlyAvg(filtered, t, value, Seq(key.as("k")))
    val spine = agg.select(col("k")).distinct()
      .select(col("k"), explode(sequence(
        lit(fromS / 3600 * 3600), lit(toS / 3600 * 3600),
        lit(3600L))).as("bucket_ts"))
    spine.join(agg, Seq("k", "bucket_ts"), "left")
  }

  /** Write the export as CSV, one directory per key (the reference's
    * file-per-kit zip). Single pass — no post-write recount. */
  def writeCsv(frame: DataFrame, outDir: String): Unit =
    frame.write.mode("overwrite")
      .partitionBy("k")
      .option("header", "true")
      .csv(outDir)
}
