package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hourly CSV export job — SURVEY §3.2's end-to-end lifecycle
  * (reference: statistics/MySQL2CSV.sh:349-412): select a period, bucket
  * to hours with `ROUND(AVG(col),2)` per measurement column, gap-fill
  * empty buckets through the series end (`add_rows` awk, :43,124), and
  * write one CSV per kit (K3 sink semantics).
  *
  * One Spark job: filter (pushed to the scan) → window agg (map-side
  * partial) → spine left-join (the spine is `sequence(min,max)` — tiny,
  * broadcast) → csv. At cluster scale the write is partitioned by kit,
  * giving the reference's file-per-kit layout from a single job.
  */
object HourlyExport {

  /** Hourly gap-filled export frame: one row per (key, hour-in-range),
    * null measurements for silent hours (the reference emits empty
    * fields there). */
  def hourlyFrame(df: DataFrame, key: Column, ts: Column, value: Column,
                  fromS: Long, toS: Long): DataFrame = {
    val agg = df
      .where(unix_timestamp(ts.cast("timestamp")).between(fromS, toS))
      .groupBy(key.as("k"),
        (floor(unix_timestamp(ts.cast("timestamp")) / 3600) * 3600).as("hour_ts"))
      .agg(round(avg(value), 2).as("avg_v"), count(lit(1)).as("n"))
    val keys = agg.select(col("k")).distinct()
    val spine = keys.select(col("k"),
      explode(sequence(
        lit(fromS / 3600 * 3600), lit(toS / 3600 * 3600),
        lit(3600))).as("hour_ts"))
    spine.join(agg, Seq("k", "hour_ts"), "left")
  }

  /** Write the export as CSV, one directory per key (the reference's
    * file-per-kit zip). Returns the written row count. */
  def writeCsv(frame: DataFrame, outDir: String): Long = {
    frame.write.mode("overwrite")
      .partitionBy("k")
      .option("header", "true")
      .csv(outDir)
    frame.count()
  }
}
