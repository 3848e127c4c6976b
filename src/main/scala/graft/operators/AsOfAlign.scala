package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of / nearest-time alignment of two measurement series.
  *
  * Reference semantics (`statistics/MyRegression.py:383-440` pickValue /
  * getArrays): for each reference-sensor timestamp, take the *mean of all*
  * other-sensor samples within ±interval/2 (not nearest-1), and drop the
  * row when any side has no sample.
  *
  * Spark-first design: truncating both series to the same interval grid and
  * equi-joining the bucket means is exactly that semantics (a bucket
  * [t, t+i) is t+i/2 ± i/2) and turns an O(n·m) range join into one hash
  * aggregate + one equi-join per side — at scale both sides shuffle once on
  * the bucket key; with bucketed storage the join is co-located.
  */
object AsOfAlign {

  /** Align two series to a common `intervalSec` grid; inner-join buckets
    * where both sides have data, with per-side means.
    */
  def bucketAlign(a: DataFrame, aTs: Column, aVal: Column,
                  b: DataFrame, bTs: Column, bVal: Column,
                  intervalSec: Long): DataFrame = {
    val left = a.groupBy(Resample.bucketEpochS(aTs, intervalSec).as("bucket_ts"))
      .agg(round(avg(aVal), 4).as("avg_a"), count(lit(1)).as("n_a"))
    val right = b.groupBy(Resample.bucketEpochS(bTs, intervalSec).as("bucket_ts"))
      .agg(round(avg(bVal), 4).as("avg_b"), count(lit(1)).as("n_b"))
    left.join(right, Seq("bucket_ts"), "inner")
  }
}
