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
    // roundStable, not round: a mean of 2-decimal-grid data can land
    // EXACTLY on a 4-decimal half (sum/8 has 5 decimal places), where
    // Spark and DuckDB round ulp-different doubles opposite ways —
    // quantizing through DECIMAL(18,6) first makes both engines round
    // the identical exact decimal (surfaced at sf0.1, 372 rows in q53).
    val left = a.groupBy(Resample.bucketEpochS(aTs, intervalSec).as("bucket_ts"))
      .agg(Resample.roundStable(avg(aVal), 4).as("avg_a"), count(lit(1)).as("n_a"))
    val right = b.groupBy(Resample.bucketEpochS(bTs, intervalSec).as("bucket_ts"))
      .agg(Resample.roundStable(avg(bVal), 4).as("avg_b"), count(lit(1)).as("n_b"))
    left.join(right, Seq("bucket_ts"), "inner")
  }

  /** Exact ±tol alignment — the literal `pickValue` semantics: for each
    * left row, the mean of ALL right samples with |t_l − t_r| ≤ tol;
    * left rows without a match are dropped (MyRegression.py:390-396).
    *
    * Scale shape: a *banded* range join, not O(n·m) — the right side is
    * exploded into its bucket and both neighbors (3×), the join is an
    * equi-join on `floor(t/tol)`, and the exact |Δt| ≤ tol predicate
    * filters the band. Each pair within tolerance falls in exactly one
    * of the three band offsets, so no dedup is needed. Timestamps are
    * compared in integer microseconds — no float in the join key. */
  def toleranceAlign(a: DataFrame, aId: Column, aTs: Column, aVal: Column,
                     b: DataFrame, bTs: Column, bVal: Column,
                     tolSec: Long): DataFrame = {
    val tolUs = tolSec * 1000000L
    val left = a.select(aId.as("l_id"), unix_micros(aTs.cast("timestamp")).as("l_us"),
      aVal.as("l_v")).withColumn("b", floor(col("l_us") / tolUs))
    val right = b.select(unix_micros(bTs.cast("timestamp")).as("r_us"),
        bVal.as("r_v"))
      .withColumn("b0", floor(col("r_us") / tolUs))
      .select(col("r_us"), col("r_v"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("b"))
    left.join(right, Seq("b"))
      .where(abs(col("l_us") - col("r_us")) <= tolUs)
      .groupBy(col("l_id"), col("l_us"), col("l_v"))
      .agg(Resample.roundStable(avg(col("r_v")), 4).as("avg_r"),
        count(lit(1)).as("n_match"))
  }
}
