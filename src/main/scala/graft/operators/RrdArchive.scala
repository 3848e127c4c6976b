package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K8 — round-robin archive consolidation (the RRD sink's data model as a
  * query).
  *
  * Reference: `scripts/Get_data.pl:453-644` pipes measurements to rrdtool.
  * `New_RRA` (`:498-549`) creates, per sensor, archives for each
  * consolidation function (AVERAGE, MIN, MAX) × each span (1 day, 1 week,
  * 1 month, 1/3/6 years — `:535-540`), every archive holding exactly
  * `W = 785` rows (one per graph pixel) with
  * `pdp_per_row = int((span_hours + W) / W)` primary points per row,
  * xff 0.5, base step 3600 s. `Add_RRA` (`:551-...`) feeds hourly primary
  * data points.
  *
  * Spark-first shape: rrdtool's mutable ring files become a two-stage
  * aggregation — (1) primary data points: ONE hash aggregate of the facts
  * to the hourly step; (2) per archive: a consolidation aggregate of the
  * PDPs to `pdp_per_row`-hour rows, retention-filtered to the last 785
  * rows against the data's max timestamp (a 1-row broadcast, the
  * deadKeys pattern). All six archive branches share the IDENTICAL
  * stage-1 subtree, so Spark's ReuseExchange evaluates the fact-table
  * scan + hourly aggregate ONCE at runtime — at 100 TB the big shuffle
  * happens once and each archive consolidates ≤ a few thousand PDP rows.
  * RRD's UNKNOWN handling maps to absence: a missing hour is an unknown
  * PDP, and a consolidated row whose unknown fraction exceeds xff
  * (known·2 < pdp_per_row) yields a NULL value, exactly rrdtool's rule.
  */
object RrdArchive {

  /** One archive spec: `(span_hours, pdp_per_row, row_sec)`. */
  final case class Rra(spanHours: Int, pdpPerRow: Int, rowSec: Long)

  /** The reference's archive grid (`Get_data.pl:535-540`). */
  def referenceRras(stepSec: Long = 3600, width: Int = 785): Seq[Rra] =
    Seq(24, 24 * 7, 24 * 30, 24 * 365, 24 * 365 * 3, 24 * 365 * 6).map { s =>
      val p = (s + width) / width
      Rra(s, p, p * stepSec)
    }

  /** Consolidate `value` into the RRA grid.
    *
    * @return long-format archive: `span_h, cf ∈ {AVERAGE, MIN, MAX},
    *         row_ts, value (NULL when xff-invalid), n_pdp`
    */
  def consolidate(df: DataFrame, ts: Column, value: Column,
                  stepSec: Long = 3600, width: Int = 785,
                  rras: Seq[Rra] = Nil, xff: Double = 0.5): DataFrame = {
    // default grid is derived from THIS call's step/width — a literal
    // `referenceRras()` default would pin 3600/785 and silently mix grids
    // when the caller overrides either knob
    val grid = if (rras.nonEmpty) rras else referenceRras(stepSec, width)
    // Stage 1 — primary data points (hourly step): the one big shuffle.
    // roundStable so both engines consolidate identical PDP doubles.
    val pdp = df
      .groupBy(Resample.bucketEpochS(ts, stepSec).as("pdp_ts"))
      .agg(Resample.roundStable(avg(value), 4).as("pdp_v"))
    val maxTs = pdp.agg(max(col("pdp_ts")).as("max_ts"))

    // Stage 2 — per archive: retention filter + consolidation aggregate.
    // Each branch's stage-1 subtree is identical → ReuseExchange runs the
    // fact aggregate once (verify: one Exchange reused in the plan).
    grid.map { r =>
      val keep = (floor(col("max_ts") / r.rowSec) - (width - 1)) * r.rowSec
      pdp.crossJoin(broadcast(maxTs))
        .where(col("pdp_ts") >= keep)
        .groupBy((floor(col("pdp_ts") / r.rowSec) * r.rowSec).as("row_ts"))
        .agg(Resample.roundStable(avg(col("pdp_v")), 4).as("AVERAGE"),
          min(col("pdp_v")).as("MIN"), max(col("pdp_v")).as("MAX"),
          count(lit(1)).as("n_pdp"))
        .select(lit(r.spanHours).as("span_h"), col("row_ts"),
          col("AVERAGE"), col("MIN"), col("MAX"), col("n_pdp"))
        // melt the three consolidation functions to long rows, then the
        // xff gate: known·2 >= pdp_per_row keeps the value (rrdtool keeps
        // a CDP while unknown_fraction <= xff = 0.5)
        .unpivot(Array(col("span_h"), col("row_ts"), col("n_pdp")),
          Array(col("AVERAGE"), col("MIN"), col("MAX")), "cf", "v")
        .select(col("span_h"), col("cf"), col("row_ts"),
          when(col("n_pdp") * 2 >= r.pdpPerRow, col("v")).as("value"),
          col("n_pdp"))
    }.reduce(_ unionByName _)
  }
}
