package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The archive data model (SURVEY §1.4): ONE long-form measurement table
  * `(keys…, datum, field, value, valid)` replacing the reference's
  * table-per-kit wide MySQL schema (MySQLdbSetup.sql:136-172) and its
  * on-demand ALTER TABLE column creation (lib/MyARCHIVE.py:86-103).
  *
  * - Schema evolution = new `field` string values; no DDL ever.
  * - Tri-state validity (1 valid / 0 invalidated / NULL undefined,
  *   lib/MyARCHIVE.py:190-194) is a nullable boolean that survives both
  *   directions of the reshape.
  * - At cluster scale the long table is written
  *   `partitionBy(project, serial)` so per-kit queries prune partitions
  *   (the analogue of the reference's per-kit tables).
  *
  * Wide views are produced per bounded field vocabulary via pivot —
  * `toWide(toLong(w)) == w` for any wide frame with unique keys
  * (proven by q50's identity oracle).
  */
object ArchiveModel {

  /** Wide → long: one row per (keys, datum, field); each field carries
    * its `<field>_valid` companion into the long `valid` column. */
  def toLong(df: DataFrame, keys: Seq[Column], datum: Column,
             fields: Seq[String]): DataFrame = {
    val entries = array(fields.map(f => struct(
      lit(f).as("field"), col(f).cast("double").as("value"),
      col(s"${f}_valid").cast("boolean").as("valid"))): _*)
    df.select(keys :+ datum.as("datum") :+ explode(entries).as("m"): _*)
      .select(keys.map(c => col(c.toString)) ++ Seq(col("datum"),
        col("m.field"), col("m.value"), col("m.valid")): _*)
  }

  /** Long → wide for a fixed field vocabulary: value and valid columns
    * per field. `first` is well-defined because (keys, datum, field) is
    * unique in the archive (the REPLACE INTO key). */
  def toWide(long: DataFrame, keys: Seq[Column], fields: Seq[String]): DataFrame =
    long.groupBy(keys :+ col("datum"): _*)
      .pivot("field", fields)
      .agg(first(col("value")).as("v"), first(col("valid")).as("valid"))
      // pivot names composite aggs "<field>_v"/"<field>_valid"; strip _v
      .withColumnsRenamed(fields.map(f => s"${f}_v" -> f).toMap)
}
