package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet archive with MERGE/upsert semantics — the Spark analogue of
  * the reference's `REPLACE INTO <kit> … UNIQUE KEY datum` archive sink
  * (reference: MyDatacollector/lib/MyARCHIVE.py:360-456, key at
  * MySQLdbSetup.sql:171): last-write-wins per key.
  *
  * Implementation: read-union-dedup-rewrite with an atomic-ish directory
  * swap (write to `<dir>.staging`, swap). On a real deployment this is a
  * Delta/Iceberg MERGE with partition pruning on `(project, serial)`; the
  * rewrite here keeps the same observable semantics with plain parquet.
  * Dedup is a shuffle on the key columns only — no driver-side state.
  */
object ArchiveSink {

  /** Upsert `batch` into the parquet dir: for duplicate keys the row with
    * the highest `version` wins (ties: incoming batch wins). */
  def upsert(batch: DataFrame, dir: String, keys: Seq[String],
             version: String): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(dir)
    val incoming = batch.withColumn("__new", lit(1))
    val all =
      if (fs.exists(cur))
        spark.read.parquet(dir).withColumn("__new", lit(0))
          .unionByName(incoming)
      else incoming
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(version).desc, col("__new").desc)
    val merged = all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn", "__new")
    val staging = new Path(dir + ".staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    if (fs.exists(cur)) fs.delete(cur, true)
    fs.rename(staging, cur)
  }
}
