package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic star-schema tables (TESTDATA.md).
  *
  * At cluster scale the archive would be a partitioned parquet/Delta table;
  * here each table is one parquet file. Filters and projections applied by
  * callers push down to the scan (verify with `.explain`: `PushedFilters`).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The driver's events table stores TIMESTAMP(NANOS) parquet, which
    // Spark only reads via the nanosAsLong legacy conf (as LongType ns).
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => }
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Normalize any ns-long "ts" back to a microsecond TIMESTAMP (integer
    // DIV: int64 ns exceeds double's exact range, a / 1000 would skew).
    df.schema.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case None => df
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
