package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-stage salted combine.
  *
  * At 100 TB a handful of hot keys (one chatty kit, one dominant
  * document source) can overload single reducers. The classic fix is a
  * deterministic salt: first aggregate on (key, salt) — spreading a hot
  * key over `buckets` reducers — then re-aggregate on the key. Results
  * are identical to the direct groupBy for any commutative+associative
  * aggregate; AQE's skew handling covers joins, this covers aggregates
  * whose partial-combine is defeated by high per-key distinct inputs.
  *
  * The salt is derived from a secondary column (not `rand()`), so the
  * plan stays deterministic and retry-safe — a task retry with a random
  * salt would double-count rows that already shipped.
  */
object Skew {

  /** Per-key sum and count of `v`, salted over `buckets` reducers. */
  def saltedSumCount(df: DataFrame, key: Column, salt: Column, v: Column,
                     buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(salt), lit(buckets)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(v).as("__s"), count(v).as("__c"))
      .groupBy(col("k"))
      .agg(sum(col("__s")).as("sum_v"), sum(col("__c")).as("n"))
}
