package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bidirectional-sync statement emission — the reference's DB↔web sync
  * pass (MyDatacollector/MyDBsyncWebDB.py:852-1000) walks the
  * full-outer metadata diff (J7) and prints one SQL statement per
  * divergent row: INSERT for rows only the remote has, DELETE for rows
  * only the local side has, UPDATE where both exist but disagree.
  *
  * Spark-first shape: the diff is the existing full-outer join; the
  * statement is ONE `CASE`/`concat` projection over it — a pure Column
  * expression that stays inside whole-stage codegen, so "emit the sync
  * script" is a `.select` away from the diff frame, not a driver loop
  * over cursor rows like the reference.
  */
object SyncStatements {

  /** One statement per diff row. `a` is the local value, `b` the remote
    * value (remote wins, as in the reference's web→DB direction):
    * a NULL → INSERT, b NULL → DELETE, both → UPDATE. Rows where the
    * values already agree should be filtered out before calling (the
    * diff frame's contract). Values render via CAST TO STRING, so the
    * caller picks columns whose text form is engine-stable. */
  def emit(table: String, keyCol: String, valCol: String,
           key: Column, a: Column, b: Column): Column =
    when(a.isNull,
      concat(lit(s"INSERT INTO $table ($keyCol, $valCol) VALUES ("),
        key.cast("string"), lit(", "), b.cast("string"), lit(");")))
      .when(b.isNull,
        concat(lit(s"DELETE FROM $table WHERE $keyCol = "),
          key.cast("string"), lit(";")))
      .otherwise(
        concat(lit(s"UPDATE $table SET $valCol = "), b.cast("string"),
          lit(s" WHERE $keyCol = "), key.cast("string"), lit(";")))
}
