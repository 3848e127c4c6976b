package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Checkpoint kill-and-restart recovery (VERDICT r12 item 5 — the
  * reference's restart semantics, MyDatacollector.py:1207 IsRestarting):
  * a stateful q79 replay stopped after its first micro-batch and
  * RESTARTED from the same checkpoint must produce byte-identical output
  * to an uninterrupted run — per-kit state (static-value runs, interval
  * estimates, geofence home) must survive the restart, and the recovered
  * query must not reprocess the already-committed batch (a reprocess
  * would duplicate rows in the append sink and break equality). */
class RestartRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val keys = 40
  private val eventsPerKey = 16
  private val t0 = 1700000000L

  /** 40 kits × 16 events on a 900 s grid. Every 4th kit sends a CONSTANT
    * value, so its static-value run SPANS the restart boundary — if the
    * restart lost state, staticRun would reset at the boundary and the
    * outputs would differ. */
  private def corpus = spark.range(keys.toLong * eventsPerKey).select(
    concat(lit("k"), col("id") % keys).as("kit"),
    (lit(t0) + floor(col("id") / keys).cast("long") * 900L +
      (col("id") % keys)).as("ts"),
    when((col("id") % keys) % 4 === 0, lit(7.0))
      .otherwise((col("id") % 37).cast("double")).as("value"),
    lit("u1hu9z").as("geohash"))

  /** Writes `pred`-selected rows as one mtime-ordered parquet file. */
  private def writeFile(dir: java.nio.file.Path, fname: String,
                        pred: org.apache.spark.sql.Column,
                        mtime: Long): Unit = {
    val stage = dir.resolve(s".stage_$fname")
    corpus.where(pred).coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val ls = java.nio.file.Files.list(stage)
    val part = try ls.filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    finally ls.close()
    val dest = dir.resolve(fname)
    java.nio.file.Files.move(part, dest)
    dest.toFile.setLastModified(mtime)
  }

  /** One AvailableNow run of the q79 kit-state leg over whatever files
    * are currently in `inDir`, appending to `outDir`. */
  private def runOnce(inDir: String, ckpt: String, outDir: String): Unit = {
    import spark.implicits._
    val src = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = KitState(src.as[KitState.KitEvent].groupByKey(_.kit),
        rateS = 3600L, staticThreshold = 3, geoPrefix = 6)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir)
      .outputMode("append").start()
    q.awaitTermination()
  }

  test("q79 replay: restart from checkpoint resumes with identical " +
      "output; the committed batch is not reprocessed") {
    val tMid = t0 + (eventsPerKey / 2) * 900L
    val root = java.nio.file.Files.createTempDirectory("graft_restart")
    def dirs(tag: String) = {
      val in = java.nio.file.Files.createDirectories(root.resolve(s"in_$tag"))
      (in, root.resolve(s"ck_$tag").toString, root.resolve(s"out_$tag").toString)
    }

    // uninterrupted reference: both files staged up front, one run
    val (inU, ckU, outU) = dirs("uninterrupted")
    writeFile(inU, "replay-0.parquet", col("ts") <= tMid, 1000000L)
    writeFile(inU, "replay-1.parquet", col("ts") > tMid, 2000000L)
    runOnce(inU.toString, ckU, outU)

    // kill-and-restart: file 0 only → run → query terminates (the
    // deterministic stand-in for a kill: state is whatever the last
    // committed checkpoint holds) → file 1 arrives → NEW query, SAME
    // checkpoint and sink
    val (inR, ckR, outR) = dirs("restarted")
    writeFile(inR, "replay-0.parquet", col("ts") <= tMid, 1000000L)
    runOnce(inR.toString, ckR, outR)
    writeFile(inR, "replay-1.parquet", col("ts") > tMid, 2000000L)
    runOnce(inR.toString, ckR, outR)

    val u = spark.read.parquet(outU)
    val r = spark.read.parquet(outR)
    assert(r.count() === u.count(),
      s"restarted run emitted ${r.count()} rows vs ${u.count()} — a " +
        "mismatch means lost state or a reprocessed batch")
    assert(r.exceptAll(u).isEmpty && u.exceptAll(r).isEmpty,
      "post-restart output differs from the uninterrupted run")
    // the state-dependent signal really spans the boundary: static kits
    // must reach a run length ABOVE the per-batch event count, which is
    // only possible if the restart preserved staticRun
    import spark.implicits._
    val maxRun = r.agg(max(col("staticRun"))).head().getInt(0)
    assert(maxRun > eventsPerKey / 2,
      s"max staticRun $maxRun never crossed the restart boundary — the " +
        "fixture no longer exercises state continuity")
  }
}
