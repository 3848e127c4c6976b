package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** File-replay Structured Streaming ingest (reference: the datacollector's
  * first-class file-replay mode, MyDatacollector/MyDatacollector.py:464-467
  * and lib/MyMQTTclient.py:1022-1096): the same transform pipeline runs
  * identically over a live stream and a replayed dump, and the archived
  * result must equal the batch computation — SURVEY §2.10 Q25
  * batch/stream parity.
  *
  * Shape: `readStream(parquet) → foreachBatch { ArchiveSink.upsert }` with
  * `Trigger.AvailableNow` so the run terminates after draining the input.
  * `maxFilesPerTrigger=1` forces at least one real micro-batch boundary
  * per input file; the upsert keeps batch boundaries invisible in the
  * archive (late/duplicate rows collapse on the key, as the reference's
  * REPLACE INTO does).
  */
object Replay {

  /** One tmp root per JVM: every replay reuses the same archive/input/
    * checkpoint subdirs (cleared at call start), so repeated runs leave
    * no orphan dirs; the root itself is removed at JVM exit. */
  private lazy val tmpRoot: java.nio.file.Path = {
    val p = Files.createTempDirectory("graft_replay_session_")
    sys.addShutdownHook(deleteRecursively(p))
    p
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRecursively(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** Replays the events table through a streaming upsert archive, then
    * returns the archived rows (ts normalized like Tables does). */
  def replayEventsToArchive(spark: SparkSession, sfDir: String): DataFrame = {
    // events.parquet is TIMESTAMP(NANOS); same legacy conf as Tables.apply
    // (must be set before schema inference, not only before the read).
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => }
    val batchSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // Fresh run: clear the previous run's dirs (also resets the stream
    // checkpoint — reusing it would make the source skip the input files).
    Seq("archive", "in", "ckpt").foreach(n => deleteRecursively(tmpRoot.resolve(n)))
    val archiveDir = tmpRoot.resolve("archive").toString + "/events"
    // The file source wants a directory; stage the dump as TWO links so
    // two micro-batches replay the same telegrams — the archive upsert
    // must collapse the duplicates (REPLACE INTO semantics), which makes
    // the parity check cover dedup, not just pass-through.
    val inDir = Files.createDirectories(tmpRoot.resolve("in"))
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    Files.createSymbolicLink(inDir.resolve("replay-0.parquet"), src)
    Files.createSymbolicLink(inDir.resolve("replay-1.parquet"), src)
    val stream = spark.readStream
      .schema(batchSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpRoot.resolve("ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // bucket count sized to the replay corpus (file/dir overhead per
        // upsert is O(buckets)); a production archive picks a count
        // matching its key volume — the knob ArchiveSink exposes
        ArchiveSink.upsert(batch, archiveDir,
          keys = Seq("event_id"), version = "ts", numBuckets = 16)
      }
      .start()
    q.awaitTermination()
    // Same ns→timestamp normalization as the batch path.
    val raw = ArchiveSink.read(spark, archiveDir)
    raw.schema.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case None    => raw
    }
  }
}
