package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: count micro-batches + watermark progression of the q94
  * replay (is maxFilesPerTrigger honored under AvailableNow?). */
object DiagWm {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        seen.add(s"batch=${e.progress.batchId} rows=${e.progress.numInputRows} wm=${e.progress.eventTime.get("watermark")}")
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val out = graft.streaming.Replay.replayWatermarkAgg(spark, sfDir)
    println("out rows: " + out.count())
    Thread.sleep(2000)
    seen.forEach(s => println("PROGRESS " + s))
    spark.stop()
  }
}
