package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: per-batch watermark trace for the q101 session replay. */
object DiagSess {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[diag] batch=${p.batchId} rows=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} maxT=${p.eventTime.get("max")} sink=${p.sink.numOutputRows}")
      }
    })
    val out = graft.streaming.Replay.replaySessionWindows(spark, sfDir)
    println(s"[diag] output rows = ${out.count()}")
    Thread.sleep(2000)
    spark.stop()
  }
}
