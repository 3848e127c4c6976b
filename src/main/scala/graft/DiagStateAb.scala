package graft

import org.apache.spark.sql.SparkSession

/** Dev-only (r14): interleaved same-JVM A/B of the stateful-replay
  * state-partition derivation (VERDICT r13 item 5 — the driver's q94
  * row regressed 0.68× while the builder's A/B said 0.81–1.15×; this
  * is the paired re-measure). Times the DECLARED query fn through the
  * same noop sink Bench uses, alternating the volume-derived count
  * (auto; sf0.1 → 4) with a forced override per round:
  *
  *   runMain graft.DiagStateAb <sfDir> [query] [reps] [forcedParts] [prop]
  *
  * `prop` defaults to graft.state.parts; pass graft.archive.buckets to
  * A/B the q36 archive bucket derivation instead.
  * Session confs mirror Bench so the numbers are comparable. */
object DiagStateAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val query = args.lift(1).getOrElse("q94_watermark_agg")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val forced = args.lift(3).getOrElse("32")
    val prop = args.lift(4).getOrElse("graft.state.parts")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(query)
    def leg(parts: Option[String]): Double = {
      parts match {
        case Some(p) => sys.props(prop) = p
        case None    => sys.props.remove(prop)
      }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    leg(None) // warmup: codegen + state-store classes outside the timings
    val ts = (1 to reps).map { i =>
      val a = leg(None); val b = leg(Some(forced))
      println(f"AB round $i: auto $a%8.2f s  forced($forced) $b%8.2f s")
      (a, b)
    }
    sys.props.remove(prop)
    println(f"AB MIN $query auto ${ts.map(_._1).min}%8.2f s  " +
      f"forced($forced) ${ts.map(_._2).min}%8.2f s")
    spark.stop()
  }
}
