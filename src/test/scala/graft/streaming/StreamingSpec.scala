package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.KitState.KitEvent

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("archive upsert: last-write-wins on key, replay collapses") {
    val dir = Files.createTempDirectory("graft_test_archive_").toString + "/t"
    val b1 = Seq((1L, 10L, 1.0), (2L, 10L, 2.0)).toDF("id", "v", "x")
    val b2 = Seq((2L, 20L, 2.5), (3L, 10L, 3.0)).toDF("id", "v", "x")
    ArchiveSink.upsert(b1, dir, Seq("id"), "v")
    ArchiveSink.upsert(b2, dir, Seq("id"), "v")
    ArchiveSink.upsert(b2, dir, Seq("id"), "v") // exact replay: no change
    val out = ArchiveSink.read(spark, dir).select("id", "v", "x").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 10L, 1.0), (2L, 20L, 2.5), (3L, 10L, 3.0)))
  }

  test("archive upsert: incoming batch wins version ties") {
    val dir = Files.createTempDirectory("graft_test_archive2_").toString + "/t"
    ArchiveSink.upsert(Seq((1L, 10L, 1.0)).toDF("id", "v", "x"), dir, Seq("id"), "v")
    ArchiveSink.upsert(Seq((1L, 10L, 9.9)).toDF("id", "v", "x"), dir, Seq("id"), "v")
    assert(ArchiveSink.read(spark, dir).select("id", "v", "x").head().getDouble(2) == 9.9)
  }

  test("archive upsert rewrites ONLY the partitions the batch touches") {
    import java.nio.file.{Files => JFiles, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_test_archive3_").toString + "/t"
    val b1 = (0 until 200).map(i => (i.toLong, 10L, i * 1.0)).toDF("id", "v", "x")
    ArchiveSink.upsert(b1, dir, Seq("id"), "v")

    def checksums: Map[String, String] = {
      val root = Paths.get(dir)
      val s = JFiles.walk(root)
      try s.iterator().asScala
        .filter(p => JFiles.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          val md = java.security.MessageDigest.getInstance("MD5")
          root.relativize(p).toString ->
            md.digest(JFiles.readAllBytes(p)).map("%02x".format(_)).mkString
        }.toMap
      finally s.close()
    }
    val before = checksums
    assert(before.size > 1, "expected a multi-partition archive")

    // one-key batch → exactly one bucket may change
    ArchiveSink.upsert(Seq((5L, 20L, 99.0)).toDF("id", "v", "x"), dir, Seq("id"), "v")
    val after = checksums
    val touchedBucket = spark.range(1).select(
      pmod(xxhash64(lit(5L)), lit(64)).cast("int")).head.getInt(0)

    // every file outside the touched bucket is byte-identical (same path,
    // same md5), and something inside the touched bucket did change
    val untouched = before.filterNot(
      _._1.startsWith(s"${ArchiveSink.PartCol}=$touchedBucket/"))
    untouched.foreach { case (p, sum) => assert(after.get(p).contains(sum),
      s"untouched partition file $p was rewritten") }
    assert(before != after, "the touched bucket should have been rewritten")

    // and the merge semantics held
    val out = ArchiveSink.read(spark, dir).where(col("id") === 5L)
      .select("v", "x").head()
    assert(out.getLong(0) == 20L && out.getDouble(1) == 99.0)
    assert(ArchiveSink.read(spark, dir).count() == 200)
  }

  test("archive upsert refuses a partitioned dir with no bucket marker") {
    val dir = Files.createTempDirectory("graft_test_archive5_").toString + "/t"
    ArchiveSink.upsert(Seq((1L, 10L, 1.0)).toDF("id", "v", "x"), dir, Seq("id"), "v")
    // simulate a pre-marker archive: partitions present, marker gone
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_graft_buckets"))
    val e = intercept[IllegalStateException] {
      ArchiveSink.upsert(Seq((2L, 10L, 2.0)).toDF("id", "v", "x"), dir, Seq("id"), "v")
    }
    assert(e.getMessage.contains("no _graft_buckets marker"))
  }

  test("archive upsert refuses a legacy flat (unpartitioned) archive dir") {
    val dir = Files.createTempDirectory("graft_test_archive6_").toString + "/t"
    // a plain parquet dir written by a pre-partitioned sink
    Seq((1L, 10L, 1.0)).toDF("id", "v", "x").write.parquet(dir)
    val e = intercept[IllegalStateException] {
      ArchiveSink.upsert(Seq((2L, 10L, 2.0)).toDF("id", "v", "x"), dir, Seq("id"), "v")
    }
    assert(e.getMessage.contains("flat"))
  }

  test("archive upsert recovers a bucket parked by a crashed swap") {
    import java.nio.file.{Files => JFiles, Paths}
    val dir = Files.createTempDirectory("graft_test_archive7_").toString + "/t"
    val b1 = (0 until 200).map(i => (i.toLong, 10L, i * 1.0)).toDF("id", "v", "x")
    ArchiveSink.upsert(b1, dir, Seq("id"), "v")
    // Simulate the crash window: one bucket was parked in `.bak` (old
    // rows) and the process died before the new dir was renamed in.
    val bucket = spark.range(1).select(
      pmod(xxhash64(lit(5L)), lit(64)).cast("int")).head.getInt(0)
    val live = Paths.get(dir, s"${ArchiveSink.PartCol}=$bucket")
    val bak = Paths.get(dir + ".bak", s"${ArchiveSink.PartCol}=$bucket")
    JFiles.createDirectories(bak.getParent)
    JFiles.move(live, bak)
    // Next upsert must first restore the parked bucket, then merge.
    ArchiveSink.upsert(Seq((5L, 20L, 99.0)).toDF("id", "v", "x"), dir, Seq("id"), "v")
    val rows = ArchiveSink.read(spark, dir)
    assert(rows.count() == 200, "no rows lost across the crash window")
    assert(rows.where(col("id") === 5L).head().getAs[Double]("x") == 99.0)
    assert(!JFiles.exists(Paths.get(dir + ".bak")), "parking dir cleaned up")
  }

  test("archive upsert: injected crash between park and replace, then replay converges") {
    import java.nio.file.{Files => JFiles, Paths}
    val dir = Files.createTempDirectory("graft_test_archive8_").toString + "/t"
    val b1 = (0 until 200).map(i => (i.toLong, 10L, i * 1.0)).toDF("id", "v", "x")
    ArchiveSink.upsert(b1, dir, Seq("id"), "v")
    // the REAL crash: the process dies inside the swap loop, after the
    // first touched bucket's old dir is parked and before its replacement
    // is renamed in — the destructive window a delete-before-replace
    // sink would lose rows in
    val b2 = Seq((5L, 20L, 99.0), (6L, 20L, 98.0)).toDF("id", "v", "x")
    ArchiveSink.testCrashAfterPark = 0
    try intercept[java.io.IOException] {
      ArchiveSink.upsert(b2, dir, Seq("id"), "v")
    } finally ArchiveSink.testCrashAfterPark = -1
    assert(JFiles.exists(Paths.get(dir + ".bak")),
      "crashed mid-swap: old bucket parked in .bak")
    // the stream restarts and replays the batch (checkpoint semantics):
    // recovery must restore the parked bucket before merging
    ArchiveSink.upsert(b2, dir, Seq("id"), "v")
    val rows = ArchiveSink.read(spark, dir)
    assert(rows.count() == 200, "no rows lost across the injected crash")
    assert(rows.where(col("id") === 5L).head().getAs[Double]("x") == 99.0)
    assert(rows.where(col("id") === 6L).head().getAs[Double]("x") == 98.0)
    assert(rows.where(col("id") === 7L).head().getAs[Double]("x") == 7.0,
      "untouched key in the crashed bucket keeps its pre-crash row")
    assert(!JFiles.exists(Paths.get(dir + ".bak")), "parking dir cleaned up")
  }

  test("archive upsert: stale parked copy never clobbers a live bucket") {
    import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_test_archive9_").toString + "/t"
    val b1 = (0 until 50).map(i => (i.toLong, 10L, i * 1.0)).toDF("id", "v", "x")
    ArchiveSink.upsert(b1, dir, Seq("id"), "v")
    // crash window #2: old parked AND new renamed in, death before the
    // parking dir is dropped — .bak holds a STALE copy while live is newer
    val bucket = spark.range(1).select(
      pmod(xxhash64(lit(5L)), lit(64)).cast("int")).head.getInt(0)
    val live = Paths.get(dir, s"${ArchiveSink.PartCol}=$bucket")
    val bak = Paths.get(dir + ".bak", s"${ArchiveSink.PartCol}=$bucket")
    JFiles.createDirectories(bak)
    JFiles.list(live).forEach { f =>
      JFiles.copy(f, bak.resolve(f.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    ArchiveSink.upsert(Seq((5L, 20L, 77.0)).toDF("id", "v", "x"), dir, Seq("id"), "v")
    val rows = ArchiveSink.read(spark, dir)
    assert(rows.count() == 50)
    assert(rows.where(col("id") === 5L).head().getAs[Double]("x") == 77.0,
      "live bucket wins over the stale parked copy")
    assert(!JFiles.exists(Paths.get(dir + ".bak")), "stale parking dir dropped")
  }

  test("archive upsert: bucket count is creation-time only (layout stability)") {
    val dir = Files.createTempDirectory("graft_test_archive4_").toString + "/t"
    val keys = (0 until 50).map(i => (i.toLong, 10L, i * 1.0))
    ArchiveSink.upsert(keys.toDF("id", "v", "x"), dir, Seq("id"), "v", numBuckets = 64)
    // a later caller passing a DIFFERENT bucket count must not fork the
    // layout: the stored count wins, keys stay unique
    ArchiveSink.upsert(Seq((5L, 20L, 99.0)).toDF("id", "v", "x"), dir,
      Seq("id"), "v", numBuckets = 8)
    val rows = ArchiveSink.read(spark, dir)
    assert(rows.count() == 50, "no duplicate keys after mismatched numBuckets")
    assert(rows.where(col("id") === 5L).head().getAs[Long]("v") == 20L)
  }

  test("kit state machine: throttle, static run, geofence (batch mode)") {
    // kit A: 100 s cadence < rate 480 → throttled after first interval.
    val a = (0 until 5).map(i => KitEvent("A", 1000L + i * 100, i.toDouble, "u1hxyz00"))
    // kit B: slow cadence, stuck value from event 3 on, moves location.
    val b = Seq(
      KitEvent("B", 1000L, 5.0, "u1hxyz00"),
      KitEvent("B", 2000L, 5.1, "u1hxyz00"),
      KitEvent("B", 3000L, 7.0, "u1hxyz00"),
      KitEvent("B", 4000L, 7.0, "u1hxyz00"),
      KitEvent("B", 5000L, 7.0, "u1hwxyz0"))
    val ds = (a ++ b).toDS()
    val out = KitState(ds.groupByKey(_.kit), rateS = 480L,
        staticThreshold = 3, geoPrefix = 6)
      .collect().groupBy(_.kit)

    val outA = out("A").sortBy(_.ts)
    assert(outA.head.accepted) // first telegram always accepted
    assert(outA.drop(1).forall(o => !o.accepted && o.reason == "throttle"))

    val outB = out("B").sortBy(_.ts)
    assert(outB.take(4).forall(_.accepted))
    val last = outB.last
    assert(!last.accepted && last.reason == "static" && last.staticRun == 3)
    assert(last.moved && outB.take(4).forall(!_.moved))
  }

  test("kit state machine runs as a real stream with identical output") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KitEvent]
    // ttl left off here: ProcessingTimeTimeout keeps scheduling timeout
    // batches, so processAllAvailable never settles in a test harness;
    // the TTL code path is covered by the GroupState-double test below.
    val q = KitState(mem.toDS().groupByKey(_.kit), rateS = 480L,
        staticThreshold = 3, geoPrefix = 6)
      .writeStream.format("memory").queryName("kit_out")
      .outputMode("append").start()
    mem.addData(KitEvent("A", 1000L, 1.0, "u1hxyz00"),
      KitEvent("A", 1100L, 2.0, "u1hxyz00"))
    q.processAllAvailable()
    mem.addData(KitEvent("A", 1200L, 3.0, "u1hxyz00"))
    q.processAllAvailable()
    val rows = spark.table("kit_out").as[KitState.Output]
      .collect().sortBy(_.ts)
    q.stop()
    assert(rows.length == 3)
    assert(rows.head.accepted)
    // 100 s cadence < 480 s rate: throttled from the 2nd telegram on,
    // state carried across micro-batches.
    assert(rows.drop(1).forall(o => !o.accepted && o.reason == "throttle"))
  }

  test("kit TTL: timed-out state is removed, next telegram re-registers") {
    import org.apache.spark.sql.streaming.{GroupState, TestGroupState}
    // expired invocation: no events, hasTimedOut = true
    import org.apache.spark.api.java.Optional
    val expired = TestGroupState.create[KitState.State](
      optionalState = Optional.of(
        KitState.State(5L, 1000L, 600.0, 0L, 1, 4.2, "u1hxyz00", moved = false)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = true)
    val out = KitState.update(480L, 3, 6, 1000L)("A", Iterator.empty, expired)
    assert(out.isEmpty && expired.isRemoved)
    // fresh telegram after expiry: state re-registered with timeout armed
    val fresh = TestGroupState.create[KitState.State](
      optionalState = Optional.empty[KitState.State](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val out2 = KitState.update(480L, 3, 6, 1000L)("A",
      Iterator(KitEvent("A", 2000L, 1.0, "u1hxyz00")), fresh).toSeq
    assert(out2.length == 1 && out2.head.accepted)
    // state saved and the TTL timer armed (duration -> timestamp)
    assert(fresh.isUpdated && fresh.getTimeoutTimestampMs.isPresent)
  }

  test("event-time window aggregation with watermark drops late data") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = new Timestamp(3600000L * 24 * 19000 + min * 60000L)
    val mem = MemoryStream[(Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    // batch 1: two on-time events in [00,10) + one at 25 that will push
    // the watermark to 15 and close the first window.
    mem.addData((ts(0), 1.0), (ts(5), 2.0), (ts(25), 4.0))
    q.processAllAvailable()
    // batch 2: a LATE event for the closed [00,10) window — must be
    // dropped, not resurrect the window.
    mem.addData((ts(2), 100.0), (ts(45), 8.0))
    q.processAllAvailable()
    mem.addData((ts(70), 16.0)) // advance watermark, flush [40,50)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_out")
      .select(col("window.start").cast("long").as("w"), col("s"), col("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val w0 = 3600L * 24 * 19000
    assert(out(w0) == (3.0, 2L), s"late event leaked into closed window: $out")
    assert(out(w0 + 40 * 60) == (8.0, 1L))
  }

  test("stream-static dimension join enriches each micro-batch (J2)") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("A", "proj1", true), ("B", "proj2", false))
      .toDF("kit", "project", "active") // the Sensors/TTNtable snapshot
    val mem = MemoryStream[KitEvent]
    val enriched = mem.toDS().toDF()
      .join(broadcast(dim), Seq("kit"), "left")
      .where(col("active")) // unregistered/inactive kits drop (ref :1694-1700)
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    mem.addData(KitEvent("A", 1000L, 1.0, "u1"), KitEvent("B", 1000L, 2.0, "u1"),
      KitEvent("C", 1000L, 3.0, "u1"))
    q.processAllAvailable()
    val rows = spark.table("enrich_out").collect()
    q.stop()
    // only the active registered kit survives, carrying its metadata
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("kit") == "A" &&
      rows.head.getAs[String]("project") == "proj1")
  }

  test("field-name synonym translation (P1)") {
    import graft.ingest.LoRaPipeline
    val out = Seq("PM2.5", "temperature", "hum", "pm25", "weird_field")
      .toDF("f")
      .select(LoRaPipeline.normalizeFieldName(col("f")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("pm25", "temp", "rv", "pm25", "weird_field"))
  }

  test("multimodal decode: undecodable blobs yield error rows, not failures") {
    import graft.operators.Multimodal
    // typed mapPartitions shape with the REAL decoder: one valid PNG, one
    // garbage blob, one recognized-but-truncated PNG — the job survives
    // and marks the bad rows with negative dims (tolerate-and-log)
    val png = Multimodal.syntheticPng(5L)
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", png),
      Multimodal.MediaRecord(2L, "image/png", Array[Byte](1, 2, 3, 4)),
      Multimodal.MediaRecord(3L, "image/png", png.take(24))
    ).toDS()
    val dec = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(dec.length == 3)
    assert(dec(0).width == 8 + 5 && dec(0).height == 8 + (5 * 7) % 9)
    assert(dec(1).width == -1 && dec(2).width == -1)
    // determinism (toString: NaN == NaN must not fail the compare)
    val again = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(dec.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("multimodal REAL decode: javax.imageio round-trips generated PNGs") {
    import graft.operators.Multimodal
    // Engine path: real PNG encode -> real ImageIO decode.
    val ids = spark.range(0, 40).toDF("doc_id")
    val dec = Multimodal.decodeImages(
        Multimodal.syntheticPngTable(ids, col("doc_id")))
      .collect().sortBy(_.media_id)
    assert(dec.length == 40)
    dec.foreach { d =>
      val id = d.media_id
      // decoded dims equal the generation rule (the PNG header is real)
      assert(d.width == 8 + (id % 9).toInt && d.height == 8 + ((id * 7) % 9).toInt)
      // decoded mean luminance equals the closed-form mean of the rule
      val expected = (for (y <- 0 until d.height; x <- 0 until d.width)
        yield ((id + 3L * x + 5L * y) % 256).toDouble).sum / (d.width * d.height)
      assert(math.abs(d.brightness - expected) < 1e-9,
        s"id=$id brightness ${d.brightness} != $expected")
      assert(d.n_frames == 1)
    }
    // an undecodable blob yields an error-marker row, not a crash
    val bad = Seq(Multimodal.MediaRecord(99L, "image/png",
      Array[Byte](1, 2, 3))).toDS()
    val b = Multimodal.decodeImages(bad).collect().head
    assert(b.width == -1 && b.brightness.isNaN)
    // recognized-but-corrupt: valid PNG magic, truncated body — the PNG
    // reader THROWS (ImageIO.read only returns null when no reader
    // claims the bytes); must yield the same error row, not kill the job
    val corrupt = Seq(Multimodal.MediaRecord(98L, "image/png",
      Multimodal.syntheticPng(1L).take(24))).toDS()
    val c = Multimodal.decodeImages(corrupt).collect().head
    assert(c.width == -1 && c.brightness.isNaN)
  }

  test("multimodal REAL audio decode: javax.sound round-trips generated WAVs") {
    import graft.operators.Multimodal
    // Engine path: real RIFF/WAVE encode -> real AudioSystem decode.
    val ids = spark.range(0, 40).toDF("doc_id")
    val dec = Multimodal.decodeAudio(
        Multimodal.syntheticWavTable(ids, col("doc_id")))
      .collect().sortBy(_.media_id)
    assert(dec.length == 40)
    dec.foreach { d =>
      val id = d.media_id
      val n = 64 + (id % 65).toInt
      assert(d.sample_rate == 8000 && d.n_samples == n)
      assert(d.duration_s == n.toDouble / 8000)
      // decoded samples equal the generation rule (PCM is lossless)
      val samples = (0 until n).map(i =>
        Math.floorMod(id * 31 + i * 17L, 65536L) - 32768)
      val sumSq = samples.map(s => s * s).sum
      assert(d.rms == math.sqrt(sumSq.toDouble / (n.toDouble * 32768.0 * 32768.0)))
      assert(d.peak == samples.map(math.abs).max.toDouble / 32768.0)
    }
    // a non-WAV blob yields an error-marker row, not a crash
    val bad = Seq(Multimodal.MediaRecord(99L, "audio/wav",
      Array[Byte](1, 2, 3))).toDS()
    val b = Multimodal.decodeAudio(bad).collect().head
    assert(b.sample_rate == -1 && b.rms.isNaN)
  }

  test("multimodal REAL frame sampling: animated GIF round-trip, stride decode") {
    import graft.operators.Multimodal
    val ids = spark.range(0, 40).toDF("doc_id")
    val dec = Multimodal.sampleVideoFrames(
        Multimodal.syntheticGifTable(ids, col("doc_id")), stride = 2)
      .collect().sortBy(_.media_id)
    assert(dec.length == 40)
    dec.foreach { d =>
      val id = d.media_id
      val n = 1 + (id % 7).toInt
      assert(d.n_frames == n, s"id=$id frames")
      assert(d.width == 8 + (id % 5).toInt && d.height == 8 + ((id * 3) % 5).toInt)
      assert(d.sampled_frames == (n + 1) / 2)
      // sampled-frame mean equals the closed-form rule (GIF grayscale is
      // palette-lossless)
      val vals = for (f <- 0 until n by 2; y <- 0 until d.height;
                      x <- 0 until d.width)
        yield Math.floorMod(id + 11L * f + 3L * x + 5L * y, 256L).toDouble
      assert(math.abs(d.sampled_brightness - vals.sum / vals.size) < 1e-9,
        s"id=$id brightness")
    }
    // a non-GIF blob yields an error-marker row, not a crash
    val bad = Seq(Multimodal.MediaRecord(99L, "image/gif",
      Array[Byte](1, 2, 3))).toDS()
    val b = Multimodal.sampleVideoFrames(bad, 2).collect().head
    assert(b.width == -1 && b.n_frames == 0)
  }

  test("q101 session replay exercises every fate (W5 streaming)") {
    // The q101 oracle would pass vacuously if a planted family stopped
    // exercising its fate. Assert at sf0.01: cross-batch merge (every
    // merge-family key's seed+anchor fuse into ONE n=2 session), late
    // backward extension (every ext-family session starts at the
    // EXTENDER's ts, not the anchor's), hard-late rows exist and are
    // dropped, far-future watermark-driver keys never emit.
    val sf = "/root/testdata/sf0.01"
    val out = Replay.replaySessionWindows(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ev = graft.Tables.events(spark, sf).select(col("event_id"),
      col("user_id"), unix_timestamp(col("ts")).as("t"))
    val b = ev.agg(max(col("t")),
      max(when(col("event_id") % 2 === 0, col("t")))).head()
    val (a, maxEven) = (b.getLong(0), b.getLong(1))
    val w1 = math.max(maxEven, a - 1700) - 600
    val kb = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    val nUsers = ev.select(col("user_id")).distinct().count()
    // merge family: one session per key, n = 2, spanning seed → anchor
    val mg = out.where(col("skey") >= kb && col("skey") < 2 * kb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(mg.count() == nUsers, "one merged session per merge-family key")
    assert(mg.where(col("n") =!= 2).isEmpty, "seed+anchor must fuse (n=2)")
    assert(mg.where(col("session_end") - col("session_start") =!= 1700 + 1800)
      .isEmpty, "merged span = seed→anchor 1700 s + gap")
    // extension family: session START moved back to the extender's ts
    val ex = out.where(col("skey") >= 2 * kb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(ex.count() == nUsers, "one extended session per ext-family key")
    assert(ex.where(col("n") =!= 2).isEmpty, "late extender must join (n=2)")
    assert(ex.where(col("session_end") - col("session_start") =!= 950 + 1800)
      .isEmpty, "extended span = extender→anchor 950 s + gap")
    // hard-late fate is non-vacuous and dropped: late odds exist, and the
    // engine's total row weight equals accepted-set size exactly
    val nLate = ev.where(col("event_id") % 2 === 1 && col("t") <= w1).count()
    assert(nLate > 0, "hard-late fate not exercised (no odd rows ≤ W1)")
    val nFresh = ev.where(col("event_id") % 2 === 1 && col("t") > w1).count()
    val nEven = ev.where(col("event_id") % 2 === 0).count()
    val weight = out.agg(sum(col("n"))).head().getLong(0)
    assert(weight == nEven + nFresh + 4 * nUsers,
      s"emitted row weight $weight must equal accepted set " +
        s"(evens $nEven + fresh $nFresh + 4×$nUsers planted) — " +
        "late rows leaked or accepted rows lost")
    assert(out.where(col("skey") < 0).isEmpty,
      "far-future watermark-driver sessions must never emit")
    Seq(out, mg, ex).foreach(_.unpersist())
  }

  test("q97 dedup-within-watermark replay exercises every fate (U1 streaming)") {
    // The q97 oracle would pass vacuously if a pairing class stopped
    // landing rows in its intended fate (the three-file first cut
    // hash-matched with ZERO re-emits — that's how the end-of-batch
    // eviction finding was caught). Assert the sf0.01 corpus covers:
    // duplicate-drop (a class-1 fresh row vanishes), expired-state
    // re-emit and no-partner emit (class-5 / class-3/7 rows present
    // beyond the evens), and late-drop (odd rows absent).
    val sf = "/root/testdata/sf0.01"
    val out = Replay.replayDedupWithinWatermark(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEven = out.where(col("event_id") % 2 === 0).count()
    val emitted5 = out.where(col("event_id") % 8 === 5).count()   // re-emit
    val emitted37 = out.where(col("event_id") % 8 === 3 ||
      col("event_id") % 8 === 7).count()                          // no partner
    val emitted1 = out.where(col("event_id") % 8 === 1).count()
    val ev = graft.Tables.events(spark, sf)
    val nOddTotal = ev.where(col("event_id") % 2 === 1).count()
    // duplicate-drop is only exercised if file 1 was non-empty: count the
    // class-1 rows fresher than W1 = max(even ts) − 41 min directly.
    val maxEven = ev.where(col("event_id") % 2 === 0)
      .agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0)
    val w1 = java.sql.Timestamp.from(maxEven.toInstant.minusSeconds(41 * 60L))
    val nF1 = ev.where(col("event_id") % 8 === 1 &&
      col("ts").cast("timestamp") > lit(w1)).count()
    out.unpersist()
    val nEvenCorpus = ev.where(col("event_id") % 2 === 0).count()
    assert(nEven == nEvenCorpus,
      s"every even row must emit: corpus has $nEvenCorpus, got $nEven")
    assert(emitted5 > 0, "expired-state re-emit fate not exercised")
    assert(emitted37 > 0, "no-partner emit fate not exercised")
    assert(nF1 > 0 && emitted1 == 0,
      s"duplicate-drop fate: $nF1 fresh class-1 rows must ALL drop, $emitted1 emitted")
    assert(emitted5 + emitted37 < nOddTotal,
      "late-drop fate not exercised (all odd rows emitted)")
  }
}
