package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.Forwarding._

class ForwardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("error budget: success resets, >20 trips a 5-min cool-down, resumes after") {
    var now = 1000L
    val b = new ChannelBudget("influx", () => now)
    // 20 failures: still offering (threshold is strict >20)
    (1 to 20).foreach(_ => { assert(b.offer()); b.fail() })
    assert(b.offer()) // attempt 21 allowed…
    b.fail()          // …fails → errors = 21 > 20 → cool-down armed
    assert(!b.offer(), "must skip during cool-down") // counts as error 22
    now += CooldownS - 1
    assert(!b.offer()) // error 23
    now += 2 // past the cool-down
    assert(b.offer(), "cool-down elapsed → attempts resume")
    b.ok()
    assert(b.errorCount == 0 && b.offer(), "success resets the budget")
  }

  test("error budget: >40 errors disables the channel and fires the notice once") {
    var now = 1000L
    var notices = List.empty[String]
    val b = new ChannelBudget("community", () => now, n => notices ::= n)
    (1 to 21).foreach(_ => b.fail())
    while (!b.disabled) { now += CooldownS + 1; if (b.offer()) b.fail() }
    assert(notices == List("community"), "disable notice exactly once")
    assert(!b.offer(), "disabled channel never offers")
    now += 100 * CooldownS
    assert(!b.offer(), "disabled is permanent (reference sets output=False)")
  }

  test("forwardBatch fans out under the budget; a dead channel stops sending") {
    var now = 0L
    val sentA = collection.mutable.Buffer[String]()
    val a = new ChannelBudget("ok-chan", () => now)
    val dead = new ChannelBudget("dead-chan", () => now)
    val rows = (1 to 50).map(i => s"r$i")
    val out = forwardBatch(rows, Seq(
      (a, r => { sentA += r; () }),
      (dead, _ => throw new RuntimeException("sink down"))))
    assert(out("ok-chan") == 50L && sentA.size == 50)
    assert(out("dead-chan") == 0L)
    // 50 attempts: 21 real failures, then cool-down skips — each skip
    // counts as an error too (reference :2205), so a persistently-dead
    // channel crosses the 40 threshold and ends the batch disabled.
    assert(dead.errorCount > DisableThreshold && dead.disabled)
  }

  test("notice throttle: at most one notice per kit per 4 h, per-kit state") {
    val t0 = 1700000000L
    val notices = Seq(
      Notice("A", t0, "dead"), Notice("A", t0 + 3600, "dead again"),
      Notice("A", t0 + 5 * 3600, "back"), Notice("B", t0 + 3600, "other kit"))
    val out = throttleNotices(notices.toDS().groupByKey(_.kit))
      .collect().map(o => (o.kit, o.ts) -> o.sent).toMap
    assert(out(("A", t0)))
    assert(!out(("A", t0 + 3600)), "suppressed inside the 4-h window")
    assert(out(("A", t0 + 5 * 3600)), "window elapsed → delivered")
    assert(out(("B", t0 + 3600)), "throttle is per kit")
  }

  test("notice throttle holds state across micro-batches in a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    val mem = MemoryStream[Notice]
    val q = throttleNotices(mem.toDS().groupByKey(_.kit))
      .writeStream.format("memory").queryName("notice_out")
      .outputMode("append").start()
    mem.addData(Notice("A", t0, "first"))
    q.processAllAvailable()
    mem.addData(Notice("A", t0 + 3600, "second")) // next batch, same window
    q.processAllAvailable()
    val rows = spark.table("notice_out").as[NoticeOut].collect().sortBy(_.ts)
    q.stop()
    assert(rows.length == 2 && rows(0).sent && !rows(1).sent)
  }

  test("channelGate: anchored regex on project_serial; no filter passes all (P9)") {
    val df = Seq(("SAN", "b4e62df4b311"), ("HadM", "30aea44505c8"),
      ("SAN2", "deadbeef0000")).toDF("project", "serial")
    def kits(p: Option[String]) =
      df.where(channelGate(col("project"), col("serial"), p))
        .select("project").as[String].collect().toSet
    assert(kits(Some("SAN_.*")) == Set("SAN"), "re.match anchors at start: SAN2 must not match")
    assert(kits(Some("(SAN|HadM)_")) == Set("SAN", "HadM"))
    assert(kits(None) == Set("SAN", "HadM", "SAN2"))
    assert(kits(Some("")) == Set("SAN", "HadM", "SAN2"))
  }

  test("monitor row printf edges: %4.d zero/wide, %-92.91s truncation (K4)") {
    val df = Seq(
      // (id, sensors, count, interval)
      (1L, "temp", 0, 90),        // %4.d of 0 → four spaces, no digit
      (2L, "temp", 12345, 30),    // wider than 4 → NO truncation
      (3L, "a,b,c,d,e,f,g,h,i,j,k,l,m,n,o,p,q,r,s,t,u,v,w,x,y,z," +
        "a2,b2,c2,d2,e2,f2,g2,h2", 7, 3601), // inner > 91 chars; iv > 1h
      (4L, "", 42, 3600)          // meta/event arm; iv == 1h boundary kept
    ).toDF("id", "sensors", "cnt", "iv")
    val ts = to_timestamp(lit("2024-03-01 10:20:00"))
    val out = df.select(col("id"), monitorLine(ts, lit("TTN/kitX"),
        lit("SAN_dX"), col("sensors"), lit(true),
        lit(null).cast("string"), lit(2), col("cnt"), col("iv")).as("m"))
      .select(col("id"), col("m.line"), col("m.color"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val head = "2024-03-01 10:20 TTN/kitX (SAN_dX[temp]) #gtws: 2"
    assert(out(1L)._1 == head.padTo(92, ' ') + " #     at 1m30s",
      s"zero count must render NO digit: '${out(1L)._1}'")
    assert(out(2L)._1 == head.padTo(92, ' ') + " #12345 at 0m30s",
      s"wide count must not truncate: '${out(2L)._1}'")
    val l3 = out(3L)._1
    assert(l3.length == 92 + 2 + 4 && l3.substring(0, 92).length == 92 &&
      !l3.contains(" at "), s"truncate-to-91-pad-to-92, no suffix past 1h: '$l3'")
    assert(l3.startsWith("2024-03-01 10:20 TTN/kitX (SAN_dX[a,b,c,"))
    assert(out(4L)._1.contains(" meta/event info") &&
      out(4L)._1.endsWith(" #  42 at 60m0s"))
    assert(out(1L)._2 == MonitorBlue && out(4L)._2 == MonitorLBlue)
  }

  test("console sink wiring runs a micro-batch (K4)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Notice]
    val q = mem.toDS().writeStream.format("console")
      .outputMode("append").start()
    mem.addData(Notice("A", 1L, "hello console"))
    q.processAllAvailable()
    val progressed = q.recentProgress.exists(_.numInputRows > 0)
    q.stop()
    assert(progressed, "console sink must consume the micro-batch")
  }

  test("uniqAddress dedups on the normalized email, first occurrence wins") {
    val out = Seq(Seq(" Jan <j@x.nl> ", "j@x.nl", "K <k@y.nl>", "Jan2 <J@x.nl>", "k@y.nl "))
      .toDF("to").select(uniqAddress(col("to")).as("u"))
      .head().getSeq[String](0)
    // J@x.nl vs j@x.nl: the reference compares case-sensitively — both kept?
    // No: reference `email()` does not lowercase, so 'J@x.nl' != 'j@x.nl'.
    assert(out == Seq("Jan <j@x.nl>", "K <k@y.nl>", "Jan2 <J@x.nl>"))
  }

  test("influx line protocol: golden lines (K5, MyINFLUXPUB Influx_write shape)") {
    val df = Seq(
      // plain data row: tags + numeric fields
      ("data", "SAN", "b4e62df4", "Vredepeel", Some(12.5), Some(31.25), Some(1234567890L), None: Option[String]),
      // escaping: tag value with space+comma, string field with quote+backslash
      ("data", "Had M", "30aea4", "Horst, aan", Some(8.0), None, Some(1234567891L), Some("rain \"wet\" c:\\x")),
      // null numeric fields skipped; string field only
      ("info", "SAN", "deadbeef", null, None, None, Some(1234567892L), Some("new kit")),
      // NO fields at all -> no telegram (null line)
      ("data", "SAN", "cafe", "Lbl", None, None, None, None)
    ).toDF("mtype", "project", "serial", "label", "pm25", "pm10", "time", "note")

    val lines = df.select(influxLine(df, col("mtype"),
      tags = Seq("project" -> col("project"), "serial" -> col("serial"),
                 "label" -> col("label")),
      fields = Seq("pm25" -> col("pm25"), "pm10" -> col("pm10"),
                   "time" -> col("time"), "note" -> col("note"))).as("line"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))

    assert(lines(0) ==
      "data,project=SAN,serial=b4e62df4,label=Vredepeel pm25=12.5,pm10=31.25,time=1234567890")
    assert(lines(1) ==
      "data,project=Had\\ M,serial=30aea4,label=Horst\\,\\ aan " +
        "pm25=8.0,time=1234567891,note=\"rain \\\"wet\\\" c:\\\\x\"")
    // null tag (label) skipped, like null fields
    assert(lines(2) == "info,project=SAN,serial=deadbeef time=1234567892,note=\"new kit\"")
    assert(lines(3) == null, "a row with no fields emits no telegram")

    // optional trailing epoch-seconds timestamp (precision=s)
    val ts = df.limit(1).select(influxLine(df, col("mtype"),
      Seq("project" -> col("project")), Seq("pm25" -> col("pm25")),
      timeSec = Some(lit(1700000000L)))).head.getString(0)
    assert(ts == "data,project=SAN pm25=12.5 1700000000")

    // the formatter feeds the budgeted forwarding channel unchanged
    val sent = scala.collection.mutable.ArrayBuffer[String]()
    val budget = new ChannelBudget("influx", () => 0L)
    val stats = forwardBatch(lines.filter(_ != null).toSeq,
      Seq((budget, (l: String) => { sent += l; () })))
    assert(stats("influx") == 3L && sent.size == 3)
  }

  test("influx line protocol: measurement '=' kept, null time falls back") {
    val df = Seq(("a=b", Some(1.5), Some(7L)), ("a=b", Some(2.5), None))
      .toDF("mtype", "pm25", "t")
    val lines = df.select(influxLine(df, col("mtype"),
        tags = Nil, fields = Seq("pm25" -> col("pm25")),
        timeSec = Some(col("t"))).as("line"))
      .collect().map(_.getString(0)).sorted
    // '=' is NOT special in the measurement position — no backslash
    assert(lines(0) == "a=b pm25=1.5 7")
    // a null timestamp must not null the telegram: timestamp-less line
    // (server-assigned time), never a dropped record
    assert(lines(1) == "a=b pm25=2.5")
  }

  test("republish telegram: topic base/project/serial, nulls KEPT (K6)") {
    val df = Seq(("SAN", "d7", 6.55, Some(42L)), ("SAN", "d8", 1.5, None))
      .toDF("project", "serial", "temp", "rv")
    val out = df.select(republish("IoS", col("project"), col("serial"),
      struct(col("project"), col("serial")),
      struct(col("temp"), col("rv"))).as("o"))
      .select(col("o.topic"), col("o.telegram"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0) == ("IoS/SAN/d7",
      """{"metadata":{"project":"SAN","serial":"d7"},"data":{"temp":6.55,"rv":42}}"""))
    // the reference emits None for declared-but-missing fields — the
    // JSON must carry null, not drop the key (MyMQTTPUB.py:199-203)
    assert(out(1) == ("IoS/SAN/d8",
      """{"metadata":{"project":"SAN","serial":"d8"},"data":{"temp":1.5,"rv":null}}"""))
  }
}
