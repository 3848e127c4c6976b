package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** S3 live MySQL-wire leg (r13 — the S1/K6/HTTP closure pattern): a
  * dev-grade in-process server and client speak real MySQL client/server
  * protocol packets over TCP (HandshakeV10 → HandshakeResponse41 → OK,
  * COM_QUERY → column defs → text rows → EOF), and the range-partitioned
  * scan pulls the archive rows exactly the way `spark.read.jdbc`'s
  * partitioned read would — one connection and one range query per
  * Spark partition. The pulled frame must equal the direct frame and
  * the archive-model semantics must compose on it unchanged. */
class MySqlWireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("S3 live wire scan: handshake + 4 partitioned COM_QUERYs " +
      "reassemble the archive rows exactly; NULL cells survive") {
    // archive-shaped rows from events, with a planted NULL column
    val src = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") < 300)
      .select(col("event_id").cast("long").as("id"),
        concat(lit("d"), col("user_id")).as("serial"),
        col("event_type").as("field"),
        when(col("event_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("value").cast("string")).as("value"))
    val direct = src.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3))))
    val rows = direct.map { case (id, s, f, v) =>
      Seq(id.toString, s, f, v.orNull)
    }.toSeq
    val columns = Seq("id", "serial", "field", "value")
    val maxId = direct.map(_._1).max

    val server = new MySqlWire.Server("measurements", columns, rows, "id")
    try {
      val pulled = MySqlWire.scanPartitioned(spark, server.host, server.port,
        "measurements", columns, "id", lower = 0,
        upperExclusive = maxId + 1, numPartitions = 4)
      val got = pulled.collect()
        .map(r => (r.getString(0).toLong, r.getString(1), r.getString(2),
          Option(r.getString(3))))
      assert(got.sorted.toSeq === direct.sorted.toSeq,
        "wire-pulled rows differ from the direct frame")
      // the wire really carried 4 range scans (the JDBC partition shape)
      val served = server.drain()
      assert(served.size == 4, s"expected 4 range queries, saw $served")
      assert(served.forall(s => s.user == "graft" &&
        s.query.matches(
          "SELECT \\* FROM measurements WHERE id >= -?\\d+ AND id < -?\\d+")))
      // archive-model semantics compose on the pulled frame: per-serial
      // valid-value count equals the direct computation (q50's model is
      // the oracle-checked part; the wire is a transport)
      val viaWire = pulled
        .where(col("value").isNotNull)
        .groupBy(col("serial")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val directAgg = src.where(col("value").isNotNull)
        .groupBy(col("serial")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(viaWire === directAgg)
    } finally server.close()
  }

  test("MySQL wire codec: length-encoded integers round-trip at the " +
      "format boundaries; unknown query gets a readable ERR") {
    // lenc boundaries per the protocol: 1-byte < 251, 2-byte < 2^16,
    // 3-byte < 2^24, 8-byte beyond
    assert(MySqlWire.lencInt(0).toSeq === Seq(0.toByte))
    assert(MySqlWire.lencInt(250).toSeq === Seq(250.toByte))
    assert(MySqlWire.lencInt(251)(0) === 0xfc.toByte)
    assert(MySqlWire.lencInt(65535).length === 3)
    assert(MySqlWire.lencInt(65536)(0) === 0xfd.toByte)
    assert(MySqlWire.lencInt(16777215).length === 4)
    assert(MySqlWire.lencInt(16777216)(0) === 0xfe.toByte)
    assert(MySqlWire.lencInt(16777216).length === 9)

    val server = new MySqlWire.Server("t", Seq("a"), Seq(Seq("1")), "a")
    try {
      val c = new MySqlWire.Client(server.host, server.port)
      try {
        val e = intercept[Exception] { c.query("DROP TABLE t") }
        assert(e.getMessage.contains("unknown query"))
        // the connection survives an ERR and answers the next query
        val (cols, rows) = c.query("SELECT * FROM t")
        assert(cols === Seq("a") && rows === Seq(Seq("1")))
      } finally c.close()
    } finally server.close()
  }
}
