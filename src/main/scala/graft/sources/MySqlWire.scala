package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.LinkedBlockingQueue

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** In-sandbox MySQL wire leg — SURVEY §2.1 S3 (reference:
  * `scripts/MyDB.py:282-324` / `statistics/MyRegression.py:279-295`, the
  * MySQL archive scan every reference stats job starts from). The
  * sandbox carries no JDBC driver jar and no egress, so — like the MQTT
  * (S1/K6) and HTTP (K2/K5/S4) legs — the live leg is proven with a
  * REAL protocol round trip: a minimal in-process server + client
  * speaking actual MySQL client/server protocol packets over TCP
  * (HandshakeV10 greeting, HandshakeResponse41, OK/ERR/EOF packets,
  * COM_QUERY with the text resultset: column-count, column definitions,
  * length-encoded row cells — wire format per the public MySQL
  * client/server protocol documentation).
  *
  * The client side pulls RANGE-PARTITIONED scans exactly the way
  * `spark.read.jdbc(partitionColumn, lowerBound, upperBound,
  * numPartitions)` does — one connection and one
  * `WHERE col >= lo AND col < hi` query per Spark partition — so the
  * distributed shape (N parallel wire scans, no driver bottleneck) is
  * the real one. A production deploy swaps this dev-grade codec for
  * `spark.read.jdbc` + the MySQL driver jar (a format swap on `Tables`;
  * the archive MODEL itself is the oracle-checked part, q50).
  *
  * Dev/test grade on purpose: no auth check, no SSL, no prepared
  * statements; values travel as the text protocol's strings (callers
  * cast — the same stance as the S4 HTTP pull). Everything daemon
  * threads; `close()` idempotent.
  */
object MySqlWire {

  // ---- packet framing ------------------------------------------------

  private def readPacket(in: DataInputStream): (Int, Array[Byte]) = {
    val h = new Array[Byte](4)
    in.readFully(h)
    val len = (h(0) & 0xff) | ((h(1) & 0xff) << 8) | ((h(2) & 0xff) << 16)
    val body = new Array[Byte](len)
    in.readFully(body)
    (h(3) & 0xff, body)
  }

  private def writePacket(out: DataOutputStream, seq: Int,
                          payload: Array[Byte]): Unit = {
    out.write(payload.length & 0xff)
    out.write((payload.length >> 8) & 0xff)
    out.write((payload.length >> 16) & 0xff)
    out.write(seq & 0xff)
    out.write(payload)
    out.flush()
  }

  // ---- length-encoded integers / strings ------------------------------

  private[sources] def lencInt(n: Long): Array[Byte] =
    if (n < 251) Array(n.toByte)
    else if (n < 65536)
      Array(0xfc.toByte, (n & 0xff).toByte, ((n >> 8) & 0xff).toByte)
    else if (n < 16777216)
      Array(0xfd.toByte, (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
        ((n >> 16) & 0xff).toByte)
    else Array(0xfe.toByte) ++ (0 until 8).map(i => ((n >> (8 * i)) & 0xff).toByte)

  private def lencStr(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    lencInt(b.length.toLong) ++ b
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val o = new Array[Byte](parts.map(_.length).sum)
    var p = 0
    parts.foreach { a => System.arraycopy(a, 0, o, p, a.length); p += a.length }
    o
  }

  /** Cursor over one packet's bytes for the client-side parse. */
  private final class Cursor(b: Array[Byte]) {
    var pos = 0
    def u1: Int = { pos += 1; b(pos - 1) & 0xff }
    def skip(n: Int): Unit = pos += n
    def lenc: Long = u1 match {
      case 0xfb => -1L // NULL cell marker
      case 0xfc => u1 | (u1 << 8)
      case 0xfd => u1 | (u1 << 8) | (u1 << 16)
      case 0xfe => (0 until 8).map(i => (u1.toLong) << (8 * i)).sum
      case n => n.toLong
    }
    def lencString: String = {
      val n = lenc
      if (n < 0) null
      else { val s = new String(b, pos, n.toInt, UTF_8); pos += n.toInt; s }
    }
    def remaining: Boolean = pos < b.length
  }

  // ---- server ----------------------------------------------------------

  /** One query the assertion side saw. */
  final case class Served(user: String, query: String)

  /** In-process text-protocol server over ONE registered table. Answers
    * `SELECT * FROM <table>` and the JDBC-partitioning shape
    * `SELECT * FROM <table> WHERE <partCol> >= <lo> AND <partCol> < <hi>`
    * (dev-grade dispatch — the two query shapes the range-partitioned
    * scan emits). COM_QUIT closes; unknown queries get an ERR packet. */
  final class Server(table: String, columns: Seq[String],
                     rows: Seq[Seq[String]], partCol: String) {
    private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    val port: Int = server.getLocalPort
    val host: String = InetAddress.getLoopbackAddress.getHostAddress
    private val served = new LinkedBlockingQueue[Served]()
    @volatile private var open = true
    private val partIdx = columns.indexOf(partCol)
    require(partIdx >= 0, s"partCol $partCol not in $columns")

    daemon("mysql-accept") {
      while (open) {
        try {
          val sock = server.accept()
          daemon("mysql-conn")(serve(sock))
        } catch { case _: Exception => () }
      }
    }

    private def serve(sock: Socket): Unit = {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      try {
        // HandshakeV10 greeting: protocol 10, version, thread id, 8-byte
        // auth seed + filler, caps (PROTOCOL_41 | SECURE_CONNECTION),
        // charset utf8, status, 10 reserved, 13-byte seed part 2,
        // auth plugin name
        val caps = 0x0200 | 0x8000
        writePacket(out, 0, cat(
          Array(10.toByte), nulStr("5.7.0-graft"),
          le4(1), Array.fill(8)('x'.toByte), Array(0.toByte),
          le2(caps & 0xffff), Array(33.toByte), le2(2),
          le2((caps >> 16) & 0xffff), Array(21.toByte),
          new Array[Byte](10), Array.fill(12)('y'.toByte), Array(0.toByte),
          nulStr("mysql_native_password")))
        // HandshakeResponse41: caps(4), max packet(4), charset(1),
        // 23 zeros, user NUL, lenc auth response — auth ACCEPTED
        // unconditionally (dev-grade)
        val (_, resp) = readPacket(in)
        val user = {
          val c = new Cursor(resp)
          c.skip(4 + 4 + 1 + 23)
          val end = resp.indexOf(0.toByte, c.pos)
          new String(resp, c.pos, end - c.pos, UTF_8)
        }
        writePacket(out, 2, okPacket()) // auth OK
        var live = true
        while (live && open) {
          val (_, cmd) = readPacket(in)
          (cmd(0) & 0xff) match {
            case 0x01 => live = false // COM_QUIT
            case 0x03 => // COM_QUERY
              val q = new String(cmd, 1, cmd.length - 1, UTF_8).trim
              served.put(Served(user, q))
              answer(out, q)
            case 0x0e => writePacket(out, 1, okPacket()) // COM_PING
            case _ => writePacket(out, 1, errPacket("unsupported command"))
          }
        }
      } catch { case _: Exception => () } finally {
        scala.util.Try(sock.close()); ()
      }
    }

    private val Ranged =
      s"""(?i)SELECT \\* FROM $table WHERE $partCol >= (-?\\d+) AND $partCol < (-?\\d+)""".r
    private val Full = s"(?i)SELECT \\* FROM $table".r

    private def answer(out: DataOutputStream, q: String): Unit = {
      val matched = q match {
        case Ranged(lo, hi) =>
          Some(rows.filter { r =>
            val v = r(partIdx).toLong
            v >= lo.toLong && v < hi.toLong
          })
        case Full() => Some(rows)
        case _ => None
      }
      matched match {
        case None => writePacket(out, 1, errPacket(s"unknown query: $q"))
        case Some(data) =>
          var seq = 1
          def send(p: Array[Byte]): Unit = { writePacket(out, seq, p); seq += 1 }
          send(lencInt(columns.size.toLong)) // column count
          columns.foreach { c =>
            // ColumnDefinition41: def/schema/table/org_table/name/org_name,
            // fixed-length tail: filler 0x0c, charset(2), length(4),
            // type(1)=VAR_STRING, flags(2), decimals(1), filler(2)
            send(cat(lencStr("def"), lencStr(""), lencStr(table),
              lencStr(table), lencStr(c), lencStr(c),
              Array(0x0c.toByte), le2(33), le4(255),
              Array(0xfd.toByte), le2(0), Array(0.toByte), le2(0)))
          }
          send(eofPacket())
          data.foreach { r =>
            send(cat(r.map(v =>
              if (v == null) Array(0xfb.toByte) else lencStr(v)): _*))
          }
          send(eofPacket())
      }
    }

    /** Queries the server answered, in arrival order. */
    def drain(): Seq[Served] = {
      val out = scala.collection.mutable.ArrayBuffer[Served]()
      var m = served.poll()
      while (m != null) { out += m; m = served.poll() }
      out.toSeq
    }

    def close(): Unit = { open = false; scala.util.Try(server.close()); () }
  }

  private def okPacket(): Array[Byte] =
    cat(Array(0.toByte), lencInt(0), lencInt(0), le2(2), le2(0))
  private def eofPacket(): Array[Byte] =
    cat(Array(0xfe.toByte), le2(0), le2(2))
  private def errPacket(msg: String): Array[Byte] =
    cat(Array(0xff.toByte), le2(1064), "#42000".getBytes(UTF_8),
      msg.getBytes(UTF_8))
  private def nulStr(s: String): Array[Byte] = s.getBytes(UTF_8) :+ 0.toByte
  private def le2(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte)
  private def le4(n: Int): Array[Byte] =
    Array((n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)

  private def daemon(name: String)(f: => Unit): Thread = {
    val t = new Thread(() => f, name)
    t.setDaemon(true)
    t.start()
    t
  }

  // ---- client ----------------------------------------------------------

  /** Minimal text-protocol client: handshake + COM_QUERY. */
  final class Client(host: String, port: Int, user: String = "graft") {
    private val sock = new Socket(host, port)
    private val in = new DataInputStream(sock.getInputStream)
    private val out = new DataOutputStream(sock.getOutputStream)
    connect()

    private def connect(): Unit = {
      val (_, greeting) = readPacket(in)
      require((greeting(0) & 0xff) == 10,
        s"expected HandshakeV10, got protocol ${greeting(0)}")
      // HandshakeResponse41: PROTOCOL_41 | SECURE_CONNECTION, 16 MB max
      // packet, utf8, empty auth response (dev server accepts all)
      writePacket(out, 1, cat(le4(0x0200 | 0x8000), le4(1 << 24),
        Array(33.toByte), new Array[Byte](23), nulStr(user), lencInt(0)))
      val (_, ok) = readPacket(in)
      require((ok(0) & 0xff) == 0, errText(ok, "handshake refused"))
    }

    /** Text-protocol SELECT: returns (column names, rows of nullable
      * strings). */
    def query(sql: String): (Seq[String], Seq[Seq[String]]) = {
      writePacket(out, 0, Array(0x03.toByte) ++ sql.getBytes(UTF_8))
      val (_, head) = readPacket(in)
      require((head(0) & 0xff) != 0xff, errText(head, "query failed"))
      val nCols = new Cursor(head).lenc.toInt
      val cols = (0 until nCols).map { _ =>
        val (_, defp) = readPacket(in)
        val c = new Cursor(defp)
        c.lencString; c.lencString; c.lencString; c.lencString // def..org_table
        c.lencString // name
      }
      expectEof()
      val rows = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var done = false
      while (!done) {
        val (_, p) = readPacket(in)
        if ((p(0) & 0xff) == 0xfe && p.length < 9) done = true
        else if ((p(0) & 0xff) == 0xff) sys.error(errText(p, "row error"))
        else {
          val c = new Cursor(p)
          rows += (0 until nCols).map(_ => c.lencString)
        }
      }
      (cols, rows.toSeq)
    }

    private def expectEof(): Unit = {
      val (_, p) = readPacket(in)
      require((p(0) & 0xff) == 0xfe && p.length < 9, "expected EOF")
    }

    private def errText(p: Array[Byte], what: String): String =
      if ((p(0) & 0xff) == 0xff)
        s"$what: ${new String(p, 9, p.length - 9, UTF_8)}"
      else what

    def close(): Unit = {
      scala.util.Try(writePacket(out, 0, Array(0x01.toByte))) // COM_QUIT
      scala.util.Try(sock.close()); ()
    }
  }

  /** Range-partitioned wire scan — the `spark.read.jdbc(partitionColumn,
    * lowerBound, upperBound, numPartitions)` shape: each Spark partition
    * opens its OWN connection and pulls `WHERE partCol >= lo AND
    * partCol < hi` for its stride, so N wire scans run in parallel and
    * no row crosses the driver. Returns all-string columns (text
    * protocol; callers cast — the S4 stance). */
  def scanPartitioned(spark: SparkSession, host: String, port: Int,
                      table: String, columns: Seq[String], partCol: String,
                      lower: Long, upperExclusive: Long,
                      numPartitions: Int): DataFrame = {
    require(numPartitions > 0 && upperExclusive > lower)
    val span = upperExclusive - lower
    val ranges = (0 until numPartitions).map { i =>
      val lo = lower + span * i / numPartitions
      val hi = lower + span * (i + 1) / numPartitions
      (lo, hi)
    }.filter { case (lo, hi) => hi > lo }
    val rdd = spark.sparkContext.parallelize(ranges, ranges.size)
      .flatMap { case (lo, hi) =>
        val c = new Client(host, port)
        try {
          val (_, rows) = c.query(
            s"SELECT * FROM $table WHERE $partCol >= $lo AND $partCol < $hi")
          rows.map(Row.fromSeq)
        } finally c.close()
      }
    spark.createDataFrame(rdd,
      StructType(columns.map(StructField(_, StringType, nullable = true))))
  }
}
