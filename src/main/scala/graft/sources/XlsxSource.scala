package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S6 — XLSX spreadsheet source, zero-dependency (JDK `java.util.zip` +
  * StAX over the public ECMA-376 OOXML format).
  *
  * The reference reads sensor spreadsheets with pandas `read_excel` and
  * then selects a date column + value columns by position
  * (statistics/MyRegression.py:699-757: `GetXLSX`/`FromXLSX` keep only the
  * configured column indexes and convert the date column to epoch
  * seconds). The Spark-side contract here matches that use: a typed
  * DataFrame with one column per sheet column, Excel date-styled cells
  * arriving as real timestamps, so positional `df.columns(i)` selection
  * and range filters compose on top.
  *
  * Scale shape: spreadsheets are human-authored dimension inputs (small
  * files, possibly many). The read distributes via Spark's `binaryFile`
  * source — each .xlsx is parsed ON AN EXECUTOR from its in-memory bytes
  * (one task per file, no driver bottleneck); only schema inference reads
  * one file on the driver. Fact-scale data belongs in parquet/CSV — this
  * source is for the dimension/config spreadsheets the reference consumes.
  *
  * Supported OOXML features: sharedStrings (with multi-`<t>` runs),
  * inline strings, booleans, formula string results, numeric cells,
  * date-styled numerics (builtin numFmt 14-22/45-47 plus custom formats
  * containing y/m/d/h codes outside quoted literals), sparse/out-of-order
  * cells via `r=` refs, ragged rows (null-padded).
  */
object XlsxSource {

  /** One parsed cell: raw text + whether its style marks an Excel date. */
  private final case class Cell(text: String, isDate: Boolean)

  /** Excel serial-date epoch: 1899-12-30T00:00:00Z (the conventional
    * offset that absorbs Excel's 1900 leap-year bug for serials >= 60).
    * Shared with [[XlsxWriter]] — one definition keeps the round-trip
    * contract unbreakable. */
  private[sources] val ExcelEpochSec = -2209161600L

  // ---------------------------------------------------------------- parse

  private def attr(r: XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** Reads all text content until the matching end element. */
  private def elementText(r: XMLStreamReader): String = {
    val sb = new StringBuilder
    var depth = 1
    while (depth > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => depth += 1
        case XMLStreamConstants.END_ELEMENT   => depth -= 1
        case XMLStreamConstants.CHARACTERS |
             XMLStreamConstants.CDATA         => sb.append(r.getText)
        case _                                =>
      }
    }
    sb.toString
  }

  private def newReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // untrusted input: no DTDs / external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** sharedStrings.xml → indexed strings (all `<t>` runs of an `<si>`). */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    val r = newReader(bytes)
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t"  => inT = true
            case _    =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT && cur != null) cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString; cur = null
            case "t"  => inT = false
            case _    =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  private val BuiltinDateFmts: Set[Int] = ((14 to 22) ++ (45 to 47)).toSet

  /** True when a custom format code renders a date/time: contains y/m/d/h/s
    * codes outside "quoted literals" (e.g. `yyyy-mm-dd hh:mm`). */
  private def looksLikeDateFormat(code: String): Boolean = {
    val unquoted = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
    unquoted.exists(c => "ymdhs".contains(c.toLower))
  }

  /** styles.xml → set of cellXf indexes whose numFmt is a date format. */
  private def parseDateStyles(bytes: Array[Byte]): Set[Int] = {
    val r = newReader(bytes)
    val customDateFmts = scala.collection.mutable.Set[Int]()
    val xfFmts = IndexedSeq.newBuilder[Int]
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "numFmt" =>
              val id = Option(attr(r, "numFmtId")).map(_.toInt)
              val code = Option(attr(r, "formatCode"))
              if (id.isDefined && code.exists(looksLikeDateFormat))
                customDateFmts += id.get
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmts += Option(attr(r, "numFmtId")).map(_.toInt).getOrElse(0)
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "cellXfs") inCellXfs = false
        case _ =>
      }
    }
    r.close()
    xfFmts.result().zipWithIndex.collect {
      case (fmt, idx) if BuiltinDateFmts(fmt) || customDateFmts(fmt) => idx
    }.toSet
  }

  /** "BC7" → 0-based column index (54). */
  private def colIndex(cellRef: String): Int = {
    var i = 0; var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** sheet XML → rows of sparse cells, null-padded to rectangular later. */
  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String],
                         dateStyles: Set[Int]): Vector[Vector[Cell]] = {
    val rows = Vector.newBuilder[Vector[Cell]]
    val r = newReader(bytes)
    var cur: scala.collection.mutable.ArrayBuffer[Cell] = null
    var nextCol = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              cur = scala.collection.mutable.ArrayBuffer[Cell]()
              nextCol = 0
            case "c" if cur != null =>
              val col = Option(attr(r, "r")).map(colIndex).getOrElse(nextCol)
              val t = Option(attr(r, "t")).getOrElse("n")
              val style = Option(attr(r, "s")).map(_.toInt).getOrElse(-1)
              // read the cell subtree: first <v> or <is> text wins
              var value: String = null
              var done = false
              var depth = 1
              while (!done && depth > 0 && r.hasNext) {
                r.next() match {
                  case XMLStreamConstants.START_ELEMENT =>
                    r.getLocalName match {
                      case "v" | "is" =>
                        value = elementText(r); done = true
                      case _ => depth += 1
                    }
                  case XMLStreamConstants.END_ELEMENT => depth -= 1
                  case _ =>
                }
              }
              val cell = (t, value) match {
                case (_, null)       => null
                case ("s", v)        => Cell(shared(v.trim.toInt), isDate = false)
                case ("inlineStr", v)=> Cell(v, isDate = false)
                case ("b", v)        => Cell(if (v.trim == "1") "true" else "false",
                                             isDate = false)
                case ("str", v)      => Cell(v, isDate = false)
                case (_, v)          => Cell(v.trim, dateStyles(style))
              }
              if (cell != null) {
                while (cur.length < col) cur += null
                if (cur.length == col) cur += cell else cur(col) = cell
              }
              nextCol = col + 1
            case _ =>
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "row" =>
          if (cur != null) rows += cur.toVector
          cur = null
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** Unzips the workbook parts and parses the first worksheet. */
  private def parseWorkbook(bytes: Array[Byte]): Vector[Vector[Cell]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var dateStyles: Set[Int] = Set.empty
    val sheets = scala.collection.mutable.SortedMap[String, Array[Byte]]()
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml" || name == "xl/styles.xml" ||
            (name.startsWith("xl/worksheets/") && name.endsWith(".xml"))) {
          val content = zin.readAllBytes()
          name match {
            case "xl/sharedStrings.xml" => shared = parseSharedStrings(content)
            case "xl/styles.xml"        => dateStyles = parseDateStyles(content)
            case _                      => sheets += name -> content
          }
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheets.nonEmpty, "no worksheet found in .xlsx")
    // first sheet by part name (sheet1.xml sorts first) — the reference
    // also reads only the first sheet of its sensor spreadsheets
    parseSheet(sheets.head._2, shared, dateStyles)
  }

  // -------------------------------------------------------------- typing

  private def isLongText(s: String): Boolean =
    scala.util.Try(s.toLong).isSuccess
  private def isDoubleText(s: String): Boolean =
    scala.util.Try(s.toDouble).isSuccess

  /** Infer one column's Spark type from its data cells. */
  private def inferType(cells: Seq[Cell]): DataType = {
    val present = cells.filter(c => c != null && c.text.nonEmpty)
    if (present.isEmpty) StringType
    else if (present.forall(_.isDate)) TimestampType
    else if (present.forall(c => !c.isDate && isLongText(c.text))) LongType
    else if (present.forall(c => !c.isDate && isDoubleText(c.text))) DoubleType
    else StringType
  }

  private def toTimestampMicros(serial: Double): Long =
    // serial days -> seconds from the Excel epoch; micros precision
    math.round(serial * 86400.0 * 1e6) + ExcelEpochSec * 1000000L

  private def microsToSqlTimestamp(micros: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    t
  }

  private def convert(c: Cell, dt: DataType): Any = {
    if (c == null || c.text.isEmpty) null
    else dt match {
      case TimestampType =>
        if (c.isDate || isDoubleText(c.text))
          microsToSqlTimestamp(toTimestampMicros(c.text.toDouble))
        else scala.util.Try(java.sql.Timestamp.from(
          java.time.Instant.parse(c.text))).getOrElse(null)
      case LongType   => scala.util.Try(c.text.toLong).getOrElse(null)
      case DoubleType => scala.util.Try(c.text.toDouble).getOrElse(null)
      case _          => c.text
    }
  }

  // ---------------------------------------------------------------- read

  /** Reads .xlsx file(s) at `path` (file or glob) into a typed DataFrame.
    * Schema comes from the first file (header row names + inferred types);
    * every file is parsed on executors via the binaryFile source. */
  def read(spark: SparkSession, path: String, header: Boolean = true): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    // schema inference: one file on the driver
    val first = bin.orderBy("path").select("content")
      .as(org.apache.spark.sql.Encoders.BINARY).head()
    val rows0 = parseWorkbook(first)
    require(rows0.nonEmpty, "empty worksheet")
    val width = rows0.map(_.length).max
    val dataRows = if (header) rows0.drop(1) else rows0
    val names: Seq[String] =
      if (header) {
        val h = rows0.head
        (0 until width).map(i =>
          if (i < h.length && h(i) != null && h(i).text.nonEmpty) h(i).text
          else s"c$i")
      } else (0 until width).map(i => s"c$i")
    val types = (0 until width).map(i =>
      inferType(dataRows.map(r => if (i < r.length) r(i) else null)))
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true) })

    val enc = org.apache.spark.sql.Encoders.row(schema)
    val w = width; val hdr = header; val ts = types
    bin.select("content").as(org.apache.spark.sql.Encoders.BINARY)
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val rows = parseWorkbook(bytes)
          val data = if (hdr) rows.drop(1) else rows
          data.map { r =>
            Row.fromSeq((0 until w).map(i =>
              convert(if (i < r.length) r(i) else null, ts(i))))
          }
        }
      }(enc)
  }
}
