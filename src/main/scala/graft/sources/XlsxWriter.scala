package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** K9 — XLSX workbook report writer, zero-dependency (JDK `java.util.zip`
  * + hand-rendered ECMA-376 OOXML parts), the write-side twin of
  * [[XlsxSource]].
  *
  * Reference semantics: `SamenMetenTools/Things2XLSX.py` builds a station
  * report workbook with **one worksheet per region** (`GenerateWorkbook`
  * `:140-157` iterates regions; `Add_Stations` writes a header row then
  * one row per station) via the XlsxWriter Python package. The HTML
  * sibling (`Things2HTML.py`) is a Folium/Leaflet *map* generator —
  * JavaScript templating, declared out of core scope with S7 — and the
  * CSV/Archive siblings are already covered by K1/K3.
  *
  * Scale stance: a spreadsheet is a human-facing REPORT artifact with a
  * hard format bound (1,048,576 rows/sheet) — the reference feeds it
  * station *metadata* (dimension-sized), never measurements. The writer
  * therefore collects to the driver ON PURPOSE (enforced by
  * [[SheetRowLimit]]); fact-scale exports belong to the partitioned CSV
  * (K3) / parquet archive (K1) sinks. The ordering/grouping that feeds it
  * (`orderBy`, the per-sheet partition) still runs distributed before the
  * bounded collect.
  *
  * Cells render as: numerics → `<v>` numbers, strings → inline strings
  * (no sharedStrings part — write-once reports don't profit from the
  * dictionary), booleans → `t="b"`, timestamps → Excel serial numbers
  * carrying the builtin date style (numFmt 22), which [[XlsxSource]]
  * recognizes and maps back to `TimestampType` — the round trip is
  * spec-enforced.
  */
object XlsxWriter {

  /** The OOXML worksheet row limit (ECMA-376 §18.3.1.73 dimension). */
  val SheetRowLimit: Int = 1048576

  /** Excel serial-date epoch — [[XlsxSource]]'s single definition. */
  private val ExcelEpochSec = XlsxSource.ExcelEpochSec

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' =>
        sb.append(' ') // control chars are invalid in XML 1.0
      case c => sb.append(c)
    }
    sb.toString
  }

  /** 0 → "A", 26 → "AA" — the cell column reference. */
  private def colName(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cellXml(ref: String, dt: DataType, v: Any): String = v match {
    case null => ""
    case _ => dt match {
      case _: NumericType =>
        val finite = v match {
          case d: java.lang.Double => !d.isNaN && !d.isInfinite
          case f: java.lang.Float  => !f.isNaN && !f.isInfinite
          case _                   => true
        }
        // NaN/Infinity are not valid OOXML <v> numbers — Excel rejects the
        // workbook; render them as a blank cell like SQL NULL
        if (finite) s"""<c r="$ref"><v>$v</v></c>""" else ""
      case BooleanType =>
        s"""<c r="$ref" t="b"><v>${if (v == true) 1 else 0}</v></c>"""
      case TimestampType | TimestampNTZType =>
        val micros = v match {
          case t: java.sql.Timestamp =>
            // floorDiv: pre-1970 fractional seconds must floor like the
            // reader's floorDiv/floorMod pair, not truncate toward zero
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          case i: java.time.Instant =>
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          case l: java.time.LocalDateTime =>
            val i = l.toInstant(java.time.ZoneOffset.UTC)
            i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        val serial = (micros / 1e6 - ExcelEpochSec) / 86400.0
        s"""<c r="$ref" s="1"><v>$serial</v></c>"""
      case _ =>
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(
          String.valueOf(v))}</t></is></c>"""
    }
  }

  private def sheetXml(schema: StructType, rows: Seq[Row]): String = {
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    // header row (Things2XLSX writes bold headers; style is cosmetic —
    // the read contract only needs the names in row 1)
    sb.append("<row r=\"1\">")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      sb.append(cellXml(s"${colName(i)}1", StringType, f.name))
    }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, r) =>
      sb.append(s"""<row r="${r + 2}">""")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        sb.append(cellXml(s"${colName(i)}${r + 2}", f.dataType, row.get(i)))
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** Minimal styles part: cellXf 0 = general, cellXf 1 = builtin date
    * format 22 (`yyyy-mm-dd hh:mm`) — the style [[XlsxSource]] detects. */
  private val stylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>""" +
      """<fills count="1"><fill><patternFill patternType="none"/></fill></fills>""" +
      """<borders count="1"><border/></borders>""" +
      """<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>""" +
      """<cellXfs count="2"><xf numFmtId="0"/>""" +
      """<xf numFmtId="22" applyNumberFormat="1"/></cellXfs>""" +
      """</styleSheet>"""

  /** Excel forbids `[ ] : * ? / \` in sheet names, blank names, and names
    * over 31 chars; truncation can collide, so [[uniqueSheetNames]] dedupes. */
  private def sanitizeSheetName(raw: String): String = {
    val cleaned = raw.map(c => if ("[]:*?/\\".indexOf(c.toInt) >= 0) '_' else c).trim
    (if (cleaned.isEmpty) "Sheet" else cleaned).take(31)
  }

  /** Dedupe post-truncation collisions with a ` (n)` suffix, keeping the
    * result within the 31-char bound. */
  private def uniqueSheetNames(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    names.map { n =>
      var candidate = n
      var k = 2
      while (seen.contains(candidate)) {
        val suffix = s" ($k)"
        candidate = n.take(31 - suffix.length) + suffix
        k += 1
      }
      seen += candidate
      candidate
    }
  }

  /** Write `df` as a workbook at `file`. With `sheetBy` set, rows are
    * grouped into one worksheet per distinct value of that column (the
    * reference's region sheets), sheet-named by the value, sorted; the
    * column itself stays in the sheet (Things2XLSX repeats the region in
    * its municipality column). Rows within a sheet keep `df`'s order —
    * apply `orderBy` upstream.
    *
    * Groups larger than the format's row limit spill to continuation
    * sheets (`name`, `name (2)`, …) rather than failing — the artifact
    * stays valid OOXML at any input size, though fact-scale exports still
    * belong to the CSV/parquet sinks.
    */
  def write(df: DataFrame, file: String, sheetBy: Option[String] = None): Unit =
    write(df, file, sheetBy, SheetRowLimit)

  /** Test seam: the spill logic with an injectable row limit — spilling at
    * the real 1,048,576 bound would need a million-row fixture. */
  private[sources] def write(df: DataFrame, file: String,
                             sheetBy: Option[String], rowLimit: Int): Unit = {
    val schema = df.schema
    val rows = df.collect() // bounded: report artifact, format-capped below
    val grouped: Seq[(String, Seq[Row])] = sheetBy match {
      case Some(c) =>
        val i = schema.fieldIndex(c)
        rows.toSeq.groupBy(r => String.valueOf(r.get(i))).toSeq.sortBy(_._1)
      case None => Seq("Sheet1" -> rows.toSeq)
    }
    // header occupies row 1, so data rows per sheet cap at limit - 1
    val spilled: Seq[(String, Seq[Row])] = grouped.flatMap { case (name, rs) =>
      rs.grouped(rowLimit - 1).map(chunk => sanitizeSheetName(name) -> chunk).toSeq
    }
    val sheets: Seq[(String, Seq[Row])] =
      uniqueSheetNames(spilled.map(_._1)).zip(spilled.map(_._2))

    val zout = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(file)))
    def part(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    try {
      val n = sheets.length
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
          (1 to n).map(i =>
            s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
            .mkString +
          """</Types>""")
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>""")
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" """ +
          """xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          sheets.zipWithIndex.map { case ((name, _), i) =>
            s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString +
          """</sheets></workbook>""")
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          (1 to n).map(i =>
            s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
            .mkString +
          s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
          """</Relationships>""")
      part("xl/styles.xml", stylesXml)
      sheets.zipWithIndex.foreach { case ((_, rs), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(schema, rs))
      }
    } finally zout.close()
  }
}
